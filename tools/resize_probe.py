"""On-chip A/B of the dense vs block-banded resize matmuls.

  python tools/resize_probe.py [--batch 8] [--reps 5] [--chain 6]

Times the three production resizes of the fused pipeline (pose squash
1080p->1280x1280 bicubic, ball 1080p->288x512 bicubic, det letterbox
1080p->360x640 cv2-linear) both ways, on a resident device buffer,
chaining `--chain` applications per dispatch so the tunnel RTT is
amortized (BENCH.md measurement rules: perturb content on device,
force with one scalar download).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _force(x):
    return float(jnp.ravel(x)[0].astype(jnp.float32))


def _time(fn, x_dev, reps, warm=1):
    @jax.jit
    def perturb(x, i):
        return x.at[0, 0, 0, 0].set((i % 251).astype(x.dtype))

    for i in range(warm):
        _force(fn(perturb(x_dev, jnp.int32(i + 100))))
    ts = []
    for i in range(reps):
        xi = perturb(x_dev, jnp.int32(i))
        _force(xi)
        t0 = time.perf_counter()
        _force(fn(xi))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=6)
    args = ap.parse_args()

    from padel_analytics_tpu.ops.resize import letterbox_plan, resize_plan

    b = args.batch
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (b, 1080, 1920, 3), np.uint8), jnp.float32)
    )

    cases = [
        ("pose 1080p->1280^2 bicubic", resize_plan((1080, 1920), (1280, 1280), "pil_bicubic")),
        ("ball 1080p->288x512 bicubic", resize_plan((1080, 1920), (288, 512), "pil_bicubic")),
        ("det letterbox 1080p->640", letterbox_plan((1080, 1920), 640)),
    ]
    print(f"platform={jax.devices()[0].platform} batch={b} chain={args.chain}")
    for name, plan in cases:
        for banded in (False, True):
            apply_kw = {"banded": banded}
            target = plan.plan if hasattr(plan, "plan") else plan

            @functools.partial(jax.jit, static_argnums=())
            def step(xx, _target=target, _kw=apply_kw):
                y = xx
                # chain applications back-to-back; mix the output back to
                # source shape cheaply so the chain doesn't collapse.
                for _ in range(args.chain):
                    r = _target.apply(y, **_kw)
                    y = xx + jnp.mean(r)
                return jnp.mean(y)

            t = _time(step, x, args.reps)
            per = t / (args.chain * b) * 1e3
            print(f"  {name:34s} banded={banded!s:5s} {per:7.3f} ms/frame")


if __name__ == "__main__":
    main()
