"""Whole-model A/B on the real chip: Flax/XLA forward vs the Pallas-kernel
fast forward, at production shapes.

  python tools/fast_probe.py --model tracknet [--batch 8] [--reps 5]

Measurement rules (BENCH.md): force completion by downloading a scalar;
fresh input content per timed call (replay cache).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _force(x):
    return float(jnp.ravel(x)[0].astype(jnp.float32))


@jax.jit
def _perturb(x, i):
    # on-device content change: defeats the transport's replay cache
    # without re-uploading the input (BENCH.md measurement rules; a fresh
    # host array would cost a full upload per timed call and drown the
    # compute signal on a congested tunnel).
    return x.at[(0,) * x.ndim].set(i * 1e-6)


def _time(fn, x_dev, reps, warm=2):
    for i in range(warm):
        _force(fn(_perturb(x_dev, i + 1000)))
    ts = []
    for i in range(reps):
        xi = _perturb(x_dev, i)
        _force(xi)  # settle the perturb dispatch outside the timed span
        t0 = time.perf_counter()
        _force(fn(xi))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_rtt(reps: int = 5) -> float:
    """Median round-trip of a trivial forced op (dispatch+download floor)."""
    y = jnp.zeros((8, 128))

    @jax.jit
    def tiny(v, i):
        return v + i

    _force(tiny(y, 0))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        _force(tiny(y, i + 1))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tracknet", choices=["tracknet"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--chain", type=int, default=6,
        help="forwards per dispatch: amortizes the tunnel RTT (~50 ms "
        "some days) so ms-scale compute resolves",
    )
    ap.add_argument(
        "--pallas", action="store_true",
        help="also time the Pallas fast forward (known 2x slower than "
        "XLA on v5e — BENCH.md; costs extra tunnel compiles)",
    )
    args = ap.parse_args()

    from padel_analytics_tpu.models.tracknet import make_tracknet
    from padel_analytics_tpu.models.tracknet_fast import FastTrackNet

    rng = np.random.default_rng(0)
    B = args.batch
    model, in_dim = make_tracknet(8, "concat", dtype=jnp.bfloat16)
    sub_model, _ = make_tracknet(
        8, "concat", dtype=jnp.bfloat16, subpixel_up=True
    )
    x0 = jnp.zeros((1, 288, 512, in_dim), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x0))(jax.random.PRNGKey(0))

    def _tracknet_gmacs(h, w, cin, cout, subpixel):
        """Exact conv MACs (G) per image for the 288x512 U-Net."""
        g = 0.0
        px = h * w
        # down path
        g += px * 9 * (cin * 64 + 64 * 64)
        g += (px // 4) * 9 * (64 * 128 + 128 * 128)
        g += (px // 16) * 9 * (128 * 256 + 2 * 256 * 256)
        g += (px // 64) * 9 * (256 * 512 + 2 * 512 * 512)
        # up path: first conv of each block splits into the upsampled
        # half (9 or 4 taps/output px) and the skip half (always 9)
        up_taps = 4 if subpixel else 9
        g += (px // 16) * (up_taps * 512 + 9 * 256) * 256
        g += (px // 16) * 9 * 2 * 256 * 256
        g += (px // 4) * (up_taps * 256 + 9 * 128) * 128
        g += (px // 4) * 9 * 128 * 128
        g += px * (up_taps * 128 + 9 * 64) * 64
        g += px * 9 * 64 * 64
        g += px * 64 * cout  # 1x1 predictor
        return g / 1e9

    gmacs = _tracknet_gmacs(288, 512, in_dim, 8, False)
    gmacs_sub = _tracknet_gmacs(288, 512, in_dim, 8, True)
    print(
        f"conv work: baseline {gmacs:.1f} GMACs/img, "
        f"subpixel {gmacs_sub:.1f} GMACs/img "
        f"({gmacs / gmacs_sub:.2f}x fewer)", flush=True,
    )

    x_dev = jnp.asarray(
        rng.uniform(0, 1, (B, 288, 512, in_dim)), jnp.float32
    )  # uploaded ONCE; timed calls perturb it on device

    rtt = measure_rtt()
    print(f"rtt floor: {rtt*1e3:7.2f} ms (dispatch+download)", flush=True)

    def chained(apply_fn):
        n = args.chain

        @jax.jit
        def f(x):
            y = apply_fn(x)
            acc = jnp.sum(y, dtype=jnp.float32)
            for _ in range(n - 1):
                x = x + (acc * 1e-12).astype(x.dtype)
                y = apply_fn(x)
                acc = acc + jnp.sum(y, dtype=jnp.float32)
            return acc

        return f

    flax_fwd = chained(lambda x: model.apply(variables, x))
    sub_fwd = chained(lambda x: sub_model.apply(variables, x))

    def report(label, t, g):
        per_batch = max(t - rtt, 1e-9) / args.chain
        tfs = 2 * g * B / per_batch / 1e3  # GMAC->TFLOP/s
        print(
            f"{label}: {t*1e3:8.2f} ms/call ({args.chain} fwd)  "
            f"rtt-adj {per_batch*1e3:7.2f} ms/batch  "
            f"{per_batch*1e3/B:6.3f} ms/img  "
            f"{tfs:5.1f} TF/s ({tfs / 197 * 100:4.1f}% of v5e bf16 peak)",
            flush=True,
        )
        return per_batch

    print("compiling + timing flax/XLA forward...", flush=True)
    t_flax = report("flax/XLA ", _time(flax_fwd, x_dev, args.reps), gmacs)
    print("compiling + timing subpixel-up forward...", flush=True)
    t_sub = report(
        "subpixel ", _time(sub_fwd, x_dev, args.reps), gmacs_sub
    )
    print(f"subpixel speedup: {t_flax/t_sub:.2f}x "
          f"(MAC-count bound {gmacs/gmacs_sub:.2f}x)", flush=True)

    if args.pallas:
        fast = FastTrackNet(out_dim=8, dtype=jnp.bfloat16)
        fast_fwd = chained(lambda x: fast.apply(variables, x))
        print("compiling + timing pallas fast forward...", flush=True)
        t_fast = report("pallas   ", _time(fast_fwd, x_dev, args.reps), gmacs)
        print(f"pallas speedup  : {t_flax/t_fast:.2f}x", flush=True)

    # numeric check on-chip (reuses the resident input)
    flax_1 = jax.jit(lambda x: model.apply(variables, x))
    sub_1 = jax.jit(lambda x: sub_model.apply(variables, x))
    d = np.abs(np.asarray(flax_1(x_dev)) - np.asarray(sub_1(x_dev)))
    print(f"subpixel max|diff|: {d.max():.4f}  mean: {d.mean():.6f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
