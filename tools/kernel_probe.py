"""Pallas conv kernel vs XLA conv on the real chip, per hot layer shape.

For each target conv shape (pose YOLOv8m@1280 + TrackNet@288x512 stride-1
3x3 layers), times ops/pallas_conv.conv3x3_bn_act against the fused XLA
reference (conv + BN affine + act) and prints achieved TFLOP/s for both.

Measurement rules (BENCH.md): force completion by downloading a scalar;
chain calls with a data dependency to amortize tunnel RTT.

Usage: python tools/kernel_probe.py [--set pose|tracknet|both]
       [--reps 3] [--chain 4] [--tile-h 8] [--batch 8]
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

from padel_analytics_tpu.ops.pallas_conv import (
    conv3x3_bn_act,
    conv3x3_bn_act_reference,
    conv3x3_bn_act_rows,
)

PEAK = 197e12

# stride-1 3x3 shapes: (name, H, W, Cin, Cout, act)
POSE = [
    ("c2f1.m.cv", 320, 320, 48, 48, "silu"),
    ("c2f2.m.cv", 160, 160, 96, 96, "silu"),
    ("c2f3.m.cv", 80, 80, 192, 192, "silu"),
    ("cls0.c0", 160, 160, 192, 192, "silu"),
    ("box0.c0", 160, 160, 192, 64, "silu"),
    ("kpt0.c1", 160, 160, 48, 48, "silu"),
    ("cls1.c0", 80, 80, 384, 192, "silu"),
]
TRACKNET = [
    ("tn.enc1a", 288, 512, 27, 64, "relu"),
    ("tn.enc1b", 288, 512, 64, 64, "relu"),
    ("tn.enc2b", 144, 256, 128, 128, "relu"),
    ("tn.enc3b", 72, 128, 256, 256, "relu"),
    ("tn.bottb", 36, 64, 512, 512, "relu"),
    ("tn.dec1", 288, 512, 192, 64, "relu"),
]


def _force(x):
    return float(jnp.ravel(x)[0].astype(jnp.float32))


@jax.jit
def _perturb(x, i):
    # on-device content change per rep: defeats the transport replay
    # cache without a fresh host upload (see tools/fast_probe.py).
    return x.at[(0,) * x.ndim].set(i * 1e-6)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", default="both", choices=["pose", "tracknet", "both"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tile-h", type=int, default=8)
    ap.add_argument("--only", default=None,
                    help="comma-separated layer-name substrings to run")
    args = ap.parse_args()

    layers = []
    if args.set in ("pose", "both"):
        layers += POSE
    if args.set in ("tracknet", "both"):
        layers += TRACKNET
    if args.only:
        keys = args.only.split(",")
        layers = [l for l in layers if any(k in l[0] for k in keys)]

    rng = np.random.default_rng(0)
    B = args.batch

    for (name, h, w, cin, cout, act) in layers:
        x = jnp.asarray(rng.standard_normal((B, h, w, cin)), jnp.bfloat16)
        wgt = jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.bfloat16
        )
        scale = jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
        fl = 2.0 * B * h * w * cout * cin * 9

        def chained(fn):
            @jax.jit
            def f(x0):
                y = fn(x0)
                acc = jnp.sum(y, dtype=jnp.float32)
                for _ in range(args.chain - 1):
                    x1 = x0 + (acc * 1e-12).astype(x0.dtype)
                    y = fn(x1)
                    acc = acc + jnp.sum(y, dtype=jnp.float32)
                return acc

            return f

        row = f"{name:11s} {h:3d}x{w:<3d} {cin:4d}->{cout:4d} {act:4s}"
        for label, fn in (
            ("xla", lambda x0: conv3x3_bn_act_reference(x0, wgt, scale, bias, act=act)),
            ("pallas", lambda x0: conv3x3_bn_act(
                x0, wgt, scale, bias, act=act, tile_h=args.tile_h)),
            ("rows", lambda x0: conv3x3_bn_act_rows(
                x0, wgt, scale, bias, act=act, tile_h=args.tile_h)),
        ):
            try:
                cf = chained(fn)
                _force(cf(_perturb(x, 999)))
                ts = []
                for i in range(args.reps):
                    xi = _perturb(x, i)
                    _force(xi)
                    t0 = time.perf_counter()
                    _force(cf(xi))
                    ts.append(time.perf_counter() - t0)
                t = float(np.median(ts)) / args.chain
                tf = fl / t / 1e12
                row += f" | {label} {t*1e3/B:6.3f} ms/img {tf:6.1f} TF/s {100*tf*1e12/PEAK:4.1f}%"
            except Exception as e:  # noqa: BLE001
                row += f" | {label} FAILED {type(e).__name__}: {str(e)[:120]}"
        print(row, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
