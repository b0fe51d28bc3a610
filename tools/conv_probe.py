"""Per-conv-shape microbenchmark on the real chip.

Times every distinct conv shape in YOLOv8m-pose@1280 (the pipeline's
dominant compute — players_keypoints_tracker.py:285-292 workload) and
TrackNet@288x512, per layer, batch 8, bf16 NHWC via XLA, and reports
achieved TFLOP/s vs the v5e 197 TFLOP/s bf16 peak. This tells us which
layers to hand-write Pallas kernels for.

Measurement rules (BENCH.md): force completion by downloading a scalar;
chain R calls with data dependency to amortize tunnel RTT.

Usage: python tools/conv_probe.py [--reps 6] [--chain 8] [--top 40]
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

PEAK = 197e12

# (name, H, W, Cin, Cout, k, stride) for YOLOv8m-pose@1280, batch handled
# separately. Spatial dims are the *output* of the layer's input map.
POSE_1280 = [
    ("stem", 1280, 1280, 3, 48, 3, 2),
    ("down1", 640, 640, 48, 96, 3, 2),
    ("c2f1.cv1", 320, 320, 96, 96, 1, 1),
    ("c2f1.m.cv", 320, 320, 48, 48, 3, 1),
    ("c2f1.cv2", 320, 320, 192, 96, 1, 1),
    ("down2", 320, 320, 96, 192, 3, 2),
    ("c2f2.cv1", 160, 160, 192, 192, 1, 1),
    ("c2f2.m.cv", 160, 160, 96, 96, 3, 1),
    ("c2f2.cv2", 160, 160, 576, 192, 1, 1),
    ("down3", 160, 160, 192, 384, 3, 2),
    ("c2f3.m.cv", 80, 80, 192, 192, 3, 1),
    ("c2f3.cv2", 80, 80, 1152, 384, 1, 1),
    ("down4", 80, 80, 384, 576, 3, 2),
    ("c2f4.m.cv", 40, 40, 288, 288, 3, 1),
    ("neck2.m.cv", 160, 160, 96, 96, 3, 1),
    ("neck3.m.cv", 80, 80, 192, 192, 3, 1),
    ("neckd1", 160, 160, 192, 192, 3, 2),
    ("cls0.c0", 160, 160, 192, 192, 3, 1),
    ("box0.c0", 160, 160, 192, 64, 3, 1),
    ("box0.c1", 160, 160, 64, 64, 3, 1),
    ("kpt0.c0", 160, 160, 192, 48, 3, 1),
    ("kpt0.c1", 160, 160, 48, 48, 3, 1),
    ("cls1.c0", 80, 80, 384, 192, 3, 1),
]

TRACKNET = [
    ("tn.enc1a", 288, 512, 27, 64, 3, 1),
    ("tn.enc1b", 288, 512, 64, 64, 3, 1),
    ("tn.enc2", 144, 256, 64, 128, 3, 1),
    ("tn.enc2b", 144, 256, 128, 128, 3, 1),
    ("tn.enc3", 72, 128, 128, 256, 3, 1),
    ("tn.enc3b", 72, 128, 256, 256, 3, 1),
    ("tn.bott", 36, 64, 256, 512, 3, 1),
    ("tn.bottb", 36, 64, 512, 512, 3, 1),
    ("tn.dec3", 72, 128, 768, 256, 3, 1),
    ("tn.dec2", 144, 256, 384, 128, 3, 1),
    ("tn.dec1", 288, 512, 192, 64, 3, 1),
]


def _force(x):
    return float(jnp.ravel(x)[0].astype(jnp.float32))


def make_conv(cin, cout, k, stride):
    pad = [(k // 2, k // 2)] * 2

    @jax.jit
    def f(x, w):
        def one(x):
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        # chain to amortize dispatch: y = conv(x); y2 = conv(like-x from y)
        return one(x)

    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--set", default="pose", choices=["pose", "tracknet", "both"])
    args = ap.parse_args()

    layers = []
    if args.set in ("pose", "both"):
        layers += POSE_1280
    if args.set in ("tracknet", "both"):
        layers += TRACKNET

    B = args.batch
    rng = np.random.default_rng(0)
    total_t = 0.0
    total_fl = 0.0
    for (name, h, w, cin, cout, k, stride) in layers:
        ih, iw = h * stride, w * stride
        # chain: run the same conv `chain` times with a dependency
        pad = [(k // 2, k // 2)] * 2

        @jax.jit
        def chained(x, wgt, _k=k, _s=stride, _pad=pad, _cin=cin):
            def body(x):
                y = jax.lax.conv_general_dilated(
                    x, wgt, (_s, _s), _pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                return y

            y = body(x)
            acc = jnp.sum(y, dtype=jnp.float32)
            for _ in range(args.chain - 1):
                # re-derive an input-shaped tensor with a data dependency on y
                x2 = x + (acc * 1e-12).astype(jnp.bfloat16)
                y = body(x2)
                acc = acc + jnp.sum(y, dtype=jnp.float32)
            return acc

        x = jnp.asarray(rng.standard_normal((B, ih, iw, cin)), jnp.bfloat16)
        wgt = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)) * 0.05, jnp.bfloat16
        )
        try:
            _force(chained(_perturb(x, 999), wgt))  # compile+warm
            times = []
            for i in range(args.reps):
                xi = _perturb(x, i)
                _force(xi)
                t0 = time.perf_counter()
                _force(chained(xi, wgt))
                times.append(time.perf_counter() - t0)
            t = float(np.median(times)) / args.chain
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED {type(e).__name__}: {e}")
            continue
        fl = 2.0 * B * h * w * cout * cin * k * k
        tf = fl / t / 1e12
        total_t += t
        total_fl += fl
        print(
            f"{name:12s} {ih:4d}x{iw:<4d} {cin:4d}->{cout:4d} k{k}s{stride}"
            f"  {t*1e3/B:7.3f} ms/img  {tf:6.1f} TF/s  {100*tf*1e12/PEAK:5.1f}%"
        )
    if total_fl:
        print(
            f"TOTAL {total_t*1e3/B:.3f} ms/img {total_fl/total_t/1e12:.1f} TF/s"
            f" ({100*total_fl/total_t/PEAK:.1f}% of peak)"
        )


if __name__ == "__main__":
    main()
