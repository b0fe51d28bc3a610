"""Per-model device timing + MXU utilization on the real chip.

For each model in the pipeline (det YOLOv8m@640, pose YOLOv8m@1280,
TrackNet@288x512, court ResNet50@224) this times the jitted forward at its
production batch size and compares against the XLA-reported FLOP count
(`compiled.cost_analysis()`), yielding an MXU-utilization estimate.

Axon-tunnel measurement rules (BENCH.md): completion is forced by
downloading a scalar from the output (block_until_ready is a no-op on the
tunnel); every timed call uses fresh input content so the runtime's replay
cache cannot serve a cached answer. Timings therefore include a small
download + dispatch overhead; with --reps N the per-call overhead is
amortized by timing N chained calls.

Usage: python tools/model_probe.py [--reps 8] [--models det,pose,ball,court]
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

# v5e peak: 197 TFLOP/s bf16, 819 GB/s HBM.
PEAK_FLOPS = {"tpu v5 lite": 197e12, "tpu v5e": 197e12}
DEFAULT_PEAK = 197e12


def _force(x):
    """Force completion by downloading one element (tunnel-safe)."""
    return float(jnp.ravel(x)[0])


def _time_fn(fn, make_args, reps: int, warmup: int = 2):
    """Median wall-clock of `fn(*make_args())` over `reps` timed calls."""
    for _ in range(warmup):
        _force(fn(*make_args()))
    times = []
    for _ in range(reps):
        args = make_args()
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _cost(jitted, *args):
    # AOT lower().compile() goes through a different tunnel path than
    # dispatch and can hang on the axon platform (like jax.profiler —
    # BENCH.md's measurement rules), so cost analysis is opt-in.
    if os.environ.get("PROBE_COST") != "1":
        return 0.0, 0.0
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0)), float(an.get("bytes accessed", 0.0))
    except Exception as e:  # noqa: BLE001
        print(f"  cost_analysis unavailable: {e}")
        return 0.0, 0.0


def probe(name, apply_fn, variables, shape, batch, reps, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)

    # The input stays RESIDENT in HBM (we are probing compute, not the
    # tunnel's upload rate — tools/upload_probe.py covers that). A fresh
    # tiny scalar argument per call changes the args tuple so the
    # runtime's replay cache cannot serve a cached answer.
    @jax.jit
    def fn(v, x, k):
        return apply_fn(v, x + k)

    x_dev = jax.device_put(
        jnp.asarray(rng.uniform(0, 1, size=(batch, *shape)).astype(np.float32))
    )
    counter = iter(range(1, 1 << 30))

    def make_args():
        return variables, x_dev, jnp.float32(next(counter) * 1e-7)

    args = make_args()
    flops, bytes_ = _cost(fn, *args)
    t = _time_fn(fn, make_args, reps)
    per_frame = t / batch * 1e3
    util = flops / t / DEFAULT_PEAK * 100 if t > 0 else 0.0
    bw = bytes_ / t / 819e9 * 100 if t > 0 else 0.0
    print(
        f"{name:18s} batch={batch:3d} {t * 1e3:8.1f} ms/call "
        f"{per_frame:7.2f} ms/frame  {flops / 1e9:8.1f} GFLOP/call "
        f"MXU {util:5.1f}%  HBM {bw:5.1f}%"
    )
    return {"name": name, "ms_call": t * 1e3, "ms_frame": per_frame,
            "batch": batch, "gflop": flops / 1e9, "mxu_pct": util,
            "hbm_pct": bw}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--models", default="det,pose,ball")
    p.add_argument("--batch", type=int, default=0, help="override batch")
    args = p.parse_args()
    want = set(args.models.split(","))

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # Null calibration: dispatch + forced-scalar-download round trip with
    # ~zero compute. Subtract this from the per-call times to get the
    # on-device compute component.
    null = probe(
        "null (RTT floor)",
        lambda v, x: x[:1, :1, :1, :1],
        {},
        (8, 8, 3),
        1,
        args.reps,
    )

    results = []
    if "det" in want:
        from padel_analytics_tpu.models.yolov8 import YOLOv8

        m = YOLOv8(variant="m", num_classes=1, dtype=jnp.bfloat16)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3), jnp.float32))
        results.append(
            probe("det yolov8m@640", lambda vv, x: m.apply(vv, x)["scores"], v,
                  (640, 640, 3), args.batch or 16, args.reps)
        )
    if "pose" in want:
        from padel_analytics_tpu.models.yolov8 import YOLOv8

        m = YOLOv8(variant="m", num_classes=1, num_keypoints=13,
                   dtype=jnp.bfloat16)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 1280, 1280, 3), jnp.float32))
        results.append(
            probe("pose yolov8m@1280", lambda vv, x: m.apply(vv, x)["scores"], v,
                  (1280, 1280, 3), args.batch or 8, args.reps)
        )
    if "ball" in want:
        from padel_analytics_tpu.models.tracknet import make_tracknet

        m, in_dim = make_tracknet(8, "concat", dtype=jnp.bfloat16)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 288, 512, in_dim), jnp.float32))
        results.append(
            probe("tracknet@288x512", lambda vv, x: m.apply(vv, x), v,
                  (288, 512, in_dim), args.batch or 8, args.reps)
        )
    if "court" in want:
        from padel_analytics_tpu.models.resnet import ResNet50Regressor

        m = ResNet50Regressor(num_outputs=24, dtype=jnp.bfloat16)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32))
        results.append(
            probe("resnet50@224", lambda vv, x: m.apply(vv, x), v,
                  (224, 224, 3), args.batch or 16, args.reps)
        )

    total = sum(r["ms_frame"] for r in results)
    print(f"{'TOTAL':18s} {total:7.2f} ms/frame (pipeline models, per frame)")
    rtt = null["ms_call"]
    print(f"RTT-corrected (subtract {rtt:.1f} ms/call):")
    corr_total = 0.0
    for r in results:
        per_frame = max(r["ms_call"] - rtt, 0.0) / r["batch"]
        corr_total += per_frame
        print(f"  {r['name']:18s} {per_frame:7.2f} ms/frame")
    print(f"  {'TOTAL':18s} {corr_total:7.2f} ms/frame")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
