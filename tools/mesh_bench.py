"""Measured multi-chip scaling on the virtual CPU mesh (bench --mesh).

Runs the fused pipeline's `run_mesh` over 1/2/4/8 virtual CPU devices and
the single-device `run` on the same platform, with identical smoke-scale
models and clip, and prints ONE JSON line with the measured throughputs.

What this measures (and what it can't): the 8 virtual devices share one
host's cores, so aggregate FLOPs do NOT scale — what the numbers expose is
the OVERHEAD of the sharded program (GSPMD partitioning, halo exchange for
the ball window axis, per-dispatch cost) relative to the single-device
program. `parity` near 1.0 means the multi-chip path adds ~no overhead at
matched resources, which is the scaling-relevant fact a virtual mesh can
establish; real >1 speedup needs real chips (the ingest model in bench.py
projects that from the measured single-chip device split).

Usage: python tools/mesh_bench.py [--frames 64] [--devices 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Must precede jax import effects: force the CPU platform with 8 virtual
# devices (the image's sitecustomize pre-imports jax pinned to axon).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    )

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    # >= 8 devices x chunk + halo: run_mesh needs shards >= seq_len-1
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--chunk", type=int, default=8)
    # Timed rows are best-of-N: single passes on a contended 1-core host
    # vary up to 2x run to run (BENCH_r05: in-bench parity 0.787 vs a
    # clean standalone 1.204 the same morning), and the parity claim
    # needs the CONTENTION-FREE rate of each program, not a sample of
    # host load.
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from padel_analytics_tpu.config import BallTrackerConfig
    from padel_analytics_tpu.ops.polygon import PolygonZone
    from padel_analytics_tpu.trackers import (
        BallTracker,
        Keypoint,
        Keypoints,
        KeypointsTracker,
        PlayerKeypointsTracker,
        PlayerTracker,
    )
    from padel_analytics_tpu.trackers.fused import FusedPipeline
    from padel_analytics_tpu.utils.video import VideoInfo

    w, h, n = 256, 192, args.frames
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n):
        f = np.full((h, w, 3), 40, np.uint8)
        x0 = 10 + (5 * i) % (w - 30)
        f[h // 3 : h // 3 + 8, x0 : x0 + 8] = 230
        f += rng.integers(0, 6, f.shape, dtype=np.uint8)
        frames.append(f)

    kps = [
        (w * 0.12, h * 0.86), (w * 0.88, h * 0.86),
        (w * 0.13, h * 0.75), (w * 0.50, h * 0.75), (w * 0.87, h * 0.75),
        (w * 0.14, h * 0.55), (w * 0.86, h * 0.55),
        (w * 0.15, h * 0.36), (w * 0.50, h * 0.36), (w * 0.85, h * 0.36),
        (w * 0.16, h * 0.22), (w * 0.84, h * 0.22),
    ]
    ck = Keypoints(
        [Keypoint(id=i, xy=(float(x), float(y))) for i, (x, y) in enumerate(kps)]
    )
    poly = np.array([kps[0], kps[1], kps[-1], kps[-2]])

    def build(association: str = "auto"):
        players = PlayerTracker(
            None, PolygonZone(poly, (w, h)), batch_size=args.chunk,
            model_variant="n", compute_dtype=jnp.float32,
        )
        players.IMGSZ = 64
        pose = PlayerKeypointsTracker(
            None, train_image_size=64, batch_size=args.chunk,
            model_variant="n", compute_dtype=jnp.float32,
        )
        # Random-init smoke weights gate ~all 84 anchors at conf .25
        # (untrained sigmoids — see bench.calibrate_synthetic_conf);
        # raise the tiny model's pre-filter so the scaling rows don't
        # spray truncation warnings into the artifact tail.
        pose.nms_top_k = 128
        pose.nms_saturation.top_k = 128
        ball = BallTracker(
            None, None, compute_dtype=jnp.float32,
            config=BallTrackerConfig(
                height=96, width=128, batch_size=args.chunk,
                median_max_sample_num=8,
            ),
        )
        court = KeypointsTracker(fixed_keypoints_detection=ck)
        info = VideoInfo(width=w, height=h, fps=30.0, total_frames=n)
        for t in (players, pose, ball, court):
            t.video_info_post_init(info)
        return FusedPipeline(
            players, pose, ball, court, chunk=args.chunk, ingest="rgb",
            association=association,
        )

    results: dict = {"frames": n, "platform": "cpu-virtual"}

    def timed_fps(run_once) -> float:
        """Best-of-`--reps` fps for one warmed pipeline pass."""
        best = 0.0
        for _ in range(max(args.reps, 1)):
            t0 = time.perf_counter()
            run_once()
            best = max(best, n / (time.perf_counter() - t0))
        return round(best, 2)

    # single-device reference (same platform, same models)
    pipe = build()
    pipe.run(iter(frames), n)  # warm/compile
    results["single_device_fps"] = timed_fps(lambda: pipe.run(iter(frames), n))

    devs = jax.devices()
    mesh_fps = {}
    for d in [int(x) for x in args.devices.split(",")]:
        if d > len(devs):
            continue
        mesh = Mesh(np.array(devs[:d]), ("data",))
        pipe_m = build()
        try:
            pipe_m.run_mesh(iter(frames), n, mesh)  # warm/compile
            mesh_fps[str(d)] = timed_fps(
                lambda: pipe_m.run_mesh(iter(frames), n, mesh)
            )
        except Exception as e:  # noqa: BLE001
            mesh_fps[str(d)] = f"failed: {type(e).__name__}"
    results["mesh_fps_by_devices"] = mesh_fps

    # Association A/B at 8 devices (round-4 verdict item 1): run_mesh's
    # 'auto' resolves to the on-device scan; this row pins what the host
    # ByteTrack alternative costs/saves at matched resources.
    if len(devs) >= 8:
        mesh8 = Mesh(np.array(devs[:8]), ("data",))
        for assoc in ("host", "device"):
            pipe_a = build(assoc)
            try:
                pipe_a.run_mesh(iter(frames), n, mesh8)  # warm
                results[f"mesh8_fps_assoc_{assoc}"] = timed_fps(
                    lambda: pipe_a.run_mesh(iter(frames), n, mesh8)
                )
            except Exception as e:  # noqa: BLE001
                results[f"mesh8_fps_assoc_{assoc}"] = (
                    f"failed: {type(e).__name__}"
                )

    base = results["single_device_fps"]
    if isinstance(mesh_fps.get("8"), (int, float)) and base:
        # ~1.0 => the sharded program adds no overhead at matched
        # resources (virtual devices share the host's cores, so >1 real
        # speedup is not measurable here by construction).
        results["parity_8dev_vs_single"] = round(mesh_fps["8"] / base, 3)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
