"""Attribute fused-pipeline time to decode / pack / upload / det / pose /
ball / drain on the real chip.

Axon-tunnel measurement rules (see BENCH.md): block_until_ready is a no-op,
so completion is forced by downloading from the output buffer; the runtime
replay-caches identical (executable, args) calls, so every timed call uses
a distinct input buffer; jax.profiler hangs, so everything is wall-clock
differencing.

Usage:  python tools/perf_probe.py [--chunks N] [--chunk-size B]
Writes a human-readable split to stdout.
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


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--chunks", type=int, default=8)
    p.add_argument("--chunk-size", type=int, default=16)
    p.add_argument("--skip-decode", action="store_true")
    args = p.parse_args()

    from padel_analytics_tpu.config import BallTrackerConfig
    from padel_analytics_tpu.io.native import pack_frames
    from padel_analytics_tpu.ops.ensemble import overlap_ensemble_coefficients
    from padel_analytics_tpu.ops.polygon import PolygonZone
    from padel_analytics_tpu.trackers import (
        BallTracker,
        PlayerKeypointsTracker,
        PlayerTracker,
    )
    from padel_analytics_tpu.trackers.fused import FusedPipeline

    W, H, B, NCH = 1920, 1080, args.chunk_size, args.chunks
    n_frames = B * NCH
    print(f"probe: {NCH} chunks x {B} frames @ {W}x{H} on {jax.devices()}")

    polygon = np.array([[230, 930], [1690, 930], [1610, 240], [310, 240]])
    players = PlayerTracker(
        None, PolygonZone(polygon, frame_resolution_wh=(W, H)),
        batch_size=8, model_variant="m", compute_dtype=jnp.bfloat16,
    )
    pose = PlayerKeypointsTracker(
        None, train_image_size=1280, batch_size=8, model_variant="m",
        compute_dtype=jnp.bfloat16, load_path=None, save_path=None,
    )
    ball = BallTracker(
        None, None,
        config=BallTrackerConfig(batch_size=8, median_max_sample_num=64),
        compute_dtype=jnp.bfloat16,
    )
    pipe = FusedPipeline(players, pose, ball, court=None, chunk=B)
    det_step = jax.jit(pipe._build_det_step((H, W)))
    pose_step = jax.jit(pipe._build_pose_step((H, W)))
    ball_step = jax.jit(pipe._build_ball_step((H, W)))

    rng = np.random.default_rng(0)
    base = rng.integers(0, 240, size=(B, H, W, 3), dtype=np.uint8)
    # Distinct host buffers per chunk (replay-cache defeat) without NCH
    # full random generations on the single host core.
    host_chunks = [base + np.uint8(k + 1) for k in range(NCH)]

    seq_len = ball.tracknet_seq_len
    median_dev = jnp.asarray(
        rng.integers(0, 255, size=(ball.HEIGHT, ball.WIDTH, 3), dtype=np.uint8)
    )
    coef = overlap_ensemble_coefficients(n_frames, seq_len, ball.EVAL_MODE)
    n_ext_pad = (-(-(n_frames + seq_len - 1) // B)) * B + B
    table = np.zeros((n_ext_pad, seq_len), np.float32)
    table[seq_len - 1 : seq_len - 1 + n_frames] = coef
    coef_table = jnp.asarray(table)
    zero_fc = jnp.zeros((seq_len - 1, ball.HEIGHT, ball.WIDTH, 3), jnp.float32)
    zero_hc = jnp.zeros((seq_len - 1, seq_len, ball.HEIGHT, ball.WIDTH), jnp.float32)
    swap = jnp.zeros(B, jnp.float32)

    def sync_upload(fd):
        # Force the upload (and nothing heavier) to complete: download one
        # scalar sliced from the buffer.
        return int(np.asarray(fd[0, 0, 0, 0]))

    # ---- warmup / compile (uses the persistent XLA cache) ----
    print("probe: warmup (compiles if cache cold)...", flush=True)
    t0 = time.perf_counter()
    fd0 = jnp.asarray(host_chunks[0])
    d0 = det_step(players.engine.variables, fd0)
    p0 = pose_step(pose.engine.variables, fd0)
    b0, fc, hc = ball_step(
        ball.tracknet.variables, fd0, median_dev, zero_fc, zero_hc,
        coef_table, 0, swap,
    )
    np.asarray(d0); np.asarray(p0); np.asarray(b0)
    sync_upload(fd0)
    print(f"probe: warmup {time.perf_counter() - t0:.1f}s", flush=True)

    split = {}

    # ---- host decode (bench-style clip) ----
    if not args.skip_decode:
        import cv2
        import tempfile
        from bench import make_clip

        tmp = tempfile.mkdtemp(prefix="pat_probe_")
        clip = os.path.join(tmp, "clip.mp4")
        make_clip(clip, W, H, n_frames)
        cap = cv2.VideoCapture(clip)
        t0 = time.perf_counter()
        cnt = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            cnt += 1
        split["decode"] = time.perf_counter() - t0
        cap.release()
        print(f"decode: {split['decode']:.2f}s for {cnt} frames", flush=True)

    # ---- pack ----
    frame_list = [base[i] for i in range(B)]
    t0 = time.perf_counter()
    for _ in range(NCH):
        arr = pack_frames(frame_list)
    split["pack"] = time.perf_counter() - t0
    print(f"pack: {split['pack']:.2f}s", flush=True)

    # ---- upload (serial: upload+sync per chunk) ----
    t0 = time.perf_counter()
    fds = []
    for hc_arr in host_chunks:
        fd = jnp.asarray(hc_arr)
        sync_upload(fd)
        fds.append(fd)
    split["upload_serial"] = time.perf_counter() - t0
    print(f"upload_serial: {split['upload_serial']:.2f}s "
          f"({n_frames * H * W * 3 / split['upload_serial'] / 1e9:.2f} GB/s)",
          flush=True)

    # ---- per-sub-step: dispatch all, then drain all (pipelined) ----
    def run_phase(name, fn):
        t0 = time.perf_counter()
        outs = [fn(fd) for fd in fds]
        t_disp = time.perf_counter() - t0
        for o in outs:
            np.asarray(o)
        t_all = time.perf_counter() - t0
        split[name] = t_all
        split[name + "_dispatch"] = t_disp
        print(f"{name}: {t_all:.2f}s (dispatch {t_disp:.2f}s) "
              f"= {t_all / n_frames * 1e3:.1f} ms/frame", flush=True)

    run_phase("det", lambda fd: det_step(players.engine.variables, fd))
    run_phase("pose", lambda fd: pose_step(pose.engine.variables, fd))

    t0 = time.perf_counter()
    outs = []
    fc2, hc2 = zero_fc, zero_hc
    for k, fd in enumerate(fds):
        pk, fc2, hc2 = ball_step(
            ball.tracknet.variables, fd, median_dev, fc2, hc2,
            coef_table, k * B, swap,
        )
        outs.append(pk)
    t_disp = time.perf_counter() - t0
    for o in outs:
        np.asarray(o)
    split["ball"] = time.perf_counter() - t0
    print(f"ball: {split['ball']:.2f}s (dispatch {t_disp:.2f}s) "
          f"= {split['ball'] / n_frames * 1e3:.1f} ms/frame", flush=True)

    # ---- full overlapped loop (run()-shaped): fresh uploads, 3 dispatches,
    #      depth-2 drain queue ----
    host_chunks2 = [base + np.uint8(100 + k) for k in range(NCH)]
    import collections
    pending = collections.deque()
    t0 = time.perf_counter()
    fc3, hc3 = zero_fc, zero_hc
    for k, hc_arr in enumerate(host_chunks2):
        fd = jnp.asarray(hc_arr)
        d = det_step(players.engine.variables, fd)
        p = pose_step(pose.engine.variables, fd)
        bpk, fc3, hc3 = ball_step(
            ball.tracknet.variables, fd, median_dev, fc3, hc3,
            coef_table, k * B, swap,
        )
        pending.append((d, p, bpk))
        if len(pending) > 2:
            for o in pending.popleft():
                np.asarray(o)
    while pending:
        for o in pending.popleft():
            np.asarray(o)
    split["full_loop"] = time.perf_counter() - t0
    print(f"full_loop: {split['full_loop']:.2f}s = "
          f"{split['full_loop'] / n_frames * 1e3:.1f} ms/frame "
          f"({n_frames / split['full_loop']:.2f} fps)", flush=True)

    print("\nSPLIT (ms/frame):")
    for k, v in split.items():
        if k.endswith("_dispatch"):
            continue
        print(f"  {k:16s} {v / n_frames * 1e3:7.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
