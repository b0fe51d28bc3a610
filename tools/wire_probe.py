"""Interleaved A/B of the derived-ingest wire buffer upload at different
wire_long_side values. The e2e bench's run-to-run tunnel variance (±30%)
swamps a 2x bytes/frame change across SEPARATE runs; interleaving the
two sizes within one process samples the same tunnel weather.

Packs REAL bench-clip frames (bench.make_clip content, mp4v-decoded) the
exact way FusedPipeline._pack_chunk does (cv2 INTER_AREA + RGB2YUV_I420),
perturbs one byte per frame per rep (replay-cache defeat), and times
jnp.asarray + a scalar sync.

Usage: python tools/wire_probe.py [n_frames=64] [sizes=960,640]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def pack(frames, long_side):
    import cv2

    h, w = frames[0].shape[:2]
    scale = min(1.0, long_side / max(h, w))
    wh = max(2, int(round(h * scale / 2)) * 2)
    ww = max(2, int(round(w * scale / 2)) * 2)
    return np.stack(
        [
            cv2.cvtColor(
                cv2.resize(f, (ww, wh), interpolation=cv2.INTER_AREA),
                cv2.COLOR_RGB2YUV_I420,
            )
            for f in frames
        ]
    )


def main():
    import cv2

    import jax
    import jax.numpy as jnp

    from bench import make_clip

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sizes = (
        [int(s) for s in sys.argv[2].split(",")] if len(sys.argv) > 2
        else [960, 640]
    )
    print("device:", jax.devices(), flush=True)

    with tempfile.TemporaryDirectory() as td:
        clip = str(Path(td) / "clip.mp4")
        make_clip(clip, 1920, 1080, n)
        cap = cv2.VideoCapture(clip)
        frames = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
        cap.release()

    bufs = {s: pack(frames, s) for s in sizes}
    rng = np.random.default_rng(0)

    def sync(fd):
        return int(np.asarray(fd[(0,) * fd.ndim]))

    # Warm each size's executable path once (uncounted).
    for s in sizes:
        sync(jnp.asarray(bufs[s]))

    reps = 6
    times: dict[int, list[float]] = {s: [] for s in sizes}
    for r in range(reps):
        for s in sizes:
            b = bufs[s].copy()
            # unique content each rep: one random byte per frame
            idx = rng.integers(0, b[0].size, size=len(b))
            flat = b.reshape(len(b), -1)
            flat[np.arange(len(b)), idx] ^= np.uint8(r + 1)
            t0 = time.perf_counter()
            fd = jnp.asarray(b)
            sync(fd)
            times[s].append(time.perf_counter() - t0)

    print(f"\ninterleaved upload, {n} frames/buffer, {reps} reps:")
    for s in sizes:
        ts = np.array(times[s])
        mb = bufs[s].nbytes / 1e6
        med = float(np.median(ts))
        print(
            f"  wire {s:4d}: {mb:7.1f} MB  median {med:6.3f}s "
            f"({med / n * 1e3:6.2f} ms/frame, {mb / med:6.1f} MB/s)  "
            f"all={np.round(ts, 3).tolist()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
