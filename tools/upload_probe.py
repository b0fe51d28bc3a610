"""Characterize the host->device upload path: bandwidth vs content entropy
and transfer size. If the tunnel compresses on the wire, compressible
buffers upload much faster than random ones — which changes the whole
perf strategy (delta/planar encodings become wins).

Every buffer is unique (replay/dedup defeat): a distinct random byte is
added to each, and 'repeat' uploads use fresh copies.
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def sync(fd):
    # Index (not ravel: reshaping a tiled u8 layout materializes a padded
    # copy that OOMs at 400MB) to force the upload to complete.
    return int(np.asarray(fd[(0,) * fd.ndim]))


def timed_upload(name, make, n=4):
    arrs = [make(k) for k in range(n)]
    nbytes = arrs[0].nbytes
    # warm the executable path for the sync slice
    fd = jnp.asarray(arrs[0])
    sync(fd)
    t0 = time.perf_counter()
    for a in arrs:
        fd = jnp.asarray(a)
        sync(fd)
    dt = time.perf_counter() - t0
    gbps = nbytes * n / dt / 1e9
    print(f"{name:34s} {nbytes/1e6:8.1f} MB x{n}  {dt:6.2f}s  {gbps:7.3f} GB/s",
          flush=True)
    return gbps


def main():
    print("device:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    MB100 = (16, 1080, 1920, 3)

    rand = rng.integers(0, 256, MB100, dtype=np.uint8)

    timed_upload("zeros 100MB", lambda k: np.full(MB100, np.uint8(k), np.uint8))
    timed_upload("random 100MB", lambda k: rand + np.uint8(k + 1))

    # video-like: smooth background + a few shapes + mild noise (bench clip)
    base = np.full(MB100, 40, np.uint8)
    base[:, 200:900, 300:1700] = 90
    noise = rng.integers(0, 6, MB100, dtype=np.uint8)
    video_like = base + noise
    timed_upload("video-like 100MB", lambda k: video_like + np.uint8(k + 1))

    # natural-ish: low-frequency random field (more entropy than bench clip)
    small = rng.integers(0, 256, (16, 135, 240, 3), dtype=np.uint8)
    nat = np.repeat(np.repeat(small, 8, axis=1), 8, axis=2)
    nat = nat + rng.integers(0, 4, MB100, dtype=np.uint8)
    timed_upload("natural-ish 100MB", lambda k: nat + np.uint8(k + 1))

    # frame-delta of video-like content (mostly zeros)
    delta = np.zeros(MB100, np.uint8)
    delta[:, 500:520, 500:540] = 3
    timed_upload("delta-sparse 100MB", lambda k: delta + np.uint8(k % 2))

    # size sweep with random content
    for shape, label in [
        ((1, 1080, 1920, 3), "random 6.2MB"),
        ((4, 1080, 1920, 3), "random 25MB"),
        ((64, 1080, 1920, 3), "random 400MB"),
    ]:
        r = rng.integers(0, 256, shape, dtype=np.uint8)
        timed_upload(label, lambda k, r=r: r + np.uint8(k + 1), n=2)

    # float32 vs uint8 (4x bytes, same element count)
    rf = rng.random((16, 1080, 1920, 3), np.float32)
    timed_upload("random f32 400MB", lambda k: rf + np.float32(k), n=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
