"""Median-background estimation over a frame stack.

The reference buffers up to `median_range` decoded frames in host RAM and
calls np.median over the stack (ball_tracker/iterable.py:59-83). Here the
median runs on device: the uint8 stack is sorted along the frame axis in
spatial tiles (bounding peak HBM) and the two middle elements averaged
with numpy's even-count semantics, then truncated to uint8 exactly like
the reference's `median.astype('uint8')` (iterable.py:77-79).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def _median_u8(stack: jnp.ndarray) -> jnp.ndarray:
    """Median over axis 0 of a uint8 stack, truncated to uint8."""
    n = stack.shape[0]
    s = jnp.sort(stack, axis=0)
    if n % 2 == 1:
        return s[n // 2]
    lo = s[n // 2 - 1].astype(jnp.uint16)
    hi = s[n // 2].astype(jnp.uint16)
    # np.median averages the two middles in float; astype(uint8) truncates,
    # so the result is floor((lo + hi) / 2).
    return ((lo + hi) // 2).astype(jnp.uint8)


def median_background(
    frames: np.ndarray | jnp.ndarray,
    row_chunk: int = 128,
) -> np.ndarray:
    """Median image of an (N, H, W, C) uint8 frame stack, computed on
    device in row chunks to bound sort workspace."""
    frames = np.asarray(frames) if isinstance(frames, np.ndarray) else frames
    n, h, w, c = frames.shape
    out = np.empty((h, w, c), dtype=np.uint8)
    for r0 in range(0, h, row_chunk):
        r1 = min(r0 + row_chunk, h)
        tile = jnp.asarray(np.asarray(frames[:, r0:r1]))
        out[r0:r1] = np.asarray(_median_u8(tile))
    return out
