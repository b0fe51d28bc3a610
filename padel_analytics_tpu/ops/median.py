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
def _median_x2_u16(stack: jnp.ndarray) -> jnp.ndarray:
    """Twice the median over axis 0 of a uint8 stack, as uint16.

    Doubling keeps the even-count half-values (np.median averages the two
    middle elements, which can yield k + 0.5) exactly representable in an
    integer, so callers can choose truncated-uint8 or exact-float output.
    """
    n = stack.shape[0]
    s = jnp.sort(stack, axis=0)
    if n % 2 == 1:
        return s[n // 2].astype(jnp.uint16) * 2
    lo = s[n // 2 - 1].astype(jnp.uint16)
    hi = s[n // 2].astype(jnp.uint16)
    return lo + hi


def median_background(
    frames: np.ndarray | jnp.ndarray,
    row_chunk: int = 128,
    exact: bool = False,
) -> np.ndarray:
    """Median image of an (N, H, W, C) uint8 frame stack, computed on
    device in row chunks to bound sort workspace.

    exact=False: truncated uint8 (the reference's `median.astype('uint8')`
    for bg_mode='concat', iterable.py:77-79). exact=True: float32 with
    np.median semantics (can hold .5 values — what the reference keeps for
    the subtract modes, iterable.py:83)."""
    frames = np.asarray(frames) if isinstance(frames, np.ndarray) else frames
    n, h, w, c = frames.shape
    out = np.empty((h, w, c), dtype=np.float32 if exact else np.uint8)
    for r0 in range(0, h, row_chunk):
        r1 = min(r0 + row_chunk, h)
        tile = jnp.asarray(np.asarray(frames[:, r0:r1]))
        x2 = np.asarray(_median_x2_u16(tile))
        out[r0:r1] = (
            (x2.astype(np.float32) / 2.0) if exact else (x2 // 2).astype(np.uint8)
        )
    return out
