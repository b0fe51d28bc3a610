"""Pallas TPU kernel: VMEM-resident connected-component bbox decode.

The rollprop heatmap decode (ops/heatmap.py:_decode_single_rollprop)
iterates 3x3 min/max propagation over five (H, W) int32 maps. Under plain
XLA each iteration round-trips those maps through HBM; this kernel keeps
all five maps (~3 MB for 288x512) in VMEM for the whole propagation, so
HBM sees exactly one heatmap read and two scalars written per frame.

Grid: one program per heatmap; all compute is VPU (rolls, min/max,
selects). Outputs are (cx, cy) int32 per frame, identical to the jnp
rollprop path (shared fuzz tests vs cv2's contour decode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1 << 24


def _neighbor_min(x, rows, cols, h, w):
    # pltpu.roll requires non-negative shifts: roll by size-1 == roll by -1.
    up = jnp.where(rows == h - 1, _BIG, pltpu.roll(x, h - 1, axis=0))
    down = jnp.where(rows == 0, _BIG, pltpu.roll(x, 1, axis=0))
    x = jnp.minimum(jnp.minimum(x, up), down)
    left = jnp.where(cols == w - 1, _BIG, pltpu.roll(x, w - 1, axis=1))
    right = jnp.where(cols == 0, _BIG, pltpu.roll(x, 1, axis=1))
    return jnp.minimum(jnp.minimum(x, left), right)


def _neighbor_max(x, rows, cols, h, w):
    up = jnp.where(rows == h - 1, -1, pltpu.roll(x, h - 1, axis=0))
    down = jnp.where(rows == 0, -1, pltpu.roll(x, 1, axis=0))
    x = jnp.maximum(jnp.maximum(x, up), down)
    left = jnp.where(cols == w - 1, -1, pltpu.roll(x, w - 1, axis=1))
    right = jnp.where(cols == 0, -1, pltpu.roll(x, 1, axis=1))
    return jnp.maximum(jnp.maximum(x, left), right)


def _make_kernel(h: int, w: int, threshold: float, num_iters: int):
    def kernel(hm_ref, out_ref):
        hm = hm_ref[0]
        mask = hm > threshold
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        idx = rows * w + cols

        state = (
            jnp.where(mask, rows, _BIG),
            jnp.where(mask, cols, _BIG),
            jnp.where(mask, rows, -1),
            jnp.where(mask, cols, -1),
            jnp.where(mask, idx, _BIG),
        )

        def body(_, state):
            mr, mc, xr, xc, fp = state
            mr = jnp.where(mask, _neighbor_min(mr, rows, cols, h, w), _BIG)
            mc = jnp.where(mask, _neighbor_min(mc, rows, cols, h, w), _BIG)
            xr = jnp.where(mask, _neighbor_max(xr, rows, cols, h, w), -1)
            xc = jnp.where(mask, _neighbor_max(xc, rows, cols, h, w), -1)
            fp = jnp.where(mask, _neighbor_min(fp, rows, cols, h, w), _BIG)
            return mr, mc, xr, xc, fp

        min_r, min_c, max_r, max_c, first = jax.lax.fori_loop(
            0, num_iters, body, state
        )

        bw = jnp.where(mask, max_c - min_c + 1, 0)
        bh = jnp.where(mask, max_r - min_r + 1, 0)
        area = bw * bh
        max_area = jnp.max(area)
        tie = jnp.where(mask & (area == max_area), first, -1)
        best_first = jnp.max(tie)
        winner = mask & (area == max_area) & (first == best_first)
        any_blob = jnp.any(mask)
        w_min_c = jnp.max(jnp.where(winner, min_c, -1))
        w_min_r = jnp.max(jnp.where(winner, min_r, -1))
        w_bw = jnp.max(jnp.where(winner, bw, -1))
        w_bh = jnp.max(jnp.where(winner, bh, -1))
        cx = jnp.where(any_blob, (w_min_c * 2 + w_bw) // 2, 0)
        cy = jnp.where(any_blob, (w_min_r * 2 + w_bh) // 2, 0)
        # VMEM-tile-aligned (1, 1, 128) output row: slot 0 = cx, slot 1 = cy.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
        out_ref[:, :, :] = jnp.where(lane == 0, cx, jnp.where(lane == 1, cy, 0))

    return kernel


@functools.partial(
    jax.jit, static_argnames=("threshold", "num_iters", "interpret")
)
def decode_heatmaps_pallas(
    heatmaps: jnp.ndarray,  # (B, H, W) float in [0, 1]
    threshold: float = 0.5,
    num_iters: int = 32,
    interpret: bool = False,
):
    """Pallas variant of ops.heatmap.decode_heatmaps. Compiled on TPU;
    pass interpret=True to run (slowly) on the CPU backend for testing."""
    b, h, w = heatmaps.shape
    kernel = _make_kernel(h, w, threshold, num_iters)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, 128), jnp.int32),
    )(heatmaps.astype(jnp.float32))
    cx = out[:, 0, 0]
    cy = out[:, 0, 1]
    vis = jnp.where((cx == 0) & (cy == 0), 0, 1).astype(jnp.int32)
    return cx, cy, vis
