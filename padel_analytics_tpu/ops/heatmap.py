"""Heatmap -> ball-coordinate decoding as an on-device op.

The reference decodes every TrackNet heatmap on the host with OpenCV:
threshold 0.5 -> cv2.findContours -> boundingRect -> pick the largest-area
box -> its center (/root/reference/trackers/ball_tracker/predict.py:7-39,
149-221). That is a per-frame CPU hot spot.

TPU-native equivalent: connected-component labeling by iterative 8-neighbor
max-propagation (a handful of cheap VPU max-pool sweeps — thresholded
Gaussian blobs are only a few pixels wide), then per-label bounding boxes
via segment reductions, then the largest-area box's center. Matches the
cv2 semantics including multi-blob tie behavior (largest area wins; cv2
scans contours bottom-up so exact ties may differ) and the (0, 0)/vis=0
convention for empty heatmaps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _label_components(mask: jnp.ndarray, num_iters: int) -> jnp.ndarray:
    """8-connected component labels by max-propagation.

    mask: (H, W) bool. Returns int32 labels, 0 = background; each blob's
    label is (max linear index in blob) + 1.
    """
    h, w = mask.shape
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        + 1
    )
    labels = jnp.where(mask, idx, 0)

    def step(labels, _):
        grown = jax.lax.reduce_window(
            labels,
            jnp.int32(0),
            jax.lax.max,
            window_dimensions=(3, 3),
            window_strides=(1, 1),
            padding="SAME",
        )
        return jnp.where(mask, grown, 0), None

    labels, _ = jax.lax.scan(step, labels, None, length=num_iters)
    return labels


def _decode_single(heatmap: jnp.ndarray, threshold: float, num_iters: int):
    h, w = heatmap.shape
    mask = heatmap > threshold
    labels = _label_components(mask, num_iters)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)
    flat_labels = labels.reshape(-1)

    num_segments = h * w + 1
    min_r = jax.ops.segment_min(rows, flat_labels, num_segments=num_segments)
    max_r = jax.ops.segment_max(rows, flat_labels, num_segments=num_segments)
    min_c = jax.ops.segment_min(cols, flat_labels, num_segments=num_segments)
    max_c = jax.ops.segment_max(cols, flat_labels, num_segments=num_segments)
    counts = jax.ops.segment_sum(
        jnp.ones_like(flat_labels), flat_labels, num_segments=num_segments
    )

    present = counts > 0
    present = present.at[0].set(False)  # background
    # cv2.boundingRect: w = max_c - min_c + 1, h likewise; area = w * h.
    bw = jnp.where(present, max_c - min_c + 1, 0)
    bh = jnp.where(present, max_r - min_r + 1, 0)
    area = bw * bh
    # Tie-break parity with the reference (predict.py:29-35): cv2 returns
    # contours in reverse raster-scan encounter order and the loop keeps the
    # FIRST maximum, i.e. among equal areas the blob whose topmost-leftmost
    # pixel comes LAST in raster order wins.
    first_pix = jax.ops.segment_min(
        rows * w + cols, flat_labels, num_segments=num_segments
    )
    max_area = jnp.max(area)
    tie_key = jnp.where(present & (area == max_area), first_pix, -1)
    best = jnp.argmax(tie_key)

    any_blob = jnp.any(mask)
    # predict.py:133: center = int(x + w/2), int(y + h/2) with int truncation.
    cx = jnp.where(any_blob, (min_c[best] * 2 + bw[best]) // 2, 0)
    cy = jnp.where(any_blob, (min_r[best] * 2 + bh[best]) // 2, 0)
    return cx.astype(jnp.int32), cy.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("threshold", "num_iters"))
def decode_heatmaps(
    heatmaps: jnp.ndarray,  # (B, H, W) float in [0, 1]
    threshold: float = 0.5,
    num_iters: int = 64,
):
    """Decode a batch of heatmaps to (cx, cy, visibility) int32 arrays in
    heatmap pixel coordinates. visibility = 0 iff cx == cy == 0
    (predict.py:216)."""
    fn = functools.partial(
        _decode_single, threshold=threshold, num_iters=num_iters
    )
    cx, cy = jax.vmap(fn)(heatmaps)
    vis = jnp.where((cx == 0) & (cy == 0), 0, 1).astype(jnp.int32)
    return cx, cy, vis
