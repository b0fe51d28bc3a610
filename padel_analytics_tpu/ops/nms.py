"""On-device batched non-maximum suppression with fixed-size outputs.

The reference never sees NMS — it is hidden inside ultralytics
YOLO.predict (players_tracker.py:351-359: conf .5, iou .7;
players_keypoints_tracker.py:285-292: conf .25; keypoints_tracker.py:238-245).
This implementation reproduces ultralytics' semantics (score-descending
greedy suppression at an IoU threshold, class-offset trick for multi-class)
as a shape-static jnp op: every frame yields exactly `max_det` slots plus a
validity mask, so the whole batch stays on device through the polygon
filter and projection stages — no ragged host round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of (N, 4) x (M, 4) xyxy boxes -> (N, M)."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def _nms_single(
    boxes: jnp.ndarray,  # (A, 4) xyxy
    scores: jnp.ndarray,  # (A,)
    classes: jnp.ndarray,  # (A,) int32
    conf_thres: float,
    iou_thres: float,
    max_det: int,
    top_k: int,
):
    a = boxes.shape[0]
    k = min(top_k, a)

    masked_scores = jnp.where(scores > conf_thres, scores, -jnp.inf)
    top_scores, order = jax.lax.top_k(masked_scores, k)
    top_boxes = boxes[order]
    top_classes = classes[order]
    valid = jnp.isfinite(top_scores)

    # Class-offset trick: boxes of different classes never overlap.
    offset = (top_classes.astype(boxes.dtype) * 7680.0)[:, None]
    iou = box_iou(top_boxes + offset, top_boxes + offset)

    def body(i, state):
        keep, suppressed = state
        keep_i = valid[i] & ~suppressed[i]
        keep = keep.at[i].set(keep_i)
        row = iou[i] > iou_thres
        later = jnp.arange(k) > i
        suppressed = suppressed | (keep_i & row & later)
        return keep, suppressed

    keep, _ = jax.lax.fori_loop(
        0,
        k,
        body,
        (jnp.zeros((k,), bool), jnp.zeros((k,), bool)),
    )

    # Compact kept entries (already score-descending) into max_det slots.
    position = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep, position, max_det)  # overflow slot max_det is dropped
    out_boxes = jnp.zeros((max_det + 1, 4), boxes.dtype).at[slot].set(top_boxes)
    out_scores = jnp.zeros((max_det + 1,), scores.dtype).at[slot].set(top_scores)
    out_classes = jnp.zeros((max_det + 1,), classes.dtype).at[slot].set(top_classes)
    out_index = jnp.full((max_det + 1,), -1, jnp.int32).at[slot].set(order)
    n_kept = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), max_det)
    out_valid = jnp.arange(max_det) < n_kept
    return (
        out_boxes[:max_det],
        out_scores[:max_det],
        out_classes[:max_det],
        out_index[:max_det],  # index into the original anchor axis
        out_valid,
    )


def candidate_count(scores: jnp.ndarray, conf_thres: float) -> jnp.ndarray:
    """Per-frame count of pre-NMS candidates above `conf_thres` for a
    (B, A) score tensor -> (B,) int32. Compared against the `top_k`
    pre-filter cap this detects silent candidate truncation (PARITY.md §6:
    ultralytics keeps max_nms=30000, we keep top_k): when
    count > top_k the NMS input was clipped and detections may differ."""
    return jnp.sum(scores > conf_thres, axis=-1).astype(jnp.int32)


class SaturationCounter:
    """Host-side tally of NMS pre-filter saturation with a one-shot
    warning. Feed the per-frame `candidate_count` output each step."""

    def __init__(self, name: str, top_k: int):
        self.name = name
        self.top_k = top_k
        self.saturated_frames = 0
        self.total_frames = 0
        self.max_candidates = 0
        self._warned = False

    def update(self, n_candidates) -> None:
        import numpy as np

        n = np.asarray(n_candidates)
        self.total_frames += int(n.size)
        if n.size:
            self.max_candidates = max(self.max_candidates, int(n.max()))
        sat = int((n > self.top_k).sum())
        if sat:
            self.saturated_frames += sat
            if not self._warned:
                self._warned = True
                print(
                    f"{self.name}: WARNING pre-NMS candidates exceed "
                    f"top_k={self.top_k} on {sat} frame(s) (max "
                    f"{int(n.max())}); detections may be truncated — "
                    "raise nms_top_k for dense scenes"
                )

    def summary(self) -> dict:
        return {
            "top_k": self.top_k,
            "saturated_frames": self.saturated_frames,
            "total_frames": self.total_frames,
            "max_candidates": self.max_candidates,
        }


@functools.partial(
    jax.jit, static_argnames=("conf_thres", "iou_thres", "max_det", "top_k")
)
def batched_nms(
    boxes: jnp.ndarray,  # (B, A, 4) xyxy
    scores: jnp.ndarray,  # (B, A)
    classes: jnp.ndarray | None = None,  # (B, A) int32
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    max_det: int = 300,
    top_k: int = 256,
):
    """Batched NMS. Returns (boxes (B,max_det,4), scores (B,max_det),
    classes (B,max_det), index (B,max_det), valid (B,max_det))."""
    if classes is None:
        classes = jnp.zeros(scores.shape, jnp.int32)
    fn = functools.partial(
        _nms_single,
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        max_det=max_det,
        top_k=top_k,
    )
    return jax.vmap(fn)(boxes, scores, classes)
