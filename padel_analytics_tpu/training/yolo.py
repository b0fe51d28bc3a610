"""YOLOv8 detection / pose training: task-aligned assignment, CIoU + DFL +
BCE losses, and a mesh-sharded train step.

The reference never trains YOLO (its detection/pose weights come from
ultralytics checkpoints) — this is a framework EXTENSION so users can
fine-tune the padel detectors on TPU. The algorithm follows the
ultralytics v8 recipe (TaskAlignedAssigner with topk=10, alpha=0.5,
beta=6; v8DetectionLoss gains box 7.5 / cls 0.5 / dfl 1.5; pose keypoint
OKS-style loss) re-designed TPU-first: everything is fixed-shape and
vectorized — ground truths are padded to a static max_gt, the assigner is
pure jnp under vmap (no per-image Python), and the train step shards the
image batch over the mesh 'data' axis exactly like training/tracknet.py.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.yolov8 import REG_MAX, anchor_table

TAL_TOPK = 10
TAL_ALPHA = 0.5
TAL_BETA = 6.0
GAIN_BOX = 7.5
GAIN_CLS = 0.5
GAIN_DFL = 1.5
GAIN_POSE = 12.0
GAIN_KOBJ = 1.0


# ---------------------------------------------------------------- geometry


def ciou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU between broadcastable (..., 4) xyxy boxes."""
    ax1, ay1, ax2, ay2 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx1, by1, bx2, by2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    iw = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0)
    ih = jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0)
    inter = iw * ih
    area_a = jnp.clip(ax2 - ax1, 0) * jnp.clip(ay2 - ay1, 0)
    area_b = jnp.clip(bx2 - bx1, 0) * jnp.clip(by2 - by1, 0)
    union = area_a + area_b - inter + eps
    iou = inter / union

    cw = jnp.maximum(ax2, bx2) - jnp.minimum(ax1, bx1)
    ch = jnp.maximum(ay2, by2) - jnp.minimum(ay1, by1)
    c2 = cw**2 + ch**2 + eps
    rho2 = (
        ((bx1 + bx2) - (ax1 + ax2)) ** 2 + ((by1 + by2) - (ay1 + ay2)) ** 2
    ) / 4.0
    wa = ax2 - ax1
    ha = ay2 - ay1 + eps
    wb = bx2 - bx1
    hb = by2 - by1 + eps
    v = (4 / np.pi**2) * (jnp.arctan(wb / hb) - jnp.arctan(wa / ha)) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - v * alpha


# ---------------------------------------------------------------- assigner


def task_aligned_assign(
    pd_scores: jnp.ndarray,  # (A, nc) sigmoid class scores
    pd_bboxes: jnp.ndarray,  # (A, 4) decoded xyxy, pixels
    anc_points: jnp.ndarray,  # (A, 2) anchor centers, pixels
    gt_labels: jnp.ndarray,  # (M,) int32
    gt_bboxes: jnp.ndarray,  # (M, 4) xyxy, pixels
    mask_gt: jnp.ndarray,  # (M,) bool (padding rows False)
):
    """Single-image task-aligned assignment (ultralytics
    TaskAlignedAssigner semantics, fixed shapes).

    Returns (fg_mask (A,), target_gt_idx (A,), target_scores (A, nc),
    target_bboxes (A, 4)).
    """
    m = gt_bboxes.shape[0]
    eps = 1e-9

    # anchors inside each gt box
    lt = anc_points[None] - gt_bboxes[:, None, :2]  # (M, A, 2)
    rb = gt_bboxes[:, None, 2:] - anc_points[None]
    in_gts = jnp.min(jnp.concatenate([lt, rb], axis=-1), axis=-1) > eps

    overlaps = jnp.clip(ciou(gt_bboxes[:, None], pd_bboxes[None]), 0)  # (M, A)
    cls_score = jnp.take_along_axis(
        pd_scores.T, jnp.clip(gt_labels, 0)[:, None], axis=0
    )  # (M, A)
    align = (cls_score**TAL_ALPHA) * (overlaps**TAL_BETA)
    valid = in_gts & mask_gt[:, None]
    align = jnp.where(valid, align, 0.0)
    overlaps = jnp.where(valid, overlaps, 0.0)

    # top-k anchors per gt by alignment metric
    k = min(TAL_TOPK, align.shape[1])
    topv, topi = jax.lax.top_k(align, k)  # (M, k)
    topk_mask = jnp.zeros_like(align, dtype=bool)
    rows = jnp.arange(m)[:, None]
    topk_mask = topk_mask.at[rows, topi].set(topv > eps)
    mask_pos = topk_mask & valid  # (M, A)

    # an anchor claimed by several gts keeps the highest-overlap one
    n_claims = jnp.sum(mask_pos, axis=0)  # (A,)
    best_gt_by_iou = jnp.argmax(
        jnp.where(mask_pos, overlaps, -1.0), axis=0
    )  # (A,)
    claimed_gt = jnp.argmax(mask_pos, axis=0)
    target_gt_idx = jnp.where(n_claims > 1, best_gt_by_iou, claimed_gt)
    fg_mask = n_claims > 0

    # keep mask_pos rows consistent with the resolution for normalization
    resolved = (
        jax.nn.one_hot(target_gt_idx, m, dtype=bool).T & fg_mask[None]
    )  # (M, A)
    align = jnp.where(resolved, align, 0.0)
    overlaps_r = jnp.where(resolved, overlaps, 0.0)

    # normalized target scores: metric * max_overlap_per_gt / max_metric
    max_align = jnp.max(align, axis=1, keepdims=True)  # (M, 1)
    max_olap = jnp.max(overlaps_r, axis=1, keepdims=True)
    norm = align * max_olap / (max_align + eps)  # (M, A)
    score_per_anchor = jnp.sum(norm, axis=0)  # (A,) (one gt per anchor)

    labels = jnp.clip(gt_labels[target_gt_idx], 0)
    target_scores = (
        jax.nn.one_hot(labels, pd_scores.shape[-1])
        * score_per_anchor[:, None]
        * fg_mask[:, None]
    )
    target_bboxes = gt_bboxes[target_gt_idx]
    return fg_mask, target_gt_idx, target_scores, target_bboxes


# ------------------------------------------------------------------- loss


def _dfl_loss(box_logits: jnp.ndarray, target_dist: jnp.ndarray) -> jnp.ndarray:
    """Distribution focal loss per anchor: cross-entropy against the two
    integer bins bracketing each (l, t, r, b) target distance.
    box_logits (..., 4, REG_MAX); target_dist (..., 4) in [0, REG_MAX-1).
    Returns (...,) mean over the 4 sides."""
    tl = jnp.floor(target_dist)
    wr = target_dist - tl
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(box_logits, axis=-1)
    ll = jnp.take_along_axis(logp, tl.astype(jnp.int32)[..., None], axis=-1)[..., 0]
    lr = jnp.take_along_axis(
        logp, jnp.clip(tl + 1, 0, REG_MAX - 1).astype(jnp.int32)[..., None], axis=-1
    )[..., 0]
    return -(ll * wl + lr * wr).mean(axis=-1)


def assign_batch(
    pd_scores: jnp.ndarray,
    pd_bboxes: jnp.ndarray,
    anc_points_px: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    mask_gt: jnp.ndarray,
):
    """Batched task-aligned assignment on DETACHED predictions.

    The assigner builds the training TARGETS; ultralytics runs it under
    torch.no_grad on detached preds. Without the stop_gradient,
    value_and_grad would add a spurious term through the BCE labels and
    loss weights (the network could lower loss by suppressing alignment),
    and align = cls_score**0.5 has an infinite derivative at exactly 0 —
    a NaN factory once a sigmoid underflows."""
    return jax.vmap(task_aligned_assign, in_axes=(0, 0, None, 0, 0, 0))(
        jax.lax.stop_gradient(pd_scores),
        jax.lax.stop_gradient(pd_bboxes),
        anc_points_px,
        gt_labels,
        gt_bboxes,
        mask_gt,
    )


def yolo_detection_loss(
    out: dict,
    anc_points_px: jnp.ndarray,  # (A, 2)
    strides: jnp.ndarray,  # (A,)
    gt_labels: jnp.ndarray,  # (B, M)
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy pixels
    mask_gt: jnp.ndarray,  # (B, M)
    targets=None,  # precomputed assign_batch output (pose loss reuses it)
) -> tuple[jnp.ndarray, dict]:
    """v8DetectionLoss: BCE cls + CIoU box + DFL, task-aligned targets."""
    pd_scores = out["scores"]
    pd_bboxes = out["boxes"]
    cls_logits = out["cls_logits"]
    box_logits = out["box_logits"]

    if targets is None:
        targets = assign_batch(
            pd_scores, pd_bboxes, anc_points_px, gt_labels, gt_bboxes, mask_gt
        )
    fg, _, tgt_scores, tgt_boxes = targets

    tss = jnp.maximum(jnp.sum(tgt_scores), 1.0)

    # cls: BCE over ALL anchors against the aligned soft targets
    cls_loss = (
        jnp.sum(optax.sigmoid_binary_cross_entropy(cls_logits, tgt_scores))
        / tss
    )

    weight = jnp.sum(tgt_scores, axis=-1) * fg  # (B, A)
    iou = ciou(pd_bboxes, tgt_boxes)
    box_loss = jnp.sum((1.0 - iou) * weight) / tss

    # DFL targets: gt box as (l, t, r, b) distances in CELLS of each anchor
    d = jnp.concatenate(
        [
            anc_points_px[None] - tgt_boxes[..., :2],
            tgt_boxes[..., 2:] - anc_points_px[None],
        ],
        axis=-1,
    ) / strides[None, :, None]
    d = jnp.clip(d, 0, REG_MAX - 1 - 0.01)
    dfl = _dfl_loss(box_logits, d)
    dfl_loss = jnp.sum(dfl * weight) / tss

    total = GAIN_BOX * box_loss + GAIN_CLS * cls_loss + GAIN_DFL * dfl_loss
    return total, {"box": box_loss, "cls": cls_loss, "dfl": dfl_loss}


def yolo_pose_loss(
    out: dict,
    anc_points_px: jnp.ndarray,
    strides: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    gt_kpts: jnp.ndarray,  # (B, M, K, 3) x, y px + visibility
    mask_gt: jnp.ndarray,
) -> tuple[jnp.ndarray, dict]:
    """v8PoseLoss: detection loss + OKS-style keypoint location loss +
    keypoint-visibility BCE on the assigned anchors."""
    targets = assign_batch(
        out["scores"], out["boxes"], anc_points_px, gt_labels, gt_bboxes,
        mask_gt,
    )
    det_total, parts = yolo_detection_loss(
        out, anc_points_px, strides, gt_labels, gt_bboxes, mask_gt,
        targets=targets,
    )
    fg, tgt_idx, tgt_scores, tgt_boxes = targets
    tss = jnp.maximum(jnp.sum(tgt_scores), 1.0)
    weight = jnp.sum(tgt_scores, axis=-1) * fg  # (B, A)

    kpts = out["kpts"]  # decoded (B, A, K, 3), conf sigmoid
    kpt_raw = out["kpt_raw"]  # (B, A, K, 3) raw (conf pre-sigmoid)
    tgt_kpts = jnp.take_along_axis(
        gt_kpts, tgt_idx[..., None, None], axis=1
    )  # (B, A, K, 3)
    vis = (tgt_kpts[..., 2] > 0).astype(jnp.float32)  # (B, A, K)

    area = jnp.clip(
        (tgt_boxes[..., 2] - tgt_boxes[..., 0])
        * (tgt_boxes[..., 3] - tgt_boxes[..., 1]),
        1e-9,
    )  # (B, A)
    d2 = jnp.sum((kpts[..., :2] - tgt_kpts[..., :2]) ** 2, axis=-1)  # (B, A, K)
    nk = kpts.shape[2]
    # ultralytics KeypointLoss / COCO OKS exponent: d^2 / (2*area*(2*sigma)^2)
    # (matches training/evaluate.py oks(); uniform sigma = 1/K).
    sigma = 1.0 / nk
    e = d2 / ((2.0 * sigma) ** 2) / (area[..., None] + 1e-9) / 2.0
    kpt_mask = vis * fg[..., None]
    loc = (1.0 - jnp.exp(-e)) * kpt_mask
    pose_loss = jnp.sum(loc * weight[..., None]) / tss

    # ultralytics kobj is BCEWithLogits(pred_vis, kpt_mask).mean() over
    # ALL fg keypoint entries (visible or not) — normalizing by visible
    # count alone inflates the term ~K-fold under heavy occlusion.
    kobj = optax.sigmoid_binary_cross_entropy(kpt_raw[..., 2], vis)
    denom_kobj = jnp.maximum(jnp.sum(fg) * nk, 1.0)
    kobj_loss = jnp.sum(kobj * fg[..., None]) / denom_kobj

    total = det_total + GAIN_POSE * pose_loss + GAIN_KOBJ * kobj_loss
    parts.update({"pose": pose_loss, "kobj": kobj_loss})
    return total, parts


# -------------------------------------------------------------- train step


# One shared train-state pytree serves every model family (inpaintnet
# already reuses it); the alias keeps the public name.
from .tracknet import TrackNetTrainState as YoloTrainState  # noqa: E402
from .tracknet import init_train_state as _init_train_state  # noqa: E402


def init_yolo_train_state(
    model, example_input: jnp.ndarray, optimizer: optax.GradientTransformation
) -> YoloTrainState:
    return _init_train_state(model, example_input, optimizer)


def make_yolo_train_step(
    model,
    optimizer: optax.GradientTransformation,
    image_hw: tuple[int, int],
    pose: bool = False,
) -> Callable:
    """Build a jittable train step.

    Detection: (state, images (B,H,W,3 in [0,1]), gt_labels (B,M),
    gt_bboxes (B,M,4 px), mask_gt (B,M)) -> (state, loss).
    Pose adds gt_kpts (B,M,K,3). Shard images/gts over 'data' and params
    over 'model' (parallel/mesh.py) before calling; XLA GSPMD inserts the
    gradient all-reduce and TP collectives.
    """
    centers, strides = anchor_table(*image_hw)
    anc_px = jnp.asarray(centers * strides[:, None])
    strides_j = jnp.asarray(strides)

    def loss_fn(params, batch_stats, images, *gts):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            raw=True,
            mutable=["batch_stats"],
        )
        if pose:
            gt_labels, gt_bboxes, gt_kpts, mask_gt = gts
            total, _ = yolo_pose_loss(
                out, anc_px, strides_j, gt_labels, gt_bboxes, gt_kpts, mask_gt
            )
        else:
            gt_labels, gt_bboxes, mask_gt = gts
            total, _ = yolo_detection_loss(
                out, anc_px, strides_j, gt_labels, gt_bboxes, mask_gt
            )
        return total, updates["batch_stats"]

    def train_step(state: YoloTrainState, images, *gts):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, images, *gts
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        return (
            YoloTrainState(
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats,
                opt_state=new_opt,
                step=state.step + 1,
            ),
            loss,
        )

    return train_step
