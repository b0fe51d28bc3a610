"""NMS parity fuzz: ops/nms.py against an independent numpy twin of
ultralytics' non_max_suppression semantics (ops.py: candidate conf gate on
the best class, score-descending sort capped at max_nms, class-offset
max_wh=7680, torchvision-greedy suppression at IoU > threshold, max_det
cap), plus the classes=[0] person pre-filter used by the players tracker
(players_tracker.py:351-359).

ultralytics itself is not installed in this image, so the twin is written
from its documented/observable algorithm rather than imported — scores are
drawn without ties so sort-stability differences cannot matter.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from padel_analytics_tpu.ops.nms import batched_nms

MAX_WH = 7680.0


def _iou_1_to_many(box, boxes):
    lt = np.maximum(box[:2], boxes[:, :2])
    rb = np.minimum(box[2:], boxes[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    area = (box[2] - box[0]) * (box[3] - box[1])
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(area + areas - inter, 1e-9)


def ultralytics_nms_twin(boxes, cls_scores, conf_thres, iou_thres, max_det,
                         classes=None, max_nms=30000):
    """Numpy twin of ultralytics non_max_suppression for one image.

    boxes: (A, 4) xyxy; cls_scores: (A, nc). Returns (boxes, scores,
    classes, original_indices) of the kept detections, score-descending.
    """
    conf = cls_scores.max(1)
    cls = cls_scores.argmax(1)
    cand = conf > conf_thres
    if classes is not None:
        cand &= np.isin(cls, classes)
    idx = np.nonzero(cand)[0]
    if idx.size == 0:
        return (np.zeros((0, 4)), np.zeros(0), np.zeros(0, int), idx)
    order = idx[np.argsort(-conf[idx], kind="stable")][:max_nms]
    b = boxes[order].astype(np.float64)
    s = conf[order]
    c = cls[order]
    offset = b + c[:, None] * MAX_WH
    keep = []
    suppressed = np.zeros(len(order), bool)
    for i in range(len(order)):
        if suppressed[i]:
            continue
        keep.append(i)
        if i + 1 < len(order):
            iou = _iou_1_to_many(offset[i], offset[i + 1 :])
            suppressed[i + 1 :] |= iou > iou_thres
    keep = keep[:max_det]
    return b[keep], s[keep], c[keep], order[keep]


def _random_detections(rng, a, nc):
    cx = rng.uniform(50, 900, a)
    cy = rng.uniform(50, 900, a)
    w = rng.uniform(10, 220, a)
    h = rng.uniform(10, 220, a)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    # Distinct scores (no ties): permutations of a strictly decreasing grid.
    flat = 0.999 - 0.998 * np.arange(a * nc) / (a * nc)
    cls_scores = rng.permutation(flat).reshape(a, nc)
    return boxes.astype(np.float32), cls_scores.astype(np.float32)


@pytest.mark.parametrize("nc,conf,iou,max_det", [
    (1, 0.5, 0.7, 16),
    (1, 0.25, 0.45, 8),
    (3, 0.5, 0.7, 16),
    (80, 0.4, 0.6, 12),
])
def test_batched_nms_matches_ultralytics_twin(rng, nc, conf, iou, max_det):
    a = 192
    for trial in range(4):
        boxes, cls_scores = _random_detections(rng, a, nc)
        ref_b, ref_s, ref_c, _ = ultralytics_nms_twin(
            boxes, cls_scores, conf, iou, max_det
        )

        scores = cls_scores.max(1)
        classes = cls_scores.argmax(1)
        ob, os_, oc, oi, ov = batched_nms(
            jnp.asarray(boxes[None]),
            jnp.asarray(scores[None]),
            jnp.asarray(classes[None].astype(np.int32)),
            conf_thres=conf,
            iou_thres=iou,
            max_det=max_det,
            top_k=a,
        )
        n = int(np.asarray(ov[0]).sum())
        assert n == len(ref_s), (trial, n, len(ref_s))
        np.testing.assert_allclose(np.asarray(ob[0])[:n], ref_b, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(os_[0])[:n], ref_s, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(oc[0])[:n], ref_c)


def test_person_class_prefilter_matches_classes0(rng):
    """players tracker semantics on an nc=80 head: anchors enter the
    person NMS only when person is their argmax class, like ultralytics'
    classes=[0]."""
    from padel_analytics_tpu.trackers.players import _person_scores

    a, nc = 256, 80
    boxes, cls_scores = _random_detections(rng, a, nc)
    conf, iou, max_det = 0.5, 0.7, 16

    ref_b, ref_s, _, _ = ultralytics_nms_twin(
        boxes, cls_scores, conf, iou, max_det, classes=[0]
    )

    s_person = np.asarray(_person_scores(jnp.asarray(cls_scores[None])))[0]
    ob, os_, _, _, ov = batched_nms(
        jnp.asarray(boxes[None]),
        jnp.asarray(s_person[None]),
        conf_thres=conf,
        iou_thres=iou,
        max_det=max_det,
        top_k=a,
    )
    n = int(np.asarray(ov[0]).sum())
    assert n == len(ref_s)
    np.testing.assert_allclose(np.asarray(ob[0])[:n], ref_b, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(os_[0])[:n], ref_s, rtol=1e-6)


def test_top_k_cap_is_lossless_for_sparse_scenes(rng):
    """The tracker call sites cap pre-NMS candidates at nms_top_k (128/64)
    — lossless when fewer candidates clear conf (padel scenes)."""
    a = 512
    boxes, cls_scores = _random_detections(rng, a, 1)
    # Push all but 40 below conf.
    scores = cls_scores[:, 0] * 0.4
    hot = rng.choice(a, 40, replace=False)
    scores[hot] = rng.uniform(0.55, 0.99, 40)
    ref_b, ref_s, _, _ = ultralytics_nms_twin(
        boxes, scores[:, None], 0.5, 0.7, 32
    )
    ob, os_, _, _, ov = batched_nms(
        jnp.asarray(boxes[None]),
        jnp.asarray(scores[None].astype(np.float32)),
        conf_thres=0.5,
        iou_thres=0.7,
        max_det=32,
        top_k=128,
    )
    n = int(np.asarray(ov[0]).sum())
    assert n == len(ref_s)
    np.testing.assert_allclose(np.asarray(ob[0])[:n], ref_b, rtol=1e-5)
