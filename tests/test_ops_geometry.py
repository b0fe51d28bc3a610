"""Homography, polygon, NMS, heatmap decode, ensemble, median op tests."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from padel_analytics_tpu.ops.ensemble import (
    get_ensemble_weight,
    overlap_ensemble_coefficients,
    ensemble_full,
    StreamingEnsembler,
)
from padel_analytics_tpu.ops.heatmap import decode_heatmaps
from padel_analytics_tpu.ops.homography import find_homography, project_points
from padel_analytics_tpu.ops.median import median_background
from padel_analytics_tpu.ops.nms import batched_nms, box_iou
from padel_analytics_tpu.ops.polygon import PolygonZone, points_in_polygon


# ---------------------------------------------------------------- homography


def _court_correspondences(rng, n=12, noise=0.0):
    src = rng.uniform(100, 1800, size=(n, 2))
    h_true = np.array(
        [[0.8, 0.1, 30.0], [-0.05, 1.1, -20.0], [1e-4, -2e-4, 1.0]]
    )
    ones = np.ones((n, 1))
    dst = np.concatenate([src, ones], axis=1) @ h_true.T
    dst = dst[:, :2] / dst[:, 2:3]
    dst = dst + rng.normal(0, noise, size=dst.shape)
    return src, dst


def test_homography_matches_cv2_exact(rng):
    src, dst = _court_correspondences(rng)
    h_cv, _ = cv2.findHomography(src, dst)
    h_ours = np.asarray(find_homography(jnp.asarray(src), jnp.asarray(dst)))
    # Compare action on points, not raw matrices.
    probe = rng.uniform(0, 1900, size=(50, 2))
    p_cv = cv2.perspectiveTransform(probe[None].astype(np.float64), h_cv)[0]
    p_ours = np.asarray(project_points(jnp.asarray(h_ours), jnp.asarray(probe)))
    # Sub-millipixel agreement (cv2 refines with LM, we with GN; the exact
    # residual depends on the point configuration drawn).
    np.testing.assert_allclose(p_ours, p_cv, rtol=0, atol=2e-3)


def test_homography_noisy_least_squares(rng):
    src, dst = _court_correspondences(rng, n=22, noise=1.5)
    h_cv, _ = cv2.findHomography(src, dst)
    h_ours = np.asarray(find_homography(jnp.asarray(src), jnp.asarray(dst)))
    probe = rng.uniform(0, 1900, size=(50, 2))
    p_cv = cv2.perspectiveTransform(probe[None].astype(np.float64), h_cv)[0]
    p_ours = np.asarray(project_points(jnp.asarray(h_ours), jnp.asarray(probe)))
    # cv2 refines with LM; we with GN — both should agree to sub-pixel.
    np.testing.assert_allclose(p_ours, p_cv, atol=0.05)


# ------------------------------------------------------------------- polygon


def test_points_in_polygon_against_cv2(rng):
    poly = np.array([[100, 500], [800, 480], [900, 100], [50, 120]], float)
    pts = rng.uniform(0, 1000, size=(500, 2))
    ours = np.asarray(points_in_polygon(jnp.asarray(pts), jnp.asarray(poly)))
    ref = np.array(
        [
            cv2.pointPolygonTest(poly.astype(np.float32), (float(x), float(y)), False)
            >= 0
            for x, y in pts
        ]
    )
    # Boundary-exact points may differ; none expected from uniform draws.
    assert (ours == ref).mean() > 0.995


def test_polygon_zone_bottom_center():
    poly = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    zone = PolygonZone(poly)
    xyxy = np.array(
        [
            [2, 2, 4, 8],  # bottom center (3, 8) inside
            [2, 2, 4, 20],  # bottom center (3, 20) outside
        ],
        float,
    )
    got = zone.trigger(xyxy)
    assert got.tolist() == [True, False]


# ---------------------------------------------------------------------- nms


def _numpy_nms(boxes, scores, conf, iou_thres, max_det):
    idx = np.argsort(-scores)
    idx = [i for i in idx if scores[i] > conf]
    keep = []
    while idx and len(keep) < max_det:
        i = idx.pop(0)
        keep.append(i)
        rest = []
        for j in idx:
            iou = np.asarray(
                box_iou(jnp.asarray(boxes[None, i]), jnp.asarray(boxes[None, j]))
            )[0, 0]
            if iou <= iou_thres:
                rest.append(j)
        idx = rest
    return keep


def test_batched_nms_matches_greedy(rng):
    b, a = 3, 64
    centers = rng.uniform(50, 500, size=(b, a, 2))
    sizes = rng.uniform(20, 80, size=(b, a, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=-1)
    scores = rng.uniform(0, 1, size=(b, a)).astype(np.float32)

    out_boxes, out_scores, _, out_index, valid = batched_nms(
        jnp.asarray(boxes.astype(np.float32)),
        jnp.asarray(scores),
        conf_thres=0.3,
        iou_thres=0.5,
        max_det=16,
    )
    for i in range(b):
        ref_keep = _numpy_nms(boxes[i], scores[i], 0.3, 0.5, 16)
        got = np.asarray(out_index[i])[np.asarray(valid[i])]
        assert got.tolist() == ref_keep
        np.testing.assert_allclose(
            np.asarray(out_boxes[i])[np.asarray(valid[i])],
            boxes[i][ref_keep],
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out_scores[i])[np.asarray(valid[i])], scores[i][ref_keep]
        )


def test_nms_empty_when_all_below_conf(rng):
    boxes = rng.uniform(0, 100, size=(1, 8, 4)).astype(np.float32)
    scores = np.full((1, 8), 0.1, np.float32)
    _, _, _, _, valid = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), conf_thres=0.5, iou_thres=0.5,
        max_det=4,
    )
    assert not np.asarray(valid).any()


# ------------------------------------------------------------------ heatmap


def _cv2_reference_decode(heatmap, threshold=0.5):
    """Replicates predict.py:7-39,149-221 semantics."""
    binary = ((heatmap > threshold) * 255).astype(np.uint8)
    if binary.max() == 0:
        return 0, 0, 0
    cnts, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    rects = [cv2.boundingRect(c) for c in cnts]
    best = max(range(len(rects)), key=lambda i: rects[i][2] * rects[i][3])
    x, y, w, h = rects[best]
    return int(x + w / 2), int(y + h / 2), 1


def _gaussian_blob(h, w, cy, cx, sigma=2.5, mag=1.0):
    ys, xs = np.mgrid[0:h, 0:w]
    return mag * np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * sigma**2))


def test_heatmap_decode_single_blob():
    hm = _gaussian_blob(72, 128, 30, 100)
    cx, cy, vis = decode_heatmaps(jnp.asarray(hm[None], jnp.float32))
    rx, ry, rv = _cv2_reference_decode(hm)
    assert (int(cx[0]), int(cy[0]), int(vis[0])) == (rx, ry, rv)


def test_heatmap_decode_multi_blob_largest_wins():
    hm = _gaussian_blob(72, 128, 20, 30, sigma=1.5) + _gaussian_blob(
        72, 128, 50, 90, sigma=4.0
    )
    cx, cy, vis = decode_heatmaps(jnp.asarray(hm[None], jnp.float32))
    rx, ry, rv = _cv2_reference_decode(hm)
    assert (int(cx[0]), int(cy[0]), int(vis[0])) == (rx, ry, rv)


def test_heatmap_decode_empty():
    hm = np.zeros((72, 128), np.float32)
    cx, cy, vis = decode_heatmaps(jnp.asarray(hm[None]))
    assert (int(cx[0]), int(cy[0]), int(vis[0])) == (0, 0, 0)


def test_heatmap_decode_random_batch(rng):
    hms = []
    for _ in range(6):
        hm = np.zeros((72, 128), np.float32)
        for _ in range(rng.integers(0, 3)):
            hm += _gaussian_blob(
                72,
                128,
                rng.integers(5, 67),
                rng.integers(5, 123),
                sigma=rng.uniform(1.0, 4.0),
            )
        hms.append(hm)
    hms = np.stack(hms)
    cx, cy, vis = decode_heatmaps(jnp.asarray(hms))
    for i in range(len(hms)):
        rx, ry, rv = _cv2_reference_decode(hms[i])
        assert (int(cx[i]), int(cy[i]), int(vis[i])) == (rx, ry, rv)


# ----------------------------------------------------------------- ensemble


def _reference_ensemble(window_preds, num_frames, seq_len, weight):
    """Direct numpy replication of ball_tracker.py:421-523."""
    num_sample = num_frames - seq_len + 1
    buffer_size = seq_len - 1
    buf = np.concatenate(
        [np.zeros((buffer_size,) + window_preds.shape[1:]), window_preds], axis=0
    )
    outs = []
    for s in range(num_sample):
        rows = buf[np.arange(seq_len) + s, np.arange(seq_len - 1, -1, -1)]
        if s < buffer_size:
            outs.append(rows.sum(0) / (s + 1))
        else:
            outs.append((rows * weight.reshape(-1, *([1] * (rows.ndim - 1)))).sum(0))
    # tail (ball_tracker.py:486-509)
    buf = np.concatenate(
        [buf, np.zeros((buffer_size,) + window_preds.shape[1:])], axis=0
    )
    s = num_sample - 1
    for frame_i in range(1, seq_len):
        rows = buf[np.arange(seq_len) + s + frame_i, np.arange(seq_len - 1, -1, -1)]
        outs.append(rows.sum(0) / (seq_len - frame_i))
    return np.stack(outs)


def test_ensemble_weights_parity():
    w = get_ensemble_weight(8, "weight")
    np.testing.assert_allclose(w, np.array([1, 2, 3, 4, 4, 3, 2, 1]) / 20.0)
    np.testing.assert_allclose(get_ensemble_weight(8, "average"), np.full(8, 1 / 8))


@pytest.mark.parametrize("num_frames", [12, 30])
def test_ensemble_full_matches_reference(rng, num_frames):
    seq_len = 8
    num_windows = num_frames - seq_len + 1
    preds = rng.uniform(0, 1, size=(num_windows, seq_len, 4, 6)).astype(np.float32)
    weight = get_ensemble_weight(seq_len, "weight")
    ref = _reference_ensemble(preds, num_frames, seq_len, weight)
    coef = overlap_ensemble_coefficients(num_frames, seq_len, "weight")
    out = np.asarray(ensemble_full(jnp.asarray(preds), jnp.asarray(coef), seq_len))
    assert out.shape[0] == num_frames
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_streaming_ensembler_matches_full(rng):
    num_frames, seq_len = 25, 8
    num_windows = num_frames - seq_len + 1
    preds = rng.uniform(0, 1, size=(num_windows, seq_len, 3)).astype(np.float32)
    coef = overlap_ensemble_coefficients(num_frames, seq_len)
    full = np.asarray(ensemble_full(jnp.asarray(preds), jnp.asarray(coef), seq_len))

    ens = StreamingEnsembler(num_frames, seq_len)
    chunks = [preds[:5], preds[5:6], preds[6:]]
    got = [np.asarray(ens.update(jnp.asarray(c))) for c in chunks]
    got.append(np.asarray(ens.finalize()))
    got = np.concatenate(got, axis=0)
    np.testing.assert_allclose(got, full, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------------- median


@pytest.mark.parametrize("n", [9, 10])
def test_median_background(rng, n):
    frames = rng.integers(0, 256, size=(n, 17, 23, 3), dtype=np.uint8)
    ours = median_background(frames, row_chunk=5)
    ref = np.median(frames, axis=0).astype("uint8")
    np.testing.assert_array_equal(ours, ref)


def test_rollprop_decode_matches_segments(rng):
    """Scatter-free rollprop decode == original segment decode on fuzz."""
    from padel_analytics_tpu.ops.heatmap import decode_heatmaps

    hms = []
    for _ in range(8):
        hm = np.zeros((72, 128), np.float32)
        for _ in range(rng.integers(0, 4)):
            hm += _gaussian_blob(
                72, 128, rng.integers(5, 67), rng.integers(5, 123),
                sigma=rng.uniform(1.0, 4.0),
            )
        hms.append(hm)
    x = jnp.asarray(np.stack(hms))
    a = decode_heatmaps(x, method="rollprop")
    b = decode_heatmaps(x, method="segments", num_iters=64)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
    for i in range(8):
        ref = _cv2_reference_decode(hms[i])
        assert (int(a[0][i]), int(a[1][i]), int(a[2][i])) == ref


def test_pallas_decode_interpret_matches(rng):
    from padel_analytics_tpu.ops.heatmap import decode_heatmaps
    from padel_analytics_tpu.ops.pallas_cc import decode_heatmaps_pallas

    hm = _gaussian_blob(16, 128, 8, 70, sigma=2.0).astype(np.float32)
    x = jnp.asarray(hm[None])
    a = decode_heatmaps(x, method="rollprop", num_iters=16)
    b = decode_heatmaps_pallas(x, num_iters=16, interpret=True)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
