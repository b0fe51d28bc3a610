"""Dense-scene pre-NMS truncation behavior with TRAINED weights
(round-4 verdict item 4).

The bench's random-init models used to saturate the fixed pre-NMS top_k
buffers on every frame (pose: ALL 33,600 anchors above conf, because an
untrained sigmoid sits near 0.5) — a workload no trained checkpoint
produces. These tests pin the real-workload claim the defaults rest on:
a TRAINED detector on scenes 5x denser than training gates to tens of
candidates, far under the players tracker's top_k=128
(trackers/players.py nms_top_k; thresholds from ultralytics' hidden NMS,
players_tracker.py:351-359), and the top_k pre-filter is a no-op there
(identical detections vs an 8x larger buffer)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_det():
    from tools.yolo_convergence_demo import run_demo

    out = run_demo(steps=150, verbose=False, force_cpu=False)
    assert out["after"]["map50"] >= 0.6, out["after"]
    return out["model"], out["variables"]


def _dense_scenes(rng, n, m=10, hw=(128, 128)):
    """Same object family as the training scenes (bright rects on noisy
    background, tools/yolo_convergence_demo.make_scenes) but a 128x128
    canvas packed with m of them — the 'dense scene' the top_k defaults
    must survive."""
    h, w = hw
    images = rng.uniform(0.05, 0.15, (n, h, w, 3)).astype(np.float32)
    gt_boxes = np.zeros((n, m, 4), np.float32)
    mask = np.zeros((n, m), bool)
    for i in range(n):
        for j in range(m):
            x1 = int(rng.integers(2, w - 28))
            y1 = int(rng.integers(2, h - 28))
            bw = int(rng.integers(14, 26))
            bh = int(rng.integers(14, 26))
            x2, y2 = min(x1 + bw, w - 1), min(y1 + bh, h - 1)
            gt_boxes[i, j] = [x1, y1, x2, y2]
            mask[i, j] = True
            images[i, y1:y2, x1:x2] = rng.uniform(0.75, 0.95)
    return images, gt_boxes, mask


def test_trained_candidates_far_below_topk_on_dense_scenes(trained_det):
    import jax.numpy as jnp

    from padel_analytics_tpu.ops.nms import candidate_count

    model, variables = trained_det
    rng = np.random.default_rng(11)
    images, _, _ = _dense_scenes(rng, 8)
    out = model.apply(variables, jnp.asarray(images))
    # players tracker gates at conf 0.5, pose at 0.25 (reference
    # thresholds) — check the laxer one
    n25 = np.asarray(candidate_count(out["scores"][..., 0], 0.25))
    n50 = np.asarray(candidate_count(out["scores"][..., 0], 0.5))
    # 10 objects/frame -> tens of candidates; the 128 buffer has >2x
    # headroom even at conf 0.25 on scenes 5x denser than training
    assert int(n25.max()) < 128 // 2, n25
    assert int(n50.max()) <= int(n25.max())
    assert int(n25.min()) >= 10, n25  # the objects ARE being detected


def test_topk_default_is_lossless_on_dense_scenes(trained_det):
    """top_k=128 (players default) produces IDENTICAL post-NMS output to
    an 8x larger buffer on dense scenes — the pre-filter never truncates
    a real trained workload."""
    import jax.numpy as jnp

    from padel_analytics_tpu.ops.nms import batched_nms

    model, variables = trained_det
    rng = np.random.default_rng(12)
    images, gt_boxes, mask = _dense_scenes(rng, 8)
    out = model.apply(variables, jnp.asarray(images))

    def run_nms(top_k):
        boxes, scores, _, _, valid = batched_nms(
            out["boxes"], out["scores"][..., 0],
            conf_thres=0.25, iou_thres=0.5, max_det=32, top_k=top_k,
        )
        return np.asarray(boxes), np.asarray(scores), np.asarray(valid)

    b128, s128, v128 = run_nms(128)
    b1024, s1024, v1024 = run_nms(1024)
    np.testing.assert_array_equal(v128, v1024)
    np.testing.assert_allclose(b128[v128], b1024[v1024], atol=1e-5)
    np.testing.assert_allclose(s128[v128], s1024[v1024], atol=1e-6)

    # and the dense scene is actually resolved: most GT objects matched
    found = 0
    total = int(mask.sum())
    for i in range(len(images)):
        for g in gt_boxes[i][mask[i]]:
            best = 0.0
            for b in b128[i][v128[i]]:
                ix1, iy1 = max(g[0], b[0]), max(g[1], b[1])
                ix2, iy2 = min(g[2], b[2]), min(g[3], b[3])
                inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                union = ((g[2] - g[0]) * (g[3] - g[1])
                         + (b[2] - b[0]) * (b[3] - b[1]) - inter)
                best = max(best, inter / max(union, 1e-9))
            found += best >= 0.5
    assert found / total >= 0.7, (found, total)
