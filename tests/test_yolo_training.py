"""YOLOv8 training subsystem: task-aligned assignment semantics on
hand-computed cases, loss sanity, an actual overfit run (losses must
drop substantially), and the mAP/OKS evaluation harness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from padel_analytics_tpu.models.yolov8 import YOLOv8, anchor_table, num_anchors
from padel_analytics_tpu.training.evaluate import detection_map, oks
from padel_analytics_tpu.training.yolo import (
    ciou,
    init_yolo_train_state,
    make_yolo_train_step,
    task_aligned_assign,
    yolo_detection_loss,
)

HW = (64, 64)


def test_anchor_table_matches_head_layout():
    centers, strides = anchor_table(*HW)
    assert centers.shape == (num_anchors(*HW), 2)
    assert strides[0] == 8 and strides[-1] == 32
    # first stride-8 anchor center is cell (0.5, 0.5) -> 4 px
    np.testing.assert_allclose(centers[0] * strides[0], [4.0, 4.0])


def test_ciou_identity_and_disjoint():
    a = jnp.asarray([10.0, 10.0, 30.0, 40.0])
    assert float(ciou(a, a)) == pytest.approx(1.0, abs=1e-6)
    b = jnp.asarray([100.0, 100.0, 120.0, 130.0])
    assert float(ciou(a, b)) < 0.0  # disjoint: IoU 0 minus distance penalty


def test_assigner_hand_case():
    """Two separated gts, anchors on a line: each gt claims only anchors
    inside it; an anchor inside both claims the better-overlap gt."""
    anc = jnp.asarray([[5.0, 5.0], [15.0, 5.0], [25.0, 5.0], [60.0, 60.0]])
    # predictions exactly equal to their gt for the first three anchors
    gt_boxes = jnp.asarray([[0.0, 0.0, 20.0, 10.0], [10.0, 0.0, 30.0, 10.0]])
    gt_labels = jnp.asarray([0, 0], jnp.int32)
    mask_gt = jnp.asarray([True, True])
    pd_boxes = jnp.asarray(
        [
            [0.0, 0.0, 20.0, 10.0],  # matches gt0
            [10.0, 0.0, 30.0, 10.0],  # inside both; predicts gt1 exactly
            [10.0, 0.0, 30.0, 10.0],  # matches gt1
            [50.0, 50.0, 70.0, 70.0],  # far away
        ]
    )
    pd_scores = jnp.full((4, 1), 0.9)

    fg, tgt_idx, tgt_scores, tgt_boxes = task_aligned_assign(
        pd_scores, pd_boxes, anc, gt_labels, gt_boxes, mask_gt
    )
    fg = np.asarray(fg)
    tgt_idx = np.asarray(tgt_idx)
    assert fg[0] and fg[1] and fg[2] and not fg[3]
    assert tgt_idx[0] == 0  # only inside gt0
    assert tgt_idx[1] == 1  # inside both, higher CIoU with gt1
    assert tgt_idx[2] == 1
    np.testing.assert_allclose(np.asarray(tgt_boxes)[1], [10, 0, 30, 10])
    assert np.asarray(tgt_scores)[3].sum() == 0.0


def test_assigner_all_padding_gts():
    anc = jnp.asarray([[5.0, 5.0]])
    fg, _, tgt_scores, _ = task_aligned_assign(
        jnp.full((1, 1), 0.5),
        jnp.asarray([[0.0, 0.0, 10.0, 10.0]]),
        anc,
        jnp.zeros((3,), jnp.int32),
        jnp.zeros((3, 4)),
        jnp.zeros((3,), bool),
    )
    assert not bool(np.asarray(fg)[0])
    assert float(jnp.sum(tgt_scores)) == 0.0


def _synthetic_batch(rng, b, m=2):
    """Images with bright rectangles at the gt boxes."""
    images = np.full((b,) + HW + (3,), 0.1, np.float32)
    gt_boxes = np.zeros((b, m, 4), np.float32)
    gt_labels = np.zeros((b, m), np.int32)
    mask = np.zeros((b, m), bool)
    for i in range(b):
        for j in range(m):
            x1 = rng.integers(2, 30)
            y1 = rng.integers(2, 30)
            w = rng.integers(12, 28)
            h = rng.integers(12, 28)
            gt_boxes[i, j] = [x1, y1, min(x1 + w, 63), min(y1 + h, 63)]
            mask[i, j] = True
            images[i, y1 : y1 + h, x1 : x1 + w] = 0.9
    return jnp.asarray(images), jnp.asarray(gt_labels), jnp.asarray(gt_boxes), jnp.asarray(mask)


def test_detection_training_overfits(rng):
    model = YOLOv8(variant="n", num_classes=1)
    optimizer = optax.adam(2e-3)
    state = init_yolo_train_state(
        model, jnp.zeros((1,) + HW + (3,), jnp.float32), optimizer
    )
    step = jax.jit(make_yolo_train_step(model, optimizer, HW))
    images, labels, boxes, mask = _synthetic_batch(rng, b=2)
    losses = []
    for _ in range(30):
        state, loss = step(state, images, labels, boxes, mask)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses[::6]


def test_pose_training_step_runs(rng):
    model = YOLOv8(variant="n", num_classes=1, num_keypoints=4)
    optimizer = optax.adam(1e-3)
    state = init_yolo_train_state(
        model, jnp.zeros((1,) + HW + (3,), jnp.float32), optimizer
    )
    step = jax.jit(make_yolo_train_step(model, optimizer, HW, pose=True))
    images, labels, boxes, mask = _synthetic_batch(rng, b=2)
    kpts = np.zeros((2, 2, 4, 3), np.float32)
    b_np = np.asarray(boxes)
    for i in range(2):
        for j in range(2):
            x1, y1, x2, y2 = b_np[i, j]
            for k in range(4):
                kpts[i, j, k] = [
                    x1 + (x2 - x1) * (k + 1) / 5.0,
                    y1 + (y2 - y1) * (k + 1) / 5.0,
                    2.0,
                ]
    losses = []
    # ~10 steps of adam warmup wobble before the drop (the assigner's
    # stop_gradient removed the old label-side shortcut that made the
    # first steps fall artificially fast), then steady descent. 40 steps:
    # the (2*sigma)^2 OKS exponent (ultralytics parity) makes the
    # keypoint term gentler than the old 2*sigma^2 form, so the same
    # 0.7x drop needs a few more steps.
    for _ in range(40):
        state, loss = step(state, images, labels, boxes, jnp.asarray(kpts), mask)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0], losses[::5]


def test_detection_loss_no_gt(rng):
    """Zero ground truths: loss reduces to the (finite) background cls term."""
    model = YOLOv8(variant="n", num_classes=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + HW + (3,)))
    out = model.apply(variables, jnp.zeros((1,) + HW + (3,)), raw=True)
    centers, strides = anchor_table(*HW)
    total, parts = yolo_detection_loss(
        out,
        jnp.asarray(centers * strides[:, None]),
        jnp.asarray(strides),
        jnp.zeros((1, 2), jnp.int32),
        jnp.zeros((1, 2, 4)),
        jnp.zeros((1, 2), bool),
    )
    assert np.isfinite(float(total))
    assert float(parts["box"]) == 0.0


# ----------------------------------------------------------------- eval


def test_detection_map_perfect_and_miss():
    gts = [np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float)]
    perfect = detection_map(
        [gts[0].copy()], [np.array([0.9, 0.8])], gts
    )
    assert perfect["map"] == pytest.approx(1.0)
    # one detection entirely wrong
    half = detection_map(
        [np.array([[0, 0, 10, 10], [100, 100, 120, 120]], float)],
        [np.array([0.9, 0.8])],
        gts,
    )
    assert 0.4 < half["map"] < 0.6
    # duplicate detections of one gt: the second is a false positive
    dup = detection_map(
        [np.array([[0, 0, 10, 10], [0, 0, 10, 10]], float)],
        [np.array([0.9, 0.8])],
        gts,
    )
    assert dup["map50"] == pytest.approx(0.5, abs=0.01)


def test_oks_perfect_and_offset():
    gt = np.array([[10, 10, 2], [20, 20, 2], [30, 30, 0]], float)
    pred = gt[:, :2].copy()
    assert oks(pred, gt, area=400.0) == pytest.approx(1.0)
    off = pred + 50.0
    assert oks(off, gt, area=400.0) < 0.1


def test_yolo_train_step_on_mesh(rng):
    """dp4 x tp2: image batch sharded over 'data', conv channels over
    'model' — GSPMD inserts the gradient all-reduce / TP collectives."""
    import jax as _jax

    from padel_analytics_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        shard_params_for_tp,
    )

    mesh = make_mesh(data=4, model=2)
    model = YOLOv8(variant="n", num_classes=1)
    optimizer = optax.adam(1e-3)
    state = init_yolo_train_state(
        model, jnp.zeros((1,) + HW + (3,), jnp.float32), optimizer
    )
    state.params = shard_params_for_tp(state.params, mesh)
    step = _jax.jit(make_yolo_train_step(model, optimizer, HW))
    images, labels, boxes, mask = _synthetic_batch(rng, b=4)
    images = _jax.device_put(np.asarray(images), batch_sharding(mesh))
    state, loss = step(state, images, labels, boxes, mask)
    assert np.isfinite(float(loss))


def test_train_yolo_cli_end_to_end(tmp_path):
    """The fine-tuning CLI trains on an ultralytics-layout dataset and
    writes a checkpoint loadable back into the model."""
    import cv2

    from padel_analytics_tpu.apps.train_yolo import main as train_main

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    r = np.random.default_rng(0)
    for i in range(4):
        img = np.full((80, 96, 3), 30, np.uint8)
        cv2.rectangle(img, (20, 20), (60, 60), (220, 220, 220), -1)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        # class cx cy w h, normalized
        (lbl_dir / f"im{i}.txt").write_text("0 0.42 0.5 0.42 0.5\n")
    out = tmp_path / "det.msgpack"
    rc = train_main(
        [
            "--images", str(img_dir), "--labels", str(lbl_dir),
            "--imgsz", "64", "--variant", "n", "--epochs", "1",
            "--batch", "4", "--max-gt", "4", "--out", str(out),
            "--data-parallel", "4", "--model-parallel", "2",
        ]
    )
    assert rc == 0 and out.exists()

    from padel_analytics_tpu.trackers import _engine

    model = YOLOv8(variant="n", num_classes=1)
    variables = _engine.load_variables(
        model, jnp.zeros((1, 64, 64, 3), jnp.float32), str(out)
    )
    o = model.apply(variables, jnp.zeros((2, 64, 64, 3), jnp.float32))
    assert o["boxes"].shape[0] == 2


def test_evaluate_cli_end_to_end(tmp_path, capsys):
    """The eval CLI scores a checkpoint on an ultralytics-layout dataset
    and prints one JSON line with mAP (and mean-OKS in pose mode)."""
    import cv2
    import json

    from padel_analytics_tpu.apps.evaluate import main as eval_main
    from padel_analytics_tpu.trackers import _engine

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    r = np.random.default_rng(1)
    for i in range(3):
        img = np.full((64, 64, 3), 30, np.uint8)
        cv2.rectangle(img, (16, 16), (48, 48), (220, 220, 220), -1)
        img += r.integers(0, 8, img.shape, dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        (lbl_dir / f"im{i}.txt").write_text(
            "0 0.5 0.5 0.5 0.5 0.4 0.4 2 0.6 0.6 2\n"
        )
    # random-weight pose checkpoint (scores plumbing, not accuracy)
    model = YOLOv8(variant="n", num_classes=1, num_keypoints=2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    w = tmp_path / "pose.msgpack"
    _engine.save_variables(variables, str(w))

    rc = eval_main(
        [
            "--images", str(img_dir), "--labels", str(lbl_dir),
            "--weights", str(w), "--variant", "n", "--imgsz", "64",
            "--keypoints", "2", "--conf", "0.0", "--batch", "2",
        ]
    )
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["images"] == 3
    assert 0.0 <= rec["map"] <= 1.0
    assert "mean_oks" in rec


def test_hflip_boxes_geometry(rng):
    from padel_analytics_tpu.training.augmentation import hflip_boxes

    images = jnp.asarray(rng.integers(0, 255, (4, 8, 16, 3)).astype(np.float32))
    boxes = jnp.asarray([[[2.0, 1.0, 6.0, 5.0]]] * 4)
    kpts = jnp.asarray([[[[3.0, 2.0, 2.0]]]] * 4)
    key = jax.random.PRNGKey(0)
    out_im, out_b, out_k = hflip_boxes(key, images, boxes, kpts, p=1.0)
    np.testing.assert_allclose(np.asarray(out_b)[0, 0], [10.0, 1.0, 14.0, 5.0])
    np.testing.assert_allclose(np.asarray(out_k)[0, 0, 0], [13.0, 2.0, 2.0])
    np.testing.assert_array_equal(
        np.asarray(out_im), np.asarray(images)[:, :, ::-1, :]
    )
    # p=0: identity
    same_im, same_b, _ = hflip_boxes(key, images, boxes, kpts, p=0.0)
    np.testing.assert_array_equal(np.asarray(same_im), np.asarray(images))
    np.testing.assert_array_equal(np.asarray(same_b), np.asarray(boxes))


def test_hflip_flip_idx_relabels_lr_pairs(rng):
    """Mirrored skeletons must swap left/right keypoint identities
    (ultralytics fliplr flip_idx), not just mirror coordinates."""
    from padel_analytics_tpu.training.augmentation import hflip_boxes

    images = jnp.zeros((1, 8, 16, 3), jnp.float32)
    boxes = jnp.asarray([[[2.0, 1.0, 6.0, 5.0]]])
    # kpt 0 = "left" at x=3, kpt 1 = "right" at x=5
    kpts = jnp.asarray([[[[3.0, 2.0, 2.0], [5.0, 4.0, 1.0]]]])
    key = jax.random.PRNGKey(0)
    _, _, out_k = hflip_boxes(key, images, boxes, kpts, p=1.0, flip_idx=[1, 0])
    ok = np.asarray(out_k)[0, 0]
    # slot 0 now carries the mirrored former "right" kpt (16-5=11, y=4, v=1)
    np.testing.assert_allclose(ok[0], [11.0, 4.0, 1.0])
    np.testing.assert_allclose(ok[1], [13.0, 2.0, 2.0])
    # p=0 with flip_idx: identity (no permutation on unflipped images)
    _, _, same_k = hflip_boxes(key, images, boxes, kpts, p=0.0, flip_idx=[1, 0])
    np.testing.assert_array_equal(np.asarray(same_k), np.asarray(kpts))


def test_assigner_targets_carry_no_gradient(rng):
    """The task-aligned targets are constants w.r.t. the predictions
    (ultralytics runs the assigner under no_grad): perturbing the loss
    through ONLY the label side must contribute zero gradient."""
    from padel_analytics_tpu.training.yolo import assign_batch

    a = 8
    anc = jnp.asarray(rng.uniform(0, 32, (a, 2)).astype(np.float32))
    gt_labels = jnp.zeros((1, 2), jnp.int32)
    gt_boxes = jnp.asarray([[[2.0, 2.0, 30.0, 30.0], [0, 0, 0, 0]]])
    mask_gt = jnp.asarray([[True, False]])

    def label_side_sum(scores):
        pd_boxes = jnp.tile(gt_boxes[:, :1], (1, a, 1))
        _, _, tgt_scores, _ = assign_batch(
            scores, pd_boxes, anc, gt_labels, gt_boxes, mask_gt
        )
        return jnp.sum(tgt_scores)

    scores = jnp.full((1, a, 1), 0.7)
    g = jax.grad(label_side_sum)(scores)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_mosaic4_geometry(rng):
    from padel_analytics_tpu.training.augmentation import mosaic4

    b, h, w, m = 4, 8, 12, 2
    images = jnp.asarray(rng.integers(0, 255, (b, h, w, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.tile(np.array([[1.0, 2.0, 5.0, 6.0], [0, 0, 0, 0]], np.float32), (b, 1, 1))
    )
    mask = jnp.asarray(np.tile(np.array([True, False]), (b, 1)))
    labels = jnp.zeros((b, m), jnp.int32)
    canvas, out_b, out_m, out_l = mosaic4(
        jax.random.PRNGKey(0), images, boxes, mask, labels
    )
    assert canvas.shape == (1, 2 * h, 2 * w, 3)
    ob = np.asarray(out_b).reshape(4, m, 4)
    np.testing.assert_allclose(ob[0, 0], [1, 2, 5, 6])  # top-left
    np.testing.assert_allclose(ob[1, 0], [1 + w, 2, 5 + w, 6])  # top-right
    np.testing.assert_allclose(ob[2, 0], [1, 2 + h, 5, 6 + h])  # bottom-left
    np.testing.assert_allclose(ob[3, 0], [1 + w, 2 + h, 5 + w, 6 + h])
    assert np.asarray(out_m).sum() == 4
    # pixel placement: quadrant 3 (bottom-right) equals image 3
    np.testing.assert_array_equal(
        np.asarray(canvas)[0, h:, w:], np.asarray(images)[3]
    )
