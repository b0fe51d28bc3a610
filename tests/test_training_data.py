"""Training data pipeline + train CLI smoke test on a synthetic rally."""

import csv
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp


@pytest.fixture(scope="module")
def rally_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("match")
    rid = "1_00_01"
    frame_dir = root / "frame" / rid
    csv_dir = root / "csv"
    frame_dir.mkdir(parents=True)
    csv_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    n, h, w = 14, 90, 160
    for i in range(n):
        img = np.full((h, w, 3), 60, np.uint8)
        x, y = 10 + i * 9, 40 + int(6 * np.sin(i))
        visible = i % 5 != 4
        if visible:
            cv2.circle(img, (x, y), 2, (250, 250, 120), -1)
        img += rng.integers(0, 6, img.shape, dtype=np.uint8)
        cv2.imwrite(str(frame_dir / f"{i}.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        rows.append(
            {"Frame": i, "X": x if visible else 0, "Y": y if visible else 0,
             "Visibility": 1 if visible else 0}
        )
    with open(csv_dir / f"{rid}_ball.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["Frame", "X", "Y", "Visibility"])
        writer.writeheader()
        writer.writerows(rows)
    return str(root), rid


def test_load_rally_and_batches(rally_dir):
    from padel_analytics_tpu.training.data import load_rally, window_batches

    root, rid = rally_dir
    clip = load_rally(root, rid, height=48, width=80)
    assert clip.frames.shape == (14, 48, 80, 3)
    assert clip.median.shape == (48, 80, 3)
    # invisible frames have (0, 0) coords
    assert (clip.coords[clip.visibility == 0] == 0).all()
    # visible coords scaled into model pixels
    vis_coords = clip.coords[clip.visibility == 1]
    assert (vis_coords[:, 0] <= 80).all() and (vis_coords[:, 1] <= 48).all()

    batches = list(window_batches(clip, seq_len=4, batch_size=2))
    assert batches
    x, labels = batches[0]
    assert x.shape == (2, 48, 80, 15)  # (L+1)*3 channels
    assert labels.shape == (2, 48, 80, 4)
    assert float(x.max()) <= 1.0
    # labels are binary discs
    assert set(np.unique(np.asarray(labels))) <= {0.0, 1.0}

    # mixup path
    import jax

    batches = list(
        window_batches(clip, seq_len=4, batch_size=2, mixup_alpha=0.5,
                       jax_rng=jax.random.PRNGKey(1))
    )
    x, labels = batches[0]
    assert x.shape == (2, 48, 80, 15)
    assert float(labels.max()) <= 1.0


def test_train_cli_smoke(rally_dir, tmp_path):
    from padel_analytics_tpu.apps.train_tracknet import main

    root, rid = rally_dir
    out = tmp_path / "tn.msgpack"
    rc = main(
        [
            "--match-dir", root, "--rallies", rid,
            "--epochs", "1", "--batch", "2", "--seq-len", "4",
            "--height", "48", "--width", "80",
            "--data-parallel", "2", "--model-parallel", "2",
            "--out", str(out),
        ]
    )
    assert rc == 0 and out.exists() and out.stat().st_size > 1000


@pytest.fixture(scope="module")
def inpaint_rally_dir(tmp_path_factory):
    """A rally with a predicted_csv (the reference's coordinate-mode
    layout, dataset.py:306-312)."""
    root = tmp_path_factory.mktemp("match_inp")
    rid = "1_00_01"
    pred_dir = root / "predicted_csv"
    csv_dir = root / "csv"
    pred_dir.mkdir(parents=True)
    csv_dir.mkdir()
    n, w, h = 80, 640, 360
    rng = np.random.default_rng(1)
    xs = np.linspace(40, 600, n)
    ys = 180 + 120 * np.sin(np.linspace(0, 4, n))
    vis = np.ones(n, int)
    mask = np.zeros(n, int)
    mask[25:32] = 1  # a detection gap to inpaint
    rows_pred, rows_gt = [], []
    for i in range(n):
        drop = mask[i] == 1
        rows_pred.append(
            {
                "Frame": i,
                "X": 0 if drop else int(xs[i] + rng.normal(0, 1)),
                "Y": 0 if drop else int(ys[i] + rng.normal(0, 1)),
                "Visibility": 0 if drop else 1,
                "X_GT": int(xs[i]),
                "Y_GT": int(ys[i]),
                "Visibility_GT": vis[i],
                "Inpaint_Mask": mask[i],
            }
        )
        rows_gt.append(
            {"Frame": i, "X": int(xs[i]), "Y": int(ys[i]), "Visibility": 1}
        )
    with open(pred_dir / f"{rid}_ball.csv", "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=list(rows_pred[0]))
        wtr.writeheader()
        wtr.writerows(rows_pred)
    with open(csv_dir / f"{rid}_ball.csv", "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=["Frame", "X", "Y", "Visibility"])
        wtr.writeheader()
        wtr.writerows(rows_gt)
    return str(root), rid, (w, h)


def test_inpaint_rally_and_batches(inpaint_rally_dir):
    from padel_analytics_tpu.training.data import (
        coordinate_window_batches,
        load_inpaint_rally,
    )

    root, rid, wh = inpaint_rally_dir
    rally = load_inpaint_rally(root, rid, img_wh=wh)
    assert rally.coords_pred.shape == (80, 2)
    assert rally.inpaint_mask.sum() == 7
    # masked frames have zeroed predictions but live ground truth
    assert (rally.coords_pred[rally.inpaint_mask == 1] == 0).all()
    assert (rally.coords_gt[rally.inpaint_mask == 1] > 0).all()

    batches = list(coordinate_window_batches(rally, seq_len=16, batch_size=4))
    assert batches
    coords, mask, target = batches[0]
    assert coords.shape == (4, 16, 2) and mask.shape == (4, 16, 1)
    assert target.shape == (4, 16, 2)
    assert float(coords.max()) <= 1.0 and float(target.max()) <= 1.0


def test_synthetic_inpaint_rally():
    from padel_analytics_tpu.training.data import synthesize_inpaint_rally

    n = 200
    coords = np.stack(
        [np.linspace(10, 1900, n), np.linspace(50, 1000, n)], -1
    ).astype(np.float32)
    vis = np.ones(n, np.float32)
    rally = synthesize_inpaint_rally(
        coords, vis, (1920, 1080), np.random.default_rng(0)
    )
    assert rally.inpaint_mask.sum() > 0
    assert (rally.coords_pred[rally.inpaint_mask == 1] == 0).all()
    # unmasked predictions track ground truth with small jitter
    keep = rally.inpaint_mask == 0
    assert np.abs(rally.coords_pred[keep] - rally.coords_gt[keep]).max() < 10


def test_train_inpaintnet_cli_smoke(inpaint_rally_dir, tmp_path):
    """Round-2 verdict item 7: the InpaintNet train CLI runs on the
    8-device CPU mesh like the other three trainers."""
    from padel_analytics_tpu.apps.train_inpaintnet import main

    root, rid, wh = inpaint_rally_dir
    out = tmp_path / "inp.msgpack"
    rc = main(
        [
            "--match-dir", root, "--rallies", rid,
            "--epochs", "2", "--batch", "4", "--seq-len", "16",
            "--img-wh", str(wh[0]), str(wh[1]),
            "--data-parallel", "2", "--model-parallel", "2",
            "--out", str(out),
        ]
    )
    assert rc == 0 and out.exists() and out.stat().st_size > 1000


def test_train_inpaintnet_cli_synthetic(inpaint_rally_dir, tmp_path):
    from padel_analytics_tpu.apps.train_inpaintnet import main

    root, rid, wh = inpaint_rally_dir
    out = tmp_path / "inp_syn.msgpack"
    rc = main(
        [
            "--match-dir", root, "--rallies", rid,
            "--epochs", "1", "--batch", "4", "--seq-len", "16",
            "--synthetic-gaps", "--img-wh", str(wh[0]), str(wh[1]),
            "--data-parallel", "2", "--model-parallel", "1",
            "--out", str(out),
        ]
    )
    assert rc == 0 and out.exists()
