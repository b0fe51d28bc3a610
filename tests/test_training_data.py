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
