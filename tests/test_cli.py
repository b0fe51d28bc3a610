"""CLI end-to-end test (headless, fixed keypoints JSON, tiny models)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    path = d / "clip.mp4"
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (128, 96))
    for i in range(16):
        frame = np.full((96, 128, 3), 50, np.uint8)
        cv2.circle(frame, (10 + i * 6, 50), 3, (250, 250, 90), -1)
        writer.write(frame)
    writer.release()
    kps = [
        [20, 80], [108, 80], [22, 68], [64, 68], [106, 68], [25, 50],
        [103, 50], [28, 35], [64, 35], [100, 35], [30, 22], [98, 22],
    ]
    kp_path = d / "keypoints.json"
    kp_path.write_text(json.dumps(kps))
    return d, str(path), str(kp_path)


def test_cli_headless_run(clip, monkeypatch):
    d, video, keypoints = clip
    # Tiny-model config module (reference config.py surface).
    cfg_py = d / "config.py"
    cfg_py.write_text(
        f"""
INPUT_VIDEO_PATH = {video!r}
OUTPUT_VIDEO_PATH = {str(d / 'results.mp4')!r}
COLLECT_DATA = True
COLLECT_DATA_PATH = {str(d / 'data.csv')!r}
MAX_FRAMES = None
FIXED_COURT_KEYPOINTS_LOAD_PATH = {keypoints!r}
FIXED_COURT_KEYPOINTS_SAVE_PATH = None
PLAYERS_TRACKER_MODEL = None
PLAYERS_TRACKER_BATCH_SIZE = 4
PLAYERS_TRACKER_ANNOTATOR = "rectangle_bounding_box"
PLAYERS_TRACKER_LOAD_PATH = None
PLAYERS_TRACKER_SAVE_PATH = None
PLAYERS_KEYPOINTS_TRACKER_MODEL = None
PLAYERS_KEYPOINTS_TRACKER_TRAIN_IMAGE_SIZE = 640
PLAYERS_KEYPOINTS_TRACKER_BATCH_SIZE = 4
PLAYERS_KEYPOINTS_TRACKER_LOAD_PATH = None
PLAYERS_KEYPOINTS_TRACKER_SAVE_PATH = None
BALL_TRACKER_MODEL = None
BALL_TRACKER_INPAINT_MODEL = None
BALL_TRACKER_BATCH_SIZE = 4
BALL_TRACKER_MEDIAN_MAX_SAMPLE_NUM = 8
BALL_TRACKER_LOAD_PATH = None
BALL_TRACKER_SAVE_PATH = None
KEYPOINTS_TRACKER_MODEL = None
KEYPOINTS_TRACKER_BATCH_SIZE = 4
KEYPOINTS_TRACKER_MODEL_TYPE = "yolo"
KEYPOINTS_TRACKER_LOAD_PATH = None
KEYPOINTS_TRACKER_SAVE_PATH = None
"""
    )
    # Shrink the heavy knobs for CI speed.
    from padel_analytics_tpu.apps import cli
    from padel_analytics_tpu.config import PipelineConfig

    orig = cli._load_config

    def patched(args):
        cfg = orig(args)
        cfg.players.model_variant = "n"
        cfg.players.imgsz = 64
        cfg.player_keypoints.model_variant = "n"
        cfg.player_keypoints.train_image_size = 640
        cfg.ball.height, cfg.ball.width = 72, 128
        return cfg

    monkeypatch.setattr(cli, "_load_config", patched)
    # Make the pose path cheap: 640 -> small via variant n is still heavy on
    # CPU x16 frames but acceptable (~20s).
    rc = cli.main(["--config", str(cfg_py)])
    assert rc == 0
    assert (d / "results.mp4").exists()
    assert (d / "data.csv").exists()
    import pandas as pd

    df = pd.read_csv(d / "data.csv")
    assert len(df) == 16
    assert "player1_Vnorm4" in df.columns
