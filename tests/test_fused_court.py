"""Fused-mode model-based court keypoints: the fourth fused sub-step must
match the sequential KeypointsTracker outputs in yolo and resnet modes
(reference keypoints_tracker.py:199-312), so moving-camera clips (per-frame
homography) get the fast path."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from padel_analytics_tpu.config import BallTrackerConfig
from padel_analytics_tpu.ops.polygon import PolygonZone
from padel_analytics_tpu.trackers import (
    BallTracker,
    KeypointsTracker,
    PlayerKeypointsTracker,
    PlayerTracker,
)
from padel_analytics_tpu.trackers.fused import FusedPipeline
from padel_analytics_tpu.utils.video import VideoInfo

W, H, N = 64, 48, 16
SEQ = 4


def _clip(rng):
    frames = []
    for i in range(N):
        f = np.full((H, W, 3), 40, np.uint8)
        cv2.rectangle(f, (8 + i % 4, 6), (56, 42), (90, 140, 90), 2)
        cv2.circle(f, (6 + i * 3, 24), 3, (250, 250, 90), -1)
        f += rng.integers(0, 5, f.shape, dtype=np.uint8).astype(np.uint8)
        frames.append(f)
    return frames


def _make_court(model_type):
    class _Small(KeypointsTracker):
        TRAIN_IMAGE_SIZE = 32
        RESNET_SIZE = 32

    return _Small(
        None, batch_size=4, model_type=model_type, model_variant="n",
        compute_dtype=jnp.float32,
    )


def _others():
    players = PlayerTracker(
        None,
        PolygonZone(
            np.array([[2, 46], [62, 46], [62, 2], [2, 2]]),
            frame_resolution_wh=(W, H),
        ),
        batch_size=4, model_variant="n", compute_dtype=jnp.float32,
    )
    players.IMGSZ = 32
    pose = PlayerKeypointsTracker(
        None, train_image_size=32, batch_size=4, model_variant="n",
        compute_dtype=jnp.float32, load_path=None, save_path=None,
    )
    ball = BallTracker(
        None, None,
        config=BallTrackerConfig(
            batch_size=4, median_max_sample_num=5, height=16, width=32,
            seq_len=SEQ,
        ),
        compute_dtype=jnp.float32,
    )
    return players, pose, ball


@pytest.mark.parametrize("model_type", ["yolo", "resnet"])
def test_fused_court_matches_sequential(rng, model_type):
    frames = _clip(rng)
    vi = VideoInfo(width=W, height=H, fps=30.0, total_frames=N)

    # Sequential reference path.
    court_seq = _make_court(model_type).video_info_post_init(vi)
    if model_type == "yolo":
        seq = []
        for lo in range(0, N, 4):
            seq += court_seq.predict_sample(np.stack(frames[lo : lo + 4]))
    else:
        seq = court_seq.predict_frames(iter(list(frames)))
    assert len(seq) == N

    # Fused fourth sub-step.
    players, pose, ball = _others()
    court_fused = _make_court(model_type)
    for t in (players, pose, ball, court_fused):
        t.video_info_post_init(vi)
    out = FusedPipeline(
        players, pose, ball, court_fused, chunk=4, ingest="rgb"
    ).run(iter(list(frames)), N)
    fused = out["keypoints"]
    assert len(fused) == N

    for f in range(N):
        a, b = seq[f], fused[f]
        ka = {k.id: k.xy for k in a.keypoints} if a else {}
        kb = {k.id: k.xy for k in b.keypoints} if b else {}
        assert set(ka) == set(kb), f
        for i in ka:
            np.testing.assert_allclose(ka[i], kb[i], rtol=1e-6, atol=1e-4)
