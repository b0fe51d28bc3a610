"""Multi-chip fused pipeline: run_mesh over the 8-device CPU mesh vs the
single-device fused run. Ball coordinates are bit-equal (integer decode);
det/pose agree to float tolerance (GSPMD batch-sharded convolutions round
differently at the ULP level than the single-device batch shape)."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from padel_analytics_tpu.config import BallTrackerConfig
from padel_analytics_tpu.ops.polygon import PolygonZone
from padel_analytics_tpu.parallel.mesh import make_mesh
from padel_analytics_tpu.trackers import (
    BallTracker,
    Keypoint,
    Keypoints,
    KeypointsTracker,
    PlayerKeypointsTracker,
    PlayerTracker,
)
from padel_analytics_tpu.trackers.fused import FusedPipeline
from padel_analytics_tpu.utils.video import VideoInfo

W, H, N = 64, 48, 40
SEQ = 4


def _clip(rng):
    frames = []
    for i in range(N):
        f = np.full((H, W, 3), 40, np.uint8)
        cv2.circle(f, (6 + (i * 3) % 50, 24), 3, (250, 250, 90), -1)
        cv2.rectangle(f, (10 + i % 7, 30), (18 + i % 7, 44), (200, 180, 160), -1)
        f += rng.integers(0, 5, f.shape, dtype=np.uint8).astype(np.uint8)
        frames.append(f)
    return frames


def _build(ingest, chunk):
    vi = VideoInfo(width=W, height=H, fps=30.0, total_frames=N)
    players = PlayerTracker(
        None,
        PolygonZone(
            np.array([[2, 46], [62, 46], [62, 2], [2, 2]]),
            frame_resolution_wh=(W, H),
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
            seq_len=SEQ,
        ),
        compute_dtype=jnp.float32,
    )
    kp = Keypoints(
        [Keypoint(id=i, xy=(float(4 + i * 5), float(4 + (i % 3) * 12)))
         for i in range(12)]
    )
    court = KeypointsTracker(fixed_keypoints_detection=kp)
    for t in (players, pose, ball, court):
        t.video_info_post_init(vi)
    return FusedPipeline(players, pose, ball, court, chunk=chunk, ingest=ingest)


@pytest.mark.parametrize("ingest", ["rgb", "i420"])
def test_run_mesh_bit_equal_single_device(rng, ingest):
    frames = _clip(rng)
    mesh = make_mesh(data=8, model=1)

    single = _build(ingest, chunk=4).run(iter(list(frames)), N)
    sharded = _build(ingest, chunk=2).run_mesh(iter(list(frames)), N, mesh)

    for key in ("players", "players_keypoints", "ball", "keypoints"):
        assert len(single[key]) == len(sharded[key]) == N

    for f in range(N):
        b1, b2 = single["ball"][f], sharded["ball"][f]
        assert b1.xy == b2.xy and b1.visibility == b2.visibility, f

        p1, p2 = single["players"][f], sharded["players"][f]
        assert len(p1.players) == len(p2.players), f
        for a, b in zip(p1.players, p2.players):
            np.testing.assert_allclose(
                np.asarray(a.xyxy), np.asarray(b.xyxy), rtol=1e-5, atol=1e-3
            )
            assert a.id == b.id
            assert abs(a.confidence - b.confidence) < 1e-5

        k1, k2 = single["players_keypoints"][f], sharded["players_keypoints"][f]
        assert len(k1.players_keypoints) == len(k2.players_keypoints), f
        for a, b in zip(k1.players_keypoints, k2.players_keypoints):
            for ka, kb in zip(a.player_keypoints, b.player_keypoints):
                np.testing.assert_allclose(ka.xy, kb.xy, rtol=1e-5, atol=1e-3)


def test_runner_mesh_end_to_end(rng, tmp_path):
    """TrackingRunner(mesh=...) routes the fused pipeline through
    run_mesh and produces the full outputs (video + analytics). Uses a
    larger frame than the bit-equal tests: the minimap render needs room."""
    from padel_analytics_tpu.trackers import KeypointsTracker, TrackingRunner

    w, h, n = 320, 240, 40
    video = tmp_path / "clip.mp4"
    vw = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for i in range(n):
        f = np.full((h, w, 3), 40, np.uint8)
        cv2.circle(f, (20 + (i * 6) % 280, 120), 4, (250, 250, 90), -1)
        vw.write(f)
    vw.release()

    players = PlayerTracker(
        None,
        PolygonZone(
            np.array([[10, 230], [310, 230], [310, 10], [10, 10]]),
            frame_resolution_wh=(w, h),
        ),
        batch_size=4, model_variant="n", compute_dtype=jnp.float32,
    )
    players.IMGSZ = 64
    pose = PlayerKeypointsTracker(
        None, train_image_size=64, batch_size=4, model_variant="n",
        compute_dtype=jnp.float32, load_path=None, save_path=None,
    )
    ball = BallTracker(
        None, None,
        config=BallTrackerConfig(
            batch_size=4, median_max_sample_num=5, height=32, width=64,
            seq_len=SEQ,
        ),
        compute_dtype=jnp.float32,
    )
    kp = Keypoints(
        [Keypoint(id=i, xy=(float(30 + (i % 4) * 80), float(30 + (i // 4) * 80)))
         for i in range(12)]
    )
    court = KeypointsTracker(fixed_keypoints_detection=kp)
    runner = TrackingRunner(
        [players, pose, ball, court],
        video,
        tmp_path / "out.mp4",
        collect_data=True,
        fused=True,
        fused_chunk=2,
        mesh=make_mesh(data=8, model=1),
    )
    runner.run()
    n = runner.total_frames
    assert len(runner.trackers["ball_tracker"]) == n
    assert len(runner.trackers["players_tracker"]) == n
    assert (tmp_path / "out.mp4").exists()
    df = runner.data_analytics.into_dataframe(30.0)
    assert len(df) == n
