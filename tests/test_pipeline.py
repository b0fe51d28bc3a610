"""End-to-end pipeline smoke tests on a synthetic rally clip (CPU, tiny
model configs, random weights — exercises every layer and the output
artifacts, not detection quality)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from padel_analytics_tpu.config import BallTrackerConfig
from padel_analytics_tpu.ops.polygon import PolygonZone
from padel_analytics_tpu.trackers import (
    BallTracker,
    Keypoint,
    Keypoints,
    KeypointsTracker,
    PlayerKeypointsTracker,
    PlayerTracker,
    TrackingRunner,
)

W, H, FPS, N_FRAMES = 128, 96, 10.0, 24


@pytest.fixture(scope="module")
def synthetic_video(tmp_path_factory):
    """A tiny clip with a moving bright dot (ball-ish) over a dark court."""
    path = tmp_path_factory.mktemp("video") / "rally.mp4"
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H)
    )
    rng = np.random.default_rng(0)
    for i in range(N_FRAMES):
        frame = np.full((H, W, 3), 30, np.uint8)
        cv2.rectangle(frame, (10, 10), (W - 10, H - 10), (80, 120, 80), 2)
        x = 15 + int(i * (W - 30) / N_FRAMES)
        y = 40 + int(10 * np.sin(i / 3))
        cv2.circle(frame, (x, y), 3, (250, 250, 80), -1)
        frame += rng.integers(0, 8, frame.shape, dtype=np.uint8)
        writer.write(frame)
    writer.release()
    return str(path)


@pytest.fixture(scope="module")
def court_keypoints():
    # A plausible trapezoid court in the synthetic frame.
    pts = [
        (20, 80), (108, 80),  # k1, k2 (near baseline)
        (22, 68), (64, 68), (106, 68),  # k3-k5
        (25, 50), (103, 50),  # k6, k7 (net)
        (28, 35), (64, 35), (100, 35),  # k8-k10
        (30, 22), (98, 22),  # k11, k12 (far baseline)
    ]
    return Keypoints([Keypoint(id=i, xy=(float(x), float(y))) for i, (x, y) in enumerate(pts)])


def _build_trackers(court_keypoints, tmp_path):
    polygon = np.array(
        [court_keypoints[0].xy, court_keypoints[1].xy,
         court_keypoints[11].xy, court_keypoints[10].xy]
    )
    players = PlayerTracker(
        model_path=None,
        polygon_zone=PolygonZone(polygon, frame_resolution_wh=(W, H)),
        batch_size=4,
        model_variant="n",
        compute_dtype=jnp.float32,
        save_path=str(tmp_path / "players.json"),
    )
    players.IMGSZ = 64
    pose = PlayerKeypointsTracker(
        model_path=None,
        train_image_size=64,
        batch_size=4,
        model_variant="n",
        compute_dtype=jnp.float32,
        load_path=None,
        save_path=str(tmp_path / "pose.json"),
    )
    ball_cfg = BallTrackerConfig(height=72, width=128, batch_size=4,
                                 median_max_sample_num=8)
    ball = BallTracker(
        tracking_model_path=None,
        inpainting_model_path=None,
        compute_dtype=jnp.float32,
        config=ball_cfg,
        save_path=str(tmp_path / "ball.json"),
    )
    court = KeypointsTracker(
        model_path=None,
        fixed_keypoints_detection=court_keypoints,
        save_path=str(tmp_path / "court.json"),
    )
    return [players, pose, ball, court]


def test_full_pipeline(synthetic_video, court_keypoints, tmp_path):
    out_video = tmp_path / "results.mp4"
    trackers = _build_trackers(court_keypoints, tmp_path)
    runner = TrackingRunner(
        trackers=trackers,
        video_path=synthetic_video,
        inference_path=str(out_video),
        start=0,
        end=None,
        collect_data=True,
    )
    runner.run()

    # Every tracker produced one prediction object per frame.
    for name, tracker in runner.trackers.items():
        assert len(tracker) == N_FRAMES, name

    # Output artifacts exist and are readable.
    assert out_video.exists() and out_video.stat().st_size > 0
    cap = cv2.VideoCapture(str(out_video))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == N_FRAMES
    cap.release()

    # JSON caches written with reference-parity schemas.
    with open(tmp_path / "ball.json") as f:
        ball_json = json.load(f)
    assert len(ball_json) == N_FRAMES
    assert set(ball_json[0]) == {"frame", "xy", "visibility", "projection"}

    # Analytics dataframe has the reference's columns.
    df = runner.data_analytics.into_dataframe(FPS)
    assert len(df) == N_FRAMES
    for col in [
        "frame", "time", "player1_x", "delta_time1", "player1_Vx1",
        "player1_deltaVy4", "player1_Anorm4", "player4_distance",
    ]:
        assert col in df.columns, col

    # Cache-resume: a new runner with load paths skips inference.
    trackers2 = _build_trackers(court_keypoints, tmp_path)
    for t, cache in zip(trackers2, ["players.json", "pose.json", "ball.json", "court.json"]):
        t.load_path = str(tmp_path / cache)
        t.load_predictions()
    assert all(len(t) == N_FRAMES for t in trackers2[:3])


def test_ball_tracker_with_inpaintnet(synthetic_video, tmp_path):
    ball = BallTracker(
        tracking_model_path=None,
        inpainting_model_path="__random__.msgpack_missing",  # random init path
        compute_dtype=jnp.float32,
        config=BallTrackerConfig(height=72, width=128, batch_size=4,
                                 median_max_sample_num=8),
    )
    assert ball.inpaintnet is not None
    from padel_analytics_tpu.utils.video import VideoInfo, frame_generator

    ball.video_info_post_init(VideoInfo.from_video_path(synthetic_video))
    # InpaintNet seq_len 16 < 24 frames: full path executes.
    balls = ball.predict_frames(
        frame_generator(synthetic_video), total_frames=N_FRAMES
    )
    assert len(balls) == N_FRAMES
    assert all(b.serialize()["visibility"] in (0, 1) for b in balls)


def test_generate_inpaint_mask_semantics():
    from padel_analytics_tpu.trackers.ball import generate_inpaint_mask

    # Gap with ball low on both sides -> inpaint; gap at high y -> skip.
    pred = {
        "y": [50, 52, 0, 0, 55, 5, 0, 0, 4, 60],
        "visibility": [1, 1, 0, 0, 1, 1, 0, 0, 1, 1],
    }
    mask = generate_inpaint_mask(pred, th_h=30)
    assert mask[2] == 1 and mask[3] == 1  # low gap inpainted
    assert mask[6] == 0 and mask[7] == 0  # high (out-of-view) gap skipped


def test_ball_tracker_mesh_matches_single_device(synthetic_video):
    """BallTracker(mesh=...) shards the frame axis over the virtual
    8-device mesh and must reproduce the single-device chunk loop."""
    from padel_analytics_tpu.parallel.mesh import make_mesh
    from padel_analytics_tpu.utils.video import VideoInfo, frame_generator

    info = VideoInfo.from_video_path(synthetic_video)
    cfg = BallTrackerConfig(height=72, width=128, batch_size=4,
                            median_max_sample_num=8)
    single = BallTracker(None, None, compute_dtype=jnp.float32, config=cfg)
    single.video_info_post_init(info)
    ref = single.predict_frames(frame_generator(synthetic_video),
                                total_frames=N_FRAMES)

    # 24 frames / 2 devices = 12-frame shards >= the 7-frame halo.
    sharded = BallTracker(None, None, compute_dtype=jnp.float32, config=cfg,
                          mesh=make_mesh(data=2, model=1))
    # identical random init: same PRNG seed in load_variables
    sharded.video_info_post_init(info)
    got = sharded.predict_frames(frame_generator(synthetic_video),
                                 total_frames=N_FRAMES)
    assert len(got) == len(ref)
    mismatches = sum(a.serialize() != b.serialize() for a, b in zip(ref, got))
    # Same f32 math modulo XLA partitioning: positions may flip at decode
    # thresholds for random-weight heatmaps near 0.5; visibility pattern
    # and the vast majority of frames must agree.
    assert mismatches <= max(2, len(ref) // 10)


def test_short_clip_falls_back_to_sequential(tmp_path):
    """A clip shorter than the TrackNet window can't run the fused chunk
    loop; the runner must fall back to the sequential path, which
    zero-fills missing ball frames like the reference
    (ball_tracker.py:677-696)."""
    import cv2

    from padel_analytics_tpu.config import BallTrackerConfig
    from padel_analytics_tpu.ops.polygon import PolygonZone
    from padel_analytics_tpu.trackers import (
        BallTracker,
        Keypoint,
        Keypoints,
        KeypointsTracker,
        PlayerKeypointsTracker,
        PlayerTracker,
        TrackingRunner,
    )

    w, h, n = 320, 240, 3  # < seq_len 4
    video = tmp_path / "short.mp4"
    vw = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for _ in range(n):
        vw.write(np.full((h, w, 3), 40, np.uint8))
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
        None, None, compute_dtype=jnp.float32,
        config=BallTrackerConfig(batch_size=4, median_max_sample_num=2,
                                 height=32, width=64, seq_len=4),
    )
    kp = Keypoints(
        [Keypoint(id=i, xy=(float(30 + (i % 4) * 80), float(30 + (i // 4) * 80)))
         for i in range(12)]
    )
    court = KeypointsTracker(fixed_keypoints_detection=kp)
    runner = TrackingRunner(
        [players, pose, ball, court], video, tmp_path / "out.mp4",
        collect_data=False, fused=True, fused_chunk=4,
    )
    runner.run()
    balls = runner.trackers["ball_tracker"].results.predictions
    assert len(balls) == n
    assert all(b.visibility == 0 for b in balls)


def test_fused_stream_draw_matches_batch_draw(
    synthetic_video, court_keypoints, tmp_path
):
    """fused_stream_draw=True (render concurrent with inference) produces
    the same analytics and a complete video as the default post-hoc draw
    pass (runner.py _StreamingDrawer)."""
    dfs, videos = [], []
    for name, stream in (("batch", False), ("stream", True)):
        sub = tmp_path / name
        sub.mkdir()
        out = sub / "results.mp4"
        runner = TrackingRunner(
            trackers=_build_trackers(court_keypoints, sub),
            video_path=synthetic_video,
            inference_path=str(out),
            collect_data=True,
            fused=True,
            fused_chunk=6,
            fused_stream_draw=stream,
        )
        runner.run()
        dfs.append(runner.data_analytics.into_dataframe(FPS))
        cap = cv2.VideoCapture(str(out))
        videos.append(int(cap.get(cv2.CAP_PROP_FRAME_COUNT)))
        cap.release()
    assert videos[0] == videos[1] == N_FRAMES
    pd.testing.assert_frame_equal(dfs[0], dfs[1])


def test_render_scale_halves_output_keeps_analytics(
    synthetic_video, court_keypoints, tmp_path
):
    """render_scale=0.5 writes the annotated video at half resolution
    (even dims) with the SAME analytics: overlays are drawn and data
    collected at full resolution, only the final encode shrinks."""
    dfs, res = [], []
    for name, scale in (("full", 1.0), ("half", 0.5)):
        sub = tmp_path / name
        sub.mkdir()
        out = sub / "results.mp4"
        runner = TrackingRunner(
            trackers=_build_trackers(court_keypoints, sub),
            video_path=synthetic_video,
            inference_path=str(out),
            collect_data=True,
            fused=True,
            fused_chunk=6,
            render_scale=scale,
        )
        assert runner.render_resolution_wh == (
            (W, H) if scale == 1.0 else (W // 2, H // 2)
        )
        runner.run()
        dfs.append(runner.data_analytics.into_dataframe(FPS))
        cap = cv2.VideoCapture(str(out))
        res.append(
            (
                int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
                int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
            )
        )
        cap.release()
    assert res[0] == (W, H, N_FRAMES)
    assert res[1] == (W // 2, H // 2, N_FRAMES)
    pd.testing.assert_frame_equal(dfs[0], dfs[1])


def test_render_scale_validation():
    # Construction-time validation (runs before any video IO).
    with pytest.raises(ValueError, match="render_scale"):
        TrackingRunner([], "nonexistent.mp4", "out.mp4", render_scale=0.0)
    with pytest.raises(ValueError, match="render_scale"):
        TrackingRunner([], "nonexistent.mp4", "out.mp4", render_scale=1.5)


def test_fused_stream_draw_failure_finalizes_writer(
    synthetic_video, court_keypoints, tmp_path
):
    """A draw failure mid-stream surfaces at finish() AND the writer is
    released (finalized container), not leaked with the thread."""
    out = tmp_path / "results.mp4"
    runner = TrackingRunner(
        trackers=_build_trackers(court_keypoints, tmp_path),
        video_path=synthetic_video,
        inference_path=str(out),
        collect_data=False,
        fused=True,
        fused_chunk=6,
        fused_stream_draw=True,
    )

    def boom(writer, frame_index, frame):
        raise RuntimeError("draw failure injection")

    runner._draw_one = boom
    with pytest.raises(RuntimeError, match="draw failure injection"):
        runner.run()
    # release() ran on the error path: the container exists on disk.
    assert out.exists()


def test_ball_tracker_reuse_on_new_clip_matches_fresh_tracker(tmp_path):
    """Reusing a BallTracker on a DIFFERENT clip must rebuild the median
    (first-frame fingerprint) and apply the head-frame quirk exactly like
    a fresh tracker — previously clip A's cached background silently
    contaminated clip B."""
    rng = np.random.default_rng(11)
    cfg = BallTrackerConfig(height=32, width=48, batch_size=4,
                            median_max_sample_num=6)

    def clip(seed, n=14):
        r = np.random.default_rng(seed)
        return [r.integers(0, 256, (48, 64, 3), np.uint8) for _ in range(n)]

    from padel_analytics_tpu.utils.video import VideoInfo

    def preds(tracker, frames):
        tracker.video_info_post_init(
            VideoInfo(width=64, height=48, fps=30.0, total_frames=len(frames))
        )
        return [
            b.serialize()
            for b in tracker.predict_frames(iter(frames), total_frames=len(frames))
        ]

    reused = BallTracker(None, None, config=cfg, compute_dtype=jnp.float32)
    preds(reused, clip(1))
    median_a = np.array(reused.median, copy=True)
    reused.restart()
    got_b = preds(reused, clip(2))
    assert not np.array_equal(median_a, reused.median)

    fresh = BallTracker(None, None, config=cfg, compute_dtype=jnp.float32)
    # Same (random-init) weights so outputs are comparable.
    fresh.tracknet = reused.tracknet
    want_b = preds(fresh, clip(2))
    assert got_b == want_b

    # Same clip again: the cached median is reused (fingerprint match)
    # and results are unchanged.
    reused.restart()
    assert preds(reused, clip(2)) == want_b


def test_render_false_matches_rendered_analytics(
    synthetic_video, court_keypoints, tmp_path
):
    """render=False (analytics-only) must produce the exact DataAnalytics
    of the rendered path — same projections, same step/trim — while
    writing NO video (collect_data_only, runner.py)."""
    trackers = _build_trackers(court_keypoints, tmp_path)
    out1 = tmp_path / "rendered.mp4"
    rendered = TrackingRunner(
        trackers=trackers,
        video_path=synthetic_video,
        inference_path=str(out1),
        collect_data=True,
    )
    rendered.run()
    df_rendered = rendered.data_analytics.into_dataframe(FPS)
    assert out1.exists()

    # Same trackers (results already stored -> inference is skipped);
    # only the draw/collect pass differs.
    out2 = tmp_path / "norender.mp4"
    analytics_only = TrackingRunner(
        trackers=trackers,
        video_path=synthetic_video,
        inference_path=str(out2),
        collect_data=True,
        render=False,
    )
    analytics_only.run()
    df_plain = analytics_only.data_analytics.into_dataframe(FPS)

    pd.testing.assert_frame_equal(df_rendered, df_plain)
    assert not out2.exists()
    # Stored predictions stayed pristine (collect deepcopies before
    # project_player writes .projection).
    assert "draw_and_collect" in analytics_only.stage_times
