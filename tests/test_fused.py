"""Fused multi-tracker pipeline: parity with the per-tracker paths.

Random-weight models emit scores/heatmaps hovering exactly at the 0.5
thresholds, where different XLA fusion orders legitimately flip outcomes;
so parity is asserted with deterministic fake models (decisive outputs),
which pins down what the fused path actually adds: chunk alignment, the
carried window context, coefficient handling, coordinate rescaling,
ByteTrack wiring, and output assembly. A separate smoke test runs the real
models for shape/length coverage.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

import jax.numpy as jnp

from padel_analytics_tpu.config import BallTrackerConfig
from padel_analytics_tpu.models.yolov8 import num_anchors
from padel_analytics_tpu.ops.polygon import PolygonZone
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

W, H, N = 128, 96, 26


class FakeDet:
    """Deterministic detector: a ladder of boxes; scores keyed to image
    content so frames differ, but far from the 0.5 conf threshold."""

    def apply(self, variables, x):
        b, h, w, _ = x.shape
        a = num_anchors(h, w)
        base = jnp.linspace(5.0, float(w) - 10.0, a)
        boxes = jnp.stack(
            [base, jnp.full((a,), h * 0.55), base + 6.0, jnp.full((a,), h * 0.9)],
            axis=-1,
        )[None].repeat(b, 0)
        m = jnp.mean(x, axis=(1, 2, 3))  # ~0.1-0.3
        ladder = jnp.where(jnp.arange(a) < 3, 0.65, 0.1)
        scores = jnp.clip(m[:, None] * 0.3 + ladder[None, :], 0.0, 1.0)
        return {"boxes": boxes, "scores": scores[..., None]}


class FakePose(FakeDet):
    def apply(self, variables, x):
        out = super().apply(variables, x)
        b, h, w, _ = x.shape
        a = num_anchors(h, w)
        kx = jnp.linspace(2.0, w - 2.0, 13)
        ky = jnp.linspace(2.0, h - 2.0, 13)
        kpts = jnp.stack([kx, ky, jnp.full((13,), 0.9)], axis=-1)
        out["kpts"] = jnp.broadcast_to(kpts[None, None], (b, a, 13, 3)) + (
            jnp.arange(a, dtype=jnp.float32)[None, :, None, None] * 0.01
        )
        return out


class FakeTrackNet:
    """Heatmap = decisive indicator of bright pixels per window frame."""

    def apply(self, variables, x):
        # x: (B, H, W, 27) = median(3) + 8 frames x 3, values in [0, 1].
        maps = []
        for c in range(8):
            frame = x[..., 3 + 3 * c : 6 + 3 * c]
            maps.append((jnp.mean(frame, axis=-1) > 0.6).astype(jnp.float32))
        return jnp.stack(maps, axis=-1)  # (B, H, W, 8)


def _make_frames(rng):
    frames = []
    for i in range(N):
        f = np.full((H, W, 3), 30, np.uint8)
        x0 = 10 + (4 * i) % 100
        f[40:50, x0 : x0 + 6] = 220
        f += rng.integers(0, 10, f.shape, dtype=np.uint8)
        frames.append(f)
    return frames


def _make_trackers(fake=True):
    kps = [
        (20, 80), (108, 80), (22, 68), (64, 68), (106, 68), (25, 50),
        (103, 50), (28, 35), (64, 35), (100, 35), (30, 22), (98, 22),
    ]
    ck = Keypoints([Keypoint(id=i, xy=(float(x), float(y))) for i, (x, y) in enumerate(kps)])
    poly = np.array([kps[0], kps[1], kps[-1], kps[-2]])
    players = PlayerTracker(
        None, PolygonZone(poly, (W, H)), batch_size=4, model_variant="n",
        compute_dtype=jnp.float32,
    )
    players.IMGSZ = 64
    pose = PlayerKeypointsTracker(
        None, train_image_size=64, batch_size=4, model_variant="n",
        compute_dtype=jnp.float32, load_path=None, save_path=None,
    )
    ball = BallTracker(
        None, None, compute_dtype=jnp.float32,
        config=BallTrackerConfig(height=72, width=128, batch_size=4,
                                 median_max_sample_num=6),
    )
    court = KeypointsTracker(fixed_keypoints_detection=ck)
    if fake:
        players.engine.model = FakeDet()
        pose.engine.model = FakePose()
        ball.tracknet.model = FakeTrackNet()
    info = VideoInfo(width=W, height=H, fps=10.0, total_frames=N)
    for t in (players, pose, ball, court):
        t.video_info_post_init(info)
    return players, pose, ball, court


def test_fused_matches_separate_trackers(rng):
    frames = _make_frames(rng)
    players_s, pose_s, ball_s, _ = _make_trackers()
    sep_players = []
    for lo in range(0, N, 4):
        sep_players.extend(players_s.predict_sample(np.stack(frames[lo : lo + 4])))
    sep_pose = []
    for lo in range(0, N, 4):
        sep_pose.extend(pose_s.predict_sample(np.stack(frames[lo : lo + 4])))
    sep_ball = ball_s.predict_frames(iter(frames), total_frames=N)

    players_f, pose_f, ball_f, court_f = _make_trackers()
    fused = FusedPipeline(players_f, pose_f, ball_f, court_f, chunk=5)
    out = fused.run(iter(frames), total_frames=N)

    assert len(out["players"]) == N
    assert len(out["players_keypoints"]) == N
    assert len(out["ball"]) == N
    assert len(out["keypoints"]) == N

    for a, b in zip(sep_ball, out["ball"]):
        assert a.serialize() == b.serialize()

    for a, b in zip(sep_players, out["players"]):
        sa, sb = a.serialize(), b.serialize()
        assert len(sa) == len(sb)
        for pa, pb in zip(sa, sb):
            assert pa["id"] == pb["id"]
            np.testing.assert_allclose(pa["xyxy"], pb["xyxy"], atol=1e-3)

    for a, b in zip(sep_pose, out["players_keypoints"]):
        sa, sb = a.serialize(), b.serialize()
        assert len(sa) == len(sb)
        for pa, pb in zip(sa, sb):
            ka = np.array([k["xy"] for k in pa["player_keypoints"]])
            kb = np.array([k["xy"] for k in pb["player_keypoints"]])
            np.testing.assert_allclose(ka, kb, atol=1e-3)


def test_fused_real_models_smoke(rng):
    frames = _make_frames(rng)
    players, pose, ball, court = _make_trackers(fake=False)
    fused = FusedPipeline(players, pose, ball, court, chunk=8)
    out = fused.run(iter(frames), total_frames=N)
    assert {len(v) for v in out.values()} == {N}
    assert all(b.visibility in (0, 1) for b in out["ball"])


def test_measure_device_split(rng):
    """Device-resident phase timing (bench.py's device metrics) returns a
    complete, positive split and leaves results consistent."""
    frames = _make_frames(rng)
    players, pose, ball, court = _make_trackers()
    fused = FusedPipeline(players, pose, ball, court, chunk=5, ingest="i420")
    split = fused.measure_device_split(iter(frames), total_frames=N, n_chunks=3)
    assert split["frames"] == 15
    for k in ("pack_s", "upload_s", "det_s", "pose_s", "ball_s"):
        assert split[k] >= 0.0
    assert split["device_fps"] > 0
    assert split["device_ms_per_frame"] > 0


def test_measure_device_split_short_clip_returns_none(rng):
    frames = _make_frames(rng)
    players, pose, ball, court = _make_trackers()
    fused = FusedPipeline(players, pose, ball, court, chunk=N + 4)
    assert fused.measure_device_split(iter(frames), total_frames=N) is None


def test_fused_detects_court_mode():
    """Model-based court modes join the fused schedule as a fourth
    sub-step (tests/test_fused_court.py checks output parity)."""
    players, pose, ball, court_fixed = _make_trackers()
    assert FusedPipeline(players, pose, ball, court_fixed).court_mode == "fixed"
    court = KeypointsTracker(model_path=None, model_type="yolo",
                             compute_dtype=jnp.float32, model_variant="n")
    assert FusedPipeline(players, pose, ball, court).court_mode == "yolo"
    assert FusedPipeline(players, pose, ball, None).court_mode is None


def test_staged_scan_matches_chunked(rng):
    """run_staged (device scan over chunks) must reproduce run()."""
    frames = _make_frames(rng)
    players_a, pose_a, ball_a, court_a = _make_trackers()
    base = FusedPipeline(players_a, pose_a, ball_a, court_a, chunk=5)
    out_a = base.run(iter(frames), total_frames=N)

    players_b, pose_b, ball_b, court_b = _make_trackers()
    staged = FusedPipeline(players_b, pose_b, ball_b, court_b, chunk=5)
    out_b = staged.run_staged(iter(frames), total_frames=N, superchunk=2)

    for key in ("ball", "players", "players_keypoints"):
        assert len(out_a[key]) == len(out_b[key]) == N
        for a, b in zip(out_a[key], out_b[key]):
            assert a.serialize() == b.serialize(), key


class FakeTrackNetBG:
    """Decisive fake for a given background mode: per window frame, an
    indicator over that frame's channel group (diff channel for the
    subtract modes)."""

    def __init__(self, bg_mode, thr, seq_len=8):
        from padel_analytics_tpu.trackers._ballwindow import frame_channels

        self.cf = frame_channels(bg_mode)
        self.off = 3 if bg_mode == "concat" else 0
        self.thr = thr
        self.seq_len = seq_len

    def apply(self, variables, x):
        maps = []
        for c in range(self.seq_len):
            g = x[..., self.off + self.cf * c : self.off + self.cf * (c + 1)]
            maps.append((jnp.mean(g, axis=-1) > self.thr).astype(jnp.float32))
        return jnp.stack(maps, axis=-1)


@pytest.mark.parametrize("bg_mode,thr", [("subtract", 0.5), ("subtract_concat", 0.45)])
def test_fused_ball_matches_sequential_subtract_modes(rng, bg_mode, thr):
    """The fused ball branch must reproduce the sequential tracker for the
    subtract background modes (source-res difference images + swap quirk
    computed on device)."""
    frames = []
    for i in range(N):
        f = np.full((H, W, 3), 30, np.uint8)
        x0 = 10 + (4 * i) % 100
        f[40:50, x0 : x0 + 6] = 110  # |110-30|*3 = 240 < 256: no uint8 wrap
        f += rng.integers(0, 5, f.shape, dtype=np.uint8).astype(np.uint8)
        frames.append(f)

    def make_ball():
        ball = BallTracker(
            None, None, compute_dtype=jnp.float32,
            config=BallTrackerConfig(height=72, width=128, batch_size=4,
                                     median_max_sample_num=6, bg_mode=bg_mode),
        )
        ball.tracknet.model = FakeTrackNetBG(bg_mode, thr)
        ball.video_info_post_init(
            VideoInfo(width=W, height=H, fps=10.0, total_frames=N)
        )
        return ball

    seq = make_ball().predict_frames(iter(list(frames)), N)

    players, pose, _, court = _make_trackers()
    ball = make_ball()
    out = FusedPipeline(players, pose, ball, court, chunk=4).run(
        iter(list(frames)), N
    )
    fused = out["ball"]
    assert len(seq) == len(fused) == N
    for a, b in zip(seq, fused):
        assert a.xy == b.xy and a.visibility == b.visibility, a.frame


def test_ingest_fallback_is_per_run_not_a_latch():
    """One odd-dimension clip must not downgrade later runs of a cached
    pipeline to rgb ingest (2x the bytes over the bottleneck link)."""
    from padel_analytics_tpu.trackers.fused import FusedPipeline

    pipe = object.__new__(FusedPipeline)
    pipe.ingest = "i420"
    pipe._ingest_pref = "i420"
    pipe._check_ingest((95, 128))
    assert pipe.ingest == "rgb"
    pipe._check_ingest((96, 128))
    assert pipe.ingest == "i420"
