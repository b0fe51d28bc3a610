"""Nonoverlap ball fast mode (FusedPipeline ball_stride=seq_len).

With the decisive FakeTrackNet (each heatmap channel depends ONLY on its
own frame — tests/test_fused.py), the stride-1 rolling ensemble and the
nonoverlap mode must decode IDENTICAL positions for every frame: the
ensemble averages windows that all vote the same indicator, and zero
padding perturbs no real frame's channel. Any emission off-by-one or
window misalignment in the fast mode breaks this equality.
"""

import numpy as np
import pytest

from padel_analytics_tpu.trackers.fused import FusedPipeline

from test_fused import N, _make_frames, _make_trackers


def _run(rng, ball_stride, staged=0, chunk=8):
    frames = _make_frames(rng)
    players, pose, ball, court = _make_trackers()
    fused = FusedPipeline(
        players, pose, ball, court, chunk=chunk, ball_stride=ball_stride
    )
    if staged:
        return fused.run_staged(iter(frames), total_frames=N, superchunk=staged)
    return fused.run(iter(frames), total_frames=N)


@pytest.mark.smoke
def test_nonoverlap_matches_stride1_with_decisive_model(rng):
    base = _run(rng, ball_stride=1)
    fast = _run(rng, ball_stride=8)
    assert len(fast["ball"]) == N
    for a, b in zip(base["ball"], fast["ball"]):
        assert a.serialize() == b.serialize()
    # the other sub-steps are untouched by the ball mode
    for key in ("players", "players_keypoints", "keypoints"):
        for a, b in zip(base[key], fast[key]):
            assert str(a.serialize()) == str(b.serialize())


def test_nonoverlap_staged_equals_chunked(rng):
    chunked = _run(rng, ball_stride=8)
    staged = _run(rng, ball_stride=8, staged=2)
    for key in ("players", "players_keypoints", "ball", "keypoints"):
        assert len(staged[key]) == N
        for a, b in zip(chunked[key], staged[key]):
            assert str(a.serialize()) == str(b.serialize())


def test_nonoverlap_real_models_smoke(rng):
    frames = _make_frames(rng)
    players, pose, ball, court = _make_trackers(fake=False)
    fused = FusedPipeline(
        players, pose, ball, court, chunk=8, ball_stride=8
    )
    out = fused.run(iter(frames), total_frames=N)
    assert {len(v) for v in out.values()} == {N}
    assert all(b.visibility in (0, 1) for b in out["ball"])


def test_sequential_tracker_nonoverlap_matches_stride1(rng):
    # BallTracker(window_stride=seq_len) — the sequential streaming path —
    # must agree with stride-1 under the decisive fake model too.
    from test_fused import FakeTrackNet
    from padel_analytics_tpu.config import BallTrackerConfig
    from padel_analytics_tpu.trackers import BallTracker
    from padel_analytics_tpu.utils.video import VideoInfo

    import jax.numpy as jnp

    frames = _make_frames(rng)

    def run(stride):
        cfg = BallTrackerConfig(height=72, width=128, batch_size=4,
                                median_max_sample_num=6,
                                window_stride=stride)
        tr = BallTracker(None, None, compute_dtype=jnp.float32, config=cfg)
        tr.tracknet.model = FakeTrackNet()
        tr.video_info_post_init(
            VideoInfo(width=frames[0].shape[1], height=frames[0].shape[0],
                      fps=10.0, total_frames=N)
        )
        return tr.predict_frames(iter(list(frames)), total_frames=N)

    base, fast = run(1), run(8)
    assert len(fast) == N
    for a, b in zip(base, fast):
        assert a.serialize() == b.serialize()


def test_window_stride_config_validation(rng):
    from padel_analytics_tpu.config import BallTrackerConfig
    from padel_analytics_tpu.trackers import BallTracker

    with pytest.raises(ValueError, match="window_stride"):
        BallTracker(None, None, config=BallTrackerConfig(window_stride=3))


def test_run_mesh_nonoverlap_bit_equal_single_device(rng):
    # The nonoverlap sharded pass (no halo exchange at all) must decode
    # the same ball coordinates as the single-device nonoverlap chunk
    # loop — same real f32 models as the stride-1 mesh bit-equality test.
    from test_fused_mesh import N as MN, SEQ, _build, _clip
    from padel_analytics_tpu.parallel.mesh import make_mesh

    frames = _clip(rng)
    mesh = make_mesh(data=8, model=1)

    single = _build("rgb", chunk=4)
    single.ball_stride = SEQ  # rebind after build; chunk=4 == SEQ
    out_single = single.run(iter(list(frames)), MN)

    sharded = _build("rgb", chunk=4)
    sharded.ball_stride = SEQ
    out_sharded = sharded.run_mesh(iter(list(frames)), MN, mesh)

    assert len(out_sharded["ball"]) == MN
    for f in range(MN):
        b1, b2 = out_single["ball"][f], out_sharded["ball"][f]
        assert b1.xy == b2.xy and b1.visibility == b2.visibility, f


def test_stride_validation(rng):
    players, pose, ball, court = _make_trackers()
    with pytest.raises(ValueError, match="ball_stride"):
        FusedPipeline(players, pose, ball, court, chunk=8, ball_stride=4)
    with pytest.raises(ValueError, match="chunk"):
        FusedPipeline(players, pose, ball, court, chunk=12, ball_stride=8)
