"""'derived' ingest parity: downscaled I420 wire buffer, model inputs
derived on device, coordinates mapped back to source pixels.

With content-independent deterministic models (test_fused's fakes), the
coordinate algebra is EXACT: letterboxing the wire buffer and scaling by
wire->source equals letterboxing the source directly (both reduce to the
same affine map), so det boxes / pose keypoints must match the rgb-ingest
run to float tolerance. Content-dependent outputs (the ball branch's
resized frames) carry a bounded resample delta instead. The host-side
levers (wire byte count, even-dim rounding, subtract-mode median
downscale) are pinned separately.

Reference basis: the reference always feeds full-resolution frames
(players_tracker.py:351-359 letterboxes 1080p to 640); 'derived' is our
TPU-first fast path with no reference equivalent — its parity bar is
vs our own 'rgb' ingest, documented in PARITY.md.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from padel_analytics_tpu.trackers.fused import FusedPipeline

from test_fused import H, N, W, _make_frames, _make_trackers


def _run(ingest, wire_long_side=64, staged=0, frames=None, trackers=None):
    players, pose, ball, court = trackers or _make_trackers(fake=True)
    for t in (players, pose, ball, court):
        t.restart()
    ball.median = None  # recompute per run (clip fingerprint would skip)
    pipe = FusedPipeline(
        players, pose, ball, court, chunk=5, ingest=ingest,
        wire_long_side=wire_long_side,
    )
    frames = frames if frames is not None else _make_frames(
        np.random.default_rng(0)
    )
    if staged:
        return pipe.run_staged(iter(frames), N, superchunk=staged), pipe
    return pipe.run(iter(frames), N), pipe


def test_wire_resolution_and_bytes():
    pipe = FusedPipeline(*(_make_trackers(fake=True)[:4]), ingest="derived",
                         wire_long_side=64)
    (wh, ww), sx, sy = pipe._wire((H, W))
    assert ww == 64 and wh == 48  # 128x96 -> 64x48, even dims
    assert sx == W / ww and sy == H / wh
    assert pipe.wire_bytes_per_frame((H, W)) == 64 * 48 * 3 // 2
    # identity for rgb/i420
    pipe_i = FusedPipeline(*(_make_trackers(fake=True)[:4]), ingest="i420")
    assert pipe_i._wire((H, W))[0] == (H, W)
    assert pipe_i.wire_bytes_per_frame((H, W)) == H * W * 3 // 2
    # odd source dims round the wire to even
    pipe_o = FusedPipeline(*(_make_trackers(fake=True)[:4]),
                           ingest="derived", wire_long_side=63)
    (oh, ow), _, _ = pipe_o._wire((97, 129))
    assert oh % 2 == 0 and ow % 2 == 0 and ow <= 64


def test_derived_matches_rgb_geometry():
    out_rgb, _ = _run("rgb")
    out_der, pipe = _run("derived", wire_long_side=64)
    assert pipe.ingest == "derived"  # no silent fallback

    for f in range(N):
        a, b = out_rgb["players"][f], out_der["players"][f]
        assert len(a) == len(b)
        for pa, pb in zip(a, b):
            # content-independent fake boxes: the affine maps agree exactly
            np.testing.assert_allclose(pa.xyxy, pb.xyxy, atol=1e-2)
            assert pa.id == pb.id
        ka, kb = out_rgb["players_keypoints"][f], out_der["players_keypoints"][f]
        assert len(ka) == len(kb)
        for pka, pkb in zip(ka, kb):
            for qa, qb in zip(pka, pkb):
                np.testing.assert_allclose(qa.xy, qb.xy, atol=1e-2)

    # ball: content passes through a different resample chain -> bounded px
    dx = [abs(out_rgb["ball"][f].xy[0] - out_der["ball"][f].xy[0])
          for f in range(N) if out_rgb["ball"][f].visibility
          and out_der["ball"][f].visibility]
    assert dx, "no mutually-visible ball frames"
    assert max(dx) <= 6.0  # source pixels; W=128 so ~5% of frame width
    vis_agree = sum(
        out_rgb["ball"][f].visibility == out_der["ball"][f].visibility
        for f in range(N)
    )
    assert vis_agree >= N - 3


def test_derived_staged_bit_equal_to_chunked():
    frames = _make_frames(np.random.default_rng(1))
    out_a, _ = _run("derived", frames=list(frames))
    out_b, _ = _run("derived", staged=2, frames=list(frames))
    for f in range(N):
        assert out_a["ball"][f].xy == out_b["ball"][f].xy
        assert len(out_a["players"][f]) == len(out_b["players"][f])
        for pa, pb in zip(out_a["players"][f], out_b["players"][f]):
            np.testing.assert_array_equal(pa.xyxy, pb.xyxy)


def test_derived_subtract_median_downscale():
    """subtract bg_mode: the on-device |frame - median| difference runs at
    wire resolution against the host-downscaled median (same INTER_AREA
    resize as the frames) — run end-to-end and bound vs rgb."""
    players, pose, ball, court = _make_trackers(fake=True)
    ball.bg_mode = "subtract"

    class SubNet:
        # subtract windows: 8 frames x 1 summed-|diff| channel, /255.
        def apply(self, variables, x):
            import jax.numpy as jnp

            return jnp.stack(
                [(x[..., c] > 0.25).astype(jnp.float32) for c in range(8)],
                axis=-1,
            )

    ball.tracknet.model = SubNet()
    frames = _make_frames(np.random.default_rng(2))
    out_rgb, _ = _run("rgb", frames=list(frames),
                      trackers=(players, pose, ball, court))
    out_der, pipe = _run("derived", wire_long_side=64, frames=list(frames),
                         trackers=(players, pose, ball, court))
    assert pipe.ingest == "derived"
    vis_agree = sum(
        out_rgb["ball"][f].visibility == out_der["ball"][f].visibility
        for f in range(N)
    )
    assert vis_agree >= N - 4
