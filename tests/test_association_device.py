"""Device association integration (round-2 verdict item 4).

`FusedPipeline(association='device')` replaces the host ByteTrack with the
on-device chunk-carried scan (ops/association_scan.associate_chunk). The
scan is greedy + constant-velocity (documented divergences in its module
docstring), so exact ID parity with host ByteTrack isn't guaranteed; this
module (a) bounds the divergence rate on crowded synthetic scenes and
(b) verifies the fused wiring end-to-end in both chunked and staged paths.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

import jax.numpy as jnp

from padel_analytics_tpu.ops.association import ByteTrack
from padel_analytics_tpu.ops.association_scan import associate_clip


def _synthetic_scene(rng, n_tracks=8, n_frames=60, w=1280.0, h=720.0,
                     dropout=0.06):
    """Crowded linear-motion scene with noise and dropouts. Returns
    (boxes (F, D, 4), scores (F, D), valid (F, D))."""
    d = n_tracks
    pos = np.stack(
        [rng.uniform(80, w - 200, d), rng.uniform(80, h - 200, d)], -1
    )
    vel = rng.uniform(-6, 6, (d, 2))
    size = rng.uniform(40, 90, (d, 2))
    boxes = np.zeros((n_frames, d, 4), np.float32)
    scores = np.zeros((n_frames, d), np.float32)
    valid = np.zeros((n_frames, d), bool)
    for f in range(n_frames):
        for t in range(d):
            c = pos[t] + vel[t] * f + rng.normal(0, 1.5, 2)
            x1, y1 = c
            x2, y2 = c + size[t]
            boxes[f, t] = (x1, y1, x2, y2)
            scores[f, t] = rng.uniform(0.55, 0.95)
            valid[f, t] = rng.random() > dropout
    return boxes, scores, valid


def _divergence_rate(host_ids, dev_ids, valid):
    """Fraction of validly-detected slots whose device ID disagrees with
    the host ID under the best first-seen ID mapping."""
    mapping = {}
    total = mismatch = 0
    f_n, d_n = valid.shape
    for f in range(f_n):
        for i in range(d_n):
            hid, did = int(host_ids[f, i]), int(dev_ids[f, i])
            if hid == 0 and did == 0:
                continue
            total += 1
            if hid == 0 or did == 0:
                mismatch += 1  # one side dropped the detection
                continue
            if did not in mapping:
                mapping[did] = hid
            if mapping[did] != hid:
                mismatch += 1
    assert total > 0
    return mismatch / total


@pytest.mark.parametrize("seed", [0, 1])
def test_device_assoc_divergence_vs_bytetrack(seed):
    rng = np.random.default_rng(seed)
    boxes, scores, valid = _synthetic_scene(rng)
    f_n, d_n = scores.shape

    # host ByteTrack frame by frame
    bt = ByteTrack(frame_rate=30.0)
    host_ids = np.zeros((f_n, d_n), np.int64)
    for f in range(f_n):
        keep = valid[f]
        ids_f, kept = bt.update_with_detections(boxes[f][keep], scores[f][keep])
        sel = np.flatnonzero(keep)[kept]
        host_ids[f, sel] = ids_f

    dev_ids, _ = associate_clip(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        max_tracks=16,
    )
    rate = _divergence_rate(host_ids, np.asarray(dev_ids), valid)
    # Documented bound (round-3 verdict item 4): with the full host
    # track lifecycle (unconfirmed pass, tracked-only stage 2, immediate
    # FP removal) the greedy scan agrees with Hungarian ByteTrack on
    # >=99% of assignments on crowded linear scenes.
    assert rate < 0.01, f"divergence {rate:.3f}"


def _scene_with_false_positives(rng, fp_rate=0.15, n_fp=4, **kw):
    """Crowded scene plus one-frame high-conf false positives — the case
    the unconfirmed-track pass exists for."""
    boxes, scores, valid = _synthetic_scene(rng, **kw)
    f_n = scores.shape[0]
    fb = np.zeros((f_n, n_fp, 4), np.float32)
    fs = np.zeros((f_n, n_fp), np.float32)
    fv = np.zeros((f_n, n_fp), bool)
    for f in range(f_n):
        for j in range(n_fp):
            if rng.random() < fp_rate:
                c = rng.uniform([40, 40], [1100, 600])
                s = rng.uniform(35, 80, 2)
                fb[f, j] = (*c, *(c + s))
                fs[f, j] = rng.uniform(0.5, 0.9)
                fv[f, j] = True
    return (np.concatenate([boxes, fb], 1), np.concatenate([scores, fs], 1),
            np.concatenate([valid, fv], 1))


@pytest.mark.parametrize("seed", [0, 7])
def test_device_assoc_divergence_with_false_positives(seed):
    """One-frame false positives must not hold IDs: divergence vs host
    ByteTrack stays <1% even on FP-riddled crowded scenes (round-3
    verdict item 4; seed 7 is the worst of an 8-seed sweep at 0.22%)."""
    rng = np.random.default_rng(seed)
    boxes, scores, valid = _scene_with_false_positives(rng)
    f_n, d_n = scores.shape

    bt = ByteTrack(frame_rate=30.0)
    host_ids = np.zeros((f_n, d_n), np.int64)
    for f in range(f_n):
        keep = valid[f]
        ids_f, kept = bt.update_with_detections(boxes[f][keep], scores[f][keep])
        sel = np.flatnonzero(keep)[kept]
        host_ids[f, sel] = ids_f

    dev_ids, _ = associate_clip(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        max_tracks=24,
    )
    rate = _divergence_rate(host_ids, np.asarray(dev_ids), valid)
    assert rate < 0.01, f"divergence {rate:.3f}"


def test_fused_device_association_end_to_end(rng):
    from tests.test_fused import N, _make_frames, _make_trackers
    from padel_analytics_tpu.trackers.fused import FusedPipeline

    frames = _make_frames(rng)

    players_h, pose_h, ball_h, court_h = _make_trackers()
    # The fixture's polygon gate excludes the fake ladder boxes (their
    # anchors sit below the court polygon) — drop it so association has
    # detections to chew on.
    players_h.polygon_zone = None
    host = FusedPipeline(players_h, pose_h, ball_h, court_h, chunk=5,
                         association="host").run(iter(frames), total_frames=N)

    players_d, pose_d, ball_d, court_d = _make_trackers()
    players_d.polygon_zone = None
    dev = FusedPipeline(players_d, pose_d, ball_d, court_d, chunk=5,
                        association="device").run(iter(frames), total_frames=N)

    assert len(dev["players"]) == N
    assert sum(len(fr.serialize()) for fr in dev["players"]) > 0
    # The fake detector emits 3 stable, well-separated boxes every frame:
    # greedy and Hungarian matching must agree exactly here, including the
    # first-seen ID numbering (both allocate in score-descending order).
    for a, b in zip(host["players"], dev["players"]):
        sa, sb = a.serialize(), b.serialize()
        assert len(sa) == len(sb)
        assert sorted(p["id"] for p in sa) == sorted(p["id"] for p in sb)
    # ball/pose untouched by the association mode
    for a, b in zip(host["ball"], dev["ball"]):
        assert a.serialize() == b.serialize()


def test_fused_staged_device_association(rng):
    from tests.test_fused import N, _make_frames, _make_trackers
    from padel_analytics_tpu.trackers.fused import FusedPipeline

    frames = _make_frames(rng)
    players, pose, ball, court = _make_trackers()
    players.polygon_zone = None
    fused = FusedPipeline(players, pose, ball, court, chunk=5,
                          association="device")
    out = fused.run_staged(iter(frames), total_frames=N, superchunk=3)
    assert len(out["players"]) == N
    ids_seen = {
        p["id"] for fr in out["players"] for p in fr.serialize()
    }
    assert ids_seen and all(i > 0 for i in ids_seen)


def test_fused_rejects_unknown_association():
    from tests.test_fused import _make_trackers
    from padel_analytics_tpu.trackers.fused import FusedPipeline

    players, pose, ball, court = _make_trackers()
    with pytest.raises(ValueError):
        FusedPipeline(players, pose, ball, court, association="gpu")
