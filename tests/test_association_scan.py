"""On-device scan ByteTrack tests (fixed-size state, greedy matching)."""

import pytest

pytestmark = pytest.mark.smoke

import numpy as np

import jax.numpy as jnp

from padel_analytics_tpu.ops.association_scan import associate_clip


def _pad(dets, d=6):
    """dets: list of frames, each list of (box, score). -> arrays."""
    f = len(dets)
    boxes = np.zeros((f, d, 4), np.float32)
    scores = np.zeros((f, d), np.float32)
    valid = np.zeros((f, d), bool)
    for i, frame in enumerate(dets):
        for j, (box, score) in enumerate(frame):
            boxes[i, j] = box
            scores[i, j] = score
            valid[i, j] = True
    return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)


def _box(cx, cy, w=40, h=80):
    return [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]


def test_scan_stable_ids():
    dets = [
        [(_box(200 + 3 * f, 400), 0.9), (_box(900 - 3 * f, 450), 0.85)]
        for f in range(20)
    ]
    boxes, scores, valid = _pad(dets)
    ids, _ = associate_clip(boxes, scores, valid)
    ids = np.asarray(ids)
    # Frame 0 assigns 1 and 2; identities stay fixed for the whole clip.
    first = ids[0, :2]
    assert sorted(first.tolist()) == [1, 2]
    for f in range(20):
        np.testing.assert_array_equal(ids[f, :2], first)
        assert (ids[f, 2:] == 0).all()


def test_scan_occlusion_recovery():
    dets = []
    for f in range(5):
        dets.append([(_box(300 + 2 * f, 400), 0.9)])
    for f in range(4):
        dets.append([])  # occluded
    for f in range(5):
        dets.append([(_box(300 + 2 * (9 + f), 400), 0.9)])
    boxes, scores, valid = _pad(dets)
    ids, _ = associate_clip(boxes, scores, valid)
    ids = np.asarray(ids)
    tid = ids[0, 0]
    assert tid == 1
    # after reappearing, the same ID continues
    assert ids[9, 0] == tid


def test_scan_low_conf_keeps_track_alive():
    dets = [[(_box(300, 400), 0.9)] for _ in range(3)]
    dets.append([(_box(306, 400), 0.2)])  # low-conf stage-2 match
    dets.append([(_box(309, 400), 0.9)])
    boxes, scores, valid = _pad(dets)
    ids, _ = associate_clip(boxes, scores, valid)
    ids = np.asarray(ids)
    assert ids[3, 0] == ids[0, 0] == 1
    assert ids[4, 0] == 1


def test_scan_low_conf_never_spawns():
    dets = [[(_box(100, 100), 0.2)] for _ in range(4)]
    boxes, scores, valid = _pad(dets)
    ids, _ = associate_clip(boxes, scores, valid)
    assert (np.asarray(ids) == 0).all()


def test_scan_midclip_spawn_confirms_second_hit():
    dets = [[] for _ in range(3)]
    dets += [[(_box(500, 300), 0.9)] for _ in range(3)]
    boxes, scores, valid = _pad(dets)
    ids, _ = associate_clip(boxes, scores, valid)
    ids = np.asarray(ids)
    assert ids[3, 0] == 0  # unconfirmed on first hit (ByteTrack semantics)
    assert ids[4, 0] > 0 and ids[5, 0] == ids[4, 0]


def test_scan_one_frame_false_positive_removed():
    """An unconfirmed track that misses its very next frame is removed
    immediately (host unconfirmed pass, association.py:288-290) — it
    neither emits an ID nor survives to claim a later detection."""
    dets = [[(_box(200, 200), 0.9)] for _ in range(2)]  # real track
    dets.append([(_box(200, 200), 0.9), (_box(800, 500), 0.9)])  # + FP
    dets.append([(_box(200, 200), 0.9)])  # FP gone
    # a NEW object appears exactly where the FP was: must get a NEW id
    dets += [[(_box(200, 200), 0.9), (_box(800, 500), 0.9)]
             for _ in range(3)]
    boxes, scores, valid = _pad(dets)
    ids, _ = associate_clip(boxes, scores, valid)
    ids = np.asarray(ids)
    assert ids[2, 1] == 0  # FP unconfirmed on its only frame
    # the new object's first hit spawns fresh (unconfirmed), second
    # confirms with an id distinct from any the FP could have held
    assert ids[4, 1] == 0
    assert ids[5, 1] > 0 and ids[5, 1] != ids[2, 0]
    assert ids[6, 1] == ids[5, 1]
    # the real track is untouched throughout
    assert all(ids[f, 0] == ids[0, 0] for f in range(7))


def test_scan_unconfirmed_gate_is_0p3():
    """The unconfirmed pass gates at IoU >= 0.3 (host cost 0.7): a
    second hit overlapping ~0.5 IoU confirms; one overlapping < 0.3
    does not (the track is removed, the det spawns fresh)."""
    near = [(_box(500, 300), 0.9)], [(_box(500 + 13, 300), 0.9)]
    far = [(_box(500, 300), 0.9)], [(_box(500 + 45, 300), 0.9)]
    for frames, confirms in ((near, True), (far, False)):
        dets = [[], list(frames[0]), list(frames[1]), list(frames[1])]
        boxes, scores, valid = _pad(dets)
        ids, _ = associate_clip(boxes, scores, valid)
        ids = np.asarray(ids)
        assert ids[1, 0] == 0  # first hit: unconfirmed
        if confirms:
            assert ids[2, 0] > 0
        else:
            assert ids[2, 0] == 0  # removed + respawned unconfirmed
            assert ids[3, 0] > 0  # respawn confirms next frame


def test_scan_lost_track_ignores_low_dets():
    """Stage 2 only keeps TRACKED (matched-last-frame) tracks alive on
    low dets; a LOST track must not re-match a low det (host
    association.py:248-250 takes only state=='tracked' leftovers)."""
    dets = [[(_box(300, 400), 0.9)] for _ in range(3)]
    dets.append([])  # miss -> lost
    dets.append([(_box(300, 400), 0.2)])  # low det where the track was
    dets.append([(_box(300, 400), 0.9)])  # high det re-finds it
    boxes, scores, valid = _pad(dets)
    ids, _ = associate_clip(boxes, scores, valid)
    ids = np.asarray(ids)
    tid = ids[0, 0]
    assert ids[4, 0] == 0  # lost track must NOT claim the low det
    assert ids[5, 0] == tid  # stage 1 re-match on the high det
