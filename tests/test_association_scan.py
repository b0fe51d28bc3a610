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
