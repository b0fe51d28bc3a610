"""ByteTrack association behavior tests."""

import pytest

pytestmark = pytest.mark.smoke

import numpy as np

from padel_analytics_tpu.ops.association import ByteTrack


def _box(cx, cy, w=40, h=80):
    return [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]


def test_stable_ids_for_moving_targets():
    bt = ByteTrack(frame_rate=30)
    # Two players drifting in opposite directions; IDs must stay fixed.
    ids_seen = []
    for f in range(20):
        boxes = np.array([_box(200 + 3 * f, 400), _box(900 - 3 * f, 450)])
        conf = np.array([0.9, 0.85])
        ids, keep = bt.update_with_detections(boxes, conf)
        assert keep.all()
        ids_seen.append(tuple(ids))
    first = ids_seen[0]
    assert first == (1, 2)
    assert all(i == first for i in ids_seen)


def test_id_survives_short_occlusion():
    bt = ByteTrack(frame_rate=30)
    for f in range(5):
        ids, _ = bt.update_with_detections(
            np.array([_box(300 + 2 * f, 400)]), np.array([0.9])
        )
    tid = ids[0]
    # Missing for 5 frames.
    for _ in range(5):
        bt.update_with_detections(np.zeros((0, 4)), np.zeros(0))
    # Reappears near predicted location.
    ids, keep = bt.update_with_detections(
        np.array([_box(300 + 2 * 10, 400)]), np.array([0.9])
    )
    assert keep.all() and ids[0] == tid


def test_new_id_after_long_absence():
    bt = ByteTrack(frame_rate=30, lost_track_buffer=5)
    ids, _ = bt.update_with_detections(np.array([_box(300, 400)]), np.array([0.9]))
    tid = ids[0]
    for _ in range(10):
        bt.update_with_detections(np.zeros((0, 4)), np.zeros(0))
    # ByteTrack semantics: a brand-new mid-video track is unconfirmed on its
    # first hit (not emitted) and activates on the second consecutive hit
    # with a fresh ID.
    ids, keep = bt.update_with_detections(np.array([_box(300, 400)]), np.array([0.9]))
    assert not keep.any()
    ids, keep = bt.update_with_detections(np.array([_box(300, 400)]), np.array([0.9]))
    assert keep.all() and ids[0] != tid


def test_low_confidence_second_stage_association():
    bt = ByteTrack(frame_rate=30)
    for f in range(3):
        bt.update_with_detections(np.array([_box(300, 400)]), np.array([0.9]))
    # Confidence dips below the activation threshold but above 0.1:
    # stage 2 should keep the ID alive.
    ids, keep = bt.update_with_detections(np.array([_box(306, 400)]), np.array([0.2]))
    assert keep.all() and ids[0] == 1


def test_low_confidence_never_creates_track():
    bt = ByteTrack(frame_rate=30)
    ids, keep = bt.update_with_detections(np.array([_box(100, 100)]), np.array([0.2]))
    assert not keep.any()


def test_ids_start_at_one_and_increment():
    bt = ByteTrack(frame_rate=30)
    ids, _ = bt.update_with_detections(
        np.array([_box(100, 100), _box(500, 100), _box(900, 100)]),
        np.array([0.9, 0.8, 0.7]),
    )
    assert sorted(ids.tolist()) == [1, 2, 3]
    bt.reset()
    ids, _ = bt.update_with_detections(np.array([_box(100, 100)]), np.array([0.9]))
    assert ids[0] == 1


def test_moderate_iou_match_keeps_id():
    """Regression: ByteTrack's 0.8 match threshold gates COST (1 - IoU),
    so a fast-moving player with ~0.45 IoU between frames must keep its
    ID (the inverted gate required IoU >= 0.8 and churned IDs)."""
    bt = ByteTrack(frame_rate=30)
    ids0, _ = bt.update_with_detections(
        np.array([_box(200, 400, w=40, h=80)]), np.array([0.9])
    )
    # Move 20px in x: IoU(prev, new) = (40-20)/(40+20) = 0.33 >= 0.2.
    ids1, keep = bt.update_with_detections(
        np.array([_box(220, 400, w=40, h=80)]), np.array([0.9])
    )
    assert keep.all() and ids1[0] == ids0[0]


def test_exact_cost_tie_is_deterministic_and_documented():
    """Exact-cost ties are where scipy's Hungarian may differ from the
    reference's lap.lapjv (supervision's solver, players_tracker.py:311):
    both return an optimal assignment, but which of several optima is
    arbitrary. Pin OUR deterministic choice so any change is visible;
    PARITY.md documents that lapjv may pick the transpose on such ties."""
    bt = ByteTrack(frame_rate=30)
    # Establish tracks 1 and 2 at distinct positions (wide boxes so the
    # tie detections overlap BOTH tracks equally).
    for _ in range(3):
        ids, _ = bt.update_with_detections(
            np.array([_box(100, 400, w=200), _box(300, 400, w=200)]),
            np.array([0.9, 0.9]),
        )
    assert tuple(ids) == (1, 2)
    # Two IDENTICAL detections exactly between the tracks: every entry of
    # the cost matrix is equal -> two optimal assignments.
    twin = np.array([_box(200, 400, w=200), _box(200, 400, w=200)])
    ids, keep = bt.update_with_detections(twin, np.array([0.9, 0.9]))
    assert keep.all()
    # scipy.linear_sum_assignment resolves ties in row-major order:
    # track 1 -> detection 0, track 2 -> detection 1.
    assert tuple(ids) == (1, 2)


def test_crossing_targets_keep_their_ids():
    """Golden behavioral sequence: two targets crossing paths. The Kalman
    velocity model carries each track through the crossing, so the ID set
    stays {1, 2} with no births (the reference implementation behaves the
    same way on smooth crossings)."""
    bt = ByteTrack(frame_rate=30)
    all_ids = set()
    for f in range(30):
        boxes = np.array(
            [_box(100 + 20 * f, 400), _box(700 - 20 * f, 400, w=44, h=86)]
        )
        ids, keep = bt.update_with_detections(boxes, np.array([0.9, 0.88]))
        assert keep.all(), f
        all_ids.update(ids.tolist())
    assert all_ids == {1, 2}


def test_fragmented_low_conf_run_keeps_id():
    """A target whose confidence dips below track_thresh for several
    consecutive frames stays associated through stage-2 (the core ByteT
    rack idea) and never spawns a duplicate ID."""
    bt = ByteTrack(frame_rate=30)
    ids_seen = []
    for f in range(12):
        conf = 0.9 if f < 4 or f > 8 else 0.18  # low but > 0.1
        ids, keep = bt.update_with_detections(
            np.array([_box(400 + 5 * f, 300)]), np.array([conf])
        )
        if keep.any():
            ids_seen.extend(ids.tolist())
    assert set(ids_seen) == {1}
