"""Runtime NMS pre-filter saturation signal (round-2 verdict item 6).

The pre-NMS top_k cap (vs ultralytics' max_nms=30000, PARITY.md §6) used
to truncate silently. Now `ops.nms.candidate_count` reports per-frame
candidate counts and `SaturationCounter` warns once and tallies — a dense
scene triggers the warning, a padel-sparse scene stays silent.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from padel_analytics_tpu.ops.nms import SaturationCounter, candidate_count


def test_candidate_count_basic():
    scores = jnp.asarray(
        [[0.9, 0.6, 0.4, 0.1], [0.05, 0.02, 0.01, 0.0]], jnp.float32
    )
    n = np.asarray(candidate_count(scores, 0.5))
    assert n.tolist() == [2, 0]


def test_saturation_counter_warns_once(capsys):
    c = SaturationCounter("det", top_k=4)
    c.update(np.asarray([2, 3]))  # sparse: silent
    assert capsys.readouterr().out == ""
    assert c.saturated_frames == 0

    c.update(np.asarray([10, 2, 7]))  # dense: warn
    out = capsys.readouterr().out
    assert "WARNING" in out and "top_k=4" in out
    assert c.saturated_frames == 2

    c.update(np.asarray([99]))  # later saturation counted, not re-warned
    assert capsys.readouterr().out == ""
    assert c.saturated_frames == 3
    assert c.summary()["total_frames"] == 6


@pytest.mark.parametrize("dense", [False, True])
def test_player_tracker_saturation_signal(capsys, dense):
    """End-to-end through PlayerTracker.detect_sample: a conf threshold
    that floods the pre-filter warns; the padel default stays silent."""
    from padel_analytics_tpu.config import PlayersTrackerConfig
    from padel_analytics_tpu.trackers.players import PlayerTracker

    cfg = PlayersTrackerConfig(
        model_variant="n",
        imgsz=64,
        batch_size=2,
        # dense: every anchor clears conf (random-init scores ~0.5) and
        # top_k=16 < 84 anchors saturates; sparse: the reference conf 0.5
        # with generous top_k stays quiet.
        conf=1e-6 if dense else 0.9999,
        nms_top_k=16 if dense else 128,
        max_detections=8,
    )
    tracker = PlayerTracker(None, polygon_zone=None, config=cfg)
    frames = np.random.default_rng(0).integers(
        0, 255, (2, 96, 128, 3), np.uint8
    )
    tracker.detect_sample(frames)
    out = capsys.readouterr().out
    if dense:
        assert "WARNING" in out and "truncated" in out
        assert tracker.nms_saturation.saturated_frames == 2
    else:
        assert "WARNING" not in out
        assert tracker.nms_saturation.saturated_frames == 0
