"""Twin test executing the reference pose tracker AS-IS (stubbed YOLO).

The reference's PlayerKeypointsTracker.predict_sample
(/root/reference/trackers/players_keypoints_tracker/
players_keypoints_tracker.py:271-322) is pure post-processing around
`YOLO.predict`: PIL squash resize (executed, output unused by the stub),
keypoint rescale by per-axis ratios, the squeeze/unsqueeze shape quirk,
and PlayersKeypoints object assembly. With a stub YOLO returning canned
model-space keypoints we can run that code verbatim and compare its
serialized output against OUR objects built from the same detections —
and pin the reference's crash behavior for 1- and 2-detection frames
(PARITY.md known divergence #5).
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.smoke
import torch

from _reference_loader import REF, ensure_stub, load_module


class _FakeKeypoints:
    def __init__(self, xy):
        self.xy = xy


class _FakeResult:
    def __init__(self, xy):
        self.keypoints = _FakeKeypoints(xy)


class _FakeYOLO:
    """Stub for ultralytics.YOLO: returns pre-loaded keypoint tensors."""

    canned = []

    def __init__(self, model_path):
        self.model_path = model_path

    def to(self, device):
        return self

    def predict(self, sample, **kwargs):
        assert kwargs.get("classes") == [0]
        return [_FakeResult(xy) for xy in _FakeYOLO.canned]


@pytest.fixture(scope="module")
def ref_pose_module():
    ensure_stub("supervision", {"VideoInfo": object})
    ensure_stub("ultralytics", {"YOLO": _FakeYOLO})
    sys.modules["ultralytics"].YOLO = _FakeYOLO
    if "trackers" not in sys.modules:
        pkg = types.ModuleType("trackers")
        pkg.__path__ = [f"{REF}/trackers"]
        sys.modules["trackers"] = pkg
    load_module("trackers.tracker", "trackers/tracker.py")
    return load_module(
        "trackers.players_keypoints_tracker",
        "trackers/players_keypoints_tracker/players_keypoints_tracker.py",
    )


def _make_tracker(ref_mod, size=640):
    return ref_mod.PlayerKeypointsTracker(
        model_path="stub.pt",
        train_image_size=size,
        batch_size=2,
        load_path=None,
        save_path=None,
    )


def _our_players_keypoints(xy_model, ratio_x, ratio_y):
    from padel_analytics_tpu.trackers import (
        PlayerKeypoint,
        PlayerKeypoints,
        PlayersKeypoints,
    )

    players = []
    for det in xy_model:
        players.append(
            PlayerKeypoints(
                [
                    PlayerKeypoint(
                        id=i,
                        name=PlayerKeypoints.KEYPOINTS_NAMES[i],
                        xy=(
                            float(det[i, 0]) * ratio_x,
                            float(det[i, 1]) * ratio_y,
                        ),
                    )
                    for i in range(det.shape[0])
                ]
            )
        )
    return PlayersKeypoints(players)


def test_pose_postprocess_matches_reference_for_normal_frames(ref_pose_module):
    """n=4 and n=0 frames: reference serialize == ours, incl. rescale."""
    rng = np.random.default_rng(7)
    size = 640
    h, w = 108, 192
    frames = [rng.integers(0, 255, (h, w, 3), np.uint8) for _ in range(2)]

    xy0 = torch.tensor(
        rng.uniform(0, size, size=(4, 13, 2)).astype(np.float32)
    )
    xy1 = torch.zeros((0, 13, 2))
    _FakeYOLO.canned = [xy0, xy1]

    tracker = _make_tracker(ref_pose_module, size)
    ref_preds = tracker.predict_sample(frames)
    assert len(ref_preds) == 2

    ratio_x, ratio_y = w / size, h / size
    ours = [
        _our_players_keypoints(xy0.numpy(), ratio_x, ratio_y),
        _our_players_keypoints(xy1.numpy(), ratio_x, ratio_y),
    ]
    for ref_p, our_p in zip(ref_preds, ours):
        assert ref_p.serialize() == our_p.serialize()


@pytest.mark.parametrize("n_det", [1, 2])
def test_reference_crashes_on_one_or_two_detections(ref_pose_module, n_det):
    """Pin the reference bug: its squeeze/unsqueeze quirk makes frames
    with exactly 1 or 2 pose detections raise (PARITY.md divergence #5).
    Our tracker handles every count with a fixed-size padded tensor."""
    rng = np.random.default_rng(n_det)
    frames = [rng.integers(0, 255, (108, 192, 3), np.uint8)]
    _FakeYOLO.canned = [
        torch.tensor(rng.uniform(0, 640, size=(n_det, 13, 2)).astype(np.float32))
    ]
    tracker = _make_tracker(ref_pose_module)
    with pytest.raises((IndexError, RuntimeError)):
        tracker.predict_sample(frames)
