"""Twin tests executing the reference court-keypoints tracker AS-IS.

Covers both model modes of /root/reference/trackers/keypoints_tracker/
keypoints_tracker.py with stubbed model backends (ultralytics/torchvision
are absent from this image; the stubs return canned outputs while every
line of the reference's own pre/post-processing runs verbatim):

- yolo mode (predict_sample:199-262): PIL squash resize, points_mapper id
  remap, per-axis rescale — serialize-compared against OUR objects/maths.
- resnet mode (predict_frames:264-310): the real KeypointsIterable +
  DataLoader pipeline (torchvision.transforms stubbed with real-math
  equivalents), sigmoid -> reshape(12,2) -> xW/H assembly with UNREMAPPED
  ids — a semantics difference from yolo mode that our tracker mirrors.
- pins the reference crash when the yolo court model returns >=2
  detections (squeeze(0) no-op -> .item() on a (2,)-tensor).
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.smoke
import torch

from _reference_loader import REF, ensure_stub, load_module, load_package


class _FakeKeypoints:
    def __init__(self, xy):
        self.xy = xy


class _FakeResult:
    def __init__(self, xy):
        self.keypoints = _FakeKeypoints(xy)


class _FakeYOLO:
    canned = []

    def __init__(self, model_path):
        self.model_path = model_path

    def to(self, device):
        return self

    def predict(self, sample, **kwargs):
        assert kwargs.get("max_det") == 12
        return [_FakeResult(xy) for xy in _FakeYOLO.canned]


class _FakeResnet(torch.nn.Module):
    """Stands in for torchvision resnet50: real nn.Module so .eval()/
    load_state_dict work; forward returns pre-loaded logits in order."""

    canned = None  # (N, 24) tensor
    cursor = 0

    def __init__(self):
        super().__init__()
        self.fc = torch.nn.Linear(4, 10)  # replaced by the reference ctor

    def forward(self, x):
        b = x.shape[0]
        out = _FakeResnet.canned[_FakeResnet.cursor : _FakeResnet.cursor + b]
        _FakeResnet.cursor += b
        return out

    def to(self, device):
        return self


# Real-math stand-ins for torchvision.transforms (absent from the image):
# torchvision's Resize on a PIL input is PIL bilinear; ToTensor is CHW
# float/255; Normalize is (x - mean) / std.
class _Resize:
    def __init__(self, size):
        self.size = size

    def __call__(self, img):
        from PIL import Image

        h, w = self.size
        return img.resize((w, h), Image.BILINEAR)


class _ToTensor:
    def __call__(self, img):
        arr = np.asarray(img, dtype=np.float32) / 255.0
        return torch.from_numpy(arr.transpose(2, 0, 1))


class _Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean)[:, None, None]
        self.std = torch.tensor(std)[:, None, None]

    def __call__(self, t):
        return (t - self.mean) / self.std


class _Compose:
    def __init__(self, fns):
        self.fns = fns

    def __call__(self, x):
        for f in self.fns:
            x = f(x)
        return x


@pytest.fixture(scope="module")
def ref_court_module():
    ensure_stub("supervision", {"VideoInfo": object})
    ensure_stub("ultralytics", {"YOLO": _FakeYOLO})
    sys.modules["ultralytics"].YOLO = _FakeYOLO
    tv = ensure_stub("torchvision")
    tv.models = types.SimpleNamespace(resnet50=lambda pretrained=True: _FakeResnet())
    tv.transforms = types.SimpleNamespace(
        Compose=_Compose, Resize=_Resize, ToTensor=_ToTensor, Normalize=_Normalize
    )
    sys.modules["torchvision.models"] = tv.models
    sys.modules["torchvision.transforms"] = tv.transforms
    if "trackers" not in sys.modules:
        pkg = types.ModuleType("trackers")
        pkg.__path__ = [f"{REF}/trackers"]
        sys.modules["trackers"] = pkg
    if "trackers.keypoints_tracker" not in sys.modules:
        sub = types.ModuleType("trackers.keypoints_tracker")
        sub.__path__ = [f"{REF}/trackers/keypoints_tracker"]
        sys.modules["trackers.keypoints_tracker"] = sub
    load_package("utils", "utils")
    load_module("trackers.tracker", "trackers/tracker.py")
    load_module(
        "trackers.keypoints_tracker.iterable",
        "trackers/keypoints_tracker/iterable.py",
    )
    return load_module(
        "trackers.keypoints_tracker.keypoints_tracker",
        "trackers/keypoints_tracker/keypoints_tracker.py",
    )


def _our_keypoints(ids_xy):
    from padel_analytics_tpu.trackers import Keypoint, Keypoints

    return Keypoints([Keypoint(id=i, xy=xy) for i, xy in ids_xy])


def test_yolo_mode_points_mapper_matches_reference(ref_court_module):
    from padel_analytics_tpu.trackers.court_keypoints import POINTS_MAPPER

    rng = np.random.default_rng(3)
    h, w, size = 108, 192, 640
    frames = [rng.integers(0, 255, (h, w, 3), np.uint8)]
    xy = rng.uniform(0, size, size=(1, 12, 2)).astype(np.float32)
    _FakeYOLO.canned = [torch.tensor(xy)]

    tracker = ref_court_module.KeypointsTracker(
        model_path="stub.pt", batch_size=1, model_type="yolo"
    )
    (ref_pred,) = tracker.predict_sample(frames)

    ratio_x, ratio_y = w / size, h / size
    ours = _our_keypoints(
        [
            (POINTS_MAPPER[i], (float(xy[0, i, 0]) * ratio_x, float(xy[0, i, 1]) * ratio_y))
            for i in range(12)
        ]
    )
    assert ref_pred.serialize() == ours.serialize()


def test_yolo_mode_crashes_on_two_court_detections(ref_court_module):
    """>=2 court detections: squeeze(0) is a no-op, the keypoint loop
    iterates detections and `.item()` hits a (2,)-tensor (reference bug;
    our tracker takes the best detection from a fixed-size tensor)."""
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 255, (108, 192, 3), np.uint8)]
    _FakeYOLO.canned = [torch.tensor(rng.uniform(0, 640, (2, 12, 2)).astype(np.float32))]
    tracker = ref_court_module.KeypointsTracker(
        model_path="stub.pt", batch_size=1, model_type="yolo"
    )
    with pytest.raises((RuntimeError, KeyError, IndexError)):
        tracker.predict_sample(frames)


def test_resnet_mode_matches_reference(ref_court_module, tmp_path):
    rng = np.random.default_rng(5)
    h, w, n = 108, 192, 3
    frames = [rng.integers(0, 255, (h, w, 3), np.uint8) for _ in range(n)]
    logits = torch.tensor(rng.normal(0, 2, size=(n, 24)).astype(np.float32))
    _FakeResnet.canned = logits
    _FakeResnet.cursor = 0

    ckpt = tmp_path / "resnet.pt"
    donor = _FakeResnet()
    donor.fc = torch.nn.Linear(4, 24)  # the ctor swaps fc before loading
    torch.save(donor.state_dict(), str(ckpt))
    tracker = ref_court_module.KeypointsTracker(
        model_path=str(ckpt), batch_size=2, model_type="resnet"
    )
    ref_preds = tracker.predict_frames(iter(frames))
    assert len(ref_preds) == n

    probs = torch.sigmoid(logits).numpy().reshape(n, 12, 2)
    for f, ref_pred in enumerate(ref_preds):
        # resnet mode: ids are NOT remapped (keypoints_tracker.py:291-310)
        ours = _our_keypoints(
            [
                (i, (float(probs[f, i, 0]) * w, float(probs[f, i, 1]) * h))
                for i in range(12)
            ]
        )
        assert ref_pred.serialize() == ours.serialize()
