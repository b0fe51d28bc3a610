"""validate_weights runbook: the CI stand-in for real-weight golden
validation (round-2 verdict item 2).

No reference checkpoints ship in this environment, so the stand-in runs
the EXACT command path with stub (random-init) weights: one pipeline run
produces the 'reference' caches, a second run compares against them via
the same comparators — determinism makes every tracker report 0px, so the
<=1px verdict machinery is exercised end to end. When real weights and
reference-produced caches exist, the identical command performs the true
north-star check (docs/REAL_WEIGHTS.md).
"""

import json
import shutil
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def clip_and_kps(tmp_path_factory):
    root = tmp_path_factory.mktemp("valclip")
    video = root / "clip.mp4"
    w, h, n = 320, 192, 12
    writer = cv2.VideoWriter(
        str(video), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (w, h)
    )
    rng = np.random.default_rng(0)
    for i in range(n):
        f = np.full((h, w, 3), 40, np.uint8)
        cv2.circle(f, (20 + i * 9, h // 2), 3, (250, 250, 90), -1)
        f += rng.integers(0, 6, f.shape, dtype=np.uint8)
        writer.write(f)
    writer.release()
    pts = [
        (w * 0.12, h * 0.86), (w * 0.88, h * 0.86),
        (w * 0.13, h * 0.75), (w * 0.50, h * 0.75), (w * 0.87, h * 0.75),
        (w * 0.14, h * 0.55), (w * 0.86, h * 0.55),
        (w * 0.15, h * 0.36), (w * 0.50, h * 0.36), (w * 0.85, h * 0.36),
        (w * 0.16, h * 0.22), (w * 0.84, h * 0.22),
    ]
    kps = root / "kps.json"
    kps.write_text(json.dumps([[float(x), float(y)] for x, y in pts]))
    return str(video), str(kps)


def test_validate_weights_stub_golden_roundtrip(clip_and_kps, tmp_path, monkeypatch):
    from padel_analytics_tpu.apps import validate_weights as vw

    video, kps = clip_and_kps
    weights_dir = tmp_path / "weights"  # empty: random init everywhere
    weights_dir.mkdir()
    cache_dir = tmp_path / "ref_caches"
    cache_dir.mkdir()

    # pass 1: produce 'reference' caches with the same stub weights
    args = vw.main.__globals__  # noqa: F841 (keep import shape obvious)
    ns = [
        "--weights-dir", str(weights_dir),
        "--cache-dir", str(cache_dir),
        "--video", video,
        "--keypoints", kps,
        "--variant", "n",
        "--out", str(tmp_path / "r1.json"),
    ]
    # shrink pose input for CPU CI (the command itself defaults to the
    # reference's 1280)
    monkeypatch.setattr(vw, "build_and_run", _shrunken(vw.build_and_run))
    rc = vw.main(ns)
    assert rc == 0
    report1 = json.loads((tmp_path / "r1.json").read_text())
    # nothing to compare yet: all kinds skipped, verdict False
    assert report1["within_1px_verdict"] is False

    # copy pass-1 caches into the reference layout
    r1 = json.loads((tmp_path / "r1.json").read_text())
    del r1
    # find the tmp dir validate_weights used via the written caches: rerun
    # pass 1 but keep its caches by pointing cache_dir at them afterwards
    pass1 = Path(tmp_path / "pass1")
    pass1.mkdir()
    ours = vw.build_and_run(
        _ArgsNS(video, kps, None, "n"), dict.fromkeys(vw.WEIGHT_NAMES), pass1
    )
    for kind, ref_name in vw.REF_CACHE_NAMES.items():
        shutil.copy(ours[kind], cache_dir / ref_name)

    # pass 2: compare a fresh run against those caches -> 0px everywhere
    rc = vw.main(ns[:-1] + [str(tmp_path / "r2.json")])
    assert rc == 0
    report2 = json.loads((tmp_path / "r2.json").read_text())
    assert report2["within_1px_verdict"] is True, report2
    assert report2["max_px_overall"] == 0.0
    for kind in vw.REF_CACHE_NAMES:
        assert isinstance(report2[kind], dict), report2[kind]


def test_validate_weights_reference_format_checkpoints(
    clip_and_kps, tmp_path, monkeypatch
):
    """Round-3 verdict item 5: the SAME command, but with synthetic
    checkpoints on disk in the exact reference formats — an
    ultralytics-style .pt pickling a DetectionModel/PoseModel whole-module
    (players_tracker.py:303), a {'model': state_dict, 'param_dict'}
    TrackNet/InpaintNet ckpt (ball_tracker.py:253-274), and a raw resnet50
    state_dict for court.pt (keypoints_tracker.py:165-166, exercising the
    'auto' architecture inference). Every converter runs INSIDE the
    command; pass 2 re-loads and re-converts from disk, so --strict 0px
    proves discovery -> unpickle -> conversion -> pipeline -> comparators
    -> verdict end to end."""
    import torch

    from padel_analytics_tpu.apps import validate_weights as vw

    from test_models import (
        _build_torch_inpaintnet,
        _build_torch_resnet50,
        _build_torch_tracknet,
    )
    from test_yolo_convert_twin import build_torch_yolov8n

    video, kps = clip_and_kps
    weights_dir = tmp_path / "weights"
    weights_dir.mkdir()
    cache_dir = tmp_path / "ref_caches"
    cache_dir.mkdir()

    torch.manual_seed(7)
    _save_ultralytics_pt(
        weights_dir / "players.pt", "DetectionModel",
        build_torch_yolov8n(nc=1, seed=1),
    )
    _save_ultralytics_pt(
        weights_dir / "pose.pt", "PoseModel",
        build_torch_yolov8n(nc=1, nk=13, seed=2),
    )
    torch.save(
        {"model": _build_torch_tracknet(27, 8).state_dict(),
         "param_dict": {"seq_len": 8, "bg_mode": "concat"}},
        weights_dir / "tracknet.pt",
    )
    torch.save(
        {"model": _build_torch_inpaintnet().state_dict(),
         "param_dict": {"seq_len": 16}},
        weights_dir / "inpaintnet.pt",
    )
    torch.save(
        _build_torch_resnet50(24).state_dict(), weights_dir / "court.pt"
    )

    monkeypatch.setattr(vw, "build_and_run", _shrunken(vw.build_and_run))
    ns = [
        "--weights-dir", str(weights_dir),
        "--cache-dir", str(cache_dir),
        "--video", video,
        "--keypoints", kps,
        "--variant", "n",
    ]

    # pass 1: produce the 'reference' caches with the on-disk weights
    pass1 = tmp_path / "pass1"
    pass1.mkdir()
    args1 = _ArgsNS(video, kps, None, "n")
    weights = {
        k: str(weights_dir / name) for k, name in vw.WEIGHT_NAMES.items()
    }
    ours = _shrunken(vw.build_and_run)(args1, weights, pass1)
    for kind, ref_name in vw.REF_CACHE_NAMES.items():
        shutil.copy(ours[kind], cache_dir / ref_name)

    # pass 2: fresh unpickle + conversion + run, strict comparison
    rc = vw.main(ns + ["--strict", "--out", str(tmp_path / "r.json")])
    assert rc == 0
    report = json.loads((tmp_path / "r.json").read_text())
    assert report["within_1px_verdict"] is True, report
    assert report["max_px_overall"] == 0.0
    assert all(report["weights"].values()), report["weights"]
    for kind in vw.REF_CACHE_NAMES:
        assert isinstance(report[kind], dict), report[kind]


def test_validate_weights_fast_path_section(clip_and_kps, tmp_path, monkeypatch):
    """Round-4 verdict item 7: `--fast-path` reruns the pipeline in the
    bench headline config (derived ingest + half-res pose) and reports
    its per-tracker px deltas against the SAME run's parity outputs, so
    the day real weights appear both configs get automatic verdicts.
    Rehearsed here with stub weights at smoke scale (wire 240 < the
    320-px source, so the two-step resize path actually engages)."""
    from padel_analytics_tpu.apps import validate_weights as vw

    video, kps = clip_and_kps
    weights_dir = tmp_path / "weights"
    weights_dir.mkdir()
    cache_dir = tmp_path / "ref_caches"
    cache_dir.mkdir()

    monkeypatch.setattr(vw, "build_and_run", _shrunken(vw.build_and_run))
    rc = vw.main([
        "--weights-dir", str(weights_dir),
        "--cache-dir", str(cache_dir),
        "--video", video,
        "--keypoints", kps,
        "--variant", "n",
        "--fast-path",
        "--fast-wire-long-side", "240",
        "--out", str(tmp_path / "r.json"),
    ])
    assert rc == 0
    report = json.loads((tmp_path / "r.json").read_text())
    section = report["fast_path"]
    assert section["config"] == {
        "ingest": "derived", "wire_long_side": 240, "pose_image_size": 640,
    }
    # every tracker got a real comparator verdict (fast vs parity run)
    for kind in vw.REF_CACHE_NAMES:
        assert isinstance(section[kind], dict), section[kind]
    assert "max_px_vs_parity" in section
    assert isinstance(section["within_bound_verdict"], bool)


def _save_ultralytics_pt(path, cls_name, torch_model):
    """torch.save a fake whole-module ultralytics checkpoint: the class
    claims __module__='ultralytics.nn.tasks', so weights_only=True fails
    and load_torch_checkpoint's stubbed-unpickle fallback must run —
    exactly what a real ultralytics .pt exercises."""
    import sys
    import types

    import torch
    from torch import nn as tnn

    created = []
    for name in ("ultralytics", "ultralytics.nn", "ultralytics.nn.tasks"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            created.append(name)
    cls = type(cls_name, (tnn.Module,), {"__module__": "ultralytics.nn.tasks"})
    setattr(sys.modules["ultralytics.nn.tasks"], cls_name, cls)
    try:
        wrapper = cls()
        wrapper.model = torch_model.model  # state_dict keys 'model.{i}...'
        torch.save({"model": wrapper, "train_args": {}}, path)
    finally:
        for name in created:
            sys.modules.pop(name, None)


class _ArgsNS:
    def __init__(self, video, keypoints, max_frames, variant):
        self.video = video
        self.keypoints = keypoints
        self.max_frames = max_frames
        self.variant = variant
        self.court_model_type = "auto"


def _shrunken(orig):
    """Wrap build_and_run to shrink the pose input size for CPU CI."""

    def wrapper(args, weights, tmp, **kw_outer):
        import padel_analytics_tpu.trackers.ball as bl
        import padel_analytics_tpu.trackers.player_keypoints as pk
        from padel_analytics_tpu.config import BallTrackerConfig

        orig_pk = pk.PlayerKeypointsTracker.__init__
        orig_bl = bl.BallTracker.__init__

        def small_pk(self, *a, **kw):
            kw["train_image_size"] = 64
            orig_pk(self, *a, **kw)

        def small_bl(self, *a, **kw):
            kw["config"] = BallTrackerConfig(
                height=72, width=128, batch_size=8, median_max_sample_num=6
            )
            orig_bl(self, *a, **kw)

        pk.PlayerKeypointsTracker.__init__ = small_pk
        bl.BallTracker.__init__ = small_bl
        try:
            return orig(args, weights, tmp, **kw_outer)
        finally:
            pk.PlayerKeypointsTracker.__init__ = orig_pk
            bl.BallTracker.__init__ = orig_bl

    return wrapper
