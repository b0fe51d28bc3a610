"""Training convergence demos (round-2 verdict item 10): the train
steps LEARN in their evaluation metrics, not merely a one-step loss
decrease.

- TrackNet: decoded ball positions converge on a synthetic rally
  (python tools/convergence_demo.py — 60 steps: mean error 22px ->
  0.5px, 100% within 4px).
- YOLOv8 detection: held-out mAP@0.5 rises from 0 to ~0.87 on synthetic
  scenes (python tools/yolo_convergence_demo.py, 150 steps)."""

import numpy as np


def test_tracknet_training_converges():
    from tools.convergence_demo import run_demo

    # 60 steps/72 frames: the shortest budget that reliably escapes the
    # all-zeros heatmap minimum (40 steps sometimes stalls there).
    out = run_demo(steps=60, n=72, verbose=False, force_cpu=False)
    before, after = out["before"], out["after"]
    # learned localization: most frames decode within 4 px of GT
    assert after["within_4px"] >= 0.8, (before, after)
    assert after["mean_px"] < before["mean_px"] / 3, (before, after)
    # loss dropped by an order of magnitude
    losses = out["losses"]
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) / 10, (
        np.mean(losses[:5]), np.mean(losses[-5:]),
    )


def test_nonoverlap_quality_bounded_on_trained_model():
    """The ~8x-cheaper nonoverlap ball mode (window_stride=seq_len) is a
    BOUNDED quality trade on a trained TrackNet, measured through the
    real BallTracker end to end: same detect/within-4px rates as the
    stride-1 ensemble on the synthetic rally, sub-pixel mean-error cost
    (0.31 -> 0.52 px at 60 steps — tools/stride_quality_demo.py)."""
    from tools.stride_quality_demo import run_demo

    out = run_demo(steps=60, n=96, verbose=False, force_cpu=False)
    r1, r8 = out["stride1"], out["nonoverlap"]
    assert r1["within_4px"] >= 0.9, out
    assert r8["within_4px"] >= 0.9, out
    assert r8["mean_px"] <= r1["mean_px"] + 2.0, out


def test_inpaintnet_training_converges():
    """InpaintNet learns gap-filling on HELD-OUT trajectories: masked-
    position pixel error drops >3x from the untrained ~290px (see the
    demo's docstring for why ~60-90px is the toy family's floor)."""
    from tools.inpaint_convergence_demo import run_demo

    out = run_demo(steps=600, verbose=False, force_cpu=False)
    assert out["before_px"] > 180, out
    assert out["after_px"] < 120, out
    assert out["after_px"] < out["before_px"] / 3, out


def test_yolo_detection_training_converges():
    """From-scratch YOLOv8-n reaches usable held-out detection quality
    (the metric the reference's players tracker lives on), driving the
    full loss stack (TAL assigner + CIoU + DFL + BCE) and the NMS decode
    path end to end."""
    from tools.yolo_convergence_demo import run_demo

    out = run_demo(steps=150, verbose=False, force_cpu=False)
    before, after = out["before"], out["after"]
    assert before["map50"] < 0.2, before
    assert after["map50"] >= 0.6, (before, after)
    losses = out["losses"]
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) / 3, (
        np.mean(losses[:5]), np.mean(losses[-5:]),
    )
