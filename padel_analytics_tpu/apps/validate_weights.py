"""Real-weight golden validation runbook — the ONE command for the
north-star "detections within 1px of the reference" check (round-2
verdict item 2).

Given a directory of reference checkpoints and a directory of
reference-produced JSON prediction caches (the reference writes them via
tracker.py:200-241 with the paths at config.py:25-48), this command:

  1. converts each .pt via models/convert.py (the trackers do this on
     load: players_tracker.py:303 ultralytics .pt; ball_tracker.py:253-274
     param_dict ckpts; keypoints_tracker.py:165-166 resnet state_dict),
  2. runs the full pipeline on the clip, writing our caches,
  3. compares every tracker's cache against the reference cache with
     apps/compare_predictions.py's comparators,
  4. emits one JSON report with a per-tracker px-delta and a combined
     <=1px verdict.

Weights layout (override any path with flags):
  <weights_dir>/players.pt        ultralytics YOLOv8m detection
  <weights_dir>/pose.pt           ultralytics YOLOv8m-pose (13 kpts)
  <weights_dir>/tracknet.pt       TrackNet ckpt with param_dict
  <weights_dir>/inpaintnet.pt     InpaintNet ckpt (optional)
  <weights_dir>/court.pt          court model (yolo 12-kpt or resnet50)

Reference-cache layout (what the reference's config.py names them):
  <cache_dir>/players_detections.json
  <cache_dir>/players_keypoints_detections.json
  <cache_dir>/ball_detections.json
  <cache_dir>/keypoints_detections.json

Missing weights or caches degrade gracefully: the affected tracker is
reported as "skipped" and the exit code stays 0 unless --strict. When
weights appear in the expected location this command activates the full
check with no edits — the runbook docs/REAL_WEIGHTS.md walks through
producing the reference caches.

  python -m padel_analytics_tpu.apps.validate_weights \
      --weights-dir weights/ --cache-dir ref_caches/ \
      --video rally.mp4 --keypoints source_keypoints.json \
      --out report.json [--strict] [--max-frames N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path


def build_and_run(args, weights: dict, tmp: Path,
                  fast_path: bool = False) -> dict:
    """Run the pipeline with the given weights; returns {kind: cache_path}
    of OUR freshly-written caches.

    fast_path=True runs the bench headline configuration instead of the
    reference-parity one: ingest='derived' (<=--fast-wire-long-side wire
    buffer, two-step resize) and pose at --fast-pose-size (reference-
    supported train_image_size, players_keypoints_tracker.py:240). Used
    by --fast-path to attach a measured quality verdict to the fast
    configs the day real weights appear."""
    import numpy as np

    import jax.numpy as jnp

    from ..config import BallTrackerConfig
    from ..ops.polygon import PolygonZone
    from ..trackers import (
        BallTracker,
        Keypoint,
        Keypoints,
        KeypointsTracker,
        PlayerKeypointsTracker,
        PlayerTracker,
        TrackingRunner,
    )
    from ..utils.video import VideoInfo

    info = VideoInfo.from_video_path(args.video)
    with open(args.keypoints) as f:
        pts = json.load(f)
    kp = Keypoints(
        [Keypoint(id=i, xy=(float(x), float(y))) for i, (x, y) in enumerate(pts)]
    )
    polygon = np.array([pts[0], pts[1], pts[-1], pts[-2]])

    ours: dict = {}
    players = PlayerTracker(
        weights.get("players"),
        PolygonZone(polygon, (info.width, info.height)),
        batch_size=8,
        model_variant=args.variant,
        compute_dtype=jnp.bfloat16,
        save_path=tmp / "players.json",
    )
    ours["players"] = str(tmp / "players.json")
    pose = PlayerKeypointsTracker(
        weights.get("pose"),
        train_image_size=(
            getattr(args, "fast_pose_size", 640) if fast_path else 1280
        ),
        batch_size=8,
        model_variant=args.variant,
        compute_dtype=jnp.bfloat16,
        save_path=tmp / "players_keypoints.json",
    )
    ours["players_keypoints"] = str(tmp / "players_keypoints.json")
    ball = BallTracker(
        weights.get("tracknet"),
        weights.get("inpaintnet"),
        config=BallTrackerConfig(batch_size=8),
        compute_dtype=jnp.bfloat16,
        save_path=tmp / "ball.json",
    )
    ours["ball"] = str(tmp / "ball.json")
    if weights.get("court"):
        # Validate the court model path itself (reference
        # keypoints_tracker.py:199-312 ships yolo AND resnet variants) —
        # with a court checkpoint present the fixed-keypoints shortcut
        # would leave the 'keypoints' comparison vacuous.
        court = KeypointsTracker(
            weights["court"],
            batch_size=8,
            model_type=_court_model_type(args, weights["court"]),
            model_variant=args.variant,
            compute_dtype=jnp.bfloat16,
            save_path=tmp / "keypoints.json",
        )
    else:
        court = KeypointsTracker(
            fixed_keypoints_detection=kp, save_path=tmp / "keypoints.json"
        )
    ours["keypoints"] = str(tmp / "keypoints.json")

    fused_kwargs = {}
    if fast_path:
        fused_kwargs = {
            "fused_ingest": "derived",
            "fused_wire_long_side": getattr(args, "fast_wire_long_side", 960),
        }
    runner = TrackingRunner(
        [players, pose, ball, court],
        args.video,
        str(tmp / "out.mp4"),
        end=args.max_frames,
        collect_data=False,
        fused=True,
        **fused_kwargs,
    )
    runner.run()
    return ours


def _court_model_type(args, path: str) -> str:
    """'yolo' or 'resnet' for court.pt: the flag when given, otherwise
    inferred from the checkpoint's structure (an ultralytics pickle
    carries a 'model' nn.Module / dict; a resnet state_dict is flat
    tensor keys like 'layer1.0.conv1.weight' — keypoints_tracker.py:158
    vs :165)."""
    if args.court_model_type != "auto":
        return args.court_model_type
    from ..models.convert import load_torch_checkpoint

    ckpt = load_torch_checkpoint(path)
    if isinstance(ckpt, dict):
        keys = set(ckpt.keys())
        if "model" in keys or "ema" in keys:
            return "yolo"
        if any(k.startswith(("layer", "fc.", "conv1.")) for k in keys):
            return "resnet"
    if hasattr(ckpt, "state_dict"):
        keys = set(ckpt.state_dict().keys())
        if any(k.startswith(("layer", "fc.", "conv1.")) for k in keys):
            return "resnet"
    return "yolo"


REF_CACHE_NAMES = {
    "players": "players_detections.json",
    "players_keypoints": "players_keypoints_detections.json",
    "ball": "ball_detections.json",
    "keypoints": "keypoints_detections.json",
}

WEIGHT_NAMES = {
    "players": "players.pt",
    "pose": "pose.pt",
    "tracknet": "tracknet.pt",
    "inpaintnet": "inpaintnet.pt",
    "court": "court.pt",
}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="validate_weights")
    parser.add_argument("--weights-dir", required=True)
    parser.add_argument("--cache-dir", required=True,
                        help="reference-produced JSON caches")
    parser.add_argument("--video", required=True)
    parser.add_argument("--keypoints", required=True,
                        help="fixed court keypoints JSON (12 [x,y])")
    parser.add_argument("--out", default="validation_report.json")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--variant", default="m")
    parser.add_argument(
        "--court-model-type", default="auto",
        choices=("auto", "yolo", "resnet"),
        help="court.pt architecture; 'auto' infers from the checkpoint",
    )
    parser.add_argument("--strict", action="store_true",
                        help="non-zero exit when anything is skipped or >1px")
    parser.add_argument(
        "--fast-path", action="store_true",
        help="ALSO run the bench headline config (ingest='derived' + "
        "pose@--fast-pose-size) and report its per-tracker px deltas vs "
        "this run's parity-config outputs — the fast path's measured "
        "quality trade on these weights (smoke-scale evidence: "
        "tools/derived_quality_demo.py)",
    )
    parser.add_argument("--fast-wire-long-side", type=int, default=960)
    parser.add_argument("--fast-pose-size", type=int, default=640)
    parser.add_argument(
        "--fast-bound", type=float, default=5.0,
        help="px bound for the fast-path verdict (vs parity outputs)",
    )
    args = parser.parse_args(argv)

    wdir = Path(args.weights_dir)
    weights = {
        k: str(wdir / name) if (wdir / name).exists() else None
        for k, name in WEIGHT_NAMES.items()
    }
    present = [k for k, v in weights.items() if v]
    print(f"validate: weights present: {present or 'NONE (random init)'}")

    tmp = Path(tempfile.mkdtemp(prefix="pat_validate_"))
    ours = build_and_run(args, weights, tmp)

    from .compare_predictions import COMPARATORS

    report: dict = {"weights": {k: bool(v) for k, v in weights.items()}}
    worst = 0.0
    skipped = []
    for kind, ref_name in REF_CACHE_NAMES.items():
        ref_path = Path(args.cache_dir) / ref_name
        if not ref_path.exists():
            report[kind] = "skipped: no reference cache"
            skipped.append(kind)
            continue
        with open(ours[kind]) as f:
            a = json.load(f)
        with open(ref_path) as f:
            b = json.load(f)
        stats = COMPARATORS[kind](a, b)
        report[kind] = stats
        if "max_px" in stats and np_isfinite(stats["max_px"]):
            worst = max(worst, stats["max_px"])

    report["max_px_overall"] = worst
    report["within_1px_verdict"] = bool(worst <= 1.0) and not skipped

    fast_fail = False
    if args.fast_path:
        # Second run in the bench headline config; compared against THIS
        # run's parity outputs (not the reference caches), so the section
        # isolates the fast path's own quality trade on these weights.
        fast_tmp = tmp / "fast"
        fast_tmp.mkdir()
        fast = build_and_run(args, weights, fast_tmp, fast_path=True)
        section: dict = {
            "config": {
                "ingest": "derived",
                "wire_long_side": args.fast_wire_long_side,
                "pose_image_size": args.fast_pose_size,
            }
        }
        worst_fast = 0.0
        for kind in REF_CACHE_NAMES:
            with open(fast[kind]) as f:
                a = json.load(f)
            with open(ours[kind]) as f:
                b = json.load(f)
            stats = COMPARATORS[kind](a, b)
            section[kind] = stats
            if "max_px" in stats and np_isfinite(stats["max_px"]):
                worst_fast = max(worst_fast, stats["max_px"])
        section["max_px_vs_parity"] = worst_fast
        section["within_bound_verdict"] = bool(worst_fast <= args.fast_bound)
        report["fast_path"] = section
        fast_fail = not section["within_bound_verdict"]

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"validate: report written to {args.out}")
    if args.strict and (skipped or worst > 1.0 or fast_fail):
        return 1
    return 0


def np_isfinite(x) -> bool:
    import numpy as np

    return bool(np.isfinite(x))


if __name__ == "__main__":
    sys.exit(main())
