"""CLI entry point — the main.py-equivalent pipeline driver.

Flow parity with /root/reference/main.py:60-185: probe video info ->
acquire the 12 court keypoints (JSON load, or the interactive click UI
when a display is available) -> build the on-court polygon from keypoints
0, 1, -1, -2 (main.py:108-119) -> instantiate the four trackers -> run the
TrackingRunner -> dump the analytics CSV.

Config: accepts either a reference-style flat config module
(--config path/to/config.py, consumed via PipelineConfig.from_module) or
individual flags. `python -m padel_analytics_tpu.apps.cli --help`.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import timeit
from pathlib import Path

import numpy as np

from ..config import PipelineConfig
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
from ..utils.video import VideoInfo, frame_generator


def _load_config(args) -> PipelineConfig:
    if args.config:
        spec = importlib.util.spec_from_file_location("user_config", args.config)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        cfg = PipelineConfig.from_module(module)
    else:
        cfg = PipelineConfig()
    if args.input_video:
        cfg.input_video_path = args.input_video
    if args.output_video:
        cfg.output_video_path = args.output_video
    if args.max_frames is not None:
        cfg.max_frames = args.max_frames
    if args.keypoints:
        cfg.fixed_court_keypoints_load_path = args.keypoints
    if args.data_csv:
        cfg.collect_data_path = args.data_csv
    if args.no_collect:
        cfg.collect_data = False
    if args.no_render:
        cfg.render_video = False
    if args.render_scale is not None:
        cfg.render_scale = args.render_scale
    if args.variant:
        cfg.players.model_variant = args.variant
        cfg.player_keypoints.model_variant = args.variant
        cfg.court_keypoints.model_variant = args.variant
    return cfg


def _acquire_keypoints(
    cfg: PipelineConfig, video_path: str, interactive: bool = True
) -> list:
    """Load fixed court keypoints from JSON, or fall back to the
    interactive cv2 click UI (main.py:81-94). `interactive=False` (e.g.
    the streamlit server, where a cv2 window would hang headless or open
    on the wrong display) raises instead of falling back."""
    if cfg.fixed_court_keypoints_load_path:
        with open(cfg.fixed_court_keypoints_load_path) as f:
            selected = json.load(f)
    elif not interactive:
        raise RuntimeError(
            "no fixed court keypoints JSON configured "
            "(FIXED_COURT_KEYPOINTS_LOAD_PATH) and the interactive click "
            "UI is unavailable in this environment"
        )
    else:
        from .keypoint_picker import pick_keypoints

        img = next(frame_generator(video_path, end=1))
        selected = pick_keypoints(img, window="frame")

    # Validate BEFORE persisting: saving an invalid selection would
    # poison later runs that load the same cache file.
    if len(selected) != 12:
        raise SystemExit(
            f"expected 12 court keypoints, got {len(selected)} "
            "(provide --keypoints JSON in headless environments)"
        )
    if cfg.fixed_court_keypoints_save_path:
        with open(cfg.fixed_court_keypoints_save_path, "w") as f:
            json.dump(selected, f)
    return selected


def build_pipeline(cfg: PipelineConfig, interactive: bool = True):
    """Construct (trackers, runner) from a PipelineConfig."""
    video_info = VideoInfo.from_video_path(cfg.input_video_path)
    selected = _acquire_keypoints(cfg, cfg.input_video_path, interactive)

    fixed_keypoints_detection = Keypoints(
        [Keypoint(id=i, xy=tuple(float(x) for x in v)) for i, v in enumerate(selected)]
    )
    arr = np.array(selected)
    polygon_zone = PolygonZone(
        np.stack([arr[0], arr[1], arr[-1], arr[-2]]),
        frame_resolution_wh=video_info.resolution_wh,
    )

    players_tracker = PlayerTracker(
        model_path=None,
        polygon_zone=polygon_zone,
        load_path=cfg.players.load_path,
        save_path=cfg.players.save_path,
        config=cfg.players,
    )
    player_keypoints_tracker = PlayerKeypointsTracker(
        model_path=None,
        load_path=cfg.player_keypoints.load_path,
        save_path=cfg.player_keypoints.save_path,
        config=cfg.player_keypoints,
    )
    ball_tracker = BallTracker(
        tracking_model_path=None,
        inpainting_model_path=None,
        load_path=cfg.ball.load_path,
        save_path=cfg.ball.save_path,
        config=cfg.ball,
    )
    keypoints_tracker = KeypointsTracker(
        model_path=None,
        fixed_keypoints_detection=fixed_keypoints_detection,
        load_path=cfg.court_keypoints.load_path,
        save_path=cfg.court_keypoints.save_path,
        config=cfg.court_keypoints,
    )
    runner = TrackingRunner(
        trackers=[
            players_tracker,
            player_keypoints_tracker,
            ball_tracker,
            keypoints_tracker,
        ],
        video_path=cfg.input_video_path,
        inference_path=cfg.output_video_path,
        start=0,
        end=cfg.max_frames,
        collect_data=cfg.collect_data,
        render=cfg.render_video,
        render_scale=cfg.render_scale,
    )
    return runner


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="padel-analytics-tpu",
        description="TPU-native padel video analytics pipeline",
    )
    parser.add_argument("--config", help="reference-style flat config .py module")
    parser.add_argument("--input-video", help="input video path")
    parser.add_argument("--output-video", help="annotated output video path")
    parser.add_argument("--keypoints", help="fixed court keypoints JSON (12 [x,y])")
    parser.add_argument("--data-csv", help="analytics CSV output path")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--no-collect", action="store_true")
    parser.add_argument(
        "--no-render", action="store_true",
        help="analytics-only: skip the overlay render + video encode "
        "(data.csv still written; ~14 ms/frame of host time saved)",
    )
    parser.add_argument(
        "--render-scale", type=float, default=None,
        help="encode the annotated output at this fraction of the "
        "source resolution (overlays drawn + analytics collected at "
        "full res; 1.0 = reference-parity full-res output)",
    )
    parser.add_argument("--variant", help="YOLOv8 variant override (n/s/m/l/x)")
    parser.add_argument(
        "--pallas", action="store_true",
        help="use the Pallas fused conv kernels for all models "
        "(ops/pallas_conv; TPU fast path)",
    )
    args = parser.parse_args(argv)

    t1 = timeit.default_timer()
    cfg = _load_config(args)
    if args.pallas:
        cfg.players.use_pallas = True
        cfg.player_keypoints.use_pallas = True
        cfg.court_keypoints.use_pallas = True
        cfg.ball.use_pallas = True
    runner = build_pipeline(cfg)
    runner.run()

    if cfg.collect_data and runner.data_analytics is not None:
        data = runner.data_analytics.into_dataframe(runner.video_info.fps)
        data.to_csv(cfg.collect_data_path)
        print(f"cli: analytics written to {cfg.collect_data_path}")

    t2 = timeit.default_timer()
    print("Duration (min): ", (t2 - t1) / 60)
    return 0


if __name__ == "__main__":
    sys.exit(main())
