"""Typed, validated pipeline configuration.

Replaces the reference's flat star-imported constants module
(/root/reference/config.py:1-49, consumed via `from config import *` at
main.py:16). Every knob the reference exposes — including the per-tracker
hyperparameters it hard-codes as class constants
(players_tracker.py:279-281, players_keypoints_tracker.py:222-223,
keypoints_tracker.py:136-139, ball_tracker.py:227-233) — is an explicit,
validated dataclass field here.

`PipelineConfig.from_flat()` accepts the reference's config names verbatim
so a reference user can reuse their config.py unchanged.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Mapping, Optional


@dataclass
class DeviceConfig:
    """Mesh/device placement knobs (no reference equivalent: the reference
    is single-GPU with one model resident at a time, runner.py:212,230)."""

    # Mesh axis sizes; data axis shards the frame/window batch over ICI.
    data_parallel: int = -1  # -1 => all available devices
    model_parallel: int = 1
    # Compute dtype for model forward passes.
    compute_dtype: str = "bfloat16"
    # Per-step frame chunk fed to the device pipeline.
    frames_per_chunk: int = 64


@dataclass
class PlayersTrackerConfig:
    """YOLOv8 person detection (reference: players_tracker.py:279-281,
    351-359: conf .5, iou .7, imgsz 640, classes=[0])."""

    model_path: Optional[str] = None
    model_variant: str = "m"  # reference default weight is yolov8m (config.py:22)
    # Pallas fast path for stride-1 3x3 conv blocks (ops/pallas_conv)
    use_pallas: bool = False
    batch_size: int = 8
    conf: float = 0.5
    iou: float = 0.7
    imgsz: int = 640
    max_detections: int = 32  # fixed-size padded detection tensor
    # None = infer from the checkpoint's cls head (stock COCO yolov8m.pt
    # has 80; the person class is selected before NMS regardless).
    num_classes: Optional[int] = None
    # Pre-NMS candidate cap (ultralytics' max_nms is 30000; padel scenes
    # hold <=4 players so 128 is lossless here — raise for dense scenes).
    nms_top_k: int = 128
    annotator: str = "rectangle_bounding_box"
    show_confidence: bool = True
    load_path: Optional[str] = None
    save_path: Optional[str] = None


@dataclass
class PlayerKeypointsTrackerConfig:
    """YOLOv8-pose 13-keypoint player pose (reference:
    players_keypoints_tracker.py:222-228,240: conf .25, iou .7,
    train_image_size in {640, 1280})."""

    model_path: Optional[str] = None
    model_variant: str = "m"
    # Pallas fast path for stride-1 3x3 conv blocks (ops/pallas_conv)
    use_pallas: bool = False
    train_image_size: int = 1280
    batch_size: int = 8
    conf: float = 0.25
    iou: float = 0.7
    max_detections: int = 8
    num_keypoints: int = 13
    # Pre-NMS candidate cap (see PlayersTrackerConfig.nms_top_k).
    nms_top_k: int = 64
    load_path: Optional[str] = None
    save_path: Optional[str] = None

    def __post_init__(self):
        if self.train_image_size not in (640, 1280):
            raise ValueError("train_image_size must be 640 or 1280")


@dataclass
class CourtKeypointsTrackerConfig:
    """Court 12-keypoint detection (reference: keypoints_tracker.py:136-139,
    modes at :199-312): 'fixed' user keypoints, 'yolo' pose model with the
    hard-coded index remap, or 'resnet' 24-dim sigmoid regression."""

    model_path: Optional[str] = None
    model_type: str = "yolo"  # "resnet" | "yolo"
    model_variant: str = "m"  # YOLOv8 variant for the 'yolo' mode
    # Pallas fast path for stride-1 3x3 conv blocks (ops/pallas_conv)
    use_pallas: bool = False
    batch_size: int = 8
    number_keypoints: int = 12
    train_image_size: int = 640
    resnet_image_size: int = 224
    conf: float = 0.5
    iou: float = 0.7
    load_path: Optional[str] = None
    save_path: Optional[str] = None

    def __post_init__(self):
        if self.model_type not in ("resnet", "yolo"):
            raise ValueError("model_type must be 'resnet' or 'yolo'")


@dataclass
class BallTrackerConfig:
    """TrackNet + InpaintNet ball tracking (reference: ball_tracker.py:227-233,
    253-274: 512x288, seq_len 8, stride 1, median over <=400 frames)."""

    tracking_model_path: Optional[str] = None
    inpainting_model_path: Optional[str] = None
    batch_size: int = 8
    median_max_sample_num: int = 400
    seq_len: int = 8
    bg_mode: str = "concat"
    height: int = 288
    width: int = 512
    sigma: float = 2.5
    eval_mode: str = "weight"  # temporal ensemble weighting (ball_tracker.py:227)
    # Pallas fast path for stride-1 3x3 conv blocks (ops/pallas_conv)
    use_pallas: bool = False
    # Exact low-resolution phase-conv rewrite of the up blocks' first
    # convs (models/tracknet._SubpixelUpConvBN): same checkpoints, same
    # outputs up to summation order, fewer MACs. Inference only.
    subpixel_up: bool = False
    # 1 = reference stride-1 rolling ensemble (parity,
    # ball_tracker.py:70-97); seq_len = nonoverlap fast mode (each
    # window evaluated once, ~seq_len x less TrackNet work; no temporal
    # ensemble — an opt-in speed/quality trade with no reference
    # equivalent).
    window_stride: int = 1
    load_path: Optional[str] = None
    save_path: Optional[str] = None


@dataclass
class PipelineConfig:
    """End-to-end pipeline configuration (reference: config.py:1-49)."""

    input_video_path: str = "./examples/videos/rally.mp4"
    output_video_path: str = "results.mp4"
    collect_data: bool = True
    collect_data_path: str = "data.csv"
    max_frames: Optional[int] = None
    # False = analytics-only: skip the overlay render + video encode and
    # produce only data.csv (extension — the reference always renders).
    render_video: bool = True
    # Encode the annotated output at this fraction of the source
    # resolution (overlays drawn + analytics collected at full res;
    # 1.0 = reference-parity full-res output). The encode is the draw
    # pass's dominant host cost and scales with pixel count (BENCH.md).
    render_scale: float = 1.0

    fixed_court_keypoints_load_path: Optional[str] = None
    fixed_court_keypoints_save_path: Optional[str] = None

    players: PlayersTrackerConfig = field(default_factory=PlayersTrackerConfig)
    player_keypoints: PlayerKeypointsTrackerConfig = field(
        default_factory=PlayerKeypointsTrackerConfig
    )
    court_keypoints: CourtKeypointsTrackerConfig = field(
        default_factory=CourtKeypointsTrackerConfig
    )
    ball: BallTrackerConfig = field(default_factory=BallTrackerConfig)
    device: DeviceConfig = field(default_factory=DeviceConfig)

    @classmethod
    def from_flat(cls, flat: Mapping[str, Any]) -> "PipelineConfig":
        """Build from the reference's flat config names
        (/root/reference/config.py:1-49). Unknown keys are ignored so a
        user's existing config module (`vars(config)`) works as-is."""

        def get(key, default=None):
            return flat.get(key, default)

        cfg = cls(
            input_video_path=get("INPUT_VIDEO_PATH", cls.input_video_path),
            output_video_path=get("OUTPUT_VIDEO_PATH", cls.output_video_path),
            collect_data=get("COLLECT_DATA", True),
            collect_data_path=get("COLLECT_DATA_PATH", "data.csv"),
            max_frames=get("MAX_FRAMES"),
            render_video=get("RENDER_VIDEO", True),
            render_scale=get("RENDER_SCALE", 1.0),
            fixed_court_keypoints_load_path=get("FIXED_COURT_KEYPOINTS_LOAD_PATH"),
            fixed_court_keypoints_save_path=get("FIXED_COURT_KEYPOINTS_SAVE_PATH"),
        )
        cfg.players = PlayersTrackerConfig(
            model_path=get("PLAYERS_TRACKER_MODEL"),
            batch_size=get("PLAYERS_TRACKER_BATCH_SIZE", 8),
            annotator=get("PLAYERS_TRACKER_ANNOTATOR", "rectangle_bounding_box"),
            load_path=get("PLAYERS_TRACKER_LOAD_PATH"),
            save_path=get("PLAYERS_TRACKER_SAVE_PATH"),
        )
        cfg.player_keypoints = PlayerKeypointsTrackerConfig(
            model_path=get("PLAYERS_KEYPOINTS_TRACKER_MODEL"),
            train_image_size=get("PLAYERS_KEYPOINTS_TRACKER_TRAIN_IMAGE_SIZE", 1280),
            batch_size=get("PLAYERS_KEYPOINTS_TRACKER_BATCH_SIZE", 8),
            load_path=get("PLAYERS_KEYPOINTS_TRACKER_LOAD_PATH"),
            save_path=get("PLAYERS_KEYPOINTS_TRACKER_SAVE_PATH"),
        )
        cfg.court_keypoints = CourtKeypointsTrackerConfig(
            model_path=get("KEYPOINTS_TRACKER_MODEL"),
            batch_size=get("KEYPOINTS_TRACKER_BATCH_SIZE", 8),
            model_type=get("KEYPOINTS_TRACKER_MODEL_TYPE", "yolo"),
            load_path=get("KEYPOINTS_TRACKER_LOAD_PATH"),
            save_path=get("KEYPOINTS_TRACKER_SAVE_PATH"),
        )
        cfg.ball = BallTrackerConfig(
            tracking_model_path=get("BALL_TRACKER_MODEL"),
            inpainting_model_path=get("BALL_TRACKER_INPAINT_MODEL"),
            batch_size=get("BALL_TRACKER_BATCH_SIZE", 8),
            median_max_sample_num=get("BALL_TRACKER_MEDIAN_MAX_SAMPLE_NUM", 400),
            load_path=get("BALL_TRACKER_LOAD_PATH"),
            save_path=get("BALL_TRACKER_SAVE_PATH"),
        )
        return cfg

    @classmethod
    def from_module(cls, module) -> "PipelineConfig":
        """Build from an imported reference-style config module."""
        return cls.from_flat({k: v for k, v in vars(module).items() if k.isupper()})

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)
