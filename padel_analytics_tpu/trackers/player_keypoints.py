"""Player pose tracker: YOLOv8-pose with 13 named keypoints.

Behavior parity with /root/reference/trackers/players_keypoints_tracker/
players_keypoints_tracker.py:207-325: PIL squash-resize (NOT letterbox)
to train_image_size in {640, 1280} (:260-266), conf 0.25 / iou 0.7
(:222-223), keypoints rescaled back by per-axis ratios (:276-278,309-312),
13 keypoints named per KEYPOINTS_NAMES order (:65-79).

TPU-native data path: squash resize runs as the PIL-parity matmul kernel
on device, pose decode + NMS are fused into the jitted step, keypoints
come back as one fixed-size (batch, max_det, 13, 3) tensor.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Optional, Type

import numpy as np

import jax.numpy as jnp

from ..config import PlayerKeypointsTrackerConfig
from ..models.yolov8 import YOLOv8
from ..ops.nms import SaturationCounter, batched_nms, candidate_count
from ..ops.resize import resize_plan
from . import _engine
from .base import NoPredictFrames, Tracker
from .objects import (
    PlayerKeypoint,
    PlayerKeypoints,
    PlayersKeypoints,
    TrackedObject,
)
from .players import _load_yolo_pt


class PlayerKeypointsTracker(Tracker):
    """Tracker of players' pose keypoints."""

    CONF = 0.25
    IOU = 0.7
    # Pre-NMS candidate cap (see PlayersTracker.nms_top_k); config knob
    # PlayerKeypointsTrackerConfig.nms_top_k.
    nms_top_k = 64

    def __init__(
        self,
        model_path: Optional[str],
        train_image_size: int = 1280,
        batch_size: int = 8,
        load_path: Optional[str | Path] = None,
        save_path: Optional[str | Path] = None,
        model_variant: str = "m",
        max_detections: int = 8,
        compute_dtype=jnp.bfloat16,
        config: Optional[PlayerKeypointsTrackerConfig] = None,
    ):
        super().__init__(load_path=load_path, save_path=save_path)
        if config is not None:
            model_path = config.model_path or model_path
            train_image_size = config.train_image_size
            batch_size = config.batch_size
            model_variant = config.model_variant
            max_detections = config.max_detections
            self.CONF = config.conf
            self.IOU = config.iou
            self.nms_top_k = config.nms_top_k
            self.use_pallas = config.use_pallas

        # The reference asserts 640/1280 (players_keypoints_tracker.py:240);
        # config-level validation enforces that for the public surface, but
        # the tracker itself accepts any size (tests use tiny inputs).
        self.train_image_size = train_image_size
        self.batch_size = batch_size
        self.max_detections = max_detections

        model = YOLOv8(
            variant=model_variant, num_classes=1, num_keypoints=13,
            dtype=compute_dtype,
            use_pallas=getattr(self, "use_pallas", False),
        )
        example = jnp.zeros((1, train_image_size, train_image_size, 3), jnp.float32)
        variables = _engine.load_variables(
            model, example, model_path, convert_fn=_load_yolo_pt
        )
        self.engine = _engine.Engine(model, variables)
        self.nms_saturation = SaturationCounter(str(self), self.nms_top_k)

    def video_info_post_init(self, video_info) -> "PlayerKeypointsTracker":
        self.video_info = video_info
        return self

    def object(self) -> Type[TrackedObject]:
        return PlayersKeypoints

    def draw_kwargs(self) -> dict:
        return {}

    def __str__(self) -> str:
        return "players_keypoints_tracker"

    def restart(self) -> None:
        self.results.restart()

    # ------------------------------------------------------------------

    def _build_step(self, src_hw: tuple[int, int], batch: int):
        size = self.train_image_size
        plan = resize_plan(src_hw, (size, size), "pil_bicubic")
        model = self.engine.model
        conf, iou, max_det = self.CONF, self.IOU, self.max_detections
        ratio_x = src_hw[1] / size
        ratio_y = src_hw[0] / size

        def step(variables, frames_u8):
            x = plan.apply(frames_u8) / 255.0
            out = model.apply(variables, x)
            n_cand = candidate_count(out["scores"][..., 0], conf)
            _, scores, _, index, valid = batched_nms(
                out["boxes"],
                out["scores"][..., 0],
                conf_thres=conf,
                iou_thres=iou,
                max_det=max_det,
                top_k=self.nms_top_k,
            )
            # Gather keypoints of kept detections: (B, max_det, 13, 3).
            kpts = jnp.take_along_axis(
                out["kpts"], jnp.clip(index, 0)[..., None, None], axis=1
            )
            # Rescale from squashed model space back to source pixels
            # (players_keypoints_tracker.py:276-278,309-312).
            kpts = kpts.at[..., 0].mul(ratio_x)
            kpts = kpts.at[..., 1].mul(ratio_y)
            return kpts, scores, valid, n_cand

        return step

    def detect_sample(self, sample: np.ndarray):
        src_hw = sample.shape[1:3]
        padded, n_real = _engine.pad_batch(sample, self.batch_size)
        step = self.engine.jit_step(
            ("pose", src_hw, padded.shape[0]),
            lambda: self._build_step(src_hw, padded.shape[0]),
        )
        kpts, scores, valid, n_cand = step(
            self.engine.variables, jnp.asarray(padded)
        )
        self.nms_saturation.update(np.asarray(n_cand)[:n_real])
        return (
            np.asarray(kpts)[:n_real],
            np.asarray(scores)[:n_real],
            np.asarray(valid)[:n_real],
        )

    def predict_sample(self, sample: np.ndarray, **kwargs) -> list[PlayersKeypoints]:
        kpts, _, valid = self.detect_sample(np.asarray(sample))
        predictions = []
        for f in range(kpts.shape[0]):
            players = []
            for d in range(kpts.shape[1]):
                if not valid[f, d]:
                    continue
                players.append(
                    PlayerKeypoints(
                        [
                            PlayerKeypoint(
                                id=i,
                                name=PlayerKeypoints.KEYPOINTS_NAMES[i],
                                xy=(float(kpts[f, d, i, 0]), float(kpts[f, d, i, 1])),
                            )
                            for i in range(13)
                        ]
                    )
                )
            predictions.append(PlayersKeypoints(players))
        return predictions

    def predict_frames(self, frame_generator: Iterable[np.ndarray], **kwargs):
        raise NoPredictFrames()
