"""Players tracker: YOLOv8 detection -> NMS -> polygon gate -> ByteTrack.

Behavior parity with /root/reference/trackers/players_tracker/
players_tracker.py:266-383: conf 0.5, iou 0.7, imgsz 640, person class
only (:279-281,351-359), on-court polygon filtering (:364-366), ByteTrack
ID association built at video_info_post_init with the video fps (:309-312).

TPU-native data path: one jitted step does letterbox (matmul resize) ->
/255 -> YOLOv8 forward -> batched NMS -> coordinate unletterboxing ->
polygon gate, returning fixed-size (batch, max_det) tensors; only the
inherently sequential ByteTrack association runs host-side on the gathered
results.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Optional, Type

import numpy as np

import jax.numpy as jnp

from ..config import PlayersTrackerConfig
from ..models.convert import convert_yolov8_state_dict, load_torch_checkpoint
from ..models.yolov8 import YOLOv8
from ..ops.association import ByteTrack
from ..ops.nms import SaturationCounter, batched_nms, candidate_count
from ..ops.polygon import PolygonZone
from ..ops.resize import letterbox_plan
from . import _engine
from .base import NoPredictFrames, Tracker
from .objects import Player, Players, TrackedObject


class PlayerTracker(Tracker):
    """Tracker of player objects (YOLOv8 person detection)."""

    CONF = 0.5
    IOU = 0.7
    IMGSZ = 640
    # Pre-NMS candidate cap: a silent-truncation divergence from
    # ultralytics' max_nms=30000 on dense scenes; lossless for padel
    # (<=4 players). Config knob: PlayersTrackerConfig.nms_top_k.
    nms_top_k = 128

    def __init__(
        self,
        model_path: Optional[str],
        polygon_zone: PolygonZone,
        batch_size: int = 8,
        annotator: str = "rectangle_bounding_box",
        show_confidence: bool = True,
        load_path: Optional[str | Path] = None,
        save_path: Optional[str | Path] = None,
        model_variant: str = "m",
        max_detections: int = 32,
        compute_dtype=jnp.bfloat16,
        num_classes: Optional[int] = None,
        config: Optional[PlayersTrackerConfig] = None,
    ):
        super().__init__(load_path=load_path, save_path=save_path)
        if config is not None:
            model_path = config.model_path or model_path
            batch_size = config.batch_size
            annotator = config.annotator
            show_confidence = config.show_confidence
            model_variant = config.model_variant
            max_detections = config.max_detections
            num_classes = config.num_classes or num_classes
            self.CONF = config.conf
            self.IOU = config.iou
            self.IMGSZ = config.imgsz
            self.nms_top_k = config.nms_top_k
            self.use_pallas = config.use_pallas

        self.polygon_zone = polygon_zone
        self.batch_size = batch_size
        self.annotator = annotator
        self.show_confidence = show_confidence
        self.max_detections = max_detections

        # The reference's players checkpoint is stock COCO yolov8m.pt (80
        # classes, filtered to person with classes=[0] at
        # players_tracker.py:351-359); a custom checkpoint may have any
        # class count. Infer nc from the checkpoint's cls-projection
        # out-channels so both load; class 0 is selected before NMS either
        # way (_build_step below).
        converted = None
        import os as _os

        if (
            model_path
            and str(model_path).endswith((".pt", ".pth"))
            and _os.path.exists(str(model_path))
        ):
            converted = _load_yolo_pt(str(model_path))
            ckpt_nc = int(
                np.asarray(
                    converted["params"]["cls_0"]["proj"]["kernel"]
                ).shape[-1]
            )
            if num_classes is not None and num_classes != ckpt_nc:
                raise ValueError(
                    f"num_classes={num_classes} but checkpoint has {ckpt_nc}"
                )
            num_classes = ckpt_nc
            model_path = None  # already converted
        if num_classes is None:
            num_classes = 1
        self.num_classes = num_classes

        model = YOLOv8(
            variant=model_variant, num_classes=num_classes,
            dtype=compute_dtype,
            use_pallas=getattr(self, "use_pallas", False),
        )
        example = jnp.zeros((1, self.IMGSZ, self.IMGSZ, 3), jnp.float32)
        variables = _engine.load_variables(model, example, model_path)
        if converted is not None:
            variables = _engine._merge_variables(variables, converted)
        self.engine = _engine.Engine(model, variables)
        self.nms_saturation = SaturationCounter(str(self), self.nms_top_k)
        self.byte_track: Optional[ByteTrack] = None
        self.video_info = None

    def video_info_post_init(self, video_info) -> "PlayerTracker":
        self.video_info = video_info
        self.byte_track = ByteTrack(frame_rate=video_info.fps)
        return self

    def object(self) -> Type[TrackedObject]:
        return Players

    def draw_kwargs(self) -> dict:
        return {
            "video_info": self.video_info,
            "annotator": self.annotator,
            "show_confidence": self.show_confidence,
        }

    def __str__(self) -> str:
        return "players_tracker"

    def restart(self) -> None:
        self.results.restart()
        if self.byte_track is not None:
            self.byte_track.reset()

    # ------------------------------------------------------------------

    def _build_step(self, src_hw: tuple[int, int], batch: int):
        lb = letterbox_plan(src_hw, self.IMGSZ)
        model, zone = self.engine.model, self.polygon_zone
        conf, iou, max_det = self.CONF, self.IOU, self.max_detections
        w, h = src_hw[1], src_hw[0]
        polygon = jnp.asarray(np.asarray(zone.polygon)) if zone is not None else None

        def step(variables, frames_u8):
            x = lb.apply(frames_u8) / 255.0
            out = model.apply(variables, x)
            person = _person_scores(out["scores"])
            n_cand = candidate_count(person, conf)
            boxes, scores, _, _, valid = batched_nms(
                out["boxes"],
                person,
                conf_thres=conf,
                iou_thres=iou,
                max_det=max_det,
                top_k=self.nms_top_k,
            )
            boxes = lb.boxes_to_source(boxes)
            # ultralytics scale_boxes clips to the source frame.
            boxes = jnp.stack(
                [
                    jnp.clip(boxes[..., 0], 0, w),
                    jnp.clip(boxes[..., 1], 0, h),
                    jnp.clip(boxes[..., 2], 0, w),
                    jnp.clip(boxes[..., 3], 0, h),
                ],
                axis=-1,
            )
            if polygon is not None:
                from ..ops.polygon import points_in_polygon

                anchors = jnp.stack(
                    [(boxes[..., 0] + boxes[..., 2]) / 2.0, boxes[..., 3]], axis=-1
                )
                valid = valid & points_in_polygon(anchors, polygon)
            return boxes, scores, valid, n_cand

        return step

    def detect_sample(self, sample: np.ndarray):
        """Device detection for a stacked (B, H, W, 3) RGB uint8 chunk.
        Returns host numpy (boxes (B, D, 4), scores (B, D), valid (B, D))."""
        src_hw = sample.shape[1:3]
        padded, n_real = _engine.pad_batch(sample, self.batch_size)
        step = self.engine.jit_step(
            ("det", src_hw, padded.shape[0]),
            lambda: self._build_step(src_hw, padded.shape[0]),
        )
        boxes, scores, valid, n_cand = step(
            self.engine.variables, jnp.asarray(padded)
        )
        self.nms_saturation.update(np.asarray(n_cand)[:n_real])
        return (
            np.asarray(boxes)[:n_real],
            np.asarray(scores)[:n_real],
            np.asarray(valid)[:n_real],
        )

    def predict_sample(self, sample: np.ndarray, **kwargs) -> list[Players]:
        boxes, scores, valid = self.detect_sample(np.asarray(sample))
        predictions = []
        for f in range(boxes.shape[0]):
            keep = valid[f]
            ids, kept = self.byte_track.update_with_detections(
                boxes[f][keep], scores[f][keep]
            )
            frame_boxes = boxes[f][keep][kept]
            frame_scores = scores[f][keep][kept]
            predictions.append(
                Players(
                    [
                        Player(
                            xyxy=frame_boxes[i],
                            id=int(ids[i]),
                            class_id=0,
                            confidence=float(frame_scores[i]),
                        )
                        for i in range(len(ids))
                    ]
                )
            )
        return predictions

    def predict_frames(self, frame_generator: Iterable[np.ndarray], **kwargs):
        raise NoPredictFrames()


def _person_scores(cls_scores: jnp.ndarray) -> jnp.ndarray:
    """Per-anchor person score with ultralytics' classes=[0] semantics:
    an anchor is a person candidate only when person is its argmax class
    (ultralytics filters on the best class before NMS, ops.py
    non_max_suppression), so a ball-dominated anchor never enters the
    person NMS even if its person score clears conf. nc=1 is unchanged."""
    s0 = cls_scores[..., 0]
    if cls_scores.shape[-1] == 1:
        return s0
    return jnp.where(jnp.argmax(cls_scores, axis=-1) == 0, s0, 0.0)


def _load_yolo_pt(path: str) -> dict:
    """Convert an ultralytics .pt (players detection weights,
    config.py:22) to flax variables."""
    ckpt = load_torch_checkpoint(path)
    model = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    state_dict = model.state_dict() if hasattr(model, "state_dict") else model
    state_dict = {k: v.float() if hasattr(v, "float") else v for k, v in state_dict.items()}
    return convert_yolov8_state_dict(state_dict)
