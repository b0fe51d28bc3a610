"""Court-keypoints tracker: fixed / yolo-pose / resnet-regression modes.

Behavior parity with /root/reference/trackers/keypoints_tracker/
keypoints_tracker.py:122-312:
- 'fixed' (the shipped default path, config.py:18 + keypoints_tracker.py:
  204-209,266-271): the user's 12 clicked keypoints replicated per frame;
- 'yolo' (:199-262): a 12-keypoint pose model on 640x640 squash-resized
  frames, keypoint ids remapped through the hard-coded points_mapper
  (:214-227) and rescaled by per-axis ratios;
- 'resnet' (:264-312): ResNet50 -> 24-dim sigmoid regression of normalized
  (x, y) on 224x224 ImageNet-normalized frames.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Optional, Type

import numpy as np

import jax
import jax.numpy as jnp

from ..config import CourtKeypointsTrackerConfig
from ..models.convert import convert_resnet50_state_dict, load_torch_checkpoint
from ..models.resnet import ResNet50Regressor, imagenet_normalize
from ..models.yolov8 import YOLOv8
from ..ops.nms import batched_nms
from ..ops.resize import resize_plan
from . import _engine
from .base import NoPredictFrames, NoPredictSample, Tracker
from .objects import Keypoint, Keypoints, TrackedObject
from .players import _load_yolo_pt

# Hard-coded yolo-keypoint-index -> court-keypoint-id remap
# (keypoints_tracker.py:214-227).
POINTS_MAPPER = {
    0: 10, 1: 11, 2: 1, 3: 0, 4: 7, 5: 9,
    6: 8, 7: 5, 8: 6, 9: 2, 10: 4, 11: 3,
}


class KeypointsTracker(Tracker):
    """Tracker of the court's 12 keypoints."""

    NUMBER_KEYPOINTS = 12
    TRAIN_IMAGE_SIZE = 640
    CONF = 0.5
    IOU = 0.7
    RESNET_SIZE = 224

    def __init__(
        self,
        model_path: Optional[str] = None,
        batch_size: int = 8,
        model_type: str = "yolo",
        fixed_keypoints_detection: Optional[Keypoints] = None,
        load_path: Optional[str | Path] = None,
        save_path: Optional[str | Path] = None,
        model_variant: str = "m",
        compute_dtype=jnp.bfloat16,
        config: Optional[CourtKeypointsTrackerConfig] = None,
    ):
        super().__init__(load_path=load_path, save_path=save_path)
        if config is not None:
            model_path = config.model_path or model_path
            batch_size = config.batch_size
            model_type = config.model_type
            model_variant = config.model_variant
            self.TRAIN_IMAGE_SIZE = config.train_image_size
            self.RESNET_SIZE = config.resnet_image_size
            self.CONF = config.conf
            self.IOU = config.iou
            self.use_pallas = config.use_pallas

        if model_type not in ("resnet", "yolo"):
            raise ValueError("Unknown model type")
        self.model_type = model_type
        self.batch_size = batch_size
        self.fixed_keypoints_detection = fixed_keypoints_detection

        # Skip model construction entirely in fixed mode (free path).
        self.engine = None
        if fixed_keypoints_detection is None:
            if model_type == "yolo":
                model = YOLOv8(
                    variant=model_variant,
                    num_classes=1,
                    num_keypoints=self.NUMBER_KEYPOINTS,
                    dtype=compute_dtype,
                    use_pallas=getattr(self, "use_pallas", False),
                )
                example = jnp.zeros(
                    (1, self.TRAIN_IMAGE_SIZE, self.TRAIN_IMAGE_SIZE, 3), jnp.float32
                )
                variables = _engine.load_variables(
                    model, example, model_path, convert_fn=_load_yolo_pt
                )
            else:
                model = ResNet50Regressor(
                    num_outputs=self.NUMBER_KEYPOINTS * 2, dtype=compute_dtype
                )
                example = jnp.zeros(
                    (1, self.RESNET_SIZE, self.RESNET_SIZE, 3), jnp.float32
                )
                variables = _engine.load_variables(
                    model, example, model_path, convert_fn=_load_resnet_pt
                )
            self.engine = _engine.Engine(model, variables)

    def video_info_post_init(self, video_info) -> "KeypointsTracker":
        self.video_info = video_info
        return self

    def object(self) -> Type[TrackedObject]:
        return Keypoints

    def draw_kwargs(self) -> dict:
        return {}

    def __str__(self) -> str:
        return "keypoints_tracker"

    def restart(self) -> None:
        self.results.restart()

    # -- yolo mode (predict_sample) ----------------------------------------

    def _build_yolo_step(self, src_hw: tuple[int, int], batch: int):
        size = self.TRAIN_IMAGE_SIZE
        plan = resize_plan(src_hw, (size, size), "pil_bicubic")
        model = self.engine.model
        conf, iou = self.CONF, self.IOU
        ratio_x = src_hw[1] / size
        ratio_y = src_hw[0] / size

        def step(variables, frames_u8):
            x = plan.apply(frames_u8) / 255.0
            out = model.apply(variables, x)
            _, scores, _, index, valid = batched_nms(
                out["boxes"],
                out["scores"][..., 0],
                conf_thres=conf,
                iou_thres=iou,
                max_det=1,  # one court per frame (reference keeps det 0)
                top_k=64,
            )
            kpts = jnp.take_along_axis(
                out["kpts"], jnp.clip(index, 0)[..., None, None], axis=1
            )[:, 0]  # (B, 12, 3)
            kx = kpts[..., 0] * ratio_x
            ky = kpts[..., 1] * ratio_y
            return jnp.stack([kx, ky], axis=-1), valid[:, 0]

        return step

    def predict_sample(self, sample: np.ndarray, **kwargs) -> list[Keypoints]:
        if self.fixed_keypoints_detection is not None:
            return [self.fixed_keypoints_detection for _ in range(len(sample))]
        if self.model_type != "yolo":
            raise NoPredictSample()

        sample = np.asarray(sample)
        src_hw = sample.shape[1:3]
        padded, n_real = _engine.pad_batch(sample, self.batch_size)
        step = self.engine.jit_step(
            ("court_yolo", src_hw, padded.shape[0]),
            lambda: self._build_yolo_step(src_hw, padded.shape[0]),
        )
        kpts, valid = step(self.engine.variables, jnp.asarray(padded))
        kpts = np.asarray(kpts)[:n_real]
        valid = np.asarray(valid)[:n_real]
        predictions = []
        for f in range(kpts.shape[0]):
            if not valid[f]:
                # No court detection cleared conf: emit an empty Keypoints
                # (falsy), so the projection pass skips/clears H for this
                # frame (projected_court.py:644-647 semantics).
                predictions.append(Keypoints([]))
                continue
            predictions.append(
                Keypoints(
                    [
                        Keypoint(
                            id=POINTS_MAPPER[i],
                            xy=(float(kpts[f, i, 0]), float(kpts[f, i, 1])),
                        )
                        for i in range(self.NUMBER_KEYPOINTS)
                    ]
                )
            )
        return predictions

    # -- fixed / resnet modes (predict_frames) -------------------------------

    def _build_resnet_step(self, src_hw: tuple[int, int], batch: int):
        plan = resize_plan(src_hw, (self.RESNET_SIZE, self.RESNET_SIZE), "pil_bilinear")
        model = self.engine.model
        w_frame, h_frame = src_hw[1], src_hw[0]
        nk = self.NUMBER_KEYPOINTS

        def step(variables, frames_u8):
            # torchvision transforms: Resize (bilinear+antialias) ->
            # ToTensor (/255) -> Normalize (keypoints_tracker/iterable.py:16-25).
            x = plan.apply(frames_u8) / 255.0
            x = imagenet_normalize(x)
            out = jax.nn.sigmoid(model.apply(variables, x))  # (B, 24)
            kpts = out.reshape(-1, nk, 2) * jnp.asarray(
                [w_frame, h_frame], out.dtype
            )
            return kpts

        return step

    def predict_frames(
        self, frame_generator: Iterable[np.ndarray], **kwargs
    ) -> list[Keypoints]:
        if self.fixed_keypoints_detection is not None:
            return [self.fixed_keypoints_detection for _ in frame_generator]
        if self.model_type == "yolo":
            raise NoPredictFrames()

        predictions: list[Keypoints] = []
        buffer: list[np.ndarray] = []

        def flush():
            if not buffer:
                return
            sample = np.stack(buffer)
            buffer.clear()
            src_hw = sample.shape[1:3]
            padded, n_real = _engine.pad_batch(sample, self.batch_size)
            step = self.engine.jit_step(
                ("court_resnet", src_hw, padded.shape[0]),
                lambda: self._build_resnet_step(src_hw, padded.shape[0]),
            )
            kpts = np.asarray(step(self.engine.variables, jnp.asarray(padded)))
            for f in range(n_real):
                predictions.append(
                    Keypoints(
                        [
                            Keypoint(
                                id=i, xy=(float(kpts[f, i, 0]), float(kpts[f, i, 1]))
                            )
                            for i in range(self.NUMBER_KEYPOINTS)
                        ]
                    )
                )

        for frame in frame_generator:
            buffer.append(frame)
            if len(buffer) == self.batch_size:
                flush()
        flush()
        return predictions


def _load_resnet_pt(path: str) -> dict:
    state_dict = load_torch_checkpoint(path)
    if hasattr(state_dict, "state_dict"):
        state_dict = state_dict.state_dict()
    return convert_resnet50_state_dict(state_dict)
