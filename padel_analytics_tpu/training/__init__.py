from .evaluate import detection_map, oks
from .tracknet import (
    TrackNetTrainState,
    gaussian_heatmap_labels,
    make_tracknet_train_step,
    weighted_bce_loss,
)
from .yolo import (
    YoloTrainState,
    init_yolo_train_state,
    make_yolo_train_step,
    task_aligned_assign,
    yolo_detection_loss,
    yolo_pose_loss,
)

__all__ = [
    "TrackNetTrainState",
    "YoloTrainState",
    "detection_map",
    "gaussian_heatmap_labels",
    "init_yolo_train_state",
    "make_tracknet_train_step",
    "make_yolo_train_step",
    "oks",
    "task_aligned_assign",
    "weighted_bce_loss",
    "yolo_detection_loss",
    "yolo_pose_loss",
]
