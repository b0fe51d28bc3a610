from .evaluate import detection_map, greedy_match, oks
from .inpaintnet import make_inpaintnet_train_step, masked_coordinate_loss
from .resnet_court import (
    CourtTrainState,
    court_regression_loss,
    init_court_train_state,
    make_court_train_step,
    normalize_court_targets,
)
from .tracknet import (
    TrackNetTrainState,
    gaussian_heatmap_labels,
    init_train_state,
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
    "CourtTrainState",
    "TrackNetTrainState",
    "YoloTrainState",
    "court_regression_loss",
    "init_court_train_state",
    "make_court_train_step",
    "normalize_court_targets",
    "detection_map",
    "gaussian_heatmap_labels",
    "greedy_match",
    "init_train_state",
    "init_yolo_train_state",
    "make_inpaintnet_train_step",
    "make_tracknet_train_step",
    "make_yolo_train_step",
    "masked_coordinate_loss",
    "oks",
    "task_aligned_assign",
    "weighted_bce_loss",
    "yolo_detection_loss",
    "yolo_pose_loss",
]
