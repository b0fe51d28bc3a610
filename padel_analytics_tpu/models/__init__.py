from .tracknet import TrackNet, InpaintNet, make_tracknet
from .resnet import ResNet50Regressor
from .yolov8 import YOLOv8, YOLOV8_VARIANTS

__all__ = [
    "TrackNet",
    "InpaintNet",
    "make_tracknet",
    "ResNet50Regressor",
    "YOLOv8",
    "YOLOV8_VARIANTS",
]
