from .conversions import (
    convert_meters_to_pixel_distance,
    convert_pixel_distance_to_meters,
)
from .video import VideoInfo, read_video, save_video, frame_generator

__all__ = [
    "convert_meters_to_pixel_distance",
    "convert_pixel_distance_to_meters",
    "VideoInfo",
    "read_video",
    "save_video",
    "frame_generator",
]
