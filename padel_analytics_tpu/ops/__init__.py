from .resize import (
    ResizePlan,
    cv2_bilinear_matrix,
    letterbox_plan,
    pil_resample_matrix,
    resize_plan,
)
from .homography import find_homography, project_points
from .polygon import PolygonZone
from .nms import batched_nms
from .heatmap import decode_heatmaps
from .ensemble import get_ensemble_weight, overlap_ensemble_coefficients
from .median import median_background
from .association import ByteTrack
from .association_scan import associate_clip
from .pallas_cc import decode_heatmaps_pallas

__all__ = [
    "ResizePlan",
    "cv2_bilinear_matrix",
    "letterbox_plan",
    "pil_resample_matrix",
    "resize_plan",
    "find_homography",
    "project_points",
    "PolygonZone",
    "batched_nms",
    "decode_heatmaps",
    "get_ensemble_weight",
    "overlap_ensemble_coefficients",
    "median_background",
    "ByteTrack",
    "associate_clip",
    "decode_heatmaps_pallas",
]
