from .projected_court import ProjectedCourt, ProjectedCourtKeypoints, Rectangle
from .data_analytics import DataAnalytics, DataPoint, PlayerPosition

__all__ = [
    "ProjectedCourt",
    "ProjectedCourtKeypoints",
    "Rectangle",
    "DataAnalytics",
    "DataPoint",
    "PlayerPosition",
]
