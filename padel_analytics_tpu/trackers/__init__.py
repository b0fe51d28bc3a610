from .objects import (
    Ball,
    Keypoint,
    Keypoints,
    Player,
    PlayerKeypoint,
    PlayerKeypoints,
    Players,
    PlayersKeypoints,
    TrackedObject,
)
from .base import (
    NoPredictFrames,
    NoPredictSample,
    Tracker,
    TrackingResults,
)

__all__ = [
    "Ball",
    "Keypoint",
    "Keypoints",
    "Player",
    "PlayerKeypoint",
    "PlayerKeypoints",
    "Players",
    "PlayersKeypoints",
    "TrackedObject",
    "NoPredictFrames",
    "NoPredictSample",
    "Tracker",
    "TrackingResults",
]

# Concrete trackers are appended to the public surface as they land;
# import lazily so partially-built trees stay importable.
_LAZY = {
    "PlayerTracker": ".players",
    "PlayerKeypointsTracker": ".player_keypoints",
    "KeypointsTracker": ".court_keypoints",
    "BallTracker": ".ball",
    "TrackingRunner": ".runner",
    "VelocityVector": ".velocity_in_time",
    "get_velocity_vector_per_frame_interval": ".velocity_in_time",
    "get_velocity_vectors_angle_per_frame_interval": ".velocity_in_time",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module = importlib.import_module(_LAZY[name], __name__)
        return getattr(module, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
