"""Host-side video IO.

The TPU framework decodes the video ONCE per run (vs the reference's five
decode passes, /root/reference/trackers/runner.py:215-220,107-112) and feeds
contiguous uint8 RGB chunks to the device pipeline.

Decode backends, in preference order: OpenCV (cv2) then imageio. Both are
host-side; TPU never touches codec work.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover - cv2 is present in the dev image
    _HAS_CV2 = False


@dataclass(frozen=True)
class VideoInfo:
    """Source video metadata (replaces supervision.VideoInfo,
    cf. /root/reference/trackers/runner.py:52)."""

    width: int
    height: int
    fps: float
    total_frames: int

    @property
    def resolution_wh(self) -> tuple[int, int]:
        return (self.width, self.height)

    @classmethod
    def from_video_path(cls, video_path: str | Path) -> "VideoInfo":
        if not _HAS_CV2:
            raise RuntimeError("cv2 unavailable: cannot probe video")
        cap = cv2.VideoCapture(str(video_path))
        if not cap.isOpened():
            raise FileNotFoundError(f"cannot open video: {video_path}")
        info = cls(
            width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            fps=float(cap.get(cv2.CAP_PROP_FPS)),
            total_frames=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        )
        cap.release()
        return info


def frame_generator(
    video_path: str | Path,
    start: int = 0,
    stride: int = 1,
    end: Optional[int] = None,
) -> Iterator[np.ndarray]:
    """Yield RGB uint8 frames (replaces sv.get_video_frames_generator,
    /root/reference/trackers/runner.py:107-112).

    Note: the reference generator yields BGR and each consumer converts to
    RGB itself; here we standardize on RGB at the decode boundary.
    """
    if not _HAS_CV2:
        raise RuntimeError("cv2 unavailable: cannot decode video")
    cap = cv2.VideoCapture(str(video_path))
    if start:
        cap.set(cv2.CAP_PROP_POS_FRAMES, start)
    index = start
    try:
        while True:
            ok, frame_bgr = cap.read()
            if not ok:
                break
            if end is not None and index >= end:
                break
            if (index - start) % stride == 0:
                yield cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
            index += 1
    finally:
        cap.release()


def read_video(
    path: str | Path,
    max_frames: Optional[int] = None,
) -> tuple[list[np.ndarray], float, int, int]:
    """Eager full-video RGB read.

    Parity with /root/reference/utils/video.py:11-47 (returns
    (frames, fps, w, h))."""
    info = VideoInfo.from_video_path(path)
    frames = []
    for frame in frame_generator(path, end=max_frames):
        frames.append(frame)
        if max_frames is not None and len(frames) >= max_frames:
            break
    return frames, info.fps, info.width, info.height


def save_video(
    frames,
    path: str | Path,
    fps: float,
    h: Optional[int] = None,
    w: Optional[int] = None,
) -> None:
    """Write RGB frames to an mp4v-encoded file.

    Parity with /root/reference/utils/video.py:49-64."""
    if not _HAS_CV2:
        raise RuntimeError("cv2 unavailable: cannot encode video")
    frames = list(frames)
    if not frames:
        raise ValueError("no frames to save")
    if h is None or w is None:
        h, w = frames[0].shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(str(path), fourcc, float(fps), (w, h))
    try:
        for frame in frames:
            out.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    finally:
        out.release()


class VideoWriter:
    """Streaming RGB frame writer (replaces the cv2.VideoWriter usage at
    /root/reference/trackers/runner.py:99-105,162)."""

    def __init__(self, path: str | Path, fps: float, resolution_wh: tuple[int, int]):
        if not _HAS_CV2:
            raise RuntimeError("cv2 unavailable: cannot encode video")
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self._writer = cv2.VideoWriter(str(path), fourcc, float(fps), resolution_wh)

    def write(self, frame_rgb: np.ndarray) -> None:
        self._writer.write(cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2BGR))

    def release(self) -> None:
        self._writer.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()
        return False
