"""Host-side video IO.

The TPU framework decodes the video ONCE per run (vs the reference's five
decode passes, /root/reference/trackers/runner.py:215-220,107-112) and feeds
contiguous uint8 RGB chunks to the device pipeline.

Decode backends, in preference order: OpenCV (cv2) then imageio. Both are
host-side; TPU never touches codec work.
"""

from __future__ import annotations

import sys
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


# One encoder child per process, reused across writers: python startup in
# this image is ~4-5s (the jax sitecustomize preimport), so a fresh child
# per draw pass would eat the win. Serial use is guarded by a lock.
_ENCODER_PROC = None
_ENCODER_LOCK = None


def _shared_encoder_proc():
    import subprocess
    import threading

    global _ENCODER_PROC, _ENCODER_LOCK
    if _ENCODER_LOCK is None:
        _ENCODER_LOCK = threading.Lock()
    if _ENCODER_PROC is None or _ENCODER_PROC.poll() is not None:
        worker = Path(__file__).with_name("encoder_worker.py")
        # Invoke by PATH, not -m: the package __init__ would import jax
        # in the child for nothing.
        _ENCODER_PROC = subprocess.Popen(
            [sys.executable, str(worker)],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
        )
    return _ENCODER_PROC


def shutdown_shared_encoder() -> None:
    """Terminate the shared encoder child (tests / process teardown)."""
    global _ENCODER_PROC
    proc = _ENCODER_PROC
    _ENCODER_PROC = None
    if proc is not None and proc.poll() is None:
        try:
            proc.stdin.write(b"Q")
            proc.stdin.flush()
            proc.stdin.close()
            proc.wait(timeout=10)
        except Exception:
            proc.kill()


class SubprocessVideoWriter:
    """VideoWriter twin that encodes in a child PROCESS fed by a pipe.

    The draw loop's dominant cost is cv2's mp4v encode (12.1 of 14.4
    ms/frame at 1080p — BENCH.md); in-process threading cannot hide it on
    a 1-core host because the upload serializer holds the GIL and the
    core. A child process lets the OS timeshare the encode into whatever
    idle the wire waits leave. write() costs one pipe memcpy; a feeder
    thread with a bounded queue (depth 4) absorbs encode jitter without
    unbounded memory; release() blocks on the child's ack, so any encode
    backlog is paid INSIDE the caller's timing window (the bench A/B
    cannot undercount the tail flush). `bench.py --encoder subprocess`
    A/Bs this against the inline writer.

    Measured on the tunneled 1-core host this A/B is a NEGATIVE (r5:
    15.85 vs inline 24.23 fps e2e): the tunnel's upload serializer is
    itself CPU-bound, so the "idle wire wait" the child was meant to
    fill is busy CPU and the child slows inference instead (BENCH.md
    round-5). Use on multi-core hosts, where the overlap is real."""

    QUEUE_DEPTH = 4

    def __init__(self, path: str | Path, fps: float,
                 resolution_wh: tuple[int, int]):
        import queue
        import struct
        import threading

        self._proc = _shared_encoder_proc()
        _ENCODER_LOCK.acquire()  # serialize writers over the shared child
        self._released = False
        w, h = resolution_wh
        pb = str(path).encode("utf-8")
        msg = (b"O" + struct.pack("<H", len(pb)) + pb
               + struct.pack("<dII", float(fps), w, h))
        self._proc.stdin.write(msg)
        self._proc.stdin.flush()
        self._q: "queue.Queue" = queue.Queue(maxsize=self.QUEUE_DEPTH)
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._feed, daemon=True)
        self._thread.start()

    def _feed(self) -> None:
        try:
            while True:
                frame = self._q.get()
                if frame is None:
                    return
                self._proc.stdin.write(b"F")
                self._proc.stdin.write(frame.tobytes())
            # no flush per frame: the pipe flushes itself; 'C' flushes.
        except BaseException as e:  # noqa: BLE001
            self._exc = e
            # drain so the producer never deadlocks on a full queue
            while self._q.get() is not None:
                pass

    def write(self, frame_rgb: np.ndarray) -> None:
        if self._exc is not None:
            raise RuntimeError("encoder child failed") from self._exc
        self._q.put(np.ascontiguousarray(frame_rgb))

    def release(self) -> None:
        if self._released:
            return
        self._released = True
        try:
            self._q.put(None)
            self._thread.join()
            if self._exc is not None:
                raise RuntimeError("encoder child failed") from self._exc
            self._proc.stdin.write(b"C")
            self._proc.stdin.flush()
            ack = self._proc.stdout.read(1)
            if ack != b"K":
                raise RuntimeError(
                    f"encoder child died (ack {ack!r}, rc {self._proc.poll()})"
                )
        finally:
            _ENCODER_LOCK.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()
        return False


def make_video_writer(path: str | Path, fps: float,
                      resolution_wh: tuple[int, int],
                      encoder: str = "inline"):
    """Writer factory: 'inline' = in-process cv2 (reference-equal),
    'subprocess' = pipe-fed child encoder (overlaps encode with host
    work; same mp4v output)."""
    if encoder == "subprocess":
        return SubprocessVideoWriter(path, fps, resolution_wh)
    if encoder != "inline":
        raise ValueError(f"unknown encoder {encoder!r}")
    return VideoWriter(path, fps, resolution_wh)
