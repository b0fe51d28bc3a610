"""TrackingRunner: whole-pipeline orchestration with a single video decode.

Surface parity with /root/reference/trackers/runner.py:20-236
(TrackingRunner(trackers, video_path, inference_path, start, end,
collect_data), .run(), .draw_and_collect_data(), per-tracker JSON cache
skip at :187-191).

TPU-native redesign: the reference decodes the video FIVE times (one full
pass per tracker + one draw pass, runner.py:215-220,107-112) and moves one
model at a time onto the GPU. Here the video is decoded ONCE into a frame
store (RAM up to a cap, re-decode beyond), every model stays resident in
HBM, and each tracker consumes the shared store. Per-stage wall-clock is
recorded in `self.stage_times` (the reference only prints, :222-232).
"""

from __future__ import annotations

import timeit
from copy import deepcopy
from pathlib import Path
from typing import Optional

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ..analytics import DataAnalytics, ProjectedCourt
from ..utils.video import (
    VideoInfo,
    VideoWriter,
    frame_generator,
    make_video_writer,
)
from .base import Tracker
from .objects import Ball, Keypoints, Players


class FrameStore:
    """Decode-once frame cache. Frames are RGB uint8. Falls back to
    re-decoding when the clip exceeds `max_cached_frames` (memory cap)."""

    def __init__(
        self,
        video_path: str | Path,
        start: int = 0,
        stride: int = 1,
        end: Optional[int] = None,
        max_cached_frames: int = 4000,
    ):
        self.video_path = video_path
        self.start = start
        self.stride = stride
        self.end = end
        self.max_cached_frames = max_cached_frames
        self._frames: Optional[list[np.ndarray]] = None

    def _decode(self):
        return frame_generator(
            self.video_path, start=self.start, stride=self.stride, end=self.end
        )

    def __iter__(self):
        if self._frames is not None:
            yield from self._frames
            return
        frames = []
        cache = True
        for frame in self._decode():
            if cache:
                frames.append(frame)
                if len(frames) > self.max_cached_frames:
                    cache = False
                    frames = None
            yield frame
        if cache and frames is not None:
            self._frames = frames


class _StreamingDrawer:
    """Draw/collect pass running concurrently with fused inference.

    The fused drain loop appends finalized per-frame objects to the
    trackers' result lists in frame order and calls notify(n_ready); this
    worker draws frame i once i < ready. It decodes the video with its own
    uncached FrameStore, so the two decodes never race; cv2/numpy work
    releases the GIL and hides under the (bottleneck) host->device
    uploads — the draw pass costs ~zero wall clock (BENCH.md).
    """

    def __init__(self, runner: "TrackingRunner"):
        import threading

        self.runner = runner
        self._cond = threading.Condition()
        self._ready = 0
        self._done = False
        self.exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def notify(self, n_ready: int) -> None:
        with self._cond:
            if n_ready > self._ready:
                self._ready = n_ready
                self._cond.notify_all()

    def finish(self) -> None:
        """Signal end of results, join, re-raise any worker exception."""
        with self._cond:
            self._done = True
            self._cond.notify_all()
        self._thread.join()
        if self.exc is not None:
            raise self.exc

    def abort(self) -> None:
        """finish() that never raises (for error paths)."""
        try:
            self.finish()
        except BaseException:
            pass

    def _run(self) -> None:
        r = self.runner
        try:
            print(
                f"runner: Writing results into {str(r.inference_path)} "
                "(streaming)"
            )
            t0 = timeit.default_timer()
            writer = make_video_writer(
                r.inference_path,
                fps=float(r.video_info.fps),
                resolution_wh=r.render_resolution_wh,
                encoder=r.encoder,
            )
            try:
                store = FrameStore(
                    r.video_path, r.start, r.stride, r.end, max_cached_frames=0
                )
                for frame_index, frame in enumerate(store):
                    if frame_index >= r.total_frames:
                        break
                    with self._cond:
                        while self._ready <= frame_index and not self._done:
                            self._cond.wait()
                        if self._ready <= frame_index:
                            break  # done and no result for this frame
                    r._draw_one(writer, frame_index, frame)
                r._finish_draw(writer, t0)
            except BaseException:
                # _finish_draw releases on success; release here so a
                # mid-draw failure still finalizes the container (and
                # frees the encoder) before the error surfaces at
                # finish().
                writer.release()
                raise
        except BaseException as e:  # surfaced by finish()
            self.exc = e


class TrackingRunner:
    """Runs a sequence of trackers over a video, then renders + collects."""

    def __init__(
        self,
        trackers: list[Tracker],
        video_path: str | Path,
        inference_path: str | Path,
        start: int = 0,
        end: Optional[int] = None,
        collect_data: bool = False,
        max_cached_frames: int = 4000,
        fused: bool = False,
        fused_chunk: int = 16,
        fused_staged: int = 0,  # >0: scan this many chunks per dispatch
        # Wire format: 'rgb' for exact cv2 parity, 'i420' (1.5 B/px),
        # or 'derived' (downscaled I420 wire buffer, every model input
        # derived on device — the documented fast path, PARITY.md).
        fused_ingest: str = "i420",
        fused_wire_long_side: int = 960,  # 'derived' wire long side
        # 'auto': host ByteTrack single-device (exact supervision
        # parity), on-device ID scan under a mesh; 'host'/'device' force.
        fused_association: str = "auto",
        # 1 = reference stride-1 rolling ensemble (parity); seq_len =
        # nonoverlap fast mode (each window evaluated once, ~8x less
        # TrackNet work; no reference equivalent — FusedPipeline docs).
        fused_ball_stride: int = 1,
        # Draw concurrently with inference. A win when host cores are
        # plentiful; on single-core hosts the drawer contends with the
        # upload path's own CPU cost (serialization/compression) and SLOWS
        # the run ~30% (BENCH.md), hence off by default.
        fused_stream_draw: bool = False,
        # jax.sharding.Mesh with a 'data' axis: the fused pipeline shards
        # the frame axis across it (FusedPipeline.run_mesh) — the v5e-8
        # deployment path. None = single device.
        mesh=None,
        # False = analytics-only: skip the overlay render + video encode
        # entirely (no decode pass, no cv2 drawing, no writer) and collect
        # the identical DataAnalytics from stored predictions. The draw
        # pass costs ~14 ms/frame of host time on a 1-core host (BENCH.md)
        # that data-pipeline consumers don't need. No reference equivalent
        # (the reference always renders, runner.py:91-172).
        render: bool = True,
        # Encode the annotated output at this fraction of the source
        # resolution (overlays are drawn and analytics collected at FULL
        # resolution; only the final per-frame downscale + encode shrink).
        # cv2's mp4v encode is ~12 ms/frame at 1080p on a 1-core host
        # (BENCH.md) and scales with pixel count, so 0.5 cuts the draw
        # pass's dominant term ~4x. 1.0 = reference parity (full-res
        # output, runner.py:96-101). data.csv is identical at any scale.
        render_scale: float = 1.0,
        # 'inline' = in-process cv2 encode (reference-equal);
        # 'subprocess' = pipe-fed child process doing cvtColor + mp4v
        # (utils.video.SubprocessVideoWriter): the encode overlaps the
        # parent's host work at the OS level. Same container/codec either
        # way; bench.py --encoder A/Bs them.
        encoder: str = "inline",
    ):
        self.fused = fused
        self.fused_chunk = fused_chunk
        self.fused_staged = fused_staged
        self.fused_ingest = fused_ingest
        self.fused_wire_long_side = fused_wire_long_side
        self.fused_association = fused_association
        self.fused_ball_stride = fused_ball_stride
        # Streaming draw renders; with render=False there is nothing for
        # the drawer to do, so it must stay off or it would encode anyway.
        self.fused_stream_draw = fused_stream_draw and render
        self.render = render
        if not 0.0 < render_scale <= 1.0:
            raise ValueError(
                f"render_scale must be in (0, 1], got {render_scale}"
            )
        self.render_scale = float(render_scale)
        self.encoder = encoder
        self.mesh = mesh
        self.video_path = video_path
        self.inference_path = inference_path
        self.start = start
        self.stride = 1
        self.end = end
        self.video_info = VideoInfo.from_video_path(video_path)
        if self.end is None:
            self.total_frames = self.video_info.total_frames
        else:
            self.total_frames = self.end - self.start

        self.frame_store = FrameStore(
            video_path, start, self.stride, end, max_cached_frames
        )

        self.trackers: dict[str, Tracker] = {}
        self.is_fixed_keypoints = False
        for tracker in trackers:
            self.trackers[str(tracker)] = tracker.video_info_post_init(
                self.video_info
            )
            if tracker.object() == Keypoints:
                self.is_fixed_keypoints = (
                    getattr(tracker, "fixed_keypoints_detection", None) is not None
                )

        self.projected_court = ProjectedCourt(self.video_info)
        self.data_analytics = DataAnalytics() if collect_data else None
        self.stage_times: dict[str, float] = {}

    def restart(self) -> None:
        for tracker in self.trackers.values():
            tracker.restart()
        if self.data_analytics:
            self.data_analytics.restart()

    def run(self) -> None:
        """Per-tracker inference (cache-skipped like runner.py:187-191),
        then the draw/collect pass."""
        print(f"runner: Running {self.total_frames} frames")
        if self.fused and self._try_fused_run():
            if not self._fused_drew:
                self.draw_and_collect_data()
            return
        for tracker in self.trackers.values():
            if len(tracker) != 0:
                print(f"{tracker}: {len(tracker)} predictions stored")
                continue
            t0 = timeit.default_timer()
            tracker.predict_and_update(
                iter(self.frame_store), total_frames=self.total_frames
            )
            t1 = timeit.default_timer()
            self.stage_times[str(tracker)] = t1 - t0
            print(f"{tracker}: {t1 - t0:.2f}s inference time.")
            tracker.save_predictions()
        self.draw_and_collect_data()

    def _try_fused_run(self) -> bool:
        """Run players+pose+ball(+fixed court) in the single-upload fused
        pipeline. Falls back (returns False) when the tracker set doesn't
        match or any of them already has cached results."""
        from .fused import FusedPipeline

        by_name = self.trackers
        needed = ("players_tracker", "players_keypoints_tracker", "ball_tracker")
        if not all(name in by_name for name in needed):
            return False
        if any(len(by_name[name]) != 0 for name in needed):
            return False
        # Court joins the fused schedule in all modes (fixed is free; the
        # yolo/resnet models run as a fourth sub-step over the shared
        # upload). A court tracker with cached predictions keeps them.
        court = by_name.get("keypoints_tracker")
        if court is not None and len(court) != 0:
            court = None
        # Clips shorter than the TrackNet window fall back to the
        # sequential path, which zero-fills like the reference
        # (ball_tracker.py:677-696); the fused chunk loop needs >= seq_len.
        if self.total_frames < by_name["ball_tracker"].tracknet_seq_len:
            return False

        t0 = timeit.default_timer()
        # The cached pipeline is keyed to the court argument: a later run
        # whose court state differs (cache loaded vs empty) must rebuild,
        # or it would compute with a stale court mode / miss 'keypoints'.
        pipeline = getattr(self, "_fused_pipeline", None)
        if pipeline is None or pipeline.court is not court:
            pipeline = self._fused_pipeline = FusedPipeline(
                by_name["players_tracker"],
                by_name["players_keypoints_tracker"],
                by_name["ball_tracker"],
                court,
                chunk=self.fused_chunk,
                ingest=self.fused_ingest,
                association=self.fused_association,
                wire_long_side=self.fused_wire_long_side,
                ball_stride=self.fused_ball_stride,
            )

        # Streaming draw: render/collect concurrently with inference (host
        # work hides under the bottleneck uploads). Needs the court results
        # available from frame 0 and no pending InpaintNet pass.
        ball_tracker = by_name["ball_tracker"]
        drawer = None
        stream_cb = None
        self._fused_drew = False
        court_was_empty = court is not None and len(court) == 0
        if (
            self.fused_stream_draw
            and ball_tracker.inpaintnet is None
            and self.mesh is None  # run_mesh finalizes ball only at the end
        ):
            drawer = _StreamingDrawer(self)
            players_res = by_name["players_tracker"].results
            pose_res = by_name["players_keypoints_tracker"].results

            def stream_cb(p_new, k_new, b_new, c_new):
                players_res.predictions += p_new
                pose_res.predictions += k_new
                ball_tracker.results.predictions += b_new
                if court_was_empty and c_new is not None:
                    court.results.predictions += c_new
                drawer.notify(len(ball_tracker.results.predictions))

        try:
            if self.mesh is not None:
                out = pipeline.run_mesh(
                    iter(self.frame_store),
                    total_frames=self.total_frames,
                    mesh=self.mesh,
                )
            elif self.fused_staged > 0:
                out = pipeline.run_staged(
                    iter(self.frame_store),
                    total_frames=self.total_frames,
                    superchunk=self.fused_staged,
                    stream=stream_cb,
                )
            else:
                out = pipeline.run(
                    iter(self.frame_store),
                    total_frames=self.total_frames,
                    stream=stream_cb,
                )
        except BaseException:
            if drawer is not None:
                drawer.abort()
            raise
        by_name["players_tracker"].results.load(out["players"])
        by_name["players_keypoints_tracker"].results.load(out["players_keypoints"])
        by_name["ball_tracker"].results.load(out["ball"])
        if court is not None and court_was_empty:
            court.results.load(out["keypoints"])
        if drawer is not None:
            drawer.finish()
            self._fused_drew = True
        self.stage_times["fused_inference"] = timeit.default_timer() - t0
        print(f"runner: fused inference {self.stage_times['fused_inference']:.2f}s")
        for name in needed:
            by_name[name].save_predictions()
        if court is not None:
            # Model-based court results computed by the fourth sub-step
            # persist to its cache too (sequential path saves every
            # tracker).
            court.save_predictions()
        return True

    @property
    def render_resolution_wh(self) -> tuple[int, int]:
        """Output-video resolution: the source resolution scaled by
        render_scale, rounded to even dims (codec-friendly)."""
        w, h = self.video_info.resolution_wh
        if self.render_scale == 1.0:
            return (w, h)
        return (
            max(2, int(round(w * self.render_scale / 2)) * 2),
            max(2, int(round(h * self.render_scale / 2)) * 2),
        )

    def _draw_one(self, writer, frame_index: int, frame: np.ndarray) -> None:
        """Render + collect one frame (the body of the reference's draw
        loop, runner.py:114-162)."""
        # Copy: the store may be serving its RAM cache, and drawing
        # must never mutate the cached frames (re-runs would then
        # re-infer on annotated images).
        frame_rgb = np.ascontiguousarray(frame).copy()
        cv2.putText(
            frame_rgb,
            f"Frame: {frame_index + 1}",
            (20, 50),
            cv2.FONT_HERSHEY_SIMPLEX,
            1,
            (255, 255, 0),
            1,
        )

        players_detection = None
        ball_detection = None
        keypoints_detection = None
        for tracker in self.trackers.values():
            try:
                prediction = tracker.results[frame_index]
            except IndexError:
                print(f"runner: {tracker} missing frame {frame_index}")
                raise
            frame_rgb = prediction.draw(frame_rgb, **tracker.draw_kwargs())
            if tracker.object() == Players:
                players_detection = deepcopy(prediction)
            elif tracker.object() == Ball:
                ball_detection = deepcopy(prediction)
            elif tracker.object() == Keypoints:
                keypoints_detection = deepcopy(prediction)

        output_frame, self.data_analytics = (
            self.projected_court.draw_projections_and_collect_data(
                frame_rgb,
                keypoints_detection=keypoints_detection,
                players_detection=players_detection,
                ball_detection=ball_detection,
                data_analytics=self.data_analytics,
                is_fixed_keypoints=self.is_fixed_keypoints,
            )
        )
        if self.data_analytics is not None:
            self.data_analytics.step(1)
        if self.render_scale != 1.0:
            output_frame = cv2.resize(
                output_frame, self.render_resolution_wh,
                interpolation=cv2.INTER_AREA,
            )
        writer.write(output_frame)

    def _finish_draw(self, writer, t0: float) -> None:
        writer.release()
        if self.data_analytics is not None:
            # Parity with runner.py:166-167: one extra trailing frame entry.
            self.data_analytics.frames = self.data_analytics.frames[:-1]
        self.stage_times["draw_and_collect"] = timeit.default_timer() - t0
        print("runner: Done.")

    def collect_data_only(self) -> None:
        """Analytics collection without rendering: no decode, no cv2, no
        video writer — iterates stored predictions and feeds DataAnalytics
        through the same projection path as the draw loop (identical
        data.csv; tests/test_pipeline.py pins the equality)."""
        print("runner: Collecting data (render=False; no video output)")
        t0 = timeit.default_timer()
        n = self.total_frames
        for name, tracker in self.trackers.items():
            if len(tracker.results) < self.total_frames:
                # The rendered path (_draw_one) hits an IndexError on the
                # same inconsistent-cache condition; fail just as loudly
                # here instead of silently truncating the analytics.
                raise ValueError(
                    f"tracker {name!r} has {len(tracker.results)} results "
                    f"for a {self.total_frames}-frame clip — inconsistent "
                    "prediction cache (delete it or re-run inference)"
                )
            n = min(n, len(tracker.results))
        for frame_index in range(n):
            players_detection = None
            keypoints_detection = None
            for tracker in self.trackers.values():
                prediction = tracker.results[frame_index]
                if tracker.object() == Players:
                    # project_player writes .projection on the Player;
                    # copy so stored predictions stay pristine (same
                    # reason _draw_one deepcopies).
                    players_detection = deepcopy(prediction)
                elif tracker.object() == Keypoints:
                    keypoints_detection = prediction
            self.data_analytics = self.projected_court.collect_data_single_frame(
                keypoints_detection=keypoints_detection,
                players_detection=players_detection,
                data_analytics=self.data_analytics,
                is_fixed_keypoints=self.is_fixed_keypoints,
            )
            if self.data_analytics is not None:
                self.data_analytics.step(1)
        if self.data_analytics is not None:
            # Same trailing-frame trim as _finish_draw (runner.py:166-167).
            self.data_analytics.frames = self.data_analytics.frames[:-1]
        self.stage_times["draw_and_collect"] = timeit.default_timer() - t0
        print("runner: Done.")

    def draw_and_collect_data(self) -> None:
        """Render annotated video + minimap projections; collect analytics
        (parity: runner.py:91-172, including the trailing-frame trim)."""
        if not self.render:
            self.collect_data_only()
            return
        print(f"runner: Writing results into {str(self.inference_path)}")
        t0 = timeit.default_timer()
        writer = make_video_writer(
            self.inference_path,
            fps=float(self.video_info.fps),
            resolution_wh=self.render_resolution_wh,
            encoder=self.encoder,
        )
        try:
            for frame_index, frame in enumerate(self.frame_store):
                self._draw_one(writer, frame_index, frame)
        except BaseException:
            # Finalize the container (and free the shared encoder child's
            # lock) before the error surfaces.
            writer.release()
            raise
        self._finish_draw(writer, t0)
