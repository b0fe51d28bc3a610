"""Fused multi-tracker device pipeline: one upload per chunk, three packed
sub-programs sharing it.

The sequential runner uploads the full clip to the device once PER TRACKER
(players, pose, ball all consume raw frames). On a tunneled or
bandwidth-bound link that host->device traffic dominates. This pipeline
sends each uint8 frame chunk ONCE and runs the per-frame models as three
separately-jitted sub-steps over that buffer (a single fused mega-program
was tried: it saves nothing — the models share no compute — and XLA's
optimization time explodes ~450s vs ~60s split):

  frames_u8 (B, H, W, 3)   [one device_put]
    ├── det:  letterbox -> YOLOv8 -> NMS -> unletterbox -> polygon gate
    ├── pose: squash-resize -> YOLOv8-pose -> NMS -> kpt gather/rescale
    └── ball: resize(288x512) + carried 7-frame context -> TrackNet
              windows -> rolling overlap ensemble -> heatmap decode

Each sub-step returns ONE packed buffer (every drained array is a device
round-trip); the ensemble coefficient table lives on device and is sliced
by a scalar chunk index; up to two chunks stay in flight so host drains
overlap device work.

Ball alignment: after chunk k (frames [kB, kB+B)), the windows completed
are those ending inside the chunk — w in [kB-(L-1), kB+B-L] — and the
frames emitted are f = kB-(L-1)+j; the clip is zero-extended by L-1 frames
so the tail flushes through the same uniform loop (windows touching
padding carry coefficient 0). Bit-identical to the per-tracker paths
(tests/test_fused.py).

The reference has no equivalent — it runs four sequential full-video
passes with one model resident at a time (runner.py:185-234).
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.ensemble import overlap_ensemble_coefficients
from ..ops.heatmap import decode_heatmaps
from ..ops.nms import batched_nms, candidate_count
from ..ops.polygon import points_in_polygon
from ..ops.resize import letterbox_plan, resize_plan
from ._ballwindow import (
    assemble_windows,
    frame_channels,
    make_frame_preprocess,
    median_model_resolution,
)
from .ball import BallTracker
from .court_keypoints import KeypointsTracker
from .objects import (
    Ball,
    Keypoint,
    Keypoints,
    Player,
    PlayerKeypoint,
    PlayerKeypoints,
    Players,
    PlayersKeypoints,
)
from .player_keypoints import PlayerKeypointsTracker
from .players import PlayerTracker


class _FrameWindow:
    """Bounded streaming view over the decoded frame iterator: only the
    frames between the last-dropped and the furthest-filled index are
    resident, so arbitrarily long clips run in O(window) host memory."""

    def __init__(self, initial, it):
        import collections

        self._win = collections.deque(initial)
        self._base = 0
        self._it = it
        self._exhausted = False

    def fill_to(self, hi: int) -> int:
        """Ensure frames [base, hi) are resident; returns frames available."""
        while not self._exhausted and self._base + len(self._win) < hi:
            nxt = next(self._it, None)
            if nxt is None:
                self._exhausted = True
                break
            self._win.append(nxt)
        return self._base + len(self._win)

    def get(self, i: int):
        return self._win[i - self._base]

    def drop_below(self, i: int) -> None:
        while self._base < i and self._win:
            self._win.popleft()
            self._base += 1

    def first(self):
        return self._win[0]

    def __len__(self):
        return len(self._win)


class _ResultBuilder:
    """Incremental host-side result accumulation at drain time.

    The drain critical path (between device dispatches) does ONLY numpy
    work: host ByteTrack (when association='host' — inherently
    sequential, and running it here overlaps it with in-flight device
    compute) plus array appends. Python result-object construction is
    deferred to the emit points — `maybe_emit` for streaming consumers,
    `finish` otherwise — so no per-frame object assembly sits between
    dispatches (round-2 verdict item 4). With association='device' the
    drain stores device-computed IDs verbatim and ByteTrack never runs.
    """

    def __init__(self, pipeline: "FusedPipeline", n: int, src_hw, stream=None):
        self.pipeline = pipeline
        self.n = n
        ball = pipeline.ball
        self.w_scaler = src_hw[1] / ball.WIDTH
        self.h_scaler = src_hw[0] / ball.HEIGHT
        # raw chunk storage (numpy), materialized lazily into objects
        self._det_chunks: list = []   # (boxes, scores, keep_mask, ids)
        self._pose_chunks: list = []  # (kpts, valid)
        self._court_chunks: list = []  # packed (F, 2K+1)
        self._det_ready = 0
        self._pose_ready = 0
        self._court_ready = 0
        self.players_objs: list[Players] = []
        self.pose_objs: list[PlayersKeypoints] = []
        self.court_objs: list[Keypoints] = []
        self.ball_x: list[int] = []
        self.ball_y: list[int] = []
        self.ball_v: list[int] = []
        self.can_stream = ball.inpaintnet is None
        self.stream = stream if (stream and self.can_stream) else None
        self._emitted = 0

    def add_det(self, boxes, scores, valid, ids=None) -> None:
        """(F, D, 4/1/1) host arrays for F consecutive frames; `ids`
        (F, D) carries device-scan track IDs (association='device') —
        when absent, host ByteTrack assigns them here, in frame order."""
        if ids is None:
            byte_track = self.pipeline.players.byte_track
            keep_mask = np.zeros(valid.shape, bool)
            ids = np.zeros(valid.shape, np.int64)
            for f in range(boxes.shape[0]):
                keep = valid[f]
                ids_f, kept = byte_track.update_with_detections(
                    boxes[f][keep], scores[f][keep]
                )
                sel = np.flatnonzero(keep)[kept]
                keep_mask[f, sel] = True
                ids[f, sel] = ids_f
        else:
            keep_mask = valid & (np.asarray(ids) > 0)
        self._det_chunks.append((boxes, scores, keep_mask, ids))
        self._det_ready += boxes.shape[0]

    def add_pose(self, kpts_np, valid) -> None:
        self._pose_chunks.append((kpts_np, valid))
        self._pose_ready += kpts_np.shape[0]

    def add_ball(self, x: int, y: int, v: int) -> None:
        self.ball_x.append(x)
        self.ball_y.append(y)
        self.ball_v.append(v)

    def add_court(self, packed) -> None:
        """(F, 2K+1) packed court buffers: 2K flat (x, y) + validity."""
        self._court_chunks.append(np.asarray(packed))
        self._court_ready += packed.shape[0]

    # -- deferred object materialization (emit points only) --

    def _materialize(self) -> None:
        for (boxes, scores, keep_mask, ids) in self._det_chunks:
            for f in range(boxes.shape[0]):
                sel = np.flatnonzero(keep_mask[f])
                self.players_objs.append(
                    Players(
                        [
                            Player(
                                xyxy=boxes[f, i], id=int(ids[f, i]),
                                class_id=0, confidence=float(scores[f, i]),
                            )
                            for i in sel
                        ]
                    )
                )
        self._det_chunks.clear()
        for (kpts_np, valid) in self._pose_chunks:
            for f in range(kpts_np.shape[0]):
                players_k = [
                    PlayerKeypoints(
                        [
                            PlayerKeypoint(
                                id=i,
                                name=PlayerKeypoints.KEYPOINTS_NAMES[i],
                                xy=(float(kpts_np[f, d, i, 0]),
                                    float(kpts_np[f, d, i, 1])),
                            )
                            for i in range(kpts_np.shape[2])
                        ]
                    )
                    for d in range(kpts_np.shape[1])
                    if valid[f, d]
                ]
                self.pose_objs.append(PlayersKeypoints(players_k))
        self._pose_chunks.clear()
        if self._court_chunks:
            from .court_keypoints import POINTS_MAPPER

            yolo = self.pipeline.court_mode == "yolo"
            for packed in self._court_chunks:
                nk = (packed.shape[-1] - 1) // 2
                for f in range(packed.shape[0]):
                    if yolo and packed[f, -1] <= 0.5:
                        # No court cleared conf: empty (falsy) Keypoints
                        # so the projection pass clears H
                        # (projected_court.py:644-647).
                        self.court_objs.append(Keypoints([]))
                        continue
                    self.court_objs.append(
                        Keypoints(
                            [
                                Keypoint(
                                    id=POINTS_MAPPER[i] if yolo else i,
                                    xy=(float(packed[f, 2 * i]),
                                        float(packed[f, 2 * i + 1])),
                                )
                                for i in range(nk)
                            ]
                        )
                    )
            self._court_chunks.clear()

    def _ball_obj(self, i: int) -> Ball:
        # predict.py:204-212 parity: int truncation at both scale steps.
        x = int(int(self.ball_x[i]) * self.w_scaler)
        y = int(int(self.ball_y[i]) * self.h_scaler)
        return Ball(frame=i, xy=(float(x), float(y)),
                    visibility=int(self.ball_v[i]))

    def maybe_emit(self) -> None:
        """Push newly finalized frames to the stream callback."""
        if self.stream is None:
            return
        n_ready = min(self._det_ready, self._pose_ready, len(self.ball_x))
        mode = self.pipeline.court_mode
        if mode in ("yolo", "resnet"):
            n_ready = min(n_ready, self._court_ready)
        if n_ready <= self._emitted:
            return
        self._materialize()
        lo, hi = self._emitted, n_ready
        court = self.pipeline.court
        if mode in ("yolo", "resnet"):
            court_slice = self.court_objs[lo:hi]
        elif court is not None:
            court_slice = [court.fixed_keypoints_detection] * (hi - lo)
        else:
            court_slice = None
        self.stream(
            self.players_objs[lo:hi],
            self.pose_objs[lo:hi],
            [self._ball_obj(i) for i in range(lo, hi)],
            court_slice,
        )
        self._emitted = n_ready

    def finish(self) -> dict[str, list]:
        self._materialize()
        ball = self.pipeline.ball
        assert len(self.ball_x) == self.n, (len(self.ball_x), self.n)
        pred = {
            "frame": list(range(self.n)),
            "x": [int(int(x) * self.w_scaler) for x in self.ball_x],
            "y": [int(int(y) * self.h_scaler) for y in self.ball_y],
            "visibility": [int(v) for v in self.ball_v],
        }
        if ball.inpaintnet is not None:
            pred = ball._inpaint_pass(pred, self.n)
        ball_objs = [
            Ball(frame=i, xy=(float(pred["x"][i]), float(pred["y"][i])),
                 visibility=int(pred["visibility"][i]))
            for i in range(self.n)
        ]
        results = {
            "players": self.players_objs,
            "players_keypoints": self.pose_objs,
            "ball": ball_objs,
        }
        if self.pipeline.court_mode in ("yolo", "resnet"):
            assert len(self.court_objs) == self.n
            results["keypoints"] = self.court_objs
        elif self.pipeline.court is not None:
            results["keypoints"] = [
                self.pipeline.court.fixed_keypoints_detection
                for _ in range(self.n)
            ]
        return results


class FusedPipeline:
    """Runs players + pose + ball (+ fixed court) trackers in one device
    program per frame chunk."""

    def __init__(
        self,
        players: PlayerTracker,
        pose: PlayerKeypointsTracker,
        ball: BallTracker,
        court: Optional[KeypointsTracker] = None,
        chunk: int = 16,
        ingest: str = "rgb",
        association: str = "auto",
        wire_long_side: int = 960,
        ball_stride: int = 1,
    ):
        if ingest not in ("rgb", "i420", "derived"):
            raise ValueError(f"unknown ingest {ingest!r}")
        if association not in ("host", "device", "auto"):
            raise ValueError(f"unknown association {association!r}")
        seq_len_ = ball.tracknet_seq_len
        if ball_stride not in (1, seq_len_):
            raise ValueError(
                f"ball_stride must be 1 (reference stride-1 ensemble) or "
                f"seq_len={seq_len_} (nonoverlap fast mode), got {ball_stride}"
            )
        if ball_stride != 1 and chunk % seq_len_ != 0:
            raise ValueError(
                f"nonoverlap ball_stride needs chunk % seq_len == 0 "
                f"(chunk={chunk}, seq_len={seq_len_})"
            )
        self.players = players
        self.pose = pose
        self.ball = ball
        self.court = court
        # Court participates in the fused schedule in all three reference
        # modes: 'fixed' costs nothing; 'yolo'/'resnet' run as a fourth
        # sub-step over the shared frame upload, so moving-camera clips
        # (per-frame homography, projected_court.py:633-647) get the fast
        # path too.
        if court is None:
            self.court_mode = None
        elif court.fixed_keypoints_detection is not None:
            self.court_mode = "fixed"
        else:
            self.court_mode = court.model_type
        self.chunk = chunk
        # 'i420': frames cross the host->device link as packed YUV 4:2:0
        # planes (1.5 bytes/px vs RGB's 3) and are reconstructed on device
        # bit-exactly to cv2's I420->RGB (ops/color.py). The link is the
        # pipeline bottleneck (BENCH.md), so this ~halves ingest wall
        # clock; the only output deviation vs 'rgb' is the chroma
        # subsampling round trip (PARITY.md).
        # 'derived': the host downscales each frame to a wire resolution
        # (aspect-preserving, long side <= wire_long_side, even dims) and
        # ships THAT as I420; every model input is derived on device from
        # the wire buffer and coordinates scale back to source pixels.
        # With the reference's largest production input at 640
        # (det/court; pose offers the reference-supported 640 mode,
        # players_keypoints_tracker.py:240) a 960-wide wire buffer sits
        # above every model resample, and 1080p ingest bytes drop 4x vs
        # full-res I420 — the host->device link is the e2e bottleneck
        # (BENCH.md). Output deltas vs 'rgb' are the chroma round trip +
        # the resample chain (PARITY.md; bounded by
        # tests/test_fused_derived.py).
        self.ingest = ingest
        self._ingest_pref = ingest
        self.wire_long_side = int(wire_long_side)
        # 'device': track IDs come from the on-device association scan
        # (ops/association_scan.associate_chunk) carried chunk to chunk —
        # the host ByteTrack (supervision-parity Kalman+Hungarian) never
        # runs and the drain stays pure-numpy. Documented divergence vs
        # host ByteTrack: greedy matching + constant-velocity prediction
        # (see association_scan module docstring); <1% ID divergence on
        # crowded synthetics (tests/test_association_device.py).
        # 'auto': host on the single-device paths (exact supervision
        # parity is free there — ByteTrack overlaps in-flight device
        # work), device in run_mesh (where the sequential host loop is
        # the one per-frame host cost the mesh can't hide).
        self.association = association
        # ball_stride=seq_len: each frame window is evaluated ONCE
        # (stride = seq_len, no overlap, no temporal ensemble) — ~seq_len
        # x less TrackNet work per clip. The reference only ships the
        # stride-1 'average'/'weight' ensemble (ball_tracker.py:70-97),
        # so this is an opt-in fast mode, not a parity mode: per-frame
        # heatmaps lose the seq_len-vote ensemble, and the final partial
        # window sees zero-padded context. Under run_mesh the nonoverlap
        # sharded pass needs NO halo exchange at all (windows never cross
        # shard edges — parallel/sharded_inference.py).
        self.ball_stride = ball_stride
        self._step_cache = {}
        # Host-side wall-clock split of the last run_staged() call
        # (setup/prep_wait/upload/dispatch/assoc/drain seconds).
        self.last_staged_split: dict[str, float] | None = None
        # Source variables the cached run_mesh ball replication was built
        # from (weight-reload detection).
        self._mesh_ball_vars_src = None

    @property
    def _ball_off(self) -> int:
        """Frames of clip zero-extension / ball-emit lag: seq_len-1 under
        the stride-1 rolling ensemble, 0 in nonoverlap mode (chunk k's
        ball rows are its own frames)."""
        return 0 if self.ball_stride != 1 else self.ball.tracknet_seq_len - 1

    def _assoc_device(self, mesh: bool) -> bool:
        """Whether this path assigns track IDs with the on-device scan."""
        if self.association == "auto":
            return mesh
        return self.association == "device"

    def _wire(self, src_hw: tuple[int, int]):
        """((wire_h, wire_w), sx, sy): the on-the-wire frame resolution
        and the wire->source coordinate scale. Identity except in
        'derived' ingest, where the wire buffer is the aspect-preserving
        downscale to long side <= wire_long_side, rounded to even dims
        (I420 chroma is 2x2-subsampled)."""
        if self.ingest != "derived":
            return src_hw, 1.0, 1.0
        h, w = src_hw
        scale = min(1.0, self.wire_long_side / max(h, w))
        wh = max(2, int(round(h * scale / 2)) * 2)
        ww = max(2, int(round(w * scale / 2)) * 2)
        return (wh, ww), w / ww, h / wh

    def _ingest_decode(self, src_hw: tuple[int, int]):
        """Jittable raw-chunk -> (B, H', W', 3) float32 RGB decode, where
        (H', W') is the WIRE resolution (= source except in 'derived')."""
        if self.ingest in ("i420", "derived"):
            from ..ops.color import i420_to_rgb

            h = self._wire(src_hw)[0][0]
            return lambda buf: i420_to_rgb(buf, h)
        return lambda frames: frames.astype(jnp.float32)

    def _check_ingest(self, src_hw: tuple[int, int]) -> None:
        """Pick the run's wire format from the configured preference:
        I420 needs even dimensions. Recomputed per run (not a one-way
        latch) so one odd-dimension clip doesn't downgrade every later
        run of a cached pipeline to 2x the ingest bytes. 'derived' wire
        dims are rounded to even by _wire, so no fallback is needed."""
        self.ingest = self._ingest_pref
        if self.ingest == "i420" and (src_hw[0] % 2 or src_hw[1] % 2):
            print(
                f"fused: {src_hw} has odd dimensions; falling back to rgb "
                "ingest"
            )
            self.ingest = "rgb"

    def wire_bytes_per_frame(self, src_hw: tuple[int, int]) -> int:
        """Bytes one frame costs on the host->device link in the current
        wire format (the e2e bottleneck — BENCH.md)."""
        (wh, ww), _, _ = self._wire(src_hw)
        if self.ingest in ("i420", "derived"):
            return wh * ww * 3 // 2
        return wh * ww * 3

    def _pack_chunk(self, chunk_frames: list[np.ndarray]) -> np.ndarray:
        """Host-side chunk packing in the ingest's wire format."""
        from ..io.native import pack_frames

        if self.ingest == "derived":
            import cv2

            (wh, ww), _, _ = self._wire(chunk_frames[0].shape[:2])
            return np.stack(
                [
                    cv2.cvtColor(
                        cv2.resize(f, (ww, wh), interpolation=cv2.INTER_AREA),
                        cv2.COLOR_RGB2YUV_I420,
                    )
                    for f in chunk_frames
                ]
            )
        if self.ingest == "i420":
            import cv2

            return np.stack(
                [
                    cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420)
                    for f in chunk_frames
                ]
            )
        return pack_frames(chunk_frames)

    # ------------------------------------------------------------------
    # Three jitted sub-steps over ONE uploaded frame buffer. A single
    # fused mega-program was tried first: it saves nothing (the three
    # models share no compute) and XLA's optimization time explodes
    # (~450s compile vs ~60s split). Separate programs also dispatch
    # asynchronously, so the det/pose/ball branches overlap on device.

    def _build_det_step(self, src_hw: tuple[int, int]):
        h_src, w_src = src_hw
        wire_hw, wsx, wsy = self._wire(src_hw)
        lb = letterbox_plan(wire_hw, self.players.IMGSZ)
        det_model = self.players.engine.model
        polygon = (
            jnp.asarray(np.asarray(self.players.polygon_zone.polygon))
            if self.players.polygon_zone is not None
            else None
        )
        conf_d, iou_d, max_d = (
            self.players.CONF,
            self.players.IOU,
            self.players.max_detections,
        )
        decode = self._ingest_decode(src_hw)

        from .players import _person_scores

        def det_step(det_vars, frames_raw):
            x_det = lb.apply(decode(frames_raw)) / 255.0
            det_out = det_model.apply(det_vars, x_det)
            person = _person_scores(det_out["scores"])
            n_cand = candidate_count(person, conf_d)
            boxes, det_scores, _, _, det_valid = batched_nms(
                det_out["boxes"],
                person,
                conf_thres=conf_d,
                iou_thres=iou_d,
                max_det=max_d,
                top_k=self.players.nms_top_k,
            )
            boxes = lb.boxes_to_source(boxes)  # wire pixels
            boxes = jnp.stack(
                [
                    jnp.clip(boxes[..., 0] * wsx, 0, w_src),
                    jnp.clip(boxes[..., 1] * wsy, 0, h_src),
                    jnp.clip(boxes[..., 2] * wsx, 0, w_src),
                    jnp.clip(boxes[..., 3] * wsy, 0, h_src),
                ],
                axis=-1,
            )
            if polygon is not None:
                anchors = jnp.stack(
                    [(boxes[..., 0] + boxes[..., 2]) / 2.0, boxes[..., 3]],
                    axis=-1,
                )
                det_valid = det_valid & points_in_polygon(anchors, polygon)
            # Pack into ONE output buffer: each drained array is a device
            # round-trip on tunneled links.
            b_, d_ = det_valid.shape
            cand_col = jnp.broadcast_to(
                n_cand[:, None, None].astype(jnp.float32), (b_, d_, 1)
            )
            return jnp.concatenate(
                [
                    boxes,
                    det_scores[..., None],
                    det_valid[..., None].astype(jnp.float32),
                    cand_col,
                ],
                axis=-1,
            )  # (B, max_det, 7)

        return det_step

    def _build_pose_step(self, src_hw: tuple[int, int]):
        h_src, w_src = src_hw
        pose_size = self.pose.train_image_size
        # Squash-resize from the WIRE buffer; keypoints in model space map
        # to source pixels by src/pose_size regardless of the wire dims
        # (x_wire * pose/ww * w_src/pose == x_wire * sx).
        pose_plan = resize_plan(
            self._wire(src_hw)[0], (pose_size, pose_size), "pil_bicubic"
        )
        pose_model = self.pose.engine.model
        conf_p, iou_p, max_p = (
            self.pose.CONF,
            self.pose.IOU,
            self.pose.max_detections,
        )
        pose_rx = w_src / pose_size
        pose_ry = h_src / pose_size
        decode = self._ingest_decode(src_hw)

        def pose_step(pose_vars, frames_raw):
            x_pose = pose_plan.apply(decode(frames_raw)) / 255.0
            pose_out = pose_model.apply(pose_vars, x_pose)
            n_cand = candidate_count(pose_out["scores"][..., 0], conf_p)
            _, pose_scores, _, p_idx, pose_valid = batched_nms(
                pose_out["boxes"],
                pose_out["scores"][..., 0],
                conf_thres=conf_p,
                iou_thres=iou_p,
                max_det=max_p,
                top_k=self.pose.nms_top_k,
            )
            kpts = jnp.take_along_axis(
                pose_out["kpts"], jnp.clip(p_idx, 0)[..., None, None], axis=1
            )
            kpts = kpts.at[..., 0].mul(pose_rx)
            kpts = kpts.at[..., 1].mul(pose_ry)
            b_, d_, k_, _ = kpts.shape
            # Pack into ONE output buffer (see det_step).
            cand_col = jnp.broadcast_to(
                n_cand[:, None, None].astype(jnp.float32), (b_, d_, 1)
            )
            return jnp.concatenate(
                [
                    kpts.reshape(b_, d_, k_ * 3),
                    pose_valid[..., None].astype(jnp.float32),
                    cand_col,
                ],
                axis=-1,
            )  # (B, max_det, 3K + 2)

        return pose_step

    def _build_ball_step(self, src_hw: tuple[int, int]):
        b = self.chunk
        seq_len = self.ball.tracknet_seq_len
        bg_mode = self.ball.bg_mode
        # 'derived': the resize to model resolution starts from the wire
        # buffer; the subtract modes' median is downscaled to the wire
        # resolution host-side (_gather_setup) to match.
        pre = make_frame_preprocess(
            self._wire(src_hw)[0], (self.ball.HEIGHT, self.ball.WIDTH), bg_mode
        )
        tracknet = self.ball.tracknet.model
        decode = self._ingest_decode(src_hw)

        if self.ball_stride != 1:
            # Nonoverlap fast mode: the chunk's b frames form b/seq_len
            # disjoint windows, one TrackNet forward each; window i's
            # output channel j IS frame i*seq_len+j's heatmap (no
            # ensemble, no cross-chunk carry). Same signature as the
            # stride-1 step so the chunk loop / staged scan are oblivious
            # (carries pass through, coef_table/lo are dead arguments).
            def ball_step_nonoverlap(
                tn_vars, frames_raw, median_u8, median_src, frame_carry,
                heat_carry, coef_table, lo, swap_flags,
            ):
                resized = pre(
                    decode(frames_raw), median_src=median_src,
                    swap=swap_flags,
                )  # (b, H, W, C_f) uint8-valued float32
                nwin = b // seq_len
                fr = resized.reshape((nwin, seq_len) + resized.shape[1:])
                parts = [fr[:, j] for j in range(seq_len)]
                if bg_mode == "concat":
                    med = jnp.broadcast_to(
                        median_u8[None].astype(jnp.float32),
                        (nwin,) + median_u8.shape,
                    )
                    parts = [med] + parts
                x_ball = jnp.concatenate(parts, axis=-1) / 255.0
                y = tracknet.apply(tn_vars, x_ball)  # (nwin, H, W, L)
                heat = (
                    jnp.transpose(y, (0, 3, 1, 2))
                    .astype(jnp.float32)
                    .reshape((b,) + y.shape[1:3])
                )  # (b, H, W) in frame order
                cx, cy, vis = decode_heatmaps(heat)
                packed = jnp.stack([cx, cy, vis], axis=-1)
                return packed, frame_carry, heat_carry

            return ball_step_nonoverlap

        def ball_step(
            tn_vars, frames_raw, median_u8, median_src, frame_carry,
            heat_carry, coef_table, lo, swap_flags,
        ):
            # coef_table lives on device for the whole run; slice this
            # chunk's emitted-frame rows with a scalar start index (rows
            # beyond the table were padded with zeros by the caller).
            # The reference median-quirk channel swap applies ONLY to the
            # ball branch, at source resolution BEFORE the difference /
            # resize; det/pose keep RGB. median_src (source-res float
            # median) feeds the subtract modes; median_u8 (resized uint8)
            # feeds 'concat' window assembly.
            coef = jax.lax.dynamic_slice_in_dim(coef_table, lo, b, axis=0)
            resized = pre(decode(frames_raw), median_src=median_src, swap=swap_flags)
            frames_ext = jnp.concatenate([frame_carry, resized], axis=0)
            x_ball = assemble_windows(
                frames_ext, median_u8, bg_mode, seq_len, b
            )
            y = tracknet.apply(tn_vars, x_ball)
            y = jnp.transpose(y, (0, 3, 1, 2)).astype(jnp.float32)

            buf = jnp.concatenate([heat_carry, y], axis=0)
            # out[f] = sum_j coef[f, j] * buf[f + j, L-1-j] via static slices.
            ens = sum(
                coef[:, j, None, None] * buf[j : j + b, seq_len - 1 - j]
                for j in range(seq_len)
            )
            cx, cy, vis = decode_heatmaps(ens)
            packed = jnp.stack([cx, cy, vis], axis=-1)  # (B, 3) int32
            return packed, frames_ext[-(seq_len - 1) :], buf[-(seq_len - 1) :]

        return ball_step

    def _build_court_step(self, src_hw: tuple[int, int]):
        """Fourth fused sub-step: model-based court keypoints over the
        shared frame buffer (reference keypoints_tracker.py:199-262 yolo /
        :264-312 resnet). Returns ONE packed (B, 25) buffer:
        24 flat (x, y) in source pixels + a validity flag."""
        decode = self._ingest_decode(src_hw)
        court = self.court
        wire_hw, wsx, wsy = self._wire(src_hw)
        # The inner steps emit coordinates in their input-frame pixels
        # (the wire buffer); scale back to source.
        wire_to_src = jnp.asarray([wsx, wsy], jnp.float32)
        if self.court_mode == "yolo":
            inner = court._build_yolo_step(wire_hw, self.chunk)

            def court_step(court_vars, frames_raw):
                kpts, valid = inner(court_vars, decode(frames_raw))
                kpts = kpts * wire_to_src
                b = kpts.shape[0]
                return jnp.concatenate(
                    [kpts.reshape(b, -1), valid[:, None].astype(jnp.float32)],
                    axis=-1,
                )

        else:  # resnet: always valid
            inner = court._build_resnet_step(wire_hw, self.chunk)

            def court_step(court_vars, frames_raw):
                kpts = inner(court_vars, decode(frames_raw))
                kpts = kpts * wire_to_src
                b = kpts.shape[0]
                return jnp.concatenate(
                    [kpts.reshape(b, -1), jnp.ones((b, 1), jnp.float32)],
                    axis=-1,
                )

        return court_step

    # ------------------------------------------------------------------
    # Staged-scan variants: the whole superchunk of frames is uploaded to
    # HBM once and a lax.scan over chunks runs ON DEVICE, so a clip
    # segment costs 1 upload + 3 dispatches + 3 drains TOTAL instead of
    # that many per chunk. The scan bodies reuse the sub-step closures.

    def _build_scan_steps(self, src_hw: tuple[int, int], num_chunks: int):
        b = self.chunk
        det_core = self._build_det_step(src_hw)
        pose_core = self._build_pose_step(src_hw)
        ball_core = self._build_ball_step(src_hw)
        court_core = (
            self._build_court_step(src_hw)
            if self.court_mode in ("yolo", "resnet")
            else None
        )

        def court_scan(court_vars, frames_all):
            frames_c = frames_all.reshape((num_chunks, b) + frames_all.shape[1:])
            _, outs = jax.lax.scan(
                lambda _, fr: (None, court_core(court_vars, fr)), None, frames_c
            )
            return outs

        def det_scan(det_vars, frames_all):
            frames_c = frames_all.reshape((num_chunks, b) + frames_all.shape[1:])
            _, outs = jax.lax.scan(
                lambda _, fr: (None, det_core(det_vars, fr)), None, frames_c
            )
            return outs  # (num_chunks, B, max_det, 7)

        def pose_scan(pose_vars, frames_all):
            frames_c = frames_all.reshape((num_chunks, b) + frames_all.shape[1:])
            _, outs = jax.lax.scan(
                lambda _, fr: (None, pose_core(pose_vars, fr)), None, frames_c
            )
            return outs

        def ball_scan(tn_vars, frames_all, median_u8, median_src, frame_carry,
                      heat_carry, coef_table, lo0, swap_all):
            frames_c = frames_all.reshape((num_chunks, b) + frames_all.shape[1:])
            swap_c = swap_all.reshape(num_chunks, b)
            lo_c = lo0 + jnp.arange(num_chunks) * b

            def body(carry, xs):
                fc, hc = carry
                fr, lo, sw = xs
                packed, fc, hc = ball_core(
                    tn_vars, fr, median_u8, median_src, fc, hc, coef_table,
                    lo, sw
                )
                return (fc, hc), packed

            (fc, hc), outs = jax.lax.scan(
                body, (frame_carry, heat_carry), (frames_c, lo_c, swap_c)
            )
            return outs, fc, hc

        return det_scan, pose_scan, ball_scan, (
            court_scan if court_core is not None else None
        )

    def run_staged(
        self,
        frame_iter: Iterable[np.ndarray],
        total_frames: int,
        superchunk: int = 16,  # chunks per staged dispatch
        stream=None,
    ) -> dict[str, list]:
        """Like run(), but stages `superchunk * chunk` frames in HBM per
        dispatch round and scans over chunks on device: 1 upload + 3
        dispatches + 3 drains per ROUND instead of per chunk. Highest
        throughput when per-call dispatch overhead dominates (remote /
        tunneled devices); needs superchunk*chunk*H*W*3 bytes of HBM
        headroom per round."""
        import time

        b = self.chunk
        s = superchunk
        seq_len = self.ball.tracknet_seq_len
        ball = self.ball

        # Wall-clock attribution of the staged loop's HOST-side terms
        # (the device work overlaps them). Stored on self as
        # `last_staged_split` after every run; bench.py surfaces it in
        # the artifact's per-segment attribution.
        split = {"setup_s": 0.0, "prep_wait_s": 0.0, "upload_s": 0.0,
                 "dispatch_s": 0.0, "assoc_s": 0.0, "drain_s": 0.0}
        t_ph = time.perf_counter()
        median_resized, median_src, fw, quirk_flags, n, src_hw = (
            self._gather_setup(frame_iter, total_frames)
        )
        split["setup_s"] = time.perf_counter() - t_ph

        key = ("staged", src_hw, b, s, ball.bg_mode, self.ingest,
               self.wire_long_side, self.court_mode, self.ball_stride)
        if key not in self._step_cache:
            det_scan, pose_scan, ball_scan, court_scan = self._build_scan_steps(
                src_hw, s
            )
            self._step_cache[key] = (
                jax.jit(det_scan),
                jax.jit(pose_scan),
                jax.jit(ball_scan),
                jax.jit(court_scan) if court_scan is not None else None,
            )
        det_scan, pose_scan, ball_scan, court_scan = self._step_cache[key]

        coef = overlap_ensemble_coefficients(n, seq_len, ball.EVAL_MODE)
        n_ext = n + self._ball_off
        round_frames = s * b
        num_rounds = -(-n_ext // round_frames)
        n_ext_pad = num_rounds * round_frames + b
        table = np.zeros((n_ext_pad, seq_len), np.float32)
        table[seq_len - 1 : seq_len - 1 + n] = coef
        coef_table_dev = jnp.asarray(table)
        median_dev = jnp.asarray(median_resized)
        median_src_dev = jnp.asarray(median_src)
        frame_carry = jnp.zeros(
            (seq_len - 1, ball.HEIGHT, ball.WIDTH, frame_channels(ball.bg_mode)),
            jnp.float32,
        )
        heat_carry = jnp.zeros(
            (seq_len - 1, seq_len, ball.HEIGHT, ball.WIDTH), jnp.float32
        )

        zero_frame = np.zeros_like(fw.first())
        builder = _ResultBuilder(self, n, src_hw, stream)

        assoc_state = None
        if self._assoc_device(mesh=False):
            from ..ops.association_scan import init_state

            assoc_state = init_state()
        def prepare(r: int):
            """Host side of round r: decode fill, convert, pack. Runs in
            the depth-1 prefetch worker (cv2/numpy release the GIL) so the
            NEXT round's pack hides under this round's blocking upload —
            same structure as run()'s chunk prefetch."""
            lo, hi = r * round_frames, (r + 1) * round_frames
            avail = fw.fill_to(min(hi, n))
            chunk_frames = [
                fw.get(i) if i < min(avail, n) else zero_frame
                for i in range(lo, hi)
            ]
            arr = self._pack_chunk(chunk_frames)
            fw.drop_below(min(hi, n))
            swap_all = np.zeros(round_frames, np.float32)
            upto = min(hi, n) - lo
            if upto > 0:
                swap_all[:upto] = quirk_flags[lo : lo + upto]
            return lo, arr, swap_all

        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(1)
        next_prep = pool.submit(prepare, 0)
        pending = None
        for r in range(num_rounds):
            t_ph = time.perf_counter()
            lo, arr, swap_all = next_prep.result()
            split["prep_wait_s"] += time.perf_counter() - t_ph
            if r + 1 < num_rounds:
                next_prep = pool.submit(prepare, r + 1)

            t_ph = time.perf_counter()
            frames_dev = jnp.asarray(arr)
            split["upload_s"] += time.perf_counter() - t_ph
            t_ph = time.perf_counter()
            det_packed = det_scan(self.players.engine.variables, frames_dev)
            pose_packed = pose_scan(self.pose.engine.variables, frames_dev)
            ball_packed, frame_carry, heat_carry = ball_scan(
                ball.tracknet.variables,
                frames_dev,
                median_dev,
                median_src_dev,
                frame_carry,
                heat_carry,
                coef_table_dev,
                lo,
                jnp.asarray(swap_all),
            )
            court_packed = (
                court_scan(self.court.engine.variables, frames_dev)
                if court_scan is not None
                else None
            )
            split["dispatch_s"] += time.perf_counter() - t_ph
            det_ids = None
            if assoc_state is not None:
                from ..ops.association_scan import associate_chunk

                t_ph = time.perf_counter()
                flat = det_packed.reshape(
                    (round_frames,) + det_packed.shape[2:]
                )
                assoc_state, det_ids = associate_chunk(
                    assoc_state,
                    flat[..., :4],
                    flat[..., 4],
                    flat[..., 5] > 0.5,
                    first=(r == 0),
                )
                det_ids = det_ids.reshape(s, b, -1)
                split["assoc_s"] += time.perf_counter() - t_ph
            if pending is not None:
                t_ph = time.perf_counter()
                self._drain_round(pending, builder, n, b, seq_len)
                split["drain_s"] += time.perf_counter() - t_ph
            pending = (lo, det_packed, pose_packed, ball_packed, court_packed,
                       det_ids)
        pool.shutdown(wait=False)
        if pending is not None:
            t_ph = time.perf_counter()
            self._drain_round(pending, builder, n, b, seq_len)
            split["drain_s"] += time.perf_counter() - t_ph
        self.last_staged_split = {k: round(v, 4) for k, v in split.items()}

        return builder.finish()

    def _unpack_frames(
        self, builder: "_ResultBuilder", det_packed, pose_packed,
        court_packed, n_real: int, det_ids=None,
    ) -> None:
        """Decode the packed per-frame output buffers into the builder —
        the ONE place that knows the packed layouts (det rows: 4 box +
        score + 0.5-cut validity + pre-NMS candidate count; pose rows: 3K
        keypoint floats + validity + candidate count; court rows: 2K
        coords + flag). Shared by the chunked, staged-scan, and mesh
        drain paths."""
        if not n_real:
            return
        dp = np.asarray(det_packed)[:n_real]
        ids_np = np.asarray(det_ids)[:n_real] if det_ids is not None else None
        builder.add_det(dp[..., :4], dp[..., 4], dp[..., 5] > 0.5, ids=ids_np)
        self.players.nms_saturation.update(dp[:, 0, 6])
        pp = np.asarray(pose_packed)[:n_real]
        nk = (pp.shape[-1] - 2) // 3
        builder.add_pose(
            pp[..., : 3 * nk].reshape(pp.shape[0], pp.shape[1], nk, 3),
            pp[..., 3 * nk] > 0.5,
        )
        self.pose.nms_saturation.update(pp[:, 0, 3 * nk + 1])
        if court_packed is not None:
            builder.add_court(np.asarray(court_packed)[:n_real])

    def _drain_round(self, item, builder: _ResultBuilder, n, b, seq_len):
        lo, det_packed, pose_packed, ball_packed, court_packed, det_ids = item
        s = det_packed.shape[0]
        dp = np.asarray(det_packed).reshape(s * b, *det_packed.shape[2:])
        pp = np.asarray(pose_packed).reshape(s * b, *pose_packed.shape[2:])
        bp = np.asarray(ball_packed).reshape(s * b, 3)
        cp = (
            np.asarray(court_packed).reshape(s * b, court_packed.shape[-1])
            if court_packed is not None
            else None
        )
        ids = (
            np.asarray(det_ids).reshape(s * b, det_ids.shape[-1])
            if det_ids is not None
            else None
        )
        n_real = max(0, min(lo + s * b, n) - lo)
        self._unpack_frames(builder, dp, pp, cp, n_real, det_ids=ids)
        emit_lo = lo - self._ball_off
        for j in range(s * b):
            f = emit_lo + j
            if 0 <= f < n:
                builder.add_ball(int(bp[j, 0]), int(bp[j, 1]), int(bp[j, 2]))
        builder.maybe_emit()

    # ------------------------------------------------------------------

    def _get_steps(self, src_hw: tuple[int, int]):
        """Jitted (det, pose, ball, court-or-None) sub-steps, cached per
        (resolution, chunk, bg_mode, ingest, court_mode)."""
        key = (src_hw, self.chunk, self.ball.bg_mode, self.ingest,
               self.wire_long_side, self.court_mode, self.ball_stride)
        if key not in self._step_cache:
            self._step_cache[key] = (
                jax.jit(self._build_det_step(src_hw)),
                jax.jit(self._build_pose_step(src_hw)),
                jax.jit(self._build_ball_step(src_hw)),
                jax.jit(self._build_court_step(src_hw))
                if self.court_mode in ("yolo", "resnet")
                else None,
            )
        return self._step_cache[key]

    def _ball_device_setup(self, n: int, median_resized, median_src):
        """Device-resident ball-branch state for an n-frame clip:
        (median_dev, median_src_dev, coef_table_dev, frame_carry,
        heat_carry). The coefficient table is padded so chunk k's rows are
        table[lo : lo + b] (row lo-7+j's coefficients live at index lo+j;
        out-of-range frames are zero rows)."""
        b = self.chunk
        ball = self.ball
        seq_len = ball.tracknet_seq_len
        coef = overlap_ensemble_coefficients(n, seq_len, ball.EVAL_MODE)
        n_ext_pad = (-(-(n + seq_len - 1) // b)) * b + b
        table = np.zeros((n_ext_pad, seq_len), np.float32)
        table[seq_len - 1 : seq_len - 1 + n] = coef
        frame_carry = jnp.zeros(
            (seq_len - 1, ball.HEIGHT, ball.WIDTH, frame_channels(ball.bg_mode)),
            jnp.float32,
        )
        heat_carry = jnp.zeros(
            (seq_len - 1, seq_len, ball.HEIGHT, ball.WIDTH), jnp.float32
        )
        return (
            jnp.asarray(median_resized),
            jnp.asarray(median_src),
            jnp.asarray(table),
            frame_carry,
            heat_carry,
        )

    def run(
        self,
        frame_iter: Iterable[np.ndarray],
        total_frames: int,
        stream=None,
    ) -> dict[str, list]:
        """Consume RGB uint8 frames; returns per-tracker prediction lists
        keyed 'players', 'players_keypoints', 'ball', 'keypoints'.

        stream: optional callback(players_new, pose_new, ball_new,
        court_new) invoked in frame order as results finalize (only when
        no InpaintNet pass is pending) — lets the caller render/collect
        concurrently with inference."""
        b = self.chunk
        seq_len = self.ball.tracknet_seq_len
        ball = self.ball

        median_resized, median_src, fw, quirk_flags, n, src_hw = (
            self._gather_setup(frame_iter, total_frames)
        )

        det_step, pose_step, ball_step, court_step = self._get_steps(src_hw)
        (median_dev, median_src_dev, coef_table_dev, frame_carry,
         heat_carry) = self._ball_device_setup(n, median_resized, median_src)

        # Zero-extend the clip by seq_len-1 frames: every output frame
        # (including the tail) is then emitted by the uniform chunk loop —
        # windows touching the zero padding get coefficient 0 from the
        # table, so the padding never contaminates real outputs.
        zero_frame = np.zeros_like(fw.first())
        n_ext = n + self._ball_off
        num_chunks = -(-n_ext // b)
        builder = _ResultBuilder(self, n, src_hw, stream)

        import collections

        pending = collections.deque()  # packed device outputs, depth-2 queue

        def drain(item):
            (emit_lo, n_real_frames, det_packed, pose_packed, ball_packed,
             court_packed, det_ids) = item
            self._unpack_frames(
                builder, det_packed, pose_packed, court_packed, n_real_frames,
                det_ids=det_ids,
            )
            bp = np.asarray(ball_packed)
            for j in range(b):
                f = emit_lo + j
                if 0 <= f < n:
                    builder.add_ball(int(bp[j, 0]), int(bp[j, 1]), int(bp[j, 2]))
            builder.maybe_emit()

        def prepare(k: int):
            """Host side of chunk k: decode fill, convert, pack."""
            lo, hi = k * b, min((k + 1) * b, n_ext)
            avail = fw.fill_to(min(hi, n))
            chunk_frames = [
                fw.get(i) if i < min(avail, n) else zero_frame
                for i in range(lo, hi)
            ]
            chunk_frames += [zero_frame] * (b - len(chunk_frames))
            arr = self._pack_chunk(chunk_frames)
            # Drop frames this chunk consumed (kept until packed).
            fw.drop_below(min(hi, n))
            swap_chunk = np.zeros(b, np.float32)
            upto = min(hi, n) - lo
            if upto > 0:
                swap_chunk[:upto] = quirk_flags[lo : lo + upto]
            return lo, arr, swap_chunk

        # Prefetch: the NEXT chunk's decode/convert/pack (cv2/numpy —
        # releases the GIL) runs in a worker while the main thread sits in
        # the blocking upload, hiding the host work under the link (the
        # pipeline bottleneck, BENCH.md). Depth 1: bounded memory, and the
        # frame-window mutation stays sequential (one prepare at a time).
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(1)
        try:
            next_prep = pool.submit(prepare, 0)
            return self._run_chunk_loop(
                num_chunks, b, n, n_ext, seq_len, pool, next_prep, prepare,
                det_step, pose_step, ball_step, court_step, builder,
                median_dev, median_src_dev, frame_carry, heat_carry,
                coef_table_dev, pending, drain,
            )
        finally:
            pool.shutdown(wait=False)

    def _run_chunk_loop(
        self, num_chunks, b, n, n_ext, seq_len, pool, next_prep, prepare,
        det_step, pose_step, ball_step, court_step, builder, median_dev,
        median_src_dev, frame_carry, heat_carry, coef_table_dev, pending,
        drain,
    ):
        ball = self.ball
        assoc_state = None
        if self._assoc_device(mesh=False):
            from ..ops.association_scan import init_state

            assoc_state = init_state()
        for k in range(num_chunks):
            lo, arr, swap_chunk = next_prep.result()
            if k + 1 < num_chunks:
                next_prep = pool.submit(prepare, k + 1)
            hi = min(lo + b, n_ext)
            n_real_frames = max(0, min(hi, n) - lo)
            emit_lo = lo - self._ball_off

            # ONE upload, three async sub-steps sharing it; each returns a
            # single packed buffer (fewest device round-trips per chunk).
            frames_dev = jnp.asarray(arr)
            det_packed = det_step(self.players.engine.variables, frames_dev)
            pose_packed = pose_step(self.pose.engine.variables, frames_dev)
            ball_packed, frame_carry, heat_carry = ball_step(
                ball.tracknet.variables,
                frames_dev,
                median_dev,
                median_src_dev,
                frame_carry,
                heat_carry,
                coef_table_dev,
                lo,
                jnp.asarray(swap_chunk),
            )
            court_packed = (
                court_step(self.court.engine.variables, frames_dev)
                if court_step is not None
                else None
            )
            det_ids = None
            if assoc_state is not None:
                from ..ops.association_scan import associate_chunk

                assoc_state, det_ids = associate_chunk(
                    assoc_state,
                    det_packed[..., :4],
                    det_packed[..., 4],
                    det_packed[..., 5] > 0.5,
                    first=(k == 0),
                )
            # Keep up to 2 chunks in flight; drain the oldest so host
            # syncs overlap with in-flight device work.
            pending.append(
                (emit_lo, n_real_frames, det_packed, pose_packed, ball_packed,
                 court_packed, det_ids)
            )
            if len(pending) > 2:
                drain(pending.popleft())
        pool.shutdown(wait=False)
        while pending:
            drain(pending.popleft())

        return builder.finish()

    # ------------------------------------------------------------------

    def measure_device_split(
        self,
        frame_iter: Iterable[np.ndarray],
        total_frames: int,
        n_chunks: int = 4,
    ) -> dict:
        """Device-resident phase timing for the fused sub-steps.

        Packs and uploads `n_chunks` chunks once (each perturbed by one
        byte so the transport's replay cache cannot return a prior run's
        results — BENCH.md measurement rules), then wall-clocks each
        sub-step phase over the resident buffers, forcing completion by
        materializing every packed output (block_until_ready is a no-op
        on tunneled transports). Intended to run on an already-warm
        pipeline (the steps come from the same cache `run` populates), so
        the numbers are pure dispatch+execute — the device-side throughput
        the link otherwise hides.

        Returns {"pack_s", "upload_s", "det_s", "pose_s", "ball_s",
        ["court_s",] "frames", "device_ms_per_frame", "device_fps"}, or
        None when the clip is shorter than one chunk.
        """
        import time

        b = self.chunk
        ball = self.ball
        median_resized, median_src, fw, _quirk, n, src_hw = (
            self._gather_setup(frame_iter, total_frames)
        )
        if n < b:
            return None
        det_step, pose_step, ball_step, court_step = self._get_steps(src_hw)

        n_chunks = min(n_chunks, n // b)
        frames_used = n_chunks * b
        raw: dict[str, float] = {}

        # ---- decode up front (untimed), then pack + upload per chunk ----
        fw.fill_to(frames_used)
        fds = []
        arr0 = None
        pack_s = 0.0
        t0 = time.perf_counter()
        for k in range(n_chunks):
            lo = k * b
            chunk = [fw.get(i) for i in range(lo, lo + b)]
            tp = time.perf_counter()
            arr = self._pack_chunk(chunk)
            if not arr.flags.writeable:
                arr = arr.copy()
            arr.flat[k] ^= 1  # replay-cache defeat: distinct content
            pack_s += time.perf_counter() - tp
            if k == 0:
                arr0 = arr.copy()  # host-side copy for the warmup buffer
            fd = jnp.asarray(arr)
            np.asarray(fd[(0,) * fd.ndim])  # force the upload
            fds.append(fd)
            fw.drop_below(lo + b)
        raw["pack_s"] = pack_s
        raw["upload_s"] = time.perf_counter() - t0 - pack_s

        (median_dev, median_src_dev, coef_table_dev, fc, hc) = (
            self._ball_device_setup(n, median_resized, median_src)
        )
        swap = jnp.zeros(b, jnp.float32)

        def _force_scalar(o):
            # ONE element download: forces every enqueued program (the
            # device executes its queue in order) at the cost of a single
            # round trip — downloading each phase's full buffers costs
            # n_chunks RTTs and dominated the round-2 numbers (the tunnel
            # floor is tens of ms some days).
            np.asarray(jax.device_get(o.ravel()[0]))

        # dispatch+download floor, subtracted from each phase below
        tiny = jax.jit(lambda v, i: v + i)
        zb = jnp.zeros((8, 128))
        _force_scalar(tiny(zb, 0))
        t0 = time.perf_counter()
        for i in range(3):
            _force_scalar(tiny(zb, i + 1))
        rtt = (time.perf_counter() - t0) / 3

        # ---- untimed warmup of every phase program ----
        # The e2e pass that usually precedes this may have run the
        # STAGED-scan programs (bench.py's default dispatch since r3), not
        # these chunked ones — in which case the first det/pose call here
        # pays a 30-200s XLA compile that is NOT device throughput (an
        # r3 bench run recorded det_s=32s/pose_s=69s of pure compile).
        # Warm on a dedicated perturbed buffer so the transport's replay
        # cache cannot serve the first TIMED dispatch from the warmup.
        # (arr0 is chunk 0's host-side copy — re-downloading the chunk
        # from the device would cost ~100 MB over the tunnel.)
        arr0.flat[n_chunks] ^= 1
        fdw = jnp.asarray(arr0)
        np.asarray(fdw[(0,) * fdw.ndim])
        _force_scalar(det_step(self.players.engine.variables, fdw))
        _force_scalar(pose_step(self.pose.engine.variables, fdw))
        pw, _, _ = ball_step(
            ball.tracknet.variables, fdw, median_dev, median_src_dev,
            fc, hc, coef_table_dev, 0, swap,
        )
        _force_scalar(pw)
        if court_step is not None:
            _force_scalar(court_step(self.court.engine.variables, fdw))
        del fdw, arr0

        def phase(name, fn):
            t0 = time.perf_counter()
            outs = [fn(fd) for fd in fds]
            _force_scalar(outs[-1])
            raw[name] = max(time.perf_counter() - t0 - rtt, 1e-9)

        phase("det_s", lambda fd: det_step(self.players.engine.variables, fd))
        phase("pose_s", lambda fd: pose_step(self.pose.engine.variables, fd))

        t0 = time.perf_counter()
        pk = None
        for k, fd in enumerate(fds):
            pk, fc, hc = ball_step(
                ball.tracknet.variables, fd, median_dev, median_src_dev,
                fc, hc, coef_table_dev, k * b, swap,
            )
        _force_scalar(pk)
        raw["ball_s"] = max(time.perf_counter() - t0 - rtt, 1e-9)

        if court_step is not None:
            phase(
                "court_s",
                lambda fd: court_step(self.court.engine.variables, fd),
            )
        compute_s = sum(
            v for k, v in raw.items() if k not in ("pack_s", "upload_s")
        )

        split: dict = {k: round(v, 3) for k, v in raw.items()}
        split["rtt_s"] = round(rtt, 4)
        split["frames"] = frames_used
        split["device_ms_per_frame"] = round(compute_s / frames_used * 1e3, 2)
        split["device_fps"] = round(frames_used / max(compute_s, 1e-9), 2)
        return split

    # ------------------------------------------------------------------

    def run_mesh(
        self,
        frame_iter: Iterable[np.ndarray],
        total_frames: int,
        mesh,
    ) -> dict[str, list]:
        """Multi-chip fused run over a ('data', ...) jax.sharding.Mesh.

        det/pose shard the frame axis via GSPMD: each dispatch takes a
        block of d*chunk frames placed with NamedSharding(P('data'))
        (weights replicated), so the batch splits across chips with no
        collectives — inference is embarrassingly parallel over frames.
        The ball branch preprocesses frames inside the same sharded block
        step (resize/diff at 288x512 is ~0.4 MB/frame to drain) and
        finishes with ONE context-parallel window-inference pass over the
        whole clip: frame axis sharded with seq_len-1 halo exchange via
        ring ppermute over ICI (parallel/sharded_inference.py).

        Association defaults to the on-device scan here ('auto' ->
        device): ID assignment is globally sequential, so the host
        alternative is a per-frame Python ByteTrack loop on the drain
        critical path — the one per-frame host cost the mesh cannot
        hide. The scan itself is a tiny carried program per block
        (negligible next to the sharded convs; XLA gathers the packed
        det rows, ~6 floats/det). association='host' still forces exact
        supervision parity.

        Ball output is bit-equal to the single-device run(); det/pose
        agree to float tolerance (GSPMD batch-sharded convolutions round
        differently at the ULP level) — tests/test_fused_mesh.py. The
        reference has no parallel mode at all (SURVEY.md §2c) — this is
        the v5e-8 deployment path.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharded_inference import sharded_window_inference

        d = mesh.shape["data"]
        ball = self.ball
        seq_len = ball.tracknet_seq_len
        b = self.chunk * d  # frames per sharded block

        median_resized, median_src, fw, quirk_flags, n, src_hw = (
            self._gather_setup(frame_iter, total_frames)
        )
        if n < seq_len or -(-n // d) < seq_len - 1:
            raise ValueError(
                f"clip ({n} frames) too short for {d}-way frame sharding"
            )

        key = ("mesh", src_hw, b, ball.bg_mode, self.ingest,
               self.wire_long_side, id(mesh))
        if key not in self._step_cache:
            pre = make_frame_preprocess(
                self._wire(src_hw)[0], (ball.HEIGHT, ball.WIDTH),
                ball.bg_mode,
            )
            decode = self._ingest_decode(src_hw)

            def ball_pre_step(frames_raw, median_src_dev, swap):
                out = pre(decode(frames_raw), median_src=median_src_dev,
                          swap=swap)
                return out.astype(jnp.uint8)

            shard = NamedSharding(mesh, P("data"))
            rep = NamedSharding(mesh, P())

            # Stable objects for the sharded ball pass: the window program
            # is cached per (mesh, apply_fn, geometry) inside
            # parallel/sharded_inference.py, so apply_fn must NOT be a
            # fresh closure per call, and the weights enter as a runtime
            # argument replicated ONCE here (not baked-in constants).
            engine = ball.tracknet

            def ball_apply(vars_rep, x):
                return engine.model.apply(vars_rep, x)

            ball_vars_rep = jax.device_put(engine.variables, rep)
            self._mesh_ball_vars_src = engine.variables
            self._step_cache[key] = (
                jax.jit(self._build_det_step(src_hw), in_shardings=(rep, shard)),
                jax.jit(self._build_pose_step(src_hw), in_shardings=(rep, shard)),
                jax.jit(ball_pre_step, in_shardings=(shard, rep, shard)),
                jax.jit(
                    self._build_court_step(src_hw), in_shardings=(rep, shard)
                )
                if self.court_mode in ("yolo", "resnet")
                else None,
                shard,
                rep,
                ball_apply,
                ball_vars_rep,
            )
        (det_step, pose_step, ball_pre_step, court_step, shard, rep,
         ball_apply, ball_vars_rep) = self._step_cache[key]
        if self._mesh_ball_vars_src is not ball.tracknet.variables:
            # Weights changed since the cache entry was built: re-replicate
            # them (the compiled programs take weights as arguments, so
            # they stay valid).
            ball_vars_rep = jax.device_put(ball.tracknet.variables, rep)
            entry = list(self._step_cache[key])
            entry[7] = ball_vars_rep
            self._step_cache[key] = tuple(entry)
            self._mesh_ball_vars_src = ball.tracknet.variables

        # Replicate det/pose/court weights over the mesh ONCE per (key,
        # weights) — passing the single-device variables straight into the
        # jitted steps would make GSPMD re-broadcast them on EVERY block
        # dispatch (a per-block all-device weight transfer on real
        # hardware).
        vkey = ("mesh_vars", key)
        srcs = (
            self.players.engine.variables,
            self.pose.engine.variables,
            self.court.engine.variables
            if court_step is not None else None,
        )
        cached = self._step_cache.get(vkey)
        if cached is None or cached[0] != tuple(id(s) for s in srcs):
            reps = tuple(
                jax.device_put(s, rep) if s is not None else None
                for s in srcs
            )
            cached = (tuple(id(s) for s in srcs), reps)
            self._step_cache[vkey] = cached
        det_vars_rep, pose_vars_rep, court_vars_rep = cached[1]

        builder = _ResultBuilder(self, n, src_hw, None)
        median_src_dev = jax.device_put(median_src, rep)
        zero_frame = np.zeros_like(fw.first())
        pre_frames: list[np.ndarray] = []

        assoc_state = None
        if self._assoc_device(mesh=True):
            from ..ops.association_scan import init_state

            assoc_state = init_state()
        num_blocks = -(-n // b)
        pending = None

        def prepare(k: int):
            """Host side of block k: decode fill, convert, pack — runs in
            the depth-1 prefetch worker (cv2/numpy release the GIL) so the
            next block's pack hides under this block's blocking upload,
            same as run()/run_staged()."""
            lo, hi = k * b, min((k + 1) * b, n)
            avail = fw.fill_to(hi)
            frames = [
                fw.get(i) if i < min(avail, n) else zero_frame
                for i in range(lo, lo + b)
            ]
            arr = self._pack_chunk(frames)
            fw.drop_below(hi)
            swap = np.zeros(b, np.float32)
            swap[: hi - lo] = quirk_flags[lo:hi]
            return lo, hi, arr, swap

        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(1)
        next_prep = pool.submit(prepare, 0)
        for k in range(num_blocks):
            lo, hi, arr, swap = next_prep.result()
            if k + 1 < num_blocks:
                next_prep = pool.submit(prepare, k + 1)
            frames_dev = jax.device_put(arr, shard)
            swap_dev = jax.device_put(swap, shard)
            det_packed = det_step(det_vars_rep, frames_dev)
            pose_packed = pose_step(pose_vars_rep, frames_dev)
            pre_packed = ball_pre_step(frames_dev, median_src_dev, swap_dev)
            court_packed = (
                court_step(court_vars_rep, frames_dev)
                if court_step is not None
                else None
            )
            det_ids = None
            if assoc_state is not None:
                from ..ops.association_scan import associate_chunk

                assoc_state, det_ids = associate_chunk(
                    assoc_state,
                    det_packed[..., :4],
                    det_packed[..., 4],
                    det_packed[..., 5] > 0.5,
                    first=(k == 0),
                )
            if pending is not None:
                self._drain_block(pending, builder, n, pre_frames)
            pending = (lo, det_packed, pose_packed, pre_packed, court_packed,
                       det_ids)
        pool.shutdown(wait=False)
        if pending is not None:
            self._drain_block(pending, builder, n, pre_frames)

        # ---- ball: one halo-exchange pass over the preprocessed clip ----
        cx, cy, vis = sharded_window_inference(
            ball_apply,
            np.stack(pre_frames),
            median_resized,
            mesh,
            seq_len=seq_len,
            eval_mode=ball.EVAL_MODE,
            bg_mode=ball.bg_mode,
            stride=self.ball_stride,
            variables=ball_vars_rep,
        )
        for i in range(n):
            builder.add_ball(int(cx[i]), int(cy[i]), int(vis[i]))
        return builder.finish()

    def _drain_block(self, item, builder: _ResultBuilder, n, pre_frames):
        lo, det_packed, pose_packed, pre_packed, court_packed, det_ids = item
        n_real = max(0, min(lo + det_packed.shape[0], n) - lo)
        if not n_real:
            return
        self._unpack_frames(
            builder, det_packed, pose_packed, court_packed, n_real,
            det_ids=det_ids,
        )
        pre_frames.extend(np.asarray(pre_packed)[:n_real])

    # ------------------------------------------------------------------

    def _gather_setup(self, frame_iter, total_frames):
        """Median estimation over the head of the clip + streaming frame
        window. Frames stay RGB for det/pose; the reference's channel
        quirk (ball path sees the first median_max_sample_num frames BGR,
        iterable.py:63-64,160) becomes per-frame flags consumed on device
        by the ball branch."""
        ball = self.ball
        subtract_mode = ball.bg_mode in ("subtract", "subtract_concat")
        buffered: list[np.ndarray] = []
        it = iter(frame_iter)
        quirk_upto = 0
        if ball.owns_median():
            for frame in it:
                buffered.append(frame)
                if len(buffered) == ball.median_max_sample_num:
                    break
            # Recomputes when the clip changed (first-frame fingerprint);
            # reference iterable.py:59-83 semantics, incl. the quirk swap
            # of the head frames on every run.
            if ball.ensure_median_for_clip(buffered):
                quirk_upto = len(buffered)
        elif subtract_mode and ball.median is None:
            raise ValueError(f"bg_mode={ball.bg_mode!r} needs a median")

        fw = _FrameWindow(buffered, it)
        seq_len = ball.tracknet_seq_len
        if fw.fill_to(seq_len) < seq_len or not len(fw):
            raise ValueError("clip shorter than seq_len")
        n = total_frames  # trusted like the reference
        src_hw = fw.first().shape[:2]
        # Settle the run's wire format HERE, before anything derives from
        # it (the median below must match the resolution the device-side
        # difference runs at).
        self._check_ingest(src_hw)
        quirk_flags = np.zeros(n, np.float32)
        quirk_flags[: min(quirk_upto, n)] = 1.0

        median_resized = median_model_resolution(
            ball.median, ball.HEIGHT, ball.WIDTH, ball.bg_mode
        )
        # Float median for the subtract modes' on-device difference
        # images, at the resolution those differences run at (source, or
        # the wire resolution in 'derived' ingest); tiny placeholder
        # otherwise.
        if subtract_mode:
            median_src = ball.median.astype(np.float32)
            wire_hw = self._wire(src_hw)[0]
            if wire_hw != tuple(src_hw):
                import cv2

                median_src = cv2.resize(
                    median_src, (wire_hw[1], wire_hw[0]),
                    interpolation=cv2.INTER_AREA,
                )
        else:
            median_src = np.zeros((1, 1, 3), np.float32)
        return median_resized, median_src, fw, quirk_flags, n, src_hw
