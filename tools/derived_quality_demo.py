"""Quantify the fast-path ingest quality trade (derived wire buffer +
half-resolution pose) on TRAINED det/pose models.

The bench headline config deviates from reference preprocessing on two
axes (reference: players_keypoints_tracker.py:260-266, iterable.py:167-199):

1. `ingest='derived'`: every model input is derived on device from ONE
   <=960-long-side I420 wire buffer (two-step resize) instead of a direct
   source-resolution resize per model.
2. `pose@640`: the pose model runs at half its training resolution (a
   size the reference itself supports via train_image_size,
   players_keypoints_tracker.py:240).

This demo measures what those trades COST, the way
tools/stride_quality_demo.py does for the ball-stride trade: train
smoke-scale YOLOv8-n det + pose models to convergence on synthetic
scenes with known GT, then run the SAME weights through the real
FusedPipeline twice — reference-parity ingest (i420 full-res, pose@full)
vs the fast path (derived wire, pose@half) — and report detect-rate /
box-IoU / keypoint-px deltas against ground truth.

Geometry mirrors the production ratios at 1/10 scale: source 192x108
(1920x1080), wire long side 96 (960), pose 128 -> 64 (1280 -> 640),
det 64 letterbox (640).

  python tools/derived_quality_demo.py [--det-steps 150] [--pose-steps 200]

Exposes `run_demo()` for tests/test_derived_quality.py; the asserted
bounds are the CI evidence that the 18-22 fps headline's quality trade
is measured, not assumed (BENCH.md round-5).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:  # invoked as a script from tools/
    from yolo_convergence_demo import _force_cpu
except ImportError:  # imported as tools.derived_quality_demo (tests)
    from tools.yolo_convergence_demo import _force_cpu

SRC_HW = (108, 192)  # 1080x1920 / 10
WIRE = 96            # 960 / 10
POSE_FULL = 128      # 1280 / 10
POSE_FAST = 64       # 640 / 10
DET = 64             # 640 / 10 (letterbox)
NK = 13              # PlayerKeypointsTracker's fixed keypoint count
_SCALE = 1           # geometry multiplier (see _set_scale)


def _set_scale(k: int) -> None:
    """Scale the whole toy geometry by k (k=1 is 1/10 production scale,
    k=2 is 1/5, ...). Every absolute pixel quantity — source, wire, model
    input sizes, player boxes, keypoint dots — multiplies by k, so the
    PROPORTIONS stay production-faithful while features grow toward
    production's absolute pixel sizes. The measured fast-path delta
    shrinks with k (features stop brushing the resolution floor), which
    is what makes the k=1 numbers an upper bound on the production
    trade, not an estimate of it."""
    global SRC_HW, WIRE, POSE_FULL, POSE_FAST, DET, _SCALE
    SRC_HW = (108 * k, 192 * k)
    WIRE = 96 * k
    POSE_FULL = 128 * k
    POSE_FAST = 64 * k
    DET = 64 * k
    _SCALE = k

# 13 distinct dot colors (uint8 RGB) so the pose net can tell keypoints
# apart at smoke resolution; positions are a fixed grid inside the box.
_PALETTE = np.array(
    [
        [255, 64, 64], [64, 255, 64], [64, 64, 255], [255, 255, 64],
        [255, 64, 255], [64, 255, 255], [255, 160, 64], [160, 64, 255],
        [64, 160, 128], [200, 200, 200], [128, 255, 160], [255, 128, 160],
        [160, 128, 64],
    ],
    np.uint8,
)
_REL = np.array(
    [(0.5, 0.08)]
    + [(cx, cy) for cy in (0.28, 0.52, 0.76, 0.95) for cx in (0.2, 0.5, 0.8)],
    np.float32,
)  # (13, 2) relative keypoint layout inside the player box


def make_scene_clip(rng: np.random.Generator, n: int, m: int = 2):
    """n source-res frames with m 'players' (shaded rects + 13 colored
    keypoint dots) and a moving ball dot. Returns (frames uint8 RGB,
    gt_boxes (n,m,4) src px, gt_kpts (n,m,13,2) src px)."""
    h, w = SRC_HW
    sc = _SCALE
    frames = np.empty((n, h, w, 3), np.uint8)
    gt_boxes = np.zeros((n, m, 4), np.float32)
    gt_kpts = np.zeros((n, m, NK, 2), np.float32)
    # Per-player smooth trajectories so consecutive frames look like video.
    px = rng.uniform(10 * sc, w - 70 * sc, m)
    py = rng.uniform(5 * sc, h - 85 * sc, m)
    vx = rng.uniform(-1.5, 1.5, m) * sc
    vy = rng.uniform(-1.0, 1.0, m) * sc
    bw = rng.uniform(34 * sc, 48 * sc, m)
    bh = rng.uniform(64 * sc, 80 * sc, m)
    for i in range(n):
        f = np.full((h, w, 3), 38, np.uint8)
        f += rng.integers(0, 8, f.shape, dtype=np.uint8)
        for j in range(m):
            px[j] = np.clip(px[j] + vx[j], 2, w - bw[j] - 2)
            py[j] = np.clip(py[j] + vy[j], 2, h - bh[j] - 2)
            if px[j] in (2, w - bw[j] - 2):
                vx[j] = -vx[j]
            if py[j] in (2, h - bh[j] - 2):
                vy[j] = -vy[j]
            x1, y1 = px[j], py[j]
            x2, y2 = x1 + bw[j], y1 + bh[j]
            gt_boxes[i, j] = [x1, y1, x2, y2]
            f[int(y1) : int(y2), int(x1) : int(x2)] = (90 + 30 * j, 85, 110)
            for k in range(NK):
                kx = x1 + _REL[k, 0] * bw[j]
                ky = y1 + _REL[k, 1] * bh[j]
                gt_kpts[i, j, k] = [kx, ky]
                xi, yi = int(round(kx)), int(round(ky))
                # 5x5 dots at scale 1: production pose features
                # (head/joints) are 20-60px at 1080p -> 2-6px at 1/10
                # scale; sub-2px dots would vanish at the half-res pose
                # input in a way real limbs don't. Radius scales with
                # _SCALE to keep the proportion.
                r = 2 * sc
                f[max(yi - r, 0) : yi + r + 1,
                  max(xi - r, 0) : xi + r + 1] = _PALETTE[k]
        # ball: bright dot on a sine path (the ball branch runs; its
        # quality is covered by tools/stride_quality_demo.py, not here)
        bx = int((0.1 + 0.8 * (i / max(n - 1, 1))) * w)
        by = int(h * (0.3 + 0.2 * np.sin(i / 5.0)))
        f[max(by - sc, 0) : by + sc + 1, max(bx - sc, 0) : bx + sc + 1] = 255
        frames[i] = f
    return frames, gt_boxes, gt_kpts


# ------------------------------------------------------------ training


def _letterbox_train_views(frames, gt_boxes):
    """Reference-parity det training inputs: direct source->letterbox
    (the exact plan PlayerTracker jits — ops/resize.letterbox_plan)."""
    import cv2

    from padel_analytics_tpu.ops.resize import letterbox_plan

    lb = letterbox_plan(SRC_HW, DET)
    new_h, new_w = lb.plan.dst_hw
    out = np.full((len(frames), lb.out_h, lb.out_w, 3), 114, np.uint8)
    for i, f in enumerate(frames):
        r = cv2.resize(f, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        out[i, lb.pad_top : lb.pad_top + new_h,
            lb.pad_left : lb.pad_left + new_w] = r
    boxes = gt_boxes * lb.gain
    boxes[..., 0::2] += lb.pad_left
    boxes[..., 1::2] += lb.pad_top
    return out.astype(np.float32) / 255.0, boxes, (lb.out_h, lb.out_w)


def _squash_train_views(frames, gt_boxes, gt_kpts, size):
    """Reference-parity pose training inputs: direct source->squash."""
    import cv2

    h, w = SRC_HW
    out = np.stack(
        [cv2.resize(f, (size, size), interpolation=cv2.INTER_LINEAR)
         for f in frames]
    )
    sx, sy = size / w, size / h
    boxes = gt_boxes * np.array([sx, sy, sx, sy], np.float32)
    kpts = np.concatenate(
        [gt_kpts * np.array([sx, sy], np.float32),
         np.full(gt_kpts.shape[:-1] + (1,), 2.0, np.float32)],
        axis=-1,
    )
    return out.astype(np.float32) / 255.0, boxes, kpts


def _train_pose_multiscale(model, frames, boxes, kpts, steps, batch, lr,
                           sizes=None, seed=0):
    """Train the pose model round-robin over a few squash sizes — the
    smoke analog of ultralytics' scale augmentation. A model trained at
    ONE resolution is maximally scale-brittle (measured here: top-1 conf
    0.96@128 -> 0.06@64 on the same scenes), which real checkpoints are
    not; multi-scale training is what makes the pose@half-res fast path
    a measurable quality trade instead of an artifact of the toy."""
    import jax
    import jax.numpy as jnp
    import optax

    from padel_analytics_tpu.training.yolo import (
        init_yolo_train_state,
        make_yolo_train_step,
    )

    if sizes is None:
        # Read the (possibly _set_scale-rescaled) globals at CALL time;
        # the middle size is the halfway point rounded to a /32 multiple.
        mid = round((POSE_FULL + POSE_FAST) / 2 / 32) * 32
        sizes = (POSE_FULL, mid, POSE_FAST)
    optimizer = optax.adam(lr)
    state = init_yolo_train_state(
        model, jnp.zeros((1, sizes[0], sizes[0], 3), jnp.float32), optimizer
    )
    views = {}
    step_fns = {}
    for s in sizes:
        views[s] = _squash_train_views(frames, boxes, kpts, s)
        step_fns[s] = jax.jit(
            make_yolo_train_step(model, optimizer, (s, s), pose=True)
        )
    labels = np.zeros(boxes.shape[:2], np.int32)
    mask = np.ones(boxes.shape[:2], bool)
    rng = np.random.default_rng(seed)
    n = len(frames)
    step = 0
    loss = None
    while step < steps:
        order = rng.permutation(n)
        for lo in range(0, n, batch):
            sel = order[lo : lo + batch]
            s = sizes[step % len(sizes)]
            imgs, gtb, gtk = views[s]
            state, loss = step_fns[s](
                state, jnp.asarray(imgs[sel]), jnp.asarray(labels[sel]),
                jnp.asarray(gtb[sel]), jnp.asarray(gtk[sel]),
                jnp.asarray(mask[sel]),
            )
            step += 1
            if step >= steps:
                break
    return (
        {"params": state.params, "batch_stats": state.batch_stats},
        float(loss),
    )


def _train(model, images, steps, batch, lr, image_hw, pose, gts, seed=0):
    import jax.numpy as jnp
    import optax

    import jax
    from padel_analytics_tpu.training.yolo import (
        init_yolo_train_state,
        make_yolo_train_step,
    )

    optimizer = optax.adam(lr)
    state = init_yolo_train_state(
        model, jnp.zeros((1,) + image_hw + (3,), jnp.float32), optimizer
    )
    step_fn = jax.jit(make_yolo_train_step(model, optimizer, image_hw, pose=pose))
    rng = np.random.default_rng(seed)
    n = len(images)
    step = 0
    while step < steps:
        order = rng.permutation(n)
        for lo in range(0, n, batch):
            sel = order[lo : lo + batch]
            state, loss = step_fn(
                state, jnp.asarray(images[sel]), *[jnp.asarray(g[sel]) for g in gts]
            )
            step += 1
            if step >= steps:
                break
    return {"params": state.params, "batch_stats": state.batch_stats}, float(loss)


# ------------------------------------------------------------ evaluation


def _build_pipeline(det_vars, pose_vars, pose_size, ingest, n,
                    wire: int | None = None):
    import jax.numpy as jnp

    from padel_analytics_tpu.config import (
        BallTrackerConfig,
        PlayersTrackerConfig,
    )
    from padel_analytics_tpu.ops.polygon import PolygonZone
    from padel_analytics_tpu.trackers import (
        BallTracker,
        Keypoint,
        Keypoints,
        KeypointsTracker,
        PlayerKeypointsTracker,
        PlayerTracker,
    )
    from padel_analytics_tpu.trackers.fused import FusedPipeline
    from padel_analytics_tpu.utils.video import VideoInfo

    h, w = SRC_HW
    poly = np.array([[2, 2], [w - 2, 2], [w - 2, h - 2], [2, h - 2]])
    players = PlayerTracker(
        None, PolygonZone(poly, (w, h)),
        compute_dtype=jnp.float32,
        config=PlayersTrackerConfig(
            model_variant="n", batch_size=8, conf=0.25, imgsz=DET,
        ),
    )
    players.engine.variables = det_vars
    pose = PlayerKeypointsTracker(
        None, train_image_size=pose_size, batch_size=8, model_variant="n",
        compute_dtype=jnp.float32,
    )
    pose.engine.variables = pose_vars
    ball = BallTracker(
        None, None, compute_dtype=jnp.float32,
        config=BallTrackerConfig(height=48, width=80, batch_size=8,
                                 median_max_sample_num=8),
    )
    kps = [(w * x, h * y) for x, y in
           [(0.1, 0.9), (0.9, 0.9), (0.1, 0.7), (0.5, 0.7), (0.9, 0.7),
            (0.12, 0.5), (0.88, 0.5), (0.14, 0.3), (0.5, 0.3), (0.86, 0.3),
            (0.16, 0.15), (0.84, 0.15)]]
    court = KeypointsTracker(
        fixed_keypoints_detection=Keypoints(
            [Keypoint(id=i, xy=(float(x), float(y)))
             for i, (x, y) in enumerate(kps)]
        )
    )
    info = VideoInfo(width=w, height=h, fps=30.0, total_frames=n)
    for t in (players, pose, ball, court):
        t.video_info_post_init(info)
    return FusedPipeline(
        players, pose, ball, court, chunk=8, ingest=ingest,
        wire_long_side=WIRE if wire is None else wire,
    )


def _eval_outputs(results, gt_boxes, gt_kpts):
    """Match predictions to GT per frame; return detect/IoU/kpt metrics.

    Pose matching is GATED to the GT player's box (pose-set centroid
    inside the box dilated 25%): `pose_match_rate` is the RECALL metric
    (did a pose land on this player at all), `kpt_px` the PRECISION
    metric over matched sets only. Without the gate, a frame whose
    low-res pass detects only ONE player silently matches the other GT
    player to that distant pose set and reports the inter-player
    distance as 'keypoint error' — conflating recall loss with keypoint
    imprecision (exactly what the first cut of this demo did)."""
    n, m = gt_boxes.shape[:2]
    ious, kpt_err, found, pose_found = [], [], 0, 0
    for i in range(n):
        players = results["players"][i]
        preds = [(np.array(p.xyxy, np.float32)) for p in players]
        pose_sets = []
        for pk in results["players_keypoints"][i]:
            pts = np.array(
                [kp.xy for kp in pk.player_keypoints], np.float32
            )
            if pts.shape == (NK, 2):
                pose_sets.append(pts)
        for j in range(m):
            g = gt_boxes[i, j]
            best_iou = 0.0
            for b in preds:
                ix1, iy1 = max(g[0], b[0]), max(g[1], b[1])
                ix2, iy2 = min(g[2], b[2]), min(g[3], b[3])
                inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                union = ((g[2] - g[0]) * (g[3] - g[1])
                         + (b[2] - b[0]) * (b[3] - b[1]) - inter)
                best_iou = max(best_iou, inter / max(union, 1e-9))
            if best_iou >= 0.3:
                found += 1
                ious.append(best_iou)
            # keypoints: among pose sets whose centroid falls inside this
            # GT box (dilated 25% each side), take the best mean distance
            dx = 0.25 * (g[2] - g[0])
            dy = 0.25 * (g[3] - g[1])
            gk = gt_kpts[i, j]
            best_err = None
            for pts in pose_sets:
                cx, cy = pts.mean(axis=0)
                if not (g[0] - dx <= cx <= g[2] + dx
                        and g[1] - dy <= cy <= g[3] + dy):
                    continue
                err = float(np.hypot(*(pts - gk).T).mean())
                if best_err is None or err < best_err:
                    best_err = err
            if best_err is not None:
                pose_found += 1
                kpt_err.append(best_err)
    return {
        "detect_rate": found / (n * m),
        "mean_iou": float(np.mean(ious)) if ious else 0.0,
        "kpt_px": float(np.mean(kpt_err)) if kpt_err else float("inf"),
        "pose_match_rate": pose_found / (n * m),
    }


def run_demo(det_steps: int = 150, pose_steps: int = 200, n_frames: int = 48,
             n_train: int = 24, verbose: bool = True, force_cpu: bool = True,
             wire: int | None = None, pose_fast: int | None = None,
             wire_sweep: tuple[int, ...] = (), isolate: bool = False,
             scale: int = 1):
    """Train once, then evaluate the parity config and the fast config
    (and, with `wire_sweep`, the fast config at each extra wire setting —
    the round-5 wire sweep reuses one training run across {72, 80, 96} =
    {720, 800, 960}/10).

    `isolate=True` adds the two off-diagonal configs (derived ingest with
    pose@full, i420 ingest with pose@half) so the measured fast-vs-parity
    delta can be ATTRIBUTED to its two independent axes: the two-step
    wire resize vs the halved pose input resolution."""
    if force_cpu:
        _force_cpu()
    global WIRE
    _set_scale(scale)
    if wire is not None:
        WIRE = wire
    pf = POSE_FAST if pose_fast is None else pose_fast

    from padel_analytics_tpu.models.yolov8 import YOLOv8

    rng = np.random.default_rng(0)
    tr_frames, tr_boxes, tr_kpts = make_scene_clip(rng, n_train)
    ev_frames, ev_boxes, ev_kpts = make_scene_clip(rng, n_frames)

    # --- train det on reference-parity letterboxed views
    det_imgs, det_gtb, det_hw = _letterbox_train_views(tr_frames, tr_boxes)
    det_model = YOLOv8(variant="n", num_classes=1)
    labels = np.zeros(tr_boxes.shape[:2], np.int32)
    mask = np.ones(tr_boxes.shape[:2], bool)
    det_vars, det_loss = _train(
        det_model, det_imgs, det_steps, 8, 2e-3, det_hw, False,
        (labels, det_gtb, mask),
    )
    if verbose:
        print(f"det trained ({det_steps} steps, final loss {det_loss:.3f})",
              flush=True)

    # --- train pose multi-scale (squash views at 128/96/64), like real
    # checkpoints' scale augmentation — see _train_pose_multiscale
    pose_model = YOLOv8(variant="n", num_classes=1, num_keypoints=NK)
    pose_vars, pose_loss = _train_pose_multiscale(
        pose_model, tr_frames, tr_boxes, tr_kpts, pose_steps, 4, 2e-3,
    )
    if verbose:
        print(f"pose trained ({pose_steps} steps, final loss {pose_loss:.3f})",
              flush=True)

    # --- evaluate both configs through the real fused pipeline
    out = {}
    jobs = [
        ("parity", "i420", POSE_FULL, None),
        ("fast", "derived", pf, None),
    ]
    if isolate:
        jobs += [
            ("derived_fullpose", "derived", POSE_FULL, None),
            ("i420_halfpose", "i420", pf, None),
        ]
    jobs += [
        (f"fast_wire{wv}", "derived", pf, wv) for wv in wire_sweep
        if wv != WIRE
    ]
    for name, ingest, psize, wv in jobs:
        pipe = _build_pipeline(
            det_vars, pose_vars, psize, ingest, n_frames, wire=wv
        )
        results = pipe.run(iter([f for f in ev_frames]), n_frames)
        out[name] = _eval_outputs(results, ev_boxes, ev_kpts)
        if verbose:
            print(
                f"{name} (ingest={ingest}, pose@{psize}, "
                f"wire={WIRE if wv is None else wv}): {out[name]}",
                flush=True,
            )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--det-steps", type=int, default=150)
    ap.add_argument("--pose-steps", type=int, default=200)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--wire", type=int, default=None,
                    help="wire long side (default 96 = 960/10); sweep "
                    "with e.g. 72 (720/10), 80 (800/10)")
    ap.add_argument("--pose-fast", type=int, default=None)
    ap.add_argument("--wire-sweep", default="",
                    help="comma-separated extra wire settings evaluated "
                    "on the same trained models, e.g. 72,80")
    ap.add_argument("--isolate", action="store_true",
                    help="also evaluate the two off-diagonal configs "
                    "(derived+pose@full, i420+pose@half) to attribute "
                    "the fast-path delta to its two axes")
    ap.add_argument("--scale", type=int, default=1,
                    help="geometry multiplier: 1 = 1/10 production scale "
                    "(default), 2 = 1/5 — see _set_scale; --wire/"
                    "--wire-sweep values are in SCALED units")
    args = ap.parse_args()
    sweep = tuple(int(v) for v in args.wire_sweep.split(",") if v)
    run_demo(det_steps=args.det_steps, pose_steps=args.pose_steps,
             n_frames=args.frames, wire=args.wire, pose_fast=args.pose_fast,
             wire_sweep=sweep, isolate=args.isolate, scale=args.scale)
    return 0


if __name__ == "__main__":
    sys.exit(main())
