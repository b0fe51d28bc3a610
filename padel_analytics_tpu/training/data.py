"""Training data pipeline for TrackNet (reference dataset layout).

The reference trains from rally directories shaped like

    <match_dir>/frame/<rally_id>/<frame>.png      (decoded frames)
    <match_dir>/csv/<rally_id>_ball.csv           (Frame,X,Y,Visibility)
    <match_dir>/frame/<rally_id>/median.npz       (optional median)

(dataset.py's _gen_input_from_rally machinery). This module loads that
layout into device-ready batches: sliding windows of resized frames with
the median-concat channel stack and Gaussian-disc heatmap labels (both the
exact reference semantics via ops/ + training/tracknet.py), with optional
frame-mixup augmentation (training/augmentation.py). Everything heavy
(resize, labels, mixup) runs on device; the host only decodes images.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.median import median_background
from ..ops.resize import resize_plan
from .augmentation import frame_mixup
from .tracknet import gaussian_heatmap_labels


def load_image_bicubic01(
    path, hw: tuple[int, int]
) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode an image and apply the pipeline's PIL-parity preprocessing:
    cv2 imread -> RGB -> bicubic squash to (h, w) -> Pillow uint8 rounding
    -> [0, 1] float32. The ONE recipe shared by the YOLO/court training
    CLIs and the evaluation harness — train and eval must preprocess
    identically or reported metrics drift from deployed behavior.

    Returns (image01, (src_w, src_h)).
    """
    import cv2

    img = cv2.imread(str(path))
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    plan = resize_plan(img.shape[:2], hw, "pil_bicubic")
    out = np.asarray(plan.apply(jnp.asarray(img, jnp.float32)))
    img01 = np.clip(np.floor(out + 0.5), 0, 255).astype(np.float32) / 255.0
    return img01, (img.shape[1], img.shape[0])


@dataclass
class RallyClip:
    frames: np.ndarray  # (N, H, W, 3) uint8 at model resolution
    coords: np.ndarray  # (N, 2) float32 TRUNCATED ball coords, MODEL px
    visibility: np.ndarray  # (N,) float32
    median: np.ndarray  # (H, W, 3) uint8 at model resolution
    coords_src: np.ndarray = None  # (N, 2) float32 SOURCE-res coords


def load_rally(
    match_dir: str | Path,
    rally_id: str,
    height: int = 288,
    width: int = 512,
    img_format: str = "png",
) -> RallyClip:
    """Load one rally directory into a RallyClip."""
    import cv2

    match_dir = Path(match_dir)
    frame_dir = match_dir / "frame" / rally_id
    csv_path = match_dir / "csv" / f"{rally_id}_ball.csv"

    rows = []
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            rows.append(row)
    rows.sort(key=lambda r: int(r["Frame"]))

    raw_frames = []
    coords = []
    vis = []
    src_hw = None
    for row in rows:
        img = cv2.imread(str(frame_dir / f"{row['Frame']}.{img_format}"))
        if img is None:
            raise FileNotFoundError(frame_dir / f"{row['Frame']}.{img_format}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        src_hw = img.shape[:2]
        raw_frames.append(img)
        coords.append((float(row["X"]), float(row["Y"])))
        vis.append(float(row["Visibility"]))

    median_path = frame_dir / "median.npz"
    if median_path.exists():
        median_full = np.load(median_path)["median"].astype(np.uint8)
    else:
        median_full = median_background(np.stack(raw_frames))

    plan = resize_plan(src_hw, (height, width), "pil_bicubic")
    stacked = jnp.asarray(np.stack(raw_frames))
    resized = np.clip(
        np.floor(np.asarray(plan.apply(stacked)) + 0.5), 0, 255
    ).astype(np.uint8)
    med = np.clip(
        np.floor(
            np.asarray(plan.apply(jnp.asarray(median_full.astype(np.float32)))) + 0.5
        ),
        0,
        255,
    ).astype(np.uint8)

    scale = np.array([width / src_hw[1], height / src_hw[0]], np.float32)
    coords_src = np.asarray(coords, np.float32)
    # Reference label centers are int-TRUNCATED model coords
    # (dataset.py:547,587: int(coor / scaler)); float centers shift the
    # disc boundary by up to a pixel.
    coords = np.trunc(coords_src * scale).astype(np.float32)
    vis_arr = np.asarray(vis, np.float32)
    coords[vis_arr == 0] = 0.0  # absent balls are (0, 0) like the reference
    coords_src[vis_arr == 0] = 0.0
    return RallyClip(
        frames=resized, coords=coords, visibility=vis_arr, median=med,
        coords_src=coords_src,
    )


@dataclass
class InpaintRally:
    """One rally's coordinate-trajectory training data (the reference's
    'coordinate' data mode, dataset.py:304-358 + 387-429): TrackNet
    predictions with ground truth and an inpaint mask, in SOURCE pixels."""

    coords_pred: np.ndarray  # (N, 2) float32, source px
    coords_gt: np.ndarray  # (N, 2) float32, source px
    vis_pred: np.ndarray  # (N,) float32
    vis_gt: np.ndarray  # (N,) float32
    inpaint_mask: np.ndarray  # (N,) float32, 1 = region to inpaint
    img_wh: tuple[int, int]  # (w, h) source resolution


def load_inpaint_rally(
    match_dir: str | Path,
    rally_id: str,
    img_wh: Optional[tuple[int, int]] = None,
    img_format: str = "png",
) -> InpaintRally:
    """Load one rally's predicted-trajectory CSV
    (<match_dir>/predicted_csv/<rally_id>_ball.csv with columns
    Frame,X,Y,Visibility,X_GT,Y_GT,Visibility_GT,Inpaint_Mask — the layout
    the reference's coordinate mode reads at dataset.py:306-312).

    `img_wh` defaults to the first frame image's size when frames exist.
    """
    import cv2

    match_dir = Path(match_dir)
    csv_path = match_dir / "predicted_csv" / f"{rally_id}_ball.csv"
    rows = []
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            rows.append(row)
    rows.sort(key=lambda r: int(r["Frame"]))

    def col(name, default=None):
        out = []
        for r in rows:
            v = r.get(name, "")
            out.append(float(v) if v not in ("", None) else default)
        return np.asarray(out, np.float32)

    coords_pred = np.stack([col("X"), col("Y")], axis=-1)
    coords_gt = np.stack(
        [col("X_GT", 0.0), col("Y_GT", 0.0)], axis=-1
    )
    vis_pred = col("Visibility", 0.0)
    vis_gt = col("Visibility_GT", 0.0)
    mask = col("Inpaint_Mask", 0.0)

    if img_wh is None:
        frame_dir = match_dir / "frame" / rally_id
        probe = frame_dir / f"{rows[0]['Frame']}.{img_format}"
        img = cv2.imread(str(probe))
        if img is None:
            raise ValueError(
                f"pass img_wh: no frame image at {probe} to infer it from"
            )
        img_wh = (img.shape[1], img.shape[0])
    return InpaintRally(
        coords_pred=coords_pred,
        coords_gt=coords_gt,
        vis_pred=vis_pred,
        vis_gt=vis_gt,
        inpaint_mask=mask,
        img_wh=img_wh,
    )


def synthesize_inpaint_rally(
    coords_gt: np.ndarray,  # (N, 2) source px
    vis_gt: np.ndarray,  # (N,)
    img_wh: tuple[int, int],
    rng: np.random.Generator,
    gap_rate: float = 0.08,
    max_gap: int = 12,
    jitter_px: float = 1.5,
) -> InpaintRally:
    """Build InpaintNet training data from ground truth alone by
    synthesizing drop-out gaps: random spans are zeroed (as a failed
    TrackNet detection would be) and flagged in the inpaint mask; kept
    detections get sub-pixel jitter to mimic TrackNet noise. Lets the
    InpaintNet CLI train without a predicted_csv (which needs a full
    TrackNet inference sweep the reference performs offline)."""
    n = len(vis_gt)
    coords_pred = coords_gt.astype(np.float32).copy()
    coords_pred += rng.normal(0.0, jitter_px, coords_pred.shape).astype(np.float32)
    vis_pred = vis_gt.astype(np.float32).copy()
    mask = np.zeros(n, np.float32)
    i = 0
    while i < n:
        if vis_gt[i] > 0 and rng.random() < gap_rate:
            gap = int(rng.integers(1, max_gap + 1))
            j = min(n, i + gap)
            mask[i:j] = 1.0
            coords_pred[i:j] = 0.0
            vis_pred[i:j] = 0.0
            i = j
        else:
            i += 1
    coords_pred[vis_gt == 0] = 0.0
    return InpaintRally(
        coords_pred=coords_pred,
        coords_gt=coords_gt.astype(np.float32),
        vis_pred=vis_pred,
        vis_gt=vis_gt.astype(np.float32),
        inpaint_mask=mask,
        img_wh=img_wh,
    )


def coordinate_window_batches(
    rally: InpaintRally,
    seq_len: int = 16,
    batch_size: int = 8,
    rng: Optional[np.random.Generator] = None,
    sliding_step: int = 1,
) -> Iterator[tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Yield (coords (B, L, 2), mask (B, L, 1), target (B, L, 2)) batches
    of stride-`sliding_step` coordinate windows normalized by the SOURCE
    dims (dataset.py:497-501), shuffled. Windows with nothing to inpaint
    still appear (they supervise the identity path)."""
    n = rally.coords_pred.shape[0]
    num_windows = (n - seq_len) // sliding_step + 1
    if num_windows <= 0:
        return
    rng = rng or np.random.default_rng(0)
    w, h = rally.img_wh
    scale = np.asarray([w, h], np.float32)
    starts = np.arange(num_windows) * sliding_step
    order = rng.permutation(num_windows)

    for lo in range(0, num_windows - batch_size + 1, batch_size):
        sel = starts[order[lo : lo + batch_size]]
        idx = sel[:, None] + np.arange(seq_len)[None, :]
        coords = rally.coords_pred[idx] / scale
        target = rally.coords_gt[idx] / scale
        mask = rally.inpaint_mask[idx][..., None]
        yield (
            jnp.asarray(coords),
            jnp.asarray(mask.astype(np.float32)),
            jnp.asarray(target),
        )


def window_batches(
    clip: RallyClip,
    seq_len: int = 8,
    batch_size: int = 8,
    rng: Optional[np.random.Generator] = None,
    mixup_alpha: float = 0.0,
    jax_rng: Optional[jax.Array] = None,
    sigma: float = 2.5,
) -> Iterator[tuple[jnp.ndarray, jnp.ndarray]]:
    """Yield (x (B, H, W, (L+1)*3), labels (B, H, W, L)) training batches
    of stride-1 windows, shuffled, with optional frame-mixup."""
    n = clip.frames.shape[0]
    h, w = clip.frames.shape[1:3]
    num_windows = n - seq_len + 1
    if num_windows <= 0:
        return
    rng = rng or np.random.default_rng(0)
    order = rng.permutation(num_windows)
    med = jnp.asarray(clip.median.astype(np.float32))
    key = jax_rng if jax_rng is not None else jax.random.PRNGKey(0)

    for lo in range(0, num_windows - batch_size + 1, batch_size):
        starts = order[lo : lo + batch_size]
        idx = starts[:, None] + np.arange(seq_len)[None, :]
        frames = jnp.asarray(clip.frames[idx].astype(np.float32))  # (B,L,H,W,3)
        coords = jnp.asarray(clip.coords[idx])
        vis = jnp.asarray(clip.visibility[idx])

        if mixup_alpha > 0:
            src = clip.coords_src if clip.coords_src is not None else clip.coords
            coords_src = jnp.asarray(src[idx])
            key, *subkeys = jax.random.split(key, batch_size + 1)
            outs = [
                frame_mixup(
                    subkeys[i], frames[i], coords[i], vis[i], h, w,
                    sigma=sigma, alpha=mixup_alpha,
                    coords_src=coords_src[i],
                )
                for i in range(batch_size)
            ]
            frames = jnp.stack([o[0] for o in outs])
            heat = jnp.stack([o[1] for o in outs])
        else:
            heat = jax.vmap(
                lambda c: gaussian_heatmap_labels(c, h, w, sigma)
            )(coords)  # (B, L, H, W)
            heat = heat * vis[..., None, None]

        med_b = jnp.broadcast_to(med[None], (batch_size, h, w, 3))
        parts = [med_b] + [frames[:, j] for j in range(seq_len)]
        x = jnp.concatenate(parts, axis=-1) / 255.0
        labels = jnp.transpose(heat, (0, 2, 3, 1))  # (B, H, W, L)
        yield x, labels
