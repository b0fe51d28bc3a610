"""YOLOv8 detection and pose models in Flax (NHWC, anchor-free, DFL head).

The reference drives ultralytics YOLO as a black box for three trackers
(players detection: players_tracker.py:351-359; player pose:
players_keypoints_tracker.py:285-292; court keypoints in 'yolo' mode:
keypoints_tracker.py:238-245). This is a from-scratch JAX implementation
of the YOLOv8 architecture family (CSP backbone with C2f blocks, SPPF,
PAN neck, decoupled DFL detect head, optional pose head) with the decode
math ultralytics applies after the forward pass — distribution-focal box
expectation, stride-anchored offsets, pose keypoint (2x + anchor - 0.5) *
stride mapping — implemented as fused jnp so raw images in, decoded
(boxes, scores, keypoints) out, all inside one XLA program.

Variant table matches the published depth/width/max-channel multipliers so
converted ultralytics checkpoints load 1:1 (models/convert.py).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import ConvBN

# name -> (depth_mult, width_mult, max_channels)
YOLOV8_VARIANTS = {
    "n": (0.34, 0.25, 1024),
    "s": (0.34, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}

_BASE_CHANNELS = (64, 128, 256, 512, 1024)
_BASE_DEPTHS = (3, 6, 6, 3)
REG_MAX = 16


def _scale_ch(c: int, width: float, max_ch: int) -> int:
    return int(math.ceil(min(c, max_ch) * width / 8) * 8)


def _scale_d(n: int, depth: float) -> int:
    return max(round(n * depth), 1)


class YoloConv(ConvBN):
    """ultralytics Conv: conv + BN(eps 1e-3) + SiLU."""

    act: Any = nn.silu
    bn_eps: float = 1e-3
    bn_momentum: float = 0.97


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = YoloConv(self.features, (3, 3), dtype=self.dtype,
                     use_pallas=self.use_pallas, name="cv1")(x, train)
        y = YoloConv(self.features, (3, 3), dtype=self.dtype,
                     use_pallas=self.use_pallas, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks."""

    features: int
    n: int = 1
    shortcut: bool = False
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y = YoloConv(2 * c, (1, 1), dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(c, self.shortcut, dtype=self.dtype,
                           use_pallas=self.use_pallas, name=f"m_{i}")(
                    parts[-1], train
                )
            )
        y = jnp.concatenate(parts, axis=-1)
        return YoloConv(self.features, (1, 1), dtype=self.dtype, name="cv2")(y, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 max-pools."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        x = YoloConv(c, (1, 1), dtype=self.dtype, name="cv1")(x, train)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding="SAME")
        x = jnp.concatenate([x, p1, p2, p3], axis=-1)
        return YoloConv(self.features, (1, 1), dtype=self.dtype, name="cv2")(x, train)


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def dfl_decode(
    box_logits: jnp.ndarray,  # (B, A, 4, REG_MAX)
    ax: jnp.ndarray,  # (A,) anchor centers in cells (x + 0.5)
    ay: jnp.ndarray,  # (A,)
    stride: float,
) -> jnp.ndarray:
    """Distribution-focal box decode (ultralytics DFL): per-side softmax
    expectation over REG_MAX bins -> (l, t, r, b) cell distances ->
    stride-scaled xyxy."""
    dist = jnp.sum(
        jax.nn.softmax(box_logits.astype(jnp.float32), axis=-1)
        * jnp.arange(box_logits.shape[-1], dtype=jnp.float32),
        axis=-1,
    )
    x1 = (ax[None] - dist[..., 0]) * stride
    y1 = (ay[None] - dist[..., 1]) * stride
    x2 = (ax[None] + dist[..., 2]) * stride
    y2 = (ay[None] + dist[..., 3]) * stride
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def pose_decode(
    kpt_raw: jnp.ndarray,  # (B, A, K, 3)
    ax: jnp.ndarray,  # (A,)
    ay: jnp.ndarray,  # (A,)
    stride: float,
) -> jnp.ndarray:
    """Pose keypoint decode (ultralytics kpts_decode):
    xy = (pred * 2 + anchor - 0.5) * stride; conf = sigmoid."""
    kpt_raw = kpt_raw.astype(jnp.float32)
    kx = (kpt_raw[..., 0] * 2.0 + (ax[None, :, None] - 0.5)) * stride
    ky = (kpt_raw[..., 1] * 2.0 + (ay[None, :, None] - 0.5)) * stride
    kc = jax.nn.sigmoid(kpt_raw[..., 2])
    return jnp.stack([kx, ky, kc], axis=-1)


class _HeadBranch(nn.Module):
    """Two 3x3 convs + a 1x1 projection (one detect-head branch)."""

    mid: int
    out: int
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = YoloConv(self.mid, (3, 3), dtype=self.dtype,
                     use_pallas=self.use_pallas, name="c0")(x, train)
        x = YoloConv(self.mid, (3, 3), dtype=self.dtype,
                     use_pallas=self.use_pallas, name="c1")(x, train)
        return nn.Conv(self.out, (1, 1), dtype=self.dtype, name="proj")(x)


class YOLOv8(nn.Module):
    """YOLOv8 detect (+ optional pose) model.

    __call__(images) -> dict with:
      boxes  (B, A, 4) xyxy in input pixels
      scores (B, A, nc) sigmoid class scores
      kpts   (B, A, K, 3) decoded keypoints (if num_keypoints)
    where A = sum over the 3 output scales of H/s * W/s, s in (8, 16, 32).
    Input: (B, H, W, 3) float in [0, 1] (ultralytics divides by 255).
    """

    variant: str = "m"
    num_classes: int = 1
    num_keypoints: int = 0  # 13 for player pose, 12 for court keypoints
    dtype: Any = jnp.float32
    use_pallas: bool = False  # Pallas fast path for stride-1 3x3 ConvBNs

    @nn.compact
    def __call__(self, images, train: bool = False, raw: bool = False):
        depth, width, max_ch = YOLOV8_VARIANTS[self.variant]
        chs = [_scale_ch(c, width, max_ch) for c in _BASE_CHANNELS]
        ns = [_scale_d(n, depth) for n in _BASE_DEPTHS]
        dt = self.dtype
        up = self.use_pallas

        x = images.astype(dt)

        # ---- backbone ----
        x = YoloConv(chs[0], (3, 3), (2, 2), dtype=dt, name="stem")(x, train)  # P1
        x = YoloConv(chs[1], (3, 3), (2, 2), dtype=dt, name="down1")(x, train)
        x = C2f(chs[1], ns[0], True, dtype=dt, use_pallas=up, name="c2f_1")(x, train)  # P2
        x = YoloConv(chs[2], (3, 3), (2, 2), dtype=dt, name="down2")(x, train)
        p3 = C2f(chs[2], ns[1], True, dtype=dt, use_pallas=up, name="c2f_2")(x, train)  # P3 /8
        x = YoloConv(chs[3], (3, 3), (2, 2), dtype=dt, name="down3")(p3, train)
        p4 = C2f(chs[3], ns[2], True, dtype=dt, use_pallas=up, name="c2f_3")(x, train)  # P4 /16
        x = YoloConv(chs[4], (3, 3), (2, 2), dtype=dt, name="down4")(p4, train)
        x = C2f(chs[4], ns[3], True, dtype=dt, use_pallas=up, name="c2f_4")(x, train)
        p5 = SPPF(chs[4], dtype=dt, name="sppf")(x, train)  # P5 /32

        # ---- PAN neck ----
        x = jnp.concatenate([_upsample2x(p5), p4], axis=-1)
        t1 = C2f(chs[3], ns[0], False, dtype=dt, use_pallas=up, name="neck_c2f_1")(x, train)
        x = jnp.concatenate([_upsample2x(t1), p3], axis=-1)
        n3 = C2f(chs[2], ns[0], False, dtype=dt, use_pallas=up, name="neck_c2f_2")(x, train)  # /8
        x = YoloConv(chs[2], (3, 3), (2, 2), dtype=dt, name="neck_down1")(n3, train)
        x = jnp.concatenate([x, t1], axis=-1)
        n4 = C2f(chs[3], ns[0], False, dtype=dt, use_pallas=up, name="neck_c2f_3")(x, train)  # /16
        x = YoloConv(chs[3], (3, 3), (2, 2), dtype=dt, name="neck_down2")(n4, train)
        x = jnp.concatenate([x, p5], axis=-1)
        n5 = C2f(chs[4], ns[0], False, dtype=dt, use_pallas=up, name="neck_c2f_4")(x, train)  # /32

        # ---- heads ----
        feats = [n3, n4, n5]
        strides = (8, 16, 32)
        c2 = max(16, chs[2] // 4, REG_MAX * 4)
        c3 = max(chs[2], min(self.num_classes, 100))
        nk = self.num_keypoints * 3
        c4 = max(chs[2] // 4, nk) if nk else 0

        all_boxes, all_scores, all_kpts = [], [], []
        all_box_logits, all_cls_logits, all_kpt_raw = [], [], []
        for i, (f, stride) in enumerate(zip(feats, strides)):
            b, h, w, _ = f.shape
            box = _HeadBranch(c2, 4 * REG_MAX, dtype=dt, use_pallas=up, name=f"box_{i}")(f, train)
            cls = _HeadBranch(c3, self.num_classes, dtype=dt, use_pallas=up, name=f"cls_{i}")(
                f, train
            )
            # Anchor centers in feature cells (+0.5), scaled by stride later.
            ax = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5).reshape(-1)
            ay = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5).reshape(-1)

            box = box.reshape(b, h * w, 4, REG_MAX)
            cls = cls.reshape(b, h * w, self.num_classes)
            all_boxes.append(dfl_decode(box, ax, ay, stride))
            all_scores.append(jax.nn.sigmoid(cls.astype(jnp.float32)))
            if raw:
                all_box_logits.append(box.astype(jnp.float32))
                all_cls_logits.append(cls.astype(jnp.float32))

            if nk:
                kpt = _HeadBranch(c4, nk, dtype=dt, use_pallas=up, name=f"kpt_{i}")(f, train)
                kpt = kpt.reshape(b, h * w, self.num_keypoints, 3)
                all_kpts.append(pose_decode(kpt, ax, ay, stride))
                if raw:
                    all_kpt_raw.append(kpt.astype(jnp.float32))

        out = {
            "boxes": jnp.concatenate(all_boxes, axis=1),
            "scores": jnp.concatenate(all_scores, axis=1),
        }
        if nk:
            out["kpts"] = jnp.concatenate(all_kpts, axis=1)
        if raw:
            # Training-time head outputs (training/yolo.py): DFL bin logits,
            # pre-sigmoid class logits, raw keypoint offsets.
            out["box_logits"] = jnp.concatenate(all_box_logits, axis=1)
            out["cls_logits"] = jnp.concatenate(all_cls_logits, axis=1)
            if nk:
                out["kpt_raw"] = jnp.concatenate(all_kpt_raw, axis=1)
        return out


def num_anchors(h: int, w: int) -> int:
    """Total anchors for an (h, w) input across strides 8/16/32."""
    return sum((h // s) * (w // s) for s in (8, 16, 32))


def anchor_table(h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-anchor (centers (A, 2) in CELLS (+0.5), strides (A,)) matching
    the head's anchor layout — the training loss decodes/encodes boxes
    against these (training/yolo.py)."""
    centers, strides = [], []
    for s in (8, 16, 32):
        gh, gw = h // s, w // s
        yy, xx = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        centers.append(
            np.stack([xx.reshape(-1) + 0.5, yy.reshape(-1) + 0.5], axis=-1)
        )
        strides.append(np.full(gh * gw, s, np.float32))
    return (
        np.concatenate(centers).astype(np.float32),
        np.concatenate(strides).astype(np.float32),
    )
