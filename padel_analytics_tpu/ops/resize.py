"""Image resampling as matrix multiplication — the TPU-native resize.

The reference resizes every frame on the host with PIL
(players_keypoints_tracker.py:260-266, keypoints_tracker.py:190-194,
ball_tracker/iterable.py:167-199) or lets ultralytics letterbox with
cv2.resize. On TPU the right formulation is *separable resampling as two
matmuls*: a resize from (H, W) to (H', W') is

    out = R_h @ img @ R_w^T        (per channel)

where R_h (H'xH) and R_w (W'xW) are precomputed interpolation-weight
matrices. Both matmuls map straight onto the MXU, fuse with the /255
normalization and dtype cast, and batch over frames — so "preprocessing"
is just part of the compiled forward graph instead of a per-frame PIL hot
loop.

The matrices are banded (a bicubic row has ~4*max(scale,1) taps,
cv2-linear exactly 2), so `apply` can run a pass in *block-banded* form:
the dst axis is tiled into 128-row blocks and each block matmuls only the
contiguous src band holding its taps — identical per-row products
(byte-exact vs Pillow at f64, tests/test_ops_resize.py), up to ~10x fewer
MACs at production shapes. The v5e A/B (tools/resize_probe.py,
RTT-subtracted) shows the block form only pays off above ~5x MAC savings
(the pose squash 1080p->1280^2 passes); below that the dense matmul's
better tile amortization wins, so `apply` gates per pass on the measured
threshold. Still all MXU matmuls either way: no gathers, static shapes.

Weight construction reproduces each source library's semantics:

- `pil_resample_matrix`: Pillow's convolution resampling (triangle/bicubic
  kernel, support scaled by the downscale factor => antialiasing, edge
  clamping via weight renormalization). Matches PIL.Image.resize, whose
  default filter is BICUBIC.
- `cv2_bilinear_matrix`: OpenCV INTER_LINEAR (no antialias, half-pixel
  centers, edge clamp) as used by ultralytics' LetterBox.

Pillow quantizes the intermediate image to uint8 between the horizontal
and the vertical pass; `ResizePlan.apply(..., quantize_intermediate=True)`
reproduces that for byte-level parity.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def _pil_filter(name: str):
    """Pillow filter kernels (Resample.c)."""
    if name == "bilinear":
        support = 1.0

        def f(x):
            x = np.abs(x)
            return np.where(x < 1.0, 1.0 - x, 0.0)

    elif name == "bicubic":
        support = 2.0
        a = -0.5

        def f(x):
            x = np.abs(x)
            return np.where(
                x < 1.0,
                ((a + 2.0) * x - (a + 3.0)) * x * x + 1,
                np.where(x < 2.0, (((x - 5) * x + 8) * x - 4) * a, 0.0),
            )

    elif name == "nearest":
        support = 0.5

        def f(x):
            return np.where((x >= -0.5) & (x < 0.5), 1.0, 0.0)

    elif name == "lanczos":
        support = 3.0

        def f(x):
            x = np.asarray(x, dtype=np.float64)
            out = np.sinc(x) * np.sinc(x / 3.0)
            return np.where(np.abs(x) < 3.0, out, 0.0)

    else:
        raise ValueError(f"unknown PIL filter {name!r}")
    return f, support


# Pillow quantizes resampling coefficients to 2^-22 fixed point
# (PRECISION_BITS in Resample.c). Quantizing our float weights to the same
# grid makes the float64 apply path byte-exact vs Pillow; the grid values
# are exactly representable in float32 too (<= 24 mantissa bits), so the
# TPU bfloat16/float32 path stays within 1 intensity step.
_PIL_PRECISION_BITS = 32 - 8 - 2


def pil_resample_matrix(src: int, dst: int, filter: str = "bicubic") -> np.ndarray:
    """(dst, src) weight matrix reproducing Pillow's 1-D resampling pass
    (precompute_coeffs in Pillow's Resample.c), antialias included."""
    f, support = _pil_filter(filter)
    scale = src / dst
    filterscale = max(scale, 1.0)
    support = support * filterscale

    rows = np.zeros((dst, src), dtype=np.float64)
    one = 1 << _PIL_PRECISION_BITS
    for i in range(dst):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), src)
        xs = np.arange(xmin, xmax)
        w = f((xs + 0.5 - center) / filterscale)
        ssum = w.sum()
        if ssum != 0:
            w = w / ssum
        # normalize_coeffs_8bpc: round-half-away-from-zero to fixed point.
        w = np.where(w < 0, np.ceil(w * one - 0.5), np.floor(w * one + 0.5)) / one
        rows[i, xmin:xmax] = w
    return rows


def cv2_bilinear_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) weight matrix reproducing cv2.resize INTER_LINEAR
    (half-pixel centers, 2-tap triangle, edge clamp, no antialias)."""
    rows = np.zeros((dst, src), dtype=np.float64)
    scale = src / dst
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        x0 = int(math.floor(x))
        frac = x - x0
        a = np.clip(x0, 0, src - 1)
        b = np.clip(x0 + 1, 0, src - 1)
        rows[i, a] += 1.0 - frac
        rows[i, b] += frac
    return rows.astype(np.float32)


def _band_plan(R: np.ndarray, tile: int):
    """Tile the dst axis of a (dst, src) resample matrix into blocks of
    `tile` rows and extract, per block, the contiguous src band that holds
    every nonzero tap of its rows.

    Resample matrices are banded (bicubic: ~4*max(scale,1) taps/row;
    cv2-linear: 2), so each block only ever reads a window of
    ~tile*scale + taps source pixels. Returns (starts, W, n_tiles, B):
    `W[t]` is the (tile, B) dense sub-matrix such that
    ``out[t*tile:(t+1)*tile] = W[t] @ x[starts[t]:starts[t]+B]`` exactly
    reproduces the full matmul's per-row products (all nonzeros of every
    row lie inside its block's window; the padding columns are zero).
    """
    dst, src = R.shape
    nz = R != 0.0
    any_nz = nz.any(axis=1)
    lo = np.where(any_nz, nz.argmax(axis=1), 0)
    hi = np.where(any_nz, src - nz[:, ::-1].argmax(axis=1), 1)
    n_tiles = -(-dst // tile)
    starts, widths = [], []
    for t in range(n_tiles):
        r0, r1 = t * tile, min((t + 1) * tile, dst)
        s, e = int(lo[r0:r1].min()), int(hi[r0:r1].max())
        starts.append(s)
        widths.append(e - s)
    # Uniform band width, 8-sublane aligned, clamped to src.
    B = min(src, -(-max(widths) // 8) * 8)
    starts = [max(0, min(s, src - B)) for s in starts]
    W = np.zeros((n_tiles, tile, B), dtype=R.dtype)
    for t, s in enumerate(starts):
        r0, r1 = t * tile, min((t + 1) * tile, dst)
        W[t, : r1 - r0, :] = R[r0:r1, s : s + B]
    return np.asarray(starts), W, n_tiles, B


@dataclass(frozen=True)
class ResizePlan:
    """Precomputed separable resize; `apply` runs on device as matmuls."""

    r_h: np.ndarray  # (dst_h, src_h)
    r_w: np.ndarray  # (dst_w, src_w)
    quantize_intermediate: bool = False

    @property
    def dst_hw(self) -> tuple[int, int]:
        return (self.r_h.shape[0], self.r_w.shape[0])

    @property
    def src_hw(self) -> tuple[int, int]:
        return (self.r_h.shape[1], self.r_w.shape[1])

    def _pass(
        self, x, R: np.ndarray, axis: int, dtype, prec, banded, tile,
        min_ratio: float = 5.0,
    ):
        """One separable resampling pass contracting `axis` (-2 = W,
        -3 = H) of a (..., H, W, C) stack against the (dst, src) matrix.

        banded=True runs the block-banded form: the dst axis is tiled and
        each tile matmuls only its source band — identical per-row tap
        products, 5-10x fewer MACs than the dense matmul at production
        scales (e.g. 1920->1280 bicubic reads a 256-wide band per
        128-row tile instead of all 1920 columns). Dense is kept for
        small shapes where the band covers most of src anyway.
        """
        import jax

        dst, src = R.shape
        if banded:
            starts, W, n_tiles, B = _band_plan(R, tile)
            # Only worth it at a large per-pass MAC ratio: the v5e A/B
            # (tools/resize_probe.py, RTT-subtracted) shows the block form
            # wins at ~9x fewer MACs (pose squash passes) but loses to the
            # dense matmul below ~5x — small tile matmuls amortize worse.
            if dst * src > min_ratio * (B * n_tiles * tile) and n_tiles > 1:
                bands = jnp.stack(
                    [
                        jax.lax.slice_in_dim(x, int(s), int(s) + B, axis=axis)
                        for s in starts
                    ],
                    axis=0,
                )
                Wt = jnp.asarray(W, dtype=dtype)
                if axis == -2:
                    out = jnp.einsum(
                        "n...bc,ntb->n...tc", bands, Wt, precision=prec
                    )
                    out = jnp.moveaxis(out, 0, -3)
                    out = out.reshape(*out.shape[:-3], n_tiles * tile, out.shape[-1])
                    return jax.lax.slice_in_dim(out, 0, dst, axis=-2)
                else:  # axis == -3
                    out = jnp.einsum(
                        "n...bwc,ntb->n...twc", bands, Wt, precision=prec
                    )
                    out = jnp.moveaxis(out, 0, -4)
                    out = out.reshape(
                        *out.shape[:-4], n_tiles * tile, *out.shape[-2:]
                    )
                    return jax.lax.slice_in_dim(out, 0, dst, axis=-3)
        Rd = jnp.asarray(R, dtype=dtype)
        if axis == -2:
            return jnp.einsum("...hwc,pw->...hpc", x, Rd, precision=prec)
        return jnp.einsum("...hwc,oh->...owc", x, Rd, precision=prec)

    def apply(
        self,
        images: jnp.ndarray,
        dtype=jnp.float32,
        banded: bool = True,
        tile: int = 128,
        min_ratio: float = 5.0,
    ) -> jnp.ndarray:
        """Resize a (..., H, W, C) image stack.

        Horizontal pass then vertical pass (Pillow's order), optionally
        quantizing the intermediate to uint8 like Pillow's 8-bit path.
        `banded` (default on) uses the block-banded matmul form for any
        pass whose dense/banded MAC ratio clears `min_ratio` — exact same
        per-row tap products, a fraction of the dense MACs (the pose
        squash passes at ~9x; small-ratio passes stay dense, which the
        v5e A/B measured as faster).
        """
        import jax

        x = images.astype(dtype)
        # Precision HIGH: the TPU's default f32 matmul is a single bf16
        # pass (~8 mantissa bits -> up to 2 intensity steps off Pillow,
        # measured on chip — tools/chip_check.py); HIGH (3-pass bf16)
        # restores the CPU-f32 <=1-step parity at half the cost of
        # HIGHEST. CPU/GPU backends ignore it.
        prec = jax.lax.Precision.HIGH
        # Horizontal: contract W. (..., H, W, C) x (W', W) -> (..., H, W', C)
        x = self._pass(x, self.r_w, -2, dtype, prec, banded, tile, min_ratio)
        if self.quantize_intermediate:
            # Pillow's clip8: round half UP, clamp to uint8.
            x = jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)
        # Vertical: contract H. (..., H, W', C) x (H', H) -> (..., H', W', C)
        x = self._pass(x, self.r_h, -3, dtype, prec, banded, tile, min_ratio)
        return x


@functools.lru_cache(maxsize=64)
def resize_plan(
    src_hw: tuple[int, int],
    dst_hw: tuple[int, int],
    method: str = "pil_bicubic",
) -> ResizePlan:
    """Build (and cache) a ResizePlan.

    method: 'pil_bicubic' | 'pil_bilinear' | 'pil_nearest' | 'pil_lanczos'
            | 'cv2_linear'
    """
    sh, sw = src_hw
    dh, dw = dst_hw
    if method.startswith("pil_"):
        filt = method[len("pil_") :]
        return ResizePlan(
            r_h=pil_resample_matrix(sh, dh, filt),
            r_w=pil_resample_matrix(sw, dw, filt),
            quantize_intermediate=True,
        )
    if method == "cv2_linear":
        return ResizePlan(
            r_h=cv2_bilinear_matrix(sh, dh),
            r_w=cv2_bilinear_matrix(sw, dw),
            quantize_intermediate=False,
        )
    raise ValueError(f"unknown resize method {method!r}")


@dataclass(frozen=True)
class LetterboxPlan:
    """Ultralytics-style letterbox: aspect-preserving cv2-linear resize plus
    constant padding to a stride-aligned canvas (value 114).

    Reproduces ultralytics LetterBox(auto=True, stride=32) as invoked by
    YOLO.predict on a batch of same-sized frames — the resize hidden inside
    the reference's players tracker (players_tracker.py:351-359)."""

    plan: ResizePlan
    pad_top: int
    pad_left: int
    out_h: int
    out_w: int
    gain: float  # scale from source to resized (r)

    def apply(self, images: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
        resized = self.plan.apply(images, dtype=dtype)
        new_h, new_w = self.plan.dst_hw
        pad_bottom = self.out_h - new_h - self.pad_top
        pad_right = self.out_w - new_w - self.pad_left
        pad_width = [(0, 0)] * (resized.ndim - 3) + [
            (self.pad_top, pad_bottom),
            (self.pad_left, pad_right),
            (0, 0),
        ]
        return jnp.pad(resized, pad_width, constant_values=114.0)

    def boxes_to_source(self, boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
        """Map boxes from letterboxed coords back to source pixels."""
        pad = jnp.array(
            [self.pad_left, self.pad_top, self.pad_left, self.pad_top],
            dtype=boxes_xyxy.dtype,
        )
        return (boxes_xyxy - pad) / self.gain

    def points_to_source(self, points_xy: jnp.ndarray) -> jnp.ndarray:
        pad = jnp.array([self.pad_left, self.pad_top], dtype=points_xy.dtype)
        return (points_xy - pad) / self.gain


@functools.lru_cache(maxsize=16)
def letterbox_plan(
    src_hw: tuple[int, int],
    imgsz: int,
    stride: int = 32,
    auto: bool = True,
) -> LetterboxPlan:
    """Plan an ultralytics letterbox from (h, w) to imgsz."""
    h, w = src_hw
    r = min(imgsz / h, imgsz / w)
    new_w, new_h = round(w * r), round(h * r)
    if auto:
        out_w = math.ceil(new_w / stride) * stride
        out_h = math.ceil(new_h / stride) * stride
    else:
        out_w = out_h = imgsz
    dw, dh = (out_w - new_w) / 2, (out_h - new_h) / 2
    pad_left, pad_top = int(round(dw - 0.1)), int(round(dh - 0.1))
    return LetterboxPlan(
        plan=resize_plan((h, w), (new_h, new_w), "cv2_linear"),
        pad_top=pad_top,
        pad_left=pad_left,
        out_h=out_h,
        out_w=out_w,
        gain=r,
    )
