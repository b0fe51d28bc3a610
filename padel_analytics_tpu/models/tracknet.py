"""TrackNet (ball heatmap U-Net) and InpaintNet (trajectory gap-filler).

Architecture parity with /root/reference/trackers/ball_tracker/models.py:
- TrackNet (models.py:45-74): VGG-style U-Net — down blocks 64/128/256,
  512 bottleneck, up blocks 256/128/64 with skip concats, 1x1 predictor,
  sigmoid. Input is a channel-stacked frame window: for bg_mode='concat'
  in_dim = (seq_len + 1) * 3 = 27 channels at 288x512 (get_model,
  ball_tracker.py:51-59); output seq_len=8 heatmaps.
- InpaintNet (models.py:101-130): 1-D conv U-Net over (N, L, 2) normalized
  coordinates + (N, L, 1) mask -> inpainted (N, L, 2), sigmoid output.

TPU-native differences: NHWC layout, channels-last concats, bfloat16
compute dtype option; the temporal window axis is batched so the whole
clip's windows stream through one compiled forward.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .layers import ConvBN, _BNStats, _ConvKernel, max_pool_2x2, upsample_nearest_2x


class _ConvStack(nn.Module):
    """n x (Conv3x3 + BN + ReLU) — Double2DConv / Triple2DConv
    (models.py:19-43)."""

    features: int
    n: int
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n):
            x = ConvBN(
                self.features, dtype=self.dtype,
                use_pallas=self.use_pallas, name=f"conv_{i + 1}",
            )(x, train=train)
        return x


def _phase_kernels_2x2(k: jnp.ndarray):
    """Collapse a 3x3 kernel into four 2x2 phase kernels equivalent to
    conv3x3(nearest_up2x(x)) evaluated at output phase (a, b) in {0,1}^2.

    nearest_up2x maps source row i to output rows {2i, 2i+1}; a 3x3 SAME
    conv at output row 2i+a therefore reads source rows {i-1, i} (a=0,
    taps [-1] | [0,+1]) or {i, i+1} (a=1, taps [-1,0] | [+1]) — taps that
    land on the same source pixel sum. Same for columns. 4 phases x 4
    taps at low resolution = 16 MACs/output vs 9 x 4 = 36 for the
    materialized upsample: an exact 2.25x MAC reduction.
    """
    r0 = jnp.stack([k[0], k[1] + k[2]], axis=0)  # rows {i-1, i}
    r1 = jnp.stack([k[0] + k[1], k[2]], axis=0)  # rows {i, i+1}

    def _cols(kr):
        c0 = jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], axis=1)
        c1 = jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], axis=1)
        return c0, c1

    k00, k01 = _cols(r0)
    k10, k11 = _cols(r1)
    return ((k00, k01), (k10, k11))


class _SubpixelUpConvBN(nn.Module):
    """First conv of an up block, computed WITHOUT materializing the
    nearest-2x upsample: conv3x3(concat([up2x(x_low), skip])) + BN + ReLU.

    The kernel splits along input channels into an up-part and a
    skip-part; the up-part runs as four 2x2 phase convs at LOW resolution
    (see _phase_kernels_2x2 — 2.25x fewer MACs and no (2h, 2w, C_up)
    intermediate in HBM), the skip-part as a normal 3x3 at high
    resolution, summed before the BN affine. Mathematically exact; the
    parameter tree is identical to ConvBN's (same names, shapes, init),
    so checkpoints and converters are oblivious.
    """

    features: int
    dtype: Any = jnp.float32
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x_low, skip):
        from ..ops.pallas_conv import fold_bn

        c_up = x_low.shape[-1]
        c_in = c_up + skip.shape[-1]
        kernel = _ConvKernel(self.features, (3, 3), name="conv")(c_in)
        scale, bias, mean, var = _BNStats(name="bn")(self.features)
        s, b = fold_bn(scale, bias, mean, var, self.bn_eps)

        # tap sums in f32 (param dtype), cast after: in bf16 the pre-sum
        # k[1]+k[2] would add a rounding the baseline never sees
        k_skip = kernel[:, :, c_up:, :].astype(self.dtype)
        x_low = x_low.astype(self.dtype)
        skip = skip.astype(self.dtype)

        dn = lax.conv_dimension_numbers(
            x_low.shape, (2, 2, c_up, self.features), ("NHWC", "HWIO", "NHWC")
        )
        phases = jax.tree_util.tree_map(
            lambda p: p.astype(self.dtype),
            _phase_kernels_2x2(kernel[:, :, :c_up, :]),
        )
        pads = ((1, 0), (0, 1))  # phase 0 reads {i-1, i}; phase 1 {i, i+1}
        ph = [
            lax.conv_general_dilated(
                x_low, phases[a][b], (1, 1), (pads[a], pads[b]),
                dimension_numbers=dn,
            )
            for a in (0, 1)
            for b in (0, 1)
        ]
        n, h, w, f = ph[0].shape
        y_up = (
            jnp.stack(ph, axis=0)
            .reshape(2, 2, n, h, w, f)
            .transpose(2, 3, 0, 4, 1, 5)
            .reshape(n, 2 * h, 2 * w, f)
        )

        dn_s = lax.conv_dimension_numbers(
            skip.shape, k_skip.shape, ("NHWC", "HWIO", "NHWC")
        )
        y_skip = lax.conv_general_dilated(
            skip, k_skip, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn_s
        )

        y = (y_up + y_skip) * s.astype(self.dtype) + b.astype(self.dtype)
        return nn.relu(y)


class _UpBlock(nn.Module):
    """Up block: conv over concat([up2x(x_low), skip]) then n-1 plain
    ConvBNs. With subpixel=True (inference only) the first conv runs the
    exact low-resolution phase-conv rewrite (_SubpixelUpConvBN)."""

    features: int
    n: int
    dtype: Any = jnp.float32
    use_pallas: bool = False
    subpixel: bool = False

    @nn.compact
    def __call__(self, x_low, skip, train: bool = False):
        if self.subpixel and not train:
            x = _SubpixelUpConvBN(
                self.features, dtype=self.dtype, name="conv_1"
            )(x_low, skip)
        else:
            x = jnp.concatenate([upsample_nearest_2x(x_low), skip], axis=-1)
            x = ConvBN(
                self.features, dtype=self.dtype,
                use_pallas=self.use_pallas, name="conv_1",
            )(x, train=train)
        for i in range(1, self.n):
            x = ConvBN(
                self.features, dtype=self.dtype,
                use_pallas=self.use_pallas, name=f"conv_{i + 1}",
            )(x, train=train)
        return x


class TrackNet(nn.Module):
    """Heatmap U-Net. Input (N, H, W, in_dim), output (N, H, W, out_dim)
    in [0, 1]."""

    out_dim: int = 8
    dtype: Any = jnp.float32
    use_pallas: bool = False
    # Inference-only exact rewrite of each up block's first conv as four
    # 2x2 phase convs at low resolution (2.25x fewer MACs on the
    # upsampled half; no materialized upsample) — see _SubpixelUpConvBN.
    # Identical parameter tree; flip freely per checkpoint.
    subpixel_up: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        up = self.use_pallas
        sp = self.subpixel_up
        x1 = _ConvStack(64, 2, self.dtype, up, name="down_block_1")(x, train)
        x = max_pool_2x2(x1)
        x2 = _ConvStack(128, 2, self.dtype, up, name="down_block_2")(x, train)
        x = max_pool_2x2(x2)
        x3 = _ConvStack(256, 3, self.dtype, up, name="down_block_3")(x, train)
        x = max_pool_2x2(x3)
        x = _ConvStack(512, 3, self.dtype, up, name="bottleneck")(x, train)
        x = _UpBlock(256, 3, self.dtype, up, sp, name="up_block_1")(x, x3, train)
        x = _UpBlock(128, 2, self.dtype, up, sp, name="up_block_2")(x, x2, train)
        x = _UpBlock(64, 2, self.dtype, up, sp, name="up_block_3")(x, x1, train)
        x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="predictor")(x)
        return nn.sigmoid(x.astype(jnp.float32))


class _Conv1DBlock(nn.Module):
    """Conv1D + LeakyReLU (models.py:77-87). Input (N, L, C)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (3,),
            padding="SAME",
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.leaky_relu(x, negative_slope=0.01)


class InpaintNet(nn.Module):
    """Coordinate inpainting net (models.py:101-130).

    coords: (N, L, 2) normalized ball coordinates; mask: (N, L, 1)
    (1 where the trajectory needs inpainting). Returns (N, L, 2).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coords, mask):
        x = jnp.concatenate([coords, mask], axis=-1)  # (N, L, 3)
        x1 = _Conv1DBlock(32, self.dtype, name="down_1")(x)
        x2 = _Conv1DBlock(64, self.dtype, name="down_2")(x1)
        x3 = _Conv1DBlock(128, self.dtype, name="down_3")(x2)
        x = _Conv1DBlock(256, self.dtype, name="bottleneck_1")(x3)
        x = _Conv1DBlock(256, self.dtype, name="bottleneck_2")(x)
        x = jnp.concatenate([x, x3], axis=-1)
        x = _Conv1DBlock(128, self.dtype, name="up_1")(x)
        x = jnp.concatenate([x, x2], axis=-1)
        x = _Conv1DBlock(64, self.dtype, name="up_2")(x)
        x = jnp.concatenate([x, x1], axis=-1)
        x = _Conv1DBlock(32, self.dtype, name="up_3")(x)
        x = nn.Conv(2, (3,), padding="SAME", dtype=self.dtype, name="predictor")(x)
        return nn.sigmoid(x.astype(jnp.float32))


def make_tracknet(
    seq_len: int = 8, bg_mode: str = "concat", dtype: Any = jnp.float32,
    use_pallas: bool = False, subpixel_up: bool = False,
) -> tuple[TrackNet, int]:
    """Model + input channel count by background mode (parity with
    get_model, ball_tracker.py:23-65)."""
    if bg_mode == "subtract":
        in_dim = seq_len
    elif bg_mode == "subtract_concat":
        in_dim = seq_len * 4
    elif bg_mode == "concat":
        in_dim = (seq_len + 1) * 3
    else:
        in_dim = seq_len * 3
    model = TrackNet(
        out_dim=seq_len, dtype=dtype, use_pallas=use_pallas,
        subpixel_up=subpixel_up,
    )
    return model, in_dim
