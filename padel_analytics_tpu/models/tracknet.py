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

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN, max_pool_2x2, upsample_nearest_2x


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


class TrackNet(nn.Module):
    """Heatmap U-Net. Input (N, H, W, in_dim), output (N, H, W, out_dim)
    in [0, 1]."""

    out_dim: int = 8
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        up = self.use_pallas
        x1 = _ConvStack(64, 2, self.dtype, up, name="down_block_1")(x, train)
        x = max_pool_2x2(x1)
        x2 = _ConvStack(128, 2, self.dtype, up, name="down_block_2")(x, train)
        x = max_pool_2x2(x2)
        x3 = _ConvStack(256, 3, self.dtype, up, name="down_block_3")(x, train)
        x = max_pool_2x2(x3)
        x = _ConvStack(512, 3, self.dtype, up, name="bottleneck")(x, train)
        x = jnp.concatenate([upsample_nearest_2x(x), x3], axis=-1)
        x = _ConvStack(256, 3, self.dtype, up, name="up_block_1")(x, train)
        x = jnp.concatenate([upsample_nearest_2x(x), x2], axis=-1)
        x = _ConvStack(128, 2, self.dtype, up, name="up_block_2")(x, train)
        x = jnp.concatenate([upsample_nearest_2x(x), x1], axis=-1)
        x = _ConvStack(64, 2, self.dtype, up, name="up_block_3")(x, train)
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
    use_pallas: bool = False,
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
    return TrackNet(out_dim=seq_len, dtype=dtype, use_pallas=use_pallas), in_dim
