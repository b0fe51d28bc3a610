"""Shared Flax building blocks (NHWC, bfloat16-friendly).

All conv layers default to channels-last with explicit compute dtype so
XLA tiles them straight onto the MXU; BatchNorm runs off running stats at
inference (`train=False`) like the reference's eval-mode torch models.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + activation.

    The TrackNet flavor (3x3, no bias, ReLU) mirrors Conv2DBlock at
    /root/reference/trackers/ball_tracker/models.py:5-17; the YOLO flavor
    (SiLU) mirrors ultralytics' Conv.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    act: Callable = nn.relu
    bn_eps: float = 1e-5  # torch BatchNorm2d default; ultralytics uses 1e-3
    bn_momentum: float = 0.9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Explicit symmetric k//2 padding (torch-style). Equivalent to SAME
        # at stride 1, but at stride 2 flax's SAME pads (0, 1) while torch
        # pads (1, 1) — a one-pixel shift that breaks converted-checkpoint
        # parity in every downsampling conv.
        pad = [(k // 2, k // 2) for k in self.kernel_size]
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=pad,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            name="bn",
        )(x)
        return self.act(x)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (torch nn.Upsample(scale_factor=2)
    default mode, models.py:66-70)."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x
