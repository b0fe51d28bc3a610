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


class _ConvKernel(nn.Module):
    """Param-holder matching nn.Conv(use_bias=False)'s tree ('kernel',
    lecun_normal init) without computing — lets ConvBN's Pallas path own
    the same checkpoint-compatible parameters."""

    features: int
    kernel_size: tuple[int, int]

    @nn.compact
    def __call__(self, cin: int):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, cin, self.features),
            jnp.float32,  # nn.Conv's param_dtype (x64-proof)
        )


class _BNStats(nn.Module):
    """Param/stats-holder matching nn.BatchNorm's tree."""

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        return scale, bias, mean.value, var.value


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + activation.

    The TrackNet flavor (3x3, no bias, ReLU) mirrors Conv2DBlock at
    /root/reference/trackers/ball_tracker/models.py:5-17; the YOLO flavor
    (SiLU) mirrors ultralytics' Conv.

    use_pallas: retained kernel experiment (default OFF) — stride-1 3x3
    blocks run as the fused Pallas conv+BN+act kernel
    (ops/pallas_conv.py). Corrected probes measure XLA's own emitter at
    ~54% of bf16 peak here and the Pallas route 2x slower (BENCH.md
    round-3 corrections), so this is NOT a fast path. The parameter
    tree is IDENTICAL either way (same names, shapes, init), so
    checkpoints and converters are oblivious to the flag. Training and
    non-3x3/strided blocks always take the XLA path.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    act: Callable = nn.relu
    bn_eps: float = 1e-5  # torch BatchNorm2d default; ultralytics uses 1e-3
    bn_momentum: float = 0.9
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (
            self.use_pallas
            and not train
            and self.kernel_size == (3, 3)
            and self.strides == (1, 1)
        ):
            from ..ops.pallas_conv import conv3x3_bn_act, fold_bn

            cin = x.shape[-1]
            kernel = _ConvKernel(
                self.features, self.kernel_size, name="conv"
            )(cin)
            scale, bias, mean, var = _BNStats(name="bn")(self.features)
            s, b = fold_bn(scale, bias, mean, var, self.bn_eps)
            act_name = (
                "relu" if self.act is nn.relu
                else "silu" if self.act is nn.silu
                else None
            )
            if act_name is not None:
                y = conv3x3_bn_act(
                    x.astype(self.dtype), kernel.astype(self.dtype), s, b,
                    act=act_name,
                )
                return y
            # unknown activation: fused conv+BN, activation outside
            y = conv3x3_bn_act(
                x.astype(self.dtype), kernel.astype(self.dtype), s, b,
                act="none",
            )
            return self.act(y)

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
