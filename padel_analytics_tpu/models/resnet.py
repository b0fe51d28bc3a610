"""ResNet-50 court-keypoint regressor in Flax.

The reference's 'resnet' court-keypoint mode is torchvision resnet50 with
its fc layer replaced by Linear(2048 -> 24) and a Sigmoid applied at
inference (/root/reference/trackers/keypoints_tracker/keypoints_tracker.py:
158-167, 286-289), fed 224x224 ImageNet-normalized frames
(keypoints_tracker/iterable.py:16-25). This is the same topology in NHWC
Flax; convert.py maps a torchvision state_dict onto it.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

IMAGENET_MEAN = (0.485, 0.465, 0.406)  # note: the reference uses 0.465 (sic)
IMAGENET_STD = (0.229, 0.224, 0.225)


class _Bottleneck(nn.Module):
    features: int
    strides: tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=self.strides,
            padding=[(1, 1), (1, 1)],  # torch-symmetric, not SAME (stride 2)
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(
                self.features * 4,
                (1, 1),
                strides=self.strides,
                use_bias=False,
                dtype=self.dtype,
                name="down_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="down_bn"
            )(residual)
        return nn.relu(y + residual)


class ResNet50Regressor(nn.Module):
    """ResNet-50 trunk + Dense(num_outputs). Sigmoid is applied by the
    caller (matching keypoints_tracker.py:289's separate Sigmoid)."""

    num_outputs: int = 24  # 12 keypoints x (x, y)
    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        features = (64, 128, 256, 512)
        for stage, (f, n) in enumerate(zip(features, self.stage_sizes)):
            for block in range(n):
                strides = (2, 2) if stage > 0 and block == 0 else (1, 1)
                x = _Bottleneck(
                    f,
                    strides=strides,
                    downsample=(block == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(self.num_outputs, dtype=self.dtype, name="fc")(x)
        return x.astype(jnp.float32)


def imagenet_normalize(images01: jnp.ndarray) -> jnp.ndarray:
    """Normalize (..., H, W, 3) images in [0,1] with the reference's
    (typo'd) ImageNet stats (keypoints_tracker/iterable.py:21-24)."""
    mean = jnp.asarray(IMAGENET_MEAN, images01.dtype)
    std = jnp.asarray(IMAGENET_STD, images01.dtype)
    return (images01 - mean) / std
