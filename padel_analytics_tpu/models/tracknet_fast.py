"""Hand-scheduled TrackNet inference forward built on the Pallas fused
conv kernel (ops/pallas_conv.py).

RETAINED EXPERIMENT, NOT A FAST PATH. The round-2 probe that motivated
this ("XLA convs at ~2% MXU") was polluted by per-call host uploads; the
corrected resident-buffer probes (BENCH.md round-3 corrections) measure
XLA's conv emitter running the full TrackNet at ~54% of v5e bf16 peak
(2.14 ms/img, exact GMAC accounting), while this Pallas route measured
2x SLOWER at the variants tried. It stays in-tree behind
`use_pallas=False` as the starting point for future kernel iteration on
a PCIe-attached host (each Mosaic compile is 10-40 min on the tunnel).
This module re-executes the SAME Flax variables (models/tracknet.py
parameter tree — checkpoint-compatible with models/convert.py) through
the Pallas conv3x3+BN+act kernel, keeping max-pool / nearest-upsample /
concat / the 1x1 predictor in XLA.

Usage: `FastTrackNet(out_dim)` duck-types the `.apply(variables, x)`
surface the trackers drive (trackers/_engine.Engine), so it drops into
BallTracker / the fused pipeline as `ball.tracknet.model = FastTrackNet(
ball.tracknet.model.out_dim)` or via BallTracker(..., fast_forward=True).

Numerics vs the Flax model at bf16: the kernel accumulates in fp32 and
applies BN+ReLU in fp32 before casting back (the Flax path casts to bf16
after the conv and normalizes in bf16), so outputs can differ by ~1 bf16
ulp; tests/test_tracknet_fast.py bounds this and pins fp32 exactness.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops.pallas_conv import conv3x3_bn_act, fold_bn
from .layers import max_pool_2x2, upsample_nearest_2x

BN_EPS = 1e-5  # torch BatchNorm2d default (ConvBN TrackNet flavor)


class FastTrackNet:
    """Pallas-kernel TrackNet forward over a standard variables tree."""

    def __init__(self, out_dim: int = 8, dtype: Any = jnp.bfloat16,
                 interpret: bool = False):
        self.out_dim = out_dim
        self.dtype = dtype
        self.interpret = interpret

    def _stack(self, variables, name: str, n: int, x):
        params = variables["params"][name]
        stats = variables["batch_stats"][name]
        for i in range(1, n + 1):
            conv = params[f"conv_{i}"]
            bn_p = conv["bn"]
            bn_s = stats[f"conv_{i}"]["bn"]
            scale, bias = fold_bn(
                bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"],
                BN_EPS,
            )
            x = conv3x3_bn_act(
                x, conv["conv"]["kernel"].astype(self.dtype), scale, bias,
                act="relu", interpret=self.interpret,
            )
        return x

    def apply(self, variables, x, train: bool = False):
        assert not train, "FastTrackNet is inference-only"
        x = x.astype(self.dtype)
        v = variables
        x1 = self._stack(v, "down_block_1", 2, x)
        x = max_pool_2x2(x1)
        x2 = self._stack(v, "down_block_2", 2, x)
        x = max_pool_2x2(x2)
        x3 = self._stack(v, "down_block_3", 3, x)
        x = max_pool_2x2(x3)
        x = self._stack(v, "bottleneck", 3, x)
        x = jnp.concatenate([upsample_nearest_2x(x), x3], axis=-1)
        x = self._stack(v, "up_block_1", 3, x)
        x = jnp.concatenate([upsample_nearest_2x(x), x2], axis=-1)
        x = self._stack(v, "up_block_2", 2, x)
        x = jnp.concatenate([upsample_nearest_2x(x), x1], axis=-1)
        x = self._stack(v, "up_block_3", 2, x)
        pred = v["params"]["predictor"]
        y = (
            jax.lax.conv_general_dilated(
                x, pred["kernel"].astype(self.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            + pred["bias"][None, None, None, :]
        )
        return jax.nn.sigmoid(y.astype(jnp.float32))
