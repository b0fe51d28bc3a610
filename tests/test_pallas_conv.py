"""Pallas fused conv3x3+BN+act kernel: numeric parity with the XLA
reference (interpret mode on CPU; tools/kernel_probe.py times it on the
real chip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padel_analytics_tpu.ops.pallas_conv import (
    conv3x3_bn_act,
    conv3x3_bn_act_reference,
    fold_bn,
)


@pytest.mark.parametrize(
    "shape,act",
    [
        ((2, 16, 32, 8), "relu"),
        ((1, 24, 40, 16), "silu"),
        ((2, 16, 32, 8), "none"),
    ],
)
def test_conv3x3_bn_act_matches_reference(rng, shape, act):
    b, h, w, cin = shape
    cout = 12
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(cout), jnp.float32)
    mean = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, cout), jnp.float32)
    scale, bias = fold_bn(gamma, beta, mean, var, 1e-5)

    got = conv3x3_bn_act(x, wgt, scale, bias, act=act, interpret=True)
    want = conv3x3_bn_act_reference(x, wgt, scale, bias, act=act)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_conv3x3_tile_not_dividing_height(rng):
    # H=20 not divisible by the default tile 8 -> kernel must fall back
    # to a dividing tile (4) and still be exact.
    x = jnp.asarray(rng.standard_normal((1, 20, 16, 4)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, 4, 6)) * 0.1, jnp.float32)
    scale = jnp.ones(6, jnp.float32)
    bias = jnp.zeros(6, jnp.float32)
    got = conv3x3_bn_act(x, wgt, scale, bias, act="relu", interpret=True)
    want = conv3x3_bn_act_reference(x, wgt, scale, bias, act="relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fold_bn_identity():
    scale, bias = fold_bn(
        jnp.ones(4), jnp.zeros(4), jnp.zeros(4), jnp.ones(4), 0.0
    )
    np.testing.assert_allclose(np.asarray(scale), 1.0)
    np.testing.assert_allclose(np.asarray(bias), 0.0)
