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


def test_convbn_use_pallas_matches_xla_path(rng):
    """ConvBN(use_pallas=True) must produce the XLA path's outputs from
    the SAME parameter tree (identical names/shapes/init)."""
    import jax
    from flax import linen as nn

    from padel_analytics_tpu.models.layers import ConvBN

    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 24, 6)), jnp.float32)
    ref = ConvBN(10, dtype=jnp.float32, use_pallas=False)
    fast = ConvBN(10, dtype=jnp.float32, use_pallas=True)
    v_ref = ref.init(jax.random.PRNGKey(7), x)
    v_fast = fast.init(jax.random.PRNGKey(7), x)
    # identical parameter trees (names, shapes, values)
    flat_ref = jax.tree_util.tree_leaves_with_path(v_ref)
    flat_fast = jax.tree_util.tree_leaves_with_path(v_fast)
    assert [p for p, _ in flat_ref] == [p for p, _ in flat_fast]
    for (_, a), (_, b) in zip(flat_ref, flat_fast):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    out_ref = np.asarray(ref.apply(v_ref, x))
    out_fast = np.asarray(fast.apply(v_ref, x))
    np.testing.assert_allclose(out_fast, out_ref, rtol=2e-5, atol=2e-5)


def test_yolo_use_pallas_small_model(rng):
    """End-to-end YOLOv8n forward with the Pallas flag: same decoded
    outputs as the XLA path from the same variables."""
    import jax

    from padel_analytics_tpu.models.yolov8 import YOLOv8

    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    ref = YOLOv8(variant="n", num_classes=1, dtype=jnp.float32)
    fast = YOLOv8(variant="n", num_classes=1, dtype=jnp.float32,
                  use_pallas=True)
    v = ref.init(jax.random.PRNGKey(0), x)
    out_ref = ref.apply(v, x)
    out_fast = fast.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(out_fast["boxes"]), np.asarray(out_ref["boxes"]),
        rtol=1e-4, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_fast["scores"]), np.asarray(out_ref["scores"]),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("shape", [(1, 16, 24, 8), (2, 24, 16, 16)])
def test_conv3x3_rows_variant_matches_reference(rng, shape):
    from padel_analytics_tpu.ops.pallas_conv import conv3x3_bn_act_rows

    b, h, w, cin = shape
    cout = 12
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)
    got = conv3x3_bn_act_rows(x, wgt, scale, bias, act="silu", interpret=True)
    want = conv3x3_bn_act_reference(x, wgt, scale, bias, act="silu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
