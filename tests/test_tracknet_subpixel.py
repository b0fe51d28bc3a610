"""Subpixel up-block rewrite (TrackNet(subpixel_up=True)) parity with the
baseline materialized-upsample forward on the same variables tree.

The rewrite (models/tracknet._SubpixelUpConvBN) is an exact algebraic
identity — conv3x3(nearest_up2x(x)) as four 2x2 phase convs at low
resolution — so fp32 outputs must match to accumulation-order noise and
the parameter trees must be identical.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padel_analytics_tpu.models.tracknet import TrackNet, make_tracknet

pytestmark = pytest.mark.smoke


def _tree_spec(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if hasattr(v, "items"):
            out.update(_tree_spec(v, p))
        else:
            out[p] = (tuple(v.shape), str(v.dtype))
    return out


def test_subpixel_param_tree_identical():
    base, in_dim = make_tracknet(8, "concat", dtype=jnp.float32)
    sub, _ = make_tracknet(8, "concat", dtype=jnp.float32, subpixel_up=True)
    x = jnp.zeros((1, 16, 32, in_dim), jnp.float32)
    vb = base.init(jax.random.PRNGKey(0), x)
    vs = sub.init(jax.random.PRNGKey(0), x)
    assert _tree_spec(vb) == _tree_spec(vs)


def test_subpixel_matches_baseline_fp32(rng):
    base, in_dim = make_tracknet(8, "concat", dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (2, 48, 64, in_dim)), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats: the fold must reproduce BatchNorm exactly
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 if v.ndim == 1 else v, variables
    )

    want = np.asarray(base.apply(variables, x))
    sub = TrackNet(out_dim=8, dtype=jnp.float32, subpixel_up=True)
    got = np.asarray(sub.apply(variables, x))
    assert got.shape == want.shape == (2, 48, 64, 8)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_subpixel_matches_baseline_odd_content(rng):
    # asymmetric content catches phase/padding transpositions that a
    # uniform field would hide
    base, in_dim = make_tracknet(4, "", dtype=jnp.float32)
    sub, _ = make_tracknet(4, "", dtype=jnp.float32, subpixel_up=True)
    x = np.zeros((1, 24, 40, in_dim), np.float32)
    x[0, 3, 5, :] = 1.0
    x[0, 20, 33, 0] = -2.0
    x[0, :, 0, 1] = 0.5
    x = jnp.asarray(x)
    variables = base.init(jax.random.PRNGKey(1), x)
    want = np.asarray(base.apply(variables, x))
    got = np.asarray(sub.apply(variables, x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_subpixel_bf16_decisions_agree(rng):
    base, in_dim = make_tracknet(8, "concat", dtype=jnp.bfloat16)
    sub, _ = make_tracknet(
        8, "concat", dtype=jnp.bfloat16, subpixel_up=True
    )
    x = jnp.asarray(rng.uniform(0, 1, (1, 48, 64, in_dim)), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x)
    want = np.asarray(base.apply(variables, x))
    got = np.asarray(sub.apply(variables, x))
    # bf16 summation-order noise only: far tighter than the 2e-2 the
    # Pallas fast path needs. Random-init outputs pile up AT the 0.5
    # threshold (mean |y-0.5| ~ 0.014), so assert the flip set is
    # confined to that noise band rather than a raw flip-rate.
    maxabs = np.abs(got - want).max()
    assert maxabs < 2e-3
    flips = (got > 0.5) != (want > 0.5)
    assert np.all(np.abs(want[flips] - 0.5) <= maxabs)


def test_subpixel_train_mode_falls_back(rng):
    # train=True must take the standard concat path (BN batch stats);
    # outputs under mutable batch_stats match the baseline exactly.
    base, in_dim = make_tracknet(8, "concat", dtype=jnp.float32)
    sub, _ = make_tracknet(8, "concat", dtype=jnp.float32, subpixel_up=True)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 32, in_dim)), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x)
    want, wstats = base.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    got, gstats = sub.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        gstats, wstats,
    )
