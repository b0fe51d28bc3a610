"""FastTrackNet (Pallas-kernel forward) parity with the Flax TrackNet on
the same variables tree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padel_analytics_tpu.models.tracknet import make_tracknet
from padel_analytics_tpu.models.tracknet_fast import FastTrackNet


def test_fast_tracknet_matches_flax_fp32(rng):
    model, in_dim = make_tracknet(8, "concat", dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (2, 48, 64, in_dim)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    want = np.asarray(model.apply(variables, x))
    fast = FastTrackNet(out_dim=8, dtype=jnp.float32, interpret=True)
    got = np.asarray(fast.apply(variables, x))
    assert got.shape == want.shape == (2, 48, 64, 8)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fast_tracknet_bf16_close(rng):
    model, in_dim = make_tracknet(8, "concat", dtype=jnp.bfloat16)
    x = jnp.asarray(rng.uniform(0, 1, (1, 48, 64, in_dim)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    want = np.asarray(model.apply(variables, x))
    fast = FastTrackNet(out_dim=8, dtype=jnp.bfloat16, interpret=True)
    got = np.asarray(fast.apply(variables, x))
    # fp32 epilogue vs bf16 chain: sigmoid outputs stay within ~1e-2
    assert np.abs(got - want).max() < 2e-2
    # decisions at the 0.5 heatmap threshold agree except at boundary
    disagree = np.mean((got > 0.5) != (want > 0.5))
    assert disagree < 1e-3
