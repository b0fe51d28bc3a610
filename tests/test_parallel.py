"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from padel_analytics_tpu.models.tracknet import TrackNet, make_tracknet
from padel_analytics_tpu.ops.ensemble import (
    ensemble_full,
    overlap_ensemble_coefficients,
)
from padel_analytics_tpu.ops.heatmap import decode_heatmaps
from padel_analytics_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_params_for_tp,
)
from padel_analytics_tpu.parallel.sharded_inference import (
    sharded_window_inference,
)
from padel_analytics_tpu.training.tracknet import (
    gaussian_heatmap_labels,
    init_train_state,
    make_tracknet_train_step,
    weighted_bce_loss,
)


def test_mesh_shapes(cpu_devices):
    assert len(cpu_devices) == 8
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_sharded_window_inference_matches_single_device(rng):
    """The halo-exchange SPMD path must reproduce the single-device
    window/ensemble/decode pipeline bit-for-bit (same f32 math)."""
    mesh = make_mesh(data=8, model=1)
    seq_len = 8
    h, w, n = 16, 32, 67  # deliberately not divisible by 8
    model = TrackNet(out_dim=seq_len)
    in_dim = 27
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, in_dim), jnp.float32)
    )
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    median = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def apply_fn(x):
        return model.apply(variables, x)

    cx_s, cy_s, vis_s = sharded_window_inference(
        apply_fn, frames, median, mesh, seq_len=seq_len
    )

    # single-device reference path
    num_windows = n - seq_len + 1
    med = jnp.broadcast_to(
        jnp.asarray(median, jnp.float32)[None], (num_windows, h, w, 3)
    )
    f = jnp.asarray(frames, jnp.float32)
    parts = [med] + [f[j : j + num_windows] for j in range(seq_len)]
    x = jnp.concatenate(parts, axis=-1) / 255.0
    y = jnp.transpose(apply_fn(x), (0, 3, 1, 2))
    coef = jnp.asarray(overlap_ensemble_coefficients(n, seq_len))
    ens = ensemble_full(y, coef, seq_len)
    cx_r, cy_r, vis_r = decode_heatmaps(ens)

    np.testing.assert_array_equal(cx_s, np.asarray(cx_r))
    np.testing.assert_array_equal(cy_s, np.asarray(cy_r))
    np.testing.assert_array_equal(vis_s, np.asarray(vis_r))


def test_heatmap_labels_parity():
    """Label geometry matches dataset.py:431-440 (1-based grid, disc)."""
    labels = np.asarray(
        gaussian_heatmap_labels(jnp.asarray([[10.0, 6.0], [0.0, 0.0]]), 16, 24)
    )
    # reference: meshgrid over 1..W x 1..H, disc where d2 <= sigma^2
    x, y = np.meshgrid(np.linspace(1, 24, 24), np.linspace(1, 16, 16))
    ref = (((y - 7.0) ** 2 + (x - 11.0) ** 2) <= 2.5**2).astype(np.float32)
    np.testing.assert_array_equal(labels[0], ref)
    assert labels[1].sum() == 0  # absent ball -> zero map


def test_weighted_bce_gradient_direction():
    pred = jnp.asarray([[0.2, 0.8]])
    target = jnp.asarray([[1.0, 1.0]])
    g = jax.grad(lambda p: weighted_bce_loss(p, target))(pred)
    assert (np.asarray(g) < 0).all()  # loss decreases as pred -> 1


def test_dp_tp_train_step(rng):
    """One sharded train step on a 4x2 (data x model) mesh: batch over
    'data', conv output channels over 'model'; loss finite and decreasing."""
    mesh = make_mesh(data=4, model=2)
    model, in_dim = make_tracknet(8, "concat")
    h, w, b = 16, 32, 8
    optimizer = optax.adam(1e-3)
    state = init_train_state(
        model, jnp.zeros((1, h, w, in_dim), jnp.float32), optimizer
    )

    # Shard: params tensor-parallel, batch data-parallel.
    state.params = shard_params_for_tp(state.params, mesh)
    x = jax.device_put(
        rng.uniform(0, 1, size=(b, h, w, in_dim)).astype(np.float32),
        batch_sharding(mesh),
    )
    centers = jnp.asarray(
        rng.integers(1, 20, size=(b, 8, 2)).astype(np.float32)
    )
    labels = jax.device_put(
        np.asarray(
            jnp.transpose(
                gaussian_heatmap_labels(centers, h, w), (0, 2, 3, 1)
            )
        ),
        batch_sharding(mesh),
    )

    step = jax.jit(make_tracknet_train_step(model, optimizer))
    state1, loss1 = step(state, x, labels)
    state2, loss2 = step(state1, x, labels)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)
    assert state2.step == 2
    # Parameters kept their tensor-parallel sharding through the step.
    kernel = state2.params["bottleneck"]["conv_1"]["conv"]["kernel"]
    assert "model" in str(kernel.sharding.spec)


def test_frame_mixup_shapes_and_semantics(rng):
    from padel_analytics_tpu.training.augmentation import frame_mixup

    l, h, w = 8, 16, 24
    frames = jnp.asarray(rng.uniform(0, 1, size=(l, h, w, 3)).astype(np.float32))
    coords = jnp.asarray(rng.integers(2, 14, size=(l, 2)).astype(np.float32))
    vis = jnp.ones((l,), jnp.float32)
    out_f, out_h, out_c, out_v = frame_mixup(
        jax.random.PRNGKey(0), frames, coords, vis, h, w
    )
    assert out_f.shape == (l, h, w, 3)
    assert out_h.shape == (l, h, w)
    assert out_c.shape == (l, 2) and out_v.shape == (l,)
    # heatmaps bounded in [0, 1]; at least one positive pixel per visible ball
    assert float(out_h.max()) <= 1.0 and float(out_h.min()) >= 0.0


def test_inpaintnet_train_step(rng):
    from padel_analytics_tpu.models.tracknet import InpaintNet
    from padel_analytics_tpu.training.inpaintnet import make_inpaintnet_train_step
    from padel_analytics_tpu.training.tracknet import TrackNetTrainState

    model = InpaintNet()
    coords = jnp.asarray(rng.uniform(0, 1, size=(4, 16, 2)).astype(np.float32))
    mask = jnp.asarray(rng.integers(0, 2, size=(4, 16, 1)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, size=(4, 16, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), coords, mask)
    optimizer = optax.adam(1e-3)
    state = TrackNetTrainState(
        params=variables["params"], batch_stats={},
        opt_state=optimizer.init(variables["params"]),
    )
    step = jax.jit(make_inpaintnet_train_step(model, optimizer))
    state1, l1 = step(state, coords, mask, target)
    state2, l2 = step(state1, coords, mask, target)
    assert np.isfinite(float(l1)) and float(l2) < float(l1)
