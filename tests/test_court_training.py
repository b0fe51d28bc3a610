"""ResNet court-keypoint regression training: target normalization,
masked-loss semantics, an overfit run on a tiny ResNet variant, and a
mesh-sharded step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from padel_analytics_tpu.models.resnet import ResNet50Regressor, imagenet_normalize
from padel_analytics_tpu.training.resnet_court import (
    court_regression_loss,
    init_court_train_state,
    make_court_train_step,
    normalize_court_targets,
)


def _tiny_model(num_outputs=8):
    # (1,1,1,1) bottleneck stages: same code path, test-sized FLOPs.
    return ResNet50Regressor(num_outputs=num_outputs, stage_sizes=(1, 1, 1, 1))


def test_normalize_court_targets_roundtrip():
    kp = np.array([[[96.0, 54.0], [192.0, 108.0]]])  # (1, 2, 2)
    t = normalize_court_targets(kp, frame_wh=(192, 108))
    np.testing.assert_allclose(np.asarray(t), [[0.5, 0.5, 1.0, 1.0]])


def test_masked_loss_ignores_unlabeled():
    logits = jnp.zeros((1, 4))  # sigmoid -> 0.5 everywhere
    targets = jnp.asarray([[0.5, 0.5, 0.0, 0.0]])
    full = float(court_regression_loss(logits, targets))
    assert full == pytest.approx(0.125, abs=1e-6)  # mean([0,0,.25,.25])
    mask = jnp.asarray([[1.0, 0.0]])  # second keypoint unlabeled
    masked = float(court_regression_loss(logits, targets, mask))
    assert masked == pytest.approx(0.0, abs=1e-6)


def test_court_training_overfits(rng):
    # lr calibrated on this fixture: 1e-4 reaches ~3e-4 by step 25 (adam
    # at 1e-3+ saturates the sigmoid head and plateaus instead).
    model = _tiny_model(num_outputs=6)
    imgs = imagenet_normalize(
        jnp.asarray(rng.uniform(0, 1, size=(3, 16, 16, 3)).astype(np.float32))
    )
    kp = rng.uniform(2, 14, size=(3, 3, 2)).astype(np.float32)
    targets = normalize_court_targets(kp, frame_wh=(16, 16))
    optimizer = optax.adam(1e-4)
    state = init_court_train_state(model, imgs[:1], optimizer)
    step = jax.jit(make_court_train_step(model, optimizer))
    losses = []
    for _ in range(40):
        state, loss = step(state, imgs, targets)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.15, losses[::10]


def test_train_court_cli_end_to_end(tmp_path):
    """The court fine-tuning CLI trains on an images+JSON dataset and
    writes a checkpoint loadable back into the model."""
    import cv2
    import json

    from padel_analytics_tpu.apps.train_court import main as train_main

    img_dir = tmp_path / "frames"
    img_dir.mkdir()
    table = {}
    r = np.random.default_rng(3)
    for i in range(4):
        img = np.full((60, 80, 3), 35, np.uint8)
        cv2.line(img, (10, 50), (70, 50), (200, 200, 200), 2)
        img += r.integers(0, 8, img.shape, dtype=np.uint8)
        name = f"f{i}.png"
        cv2.imwrite(str(img_dir / name), img)
        table[name] = [[10.0, 50.0], [70.0, 50.0], [40.0, 20.0]]
    kp_json = tmp_path / "court_keypoints.json"
    kp_json.write_text(json.dumps(table))
    out = tmp_path / "court.msgpack"
    rc = train_main(
        [
            "--images", str(img_dir), "--keypoints", str(kp_json),
            # batch 8 > 4 images: exercises the dataset-size clamp (an
            # unclamped loop would train ZERO steps and still "succeed")
            "--imgsz", "32", "--epochs", "1", "--batch", "8",
            "--out", str(out), "--stage-sizes", "1,1,1,1",
            "--data-parallel", "4", "--model-parallel", "2",
        ]
    )
    assert rc == 0 and out.exists()

    from padel_analytics_tpu.trackers import _engine

    model = _tiny_model(num_outputs=6)
    variables = _engine.load_variables(
        model, jnp.zeros((1, 32, 32, 3), jnp.float32), str(out)
    )
    o = model.apply(variables, jnp.zeros((2, 32, 32, 3), jnp.float32))
    assert o.shape == (2, 6)


def test_court_train_step_on_mesh(rng, cpu_devices):
    from padel_analytics_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        shard_params_for_tp,
    )

    mesh = make_mesh(data=4, model=2, devices=cpu_devices[:8])
    model = _tiny_model(num_outputs=8)
    imgs = imagenet_normalize(
        jnp.asarray(rng.uniform(0, 1, size=(8, 32, 32, 3)).astype(np.float32))
    )
    kp = rng.uniform(4, 28, size=(8, 4, 2)).astype(np.float32)
    targets = normalize_court_targets(kp, frame_wh=(32, 32))
    mask = jnp.ones((8, 4))
    optimizer = optax.adam(1e-3)
    state = init_court_train_state(model, imgs[:1], optimizer)
    state.params = shard_params_for_tp(state.params, mesh)
    imgs = jax.device_put(imgs, batch_sharding(mesh))
    targets = jax.device_put(targets, batch_sharding(mesh))
    step = jax.jit(make_court_train_step(model, optimizer))
    state, loss = step(state, imgs, targets, mask)
    assert np.isfinite(float(loss))
