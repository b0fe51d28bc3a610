"""ResNet court-keypoints regression training: loss + mesh-sharded step.

The reference ships a ResNet50 court-keypoint checkpoint consumer
(/root/reference/trackers/keypoints_tracker/keypoints_tracker.py:158-167:
fc -> 24-dim Sigmoid regression of normalized (x, y)) but no training
loop. This completes the training subsystem so every model family the
framework serves (YOLO det/pose, TrackNet, InpaintNet, ResNet court) is
trainable TPU-first:

- targets are keypoints normalized to [0, 1] by the frame size, exactly
  the quantity the inference path rescales by W/H
  (keypoints_tracker.py:291-310);
- masked MSE over the sigmoid outputs (absent/occluded keypoints carry
  zero weight);
- the train step is mesh-ready: shard images/targets over 'data' and
  params over 'model' (parallel/mesh.py) before calling — XLA GSPMD
  inserts the gradient all-reduce and TP collectives.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


def normalize_court_targets(
    keypoints_xy: np.ndarray | jnp.ndarray,  # (..., K, 2) in source pixels
    frame_wh: tuple[int, int],
) -> jnp.ndarray:
    """Pixel keypoints -> the [0, 1]-normalized (x, y) regression targets
    the sigmoid head predicts, flattened to (..., 2K) in the checkpoint's
    interleaved x,y order (keypoints_tracker.py:291-310)."""
    kp = jnp.asarray(keypoints_xy, jnp.float32)
    scale = jnp.asarray([frame_wh[0], frame_wh[1]], jnp.float32)
    norm = kp / scale
    return norm.reshape(*norm.shape[:-2], norm.shape[-2] * 2)


def court_regression_loss(
    logits: jnp.ndarray,  # (B, 2K) raw fc outputs
    targets: jnp.ndarray,  # (B, 2K) normalized coordinates in [0, 1]
    mask: jnp.ndarray | None = None,  # (B, K) 1 = keypoint labeled
) -> jnp.ndarray:
    """Masked MSE over sigmoid(fc) — the inference-time quantity."""
    pred = jax.nn.sigmoid(logits)
    err = (pred - targets) ** 2
    if mask is None:
        return jnp.mean(err)
    w = jnp.repeat(mask.astype(jnp.float32), 2, axis=-1)  # (B, 2K)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)


# One shared train-state pytree serves every model family (inpaintnet
# already reuses it); the alias keeps the public name.
from .tracknet import TrackNetTrainState as CourtTrainState  # noqa: E402
from .tracknet import init_train_state as _init_train_state  # noqa: E402


def init_court_train_state(
    model, example_input: jnp.ndarray, optimizer: optax.GradientTransformation
) -> CourtTrainState:
    return _init_train_state(model, example_input, optimizer)


def make_court_train_step(
    model, optimizer: optax.GradientTransformation
) -> Callable:
    """(state, images (B,H,W,3) ImageNet-normalized, targets (B,2K),
    mask (B,K) or None) -> (state, loss)."""

    def loss_fn(params, batch_stats, images, targets, mask):
        logits, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        return court_regression_loss(logits, targets, mask), updates[
            "batch_stats"
        ]

    def train_step(state: CourtTrainState, images, targets, mask=None):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, images, targets, mask
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        return (
            CourtTrainState(
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats,
                opt_state=new_opt,
                step=state.step + 1,
            ),
            loss,
        )

    return train_step
