"""InpaintNet training: masked-coordinate loss + sharded train step.

The reference ships the InpaintNet architecture and inference blend but no
training loop. Training target (per TrackNetV3's recipe the checkpoints
derive from): predict ground-truth normalized coordinates on the inpainted
(masked) region; the unmasked region is supervised too (weighted down),
keeping the identity path stable.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from .tracknet import TrackNetTrainState


def masked_coordinate_loss(
    pred: jnp.ndarray,  # (B, L, 2) in [0, 1]
    target: jnp.ndarray,  # (B, L, 2)
    mask: jnp.ndarray,  # (B, L, 1): 1 = inpainted region
    unmasked_weight: float = 0.1,
) -> jnp.ndarray:
    se = jnp.sum((pred - target) ** 2, axis=-1, keepdims=True)
    w = mask + unmasked_weight * (1.0 - mask)
    return jnp.sum(se * w) / jnp.maximum(jnp.sum(w), 1e-6)


def make_inpaintnet_train_step(
    model, optimizer: optax.GradientTransformation
) -> Callable:
    """(state, coords, mask, target) -> (state, loss); shard the batch over
    'data' like the TrackNet step (InpaintNet has no BatchNorm, so
    batch_stats stays an empty dict)."""

    def loss_fn(params, coords, mask, target):
        pred = model.apply({"params": params}, coords, mask)
        return masked_coordinate_loss(pred, target, mask)

    def train_step(state: TrackNetTrainState, coords, mask, target):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, coords, mask, target
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrackNetTrainState(
                params=new_params,
                batch_stats=state.batch_stats,
                opt_state=new_opt,
                step=state.step + 1,
            ),
            loss,
        )

    return train_step
