"""TrackNet training: loss, labels, and a mesh-sharded train step.

The reference ships training-time machinery (Gaussian-disc heatmap labels
at /root/reference/trackers/ball_tracker/dataset.py:431-440, frame-mixup
augmentation at :506-624) but no training loop. This module provides the
TPU-native training subsystem:

- binary-disc heatmap labels with the reference's exact geometry
  (radius SIGMA around (cx+1, cy+1), zero map for (0, 0) balls);
- focal-weighted BCE over heatmaps (TrackNetV3-style);
- a train step designed for a ('data', 'model') mesh: the window batch
  shards over 'data' (gradients all-reduce over ICI), conv output channels
  shard over 'model' (tensor parallel) — placements from
  parallel/mesh.shard_params_for_tp, collectives inserted by XLA GSPMD.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


def gaussian_heatmap_labels(
    centers: jnp.ndarray,  # (..., 2) (cx, cy) in heatmap pixels; (0,0)=absent
    height: int,
    width: int,
    sigma: float = 2.5,
    mag: float = 1.0,
) -> jnp.ndarray:
    """Binary-disc labels (parity with dataset.py:431-440: pixels within
    SIGMA of (cx+1, cy+1) on a 1-based grid are 1, else 0; absent balls
    yield an all-zero map)."""
    cx = centers[..., 0]
    cy = centers[..., 1]
    xs = jnp.arange(1, width + 1, dtype=jnp.float32)
    ys = jnp.arange(1, height + 1, dtype=jnp.float32)
    d2 = (ys[:, None] - (cy[..., None, None] + 1.0)) ** 2 + (
        xs[None, :] - (cx[..., None, None] + 1.0)
    ) ** 2
    disc = (d2 <= sigma**2).astype(jnp.float32) * mag
    present = ~((cx == 0) & (cy == 0))
    return disc * present[..., None, None].astype(jnp.float32)


def weighted_bce_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Focal-weighted BCE (TrackNetV3's WBCE): hard positives and hard
    negatives are up-weighted quadratically."""
    eps = 1e-7
    p = jnp.clip(pred, eps, 1 - eps)
    pos = (1 - p) ** 2 * target * jnp.log(p)
    neg = p**2 * (1 - target) * jnp.log(1 - p)
    return -jnp.mean(pos + neg)


@dataclass
class TrackNetTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    # step is a pytree CHILD (traced array), not aux data: as aux it would
    # be part of the static treedef and every increment would force a full
    # retrace/recompile of the jitted train step.
    step: Any = 0


def make_tracknet_train_step(
    model,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """Build a jittable train step: (state, x (B,H,W,C_in), labels
    (B,H,W,L)) -> (state, loss). Shard x/labels over 'data' and params over
    'model' (parallel/mesh.py) before calling; GSPMD handles the rest."""

    def loss_fn(params, batch_stats, x, labels):
        pred, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        return weighted_bce_loss(pred, labels), updates["batch_stats"]

    def train_step(state: TrackNetTrainState, x, labels):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, labels
        )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrackNetTrainState(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    return train_step


def init_train_state(
    model, example_input: jnp.ndarray, optimizer: optax.GradientTransformation
) -> TrackNetTrainState:
    variables = model.init(jax.random.PRNGKey(0), example_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrackNetTrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=0,
    )


jax.tree_util.register_pytree_node(
    TrackNetTrainState,
    lambda s: ((s.params, s.batch_stats, s.opt_state, s.step), None),
    lambda _, children: TrackNetTrainState(*children),
)
