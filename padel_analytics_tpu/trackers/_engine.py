"""Shared device-engine plumbing for the trackers.

Each tracker owns an `Engine`: a Flax model + variables resident in HBM
for the whole run (the reference shuffles one torch model at a time
on/off the GPU — runner.py:212,230 — which this design deletes), plus a
cache of jit-compiled step functions keyed by input shape.

Checkpoint resolution: `.pt` files go through models/convert.py (so the
reference's own weights load), `.msgpack` is flax serialization, a
directory is an orbax checkpoint, None means random init (architecture
exercised without weights).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization
from flax.core import freeze


def load_variables(model, example_input, path: Optional[str], convert_fn=None):
    """Initialize model variables, optionally from a checkpoint."""
    rng = jax.random.PRNGKey(0)
    # jit the init: eager init dispatches every op individually, which is
    # minutes of round-trips on a tunneled device; compiled it's one call.
    if isinstance(example_input, (tuple, list)):
        variables = jax.jit(lambda r: model.init(r, *example_input))(rng)
    else:
        variables = jax.jit(lambda r: model.init(r, example_input))(rng)
    if path is None:
        return variables
    path = str(path)
    if not os.path.exists(path):
        print(f"engine: checkpoint {path} not found; using random init")
        return variables
    if path.endswith(".pt") or path.endswith(".pth"):
        if convert_fn is None:
            raise ValueError("no torch converter provided for .pt checkpoint")
        loaded = convert_fn(path)
        return _merge_variables(variables, loaded)
    if path.endswith(".msgpack"):
        with open(path, "rb") as f:
            return serialization.from_bytes(variables, f.read())
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path), target=jax.tree.map(np.asarray, variables))
        return restored
    raise ValueError(f"unrecognized checkpoint format: {path}")


def save_variables(variables, path: str) -> None:
    path = str(path)
    if path.endswith(".msgpack"):
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(variables))
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), jax.tree.map(np.asarray, variables))
        ckptr.wait_until_finished()


def _merge_variables(init_vars, loaded, allow_partial: bool = False) -> dict:
    """Overlay converted weights onto an init tree, validating shapes.

    A checkpoint that covers only part of the model would otherwise run
    silently with random-init layers producing garbage, so missing keys
    raise unless the caller explicitly opts into allow_partial=True.
    """
    missing: list[str] = []

    def merge(a, b, path=""):
        if isinstance(a, dict) or hasattr(a, "items"):
            out = {}
            for k in a:
                if b is not None and k in b:
                    out[k] = merge(a[k], b[k], f"{path}/{k}")
                else:
                    missing.append(f"{path}/{k}")
                    out[k] = a[k]
            extra = set(b or ()) - set(a)
            if extra:
                raise ValueError(f"converted weights have unknown keys at {path}: {extra}")
            return out
        arr = np.asarray(b)
        if arr.shape != tuple(np.shape(a)):
            raise ValueError(
                f"shape mismatch at {path}: ckpt {arr.shape} vs model {np.shape(a)}"
            )
        return jnp.asarray(arr, dtype=jnp.asarray(a).dtype)

    plain = serialization.to_state_dict(init_vars)
    merged = merge(plain, loaded)
    if missing:
        if not allow_partial:
            raise ValueError(
                f"checkpoint is missing {len(missing)} weight(s): "
                f"{missing[:8]}{'...' if len(missing) > 8 else ''}; pass "
                "allow_partial=True to keep random init for them"
            )
        for path in missing:
            print(f"engine: missing converted weight at {path}; keeping init")
    return serialization.from_state_dict(init_vars, merged)


class Engine:
    """Model + variables + shape-keyed jitted step cache."""

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        self._cache: dict[Any, Callable] = {}

    def jit_step(self, key, build: Callable[[], Callable]) -> Callable:
        if key not in self._cache:
            self._cache[key] = jax.jit(build())
        return self._cache[key]


def pad_batch(arr: np.ndarray, batch: int) -> tuple[np.ndarray, int]:
    """Pad the leading axis up to `batch` (stable jit shapes for the tail
    chunk); returns (padded, n_real)."""
    n = arr.shape[0]
    if n == batch:
        return arr, n
    pad = np.zeros((batch - n,) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0), n
