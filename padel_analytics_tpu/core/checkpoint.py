"""Checkpoint IO for model variables and training state.

The reference's checkpoint story (SURVEY.md §5): torch .pt loads with
param_dict hyperparameters, plus the JSON prediction cache for pipeline
resume. This module is the save side the reference lacks: orbax for
directory checkpoints (async, multi-host safe), flax msgpack for single
files. The JSON prediction cache lives with the trackers
(trackers/base.py) in the reference's own format.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_checkpoint(variables: Any, path: str) -> None:
    """Save a variable pytree: '.msgpack' -> flax bytes, else orbax dir."""
    if path.endswith(".msgpack"):
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(variables))
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.tree.map(np.asarray, variables))
    ckptr.wait_until_finished()


def load_checkpoint(target: Any, path: str) -> Any:
    """Restore into the structure of `target`."""
    if path.endswith(".msgpack"):
        with open(path, "rb") as f:
            return serialization.from_bytes(target, f.read())
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(
        os.path.abspath(path), target=jax.tree.map(np.asarray, target)
    )
