"""Device mesh construction and sharding rules.

The reference has no parallelism at all (SURVEY.md §2c: one model on the
GPU at a time, sequential passes). The TPU framework scales along two mesh
axes:

- 'data': the frame/window batch axis — inference is embarrassingly
  parallel over frames, so this is the primary scaling axis (ICI
  all-gathers only at the host boundary for ByteTrack/render);
- 'model': tensor-parallel axis — conv output channels shard across it,
  and XLA GSPMD inserts the reduce-scatters/all-gathers between layers.

Multi-host: call `init_distributed()` first (jax.distributed), then
`make_mesh` lays devices out so 'model' rides ICI within a host and
'data' spans hosts (DCN-friendly).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization (no-op when no coordinator is given).

    On the CPU backend, cross-process collectives need the gloo
    implementation (used by the 2-process dry-run test; on TPU pods the
    ICI/DCN transport is native and this config is ignored)."""
    if not coordinator:
        return
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older/newer jax without the knob
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Create a ('data', 'model') mesh. data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/frame) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_for_tp(params, mesh: Mesh) -> "jax.Array":
    """Tensor-parallel parameter placement: conv/dense kernels shard their
    output-channel (last) axis over 'model' when divisible; everything else
    replicates. XLA GSPMD propagates these shardings through the network
    and inserts the collectives."""
    model_size = mesh.shape["model"]

    def place(x):
        x = np.asarray(x) if not hasattr(x, "shape") else x
        if (
            model_size > 1
            and x.ndim >= 2
            and x.shape[-1] % model_size == 0
            and x.shape[-1] >= model_size * 8
        ):
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)
