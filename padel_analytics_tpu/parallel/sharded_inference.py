"""SPMD sliding-window inference with halo exchange over the frame axis.

This is the context-parallel analog for video: the clip's frame axis
shards across the 'data' mesh axis, each device computes the TrackNet
windows *starting* in its shard, and the two inter-device dependencies are
satisfied by ring ppermutes over ICI:

1. frame halo: a window starting near the end of a shard needs the first
   seq_len-1 frames of the next shard;
2. prediction halo: the overlap ensemble for a frame needs the seq_len-1
   windows preceding it, which may live on the previous device.

The reference's equivalent is a single-process rolling buffer
(/root/reference/trackers/ball_tracker/ball_tracker.py:421-523); sharding
the clip this way is the design SURVEY.md §5 calls for ("sharding the
clip's frame/window axis across devices with halo exchange of seq_len-1
frames at shard edges").
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ensemble import overlap_ensemble_coefficients
from ..ops.heatmap import decode_heatmaps
from ..trackers._ballwindow import assemble_windows


# Compiled sharded programs, keyed by everything that shapes the program
# (mesh, apply_fn identity, window/shard geometry, modes). Without this,
# every call re-wrapped a FRESH closure in jax.jit(shard_map(...)) and
# paid a full XLA compile — the round-4 "mesh overhead regression"
# (BENCH_r04 parity 0.459): run_mesh's timed passes were recompiling the
# whole TrackNet window program each run. Model weights and the
# valid-frame count are runtime ARGUMENTS (not closure constants), so
# weight updates and clip-length changes with the same shard geometry
# reuse the compiled program.
_PROGRAM_CACHE: dict = {}


def sharded_window_inference(
    apply_fn: Callable,
    frames: np.ndarray,  # (N, H, W, C_f) uint8 preprocessed frame channels
    median: np.ndarray,  # (H, W, 3) uint8 resized median ('concat' only)
    mesh: Mesh,
    seq_len: int = 8,
    eval_mode: str = "weight",
    bg_mode: str = "concat",
    stride: int = 1,
    variables=None,
):
    """Run the full TrackNet window/ensemble/decode pipeline with the frame
    axis sharded over mesh axis 'data'. Returns host (cx, cy, vis) int32
    arrays of length N (identical to the single-device path).

    apply_fn: (frames_f32 (B, H, W, C_in)) -> heatmaps (B, H, W, L), or
    (variables, frames_f32) -> heatmaps when `variables` is given. Pass
    variables explicitly for production use: the weights then enter the
    compiled program as runtime inputs (replicated over the mesh) instead
    of baked-in constants, so the program is compiled ONCE per
    (mesh, geometry) and reused across calls and weight updates. Keep
    apply_fn itself a stable object (not a fresh lambda per call) — it is
    part of the program cache key.

    stride=seq_len selects the nonoverlap fast mode (one forward per
    disjoint window, no temporal ensemble — FusedPipeline ball_stride
    docs); windows never cross shard edges there, so BOTH halos (and all
    collectives) disappear: pure local compute over the sharded frame
    axis."""
    n_frames = frames.shape[0]
    d = mesh.shape["data"]
    if n_frames < seq_len:
        raise ValueError("clip shorter than seq_len")
    if stride not in (1, seq_len):
        raise ValueError(f"stride must be 1 or seq_len, got {stride}")
    if stride == seq_len:
        return _sharded_nonoverlap_inference(
            apply_fn, frames, median, mesh, seq_len, bg_mode, variables
        )

    # Pad so every device owns the same number of frames (and windows).
    shard = -(-n_frames // d)
    if shard < seq_len - 1:
        raise ValueError(
            f"frame shard ({shard}) smaller than the halo (seq_len-1="
            f"{seq_len - 1}); use fewer devices or a longer clip"
        )
    pad_total = shard * d - n_frames
    frames_p = np.concatenate(
        [frames, np.zeros((pad_total,) + frames.shape[1:], frames.dtype)]
    )
    coef = overlap_ensemble_coefficients(n_frames, seq_len, eval_mode)
    coef_p = np.concatenate(
        [coef, np.zeros((pad_total, seq_len), np.float32)]
    )

    l = seq_len

    key = ("halo", mesh, apply_fn, variables is None, l, bg_mode, shard, d,
           frames.shape[1:], str(frames.dtype))
    if key not in _PROGRAM_CACHE:

        def shard_fn(vars_rep, frames_local, coef_local, median_rep, n_valid):
            # frames_local: (shard, H, W, 3); coef_local: (shard, L).
            axis = "data"
            idx = jax.lax.axis_index(axis)

            # ---- frame halo from the RIGHT neighbor (next shard) ----
            head = frames_local[: l - 1]
            halo = jax.lax.ppermute(
                head, axis, perm=[((i + 1) % d, i) for i in range(d)]
            )
            ext = jnp.concatenate([frames_local, halo], axis=0)  # (shard+L-1, ...)

            # ---- window assembly + model ----
            x = assemble_windows(
                ext.astype(jnp.float32), median_rep, bg_mode, l, shard
            )
            y = apply_fn(x) if vars_rep is None else apply_fn(vars_rep, x)
            y = jnp.transpose(y, (0, 3, 1, 2)).astype(jnp.float32)  # (shard, L, H, W)

            # Zero out windows that start beyond the last valid window
            # (their frames are padding; the ensemble coefficients for
            # real frames never reference them, but keep the buffer clean
            # regardless).
            win_start = idx * shard + jnp.arange(shard)
            y = jnp.where(
                (win_start <= n_valid - l)[:, None, None, None], y, 0.0
            )

            # ---- prediction halo from the LEFT neighbor ----
            tail = y[-(l - 1) :]
            left = jax.lax.ppermute(
                tail, axis, perm=[(i, (i + 1) % d) for i in range(d)]
            )
            # Device 0's left halo must be zeros (no windows before the clip).
            left = jnp.where(idx == 0, jnp.zeros_like(left), left)
            buf = jnp.concatenate([left, y], axis=0)  # (shard + L - 1, L, H, W)

            # ---- overlap ensemble for the local frames (static slices) ----
            ens = sum(
                coef_local[:, j, None, None] * buf[j : j + shard, l - 1 - j]
                for j in range(l)
            )

            cx, cy, vis = decode_heatmaps(ens)
            return cx, cy, vis

        spec_frames = P("data")
        _PROGRAM_CACHE[key] = jax.jit(
            jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(), spec_frames, spec_frames, P(), P()),
                out_specs=(P("data"), P("data"), P("data")),
            )
        )
    fn = _PROGRAM_CACHE[key]
    spec_frames = P("data")
    # make_array_from_callback (not device_put): works identically when
    # the mesh spans multiple PROCESSES — each host materializes only its
    # addressable shards from the (replicated) host-side frame array.
    frames_dev = _global_array(frames_p, NamedSharding(mesh, spec_frames))
    coef_dev = _global_array(coef_p, NamedSharding(mesh, spec_frames))
    median_dev = _global_array(np.asarray(median), NamedSharding(mesh, P()))
    cx, cy, vis = fn(
        variables, frames_dev, coef_dev, median_dev, np.int32(n_frames)
    )
    return (
        _host_array(cx)[:n_frames],
        _host_array(cy)[:n_frames],
        _host_array(vis)[:n_frames],
    )


def _sharded_nonoverlap_inference(
    apply_fn: Callable,
    frames: np.ndarray,
    median: np.ndarray,
    mesh: Mesh,
    seq_len: int,
    bg_mode: str,
    variables=None,
):
    """Nonoverlap (stride = seq_len) sharded window inference: each shard
    holds whole disjoint windows, so there is no frame halo, no prediction
    halo, and no ensemble — one local forward per L frames per device."""
    n_frames = frames.shape[0]
    d = mesh.shape["data"]
    l = seq_len
    # Every device owns an integral number of whole windows.
    shard = -(-n_frames // (l * d)) * l
    pad_total = shard * d - n_frames
    frames_p = np.concatenate(
        [frames, np.zeros((pad_total,) + frames.shape[1:], frames.dtype)]
    )

    key = ("nonoverlap", mesh, apply_fn, variables is None, l, bg_mode,
           shard, d, frames.shape[1:], str(frames.dtype))
    if key not in _PROGRAM_CACHE:

        def shard_fn(vars_rep, frames_local, median_rep):
            nwin = shard // l
            fr = frames_local.astype(jnp.float32).reshape(
                (nwin, l) + frames_local.shape[1:]
            )
            parts = [fr[:, j] for j in range(l)]
            if bg_mode == "concat":
                med = jnp.broadcast_to(
                    median_rep[None].astype(jnp.float32),
                    (nwin,) + median_rep.shape,
                )
                parts = [med] + parts
            x = jnp.concatenate(parts, axis=-1) / 255.0
            y = apply_fn(x) if vars_rep is None else apply_fn(vars_rep, x)
            heat = (
                jnp.transpose(y, (0, 3, 1, 2))
                .astype(jnp.float32)
                .reshape((shard,) + y.shape[1:3])
            )
            return decode_heatmaps(heat)

        spec_frames = P("data")
        _PROGRAM_CACHE[key] = jax.jit(
            jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(), spec_frames, P()),
                out_specs=(P("data"), P("data"), P("data")),
            )
        )
    fn = _PROGRAM_CACHE[key]
    spec_frames = P("data")
    frames_dev = _global_array(frames_p, NamedSharding(mesh, spec_frames))
    median_dev = _global_array(np.asarray(median), NamedSharding(mesh, P()))
    cx, cy, vis = fn(variables, frames_dev, median_dev)
    return (
        _host_array(cx)[:n_frames],
        _host_array(cy)[:n_frames],
        _host_array(vis)[:n_frames],
    )


def _global_array(host: np.ndarray, sharding) -> jax.Array:
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )


def _host_array(x: jax.Array) -> np.ndarray:
    """Fetch a (possibly multi-process) sharded array to every host."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
