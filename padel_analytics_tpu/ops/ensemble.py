"""Temporal overlap-ensemble for sliding-window sequence models.

The ball tracker slides length-L windows with stride 1 over the clip and
reconstructs per-frame outputs by averaging each frame's prediction across
all (up to L) windows covering it, with triangular positional weights in
steady state and uniform averaging at the clip edges
(/root/reference/trackers/ball_tracker/ball_tracker.py:421-523, weights
:68-97). This is the blocked-over-sequence pattern of ring/blockwise
attention; here it is expressed as a closed-form gather-and-weight that
XLA vectorizes over frames, plus a streaming variant used by the chunked
device pipeline.

Semantics replicated exactly:
- frame f < L-1 (head):      uniform mean over the f+1 covering windows;
- L-1 <= f <= N_w-1 (body):  triangular weights over all L windows;
- f > N_w-1 (tail):          uniform mean over the N_w - (f - L + 1)
                             covering windows (ball_tracker.py:486-509).
where N_w = num_frames - L + 1 windows.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp


def get_ensemble_weight(seq_len: int, eval_mode: str = "weight") -> np.ndarray:
    """Positional ensemble weights (parity with ball_tracker.py:68-97)."""
    if eval_mode == "average":
        weight = np.ones(seq_len) / seq_len
    elif eval_mode == "weight":
        weight = np.ones(seq_len)
        for i in range(math.ceil(seq_len / 2)):
            weight[i] = i + 1
            weight[seq_len - i - 1] = i + 1
        weight = weight / weight.sum()
    else:
        raise ValueError("Invalid mode")
    return weight.astype(np.float32)


def overlap_ensemble_coefficients(
    num_frames: int, seq_len: int, eval_mode: str = "weight"
) -> np.ndarray:
    """(num_frames, seq_len) coefficient table C such that

        out[f] = sum_j C[f, j] * Y[f - (L-1) + j, (L-1) - j]

    with Y the (num_windows, L, ...) window predictions, zero-padded for
    out-of-range window indices. Precomputed on host (static shapes)."""
    num_windows = num_frames - seq_len + 1
    if num_windows < 1:
        raise ValueError("clip shorter than seq_len")
    weight = get_ensemble_weight(seq_len, eval_mode)
    coef = np.zeros((num_frames, seq_len), dtype=np.float32)
    for f in range(num_frames):
        # window index for slot j: w = f - (L-1) + j
        valid = np.array(
            [0 <= f - (seq_len - 1) + j < num_windows for j in range(seq_len)]
        )
        if f > num_windows - 1:
            # Tail: the reference divides by (seq_len - frame_i) which
            # counts the leading zero-buffer rows as windows when the clip
            # is shorter than 2L-1 (ball_tracker.py:497-501) — replicated
            # exactly, quirk included.
            coef[f, valid] = 1.0 / (num_windows + seq_len - 1 - f)
        elif f < seq_len - 1:
            coef[f, valid] = 1.0 / valid.sum()
        else:
            coef[f] = weight
    return coef


@functools.partial(jax.jit, static_argnames=("seq_len",))
def ensemble_full(
    window_preds: jnp.ndarray,  # (N_w, L, ...) predictions per window
    coefficients: jnp.ndarray,  # (num_frames, L)
    seq_len: int,
) -> jnp.ndarray:
    """Whole-clip ensemble: returns (num_frames, ...) combined predictions."""
    num_windows = window_preds.shape[0]
    num_frames = coefficients.shape[0]
    l = seq_len
    pad = [(l - 1, l - 1)] + [(0, 0)] * (window_preds.ndim - 1)
    padded = jnp.pad(window_preds, pad)

    frame_ids = jnp.arange(num_frames)
    j_ids = jnp.arange(l)
    # padded window index for (f, j): f + j  (since w = f-(L-1)+j, pad L-1)
    w_idx = frame_ids[:, None] + j_ids[None, :]
    s_idx = (l - 1) - j_ids  # slot within window
    gathered = padded[w_idx, s_idx[None, :]]  # (num_frames, L, ...)
    coef = coefficients.reshape(
        coefficients.shape + (1,) * (gathered.ndim - 2)
    )
    del num_windows
    return jnp.sum(gathered * coef, axis=1)


class StreamingEnsembler:
    """Streaming variant: consume window predictions chunk by chunk and emit
    ensembled per-frame outputs incrementally with O(L * chunk) memory.

    Mirrors the rolling y_pred_buffer logic at ball_tracker.py:421-523 but
    as a carried device buffer instead of host-side torch.cat.
    """

    def __init__(self, num_frames: int, seq_len: int, eval_mode: str = "weight"):
        self.num_frames = num_frames
        self.seq_len = seq_len
        self.num_windows = num_frames - seq_len + 1
        self.coefficients = jnp.asarray(
            overlap_ensemble_coefficients(num_frames, seq_len, eval_mode)
        )
        self._carry = None  # last L-1 windows
        self._emitted = 0  # frames emitted so far
        self._consumed = 0  # windows consumed so far

    def update(self, window_preds: jnp.ndarray) -> jnp.ndarray:
        """Feed (B, L, ...) consecutive window predictions; returns the
        newly-computable ensembled frames (B', ...)."""
        l = self.seq_len
        if self._carry is None:
            shape = (l - 1,) + tuple(window_preds.shape[1:])
            self._carry = jnp.zeros(shape, window_preds.dtype)
        buf = jnp.concatenate([self._carry, window_preds], axis=0)
        b = window_preds.shape[0]

        # Frames computable with this chunk: one per consumed window.
        start_f = self._consumed
        coef = jax.lax.dynamic_slice_in_dim(
            self.coefficients, start_f, b, axis=0
        )
        # out[f] for f in [start_f, start_f+b): uses buf rows local
        # (f - start_f) .. (f - start_f + L - 1).
        j_ids = jnp.arange(l)
        rows = jnp.arange(b)[:, None] + j_ids[None, :]
        s_idx = (l - 1) - j_ids
        gathered = buf[rows, s_idx[None, :]]
        c = coef.reshape(coef.shape + (1,) * (gathered.ndim - 2))
        out = jnp.sum(gathered * c, axis=1)

        self._consumed += b
        self._emitted += b
        self._carry = buf[-(l - 1) :]
        return out

    def finalize(self) -> jnp.ndarray:
        """Emit the trailing L-1 frames (uniform tail averaging)."""
        l = self.seq_len
        assert self._consumed == self.num_windows, "not all windows consumed"
        n_tail = self.num_frames - self._emitted
        if n_tail == 0:
            return jnp.zeros((0,) + tuple(self._carry.shape[1:]), self._carry.dtype)
        pad_shape = (l - 1,) + tuple(self._carry.shape[1:])
        buf = jnp.concatenate(
            [self._carry, jnp.zeros(pad_shape, self._carry.dtype)], axis=0
        )
        coef = self.coefficients[self._emitted :]
        j_ids = jnp.arange(l)
        rows = jnp.arange(n_tail)[:, None] + j_ids[None, :]
        s_idx = (l - 1) - j_ids
        gathered = buf[rows, s_idx[None, :]]
        c = coef.reshape(coef.shape + (1,) * (gathered.ndim - 2))
        out = jnp.sum(gathered * c, axis=1)
        self._emitted = self.num_frames
        return out
