"""TrackNet input construction for all four background modes.

Parity targets (/root/reference/trackers/ball_tracker/iterable.py:167-199,
ball_tracker.py:40-58):

- ``''``            3 channels/frame: PIL-bicubic squash resize to model res.
- ``'subtract'``    1 channel/frame: sum over channels of |frame - median|
                    at SOURCE resolution, cast to uint8 (which WRAPS mod
                    256 — sums up to 765 overflow, a reference quirk kept
                    for parity), then resized.
- ``'subtract_concat'`` 4 channels/frame: the 3-channel resize plus the
                    1-channel difference image.
- ``'concat'``      3 channels/frame plus the uint8-cast resized median
                    image prepended once per window.

The window tensor concatenates the per-frame channel groups in frame
order (median first for 'concat'), matching the reference's CHW stacking
translated to NHWC, and divides by 255.

Device design: each frame is preprocessed ONCE into its channel group
(the reference recomputes every frame in all seq_len windows covering
it); windows are assembled by static slicing over a carried frame
context, so the hot path stays fusion-friendly under jit.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops.resize import resize_plan

_FRAME_CHANNELS = {"": 3, "subtract": 1, "subtract_concat": 4, "concat": 3}


def frame_channels(bg_mode: str) -> int:
    """Channels per preprocessed frame for a background mode."""
    return _FRAME_CHANNELS[bg_mode]


def median_model_resolution(
    median, height: int, width: int, bg_mode: str
):
    """Median background at TrackNet model resolution.

    'concat': PIL-parity bicubic resize of the uint8-cast median with
    Pillow's rounding (iterable.py:76-81 — including the reference's
    float-median -> uint8 pre-cast quirk). Other modes get a zeros
    placeholder that keeps the window-step signature but is never
    consumed. The ONE copy shared by the sequential ball path and the
    fused pipeline's setup so the parity-critical recipe cannot diverge.
    """
    import numpy as np

    if bg_mode != "concat":
        return np.zeros((height, width, 3), np.uint8)
    plan = resize_plan(median.shape[:2], (height, width), "pil_bicubic")
    med = jnp.asarray(median.astype(np.uint8).astype(np.float32))
    out = np.asarray(plan.apply(med))
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def window_in_dim(bg_mode: str, seq_len: int) -> int:
    """TrackNet input channel count (get_model, ball_tracker.py:52-58).
    Delegates to make_tracknet so the parity-critical formula lives in
    exactly one place."""
    from ..models.tracknet import make_tracknet

    return make_tracknet(seq_len, bg_mode)[1]


def make_frame_preprocess(
    src_hw: tuple[int, int],
    dst_hw: tuple[int, int],
    bg_mode: str,
):
    """Build the jittable per-frame preprocess for one background mode.

    Returns ``fn(frames, median_src=None, swap=None) -> (B, H, W, C_f)``
    float32 holding exact PIL-uint8 values in [0, 255]:

    - frames: (B, Hs, Ws, 3) uint8/float source frames (RGB)
    - median_src: (Hs, Ws, 3) float32 EXACT median (may hold .5 values —
      np.median semantics) — required for the subtract modes
    - swap: optional (B,) flags; frames with flag > 0 are channel-reversed
      BEFORE the difference/resize (the reference's median-buffer
      double-conversion quirk, iterable.py:63-64,160)
    """
    plan = resize_plan(src_hw, dst_hw, "pil_bicubic")
    needs_rgb = bg_mode in ("", "concat", "subtract_concat")
    needs_diff = bg_mode in ("subtract", "subtract_concat")

    def pre(frames, median_src=None, swap=None):
        x = frames.astype(jnp.float32)
        if swap is not None:
            x = jnp.where(swap[:, None, None, None] > 0, x[..., ::-1], x)
        outs = []
        if needs_rgb:
            rgb = plan.apply(x)
            outs.append(jnp.clip(jnp.floor(rgb + 0.5), 0, 255))
        if needs_diff:
            diff = jnp.sum(jnp.abs(x - median_src[None]), axis=-1)
            # .astype('uint8') of the float sum: truncate then wrap mod 256.
            diff = jnp.mod(jnp.floor(diff), 256.0)
            g = plan.apply(diff[..., None])
            outs.append(jnp.clip(jnp.floor(g + 0.5), 0, 255))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)

    return pre


def assemble_windows(
    frames_ext: jnp.ndarray,
    median_resized: Optional[jnp.ndarray],
    bg_mode: str,
    seq_len: int,
    batch: int,
) -> jnp.ndarray:
    """Assemble (batch, H, W, in_dim) normalized window tensors.

    frames_ext: (batch + seq_len - 1, H, W, C_f) preprocessed frame
    channel groups (float32 uint8-values); window w uses frames
    [w, w + seq_len). median_resized: (H, W, 3) uint8-valued resized
    median, 'concat' mode only.
    """
    parts = [
        frames_ext[j : j + batch].astype(jnp.float32) for j in range(seq_len)
    ]
    if bg_mode == "concat":
        med = jnp.broadcast_to(
            median_resized[None].astype(jnp.float32),
            (batch,) + median_resized.shape,
        )
        parts = [med] + parts
    return jnp.concatenate(parts, axis=-1) / 255.0
