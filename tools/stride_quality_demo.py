"""Quantify the nonoverlap ball fast mode's quality trade on a TRAINED
TrackNet (round-4: ball_stride/window_stride = seq_len).

Trains the TrackNet step on a synthetic rally (tools/convergence_demo.py
harness), then runs the SAME trained weights through the real BallTracker
end to end twice — stride-1 rolling ensemble (reference behavior) vs the
nonoverlap fast mode — and reports detect-rate / within-4px / mean-px
against ground truth for both.

  python tools/stride_quality_demo.py [--steps 80] [--frames 160]

The reference ships only the stride-1 ensemble (ball_tracker.py:70-97);
this demo is the evidence that the ~8x-cheaper mode is a measured,
bounded quality trade rather than a blind knob.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:  # invoked as a script from tools/
    from convergence_demo import _force_cpu, make_rally
except ImportError:  # imported as tools.stride_quality_demo (tests)
    from tools.convergence_demo import _force_cpu, make_rally


def _tracker_eval(clip, variables, stride: int, seq_len: int, h: int, w: int):
    import jax.numpy as jnp

    from padel_analytics_tpu.config import BallTrackerConfig
    from padel_analytics_tpu.trackers import BallTracker
    from padel_analytics_tpu.utils.video import VideoInfo

    n = clip.frames.shape[0]
    cfg = BallTrackerConfig(
        height=h, width=w, batch_size=8, median_max_sample_num=min(n, 64),
        seq_len=seq_len, window_stride=stride,
    )
    tr = BallTracker(
        None, None, config=cfg, compute_dtype=jnp.float32,
        channel_quirk=False, use_inpaintnet=False,
    )
    tr.tracknet.variables = variables
    tr.video_info_post_init(
        VideoInfo(width=w, height=h, fps=30.0, total_frames=n)
    )
    balls = tr.predict_frames(iter([f for f in clip.frames]), n)
    pred = np.asarray([[b.xy[0], b.xy[1]] for b in balls], np.float32)
    vis = np.asarray([b.visibility for b in balls], bool)
    gt = clip.coords[: len(balls)]
    dist = np.full(len(balls), np.inf)
    dist[vis] = np.hypot(pred[vis, 0] - gt[vis, 0], pred[vis, 1] - gt[vis, 1])
    return {
        "detect_rate": float(vis.mean()),
        "within_4px": float((dist <= 4.0).mean()),
        "mean_px": float(dist[np.isfinite(dist)].mean())
        if vis.any() else float("inf"),
    }


def run_demo(steps: int = 80, h: int = 48, w: int = 80, n: int = 160,
             batch: int = 4, seq_len: int = 8, lr: float = 2e-3,
             verbose: bool = True, force_cpu: bool = True):
    if force_cpu:
        _force_cpu()
    import jax
    import jax.numpy as jnp
    import optax

    from padel_analytics_tpu.models.tracknet import make_tracknet
    from padel_analytics_tpu.training.data import window_batches
    from padel_analytics_tpu.training.tracknet import (
        init_train_state,
        make_tracknet_train_step,
    )

    rng = np.random.default_rng(0)
    clip = make_rally(n, h, w, rng)

    model, in_dim = make_tracknet(seq_len, "concat", dtype=jnp.float32)
    optimizer = optax.adam(lr)
    example = jnp.zeros((1, h, w, in_dim), jnp.float32)
    state = init_train_state(model, example, optimizer)

    step_fn = jax.jit(make_tracknet_train_step(model, optimizer))
    step = 0
    key = jax.random.PRNGKey(0)
    while step < steps:
        key, sub = jax.random.split(key)
        for x, labels in window_batches(
            clip, seq_len=seq_len, batch_size=batch, rng=rng, jax_rng=sub
        ):
            state, _ = step_fn(state, x, labels)
            step += 1
            if step >= steps:
                break

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    r1 = _tracker_eval(clip, variables, 1, seq_len, h, w)
    r8 = _tracker_eval(clip, variables, seq_len, seq_len, h, w)
    if verbose:
        print(f"stride-1 ensemble : {r1}", flush=True)
        print(f"stride-{seq_len} nonoverlap: {r8}", flush=True)
    return {"stride1": r1, "nonoverlap": r8}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--frames", type=int, default=160)
    args = ap.parse_args()
    run_demo(steps=args.steps, n=args.frames)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
