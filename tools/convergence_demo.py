"""TrackNet convergence demo on a generated synthetic rally.

Round-2 verdict item 10: show the train step actually LEARNS (decoded
ball positions converge to ground truth), not merely that loss decreases
for one step. Trains the real TrackNet architecture at reduced spatial
resolution on an in-memory synthetic rally and evaluates decoded
positions against ground truth before/after.

  python tools/convergence_demo.py [--steps 80] [--h 48 --w 80]

Exposes `run_demo()` for tests/test_convergence_demo.py.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force_cpu():
    """Training at toy scale belongs on the CPU backend — and must not
    contend with chip benchmarks. The image's sitecustomize pins
    JAX_PLATFORMS=axon, so the env var alone is not enough
    (.claude/skills/verify)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def make_rally(n: int, h: int, w: int, rng: np.random.Generator):
    """Synthetic rally at model resolution: bright ball on a noisy court-
    like background, smooth trajectory. Returns a training/data.RallyClip."""
    import cv2

    from padel_analytics_tpu.training.data import RallyClip

    frames = np.zeros((n, h, w, 3), np.uint8)
    coords = np.zeros((n, 2), np.float32)
    t = np.linspace(0, 3 * np.pi, n)
    xs = (w * 0.12) + (w * 0.76) * (0.5 + 0.5 * np.sin(t))
    ys = (h * 0.25) + (h * 0.5) * (0.5 + 0.5 * np.sin(2.3 * t + 1.0))
    for i in range(n):
        f = np.full((h, w, 3), 45, np.uint8)
        cv2.rectangle(f, (w // 10, h // 8), (w - w // 10, h - h // 8),
                      (80, 120, 80), 1)
        f += rng.integers(0, 8, f.shape, dtype=np.uint8)
        cv2.circle(f, (int(xs[i]), int(ys[i])), 2, (250, 250, 120), -1)
        frames[i] = f
        coords[i] = (int(xs[i]), int(ys[i]))
    median = np.median(frames, axis=0).astype(np.uint8)
    return RallyClip(
        frames=frames,
        coords=np.trunc(coords),
        visibility=np.ones(n, np.float32),
        median=median,
        coords_src=coords,
    )


def decode_positions(model, variables, clip, seq_len, batch):
    """Run inference over stride-seq_len windows; decode per-frame ball
    positions from the raw heatmaps. Returns (N_eval, 2) float, -1 where
    no blob cleared the threshold."""
    import jax.numpy as jnp

    from padel_analytics_tpu.ops.heatmap import decode_heatmaps

    n, h, w = clip.frames.shape[:3]
    med = jnp.asarray(clip.median.astype(np.float32))
    outs = []
    idxs = []
    for lo in range(0, n - seq_len + 1, seq_len):
        window = clip.frames[lo : lo + seq_len].astype(np.float32)
        parts = [np.asarray(med)] + [window[j] for j in range(seq_len)]
        x = jnp.asarray(
            np.concatenate(parts, axis=-1)[None] / 255.0
        )  # (1, H, W, 27)
        y = model.apply(variables, x)  # (1, H, W, L)
        heat = jnp.transpose(y, (0, 3, 1, 2))[0]  # (L, H, W)
        cx, cy, vis = decode_heatmaps(heat)
        for j in range(seq_len):
            idxs.append(lo + j)
            if int(np.asarray(vis)[j]):
                outs.append((float(np.asarray(cx)[j]), float(np.asarray(cy)[j])))
            else:
                outs.append((-1.0, -1.0))
    return np.asarray(idxs), np.asarray(outs, np.float32)


def evaluate(model, variables, clip, seq_len, batch):
    idxs, pred = decode_positions(model, variables, clip, seq_len, batch)
    gt = clip.coords[idxs]
    found = pred[:, 0] >= 0
    dist = np.full(len(idxs), np.inf)
    dist[found] = np.hypot(
        pred[found, 0] - gt[found, 0], pred[found, 1] - gt[found, 1]
    )
    return {
        "detect_rate": float(found.mean()),
        "within_4px": float((dist <= 4.0).mean()),
        "mean_px": float(dist[np.isfinite(dist)].mean()) if found.any() else float("inf"),
    }


def run_demo(steps: int = 80, h: int = 48, w: int = 80, n: int = 72,
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

    def variables():
        return {"params": state.params, "batch_stats": state.batch_stats}

    before = evaluate(model, variables(), clip, seq_len, batch)
    if verbose:
        print(f"before training: {before}", flush=True)

    step_fn = jax.jit(make_tracknet_train_step(model, optimizer))
    losses = []
    step = 0
    key = jax.random.PRNGKey(0)
    while step < steps:
        key, sub = jax.random.split(key)
        for x, labels in window_batches(
            clip, seq_len=seq_len, batch_size=batch, rng=rng, jax_rng=sub
        ):
            state, loss = step_fn(state, x, labels)
            losses.append(float(loss))
            step += 1
            if verbose and step % 10 == 0:
                print(f"step {step}: loss {losses[-1]:.5f}", flush=True)
            if step >= steps:
                break

    after = evaluate(model, variables(), clip, seq_len, batch)
    if verbose:
        print(f"after {step} steps: {after}", flush=True)
        print(
            f"loss: first-5 mean {np.mean(losses[:5]):.5f} -> "
            f"last-5 mean {np.mean(losses[-5:]):.5f}", flush=True,
        )
    return {"before": before, "after": after, "losses": losses}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--h", type=int, default=48)
    ap.add_argument("--w", type=int, default=80)
    ap.add_argument("--frames", type=int, default=72)
    args = ap.parse_args()
    out = run_demo(steps=args.steps, h=args.h, w=args.w, n=args.frames)
    ok = out["after"]["within_4px"] >= 0.8
    print(f"convergence: {'OK' if ok else 'NOT CONVERGED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
