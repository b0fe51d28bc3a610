"""InpaintNet training convergence demo: gap-filling error in pixels.

Third sibling of tools/convergence_demo.py (TrackNet) and
tools/yolo_convergence_demo.py: shows the InpaintNet train step
(training/inpaintnet.py, the coordinate mode the reference defines at
dataset.py:304-358 but never ships a loop for) LEARNS the capability it
exists for — filling TrackNet drop-out gaps. Mean pixel error on masked
(inpainted) positions of a HELD-OUT rally drops from ~290 px (the
untrained net outputs ~frame-center) to ~62 px at 1280x720 — learned
interpolation across up-to-6-frame gaps of an unseen trajectory. (The
residual is the toy family's irreducible uncertainty: the gap's
frequency/phase must be inferred from ~10 jittered context points;
longer budgets with LR decay plateau at the same level.)

  python tools/inpaint_convergence_demo.py [--steps 1200]

Exposes `run_demo()` for tests/test_convergence_demo.py.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_WH = (1280, 720)
SEQ_LEN = 16


def _force_cpu():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def make_trajectory(rng: np.random.Generator, n: int):
    """Smooth rally-like 2-D trajectory in source pixels + full visibility.
    Frequency/amplitude/phase are drawn per rally so a training SET spans
    the trajectory family instead of one memorizable curve."""
    w, h = IMG_WH
    t = np.linspace(0, rng.uniform(3, 5) * np.pi, n)
    fx, fy = rng.uniform(0.8, 1.2), rng.uniform(1.4, 2.0)
    ax, ay = rng.uniform(0.25, 0.4), rng.uniform(0.2, 0.32)
    x = w * (0.5 + ax * np.sin(fx * t + rng.uniform(0, 2 * np.pi)))
    y = h * (0.45 + ay * np.sin(fy * t + rng.uniform(0, 2 * np.pi)))
    coords = np.stack([x, y], axis=-1).astype(np.float32)
    return coords, np.ones(n, np.float32)


def masked_px_error(model, params, rally):
    """Mean pixel error of the model's outputs on inpainted positions,
    over all stride-SEQ_LEN windows of a rally."""
    import jax.numpy as jnp

    from padel_analytics_tpu.training.data import coordinate_window_batches

    errs = []
    scale = np.asarray(rally.img_wh, np.float32)
    # batch_size=4 divides the eval rally's 12 stride-SEQ_LEN windows, so
    # ALL held-out windows are scored (the generator drops a trailing
    # partial batch).
    for coords, mask, target in coordinate_window_batches(
        rally, seq_len=SEQ_LEN, batch_size=4, sliding_step=SEQ_LEN
    ):
        pred = model.apply({"params": params}, coords, mask)
        d = np.asarray(pred - target) * scale
        m = np.asarray(mask)[..., 0] > 0
        if m.any():
            errs.append(np.hypot(d[..., 0], d[..., 1])[m])
    return float(np.concatenate(errs).mean()) if errs else float("nan")


def run_demo(steps: int = 400, n: int = 400, lr: float = 2e-3,
             verbose: bool = True, force_cpu: bool = True):
    if force_cpu:
        _force_cpu()
    import jax
    import jax.numpy as jnp
    import optax

    from padel_analytics_tpu.models.tracknet import InpaintNet
    from padel_analytics_tpu.training.data import (
        coordinate_window_batches,
        synthesize_inpaint_rally,
    )
    from padel_analytics_tpu.training.inpaintnet import make_inpaintnet_train_step
    from padel_analytics_tpu.training.tracknet import TrackNetTrainState

    rng = np.random.default_rng(0)
    train_rallies = []
    for _ in range(16):
        coords, vis = make_trajectory(rng, n)
        train_rallies.append(
            synthesize_inpaint_rally(coords, vis, IMG_WH, rng, max_gap=6)
        )
    ev_rng = np.random.default_rng(7)
    ev_coords, ev_vis = make_trajectory(ev_rng, n // 2)
    eval_rally = synthesize_inpaint_rally(
        ev_coords, ev_vis, IMG_WH, ev_rng, max_gap=6
    )

    model = InpaintNet()
    zc = jnp.zeros((1, SEQ_LEN, 2), jnp.float32)
    zm = jnp.zeros((1, SEQ_LEN, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), zc, zm)
    optimizer = optax.adam(lr)
    state = TrackNetTrainState(
        params=variables["params"], batch_stats={},
        opt_state=optimizer.init(variables["params"]),
    )
    step_fn = jax.jit(make_inpaintnet_train_step(model, optimizer))

    before = masked_px_error(model, state.params, eval_rally)
    if verbose:
        print(f"before training: masked px error {before:.1f}", flush=True)

    losses = []
    step = 0
    sweep = 0  # one full batch sweep per rally; NOT step-derived (step
    # advances by a fixed batch count per rally, which would alias onto
    # a subset of the rally list)
    while step < steps:
        rally = train_rallies[sweep % len(train_rallies)]
        sweep += 1
        for coords_b, mask_b, target_b in coordinate_window_batches(
            rally, seq_len=SEQ_LEN, batch_size=8, rng=rng, sliding_step=4
        ):
            state, loss = step_fn(state, coords_b, mask_b, target_b)
            losses.append(float(loss))
            step += 1
            if verbose and step % 50 == 0:
                print(f"step {step}: loss {losses[-1]:.6f}", flush=True)
            if step >= steps:
                break

    after = masked_px_error(model, state.params, eval_rally)
    if verbose:
        print(f"after {step} steps: masked px error {after:.1f}", flush=True)
    return {"before_px": before, "after_px": after, "losses": losses}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    args = ap.parse_args()
    out = run_demo(steps=args.steps)
    ok = out["after_px"] < 100.0 and out["after_px"] < out["before_px"] / 3.5
    print(f"convergence: {'OK' if ok else 'NOT CONVERGED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
