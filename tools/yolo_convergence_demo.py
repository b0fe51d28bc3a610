"""YOLOv8 detection-training convergence demo on synthetic scenes.

Companion to tools/convergence_demo.py (TrackNet): shows the detection
train step (training/yolo.py — TAL assigner + CIoU/DFL/BCE losses
matching ultralytics' loss math, reference players tracker workload
players_tracker.py:303) LEARNS in the evaluation metric, not merely
that loss decreases: mAP@0.5 over held-out synthetic scenes goes from
~0 to >=0.6 within ~150 steps of a from-scratch YOLOv8-n at 64x64.

  python tools/yolo_convergence_demo.py [--steps 150]

Exposes `run_demo()` for tests/test_convergence_demo.py.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HW = (64, 64)


def _force_cpu():
    """Toy-scale training belongs on the CPU backend (never contend with
    chip benchmarks); sitecustomize pins axon so the config update is
    required too (.claude/skills/verify)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def make_scenes(rng: np.random.Generator, n: int, m: int = 2):
    """n images with m bright rectangles each (the objects) on a dim
    noisy background. Returns (images f32 [0,1], labels, boxes, mask)."""
    h, w = HW
    images = rng.uniform(0.05, 0.15, (n, h, w, 3)).astype(np.float32)
    gt_boxes = np.zeros((n, m, 4), np.float32)
    gt_labels = np.zeros((n, m), np.int32)
    mask = np.zeros((n, m), bool)
    for i in range(n):
        for j in range(m):
            x1 = int(rng.integers(2, 34))
            y1 = int(rng.integers(2, 34))
            bw = int(rng.integers(14, 26))
            bh = int(rng.integers(14, 26))
            x2, y2 = min(x1 + bw, w - 1), min(y1 + bh, h - 1)
            gt_boxes[i, j] = [x1, y1, x2, y2]
            mask[i, j] = True
            shade = rng.uniform(0.75, 0.95)
            images[i, y1:y2, x1:x2] = shade
    return images, gt_labels, gt_boxes, mask


def evaluate_map(model, variables, images, gt_boxes, gt_mask, conf=0.25):
    """Forward + NMS + single-class mAP over a scene set."""
    import jax.numpy as jnp

    from padel_analytics_tpu.ops.nms import batched_nms
    from padel_analytics_tpu.training.evaluate import detection_map

    out = model.apply(variables, jnp.asarray(images))
    boxes, scores, _, _, valid = batched_nms(
        out["boxes"], out["scores"][..., 0],
        conf_thres=conf, iou_thres=0.5, max_det=8, top_k=64,
    )
    boxes, scores, valid = (np.asarray(a) for a in (boxes, scores, valid))
    pred_boxes = [b[v] for b, v in zip(boxes, valid)]
    pred_scores = [s[v] for s, v in zip(scores, valid)]
    gts = [g[m] for g, m in zip(gt_boxes, gt_mask)]
    return detection_map(pred_boxes, pred_scores, gts)


def run_demo(steps: int = 150, n_train: int = 16, n_eval: int = 8,
             batch: int = 4, lr: float = 2e-3, verbose: bool = True,
             force_cpu: bool = True):
    if force_cpu:
        _force_cpu()
    import jax
    import jax.numpy as jnp
    import optax

    from padel_analytics_tpu.models.yolov8 import YOLOv8
    from padel_analytics_tpu.training.yolo import (
        init_yolo_train_state,
        make_yolo_train_step,
    )

    rng = np.random.default_rng(0)
    tr_images, tr_labels, tr_boxes, tr_mask = make_scenes(rng, n_train)
    ev_images, _, ev_boxes, ev_mask = make_scenes(rng, n_eval)

    model = YOLOv8(variant="n", num_classes=1)
    optimizer = optax.adam(lr)
    state = init_yolo_train_state(
        model, jnp.zeros((1,) + HW + (3,), jnp.float32), optimizer
    )
    step_fn = jax.jit(make_yolo_train_step(model, optimizer, HW))

    def variables():
        return {"params": state.params, "batch_stats": state.batch_stats}

    before = evaluate_map(model, variables(), ev_images, ev_boxes, ev_mask)
    if verbose:
        print(f"before training: {before}", flush=True)

    losses = []
    step = 0
    while step < steps:
        order = rng.permutation(n_train)
        for lo in range(0, n_train, batch):
            sel = order[lo : lo + batch]
            state, loss = step_fn(
                state,
                jnp.asarray(tr_images[sel]),
                jnp.asarray(tr_labels[sel]),
                jnp.asarray(tr_boxes[sel]),
                jnp.asarray(tr_mask[sel]),
            )
            losses.append(float(loss))
            step += 1
            if verbose and step % 20 == 0:
                print(f"step {step}: loss {losses[-1]:.4f}", flush=True)
            if step >= steps:
                break

    after = evaluate_map(model, variables(), ev_images, ev_boxes, ev_mask)
    if verbose:
        print(f"after {step} steps: {after}", flush=True)
    return {"before": before, "after": after, "losses": losses,
            "variables": variables(), "model": model}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    args = ap.parse_args()
    out = run_demo(steps=args.steps)
    ok = out["after"]["map50"] >= 0.6
    print(f"convergence: {'OK' if ok else 'NOT CONVERGED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
