"""InpaintNet training CLI.

Trains the trajectory-inpainting model on coordinate windows from the
reference's 'coordinate' dataset layout
(/root/reference/trackers/ball_tracker/dataset.py:304-358, 387-429):
<match_dir>/predicted_csv/<rally_id>_ball.csv with TrackNet predictions,
ground truth, and an Inpaint_Mask column. When no predicted_csv exists,
--synthetic-gaps derives training data from the ground-truth ball CSVs by
synthesizing detection drop-outs (training/data.synthesize_inpaint_rally).

  python -m padel_analytics_tpu.apps.train_inpaintnet \
      --match-dir data/match1 --rallies 1_00_01 1_02_05 \
      --epochs 3 --batch 32 --out weights/inpaintnet.msgpack \
      [--synthetic-gaps --img-wh 1920 1080] \
      [--data-parallel -1] [--model-parallel 1]
"""

from __future__ import annotations

import argparse
import csv
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax


def _load_gt_rally(match_dir: str, rally_id: str):
    """Ground-truth (Frame,X,Y,Visibility) CSV — the heatmap-mode label
    file (dataset.py:253-262) reused for synthetic-gap training."""
    path = Path(match_dir) / "csv" / f"{rally_id}_ball.csv"
    rows = []
    with open(path) as f:
        for row in csv.DictReader(f):
            rows.append(row)
    rows.sort(key=lambda r: int(r["Frame"]))
    coords = np.asarray(
        [(float(r["X"] or 0), float(r["Y"] or 0)) for r in rows], np.float32
    )
    vis = np.asarray([float(r["Visibility"] or 0) for r in rows], np.float32)
    return coords, vis


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="train_inpaintnet")
    parser.add_argument("--match-dir", required=True)
    parser.add_argument("--rallies", nargs="+", required=True)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seq-len", type=int, default=16)
    parser.add_argument("--sliding-step", type=int, default=1)
    parser.add_argument(
        "--synthetic-gaps",
        action="store_true",
        help="train from ground-truth CSVs with synthesized drop-out gaps "
        "instead of a predicted_csv directory",
    )
    parser.add_argument(
        "--img-wh",
        type=int,
        nargs=2,
        default=None,
        help="source resolution (w h) for coordinate normalization; "
        "inferred from frame images when omitted",
    )
    parser.add_argument("--out", default="inpaintnet.msgpack")
    parser.add_argument("--resume", default=None)
    parser.add_argument("--data-parallel", type=int, default=-1)
    parser.add_argument("--model-parallel", type=int, default=1)
    args = parser.parse_args(argv)

    from ..models.tracknet import InpaintNet
    from ..parallel.mesh import batch_sharding, make_mesh, shard_params_for_tp
    from ..trackers import _engine
    from ..training.data import (
        coordinate_window_batches,
        load_inpaint_rally,
        synthesize_inpaint_rally,
    )
    from ..training.inpaintnet import make_inpaintnet_train_step
    from ..training.tracknet import TrackNetTrainState

    model = InpaintNet()
    optimizer = optax.adam(args.lr)
    example = (
        jnp.zeros((1, args.seq_len, 2), jnp.float32),
        jnp.zeros((1, args.seq_len, 1), jnp.float32),
    )
    variables = _engine.load_variables(model, example, args.resume)
    state = TrackNetTrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
        step=0,
    )

    mesh = make_mesh(data=args.data_parallel, model=args.model_parallel)
    print(f"train: mesh {dict(mesh.shape)}")
    state.params = shard_params_for_tp(state.params, mesh)
    b_shard = batch_sharding(mesh)

    img_wh = tuple(args.img_wh) if args.img_wh else None
    rng = np.random.default_rng(0)
    rallies = []
    for rid in args.rallies:
        if args.synthetic_gaps:
            coords, vis = _load_gt_rally(args.match_dir, rid)
            if img_wh is None:
                raise SystemExit("--synthetic-gaps needs --img-wh w h")
            rallies.append(
                synthesize_inpaint_rally(coords, vis, img_wh, rng)
            )
        else:
            rallies.append(load_inpaint_rally(args.match_dir, rid, img_wh))
    print(
        f"train: {len(rallies)} rallies, "
        f"{sum(r.coords_pred.shape[0] for r in rallies)} frames, "
        f"{sum(int(r.inpaint_mask.sum()) for r in rallies)} masked"
    )

    step_fn = jax.jit(make_inpaintnet_train_step(model, optimizer))
    step = 0
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        losses = []
        for rally in rallies:
            for coords, mask, target in coordinate_window_batches(
                rally,
                seq_len=args.seq_len,
                batch_size=args.batch,
                rng=rng,
                sliding_step=args.sliding_step,
            ):
                coords = jax.device_put(coords, b_shard)
                mask = jax.device_put(mask, b_shard)
                target = jax.device_put(target, b_shard)
                state, loss = step_fn(state, coords, mask, target)
                losses.append(float(loss))
                step += 1
        print(
            f"epoch {epoch}: loss {np.mean(losses):.6f} "
            f"({len(losses)} steps, {time.perf_counter() - t0:.1f}s)"
        )

    _engine.save_variables(
        {"params": jax.device_get(state.params)},
        args.out,
    )
    print(f"train: wrote {args.out} after {step} steps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
