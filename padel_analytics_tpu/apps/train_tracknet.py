"""TrackNet training CLI.

Trains on the reference's rally-directory dataset layout (see
training/data.py) with the dp x tp mesh sharding from parallel/mesh.py.

  python -m padel_analytics_tpu.apps.train_tracknet \
      --match-dir data/match1 --rallies 1_00_01 1_02_05 \
      --epochs 3 --batch 8 --out weights/tracknet.msgpack \
      [--mixup 0.5] [--data-parallel -1] [--model-parallel 1]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="train_tracknet")
    parser.add_argument("--match-dir", required=True)
    parser.add_argument("--rallies", nargs="+", required=True)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seq-len", type=int, default=8)
    parser.add_argument("--height", type=int, default=288)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--mixup", type=float, default=0.0)
    parser.add_argument("--out", default="tracknet.msgpack")
    parser.add_argument("--resume", default=None)
    parser.add_argument("--data-parallel", type=int, default=-1)
    parser.add_argument("--model-parallel", type=int, default=1)
    args = parser.parse_args(argv)

    from ..models.tracknet import make_tracknet
    from ..parallel.mesh import batch_sharding, make_mesh, shard_params_for_tp
    from ..trackers import _engine
    from ..training.data import load_rally, window_batches
    from ..training.tracknet import init_train_state, make_tracknet_train_step

    model, in_dim = make_tracknet(args.seq_len, "concat")
    optimizer = optax.adam(args.lr)
    example = jnp.zeros((1, args.height, args.width, in_dim), jnp.float32)
    state = init_train_state(model, example, optimizer)
    if args.resume:
        variables = _engine.load_variables(
            model, example, args.resume
        )
        state.params = variables["params"]
        state.batch_stats = variables.get("batch_stats", state.batch_stats)

    mesh = make_mesh(data=args.data_parallel, model=args.model_parallel)
    print(f"train: mesh {dict(mesh.shape)}")
    state.params = shard_params_for_tp(state.params, mesh)
    b_shard = batch_sharding(mesh)

    clips = [
        load_rally(args.match_dir, rid, args.height, args.width)
        for rid in args.rallies
    ]
    print(f"train: {len(clips)} rallies, {sum(c.frames.shape[0] for c in clips)} frames")

    step_fn = jax.jit(make_tracknet_train_step(model, optimizer))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    step = 0
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        losses = []
        for clip in clips:
            key, sub = jax.random.split(key)
            for x, labels in window_batches(
                clip,
                seq_len=args.seq_len,
                batch_size=args.batch,
                rng=rng,
                mixup_alpha=args.mixup,
                jax_rng=sub,
            ):
                x = jax.device_put(x, b_shard)
                labels = jax.device_put(labels, b_shard)
                state, loss = step_fn(state, x, labels)
                losses.append(float(loss))
                step += 1
        print(
            f"epoch {epoch}: loss {np.mean(losses):.5f} "
            f"({len(losses)} steps, {time.perf_counter() - t0:.1f}s)"
        )

    _engine.save_variables(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)},
        args.out,
    )
    print(f"train: wrote {args.out} after {step} steps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
