"""ResNet court-keypoints regression fine-tuning CLI.

The reference consumes a ResNet50 court checkpoint (fc -> 24-dim Sigmoid
over normalized (x, y), keypoints_tracker.py:158-167) but ships no
training for it; this is the framework's TPU-native extension, matching
train_yolo / train_tracknet.

Dataset: an images directory plus one JSON mapping image filename ->
[[x, y], ...] court keypoints in SOURCE pixels (the keypoint-picker
tool's output format). Targets are normalized by each image's own size —
exactly the quantity the inference path rescales by frame W/H.

  python -m padel_analytics_tpu.apps.train_court \
      --images data/frames --keypoints data/court_keypoints.json \
      --epochs 5 --batch 8 --out weights/court.msgpack \
      [--resume weights/court_resnet.pt] \
      [--data-parallel -1] [--model-parallel 1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax


def load_dataset(images_dir: str, keypoints_json: str):
    """(paths, kpts_px (N,K,2)) for images present in the JSON."""
    table = json.loads(Path(keypoints_json).read_text())
    paths, rows = [], []
    for p in sorted(Path(images_dir).iterdir()):
        if p.name in table:
            kp = np.asarray(table[p.name], np.float32)
            if kp.ndim != 2 or kp.shape[1] != 2:
                raise ValueError(f"{p.name}: keypoints must be (K, 2)")
            paths.append(p)
            rows.append(kp)
    if not paths:
        raise FileNotFoundError(
            f"no {images_dir} images named in {keypoints_json}"
        )
    ks = {r.shape[0] for r in rows}
    if len(ks) != 1:
        raise ValueError(f"inconsistent keypoint counts across images: {ks}")
    return paths, np.stack(rows)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="train_court")
    parser.add_argument("--images", required=True)
    parser.add_argument("--keypoints", required=True)
    parser.add_argument("--imgsz", type=int, default=224)
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--out", default="court.msgpack")
    parser.add_argument("--resume", default=None)
    parser.add_argument("--data-parallel", type=int, default=-1)
    parser.add_argument("--model-parallel", type=int, default=1)
    # test-sized stages for CI; production default is the real ResNet50
    parser.add_argument("--stage-sizes", default="3,4,6,3")
    args = parser.parse_args(argv)


    from ..models.resnet import ResNet50Regressor, imagenet_normalize
    from ..parallel.mesh import batch_sharding, make_mesh, shard_params_for_tp
    from ..trackers import _engine
    from ..training.resnet_court import (
        init_court_train_state,
        make_court_train_step,
        normalize_court_targets,
    )

    paths, kpts_px = load_dataset(args.images, args.keypoints)
    n_kp = kpts_px.shape[1]
    print(f"train_court: {len(paths)} images, {n_kp} keypoints")

    hw = (args.imgsz, args.imgsz)
    stage_sizes = tuple(int(v) for v in args.stage_sizes.split(","))
    model = ResNet50Regressor(num_outputs=2 * n_kp, stage_sizes=stage_sizes)
    optimizer = optax.adam(args.lr)
    example = jnp.zeros((1,) + hw + (3,), jnp.float32)
    state = init_court_train_state(model, example, optimizer)
    if args.resume:
        from ..trackers.court_keypoints import _load_resnet_pt

        variables = _engine.load_variables(
            model, example, args.resume, convert_fn=_load_resnet_pt
        )
        state.params = variables["params"]
        state.batch_stats = variables.get("batch_stats", state.batch_stats)

    mesh = make_mesh(data=args.data_parallel, model=args.model_parallel)
    print(f"train_court: mesh {dict(mesh.shape)}")
    state.params = shard_params_for_tp(state.params, mesh)
    step = jax.jit(make_court_train_step(model, optimizer))

    # PIL-parity bicubic squash to imgsz (the inference preprocessing,
    # keypoints_tracker/iterable.py:16-25 semantics); shared with
    # train_yolo/evaluate so train and eval preprocess identically.
    from ..training.data import load_image_bicubic01

    def load_image(p: Path) -> tuple[np.ndarray, tuple[int, int]]:
        return load_image_bicubic01(p, hw)

    rng = np.random.default_rng(0)
    # Clamp the batch to the dataset (a dataset smaller than --batch would
    # otherwise train ZERO steps and silently save untrained weights).
    b = min(args.batch, len(paths))
    if len(paths) % b:
        print(f"train_court: dropping {len(paths) % b} remainder images/epoch")
    for epoch in range(args.epochs):
        order = rng.permutation(len(paths))
        t0 = time.perf_counter()
        losses = []
        for lo in range(0, len(order) - b + 1, b):
            idx = order[lo : lo + b]
            imgs, targets = [], []
            for i in idx:
                img01, wh = load_image(paths[i])
                imgs.append(img01)
                targets.append(
                    np.asarray(normalize_court_targets(kpts_px[i], wh))
                )
            images_dev = jax.device_put(
                np.asarray(imagenet_normalize(jnp.asarray(np.stack(imgs)))),
                batch_sharding(mesh),
            )
            targets_dev = jax.device_put(
                np.stack(targets), batch_sharding(mesh)
            )
            state, loss = step(state, images_dev, targets_dev)
            losses.append(float(loss))
        print(
            f"epoch {epoch}: loss {np.mean(losses):.5f} "
            f"({time.perf_counter() - t0:.1f}s)"
        )

    _engine.save_variables(
        {
            "params": jax.tree.map(np.asarray, state.params),
            "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        },
        args.out,
    )
    print(f"train_court: wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
