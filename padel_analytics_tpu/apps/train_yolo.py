"""YOLOv8 detection / pose fine-tuning CLI.

Trains on the ultralytics dataset layout (the de-facto format the
reference's weights were produced with): an images directory plus a
labels directory of one .txt per image, each line
`class cx cy w h [kx ky kv ...]` normalized to [0, 1].

  python -m padel_analytics_tpu.apps.train_yolo \
      --images data/images --labels data/labels --imgsz 640 \
      --variant n --epochs 5 --batch 8 --out weights/det.msgpack \
      [--keypoints 13] [--resume weights/yolov8n.pt] \
      [--data-parallel -1] [--model-parallel 1]

The reference has no training for its detectors (ultralytics checkpoints
only); this is the framework's TPU-native extension: dp x tp mesh train
step (training/yolo.py), PIL-parity squash resize on device, msgpack
checkpoints loadable by every tracker.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def load_dataset(images_dir: str, labels_dir: str, max_gt: int):
    """(paths, labels (N,max_gt), boxes_norm (N,max_gt,4) cxcywh, kpts_norm
    or None, mask (N,max_gt))."""
    paths = sorted(
        p for p in Path(images_dir).iterdir() if p.suffix.lower() in IMAGE_EXTS
    )
    if not paths:
        raise FileNotFoundError(f"no images in {images_dir}")
    rows = []
    nk = 0
    for p in paths:
        lp = Path(labels_dir) / (p.stem + ".txt")
        entries = []
        if lp.exists():
            for line in lp.read_text().splitlines():
                vals = [float(v) for v in line.split()]
                if len(vals) >= 5:
                    entries.append(vals)
                    nk = max(nk, (len(vals) - 5) // 3)
        rows.append(entries)
    n = len(paths)
    labels = np.zeros((n, max_gt), np.int32)
    boxes = np.zeros((n, max_gt, 4), np.float32)
    kpts = np.zeros((n, max_gt, nk, 3), np.float32) if nk else None
    mask = np.zeros((n, max_gt), bool)
    for i, entries in enumerate(rows):
        for j, vals in enumerate(entries[:max_gt]):
            labels[i, j] = int(vals[0])
            boxes[i, j] = vals[1:5]
            if nk:
                k = np.asarray(vals[5 : 5 + nk * 3], np.float32)
                kpts[i, j, : len(k) // 3] = k.reshape(-1, 3)
            mask[i, j] = True
    return paths, labels, boxes, kpts, mask


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="train_yolo")
    parser.add_argument("--images", required=True)
    parser.add_argument("--labels", required=True)
    parser.add_argument("--imgsz", type=int, default=640)
    parser.add_argument("--variant", default="n")
    parser.add_argument("--classes", type=int, default=1)
    parser.add_argument("--keypoints", type=int, default=0)
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--max-gt", type=int, default=16)
    parser.add_argument("--out", default="yolo.msgpack")
    parser.add_argument("--resume", default=None)
    parser.add_argument("--data-parallel", type=int, default=-1)
    parser.add_argument("--model-parallel", type=int, default=1)
    args = parser.parse_args(argv)


    from ..models.yolov8 import YOLOv8
    from ..parallel.mesh import batch_sharding, make_mesh, shard_params_for_tp
    from ..trackers import _engine
    from ..training.yolo import init_yolo_train_state, make_yolo_train_step

    pose = args.keypoints > 0
    hw = (args.imgsz, args.imgsz)
    model = YOLOv8(
        variant=args.variant,
        num_classes=args.classes,
        num_keypoints=args.keypoints,
    )
    optimizer = optax.adam(args.lr)
    example = jnp.zeros((1,) + hw + (3,), jnp.float32)
    state = init_yolo_train_state(model, example, optimizer)
    if args.resume:
        from ..trackers.players import _load_yolo_pt

        variables = _engine.load_variables(
            model, example, args.resume, convert_fn=_load_yolo_pt
        )
        state.params = variables["params"]
        state.batch_stats = variables.get("batch_stats", state.batch_stats)

    mesh = make_mesh(data=args.data_parallel, model=args.model_parallel)
    print(f"train_yolo: mesh {dict(mesh.shape)}")
    state.params = shard_params_for_tp(state.params, mesh)
    step = jax.jit(make_yolo_train_step(model, optimizer, hw, pose=pose))

    paths, labels, boxes_n, kpts_n, mask = load_dataset(
        args.images, args.labels, args.max_gt
    )
    print(f"train_yolo: {len(paths)} images, pose={pose}")
    if pose and kpts_n is None:
        raise ValueError(
            f"--keypoints {args.keypoints} but no label file carries "
            "keypoint triplets (lines must be 'class cx cy w h kx ky kv ...')"
        )
    if pose and kpts_n.shape[2] != args.keypoints:
        raise ValueError(
            f"--keypoints {args.keypoints} but labels carry "
            f"{kpts_n.shape[2]} keypoints per instance"
        )

    from ..training.data import load_image_bicubic01

    def load_image(p: Path) -> np.ndarray:
        return load_image_bicubic01(p, hw)[0]

    rng = np.random.default_rng(0)
    # Clamp the batch to the dataset (a dataset smaller than --batch would
    # otherwise train ZERO steps and silently save untrained weights); the
    # epoch loop drops only a < b remainder, as a fixed batch shape means
    # one compiled step.
    b = min(args.batch, len(paths))
    if len(paths) % b:
        print(f"train_yolo: dropping {len(paths) % b} remainder images/epoch")
    s = args.imgsz
    for epoch in range(args.epochs):
        order = rng.permutation(len(paths))
        t0 = time.perf_counter()
        losses = []
        for lo in range(0, len(order) - b + 1, b):
            idx = order[lo : lo + b]
            images = np.stack([load_image(paths[i]) for i in idx])
            # cxcywh normalized -> xyxy pixels at train size
            bb = boxes_n[idx] * s
            xyxy = np.stack(
                [
                    bb[..., 0] - bb[..., 2] / 2,
                    bb[..., 1] - bb[..., 3] / 2,
                    bb[..., 0] + bb[..., 2] / 2,
                    bb[..., 1] + bb[..., 3] / 2,
                ],
                axis=-1,
            ).astype(np.float32)
            images_dev = jax.device_put(images, batch_sharding(mesh))
            gts = [jnp.asarray(labels[idx]), jnp.asarray(xyxy)]
            if pose:
                kk = kpts_n[idx].copy()
                kk[..., :2] *= s
                gts.append(jnp.asarray(kk))
            gts.append(jnp.asarray(mask[idx]))
            state, loss = step(state, images_dev, *gts)
            losses.append(float(loss))
        print(
            f"epoch {epoch}: loss {np.mean(losses):.4f} "
            f"({time.perf_counter() - t0:.1f}s)"
        )

    _engine.save_variables(
        {
            "params": jax.tree.map(np.asarray, state.params),
            "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        },
        args.out,
    )
    print(f"train_yolo: wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
