"""Detection / pose evaluation CLI: mAP@[.5:.95] and mean-OKS on an
ultralytics-layout dataset (the same format apps/train_yolo.py consumes).

The reference ships no evaluation at all; this closes the train->eval
loop for the YOLO families the framework serves.

  python -m padel_analytics_tpu.apps.evaluate \
      --images data/images --labels data/labels \
      --weights weights/det.msgpack --variant n --imgsz 640 \
      [--keypoints 13] [--classes 1] [--conf 0.25 --iou 0.7] [--batch 8]

Prints ONE JSON line: {"images": N, "map": ..., "map50": ...} plus
"mean_oks" when --keypoints is set.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="evaluate")
    parser.add_argument("--images", required=True)
    parser.add_argument("--labels", required=True)
    parser.add_argument("--weights", required=True)
    parser.add_argument("--variant", default="n")
    parser.add_argument("--imgsz", type=int, default=640)
    parser.add_argument("--classes", type=int, default=1)
    parser.add_argument("--keypoints", type=int, default=0)
    parser.add_argument("--conf", type=float, default=0.25)
    parser.add_argument("--iou", type=float, default=0.7)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--max-gt", type=int, default=16)
    parser.add_argument("--top-k", type=int, default=128)
    args = parser.parse_args(argv)


    from ..models.yolov8 import YOLOv8
    from ..ops.nms import batched_nms
    from ..trackers import _engine
    from ..training.evaluate import detection_map, oks
    from .train_yolo import load_dataset

    pose = args.keypoints > 0
    hw = (args.imgsz, args.imgsz)
    model = YOLOv8(
        variant=args.variant,
        num_classes=args.classes,
        num_keypoints=args.keypoints,
    )
    example = jnp.zeros((1,) + hw + (3,), jnp.float32)
    from ..trackers.players import _load_yolo_pt

    variables = _engine.load_variables(model, example, args.weights,
                                       convert_fn=_load_yolo_pt)

    paths, labels, boxes_n, kpts_n, mask = load_dataset(
        args.images, args.labels, args.max_gt
    )
    if pose and (kpts_n is None or kpts_n.shape[2] != args.keypoints):
        raise ValueError(
            f"--keypoints {args.keypoints} but labels carry "
            f"{0 if kpts_n is None else kpts_n.shape[2]} keypoints"
        )
    print(f"evaluate: {len(paths)} images, pose={pose}", file=sys.stderr)

    from ..trackers.players import _person_scores

    @jax.jit
    def step(images):
        out = model.apply(variables, images)
        # Same candidate gating as the deployed trackers (classes=[0]
        # argmax semantics): the eval must score what inference detects.
        boxes, scores, _, index, valid = batched_nms(
            out["boxes"], _person_scores(out["scores"]),
            conf_thres=args.conf, iou_thres=args.iou, top_k=args.top_k,
        )
        res = [boxes, scores, valid]
        if pose:
            # keypoints of the kept anchors, gathered by the NMS indices
            # (the player_keypoints tracker's own recipe).
            res.append(
                jnp.take_along_axis(
                    out["kpts"], jnp.clip(index, 0)[..., None, None], axis=1
                )
            )
        return tuple(res)

    from ..training.data import load_image_bicubic01

    def load_image(p) -> np.ndarray:
        return load_image_bicubic01(p, hw)[0]

    s = float(args.imgsz)
    pred_boxes, pred_scores, gt_all = [], [], []
    oks_vals = []
    b = min(args.batch, len(paths))
    for lo in range(0, len(paths), b):
        idx = list(range(lo, min(lo + b, len(paths))))
        batch = [load_image(paths[i]) for i in idx]
        while len(batch) < b:  # pad the tail; padded outputs are dropped
            batch.append(np.zeros_like(batch[0]))
        outs = step(jnp.asarray(np.stack(batch)))
        boxes = np.asarray(outs[0])
        scores = np.asarray(outs[1])
        valid = np.asarray(outs[2])
        kall = np.asarray(outs[3]) if pose else None
        for j, i in enumerate(idx):
            keep = valid[j]
            pb = boxes[j][keep]
            ps = scores[j][keep]
            # gt cxcywh normalized -> xyxy at eval size
            m = mask[i]
            bb = boxes_n[i][m] * s
            gb = np.stack(
                [bb[:, 0] - bb[:, 2] / 2, bb[:, 1] - bb[:, 3] / 2,
                 bb[:, 0] + bb[:, 2] / 2, bb[:, 1] + bb[:, 3] / 2],
                axis=-1,
            ) if len(bb) else np.zeros((0, 4), np.float32)
            pred_boxes.append(pb)
            pred_scores.append(ps)
            gt_all.append(gb)
            if pose and len(gb) and keep.any():
                gk = kpts_n[i][m].copy()
                gk[..., :2] *= s
                pk_all = kall[j][keep]  # row-aligned with pb/ps
                # Same greedy matching rule as detection_map.
                from ..training.evaluate import greedy_match

                order, gt_idx = greedy_match(pb, ps, gb, 0.5)
                for k, r in enumerate(order):
                    g = gt_idx[k]
                    if g < 0:
                        continue
                    area = float(
                        max((gb[g, 2] - gb[g, 0]) * (gb[g, 3] - gb[g, 1]),
                            1e-9)
                    )
                    v = oks(pk_all[r][:, :2], gk[g], area)
                    if np.isfinite(v):
                        oks_vals.append(v)

    res = detection_map(pred_boxes, pred_scores, gt_all)
    record = {"images": len(paths), "map": round(res["map"], 4),
              "map50": round(res["map50"], 4)}
    if pose:
        record["mean_oks"] = (
            round(float(np.mean(oks_vals)), 4) if oks_vals else None
        )
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
