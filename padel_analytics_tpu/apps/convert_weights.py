"""Convert reference torch checkpoints to native flax .msgpack weights.

Usage:
  python -m padel_analytics_tpu.apps.convert_weights tracknet  IN.pt OUT.msgpack
  python -m padel_analytics_tpu.apps.convert_weights inpaintnet IN.pt OUT.msgpack
  python -m padel_analytics_tpu.apps.convert_weights resnet     IN.pt OUT.msgpack
  python -m padel_analytics_tpu.apps.convert_weights yolo       IN.pt OUT.msgpack \
      [--variant m] [--keypoints 0|13|12] [--imgsz 640]

The trackers also convert .pt lazily at load time; this tool front-loads
the (torch-requiring) conversion so deployments don't need torch at all.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax.numpy as jnp


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="convert_weights")
    parser.add_argument("kind", choices=["tracknet", "inpaintnet", "resnet", "yolo"])
    parser.add_argument("input")
    parser.add_argument("output")
    parser.add_argument("--variant", default="m")
    parser.add_argument("--keypoints", type=int, default=0)
    parser.add_argument("--imgsz", type=int, default=640)
    parser.add_argument(
        "--classes", type=int, default=0,
        help="yolo: assert this class count (0 = infer from checkpoint)",
    )
    args = parser.parse_args(argv)

    from ..models.convert import (
        convert_inpaintnet_checkpoint,
        convert_resnet50_state_dict,
        convert_tracknet_checkpoint,
        load_torch_checkpoint,
    )
    from ..trackers import _engine

    ckpt = load_torch_checkpoint(args.input)

    if args.kind == "tracknet":
        from ..models.tracknet import make_tracknet

        converted, params = convert_tracknet_checkpoint(ckpt)
        seq_len = int(params.get("seq_len", 8))
        model, in_dim = make_tracknet(seq_len, params.get("bg_mode", "concat"))
        example = jnp.zeros((1, 288, 512, in_dim), jnp.float32)
        print(f"tracknet: seq_len={seq_len} bg_mode={params.get('bg_mode')}")
    elif args.kind == "inpaintnet":
        from ..models.tracknet import InpaintNet

        converted, params = convert_inpaintnet_checkpoint(ckpt)
        seq_len = int(params.get("seq_len", 16))
        model = InpaintNet()
        example = (
            jnp.zeros((1, seq_len, 2), jnp.float32),
            jnp.zeros((1, seq_len, 1), jnp.float32),
        )
    elif args.kind == "resnet":
        from ..models.resnet import ResNet50Regressor

        state_dict = ckpt.state_dict() if hasattr(ckpt, "state_dict") else ckpt
        converted = convert_resnet50_state_dict(state_dict)
        model = ResNet50Regressor()
        example = jnp.zeros((1, 224, 224, 3), jnp.float32)
    else:  # yolo
        from ..models.convert import convert_yolov8_state_dict
        from ..models.yolov8 import YOLOv8

        inner = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        state_dict = inner.state_dict() if hasattr(inner, "state_dict") else inner
        state_dict = {
            k: v.float() if hasattr(v, "float") else v for k, v in state_dict.items()
        }
        converted = convert_yolov8_state_dict(state_dict)
        # Infer num_classes from the checkpoint's cls head (like
        # PlayerTracker does) — the stock COCO players checkpoint is
        # 80-class; hard-coding 1 would fail its shape merge.
        ckpt_nc = int(
            np.asarray(converted["params"]["cls_0"]["proj"]["kernel"]).shape[-1]
        )
        if args.classes and args.classes != ckpt_nc:
            raise SystemExit(
                f"--classes {args.classes} but checkpoint has {ckpt_nc}"
            )
        model = YOLOv8(
            variant=args.variant, num_classes=ckpt_nc,
            num_keypoints=args.keypoints,
        )
        example = jnp.zeros((1, args.imgsz, args.imgsz, 3), jnp.float32)

    variables = _engine.load_variables(model, example, None)
    variables = _engine._merge_variables(variables, converted)
    _engine.save_variables(variables, args.output)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
