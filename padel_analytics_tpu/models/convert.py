"""PyTorch checkpoint -> Flax parameter conversion.

The reference ships torch checkpoints: dict-style TrackNet/InpaintNet
ckpts carrying a 'model' state_dict plus 'param_dict' hyperparameters
(ball_tracker.py:253-274), a raw torchvision resnet50 state_dict
(keypoints_tracker.py:165-166), and ultralytics .pt files
(players_tracker.py:303). This module maps those state_dicts onto the
Flax modules in this package (layout transposes + BatchNorm stat
splitting), so reference-trained weights run on TPU unchanged.

Conversion rules:
- Conv2d weight (O, I, Kh, Kw) -> kernel (Kh, Kw, I, O)
- Conv1d weight (O, I, K)      -> kernel (K, I, O)
- Linear weight (O, I)         -> kernel (I, O)
- BatchNorm weight/bias        -> params .../bn {scale, bias}
- BatchNorm running_mean/var   -> batch_stats .../bn {mean, var}

torch is used ONLY here, host-side, to unpickle checkpoints.
"""

from __future__ import annotations

import sys
import types
from typing import Any, Mapping

import numpy as np


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def convert_state_dict(
    state_dict: Mapping[str, Any],
    name_map: Mapping[str, tuple[str, ...]] | None = None,
) -> dict:
    """Generic torch->flax conversion.

    Returns {'params': ..., 'batch_stats': ...}. Torch dotted module paths
    become flax dict paths; `name_map` rewrites module-path PREFIXES
    (longest match wins) for architectures whose flax module names differ
    from the torch ones.
    """
    params: dict = {}
    batch_stats: dict = {}
    prefixes = sorted(name_map or {}, key=len, reverse=True)

    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        value = _to_np(value)
        module_path, _, leaf = key.rpartition(".")

        mapped = module_path
        for p in prefixes:
            if module_path == p or module_path.startswith(p + "."):
                mapped = ".".join(name_map[p]) + module_path[len(p):]
                break
        path = tuple(x for x in mapped.split(".") if x)

        if leaf == "weight":
            if value.ndim == 4:  # Conv2d
                _set(params, path + ("kernel",), value.transpose(2, 3, 1, 0))
            elif value.ndim == 3:  # Conv1d
                _set(params, path + ("kernel",), value.transpose(2, 1, 0))
            elif value.ndim == 2:  # Linear
                _set(params, path + ("kernel",), value.transpose(1, 0))
            elif value.ndim == 1:  # BatchNorm affine
                _set(params, path + ("scale",), value)
            else:
                raise ValueError(f"unhandled weight shape {value.shape} at {key}")
        elif leaf == "bias":
            _set(params, path + ("bias",), value)
        elif leaf == "running_mean":
            _set(batch_stats, path + ("mean",), value)
        elif leaf == "running_var":
            _set(batch_stats, path + ("var",), value)
        else:
            raise ValueError(f"unhandled state_dict leaf {key!r}")

    out = {"params": params}
    if batch_stats:
        # BN-free nets (InpaintNet) must not grow an empty collection the
        # model tree doesn't have — _merge_variables rejects unknown keys.
        out["batch_stats"] = batch_stats
    return out


# ---------------------------------------------------------------- TrackNet


_TRACKNET_BLOCK_MAP = {
    # reference spells it 'buttleneck' for InpaintNet (models.py:107) and
    # 'bottleneck' for TrackNet (models.py:51).
    "buttleneck.conv_1": ("bottleneck_1",),
    "buttleneck.conv_2": ("bottleneck_2",),
}


def convert_tracknet_checkpoint(ckpt: Mapping[str, Any]) -> tuple[dict, dict]:
    """Convert a reference TrackNet ckpt dict ({'model': state_dict,
    'param_dict': {...}}, ball_tracker.py:253-258). Returns
    (flax_variables, param_dict)."""
    state_dict = ckpt["model"] if "model" in ckpt else ckpt
    variables = convert_state_dict(state_dict)
    return variables, dict(ckpt.get("param_dict", {}))


def convert_inpaintnet_checkpoint(ckpt: Mapping[str, Any]) -> tuple[dict, dict]:
    state_dict = ckpt["model"] if "model" in ckpt else ckpt
    variables = convert_state_dict(state_dict, _TRACKNET_BLOCK_MAP)
    return variables, dict(ckpt.get("param_dict", {}))


# ----------------------------------------------------------------- ResNet50


def _resnet_name_map() -> dict[str, tuple[str, ...]]:
    m: dict[str, tuple[str, ...]] = {}
    for stage, n in enumerate((3, 4, 6, 3), start=1):
        for block in range(n):
            base = f"layer{stage}.{block}"
            m[f"{base}.downsample.0"] = (f"layer{stage}_{block}", "down_conv")
            m[f"{base}.downsample.1"] = (f"layer{stage}_{block}", "down_bn")
            m[base] = (f"layer{stage}_{block}",)
    return m


def convert_resnet50_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """torchvision resnet50 (fc replaced by 24-dim Linear,
    keypoints_tracker.py:158-166) -> ResNet50Regressor variables."""
    return convert_state_dict(state_dict, _resnet_name_map())


# ------------------------------------------------------------------- YOLOv8


# ultralytics DetectionModel/PoseModel layer indices -> our module names.
_YOLO_LAYER_MAP = {
    "0": ("stem",),
    "1": ("down1",),
    "2": ("c2f_1",),
    "3": ("down2",),
    "4": ("c2f_2",),
    "5": ("down3",),
    "6": ("c2f_3",),
    "7": ("down4",),
    "8": ("c2f_4",),
    "9": ("sppf",),
    "12": ("neck_c2f_1",),
    "15": ("neck_c2f_2",),
    "16": ("neck_down1",),
    "18": ("neck_c2f_3",),
    "19": ("neck_down2",),
    "21": ("neck_c2f_4",),
}

_HEAD_BRANCH = {"cv2": "box", "cv3": "cls", "cv4": "kpt"}
_HEAD_LAYER = {"0": "c0", "1": "c1", "2": "proj"}


def yolo_name_map(head_index: int = 22) -> dict[str, tuple[str, ...]]:
    """Prefix map for an ultralytics v8 state_dict ('model.{i}. ...')."""
    m: dict[str, tuple[str, ...]] = {}
    for idx, name in _YOLO_LAYER_MAP.items():
        m[f"model.{idx}"] = name
    h = f"model.{head_index}"
    for torch_branch, ours in _HEAD_BRANCH.items():
        for scale in range(3):
            for torch_layer, our_layer in _HEAD_LAYER.items():
                m[f"{h}.{torch_branch}.{scale}.{torch_layer}"] = (
                    f"{ours}_{scale}",
                    our_layer,
                )
    return m


def _rewrite_c2f_keys(state_dict: Mapping[str, Any]) -> dict:
    """ultralytics C2f bottlenecks are 'm.{i}'; ours are 'm_{i}'."""
    out = {}
    for k, v in state_dict.items():
        parts = k.split(".")
        for i, p in enumerate(parts[:-1]):
            if p == "m" and parts[i + 1].isdigit():
                parts[i] = f"m_{parts[i + 1]}"
                del parts[i + 1]
                break
        out[".".join(parts)] = v
    return out


def convert_yolov8_state_dict(
    state_dict: Mapping[str, Any], head_index: int = 22
) -> dict:
    """ultralytics YOLOv8 detect/pose state_dict -> YOLOv8 variables.
    DFL conv weights (a frozen arange) are dropped: the flax head computes
    the DFL expectation in closed form."""
    filtered = {
        k.removeprefix("model.") if k.startswith("model.model.") else k: v
        for k, v in state_dict.items()
        if ".dfl." not in k
    }
    filtered = _rewrite_c2f_keys(filtered)
    return convert_state_dict(filtered, yolo_name_map(head_index))


def load_torch_checkpoint(path: str, allow_pickle: bool = True):
    """torch.load a .pt checkpoint, safest path first.

    Tries weights_only=True (no arbitrary code execution) before falling
    back to a full unpickle with stubbed ultralytics modules — ultralytics
    .pt files pickle whole nn.Module objects, so the fallback is usually
    needed for them, but plain state_dict/param_dict checkpoints (TrackNet,
    InpaintNet, resnet) load on the safe path. Pass allow_pickle=False to
    refuse the fallback for untrusted files (the reference distributes
    weights via a public Drive link — supply-chain exposure).
    """
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickle:
            raise
    return _load_torch_checkpoint_unpickle(path)


def _load_torch_checkpoint_unpickle(path: str):
    """Full torch.load with stubbed ultralytics modules so .pt files
    unpickle without the ultralytics package installed."""
    import torch

    stub_roots = [
        "ultralytics",
        "ultralytics.nn",
        "ultralytics.nn.tasks",
        "ultralytics.nn.modules",
        "ultralytics.nn.modules.block",
        "ultralytics.nn.modules.conv",
        "ultralytics.nn.modules.head",
        "ultralytics.utils",
        "ultralytics.utils.loss",
        "ultralytics.utils.tal",
    ]

    installed = []
    for name in stub_roots:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__getattr__ = lambda attr, _n=name: type(
                attr, (torch.nn.Module,), {"__module__": _n}
            )
            sys.modules[name] = mod
            installed.append(name)
    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    finally:
        for name in installed:
            sys.modules.pop(name, None)
