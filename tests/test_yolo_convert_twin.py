"""YOLOv8 checkpoint-converter parity against an ultralytics-named torch
twin (round-3 verdict item 5 groundwork).

The reference's heaviest weights are ultralytics .pt files (players
detection players_tracker.py:303, player pose
players_keypoints_tracker.py:285-292, court 'yolo' mode
keypoints_tracker.py:238-245). No ultralytics package ships here, so this
builds a functional torch twin whose state_dict uses the EXACT
ultralytics module naming ('model.{i}.', C2f bottlenecks 'm.{k}', head
branches 'cv2/cv3/cv4.{scale}.{0,1,2}', frozen 'dfl.conv.weight'),
randomizes weights AND BatchNorm running stats, converts with
models/convert.convert_yolov8_state_dict, and requires the flax forward
(decoded boxes/scores/kpts) to match the torch-twin forward + the
ultralytics decode math to float tolerance.

flax.apply with the converted tree alone is already a strong check: it
raises unless the converted dict is complete and exactly shaped.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn as tnn  # noqa: E402

from padel_analytics_tpu.models import YOLOv8  # noqa: E402
from padel_analytics_tpu.models.convert import (  # noqa: E402
    convert_yolov8_state_dict,
)

# ------------------------------------------------- torch twin (ultralytics)


def _randomize_bn(bn, gen):
    with torch.no_grad():
        bn.weight.normal_(generator=gen)
        bn.bias.normal_(generator=gen)
        bn.running_mean.normal_(generator=gen)
        bn.running_var.uniform_(0.5, 2.0, generator=gen)


class TConv(tnn.Module):
    """ultralytics Conv: Conv2d(k, s, k//2, bias=False) + BN(1e-3) + SiLU."""

    def __init__(self, i, o, k=3, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(o, eps=1e-3)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, i, o, n, shortcut):
        super().__init__()
        c = o // 2
        self.cv1 = TConv(i, 2 * c, 1)
        self.cv2 = TConv((2 + n) * c, o, 1)
        self.m = tnn.ModuleList(TBottleneck(c, shortcut) for _ in range(n))

    def forward(self, x):
        y = self.cv1(x)
        c = y.shape[1] // 2
        parts = [y[:, :c], y[:, c:]]
        for b in self.m:
            parts.append(b(parts[-1]))
        return self.cv2(torch.cat(parts, 1))


class TSPPF(tnn.Module):
    def __init__(self, i, o):
        super().__init__()
        c = i // 2
        self.cv1 = TConv(i, c, 1)
        self.cv2 = TConv(4 * c, o, 1)

    def forward(self, x):
        x = self.cv1(x)
        p1 = F.max_pool2d(x, 5, 1, 2)
        p2 = F.max_pool2d(p1, 5, 1, 2)
        p3 = F.max_pool2d(p2, 5, 1, 2)
        return self.cv2(torch.cat([x, p1, p2, p3], 1))


class THead(tnn.Module):
    """ultralytics Detect/Pose head: cv2 (box), cv3 (cls), cv4 (kpts),
    plus the frozen DFL conv the converter must drop."""

    def __init__(self, chans, nc, nk=0, reg_max=16):
        super().__init__()
        c2 = max(16, chans[0] // 4, reg_max * 4)
        c3 = max(chans[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(ch, c2, 3), TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * reg_max, 1))
            for ch in chans
        )
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(TConv(ch, c3, 3), TConv(c3, c3, 3),
                           tnn.Conv2d(c3, nc, 1))
            for ch in chans
        )
        if nk:
            c4 = max(chans[0] // 4, nk * 3)
            self.cv4 = tnn.ModuleList(
                tnn.Sequential(TConv(ch, c4, 3), TConv(c4, c4, 3),
                               tnn.Conv2d(c4, nk * 3, 1))
                for ch in chans
            )
        self.dfl = tnn.Module()
        self.dfl.conv = tnn.Conv2d(reg_max, 1, 1, bias=False)
        with torch.no_grad():
            self.dfl.conv.weight.copy_(
                torch.arange(reg_max, dtype=torch.float32).view(1, reg_max, 1, 1)
            )


def build_torch_yolov8n(nc=1, nk=0, seed=0):
    """Variant-'n' twin: chs (16, 32, 64, 128, 256), depths (1, 2, 2, 1),
    module indices exactly as ultralytics DetectionModel/PoseModel yaml
    (paramless Upsample/Concat at 10/11/13/14/17/20 keep indices aligned)."""
    chs = (16, 32, 64, 128, 256)
    m = tnn.Module()
    layers = tnn.ModuleList()
    layers.append(TConv(3, chs[0], 3, 2))            # 0 stem
    layers.append(TConv(chs[0], chs[1], 3, 2))       # 1
    layers.append(TC2f(chs[1], chs[1], 1, True))     # 2
    layers.append(TConv(chs[1], chs[2], 3, 2))       # 3
    layers.append(TC2f(chs[2], chs[2], 2, True))     # 4 -> P3
    layers.append(TConv(chs[2], chs[3], 3, 2))       # 5
    layers.append(TC2f(chs[3], chs[3], 2, True))     # 6 -> P4
    layers.append(TConv(chs[3], chs[4], 3, 2))       # 7
    layers.append(TC2f(chs[4], chs[4], 1, True))     # 8
    layers.append(TSPPF(chs[4], chs[4]))             # 9 -> P5
    layers.append(tnn.Upsample(scale_factor=2))      # 10
    layers.append(tnn.Identity())                    # 11 Concat
    layers.append(TC2f(chs[4] + chs[3], chs[3], 1, False))  # 12
    layers.append(tnn.Upsample(scale_factor=2))      # 13
    layers.append(tnn.Identity())                    # 14 Concat
    layers.append(TC2f(chs[3] + chs[2], chs[2], 1, False))  # 15 -> n3
    layers.append(TConv(chs[2], chs[2], 3, 2))       # 16
    layers.append(tnn.Identity())                    # 17 Concat
    layers.append(TC2f(chs[2] + chs[3], chs[3], 1, False))  # 18 -> n4
    layers.append(TConv(chs[3], chs[3], 3, 2))       # 19
    layers.append(tnn.Identity())                    # 20 Concat
    layers.append(TC2f(chs[3] + chs[4], chs[4], 1, False))  # 21 -> n5
    layers.append(THead((chs[2], chs[3], chs[4]), nc, nk))  # 22
    m.model = layers

    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            if p.ndim > 1:
                p.normal_(0.0, 0.05, generator=gen)
            else:
                p.normal_(0.0, 0.2, generator=gen)
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            _randomize_bn(mod, gen)
    # re-freeze the DFL arange the loop above randomized
    with torch.no_grad():
        m.model[22].dfl.conv.weight.copy_(
            torch.arange(16, dtype=torch.float32).view(1, 16, 1, 1)
        )
    m.eval()
    return m


def run_torch_yolov8(m, x):
    """Forward the twin; returns per-scale raw head maps (NCHW)."""
    l = m.model
    x = l[1](l[0](x))
    x = l[2](x)
    p3 = l[4](l[3](x))
    p4 = l[6](l[5](p3))
    p5 = l[9](l[8](l[7](p4)))
    t1 = l[12](torch.cat([l[10](p5), p4], 1))
    n3 = l[15](torch.cat([l[13](t1), p3], 1))
    n4 = l[18](torch.cat([l[16](n3), t1], 1))
    n5 = l[21](torch.cat([l[19](n4), p5], 1))
    head = l[22]
    feats = [n3, n4, n5]
    box = [head.cv2[i](f) for i, f in enumerate(feats)]
    cls = [head.cv3[i](f) for i, f in enumerate(feats)]
    kpt = (
        [head.cv4[i](f) for i, f in enumerate(feats)]
        if hasattr(head, "cv4")
        else None
    )
    return box, cls, kpt


def decode_reference(box, cls, kpt, strides=(8, 16, 32), reg_max=16):
    """ultralytics decode math in numpy: DFL expectation + stride anchors;
    pose xy = (raw * 2 + anchor - 0.5) * stride."""
    boxes_all, scores_all, kpts_all = [], [], []
    for i, s in enumerate(strides):
        b_map = box[i].detach().numpy()
        c_map = cls[i].detach().numpy()
        bsz, _, h, w = b_map.shape
        ax = np.tile(np.arange(w, dtype=np.float32) + 0.5, h)
        ay = np.repeat(np.arange(h, dtype=np.float32) + 0.5, w)
        bl = b_map.transpose(0, 2, 3, 1).reshape(bsz, h * w, 4, reg_max)
        e = np.exp(bl - bl.max(-1, keepdims=True))
        dist = (e / e.sum(-1, keepdims=True) @ np.arange(reg_max, dtype=np.float32))
        x1 = (ax[None] - dist[..., 0]) * s
        y1 = (ay[None] - dist[..., 1]) * s
        x2 = (ax[None] + dist[..., 2]) * s
        y2 = (ay[None] + dist[..., 3]) * s
        boxes_all.append(np.stack([x1, y1, x2, y2], -1))
        cl = c_map.transpose(0, 2, 3, 1).reshape(bsz, h * w, -1)
        scores_all.append(1.0 / (1.0 + np.exp(-cl)))
        if kpt is not None:
            k_map = kpt[i].detach().numpy()
            nk = k_map.shape[1] // 3
            kr = k_map.transpose(0, 2, 3, 1).reshape(bsz, h * w, nk, 3)
            kx = (kr[..., 0] * 2.0 + (ax[None, :, None] - 0.5)) * s
            ky = (kr[..., 1] * 2.0 + (ay[None, :, None] - 0.5)) * s
            kc = 1.0 / (1.0 + np.exp(-kr[..., 2]))
            kpts_all.append(np.stack([kx, ky, kc], -1))
    return (
        np.concatenate(boxes_all, 1),
        np.concatenate(scores_all, 1),
        np.concatenate(kpts_all, 1) if kpt is not None else None,
    )


# ------------------------------------------------------------------- tests


@pytest.mark.smoke
@pytest.mark.parametrize("nc", [1, 80])
def test_yolov8_detect_convert_twin(nc):
    tm = build_torch_yolov8n(nc=nc, seed=nc)
    sd = tm.state_dict()
    # the on-disk naming really is ultralytics':
    assert "model.0.conv.weight" in sd
    assert "model.2.m.0.cv1.conv.weight" in sd
    assert "model.22.cv2.0.2.bias" in sd
    assert "model.22.dfl.conv.weight" in sd

    variables = convert_yolov8_state_dict(sd)
    rng = np.random.default_rng(nc)
    x = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        box, cls, kpt = run_torch_yolov8(tm, torch.from_numpy(x))
    ref_boxes, ref_scores, _ = decode_reference(box, cls, kpt)

    model = YOLOv8(variant="n", num_classes=nc)
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out["scores"]), ref_scores, rtol=1e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["boxes"]), ref_boxes, rtol=1e-4, atol=2e-2
    )


@pytest.mark.smoke
@pytest.mark.parametrize("nk", [13, 12])
def test_yolov8_pose_convert_twin(nk):
    """13 kpts = player pose; 12 = court 'yolo' mode."""
    tm = build_torch_yolov8n(nc=1, nk=nk, seed=100 + nk)
    sd = tm.state_dict()
    assert "model.22.cv4.2.1.bn.running_var" in sd

    variables = convert_yolov8_state_dict(sd)
    rng = np.random.default_rng(nk)
    x = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        box, cls, kpt = run_torch_yolov8(tm, torch.from_numpy(x))
    ref_boxes, ref_scores, ref_kpts = decode_reference(box, cls, kpt)

    model = YOLOv8(variant="n", num_classes=1, num_keypoints=nk)
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out["scores"]), ref_scores, rtol=1e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["boxes"]), ref_boxes, rtol=1e-4, atol=2e-2
    )
    kq = np.asarray(out["kpts"])
    np.testing.assert_allclose(kq[..., 2], ref_kpts[..., 2], rtol=1e-4,
                               atol=2e-4)
    np.testing.assert_allclose(kq[..., :2], ref_kpts[..., :2], rtol=1e-4,
                               atol=2e-2)
