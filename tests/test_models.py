"""Model architecture + torch-weight-conversion parity tests.

Parity strategy: build functional torch twins in-test (torch is in the dev
image), randomize weights AND BatchNorm running stats, convert the torch
state_dict with models/convert.py, and require the flax forward to match
the torch eval-mode forward to float tolerance. This pins down every
layout transpose, padding rule, activation slope, and BN stat mapping the
converter relies on for loading reference-trained checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn as tnn  # noqa: E402

from padel_analytics_tpu.models import (  # noqa: E402
    InpaintNet,
    ResNet50Regressor,
    TrackNet,
    YOLOv8,
    make_tracknet,
)
from padel_analytics_tpu.models.convert import (  # noqa: E402
    convert_inpaintnet_checkpoint,
    convert_resnet50_state_dict,
    convert_tracknet_checkpoint,
)
from padel_analytics_tpu.models.yolov8 import num_anchors  # noqa: E402


def _randomize_bn(bn):
    with torch.no_grad():
        bn.weight.normal_()
        bn.bias.normal_()
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)


# ----------------------------------------------------------------- TrackNet


def _torch_conv_block(i, o):
    m = tnn.Module()
    m.conv = tnn.Conv2d(i, o, 3, padding="same", bias=False)
    m.bn = tnn.BatchNorm2d(o)
    _randomize_bn(m.bn)
    return m


def _torch_stack(parent, name, i, o, n):
    stack = tnn.Module()
    cur = i
    for k in range(n):
        stack.add_module(f"conv_{k + 1}", _torch_conv_block(cur, o))
        cur = o
    parent.add_module(name, stack)
    return stack


def _apply_stack(stack, x):
    for block in stack.children():
        x = F.relu(block.bn(block.conv(x)))
    return x


def _build_torch_tracknet(in_dim=27, out_dim=8):
    m = tnn.Module()
    _torch_stack(m, "down_block_1", in_dim, 64, 2)
    _torch_stack(m, "down_block_2", 64, 128, 2)
    _torch_stack(m, "down_block_3", 128, 256, 3)
    _torch_stack(m, "bottleneck", 256, 512, 3)
    _torch_stack(m, "up_block_1", 768, 256, 3)
    _torch_stack(m, "up_block_2", 384, 128, 2)
    _torch_stack(m, "up_block_3", 192, 64, 2)
    m.predictor = tnn.Conv2d(64, out_dim, 1)
    m.eval()
    return m


def _run_torch_tracknet(m, x):
    pool = tnn.MaxPool2d(2, 2)
    up = tnn.Upsample(scale_factor=2)
    x1 = _apply_stack(m.down_block_1, x)
    x2 = _apply_stack(m.down_block_2, pool(x1))
    x3 = _apply_stack(m.down_block_3, pool(x2))
    x4 = _apply_stack(m.bottleneck, pool(x3))
    y = _apply_stack(m.up_block_1, torch.cat([up(x4), x3], dim=1))
    y = _apply_stack(m.up_block_2, torch.cat([up(y), x2], dim=1))
    y = _apply_stack(m.up_block_3, torch.cat([up(y), x1], dim=1))
    return torch.sigmoid(m.predictor(y))


def test_tracknet_torch_parity(rng):
    torch.manual_seed(0)
    tm = _build_torch_tracknet()
    x = rng.uniform(0, 1, size=(2, 27, 32, 64)).astype(np.float32)
    with torch.no_grad():
        ref = _run_torch_tracknet(tm, torch.from_numpy(x)).numpy()

    variables, _ = convert_tracknet_checkpoint({"model": tm.state_dict()})
    model = TrackNet(out_dim=8)
    out = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_make_tracknet_channel_modes():
    for bg_mode, expected in [("", 24), ("subtract", 8), ("subtract_concat", 32), ("concat", 27)]:
        _, in_dim = make_tracknet(8, bg_mode)
        assert in_dim == expected


# ---------------------------------------------------------------- InpaintNet


def _torch_conv1d_block(i, o):
    m = tnn.Module()
    m.conv = tnn.Conv1d(i, o, 3, padding="same", bias=True)
    return m


def _build_torch_inpaintnet():
    m = tnn.Module()
    m.down_1 = _torch_conv1d_block(3, 32)
    m.down_2 = _torch_conv1d_block(32, 64)
    m.down_3 = _torch_conv1d_block(64, 128)
    butt = tnn.Module()
    butt.conv_1 = _torch_conv1d_block(128, 256)
    butt.conv_2 = _torch_conv1d_block(256, 256)
    m.add_module("buttleneck", butt)
    m.up_1 = _torch_conv1d_block(384, 128)
    m.up_2 = _torch_conv1d_block(192, 64)
    m.up_3 = _torch_conv1d_block(96, 32)
    m.predictor = tnn.Conv1d(32, 2, 3, padding="same")
    m.eval()
    return m


def _run_torch_inpaintnet(m, coords, mask):
    lr = tnn.LeakyReLU()
    x = torch.cat([coords, mask], dim=2).permute(0, 2, 1)
    x1 = lr(m.down_1.conv(x))
    x2 = lr(m.down_2.conv(x1))
    x3 = lr(m.down_3.conv(x2))
    x = lr(m.buttleneck.conv_1.conv(x3))
    x = lr(m.buttleneck.conv_2.conv(x))
    x = lr(m.up_1.conv(torch.cat([x, x3], dim=1)))
    x = lr(m.up_2.conv(torch.cat([x, x2], dim=1)))
    x = lr(m.up_3.conv(torch.cat([x, x1], dim=1)))
    return torch.sigmoid(m.predictor(x)).permute(0, 2, 1)


def test_inpaintnet_torch_parity(rng):
    torch.manual_seed(1)
    tm = _build_torch_inpaintnet()
    coords = rng.uniform(0, 1, size=(3, 16, 2)).astype(np.float32)
    mask = rng.integers(0, 2, size=(3, 16, 1)).astype(np.float32)
    with torch.no_grad():
        ref = _run_torch_inpaintnet(
            tm, torch.from_numpy(coords), torch.from_numpy(mask)
        ).numpy()

    variables, _ = convert_inpaintnet_checkpoint({"model": tm.state_dict()})
    out = InpaintNet().apply(variables, jnp.asarray(coords), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


# ------------------------------------------------------------------ ResNet50


def _build_torch_resnet50(num_outputs=24):
    def bottleneck(i, planes, stride=1, downsample=False):
        m = tnn.Module()
        m.conv1 = tnn.Conv2d(i, planes, 1, bias=False)
        m.bn1 = tnn.BatchNorm2d(planes)
        m.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        m.bn2 = tnn.BatchNorm2d(planes)
        m.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        m.bn3 = tnn.BatchNorm2d(planes * 4)
        for bn in (m.bn1, m.bn2, m.bn3):
            _randomize_bn(bn)
        if downsample:
            ds = tnn.Sequential(
                tnn.Conv2d(i, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
            _randomize_bn(ds[1])
            m.downsample = ds
        return m

    model = tnn.Module()
    model.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    model.bn1 = tnn.BatchNorm2d(64)
    _randomize_bn(model.bn1)
    inplanes = 64
    for stage, (planes, blocks) in enumerate(
        zip((64, 128, 256, 512), (3, 4, 6, 3)), start=1
    ):
        layer = tnn.Module()
        for b in range(blocks):
            stride = 2 if stage > 1 and b == 0 else 1
            layer.add_module(
                str(b), bottleneck(inplanes, planes, stride, downsample=(b == 0))
            )
            inplanes = planes * 4
        model.add_module(f"layer{stage}", layer)
    model.fc = tnn.Linear(2048, num_outputs)
    model.eval()
    return model


def _run_torch_resnet(m, x):
    def run_block(blk, x):
        idt = x
        y = F.relu(blk.bn1(blk.conv1(x)))
        y = F.relu(blk.bn2(blk.conv2(y)))
        y = blk.bn3(blk.conv3(y))
        if hasattr(blk, "downsample"):
            idt = blk.downsample(x)
        return F.relu(y + idt)

    x = F.relu(m.bn1(m.conv1(x)))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for stage in (m.layer1, m.layer2, m.layer3, m.layer4):
        for blk in stage.children():
            x = run_block(blk, x)
    x = x.mean(dim=(2, 3))
    return m.fc(x)


def test_resnet50_torch_parity(rng):
    torch.manual_seed(2)
    tm = _build_torch_resnet50()
    x = rng.uniform(-2, 2, size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = _run_torch_resnet(tm, torch.from_numpy(x)).numpy()

    variables = convert_resnet50_state_dict(tm.state_dict())
    out = ResNet50Regressor().apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-4)


# -------------------------------------------------------------------- YOLOv8


@pytest.mark.parametrize("variant", ["n"])
def test_yolov8_detect_shapes(rng, variant):
    model = YOLOv8(variant=variant, num_classes=1)
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 96, 160, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    a = num_anchors(96, 160)
    assert out["boxes"].shape == (1, a, 4)
    assert out["scores"].shape == (1, a, 1)
    s = np.asarray(out["scores"])
    assert (s >= 0).all() and (s <= 1).all()
    b = np.asarray(out["boxes"])
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()


def test_yolov8_pose_shapes(rng):
    model = YOLOv8(variant="n", num_classes=1, num_keypoints=13)
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    a = num_anchors(64, 64)
    assert out["kpts"].shape == (1, a, 13, 3)
    kc = np.asarray(out["kpts"][..., 2])
    assert (kc >= 0).all() and (kc <= 1).all()


def test_yolov8_variant_channel_table():
    from padel_analytics_tpu.models.yolov8 import YOLOV8_VARIANTS, _scale_ch

    # published channel widths (ultralytics scales)
    d, w, mc = YOLOV8_VARIANTS["m"]
    assert [_scale_ch(c, w, mc) for c in (64, 128, 256, 512, 1024)] == [
        48,
        96,
        192,
        384,
        576,
    ]
    d, w, mc = YOLOV8_VARIANTS["n"]
    assert [_scale_ch(c, w, mc) for c in (64, 128, 256, 512, 1024)] == [
        16,
        32,
        64,
        128,
        256,
    ]


def test_dfl_decode_math():
    """DFL: delta distribution on bin k decodes to distance k cells."""
    from padel_analytics_tpu.models.yolov8 import dfl_decode

    a = 2
    logits = np.full((1, a, 4, 16), -1e9, np.float32)
    # anchor 0: l=2, t=1, r=3, b=4 cells; anchor 1: all-zero distances
    for side, k in enumerate([2, 1, 3, 4]):
        logits[0, 0, side, k] = 1e9
    logits[0, 1, :, 0] = 1e9
    ax = jnp.asarray([0.5, 5.5])
    ay = jnp.asarray([0.5, 3.5])
    boxes = np.asarray(dfl_decode(jnp.asarray(logits), ax, ay, stride=8.0))
    np.testing.assert_allclose(
        boxes[0, 0], [(0.5 - 2) * 8, (0.5 - 1) * 8, (0.5 + 3) * 8, (0.5 + 4) * 8]
    )
    np.testing.assert_allclose(boxes[0, 1], [5.5 * 8, 3.5 * 8, 5.5 * 8, 3.5 * 8])


def test_pose_decode_math():
    from padel_analytics_tpu.models.yolov8 import pose_decode

    raw = np.zeros((1, 1, 2, 3), np.float32)
    raw[0, 0, 0] = [1.0, -0.5, 0.0]  # kpt0
    raw[0, 0, 1] = [0.0, 0.0, 100.0]  # kpt1: conf saturates to 1
    ax = jnp.asarray([4.5])
    ay = jnp.asarray([2.5])
    out = np.asarray(pose_decode(jnp.asarray(raw), ax, ay, stride=16.0))
    # x = (p*2 + ax - 0.5) * stride
    np.testing.assert_allclose(out[0, 0, 0, :2], [(2 + 4) * 16, (-1 + 2) * 16])
    np.testing.assert_allclose(out[0, 0, 0, 2], 0.5)
    np.testing.assert_allclose(out[0, 0, 1, :2], [4 * 16, 2 * 16])
    np.testing.assert_allclose(out[0, 0, 1, 2], 1.0)
