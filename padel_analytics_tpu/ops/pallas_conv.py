"""Pallas TPU kernels for the pipeline's hot convolutions.

The pose model (YOLOv8m@1280, players_keypoints_tracker.py:285-292
workload) and TrackNet (ball_tracker models.py:45-74) spend most of their
FLOPs in 3x3 convs whose channel counts sit below the MXU's 128 lanes
(27/48/64/96/192). The round-2 reading that XLA "collapses" there (1.8%
of peak on the 27->64 stem) was an upload-polluted probe artifact; the
corrected resident-buffer measurement (BENCH.md round-3 corrections) has
XLA's emitter at ~54% of bf16 peak on the whole net, and THIS kernel 2x
slower than it at the two variants tried. It stays in-tree behind
`use_pallas=False` for future iteration on a PCIe host. Design: the
conv+BN+activation block runs as ONE VMEM-resident pass per spatial
tile, with the BatchNorm affine and activation fused into the matmul
epilogue.

Two contraction strategies, picked per layer:
- Cin < 128 (the starved case): im2col — 9 shifted views concatenate into
  (tile*W, 9*Cin) patches so the MXU contracts over a dense K=9*Cin
  instead of a 128-padded Cin.
- Cin >= 128: 9 per-tap matmuls accumulate in fp32 (K=Cin already feeds
  the systolic array fully; skipping the patches buffer keeps wide layers
  inside VMEM).

Tiles are sized to the ~16 MB VMEM budget automatically. Interface
mirrors ConvBN (models/layers.py): stride-1 3x3, symmetric (1,1) padding
(torch-style), NHWC, bf16 in/out with fp32 accumulation + epilogue.
Numerics pinned by tests/test_pallas_conv.py (CPU-interpret exactness vs
a float reference); models/tracknet_fast.py composes it into whole-model
forwards.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act_fn(name: Optional[str]):
    if name is None or name == "none":
        return lambda x: x
    if name == "relu":
        return lambda x: jnp.maximum(x, 0.0)
    if name == "silu":
        return lambda x: x * jax.nn.sigmoid(x)
    raise ValueError(f"unknown activation {name!r}")


def _round8(v: int) -> int:
    return -(-v // 8) * 8


def _round128(v: int) -> int:
    return -(-v // 128) * 128


def _conv3x3_kernel(
    x_hbm,  # (B, H+2, Wp, Cin) padded input (Wp = W+2 rounded to 8), ANY/HBM
    w_ref,  # im2col: (9*Cin, Cout); taps: (9, Cin, Cout) VMEM
    scale_ref,  # (1, Cout) VMEM
    bias_ref,  # (1, Cout) VMEM
    out_ref,  # (1, TILE_H, W, Cout) VMEM block
    x_vmem,  # scratch (TILE_H+2, W+2, Cin)
    sem,  # DMA semaphore
    *,
    tile_h: int,
    w_out: int,
    cin: int,
    act: str,
    im2col: bool,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    row0 = t * tile_h

    # Whole padded-width rows: the slab copy stays 8-aligned in the
    # sublane (width) dim — Mosaic rejects unaligned HBM slices.
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, tile_h + 2)], x_vmem, sem
    )
    copy.start()
    copy.wait()

    x = x_vmem[:]  # (TILE_H+2, Wp, Cpad)
    acc = _contract_taps(x, w_ref, tile_h, w_out, cin, im2col)
    acc = acc * scale_ref[0][None, :] + bias_ref[0][None, :]
    acc = _act_fn(act)(acc)
    out_ref[0] = acc.reshape(tile_h, w_out, -1).astype(out_ref.dtype)


def _contract_taps(x, w_ref, tile_h, w_out, cin, im2col):
    """Shared 3x3 contraction over a (rows, Wp, Cslab) VMEM slab.

    HBM copies must stay lane-aligned (Mosaic), so the slab carries the
    lane-padded channel count; the VALUE-level slices below drop the pad
    lanes again, keeping the matmul contraction dense: im2col packs the
    9 taps into K = 9*cin (the whole point for sub-128-channel layers —
    zero-padding each tap to 128 was measured 2.3x SLOWER than XLA's
    conv), the per-tap path contracts over cin directly.
    """
    cslab = x.shape[-1]
    m = tile_h * w_out
    if im2col:
        cols = []
        for dy in range(3):
            for dx in range(3):
                part = jax.lax.slice(
                    x, (dy, dx, 0), (dy + tile_h, dx + w_out, cin)
                )
                cols.append(part.reshape(m, cin))
        patches = jnp.concatenate(cols, axis=-1)  # (M, 9*cin)
        return jnp.dot(
            patches, w_ref[:], preferred_element_type=jnp.float32
        )
    acc = None
    for dy in range(3):
        for dx in range(3):
            part = jax.lax.slice(
                x, (dy, dx, 0), (dy + tile_h, dx + w_out, cin)
            ).reshape(m, cin)
            d = jnp.dot(
                part, w_ref[3 * dy + dx],
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
    return acc


def _pick_tile_h(h: int, w: int, cin: int, cout: int, im2col: bool,
                 itemsize: int, want: int) -> int:
    """Largest tile height <= want that divides H and fits ~12 MB VMEM.
    Channel dims are costed at their 128-lane padded width (Mosaic pads
    the minor dim to a full lane tile)."""
    budget = 12 * 1024 * 1024
    cin_p = -(-cin // 128) * 128
    cout_p = -(-cout // 128) * 128
    wp = _round8(w + 2)
    th = want
    while th > 1:
        if h % th == 0:
            slab = (th + 2) * wp * cin_p * itemsize
            out = th * w * cout_p * 4  # fp32 epilogue
            patches = th * w * 9 * cin_p * itemsize if im2col else 0
            weights = 9 * cin_p * cout_p * itemsize
            if slab + out + patches + weights < budget:
                return th
        th -= 1
    return 1


def conv3x3_bn_act(
    x: jnp.ndarray,  # (B, H, W, Cin) NHWC
    w: jnp.ndarray,  # (3, 3, Cin, Cout) HWIO
    scale: jnp.ndarray,  # (Cout,) folded BN scale (gamma / sqrt(var+eps))
    bias: jnp.ndarray,  # (Cout,) folded BN bias (beta - mean * scale)
    act: str = "silu",
    tile_h: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused stride-1 conv3x3 (torch-style (1,1) padding) + BN affine +
    activation as one Pallas pass. Output (B, H, W, Cout), dtype of x.

    interpret=None auto-selects: compiled on TPU backends, Pallas
    interpreter elsewhere (CPU CI runs the same code path, slowly but
    exactly)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _conv3x3_bn_act(x, w, scale, bias, act, tile_h, interpret)


@functools.partial(
    jax.jit,
    static_argnames=("act", "tile_h", "interpret"),
)
def _conv3x3_bn_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    act: str = "silu",
    tile_h: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, wdt, cin = x.shape
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, cin), w.shape
    cpad = _round128(cin)
    im2col = cin < 128
    th = _pick_tile_h(h, wdt, cin, cout, im2col, x.dtype.itemsize, tile_h)

    wp = _round8(wdt + 2)
    # Channel dim padded to the 128-lane tile: the physical (tiled)
    # layout already stores those lanes, and Mosaic's HBM slices must be
    # lane-aligned. The padded lanes carry zeros and the weights gain
    # matching zero rows, so the contraction is unchanged.
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, wp - wdt - 1), (0, cpad - cin))
    )
    if im2col:
        w2 = w.reshape(9 * cin, cout).astype(x.dtype)
    else:
        w2 = w.reshape(9, cin, cout).astype(x.dtype)
    scale2 = scale.reshape(1, cout).astype(jnp.float32)
    bias2 = bias.reshape(1, cout).astype(jnp.float32)

    grid = (b, h // th)
    out = pl.pallas_call(
        functools.partial(
            _conv3x3_kernel, tile_h=th, w_out=wdt, cin=cin, act=act,
            im2col=im2col,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wdt, cout),
            lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, cpad), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w2, scale2, bias2)
    return out


def _conv3x3_rows_kernel(
    x0_ref,  # (1, TILE_H, W+2, Cin) rows r..r+TILE_H of padded input
    x1_ref,  # rows shifted by 1
    x2_ref,  # rows shifted by 2
    w_ref,
    scale_ref,
    bias_ref,
    out_ref,  # (1, TILE_H, W, Cout)
    *,
    tile_h: int,
    w_out: int,
    cin: int,
    act: str,
    im2col: bool,
):
    rows = (x0_ref[0], x1_ref[0], x2_ref[0])  # each (TILE_H, Wp, Cpad)
    m = tile_h * w_out
    if im2col:
        cols = []
        for dy in range(3):
            for dx in range(3):
                part = jax.lax.slice(
                    rows[dy], (0, dx, 0), (tile_h, dx + w_out, cin)
                )
                cols.append(part.reshape(m, cin))
        patches = jnp.concatenate(cols, axis=-1)
        acc = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    else:
        acc = None
        for dy in range(3):
            for dx in range(3):
                part = jax.lax.slice(
                    rows[dy], (0, dx, 0), (tile_h, dx + w_out, cin)
                ).reshape(m, cin)
                d = jnp.dot(
                    part, w_ref[3 * dy + dx],
                    preferred_element_type=jnp.float32,
                )
                acc = d if acc is None else acc + d
    acc = acc * scale_ref[0][None, :] + bias_ref[0][None, :]
    acc = _act_fn(act)(acc)
    out_ref[0] = acc.reshape(tile_h, w_out, -1).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act", "tile_h", "interpret"),
)
def _conv3x3_bn_act_rows(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    act: str = "silu",
    tile_h: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Variant: halo rows delivered as three row-shifted VIEWS of the
    padded input, each tiled by an ordinary non-overlapping BlockSpec —
    Mosaic's automatic block pipelining then overlaps the HBM->VMEM
    streams with compute (the manual-DMA variant serializes its copy)."""
    b, h, wdt, cin = x.shape
    cout = w.shape[-1]
    im2col = cin < 128
    th = _pick_tile_h(h, wdt, cin, cout, im2col, x.dtype.itemsize, tile_h)

    wp = _round8(wdt + 2)
    cpad = _round128(cin)
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, wp - wdt - 1), (0, cpad - cin))
    )
    views = (xp[:, 0:h], xp[:, 1 : h + 1], xp[:, 2 : h + 2])
    if im2col:
        w2 = w.reshape(9 * cin, cout).astype(x.dtype)
    else:
        w2 = w.reshape(9, cin, cout).astype(x.dtype)
    scale2 = scale.reshape(1, cout).astype(jnp.float32)
    bias2 = bias.reshape(1, cout).astype(jnp.float32)

    row_spec = pl.BlockSpec(
        (1, th, wp, cpad),
        lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(
            _conv3x3_rows_kernel, tile_h=th, w_out=wdt, cin=cin, act=act,
            im2col=im2col,
        ),
        grid=(b, h // th),
        in_specs=[
            row_spec,
            row_spec,
            row_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wdt, cout),
            lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, cout), x.dtype),
        interpret=interpret,
    )(*views, w2, scale2, bias2)
    return out


def conv3x3_bn_act_rows(x, w, scale, bias, act="silu", tile_h=8,
                        interpret=None):
    """Public wrapper for the BlockSpec-pipelined variant (see
    conv3x3_bn_act for the interface)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _conv3x3_bn_act_rows(x, w, scale, bias, act, tile_h, interpret)


def fold_bn(
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference-mode BatchNorm into a (scale, bias) affine pair for
    the kernel epilogue: y = conv * scale + bias."""
    scale = gamma / jnp.sqrt(var + eps)
    return scale, beta - mean * scale


def conv3x3_bn_act_reference(x, w, scale, bias, act="silu"):
    """XLA reference implementation (same math, generic conv emitter) —
    the parity oracle and the baseline the kernel must beat."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * scale[None, None, None, :] + bias[None, None, None, :]
    return _act_fn(act)(y).astype(x.dtype)
