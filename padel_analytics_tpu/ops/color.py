"""On-device YUV 4:2:0 (I420) -> RGB conversion, bit-exact to OpenCV.

Why this exists: the host->device link is the fused pipeline's bottleneck
(BENCH.md), and RGB frames cost 3 bytes/px. I420 planes cost 1.5 bytes/px
— the same 4:2:0 sampling the source video codec stores — so uploading
I420 and converting on device halves ingest bytes at ~zero device cost
(a handful of elementwise int32 ops, fused by XLA into the consumers).

Parity: integer fixed-point BT.601 with OpenCV's exact constants and
rounding (modules/imgproc color_yuv: ITUR_BT_601_CY=1220542, CVR=1673527,
CVG=-852492, CUG=-409993, CUB=2116026, shift 20, round-half-up), nearest
2x2 chroma upsampling. Verified element-exact against
cv2.cvtColor(COLOR_YUV2RGB_I420) (tests/test_color.py).

The reference never sees YUV (it consumes cv2's BGR decode,
utils/video.py:18); this is a TPU-native transfer encoding whose only
deviation from the RGB path is the chroma-subsampling round trip,
documented in PARITY.md.
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV ITU-R BT.601 fixed-point constants (shift 20).
_CY = 1220542
_CVR = 1673527
_CVG = -852492
_CUG = -409993
_CUB = 2116026
_SHIFT = 20
_ROUND = 1 << (_SHIFT - 1)


def i420_to_rgb(buf: jnp.ndarray, height: int) -> jnp.ndarray:
    """Convert packed I420 planes to RGB.

    buf: (..., height * 3 // 2, W) uint8 — per image, H rows of Y, then
    H/4 rows holding the (H/2, W/2) U plane, then H/4 rows of V (the
    standard contiguous I420 buffer, what cv2.COLOR_RGB2YUV_I420 emits).
    Returns (..., height, W, 3) float32 with exact uint8 values.
    """
    h = height
    w = buf.shape[-1]
    assert h % 2 == 0 and w % 2 == 0, "I420 needs even dimensions"
    assert buf.shape[-2] == h * 3 // 2, (buf.shape, h)
    lead = buf.shape[:-2]

    y = buf[..., :h, :].astype(jnp.int32)
    # U fully precedes V in the linear chroma region; split by reshape so
    # heights not divisible by 4 (U plane not row-aligned) work too.
    chroma = buf[..., h:, :].reshape(lead + (2, h // 2, w // 2))
    u = chroma[..., 0, :, :]
    v = chroma[..., 1, :, :]

    def up2(p):  # nearest 2x2 chroma upsample
        p = p.astype(jnp.int32) - 128
        p = jnp.repeat(p, 2, axis=-2)
        return jnp.repeat(p, 2, axis=-1)

    u = up2(u)
    v = up2(v)
    # cv2 clamps luma to the video range floor before scaling
    # (std::max(0, y - 16) in imgproc's YUV420 path).
    yy = _CY * jnp.maximum(y - 16, 0) + _ROUND
    r = (yy + _CVR * v) >> _SHIFT
    g = (yy + _CVG * v + _CUG * u) >> _SHIFT
    b = (yy + _CUB * u) >> _SHIFT
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.float32)
