"""Resize-as-matmul parity with PIL and cv2."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from PIL import Image

from padel_analytics_tpu.ops.resize import letterbox_plan, resize_plan


def _rand_img(rng, h, w, c=3):
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize(
    "src,dst,pil_filter",
    [
        ((108, 192), (64, 64), Image.BICUBIC),  # squash downscale (pose path)
        ((72, 128), (28, 51), Image.BICUBIC),  # ball path shape ratio
        ((60, 80), (120, 160), Image.BICUBIC),  # upscale
        ((108, 192), (64, 64), Image.BILINEAR),
    ],
)
def test_pil_resize_parity(rng, src, dst, pil_filter):
    img = _rand_img(rng, *src)
    name = {Image.BICUBIC: "pil_bicubic", Image.BILINEAR: "pil_bilinear"}[pil_filter]
    plan = resize_plan(src, dst, name)
    ref = np.asarray(Image.fromarray(img).resize(dst[::-1], pil_filter))

    # float64 path: byte-exact against Pillow.
    import jax.numpy as jnp

    ours64 = np.asarray(plan.apply(np.asarray(img, np.float64), dtype=jnp.float64))
    ours64_u8 = np.clip(np.floor(ours64 + 0.5), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(ours64_u8, ref)

    # float32 (TPU-like) path: within one intensity step, rarely off.
    ours32 = np.asarray(plan.apply(np.asarray(img, np.float32)))
    ours32_u8 = np.clip(np.floor(ours32 + 0.5), 0, 255).astype(np.uint8)
    diff = np.abs(ours32_u8.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


@pytest.mark.parametrize(
    "src,dst,method,pil_filter",
    [
        ((135, 240), (160, 160), "pil_bicubic", Image.BICUBIC),
        ((135, 240), (64, 112), "pil_bicubic", Image.BICUBIC),
        ((96, 128), (192, 256), "pil_bicubic", Image.BICUBIC),  # upscale
        ((135, 240), (96, 96), "pil_bilinear", Image.BILINEAR),
    ],
)
def test_banded_resize_pil_parity(rng, src, dst, method, pil_filter):
    """The block-banded matmul path (tile=16 forces multiple tiles at these
    shapes) reproduces the dense path's per-row tap products: byte-exact vs
    Pillow at f64, <=1 intensity step at f32."""
    import jax.numpy as jnp

    img = _rand_img(rng, *src)
    plan = resize_plan(src, dst, method)
    ref = np.asarray(Image.fromarray(img).resize(dst[::-1], pil_filter))

    o64 = np.asarray(
        plan.apply(np.asarray(img, np.float64), dtype=jnp.float64, banded=True, tile=16, min_ratio=1.2)
    )
    np.testing.assert_array_equal(
        np.clip(np.floor(o64 + 0.5), 0, 255).astype(np.uint8), ref
    )
    o32 = np.asarray(plan.apply(np.asarray(img, np.float32), banded=True, tile=16, min_ratio=1.2))
    d = np.abs(
        np.clip(np.floor(o32 + 0.5), 0, 255).astype(int) - ref.astype(int)
    )
    assert d.max() <= 1 and (d > 0).mean() < 0.02


def test_banded_resize_batched_matches_unbatched(rng):
    """Banded path handles leading batch dims like per-image calls.

    XLA may pick a different contraction order for the batched dispatch,
    so agreement is to reduction-order noise (~1e-5), far below the uint8
    quantization step — not bitwise."""
    imgs = np.stack([_rand_img(rng, 135, 240) for _ in range(3)])
    plan = resize_plan((135, 240), (96, 160), "pil_bicubic")
    batched = np.asarray(plan.apply(np.asarray(imgs, np.float32), banded=True, tile=16, min_ratio=1.2))
    single = np.stack(
        [
            np.asarray(plan.apply(np.asarray(i, np.float32), banded=True, tile=16, min_ratio=1.2))
            for i in imgs
        ]
    )
    np.testing.assert_allclose(batched, single, atol=1e-3)


def test_band_plan_covers_all_taps():
    """Every nonzero of each dst row lies inside its tile's extracted band,
    and re-assembling the tiles reproduces the dense matrix exactly."""
    from padel_analytics_tpu.ops.resize import _band_plan, pil_resample_matrix

    for src, dst in [(1920, 1280), (1080, 288), (240, 512)]:
        R = pil_resample_matrix(src, dst, "bicubic")
        starts, W, n_tiles, B = _band_plan(R, 128)
        dense = np.zeros_like(R)
        for t, s in enumerate(starts):
            r0, r1 = t * 128, min((t + 1) * 128, dst)
            dense[r0:r1, s : s + B] += W[t, : r1 - r0]
        np.testing.assert_array_equal(dense, R)


def test_banded_cv2_linear_exact_vs_dense(rng):
    """cv2-linear (2-tap) banded output equals cv2 within fixed-point slack."""
    img = _rand_img(rng, 135, 240)
    plan = resize_plan((135, 240), (45, 80), "cv2_linear")
    ours = np.asarray(plan.apply(np.asarray(img, np.float32), banded=True, tile=16, min_ratio=1.2))
    ref = cv2.resize(img, (80, 45), interpolation=cv2.INTER_LINEAR).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0


def test_pil_default_filter_is_bicubic(rng):
    """The reference calls Image.resize without a filter
    (players_keypoints_tracker.py:264); pin the default."""
    img = _rand_img(rng, 40, 50)
    default = np.asarray(Image.fromarray(img).resize((20, 25)))
    bicubic = np.asarray(Image.fromarray(img).resize((20, 25), Image.BICUBIC))
    assert np.array_equal(default, bicubic)


@pytest.mark.parametrize("src,dst", [((108, 192), (36, 64)), ((50, 70), (100, 140))])
def test_cv2_linear_parity(rng, src, dst):
    img = _rand_img(rng, *src)
    plan = resize_plan(src, dst, "cv2_linear")
    ours = np.asarray(plan.apply(np.asarray(img, np.float32)))
    ref = cv2.resize(img, dst[::-1], interpolation=cv2.INTER_LINEAR).astype(np.float32)
    # cv2 uses fixed-point bilinear; ours is float. Allow ~1 intensity step.
    assert np.abs(ours - ref).max() <= 1.0


def test_letterbox_geometry():
    """1920x1080 at imgsz 640 with stride-32 auto padding -> 384x640 with
    12px top/bottom pads (ultralytics LetterBox math)."""
    plan = letterbox_plan((1080, 1920), 640)
    assert (plan.out_h, plan.out_w) == (384, 640)
    assert plan.plan.dst_hw == (360, 640)
    assert plan.pad_top == 12 and plan.pad_left == 0
    np.testing.assert_allclose(plan.gain, 640 / 1920)


def test_letterbox_apply_and_inverse(rng):
    img = _rand_img(rng, 108, 192)
    plan = letterbox_plan((108, 192), 64)
    out = np.asarray(plan.apply(np.asarray(img, np.float32)))
    assert out.shape == (plan.out_h, plan.out_w, 3)
    # Padded rows are the constant 114.
    assert np.all(out[0] == 114.0)
    # Round-trip a box through the transform.
    import jax.numpy as jnp

    box_src = np.array([10.0, 20.0, 100.0, 90.0])
    box_lb = box_src * plan.gain + np.array(
        [plan.pad_left, plan.pad_top, plan.pad_left, plan.pad_top]
    )
    back = np.asarray(plan.boxes_to_source(jnp.asarray(box_lb)))
    np.testing.assert_allclose(back, box_src, atol=1e-5)
