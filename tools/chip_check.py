"""On-chip numerical sanity checks for the precision-sensitive ops.

The TPU's f32 matmuls default to bfloat16 passes (~1e-2 rel error), which
silently breaks ops that promise pixel/byte parity when they are not
pinned to `highest` precision — this bit homography in round 1 (8-20 px
error). This script drives each parity-critical op ON THE CURRENT
PLATFORM (run it plain for the real TPU; tests cover the CPU backend) and
prints PASS/FAIL per op:

- i420_to_rgb: element-exact vs cv2.cvtColor(COLOR_YUV2RGB_I420)
- homography: <=0.05 px vs cv2.findHomography on exact correspondences
- PIL-parity resize: <=1 intensity step vs Pillow bicubic
- heatmap decode: equal to the cv2 contour reference decode

Usage: python tools/chip_check.py   (exit code 0 iff all pass)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import jax
import jax.numpy as jnp

FAILED = []


def check(name: str, ok: bool, detail: str = "") -> None:
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    if not ok:
        FAILED.append(name)


def main() -> int:
    print(f"platform: {jax.devices()}")
    rng = np.random.default_rng(0)

    # ---- I420 -> RGB element exactness ----
    from padel_analytics_tpu.ops.color import i420_to_rgb

    rgb = rng.integers(0, 256, (4, 64, 96, 3), np.uint8)
    i420 = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in rgb])
    ours = np.asarray(i420_to_rgb(jnp.asarray(i420), 64)).astype(np.uint8)
    ref = np.stack([cv2.cvtColor(p, cv2.COLOR_YUV2RGB_I420) for p in i420])
    diff = int(np.abs(ours.astype(int) - ref.astype(int)).max())
    check("i420_to_rgb", diff == 0, f"maxdiff={diff}")

    # ---- homography vs cv2 on exact correspondences ----
    from padel_analytics_tpu.ops.homography import find_homography, project_points

    src = rng.uniform(50, 1800, (12, 2)).astype(np.float64)
    h_true = np.array(
        [[0.9, 0.08, 30.0], [-0.05, 1.1, -20.0], [1e-5, -2e-5, 1.0]]
    )
    dst_h = (np.c_[src, np.ones(12)] @ h_true.T)
    dst = dst_h[:, :2] / dst_h[:, 2:]
    ours_h = np.asarray(find_homography(jnp.asarray(src), jnp.asarray(dst)))
    proj = np.asarray(
        project_points(jnp.asarray(ours_h), jnp.asarray(src))
    )
    err = float(np.abs(proj - dst).max())
    check("homography", err <= 0.05, f"max_px_err={err:.2e}")

    # ---- PIL-parity bicubic resize ----
    from PIL import Image

    from padel_analytics_tpu.ops.resize import resize_plan

    img = rng.integers(0, 256, (108, 192, 3), np.uint8)
    plan = resize_plan((108, 192), (64, 64), "pil_bicubic")
    out = np.asarray(plan.apply(jnp.asarray(img, jnp.float32)))
    ours_u8 = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    pil = np.asarray(Image.fromarray(img).resize((64, 64), Image.BICUBIC))
    rdiff = int(np.abs(ours_u8.astype(int) - pil.astype(int)).max())
    check("pil_bicubic_resize", rdiff <= 1, f"maxdiff={rdiff}")

    # ---- banded resize path at a multi-tile production-like shape ----
    # (108,192)->(64,64) above takes the single-tile dense fallback; this
    # one exercises the block-banded matmul the fused pipeline runs at
    # 1080p (tile=128, multiple tiles, HIGH-precision band matmuls).
    img_b = rng.integers(0, 256, (540, 960, 3), np.uint8)
    plan_b = resize_plan((540, 960), (288, 512), "pil_bicubic")
    out_b = np.asarray(
        plan_b.apply(jnp.asarray(img_b, jnp.float32), banded=True, min_ratio=1.2)
    )
    ours_b = np.clip(np.floor(out_b + 0.5), 0, 255).astype(np.uint8)
    pil_b = np.asarray(Image.fromarray(img_b).resize((512, 288), Image.BICUBIC))
    bdiff = int(np.abs(ours_b.astype(int) - pil_b.astype(int)).max())
    check("pil_bicubic_resize_banded", bdiff <= 1, f"maxdiff={bdiff}")

    # ---- cv2-bilinear resize (the letterbox/det path's kernel) ----
    plan_cv = resize_plan((108, 192), (64, 114), "cv2_linear")
    out_cv = np.asarray(plan_cv.apply(jnp.asarray(img, jnp.float32)))
    ours_cv = np.clip(np.round(out_cv), 0, 255).astype(np.uint8)
    ref_cv = cv2.resize(img, (114, 64), interpolation=cv2.INTER_LINEAR)
    cdiff = int(np.abs(ours_cv.astype(int) - ref_cv.astype(int)).max())
    check("cv2_bilinear_resize", cdiff <= 1, f"maxdiff={cdiff}")

    # ---- heatmap decode vs cv2 contour reference ----
    from padel_analytics_tpu.ops.heatmap import decode_heatmaps

    heat = np.zeros((2, 72, 128), np.float32)
    heat[0, 30:36, 40:48] = 0.9  # one blob
    heat[1, 10:14, 100:104] = 0.8
    heat[1, 50:60, 20:34] = 0.95  # larger second blob wins
    cx, cy, vis = (np.asarray(a) for a in decode_heatmaps(jnp.asarray(heat)))

    def cv2_decode(h):
        binary = (h > 0.5).astype(np.uint8) * 255
        cnts, _ = cv2.findContours(
            binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        if not cnts:
            return 0, 0, 0
        rects = [cv2.boundingRect(c) for c in cnts]
        x, y, w, hh = max(rects, key=lambda r: r[2] * r[3])
        return int(x + w / 2), int(y + hh / 2), 1
    ok = True
    for i in range(2):
        rx, ry, rv = cv2_decode(heat[i])
        ok &= (int(cx[i]), int(cy[i]), int(vis[i])) == (rx, ry, rv)
    check("heatmap_decode", ok)

    # ---- TrackNet subpixel up-conv rewrite (models/tracknet.py) ----
    # Exact algebraic identity in f32: on this platform's conv emitter
    # the two paths must agree to summation-order noise, or the
    # subpixel_up flag must stay off here.
    import jax as _jax

    from padel_analytics_tpu.models.tracknet import TrackNet, make_tracknet

    base, in_dim = make_tracknet(8, "concat", dtype=jnp.float32)
    x8 = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (1, 48, 64, in_dim)),
        jnp.float32,
    )
    variables = base.init(_jax.random.PRNGKey(0), x8)
    want = np.asarray(base.apply(variables, x8))
    sub = TrackNet(out_dim=8, dtype=jnp.float32, subpixel_up=True)
    got = np.asarray(sub.apply(variables, x8))
    sdiff = float(np.abs(got - want).max())
    check("tracknet_subpixel_up_f32", sdiff < 2e-5, f"maxdiff={sdiff:.2e}")

    print("ALL PASS" if not FAILED else f"FAILURES: {FAILED}")
    return 0 if not FAILED else 1


if __name__ == "__main__":
    raise SystemExit(main())
