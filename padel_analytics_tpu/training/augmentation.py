"""Frame-mixup augmentation for TrackNet training.

Reimplements the reference's training-time temporal mixup
(/root/reference/trackers/ball_tracker/dataset.py:506-624) as vectorized
jnp, jittable per batch:

1. for each adjacent frame pair, synthesize an interpolated frame
   lamb * prev + (1 - lamb) * cur with lamb ~ Beta(alpha, alpha);
2. the interpolated label follows the reference's casework — invisible
   current ball keeps the previous label; near-static or
   previously-invisible balls snap to the current label; otherwise the
   heatmaps blend with the same lamb;
3. the densified 2L-1 sequence is subsampled back to L frames (sorted
   random choice without replacement).

Runs on device as part of the input pipeline (the reference does this
per-sample in DataLoader workers on the host).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .tracknet import gaussian_heatmap_labels


@functools.partial(jax.jit, static_argnames=("height", "width", "sigma", "alpha"))
def frame_mixup(
    rng: jax.Array,
    frames: jnp.ndarray,  # (L, H, W, C) float frames of one window
    coords: jnp.ndarray,  # (L, 2) ball coords in heatmap pixels
    vis: jnp.ndarray,  # (L,) visibility
    height: int,
    width: int,
    sigma: float = 2.5,
    alpha: float = 0.5,
    coords_src: jnp.ndarray | None = None,  # (L, 2) SOURCE-resolution coords
):
    """Returns (frames (L, H, W, C), heatmaps (L, H, W), coords, vis)
    after mixup + resampling.

    `coords_src`: the reference evaluates its <10px snap threshold on
    SOURCE-resolution coordinates (dataset.py:585) — pass them when the
    window was resized or the snap radius silently grows by the resize
    factor. Defaults to `coords` (no resize).
    """
    l = frames.shape[0]
    rng_lamb, rng_pick = jax.random.split(rng)
    lamb = jax.random.beta(rng_lamb, alpha, alpha)
    if coords_src is None:
        coords_src = coords

    heat = gaussian_heatmap_labels(coords, height, width, sigma)  # (L, H, W)

    # Chained per-frame labels (dataset.py:580-601): an invisible frame
    # inherits the PREVIOUS label (prev_heatmap carries through runs of
    # invisible frames), so original-slot labels are the chain, not the
    # raw per-frame labels (which are zero when invisible).
    def _chain(carry, inp):
        h_i, v_i = inp
        out = jnp.where(v_i > 0, h_i, carry)
        return out, out

    _, chain_tail = jax.lax.scan(_chain, heat[0], (heat[1:], vis[1:]))
    heat_chain = jnp.concatenate([heat[:1], chain_tail], axis=0)  # (L, H, W)

    prev_f, cur_f = frames[:-1], frames[1:]
    prev_hc, cur_h = heat_chain[:-1], heat[1:]
    prev_c, cur_c = coords[:-1], coords[1:]
    prev_v, cur_v = vis[:-1], vis[1:]

    inter_f = prev_f * lamb + cur_f * (1.0 - lamb)

    dist = jnp.sqrt(
        jnp.sum((coords_src[:-1] - coords_src[1:]) ** 2, axis=-1)
    )
    # casework from dataset.py:580-597; the keep-prev branch uses the
    # CHAINED previous label, the blend branch's prev is also the chain
    # (equal to the raw label there since prev_v == 1 in that branch).
    keep_prev = cur_v == 0
    snap_cur = (~keep_prev) & ((prev_v == 0) | (dist < 10))

    inter_h = jnp.where(
        keep_prev[:, None, None],
        prev_hc,
        jnp.where(
            snap_cur[:, None, None],
            cur_h,
            prev_hc * lamb + cur_h * (1.0 - lamb),
        ),
    )
    inter_c = jnp.where(keep_prev[:, None], prev_c, cur_c)
    inter_v = jnp.where(keep_prev, prev_v, cur_v)

    # Interleave: f0, i01, f1, i12, f2, ... -> (2L-1, ...)
    def interleave(orig, inter):
        out_shape = (2 * l - 1,) + orig.shape[1:]
        out = jnp.zeros(out_shape, orig.dtype)
        out = out.at[0::2].set(orig)
        out = out.at[1::2].set(inter)
        return out

    all_f = interleave(frames, inter_f)
    all_h = interleave(heat_chain, inter_h)
    all_c = interleave(coords, inter_c)
    all_v = interleave(vis, inter_v)

    # Sorted sample of L of the 2L-1 slots (dataset.py:606-612).
    pick = jnp.sort(
        jax.random.choice(rng_pick, 2 * l - 1, shape=(l,), replace=False)
    )
    return all_f[pick], all_h[pick], all_c[pick], all_v[pick]


# ------------------------------------------------------------ YOLO augments
#
# Detection/pose augmentations for training/yolo.py, vectorized and
# jittable per batch (the ultralytics counterparts run per-sample in
# DataLoader workers on the host). Boxes are xyxy pixels, keypoints
# (x, y, vis) pixels; gt padding rows stay masked.


def hflip_boxes(
    rng: jax.Array,
    images: jnp.ndarray,  # (B, H, W, 3)
    boxes: jnp.ndarray,  # (B, M, 4) xyxy px
    kpts: jnp.ndarray | None = None,  # (B, M, K, 3)
    p: float = 0.5,
    flip_idx=None,  # (K,) keypoint permutation for mirrored skeletons
):
    """Random horizontal flip per image, mirroring boxes (and keypoints).

    flip_idx: for skeletons with left/right keypoint pairs, the index
    permutation to apply on flipped images (ultralytics' fliplr flip_idx)
    — mirroring a left-ankle's coordinates without relabeling it as the
    right ankle teaches inverted left/right semantics."""
    b = images.shape[0]
    w = images.shape[2]
    flip = jax.random.uniform(rng, (b,)) < p
    flipped = jnp.where(
        flip[:, None, None, None], images[:, :, ::-1, :], images
    )
    x1 = jnp.where(flip[:, None], w - boxes[..., 2], boxes[..., 0])
    x2 = jnp.where(flip[:, None], w - boxes[..., 0], boxes[..., 2])
    out_boxes = jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)
    if kpts is None:
        return flipped, out_boxes, None
    kx = jnp.where(flip[:, None, None], w - kpts[..., 0], kpts[..., 0])
    out_kpts = jnp.concatenate([kx[..., None], kpts[..., 1:]], axis=-1)
    if flip_idx is not None:
        fi = jnp.asarray(flip_idx, jnp.int32)
        out_kpts = jnp.where(
            flip[:, None, None, None], out_kpts[:, :, fi, :], out_kpts
        )
    return flipped, out_boxes, out_kpts


def mosaic4(
    rng: jax.Array,
    images: jnp.ndarray,  # (B, H, W, 3), B divisible by 4
    boxes: jnp.ndarray,  # (B, M, 4)
    mask: jnp.ndarray,  # (B, M)
    labels: jnp.ndarray,  # (B, M)
):
    """2x2 mosaic: every 4 consecutive images tile into one double-size
    canvas (fixed-shape variant of ultralytics' mosaic — no random crop,
    so box geometry stays exact). Returns (B/4, 2H, 2W, 3) images and the
    4M merged gt slots per canvas."""
    b, h, w, _ = images.shape
    assert b % 4 == 0, "mosaic4 needs batch divisible by 4"
    g = b // 4
    tiles = images.reshape(g, 4, h, w, 3)
    top = jnp.concatenate([tiles[:, 0], tiles[:, 1]], axis=2)
    bot = jnp.concatenate([tiles[:, 2], tiles[:, 3]], axis=2)
    canvas = jnp.concatenate([top, bot], axis=1)  # (g, 2H, 2W, 3)

    off = jnp.asarray(
        [[0.0, 0.0], [w, 0.0], [0.0, h], [w, h]], jnp.float32
    )  # (4, 2) per-quadrant x/y offsets
    bx = boxes.reshape(g, 4, -1, 4)
    shift = jnp.concatenate([off, off], axis=-1)[None, :, None, :]
    out_boxes = (bx + shift).reshape(g, -1, 4)
    out_mask = mask.reshape(g, -1)
    out_labels = labels.reshape(g, -1)
    return canvas, out_boxes, out_mask, out_labels
