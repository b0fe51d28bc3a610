"""TrackNet background-mode parity: window tensor construction for all
four bg_modes against a PIL/numpy twin of the reference's process_chunck
(/root/reference/trackers/ball_tracker/iterable.py:167-199), plus the
exact-median semantics and end-to-end BallTracker runs per mode."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from padel_analytics_tpu.config import BallTrackerConfig
from padel_analytics_tpu.ops.median import median_background
from padel_analytics_tpu.trackers._ballwindow import (
    assemble_windows,
    frame_channels,
    make_frame_preprocess,
    window_in_dim,
)

MODES = ["", "subtract", "subtract_concat", "concat"]
SRC_HW = (36, 64)
DST_HW = (16, 32)
SEQ = 4


def _frames(rng, n):
    return rng.integers(0, 256, size=(n,) + SRC_HW + (3,), dtype=np.uint8)


def _ref_window(imgs, median_float, bg_mode):
    """Reference-semantics window tensor (CHW stacking, iterable.py:167-199):
    per frame a PIL resize of the RGB image and/or the uint8-cast (wrapping)
    channel-summed |frame - float median| difference image; the uint8-cast
    resized median prepended for 'concat'; /255."""
    h, w = DST_HW
    groups = []
    for img_np in imgs:
        img = Image.fromarray(img_np)
        if bg_mode == "subtract":
            d = np.sum(
                np.absolute(np.asarray(img, np.float64) - median_float), 2
            ).astype("uint8")
            g = np.asarray(Image.fromarray(d).resize((w, h)))[None]
        elif bg_mode == "subtract_concat":
            d = np.sum(
                np.absolute(np.asarray(img, np.float64) - median_float), 2
            ).astype("uint8")
            d = np.asarray(Image.fromarray(d).resize((w, h)))[None]
            rgb = np.moveaxis(np.asarray(img.resize((w, h))), -1, 0)
            g = np.concatenate([rgb, d], axis=0)
        else:
            g = np.moveaxis(np.asarray(img.resize((w, h))), -1, 0)
        groups.append(g)
    chw = np.concatenate(groups, axis=0)
    if bg_mode == "concat":
        med_u8 = Image.fromarray(median_float.astype("uint8"))
        med = np.moveaxis(np.asarray(med_u8.resize((w, h))), -1, 0)
        chw = np.concatenate([med, chw], axis=0)
    return chw.astype(np.float64) / 255.0


def test_median_exact(rng):
    stack = _frames(rng, 10)
    ours = median_background(stack, exact=True)
    np.testing.assert_array_equal(ours, np.median(stack, 0).astype(np.float32))
    trunc = median_background(stack, exact=False)
    np.testing.assert_array_equal(trunc, np.median(stack, 0).astype(np.uint8))


@pytest.mark.parametrize("bg_mode", MODES)
def test_window_parity(rng, bg_mode):
    n = 8
    frames = _frames(rng, n)
    median_float = np.median(frames[:5], 0)

    pre = make_frame_preprocess(SRC_HW, DST_HW, bg_mode)
    per_frame = np.asarray(
        pre(
            jnp.asarray(frames),
            median_src=jnp.asarray(median_float.astype(np.float32)),
        )
    )
    assert per_frame.shape[-1] == frame_channels(bg_mode)

    med_resized = None
    if bg_mode == "concat":
        from padel_analytics_tpu.ops.resize import resize_plan

        plan = resize_plan(SRC_HW, DST_HW, "pil_bicubic")
        m = np.asarray(
            plan.apply(jnp.asarray(median_float.astype(np.uint8), jnp.float32))
        )
        med_resized = np.clip(np.floor(m + 0.5), 0, 255).astype(np.uint8)

    batch = n - SEQ + 1  # all full windows
    ours = np.asarray(
        assemble_windows(
            jnp.asarray(per_frame),
            jnp.asarray(med_resized) if med_resized is not None else None,
            bg_mode,
            SEQ,
            batch,
        )
    )
    assert ours.shape == (batch,) + DST_HW + (window_in_dim(bg_mode, SEQ),)

    for w0 in range(batch):
        ref = _ref_window(list(frames[w0 : w0 + SEQ]), median_float, bg_mode)
        got = np.moveaxis(ours[w0], -1, 0)
        # float32 resize path: within one intensity step of Pillow.
        diff = np.abs(got * 255.0 - ref * 255.0)
        assert diff.max() <= 1.0 + 1e-5, (bg_mode, w0, diff.max())
        assert (diff > 0.5).mean() < 0.02


@pytest.mark.parametrize("bg_mode", MODES)
def test_balltracker_runs_all_modes(rng, bg_mode):
    from padel_analytics_tpu.trackers import BallTracker
    from padel_analytics_tpu.utils.video import VideoInfo

    n = 12
    cfg = BallTrackerConfig(
        batch_size=4,
        median_max_sample_num=5,
        bg_mode=bg_mode,
        height=DST_HW[0],
        width=DST_HW[1],
        seq_len=SEQ,
    )
    tracker = BallTracker(None, None, config=cfg, compute_dtype=jnp.float32)
    assert tracker.tracknet_in_dim == window_in_dim(bg_mode, SEQ)
    tracker.video_info_post_init(
        VideoInfo(width=SRC_HW[1], height=SRC_HW[0], fps=30.0, total_frames=n)
    )
    frames = _frames(rng, n)
    balls = tracker.predict_frames(iter(list(frames)), n)
    assert len(balls) == n
    for b in balls:
        assert b.visibility in (0, 1)
