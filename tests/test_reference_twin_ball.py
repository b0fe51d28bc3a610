"""Full ball-path twin vs the ACTUAL reference implementation.

Loads the reference's BallTracker from /root/reference (module-by-module,
bypassing trackers/__init__.py which needs ultralytics; `supervision` and
`parse` are stubbed — on this path they are type annotations / unused)
and runs its real predict_frames loop next to ours on the same synthetic
clip, requiring EXACT integer equality per frame.

Both sides use the same deterministic stand-in TrackNet (channel-WEIGHTED
brightness indicator, so BGR/RGB order matters and the reference's
median-buffer double-conversion quirk — iterable.py:63-64,160, our
`channel_quirk` — is actually discriminated). Model-forward parity of the
real TrackNet is covered separately by the torch-twin tests
(tests/test_models.py); what this test pins against the reference's own
code is everything AROUND the model: median estimation (np.median +
uint8 truncation + PIL resize), sliding-window assembly and /255
normalization, the rolling overlap-ensemble buffer with its incomplete-
head and tail branches (ball_tracker.py:449-523), predict_modified's
contour decode and double-int scaling (predict.py:149-221), and
visibility semantics.

Interception note: with inpaintnet=None the reference's final assembly
reads pred_dict["Frame"]/["X"]/... which its tracknet path never fills
(predict_modified returns lowercase keys; ball_tracker.py:677-696 vs
predict.py:169-173) — a latent reference bug (the shipped config always
sets an InpaintNet, whose path uses the capitalized dict; that path in
turn hardcodes .cuda(), ball_tracker.py:572-575). So the twin records
the per-batch predict_modified outputs (the complete per-frame stream in
frame order) and tolerates the terminal KeyError.
"""

import json
from types import SimpleNamespace

import numpy as np
import pytest

pytestmark = pytest.mark.smoke
import torch

import jax.numpy as jnp

from _reference_loader import reference_ball_module

W_SRC, H_SRC, N = 128, 96, 26
W_NET, H_NET = 128, 72  # shrunk from 512x288 (class attrs, patched below)


# Channel-WEIGHTED indicator: sensitive to RGB vs BGR order (weights are
# powers of two so the products are exact in f32 on both frameworks).
_W = (0.5, 0.25, 0.25)


class _TorchFake(torch.nn.Module):
    def forward(self, x):  # (B, 27, H, W): median 3ch + 8 frames x 3ch
        maps = []
        for c in range(8):
            r, g, b = (x[:, 3 + 3 * c], x[:, 4 + 3 * c], x[:, 5 + 3 * c])
            maps.append(
                ((_W[0] * r + _W[1] * g + _W[2] * b) > 0.5).float()
            )
        return torch.stack(maps, 1)


class _JaxFake:
    def apply(self, variables, x):  # (B, H, W, 27)
        maps = []
        for c in range(8):
            r, g, b = (x[..., 3 + 3 * c], x[..., 4 + 3 * c], x[..., 5 + 3 * c])
            maps.append(
                ((_W[0] * r + _W[1] * g + _W[2] * b) > 0.5).astype(jnp.float32)
            )
        return jnp.stack(maps, axis=-1)


def _make_clip_bgr():
    """Dark clip with a moving CHANNEL-ASYMMETRIC blob: BGR (40,120,240)
    is over the fake's 0.5 threshold in RGB order (0.63) but under it
    when channel-swapped (0.43) — channel-order mistakes anywhere in
    either pipeline zero the detections."""
    frames = []
    for i in range(N):
        f = np.full((H_SRC, W_SRC, 3), 30, np.uint8)
        x0 = 8 + (4 * i) % 100
        f[40:56, x0 : x0 + 14] = (40, 120, 240)
        frames.append(f)
    return frames


def test_ball_path_matches_reference_exactly(tmp_path):
    """Both sides receive the SAME precomputed median (the reference's
    own recipe: float np.median over the head frames in RGB). Letting the
    reference compute it internally would also trigger its median-buffer
    window restart (iterable.py:201-217: frames_in_memory and the live
    generator get SEPARATE generator_chuncks calls, silently dropping the
    seq_len-1 windows spanning the boundary and shifting every later
    prediction's positional frame attribution) — an intentional
    divergence we document in PARITY.md rather than replicate."""
    import cv2

    ref_mod = reference_ball_module()

    # tiny real checkpoint in the reference's dict format (consumed at
    # ball_tracker.py:253-274); the model is then swapped for the fake
    net = ref_mod.get_model("TrackNet", 8, "concat")
    ckpt = tmp_path / "tracknet.pt"
    torch.save(
        {"param_dict": {"seq_len": 8, "bg_mode": "concat"},
         "model": net.state_dict()},
        str(ckpt),
    )

    RefBallTracker = ref_mod.BallTracker
    orig_hw = (RefBallTracker.HEIGHT, RefBallTracker.WIDTH)
    records: list[dict] = []
    orig_pm = ref_mod.predict_modified

    def recording_pm(*args, **kwargs):
        out = orig_pm(*args, **kwargs)
        records.append(out)
        return out

    frames_bgr = _make_clip_bgr()
    frames_rgb = [cv2.cvtColor(f, cv2.COLOR_BGR2RGB) for f in frames_bgr]
    # the reference's median recipe (iterable.py:69-74): float np.median
    # over the head frames in RGB
    median = np.median(np.stack(frames_rgb[:6]).astype(np.float64), axis=0)

    try:
        RefBallTracker.HEIGHT, RefBallTracker.WIDTH = H_NET, W_NET
        ref_mod.predict_modified = recording_pm
        ref = RefBallTracker(
            tracking_model_path=str(ckpt),
            inpainting_model_path=None,
            batch_size=4,
            median_max_sample_num=6,
            median=median,
        )
        ref.tracknet = _TorchFake().eval()
        ref.video_info_post_init(
            SimpleNamespace(width=W_SRC, height=H_SRC, fps=10.0,
                            total_frames=N)
        )
        # the reference consumes cv2-decoded (BGR) frames
        with pytest.raises(KeyError):  # latent 'Frame' key bug, see header
            ref.predict_frames(iter(frames_bgr), total_frames=N)
    finally:
        RefBallTracker.HEIGHT, RefBallTracker.WIDTH = orig_hw
        ref_mod.predict_modified = orig_pm

    ref_x = [v for r in records for v in r["x"]]
    ref_y = [v for r in records for v in r["y"]]
    ref_vis = [v for r in records for v in r["visibility"]]
    assert len(ref_x) == N  # head + steady + tail branches all emitted

    # ---- ours on the same clip (RGB at the decode boundary) ----
    from padel_analytics_tpu.config import BallTrackerConfig
    from padel_analytics_tpu.trackers import BallTracker
    from padel_analytics_tpu.utils.video import VideoInfo

    ball = BallTracker(
        None, None, compute_dtype=jnp.float32, median=median,
        config=BallTrackerConfig(height=H_NET, width=W_NET, batch_size=4,
                                 median_max_sample_num=6),
    )
    ball.tracknet.model = _JaxFake()
    ball.video_info_post_init(
        VideoInfo(width=W_SRC, height=H_SRC, fps=10.0, total_frames=N)
    )
    ours = ball.predict_frames(iter(frames_rgb), total_frames=N)
    assert len(ours) == N

    mism = [
        (i, (int(b.xy[0]), int(b.xy[1]), int(b.visibility)),
         (ref_x[i], ref_y[i], ref_vis[i]))
        for i, b in enumerate(ours)
        if (int(b.xy[0]), int(b.xy[1]), int(b.visibility))
        != (ref_x[i], ref_y[i], ref_vis[i])
    ]
    assert not mism, f"{len(mism)} frame(s) diverge from the reference: {mism[:8]}"
    # the comparison must be non-trivial: the blob is detected and moves
    assert sum(ref_vis) >= N - 2
    assert len(set(zip(ref_x, ref_y))) > 5


def test_json_cache_interop_with_reference(tmp_path):
    """Cache files cross frameworks: predictions saved by OUR tracker load
    through the reference's own load_predictions (and back), object for
    object — a reference user can switch mid-project and keep caches."""
    import cv2

    ref_mod = reference_ball_module()

    from padel_analytics_tpu.config import BallTrackerConfig
    from padel_analytics_tpu.trackers import BallTracker
    from padel_analytics_tpu.utils.video import VideoInfo

    frames_rgb = [
        cv2.cvtColor(f, cv2.COLOR_BGR2RGB) for f in _make_clip_bgr()
    ]
    ours_json = tmp_path / "ball_ours.json"
    ball = BallTracker(
        None, None, compute_dtype=jnp.float32, save_path=str(ours_json),
        config=BallTrackerConfig(height=H_NET, width=W_NET, batch_size=4,
                                 median_max_sample_num=6),
    )
    ball.tracknet.model = _JaxFake()
    ball.video_info_post_init(
        VideoInfo(width=W_SRC, height=H_SRC, fps=10.0, total_frames=N)
    )
    ball.predict_and_update(iter(frames_rgb), total_frames=N)
    ball.save_predictions()
    # normalize through JSON (tuples become lists) — the on-disk format is
    # what must interoperate, not in-memory Python types
    ours_serialized = json.loads(
        json.dumps([b.serialize() for b in ball.results.predictions])
    )

    # reference loads OUR cache through its own machinery
    net = ref_mod.get_model("TrackNet", 8, "concat")
    ckpt = tmp_path / "tracknet.pt"
    torch.save(
        {"param_dict": {"seq_len": 8, "bg_mode": "concat"},
         "model": net.state_dict()},
        str(ckpt),
    )
    ref = ref_mod.BallTracker(
        tracking_model_path=str(ckpt),
        inpainting_model_path=None,
        batch_size=4,
        median_max_sample_num=6,
        load_path=str(ours_json),
    )
    assert len(ref.results.predictions) == N
    assert json.loads(
        json.dumps([b.serialize() for b in ref.results.predictions])
    ) == ours_serialized

    # and back: the reference's save_predictions round-trips into ours
    ref_json = tmp_path / "ball_ref.json"
    ref.save_path = str(ref_json)
    ref.save_predictions()
    ball2 = BallTracker(
        None, None, compute_dtype=jnp.float32, load_path=str(ref_json),
        config=BallTrackerConfig(height=H_NET, width=W_NET, batch_size=4,
                                 median_max_sample_num=6),
    )
    assert json.loads(
        json.dumps([b.serialize() for b in ball2.results.predictions])
    ) == ours_serialized
