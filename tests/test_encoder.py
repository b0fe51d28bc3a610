"""SubprocessVideoWriter: the pipe-fed child encode path used by
bench.py --encoder subprocess (round-4 verdict item 3 — overlapping the
12.1 ms/frame mp4v encode with the upload serializer's host work).

Same cv2 mp4v encoder runs in the child, so the decoded output must be
IDENTICAL to the inline writer's."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _frames(n=16, w=64, h=48):
    rng = np.random.default_rng(3)
    out = []
    for i in range(n):
        f = np.full((h, w, 3), 30, np.uint8)
        f[10 : 10 + 8, (i * 3) % (w - 8) : (i * 3) % (w - 8) + 8] = 220
        f += rng.integers(0, 5, f.shape, dtype=np.uint8)
        out.append(f)
    return out


def _decode_all(path):
    from padel_analytics_tpu.utils.video import frame_generator

    return list(frame_generator(path))


@pytest.mark.smoke
def test_subprocess_writer_output_identical_to_inline(tmp_path):
    from padel_analytics_tpu.utils.video import (
        SubprocessVideoWriter,
        VideoWriter,
        shutdown_shared_encoder,
    )

    frames = _frames()
    a, b = tmp_path / "a.mp4", tmp_path / "b.mp4"
    with VideoWriter(a, 30.0, (64, 48)) as w:
        for f in frames:
            w.write(f)
    try:
        with SubprocessVideoWriter(b, 30.0, (64, 48)) as w:
            for f in frames:
                w.write(f)
        # shared-child reuse: a second file through the same process
        c = tmp_path / "c.mp4"
        with SubprocessVideoWriter(c, 30.0, (64, 48)) as w:
            for f in frames:
                w.write(f)
    finally:
        shutdown_shared_encoder()

    da, db, dc = _decode_all(a), _decode_all(b), _decode_all(c)
    assert len(da) == len(db) == len(dc) == len(frames)
    for fa, fb, fc in zip(da, db, dc):
        np.testing.assert_array_equal(fa, fb)
        np.testing.assert_array_equal(fa, fc)


def test_runner_encoder_subprocess_end_to_end(tmp_path):
    """TrackingRunner(encoder='subprocess') renders the identical video
    to the inline path on a tiny fused run."""
    import jax.numpy as jnp

    from padel_analytics_tpu.config import BallTrackerConfig
    from padel_analytics_tpu.ops.polygon import PolygonZone
    from padel_analytics_tpu.trackers import (
        BallTracker,
        Keypoint,
        Keypoints,
        KeypointsTracker,
        PlayerKeypointsTracker,
        PlayerTracker,
        TrackingRunner,
    )
    from padel_analytics_tpu.utils.video import shutdown_shared_encoder

    w, h, n = 192, 128, 12
    video = tmp_path / "clip.mp4"
    writer = cv2.VideoWriter(
        str(video), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (w, h)
    )
    for f in _frames(n, w, h):
        writer.write(f)
    writer.release()

    pts = [(w * x, h * y) for x, y in
           [(0.1, 0.9), (0.9, 0.9), (0.1, 0.7), (0.5, 0.7), (0.9, 0.7),
            (0.12, 0.5), (0.88, 0.5), (0.14, 0.3), (0.5, 0.3), (0.86, 0.3),
            (0.16, 0.15), (0.84, 0.15)]]
    kp = Keypoints([Keypoint(id=i, xy=(float(x), float(y)))
                    for i, (x, y) in enumerate(pts)])

    def build(out_path, encoder):
        players = PlayerTracker(
            None, PolygonZone(np.array(pts[:2] + pts[-1:] + pts[-2:-1]),
                              (w, h)),
            batch_size=4, model_variant="n", compute_dtype=jnp.float32,
        )
        players.IMGSZ = 64
        pose = PlayerKeypointsTracker(
            None, train_image_size=64, batch_size=4,
            model_variant="n", compute_dtype=jnp.float32,
        )
        ball = BallTracker(
            None, None, compute_dtype=jnp.float32,
            config=BallTrackerConfig(height=48, width=80, batch_size=4,
                                     median_max_sample_num=6),
        )
        court = KeypointsTracker(fixed_keypoints_detection=kp)
        return TrackingRunner(
            [players, pose, ball, court], str(video), str(out_path),
            fused=True, fused_chunk=4, encoder=encoder,
        )

    try:
        out_a = tmp_path / "inline.mp4"
        out_b = tmp_path / "sub.mp4"
        build(out_a, "inline").run()
        build(out_b, "subprocess").run()
    finally:
        shutdown_shared_encoder()

    da, db = _decode_all(out_a), _decode_all(out_b)
    assert len(da) == len(db) == n
    for fa, fb in zip(da, db):
        np.testing.assert_array_equal(fa, fb)