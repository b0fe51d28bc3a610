"""Core subsystem tests: checkpoint roundtrip, stage timer, video IO."""

import numpy as np
import pytest

import jax.numpy as jnp

from padel_analytics_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from padel_analytics_tpu.core.profiling import StageTimer


def test_checkpoint_msgpack_roundtrip(tmp_path):
    tree = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "batch_stats": {"mean": jnp.ones(3)},
    }
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(tree, path)
    zero = {
        "params": {"w": jnp.zeros((2, 3)), "b": jnp.ones(3)},
        "batch_stats": {"mean": jnp.zeros(3)},
    }
    restored = load_checkpoint(zero, path)
    np.testing.assert_array_equal(restored["params"]["w"], tree["params"]["w"])
    np.testing.assert_array_equal(
        restored["batch_stats"]["mean"], tree["batch_stats"]["mean"]
    )


def test_engine_save_load_variables(tmp_path):
    from padel_analytics_tpu.models.tracknet import InpaintNet
    from padel_analytics_tpu.trackers._engine import load_variables, save_variables

    model = InpaintNet()
    example = (jnp.zeros((1, 8, 2)), jnp.zeros((1, 8, 1)))
    v1 = load_variables(model, example, None)
    path = str(tmp_path / "inpaint.msgpack")
    save_variables(v1, path)
    v2 = load_variables(model, example, path)
    leaf1 = v1["params"]["down_1"]["conv"]["kernel"]
    leaf2 = v2["params"]["down_1"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(leaf1), np.asarray(leaf2))


def test_stage_timer():
    timer = StageTimer()
    with timer.stage("a"):
        pass
    with timer.stage("a"):
        pass
    with timer.stage("b", sync=jnp.ones(3) * 2):
        pass
    # Sync on a value produced INSIDE the body (the real use case: the
    # stage must block on its own device output, not a pre-existing one).
    with timer.stage("c") as st:
        st.value = jnp.ones(4) + 1
    # Callable sync, evaluated at exit.
    box = {}
    with timer.stage("d", sync=lambda: box["y"]):
        box["y"] = jnp.ones(2) * 3
    s = timer.summary()
    assert s["a"]["count"] == 2
    assert s["b"]["count"] == 1
    assert s["c"]["count"] == 1 and s["d"]["count"] == 1
    assert s["a"]["total_s"] >= 0


def test_video_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from padel_analytics_tpu.utils.video import (
        VideoInfo,
        VideoWriter,
        frame_generator,
        read_video,
        save_video,
    )

    path = str(tmp_path / "clip.mp4")
    frames = [
        np.full((32, 48, 3), i * 10, np.uint8) for i in range(8)
    ]
    save_video(frames, path, fps=10)
    info = VideoInfo.from_video_path(path)
    assert info.resolution_wh == (48, 32)
    assert info.total_frames == 8
    assert info.fps == pytest.approx(10.0)

    decoded = list(frame_generator(path))
    assert len(decoded) == 8
    # mp4 is lossy; mean intensity should be close.
    assert abs(float(decoded[3].mean()) - 30.0) < 6

    got, fps, w, h = read_video(path, max_frames=5)
    assert len(got) == 5 and (w, h) == (48, 32)

    # windowed decode
    part = list(frame_generator(path, start=2, end=6))
    assert len(part) == 4


def test_converters_roundtrip():
    from padel_analytics_tpu.utils import converters

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    b64 = converters.numpy_to_base64(img)
    back = converters.base64_to_numpy(b64)
    np.testing.assert_array_equal(img, back)


def test_court_segments_geometry():
    from padel_analytics_tpu.visualizations.padel_court import (
        padel_court_segments,
    )

    segs = padel_court_segments()
    assert len(segs) == 8
    xs = [s[0] for s in segs] + [s[2] for s in segs]
    ys = [s[1] for s in segs] + [s[3] for s in segs]
    assert min(xs) == -5 and max(xs) == 5
    assert min(ys) == -10 and max(ys) == 10


def test_native_framepack():
    from padel_analytics_tpu.io.native import native_available, pack_frames

    rng_ = np.random.default_rng(3)
    frames = [rng_.integers(0, 255, (24, 32, 3), dtype=np.uint8) for _ in range(5)]
    out = pack_frames(frames)
    np.testing.assert_array_equal(out, np.stack(frames))
    out2 = pack_frames(frames, swap=[True, False, True, False, False])
    np.testing.assert_array_equal(out2[0], frames[0][..., ::-1])
    np.testing.assert_array_equal(out2[1], frames[1])
    np.testing.assert_array_equal(out2[2], frames[2][..., ::-1])
    # native_available may be False in toolchain-less envs; the numpy
    # fallback above must be correct either way.
    assert native_available() in (True, False)


def test_compare_predictions_tool(tmp_path, capsys):
    import json

    from padel_analytics_tpu.apps import compare_predictions as cp

    balls_a = [{"frame": i, "xy": [10.0 * i, 5.0], "visibility": 1, "projection": None} for i in range(5)]
    balls_b = [{"frame": i, "xy": [10.0 * i + 0.5, 5.0], "visibility": 1, "projection": None} for i in range(5)]
    fa, fb = tmp_path / "a.json", tmp_path / "b.json"
    fa.write_text(json.dumps(balls_a))
    fb.write_text(json.dumps(balls_b))
    assert cp.main(["ball", str(fa), str(fb)]) == 0
    report = json.loads(capsys.readouterr().out)
    assert report["within_1px"] == 1.0
    assert abs(report["mean_px"] - 0.5) < 1e-9

    players_a = [[{"id": 1, "xyxy": [0, 0, 10, 10], "projection": None, "class_id": 0, "confidence": 0.9}]]
    players_b = [[{"id": 1, "xyxy": [0.5, 0, 10.5, 10], "projection": None, "class_id": 0, "confidence": 0.9}]]
    fa.write_text(json.dumps(players_a))
    fb.write_text(json.dumps(players_b))
    assert cp.main(["players", str(fa), str(fb)]) == 0
    report = json.loads(capsys.readouterr().out)
    assert report["id_agreement"] == 1.0 and report["mean_iou"] > 0.8
