"""Checkpoint-loading semantics: num_classes inference from the cls head
(the reference's players weights are stock COCO yolov8m.pt with 80
classes, filtered to person via classes=[0] — players_tracker.py:351-359),
and strictness of _merge_variables on partial checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padel_analytics_tpu.models.yolov8 import YOLOv8
from padel_analytics_tpu.trackers import _engine
from padel_analytics_tpu.trackers import players as players_mod
from padel_analytics_tpu.ops.polygon import PolygonZone


def _fake_converted_variables(num_classes: int):
    model = YOLOv8(variant="n", num_classes=num_classes)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    from flax import serialization

    return serialization.to_state_dict(variables)


def test_num_classes_inferred_from_checkpoint(tmp_path, monkeypatch):
    fake = _fake_converted_variables(80)
    path = tmp_path / "coco80.pt"
    path.write_bytes(b"placeholder")
    monkeypatch.setattr(players_mod, "_load_yolo_pt", lambda p: fake)

    tracker = players_mod.PlayerTracker(
        str(path),
        PolygonZone(
            np.array([[2, 62], [62, 62], [62, 2], [2, 2]]),
            frame_resolution_wh=(64, 64),
        ),
        batch_size=2,
        model_variant="n",
        compute_dtype=jnp.float32,
    )
    tracker.IMGSZ = 64
    assert tracker.num_classes == 80
    # class-0 selection before NMS: the step runs with the 80-class head.
    tracker2 = players_mod.PlayerTracker(
        None, None, batch_size=2, model_variant="n",
        compute_dtype=jnp.float32, num_classes=80,
    )
    tracker2.IMGSZ = 64
    frames = np.zeros((2, 64, 64, 3), np.uint8)
    boxes, scores, valid = tracker2.detect_sample(frames)
    assert boxes.shape[-1] == 4 and scores.shape == valid.shape


def test_num_classes_conflict_raises(tmp_path, monkeypatch):
    fake = _fake_converted_variables(80)
    path = tmp_path / "coco80.pt"
    path.write_bytes(b"placeholder")
    monkeypatch.setattr(players_mod, "_load_yolo_pt", lambda p: fake)
    with pytest.raises(ValueError, match="checkpoint has 80"):
        players_mod.PlayerTracker(
            str(path), None, model_variant="n", num_classes=1,
            compute_dtype=jnp.float32,
        )


def test_merge_variables_raises_on_missing_keys():
    model = YOLOv8(variant="n", num_classes=1)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    from flax import serialization

    loaded = serialization.to_state_dict(variables)
    # Drop one leaf: strict merge must raise, allow_partial must pass.
    del loaded["params"]["cls_0"]["proj"]["bias"]
    with pytest.raises(ValueError, match="missing"):
        _engine._merge_variables(variables, loaded)
    merged = _engine._merge_variables(variables, loaded, allow_partial=True)
    assert merged is not None


def test_convert_weights_cli_infers_coco80(tmp_path, monkeypatch):
    """The convert CLI must handle the documented primary case — the
    stock 80-class COCO players checkpoint — by inferring num_classes
    from the cls head instead of hard-coding 1."""
    from padel_analytics_tpu.apps import convert_weights
    from padel_analytics_tpu.models import convert as convert_mod

    fake = _fake_converted_variables(80)
    monkeypatch.setattr(
        convert_mod, "load_torch_checkpoint", lambda p: {"model": {}}
    )
    monkeypatch.setattr(
        convert_mod, "convert_yolov8_state_dict", lambda sd: fake
    )
    out = tmp_path / "det80.msgpack"
    rc = convert_weights.main(
        ["yolo", "in.pt", str(out), "--variant", "n", "--imgsz", "64"]
    )
    assert rc == 0 and out.exists()

    # --classes asserting the wrong count fails loudly.
    with pytest.raises(SystemExit):
        convert_weights.main(
            ["yolo", "in.pt", str(tmp_path / "x.msgpack"),
             "--variant", "n", "--imgsz", "64", "--classes", "1"]
        )
