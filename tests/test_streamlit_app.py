"""Streamlit dashboard smoke: drive the full upload -> run -> views flow
(reference app.py:137-410) against a scripted fake `st` module and a stub
pipeline, so the dashboard wiring (including the velocity-estimator view,
the per-player summary table, and the court scatters) actually executes
in CI. streamlit/plotly are absent from this image, so the fakes stand in
for them; the analytics math itself is tested in tests/test_analytics.py.
"""

import collections
import os
import sys
import types
from unittest import mock

import cv2
import numpy as np
import pandas as pd
import pytest


class _Ctx:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class FakeStreamlit(types.ModuleType):
    """Scripted streamlit: widgets return script[label] or a sane default;
    render calls are recorded for assertions."""

    def __init__(self, script):
        super().__init__("streamlit")
        self.session_state = {}
        self._script = dict(script)
        self.calls = collections.defaultdict(list)

    # -- widgets ---------------------------------------------------------
    def _value(self, label, default):
        return self._script.get(label, default)

    def fragment(self, fn):
        return fn

    def text_input(self, label, value=""):
        return self._value(label, value)

    def form_submit_button(self, label="Submit"):
        return self._value(label, True)

    def slider(self, label, *args, **kwargs):
        default = args[2] if len(args) >= 3 else (args[0] if args else 0)
        return self._value(label, kwargs.get("value", default))

    def number_input(self, label, min_value=0, max_value=None, **kwargs):
        return self._value(label, min_value)

    def radio(self, label, options=None, **kwargs):
        return self._value(label, options[0])

    def checkbox(self, label, value=False):
        return self._value(label, True)

    def columns(self, spec):
        return tuple(_Ctx() for _ in spec)

    def form(self, name):
        return _Ctx()

    def spinner(self, msg):
        return _Ctx()

    # -- render sinks ------------------------------------------------------
    def _sink(self, name, *args, **kwargs):
        self.calls[name].append(args)

    def __getattr__(self, name):
        if name in (
            "title", "image", "write", "plotly_chart", "subheader",
            "video", "header", "dataframe", "markdown", "success",
        ):
            return lambda *a, **k: self._sink(name, *a, **k)
        raise AttributeError(name)


def _make_clip(path, w=64, h=48, n=8):
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for i in range(n):
        f = np.full((h, w, 3), 40, np.uint8)
        cv2.circle(f, (8 + i * 4, 24), 3, (250, 250, 90), -1)
        vw.write(f)
    vw.release()


def _stub_runner(n=8):
    from padel_analytics_tpu.analytics.velocity_estimator import (
        _court_template_meters,
    )
    from padel_analytics_tpu.trackers import Ball, Keypoint, Keypoints, Players
    from padel_analytics_tpu.utils.video import VideoInfo

    template = _court_template_meters() * 100.0 + np.array([960.0, 540.0])
    kps = Keypoints(
        [Keypoint(id=i, xy=(float(x), float(y)))
         for i, (x, y) in enumerate(template)]
    )

    def results(preds):
        return types.SimpleNamespace(
            results=types.SimpleNamespace(predictions=preds)
        )

    rows = {
        "time": np.arange(n) / 30.0,
        "player1_x": np.linspace(-3, 3, n),
        "player1_y": np.linspace(-8, 8, n),
    }
    for p in (1, 2, 3, 4):
        rows[f"player{p}_Vx4"] = np.linspace(0.5, 4.0, n) * p
        rows[f"player{p}_distance"] = np.full(n, 0.1 * p)
    df = pd.DataFrame(rows)

    return types.SimpleNamespace(
        run=lambda: None,
        video_info=VideoInfo(width=64, height=48, fps=30.0, total_frames=n),
        trackers={
            "players_tracker": results([Players([]) for _ in range(n)]),
            "ball_tracker": results(
                [Ball(frame=i, xy=(960.0 + 20.0 * i, 540.0), visibility=1)
                 for i in range(n)]
            ),
            "keypoints_tracker": results([kps for _ in range(n)]),
        },
        data_analytics=types.SimpleNamespace(into_dataframe=lambda fps: df),
    )


def test_dashboard_full_flow(tmp_path, monkeypatch):
    clip = tmp_path / "match.mp4"
    _make_clip(clip)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("PAT_STREAMLIT_NO_AUTORUN", "1")

    st = FakeStreamlit(
        {
            "Upload video: ": str(clip),
            "Upload": True,
            "Calculate velocity": True,
            "Second frame: ": 4,
            "Time Interval": 0.2,
        }
    )
    monkeypatch.setitem(sys.modules, "streamlit", st)
    plotly = mock.MagicMock(name="plotly")
    monkeypatch.setitem(sys.modules, "plotly", plotly)
    monkeypatch.setitem(sys.modules, "plotly.graph_objects", plotly.graph_objects)

    import importlib

    import padel_analytics_tpu.apps.cli as cli_mod
    import padel_analytics_tpu.visualizations.padel_court as pc

    runner = _stub_runner()
    monkeypatch.setattr(
        cli_mod, "build_pipeline", lambda cfg, interactive=True: runner
    )

    # padel_court may have been imported earlier in the session without
    # plotly (frozen _HAS_PLOTLY=False); rebind it under the fake, and
    # restore the real state afterwards.
    importlib.reload(pc)
    sys.modules.pop("padel_analytics_tpu.apps.streamlit_app", None)
    try:
        import padel_analytics_tpu.apps.streamlit_app as app

        app.main()
    finally:
        sys.modules.pop("padel_analytics_tpu.apps.streamlit_app", None)
        for name in ("plotly", "plotly.graph_objects", "streamlit"):
            sys.modules.pop(name, None)
        importlib.reload(pc)

    # upload + run happened
    assert os.path.exists("tmp.mp4")
    assert st.session_state["runner"] is runner
    assert st.session_state["df"] is not None
    assert st.session_state["video"] is not None
    assert st.calls["success"], "pipeline-run success banner missing"

    # velocity estimator view ran: a BallVelocity was written (20 px/frame
    # at scale 100 px/m and 30 fps -> 6 m/s)
    velocities = [
        a[0] for a in st.calls["write"]
        if a and hasattr(a[0], "norm") and not isinstance(a[0], str)
    ]
    assert velocities, "velocity estimator view did not run"
    assert velocities[0].norm == pytest.approx(6.0, rel=1e-3)

    # data views rendered: head + summary tables, velocity plot + 2 scatters
    assert len(st.calls["dataframe"]) >= 2
    assert len(st.calls["plotly_chart"]) >= 3
    assert st.calls["video"] and st.calls["image"]


def test_keypoint_picker_flow(tmp_path, monkeypatch):
    """Drive the click tool (reference ui.py) headlessly: capture the mouse
    callback, simulate 12 clicks, check the JSON it writes."""
    import padel_analytics_tpu.apps.keypoint_picker as picker

    clip = tmp_path / "clip.mp4"
    _make_clip(clip)
    out = tmp_path / "kps.json"

    state = {}

    monkeypatch.setattr(picker.cv2, "imshow", lambda *a: None)
    monkeypatch.setattr(picker.cv2, "destroyAllWindows", lambda: None)
    monkeypatch.setattr(
        picker.cv2, "setMouseCallback",
        lambda name, cb: state.__setitem__("cb", cb),
    )

    def fake_waitkey(_):
        cb = state["cb"]
        for i in range(12):
            cb(picker.cv2.EVENT_LBUTTONDOWN, 5 * i, 3 * i, None, None)
        return 0

    monkeypatch.setattr(picker.cv2, "waitKey", fake_waitkey)
    rc = picker.main([str(clip), str(out)])
    assert rc == 0
    import json

    kps = json.load(open(out))
    assert len(kps) == 12 and kps[3] == [15, 9]


def test_keypoint_picker_usage():
    import padel_analytics_tpu.apps.keypoint_picker as picker

    assert picker.main([]) == 2
