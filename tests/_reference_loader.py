"""Shared machinery to import reference modules AS-IS for twin tests.

The reference checkout at /root/reference is pure Python but its package
__init__ files import packages absent from this image (ultralytics,
torchvision, streamlit). These helpers load individual reference modules
by file path, fabricating just enough package/module structure around
them:

- `supervision` / `parse` are stubbed (on the loaded paths they are only
  type annotations or unused imports);
- the reference's `trackers` package __init__ is bypassed; where a module
  does `from trackers import Player, ...` (projected_court.py:9) the
  fabricated package exposes OUR byte-compatible result objects — the
  twin then also proves the object interfaces line up;
- `constants` and `utils` are the reference's real packages (pure
  numpy/cv2/PIL).
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference"


def ensure_stub(name: str, attrs: dict | None = None):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        for k, v in (attrs or {}).items():
            setattr(mod, k, v)
        sys.modules[name] = mod
    return sys.modules[name]


def load_module(name: str, relpath: str):
    """Load REF/relpath as sys.modules[name] (idempotent)."""
    if name in sys.modules and getattr(sys.modules[name], "__file__", None):
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_package(name: str, reldir: str):
    """Load the real reference package REF/reldir (with submodules)."""
    if name in sys.modules and getattr(sys.modules[name], "__file__", None):
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name,
        f"{REF}/{reldir}/__init__.py",
        submodule_search_locations=[f"{REF}/{reldir}"],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _fabricate_trackers_pkg():
    ensure_stub("supervision", {"VideoInfo": object})
    ensure_stub("parse")
    if "trackers" not in sys.modules:
        pkg = types.ModuleType("trackers")
        pkg.__path__ = [f"{REF}/trackers"]
        sys.modules["trackers"] = pkg
        sub = types.ModuleType("trackers.ball_tracker")
        sub.__path__ = [f"{REF}/trackers/ball_tracker"]
        sys.modules["trackers.ball_tracker"] = sub
    return sys.modules["trackers"]


def reference_ball_module():
    """The reference's trackers/ball_tracker/ball_tracker.py, loaded
    as-is with its real sibling modules."""
    _fabricate_trackers_pkg()
    load_module("trackers.tracker", "trackers/tracker.py")
    load_module("trackers.ball_tracker.models", "trackers/ball_tracker/models.py")
    load_module("trackers.ball_tracker.iterable", "trackers/ball_tracker/iterable.py")
    load_module("trackers.ball_tracker.predict", "trackers/ball_tracker/predict.py")
    load_module("trackers.ball_tracker.dataset", "trackers/ball_tracker/dataset.py")
    return load_module(
        "trackers.ball_tracker.ball_tracker",
        "trackers/ball_tracker/ball_tracker.py",
    )


def reference_data_analytics_module():
    """The reference's analytics/data_analytics.py (pandas+numpy only)."""
    return load_module("analytics.data_analytics", "analytics/data_analytics.py")


def reference_projected_court_module():
    """The reference's analytics/projected_court.py, fed OUR
    byte-compatible result objects through the fabricated trackers pkg."""
    pkg = _fabricate_trackers_pkg()
    from padel_analytics_tpu.trackers import (
        Ball,
        Keypoint,
        Keypoints,
        Player,
        Players,
    )

    for cls in (Ball, Keypoint, Keypoints, Player, Players):
        setattr(pkg, cls.__name__, cls)
    load_package("constants", "constants")
    load_package("utils", "utils")
    ensure_stub("analytics", {})
    reference_data_analytics_module()
    return load_module("analytics.projected_court", "analytics/projected_court.py")


def reference_velocity_module():
    """The reference's trackers/velocity_in_time.py."""
    reference_ball_module()
    return load_module("trackers.velocity_in_time", "trackers/velocity_in_time.py")
