"""Analytics-layer twins vs the ACTUAL reference implementation.

Runs the reference's DataAnalytics (pandas feature table), ProjectedCourt
(minimap geometry, homography, projection, origin shift, rendering), and
velocity_in_time modules AS-IS (loaded by file path, see
_reference_loader) next to ours on identical inputs. The reference
classes consume OUR byte-compatible result objects directly — interface
compatibility is part of what's being proven.
"""

from types import SimpleNamespace

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from _reference_loader import (
    reference_data_analytics_module,
    reference_projected_court_module,
    reference_velocity_module,
)

from padel_analytics_tpu.analytics.data_analytics import DataAnalytics
from padel_analytics_tpu.analytics.projected_court import ProjectedCourt
from padel_analytics_tpu.trackers import Ball, Keypoint, Keypoints, Player
from padel_analytics_tpu.utils.video import VideoInfo


def _position_stream(rng, n=40):
    """Per-frame positions for players 1-4 (meters, smooth walks)."""
    base = {1: (-2.0, -5.0), 2: (2.0, -5.0), 3: (-2.0, 5.0), 4: (2.0, 5.0)}
    stream = []
    for i in range(n):
        frame = {}
        for pid, (bx, by) in base.items():
            frame[pid] = (
                bx + float(np.sin(i / 7 + pid)) + float(rng.normal(0, 0.05)),
                by + float(np.cos(i / 9 + pid)) + float(rng.normal(0, 0.05)),
            )
        stream.append(frame)
    return stream


def test_data_analytics_dataframe_matches_reference(rng):
    ref_mod = reference_data_analytics_module()
    stream = _position_stream(rng)

    ref = ref_mod.DataAnalytics()
    ours = DataAnalytics()
    for frame in stream:
        for pid, pos in frame.items():
            ref.add_player_position(pid, pos)
            ours.add_player_position(pid, pos)
        ref.step(1)
        ours.step(1)

    df_ref = ref.into_dataframe(30.0)
    df_ours = ours.into_dataframe(30.0)
    assert list(df_ours.columns) == list(df_ref.columns)
    assert df_ours.shape == df_ref.shape
    for col in df_ref.columns:
        np.testing.assert_allclose(
            df_ours[col].to_numpy(dtype=float),
            df_ref[col].to_numpy(dtype=float),
            rtol=1e-9, atol=1e-12, equal_nan=True,
            err_msg=f"column {col}",
        )


def _court_keypoints_12(w, h):
    pts = [
        (w * 0.12, h * 0.86), (w * 0.88, h * 0.86),
        (w * 0.13, h * 0.75), (w * 0.50, h * 0.75), (w * 0.87, h * 0.75),
        (w * 0.14, h * 0.55), (w * 0.86, h * 0.55),
        (w * 0.15, h * 0.36), (w * 0.50, h * 0.36), (w * 0.85, h * 0.36),
        (w * 0.16, h * 0.22), (w * 0.84, h * 0.22),
    ]
    return Keypoints(
        [Keypoint(id=i, xy=(float(x), float(y))) for i, (x, y) in enumerate(pts)]
    )


def test_projected_court_matches_reference(rng):
    ref_mod = reference_projected_court_module()
    w, h = 1920, 1080
    vi = VideoInfo(width=w, height=h, fps=30.0, total_frames=10)
    ref = ref_mod.ProjectedCourt(SimpleNamespace(width=w, height=h))
    ours = ProjectedCourt(vi)

    # minimap geometry: identical integer keypoint grid and origin
    for n in (12, 18, 22):
        ref_k = [k.xy for k in ref.court_keypoints.keypoints(number_keypoints=n)]
        our_k = [k.xy for k in ours.court_keypoints.keypoints(number_keypoints=n)]
        assert ref_k == our_k, f"minimap keypoints differ at n={n}"
    assert tuple(ref.court_keypoints.origin) == tuple(ours.court_keypoints.origin)

    # origin shift + px->m conversion: exact same arithmetic
    for p in [(100, 50), (963, 541), (40, 900)]:
        for dim in ("pixels", "meters"):
            assert ref.court_keypoints.shift_point_origin(
                p, dim
            ) == ours.court_keypoints.shift_point_origin(p, dim)

    # homography (reference: cv2.findHomography; ours: jnp DLT+GN) —
    # projections of in-court points agree to <=1 px after int truncation
    kp = _court_keypoints_12(w, h)
    H_ref = ref.homography_matrix(kp)
    H_ours = ours.homography_matrix(kp)
    for _ in range(40):
        p = (int(rng.uniform(0.1 * w, 0.9 * w)), int(rng.uniform(0.2 * h, 0.9 * h)))
        pr = ref.project_point(point=p, homography_matrix=H_ref)
        po = ours.project_point(point=p, homography_matrix=H_ours)
        assert abs(pr[0] - po[0]) <= 1 and abs(pr[1] - po[1]) <= 1, (p, pr, po)

    # player / ball projection: same feet/asint plumbing
    player = Player(xyxy=np.array([800.0, 500.0, 900.0, 700.0]), id=1,
                    class_id=0, confidence=0.9)
    pp_ref = ref.project_player(player, H_ref)
    pp_ours = ours.project_player(player, H_ours)
    assert (
        abs(pp_ref.projection[0] - pp_ours.projection[0]) <= 1
        and abs(pp_ref.projection[1] - pp_ours.projection[1]) <= 1
    )
    ball = Ball(frame=0, xy=(960.0, 540.0), visibility=1)
    pb_ref = ref.project_ball(ball, H_ref)
    pb_ours = ours.project_ball(ball, H_ours)
    assert (
        abs(pb_ref.projection[0] - pb_ours.projection[0]) <= 1
        and abs(pb_ref.projection[1] - pb_ours.projection[1]) <= 1
    )

    # rendering: byte-identical minimap background + court lines
    frame = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    bg_ref = ref.draw_background_single_frame(frame)
    bg_ours = ours.draw_background_single_frame(frame)
    np.testing.assert_array_equal(bg_ours, bg_ref)
    court_ref = ref.draw_projected_court_single_frame(bg_ref.copy())
    court_ours = ours.draw_projected_court_single_frame(bg_ours.copy())
    np.testing.assert_array_equal(court_ours, court_ref)


def test_velocity_vectors_match_reference(rng):
    ref_mod = reference_velocity_module()

    detections = [
        Ball(frame=i,
             xy=(float(200 + 30 * i + rng.normal(0, 2)),
                 float(400 + 10 * np.sin(i / 3))),
             visibility=1)
        for i in range(20)
    ]
    ref_vecs = ref_mod.get_velocity_vector_per_frame_interval(detections, 30.0)
    from padel_analytics_tpu.trackers.velocity_in_time import (
        get_velocity_vector_per_frame_interval,
        get_velocity_vectors_angle_per_frame_interval,
    )

    our_vecs = get_velocity_vector_per_frame_interval(detections, 30.0)
    assert len(ref_vecs) == len(our_vecs) == 19
    for a, b in zip(ref_vecs, our_vecs):
        assert a.vector == b.vector

    ref_angles = ref_mod.get_velocity_vectors_angle_per_frame_interval(ref_vecs)
    our_angles = get_velocity_vectors_angle_per_frame_interval(our_vecs)
    np.testing.assert_allclose(our_angles, ref_angles, rtol=1e-9, atol=1e-12)


def test_invisible_ball_draw_matches_reference(rng):
    """Reference gate is Ball TRUTHINESS only (projected_court.py:659):
    an invisible ball (xy=(0,0)) still projects through H and draws.
    Byte-compare the full projection pass with a shared H."""
    ref_mod = reference_projected_court_module()
    w, h = 640, 360
    vi = VideoInfo(width=w, height=h, fps=30.0, total_frames=4)
    ref = ref_mod.ProjectedCourt(SimpleNamespace(width=w, height=h))
    ours = ProjectedCourt(vi)

    kp = _court_keypoints_12(w, h)
    shared_h = ours.homography_matrix(kp)
    ref.H = shared_h
    ours.H = shared_h

    frame = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    for visibility in (0, 1):
        ball = Ball(frame=0, xy=(0.0, 0.0) if visibility == 0 else (320.0, 180.0),
                    visibility=visibility)
        out_ref, _ = ref.draw_projections_and_collect_data(
            frame.copy(), keypoints_detection=kp, players_detection=None,
            ball_detection=ball, data_analytics=None, is_fixed_keypoints=True,
        )
        out_ours, _ = ours.draw_projections_and_collect_data(
            frame.copy(), keypoints_detection=kp, players_detection=None,
            ball_detection=ball, data_analytics=None, is_fixed_keypoints=True,
        )
        np.testing.assert_array_equal(out_ours, out_ref)
