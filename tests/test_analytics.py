"""ProjectedCourt geometry, DataAnalytics features, velocity estimator."""

import math

import numpy as np
import pytest

from padel_analytics_tpu.analytics import (
    DataAnalytics,
    ProjectedCourt,
    ProjectedCourtKeypoints,
)
from padel_analytics_tpu.analytics.velocity_estimator import (
    BallVelocityEstimator,
    ImpactType,
    _court_template_meters,
)
from padel_analytics_tpu.trackers.objects import Ball, Keypoint, Keypoints, Player, Players
from padel_analytics_tpu.utils.video import VideoInfo


@pytest.fixture
def video_info():
    return VideoInfo(width=1920, height=1080, fps=30.0, total_frames=100)


def test_minimap_geometry_reference_math(video_info):
    """Exact integer geometry from projected_court.py:211-324."""
    court = ProjectedCourt(video_info)
    assert court.WIDTH == int(0.14 * 1920)  # 268
    assert court.HEIGHT == int(0.47 * 1080)  # 507
    bg = court.background_position
    assert bg.bottom_right[0] == 1920 - 50
    assert bg.top_left[0] == 1920 - 50 - court.WIDTH
    assert bg.top_left[1] == 50 and bg.bottom_right[1] == 50 + court.HEIGHT
    cp = court.court_position
    assert cp.top_left == (bg.top_left[0] + 20, bg.top_left[1] + 20)
    # court height = SIDE_LINE/BASE_LINE * width (20/10 = 2x)
    assert cp.height == int(20 * cp.width / 10)
    ck = court.court_keypoints
    assert ck.k11 == cp.top_left and ck.k2 == cp.bottom_right
    assert ck.width == cp.width
    # service line 3m from baseline
    assert ck.k3[1] == cp.bottom_right[1] - int(3 * cp.width / 10)
    # origin at court center
    assert ck.origin == (
        ck.k6[0] + int((ck.k7[0] - ck.k6[0]) / 2),
        ck.k6[1] + int((ck.k7[1] - ck.k6[1]) / 2),
    )


def test_correspondence_sets(video_info):
    ck = ProjectedCourt(video_info).court_keypoints
    assert len(ck.keypoints(12)) == 12
    k18 = ck.keypoints(18)
    assert len(k18) == 18
    # duplicated extras in reference order (projected_court.py:124-131)
    assert [k.id for k in k18[12:]] == [0, 1, 5, 6, 10, 11]
    k22 = ck.keypoints(22)
    assert [k.id for k in k22[12:]] == [0, 1, 2, 4, 5, 6, 7, 9, 10, 11]


def test_shift_point_origin_meters(video_info):
    ck = ProjectedCourt(video_info).court_keypoints
    # k7 is half a court width right of origin = BASE_LINE/2 meters.
    shifted = ck.shift_point_origin(tuple(float(v) for v in ck.k7), "meters")
    assert shifted[0] == pytest.approx(5.0, abs=0.05)


def test_homography_roundtrip_through_projected_court(video_info):
    court = ProjectedCourt(video_info)
    # Synthetic frame keypoints: a perspective-warped version of the minimap.
    h_true = np.array([[2.0, 0.3, -300.0], [0.1, 2.2, -200.0], [1e-4, 2e-4, 1.0]])
    dst = np.array([k.xy for k in court.court_keypoints.keypoints(12)])
    src = np.linalg.solve(
        h_true, np.concatenate([dst, np.ones((12, 1))], 1).T
    ).T
    src = src[:, :2] / src[:, 2:]
    detected = Keypoints(
        [Keypoint(id=i, xy=(float(x), float(y))) for i, (x, y) in enumerate(src)]
    )
    h = court.homography_matrix(detected)
    p = court.project_point(tuple(src[6]), h)
    assert p[0] == pytest.approx(dst[6][0], abs=0.1)
    assert p[1] == pytest.approx(dst[6][1], abs=0.1)


def test_homography_cache_policy(video_info):
    court = ProjectedCourt(video_info)
    dst = Keypoints(
        [
            Keypoint(id=i, xy=k.xy)
            for i, k in enumerate(court.court_keypoints.keypoints(12))
        ]
    )
    court._homography_for(dst, is_fixed=True)
    h1 = court.H
    assert h1 is not None
    # Fixed keypoints: H not recomputed (same object).
    court._homography_for(dst, is_fixed=True)
    assert court.H is h1
    # Moving keypoints: missing detection clears H.
    court._homography_for(None, is_fixed=False)
    assert court.H is None


def test_data_analytics_features():
    da = DataAnalytics()
    # Player 1 moves 1 m/frame in x at 10 fps -> Vx1 = 10 m/s.
    for f in range(10):
        da.add_player_position(1, (float(f), 0.0))
        da.add_player_position(2, (0.0, 0.5 * f))
        da.step(1)
    da.frames = da.frames[:-1]
    df = da.into_dataframe(fps=10)
    assert len(df) == 10
    assert df["player1_Vx1"].iloc[5] == pytest.approx(10.0)
    assert df["player1_Vnorm1"].iloc[5] == pytest.approx(10.0)
    assert df["player2_Vy2"].iloc[5] == pytest.approx(5.0)
    assert df["player1_Ax1"].iloc[5] == pytest.approx(0.0)
    assert df["player1_distance"].iloc[5] == pytest.approx(1.0)
    # player 3/4 columns exist, all NaN.
    assert df["player3_x"].isna().all()


def test_data_analytics_duplicate_id_raises():
    from padel_analytics_tpu.analytics.data_analytics import InvalidDataPoint

    da = DataAnalytics()
    da.add_player_position(1, (0.0, 0.0))
    da.add_player_position(1, (1.0, 1.0))
    with pytest.raises(InvalidDataPoint):
        da.step(1)


def test_data_analytics_into_dict_padding():
    da = DataAnalytics()
    da.add_player_position(2, (1.0, 2.0))
    da.step(1)
    da.step(1)  # empty frame
    da.frames = da.frames[:-1]
    d = da.into_dict()
    assert d["player2_x"] == [1.0, None]
    assert d["player1_x"] == [None, None]
    assert d["frame"] == [0, 1]


# ---------------------------------------------------------- velocity estimator


def _flat_court_keypoints(scale=100.0, cx=960.0, cy=540.0):
    """Frame keypoints = metric template scaled/offset (identity-ish view)."""
    template = _court_template_meters()
    pts = template * scale + np.array([cx, cy])
    return Keypoints(
        [Keypoint(id=i, xy=(float(x), float(y))) for i, (x, y) in enumerate(pts)]
    )


def test_velocity_estimator_planar():
    n = 20
    kps = [_flat_court_keypoints() for _ in range(n)]
    # Ball moves +2 m in x (200 px at scale 100) over 10 frames at 30 fps.
    balls = [
        Ball(frame=i, xy=(960.0 + 20.0 * i, 540.0), visibility=1) for i in range(n)
    ]
    players = [Players([]) for _ in range(n)]
    est = BallVelocityEstimator(30.0, players, balls, kps)
    data, vel = est.estimate_velocity(0, 10, ImpactType.FLOOR)
    # 200 px = 2 m over 1/3 s -> 6 m/s.
    assert vel.vx == pytest.approx(6.0, rel=1e-3)
    assert vel.vy == pytest.approx(0.0, abs=1e-6)
    assert vel.norm == pytest.approx(6.0, rel=1e-3)
    assert data.position_t0_proj[0] == pytest.approx(0.0, abs=1e-6)
    assert data.position_t1_proj[0] == pytest.approx(2.0, rel=1e-3)


def test_velocity_estimator_vz_with_player_reference():
    n = 20
    kps = [_flat_court_keypoints() for _ in range(n)]
    balls = [Ball(frame=i, xy=(960.0, 540.0 - 10.0 * i), visibility=1) for i in range(n)]
    # One player of pixel height 180 standing with feet at the ball's x.
    players = [
        Players([Player(xyxy=[940, 400, 980, 580], id=1, confidence=0.9)])
        for _ in range(n)
    ]
    est = BallVelocityEstimator(30.0, players, balls, kps)
    data, vel = est.estimate_velocity(0, 6, ImpactType.RACKET, get_Vz=True)
    assert vel.vz != 0.0
    assert math.isfinite(vel.norm)
