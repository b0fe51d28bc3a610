"""Result-object JSON schema parity (golden formats from the reference's
prediction caches, SURVEY.md §2a/§4)."""

import json

import numpy as np

from padel_analytics_tpu.trackers.objects import (
    Ball,
    Keypoint,
    Keypoints,
    Player,
    PlayerKeypoint,
    PlayerKeypoints,
    Players,
    PlayersKeypoints,
)


def test_player_serialize_schema():
    p = Player(xyxy=[10.5, 20.0, 50.0, 120.0], id=3, class_id=0, confidence=0.87)
    s = p.serialize()
    assert list(s.keys()) == ["id", "xyxy", "projection", "class_id", "confidence"]
    assert s["id"] == 3 and s["projection"] is None
    assert s["xyxy"] == [10.5, 20.0, 50.0, 120.0]
    json.dumps(s)  # must be JSON-serializable

    p2 = Player.from_json(s)
    assert p2.serialize() == s


def test_player_geometry():
    p = Player(xyxy=[10, 20, 50, 120])
    assert p.top_left == (10, 20)
    assert p.bottom_right == (50, 120)
    assert p.width == 40 and p.height == 100
    assert p.midpoint == (30, 70)
    assert p.feet == (30, 120)


def test_players_roundtrip():
    players = Players(
        [Player([0, 0, 10, 10], id=1, confidence=0.9), Player([5, 5, 9, 9], id=2)]
    )
    s = players.serialize()
    assert isinstance(s, list) and len(s) == 2
    p2 = Players.from_json(json.loads(json.dumps(s)))
    assert len(p2) == 2 and p2[0].id == 1


def test_ball_roundtrip():
    b = Ball(frame=7, xy=(100.0, 200.0), visibility=1)
    s = b.serialize()
    assert s == {
        "frame": 7,
        "xy": (100.0, 200.0),
        "visibility": 1,
        "projection": None,
    }
    b2 = Ball.from_json(json.loads(json.dumps(s)))
    assert b2.frame == 7 and tuple(b2.xy) == (100.0, 200.0)
    assert b.asint() == (100, 200)


def test_keypoints_sorted_and_indexed_by_id():
    ks = Keypoints([Keypoint(2, (5.0, 6.0)), Keypoint(0, (1.0, 2.0)), Keypoint(1, (3.0, 4.0))])
    assert [k.id for k in ks] == [0, 1, 2]
    assert ks[2].xy == (5.0, 6.0)  # by id, not positional
    s = ks.serialize()
    assert s[0] == {"id": 0, "xy": (1.0, 2.0)}
    ks2 = Keypoints.from_json(json.loads(json.dumps(s)))
    assert ks2[1].xy == [3.0, 4.0] or tuple(ks2[1].xy) == (3.0, 4.0)
    np.testing.assert_allclose(ks.xy_array(), [[1, 2], [3, 4], [5, 6]])


def test_player_keypoints_schema():
    pk = PlayerKeypoints(
        [
            PlayerKeypoint(i, PlayerKeypoints.KEYPOINTS_NAMES[i], (float(i), float(i)))
            for i in range(13)
        ]
    )
    s = pk.serialize()
    assert list(s.keys()) == ["player_keypoints"]
    assert s["player_keypoints"][0] == {
        "id": 0,
        "name": "left_foot",
        "xy": (0.0, 0.0),
    }
    assert pk["torso"].id == 2
    all_ = PlayersKeypoints([pk])
    s2 = all_.serialize()
    back = PlayersKeypoints.from_json(json.loads(json.dumps(s2)))
    assert len(back) == 1 and back[0]["head"].id == 5


def test_connections_reference_names():
    names = set(PlayerKeypoints.KEYPOINTS_NAMES)
    for a, b in PlayerKeypoints.CONNECTIONS:
        assert a in names and b in names
    assert len(PlayerKeypoints.KEYPOINTS_NAMES) == 13
    assert len(PlayerKeypoints.CONNECTIONS) == 13
