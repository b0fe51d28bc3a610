"""Per-frame player-position collection and kinematic feature extraction.

Parity with /root/reference/analytics/data_analytics.py:
- same validation rules (frame required; only IDs 1-4 kept; duplicate IDs
  raise; :45-68)
- into_dict pads missing players with None (:141-177)
- into_dataframe emits the identical column set/order for frame intervals
  1-4 x players 1-4 (delta, velocity, delta-V, acceleration per axis, plus
  per-frame distance and norm velocity/acceleration; :207-302)

TPU/production difference: the reference computes norms with row-wise
`DataFrame.apply` (a Python loop per row per feature); here every feature
is a vectorized whole-clip array op — same values, same NaN propagation,
orders of magnitude faster on long clips.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import pandas as pd


class InvalidDataPoint(Exception):
    pass


@dataclass
class PlayerPosition:
    """Player position in meters at one frame (data_analytics.py:13-29)."""

    id: int
    position: tuple[float, float]

    def __post_init__(self):
        assert isinstance(self.position[0], float)
        assert isinstance(self.position[1], float)

    @property
    def key(self) -> str:
        return f"player{self.id}"


@dataclass
class DataPoint:
    """All collected data at one frame (data_analytics.py:31-85)."""

    frame: int = None
    players_position: Optional[list[PlayerPosition]] = None

    def validate(self) -> None:
        if self.frame is None:
            raise InvalidDataPoint("Unknown frame")
        if self.players_position is None:
            return
        kept = [p for p in self.players_position if p.id in (1, 2, 3, 4)]
        ids = [p.id for p in kept]
        if len(ids) != len(set(ids)):
            raise InvalidDataPoint("N-plicate player id")
        self.players_position = kept

    def add_player_position(self, player_position: PlayerPosition) -> None:
        if self.players_position is None:
            self.players_position = [player_position]
        else:
            self.players_position.append(player_position)

    def sort_players_position(self) -> Optional[list[PlayerPosition]]:
        if self.players_position:
            return sorted(self.players_position, key=lambda p: p.id)
        return None


class DataAnalytics:
    """Whole-clip player-position collector (data_analytics.py:87-302)."""

    def __init__(self):
        self.frames = [0]
        self.current_datapoint = DataPoint(frame=self.frames[-1])
        self.datapoints: list[DataPoint] = []

    def restart(self) -> None:
        self.__init__()

    @classmethod
    def from_dict(cls, data: dict) -> "DataAnalytics":
        frames = data["frame"]
        instance = cls()
        instance.frames = frames
        datapoints = []
        for i in range(len(frames)):
            players = []
            for pid in (1, 2, 3, 4):
                x = data[f"player{pid}_x"][i]
                y = data[f"player{pid}_y"][i]
                if x is None or y is None:
                    continue
                players.append(PlayerPosition(id=pid, position=(x, y)))
            datapoints.append(
                DataPoint(frame=frames[i], players_position=players or None)
            )
        instance.datapoints = datapoints
        instance.current_datapoint = None
        return instance

    def __len__(self) -> int:
        return len(self.frames)

    def update(self) -> None:
        self.current_datapoint.validate()
        self.datapoints.append(self.current_datapoint)
        self.current_datapoint = DataPoint(frame=self.frames[-1])

    def step(self, x: int = 1) -> None:
        new_frame = self.frames[-1] + 1
        assert new_frame not in self.frames
        self.frames.append(new_frame)
        self.update()

    def add_player_position(self, id: int, position: tuple[float, float]) -> None:
        self.current_datapoint.add_player_position(
            PlayerPosition(id=id, position=position)
        )

    def into_dict(self) -> dict[str, list]:
        data: dict[str, list] = {
            "frame": [],
            "player1_x": [],
            "player1_y": [],
            "player2_x": [],
            "player2_y": [],
            "player3_x": [],
            "player3_y": [],
            "player4_x": [],
            "player4_y": [],
        }
        for datapoint in self.datapoints:
            data["frame"].append(datapoint.frame)
            n = len(data["frame"])
            players = datapoint.sort_players_position()
            if players:
                for p in players:
                    data[f"{p.key}_x"].append(p.position[0])
                    data[f"{p.key}_y"].append(p.position[1])
            for k, v in data.items():
                if len(v) < n:
                    data[k].append(None)
        return data

    def into_dataframe(self, fps: float) -> pd.DataFrame:
        """Feature table with the reference's exact column set and order
        (data_analytics.py:207-302), computed vectorized."""
        frame_intervals = (1, 2, 3, 4)
        player_ids = (1, 2, 3, 4)

        df = pd.DataFrame(self.into_dict())
        # All-None columns (a player never tracked) stay object dtype and
        # would break .diff; coerce every position column to float (None ->
        # NaN), which is also what pandas infers whenever any value exists.
        for col in df.columns:
            if col != "frame":
                df[col] = df[col].astype("float64")
        df["time"] = df["frame"] * (1 / fps)

        # Build every derived column in a dict and concat once (the
        # reference inserts column-by-column, which pandas warns fragments
        # the frame); insertion order here reproduces its column order.
        new: dict[str, pd.Series] = {}

        def col(name):
            return new[name] if name in new else df[name]

        for fi in frame_intervals:
            new[f"delta_time{fi}"] = df["time"].diff(fi)
            dt = new[f"delta_time{fi}"]
            for pid in player_ids:
                for pos in ("x", "y"):
                    delta = df[f"player{pid}_{pos}"].diff(fi)
                    new[f"player{pid}_delta{pos}{fi}"] = delta
                    v = delta / dt
                    new[f"player{pid}_V{pos}{fi}"] = v
                    dv = v.diff(fi)
                    new[f"player{pid}_deltaV{pos}{fi}"] = dv
                    new[f"player{pid}_A{pos}{fi}"] = dv / dt
                # distance column is (re)written every interval like the
                # reference (it always uses interval 1 deltas).
                new[f"player{pid}_distance"] = np.sqrt(
                    col(f"player{pid}_deltax1") ** 2
                    + col(f"player{pid}_deltay1") ** 2
                )
                new[f"player{pid}_Vnorm{fi}"] = np.sqrt(
                    col(f"player{pid}_Vx{fi}") ** 2 + col(f"player{pid}_Vy{fi}") ** 2
                )
                new[f"player{pid}_Anorm{fi}"] = np.sqrt(
                    col(f"player{pid}_Ax{fi}") ** 2 + col(f"player{pid}_Ay{fi}") ** 2
                )
        return pd.concat([df, pd.DataFrame(new)], axis=1)
