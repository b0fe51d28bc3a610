"""Point-in-polygon gating for on-court player filtering.

Replaces supervision's PolygonZone (used at /root/reference/main.py:108-119
and players_tracker.py:364-366): the reference rasterizes the polygon into
a pixel mask with cv2.fillPoly and checks each detection's BOTTOM_CENTER
anchor against it. Here the test is an analytic crossing-number check
evaluated as vectorized jnp (no mask texture, no host round-trip), which
matches fillPoly rasterization for interior points and differs only on
boundary-adjacent subpixels.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def points_in_polygon(points: jnp.ndarray, polygon: jnp.ndarray) -> jnp.ndarray:
    """Vectorized even-odd (crossing number) point-in-polygon test.

    points: (..., 2); polygon: (V, 2). Returns bool (...,). Points exactly
    on a horizontal edge follow the half-open rule (consistent with
    rasterization).
    """
    px = points[..., 0:1]
    py = points[..., 1:2]
    x0 = polygon[:, 0]
    y0 = polygon[:, 1]
    x1 = jnp.roll(polygon[:, 0], -1)
    y1 = jnp.roll(polygon[:, 1], -1)

    # Edge straddles the horizontal ray through py.
    cond = (y0 > py) != (y1 > py)
    # x coordinate where the edge crosses the ray.
    denom = jnp.where(y1 - y0 == 0, 1.0, y1 - y0)
    x_cross = x0 + (py - y0) * (x1 - x0) / denom
    crossings = jnp.sum(jnp.where(cond, (px < x_cross).astype(jnp.int32), 0), axis=-1)
    return (crossings % 2) == 1


class PolygonZone:
    """Polygon gate with a supervision-compatible trigger() surface.

    The reference builds it from court keypoints 0, 1, -1, -2
    (main.py:108-119) and triggers on detections' bottom-center anchors.
    """

    def __init__(self, polygon: np.ndarray, frame_resolution_wh=None):
        self.polygon = np.asarray(polygon, dtype=np.float64)
        self.frame_resolution_wh = frame_resolution_wh

    def trigger_xyxy(self, xyxy: jnp.ndarray) -> jnp.ndarray:
        """Bottom-center anchors of (..., 4) xyxy boxes inside the polygon."""
        anchors = jnp.stack(
            [(xyxy[..., 0] + xyxy[..., 2]) / 2.0, xyxy[..., 3]], axis=-1
        )
        if self.frame_resolution_wh is not None:
            w, h = self.frame_resolution_wh
            anchors = jnp.stack(
                [
                    jnp.clip(anchors[..., 0], 0, w),
                    jnp.clip(anchors[..., 1], 0, h),
                ],
                axis=-1,
            )
        return points_in_polygon(anchors, jnp.asarray(self.polygon))

    def trigger(self, xyxy: np.ndarray) -> np.ndarray:
        """Host-side convenience mirror of sv.PolygonZone.trigger."""
        return np.asarray(self.trigger_xyxy(jnp.asarray(np.asarray(xyxy))))
