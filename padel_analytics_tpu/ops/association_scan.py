"""On-device multi-object association as a lax.scan over frames.

The host ByteTrack (ops/association.py) is the parity path — sequential
Hungarian matching, supervision-compatible IDs. This module is the
TPU-native alternative SURVEY.md §7 calls for: the whole clip's
(padded, masked) detections scan through a fixed-size track table on
device, so association costs one compiled scan instead of a host loop —
useful when the host round-trip dominates or when tracking must stay
inside a larger jitted program (e.g. the fused pipeline).

Differences vs host ByteTrack (documented, not hidden):
- greedy best-first matching (iterative argmax over the IoU matrix)
  instead of Hungarian — identical except on exact-cost ties;
- constant-velocity box prediction without the Kalman covariance
  machinery (predict = x + v, update = observation + velocity EMA);
  in particular the host's lost-track height-velocity zeroing
  (STrack.multi_predict) has no device equivalent;
- fixed MAX_TRACKS slots; IDs still allocated in first-seen order.

Track lifecycle now mirrors the host path (ops/association.py:227-291,
the supervision/ByteTrack semantics of the reference's
players_tracker.py:367-369):
- stage 1: ACTIVATED tracks (tracked + lost) vs high dets
  (> track_thresh), IoU >= 1 - match_thresh;
- stage 2: stage-1 leftovers that are still TRACKED (matched last
  frame) vs low dets (0.1 < s < track_thresh), IoU >= 0.5; unmatched
  tracked tracks go lost;
- unconfirmed pass: spawned-last-frame tracks vs leftover high dets at
  IoU >= 0.3 (host cost gate 0.7); matched -> activated and emit this
  frame, unmatched -> REMOVED immediately (a one-frame false positive
  never holds an ID);
- spawn from leftover high dets >= det_thresh = track_thresh + 0.1,
  unactivated (emit from their second hit; frame 0 activates
  instantly);
- lost tracks expire after max_lost frames.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .nms import box_iou


class TrackState(NamedTuple):
    boxes: jnp.ndarray  # (T, 4) xyxy
    velocity: jnp.ndarray  # (T, 4) per-frame box deltas
    ids: jnp.ndarray  # (T,) int32, 0 = free slot
    age_since_update: jnp.ndarray  # (T,) int32
    confirmed: jnp.ndarray  # (T,) bool
    next_id: jnp.ndarray  # () int32


def init_state(max_tracks: int = 16) -> TrackState:
    return TrackState(
        boxes=jnp.zeros((max_tracks, 4), jnp.float32),
        velocity=jnp.zeros((max_tracks, 4), jnp.float32),
        ids=jnp.zeros((max_tracks,), jnp.int32),
        age_since_update=jnp.zeros((max_tracks,), jnp.int32),
        confirmed=jnp.zeros((max_tracks,), bool),
        next_id=jnp.asarray(1, jnp.int32),
    )


def _greedy_match(iou: jnp.ndarray, row_ok, col_ok, min_iou: float, n_iter: int):
    """Iterative best-first matching. Returns col index per row (-1 = none)."""
    t, d = iou.shape
    gated = jnp.where(
        row_ok[:, None] & col_ok[None, :] & (iou >= min_iou), iou, -1.0
    )
    assign = jnp.full((t,), -1, jnp.int32)

    def body(_, carry):
        gated, assign = carry
        flat = jnp.argmax(gated)
        r, c = flat // d, flat % d
        best = gated[r, c]
        take = best > 0
        assign = jnp.where(take, assign.at[r].set(c.astype(jnp.int32)), assign)
        gated = jnp.where(take, gated.at[r, :].set(-1.0).at[:, c].set(-1.0), gated)
        return gated, assign

    _, assign = jax.lax.fori_loop(0, n_iter, body, (gated, assign))
    return assign


def _make_step(
    track_thresh: float, match_thresh: float, max_lost: int, max_tracks: int
):
    """Per-frame association step closure shared by the whole-clip scan
    and the chunk-carried variant (fused pipeline's association='device')."""
    det_thresh = track_thresh + 0.1

    def step(state: TrackState, frame):
        fboxes, fscores, fvalid = frame
        d = fboxes.shape[0]
        # Strict split like the host (association.py:203-204): a score
        # exactly at track_thresh falls in neither bucket.
        high = fvalid & (fscores > track_thresh)
        low = fvalid & (fscores > 0.1) & (fscores < track_thresh)

        pred = state.boxes + state.velocity
        active = state.ids > 0
        pool = active & state.confirmed  # activated: tracked + lost
        unconf = active & ~state.confirmed  # spawned last frame
        # tracked = matched last frame; lost = confirmed with age > 0
        tracked_prev = pool & (state.age_since_update == 0)
        iou = box_iou(pred, fboxes)

        # stage 1: activated tracks vs high detections
        m1 = _greedy_match(iou, pool, high, 1.0 - match_thresh, max_tracks)
        matched1 = m1 >= 0
        # scatter-MAX, not set: unmatched rows clip to index 0 and a
        # plain set could overwrite a genuine True with False.
        col_used1 = (
            jnp.zeros((d,), jnp.int32)
            .at[jnp.clip(m1, 0)]
            .max(matched1.astype(jnp.int32))
            > 0
        )
        # stage 2: still-unmatched TRACKED tracks vs low dets (lost
        # tracks only re-match on high dets, host association.py:248-250)
        m2 = _greedy_match(
            iou, tracked_prev & ~matched1, low, 0.5, max_tracks
        )
        matched2 = m2 >= 0
        # unconfirmed pass: last frame's spawns vs leftover high dets at
        # the host's 0.7 cost gate = IoU >= 0.3 (association.py:271-289)
        m3 = _greedy_match(iou, unconf, high & ~col_used1, 0.3, max_tracks)
        matched3 = m3 >= 0

        match_col = jnp.where(
            matched1, m1, jnp.where(matched2, m2, jnp.where(matched3, m3, -1))
        )
        matched = match_col >= 0

        obs = fboxes[jnp.clip(match_col, 0)]
        new_vel = jnp.where(
            matched[:, None],
            0.8 * state.velocity + 0.2 * (obs - state.boxes),
            state.velocity,
        )
        new_boxes = jnp.where(matched[:, None], obs, pred)
        new_age = jnp.where(matched, 0, state.age_since_update + 1)
        new_confirmed = state.confirmed | matched3

        # expire stale tracks; unmatched unconfirmed are removed NOW
        # (host: frames_since_update = max_time_lost + 1, pruned same
        # frame — association.py:288-290)
        alive = active & (new_age <= max_lost) & ~(unconf & ~matched3)
        ids = jnp.where(alive, state.ids, 0)

        # spawn tracks from unmatched high dets above det_thresh
        col_taken = (
            jnp.zeros((d,), jnp.int32)
            .at[jnp.clip(match_col, 0)]
            .max(matched.astype(jnp.int32))
            > 0
        )
        spawnable = high & ~col_taken & (fscores >= det_thresh)

        def spawn(carry, slot):
            ids, boxes_, vel, age, conf, next_id, spawn_mask = carry
            free = ids[slot] == 0
            # next unspawned detection index
            det_i = jnp.argmax(spawn_mask)
            has = jnp.any(spawn_mask)
            do = free & has
            ids = jnp.where(do, ids.at[slot].set(next_id), ids)
            boxes_ = jnp.where(do, boxes_.at[slot].set(fboxes[det_i]), boxes_)
            vel = jnp.where(do, vel.at[slot].set(0.0), vel)
            age = jnp.where(do, age.at[slot].set(0), age)
            conf = jnp.where(do, conf.at[slot].set(False), conf)
            spawn_mask = jnp.where(do, spawn_mask.at[det_i].set(False), spawn_mask)
            next_id = jnp.where(do, next_id + 1, next_id)
            return (ids, boxes_, vel, age, conf, next_id, spawn_mask), do & has

        (ids, nb, nv, na, nc, next_id, _), _ = jax.lax.scan(
            spawn,
            (ids, new_boxes, new_vel, new_age, new_confirmed, state.next_id, spawnable),
            jnp.arange(max_tracks),
        )

        # emit: detection -> id of its matched CONFIRMED track
        det_ids = jnp.zeros((d,), jnp.int32)
        emit = matched & new_confirmed & alive
        det_ids = det_ids.at[jnp.clip(match_col, 0)].max(
            jnp.where(emit, ids, 0)
        )
        # first frame: brand-new tracks emit immediately (ByteTrack
        # activates frame-1 tracks instantly); handled by caller offset.

        new_state = TrackState(
            boxes=nb, velocity=nv, ids=ids, age_since_update=na,
            confirmed=nc, next_id=next_id,
        )
        return new_state, det_ids

    return step


@functools.partial(
    jax.jit,
    static_argnames=(
        "first", "track_thresh", "match_thresh", "max_lost", "max_tracks",
    ),
)
def associate_chunk(
    state: TrackState,
    boxes: jnp.ndarray,  # (B, D, 4) consecutive frames' padded detections
    scores: jnp.ndarray,  # (B, D)
    valid: jnp.ndarray,  # (B, D) bool
    first: bool = False,
    track_thresh: float = 0.25,
    match_thresh: float = 0.8,
    max_lost: int = 30,
    max_tracks: int = 16,
):
    """Chunk-carried association: scan a chunk of consecutive frames
    through a carried TrackState (the fused pipeline calls this once per
    chunk with the previous chunk's state). `first=True` applies the
    frame-0 instant-activation special case to the chunk's first frame
    (ByteTrack activates frame-1 tracks immediately).

    Returns (new_state, ids (B, D) int32 with 0 = unassigned/dropped).
    """
    det_thresh = track_thresh + 0.1
    boxes = boxes.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    step = _make_step(track_thresh, match_thresh, max_lost, max_tracks)
    if first:
        state, first_ids = _first_frame(
            state, boxes[0], scores[0], valid[0], det_thresh, max_tracks
        )
        state, rest_ids = jax.lax.scan(
            step, state, (boxes[1:], scores[1:], valid[1:])
        )
        ids = jnp.concatenate([first_ids[None], rest_ids], axis=0)
    else:
        state, ids = jax.lax.scan(step, state, (boxes, scores, valid))
    return state, ids


def associate_clip(
    boxes: jnp.ndarray,  # (F, D, 4) per-frame padded detections
    scores: jnp.ndarray,  # (F, D)
    valid: jnp.ndarray,  # (F, D) bool
    track_thresh: float = 0.25,
    match_thresh: float = 0.8,
    max_lost: int = 30,
    max_tracks: int = 16,
):
    """Assign track IDs to every detection of a clip in one device scan.

    Returns (ids (F, D) int32 with 0 = unassigned/dropped, final state).
    """
    state, ids = associate_chunk(
        init_state(max_tracks), boxes, scores, valid, first=True,
        track_thresh=track_thresh, match_thresh=match_thresh,
        max_lost=max_lost, max_tracks=max_tracks,
    )
    return ids, state


def _first_frame(state, fboxes, fscores, fvalid, det_thresh, max_tracks):
    spawnable = fvalid & (fscores >= det_thresh)
    d = fboxes.shape[0]

    def spawn(carry, slot):
        ids, boxes_, conf, next_id, mask, det_ids = carry
        det_i = jnp.argmax(mask)
        has = jnp.any(mask)
        do = has & (ids[slot] == 0)
        ids = jnp.where(do, ids.at[slot].set(next_id), ids)
        boxes_ = jnp.where(do, boxes_.at[slot].set(fboxes[det_i]), boxes_)
        conf = jnp.where(do, conf.at[slot].set(True), conf)
        det_ids = jnp.where(do, det_ids.at[det_i].set(next_id), det_ids)
        mask = jnp.where(do, mask.at[det_i].set(False), mask)
        next_id = jnp.where(do, next_id + 1, next_id)
        return (ids, boxes_, conf, next_id, mask, det_ids), None

    (ids, boxes_, conf, next_id, _, det_ids), _ = jax.lax.scan(
        spawn,
        (state.ids, state.boxes, state.confirmed, state.next_id, spawnable,
         jnp.zeros((d,), jnp.int32)),
        jnp.arange(max_tracks),
    )
    return (
        TrackState(
            boxes=boxes_,
            velocity=state.velocity,
            ids=ids,
            age_since_update=state.age_since_update,
            confirmed=conf,
            next_id=next_id,
        ),
        det_ids,
    )
