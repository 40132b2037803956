"""Windowed descriptor matching primitives (dense, masked, TPU-first).

The reference accelerates candidate lookup with a 64x48 per-frame grid
(Frame::GetFeaturesInArea /root/reference/src/Frame.cc:386-442) because its
inner loop is scalar. On TPU the whole candidate relation is one dense
[P, N] Hamming matrix (a single MXU matmul) AND-ed with spatial / pyramid /
validity masks — the grid structure is unnecessary.

Used by tracking's SearchByProjection variants
(/root/reference/src/ORBmatcher.cc:48-136, 1396-1553), fuse, and the
initializer's windowed search (ORBmatcher.cc:430).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.ops import hamming
from orbslam2_tpu.ops.hamming import INVALID_DIST
from orbslam2_tpu.ops.orb import Keypoints


class WindowedMatches(NamedTuple):
    """Result of a query-set -> keypoint-set windowed match."""
    best_kp: jax.Array     # [P] int32 best keypoint per query, -1 if none
    best_dist: jax.Array   # [P] int32
    assoc: jax.Array       # [N] int32 winning query per keypoint, -1 if none


def windowed_match(
    query_uv: jax.Array,      # [P, 2] projected pixel positions
    query_desc: jax.Array,    # [P, 8] uint32
    query_valid: jax.Array,   # [P] bool
    query_radius: jax.Array,  # [P] search radius in level-0 pixels
    query_level_lo: jax.Array,  # [P] int32 admissible octave range (inclusive)
    query_level_hi: jax.Array,  # [P] int32
    kp: Keypoints,
    max_dist: int = hamming.TH_HIGH,
    ratio: float | None = None,
    kp_free: jax.Array | None = None,  # [N] bool: keypoint not yet taken
) -> WindowedMatches:
    """Dense windowed search: each query finds its best keypoint within a
    spatial radius and octave band; conflicts (two queries -> one keypoint)
    resolve to the smaller Hamming distance.

    `ratio`: optional Lowe-style test — best must beat the second-best
    *admissible* candidate by the given factor (reference applies 0.9 in
    map-point projection search when both candidates share a level,
    ORBmatcher.cc:105-115; we apply it across the window).
    """
    dist = hamming.distance_matrix(query_desc, kp.desc, query_valid, kp.valid)  # [P, N]

    du = query_uv[:, 0:1] - kp.xy[None, :, 0]
    dv = query_uv[:, 1:2] - kp.xy[None, :, 1]
    in_window = (jnp.abs(du) <= query_radius[:, None]) & (jnp.abs(dv) <= query_radius[:, None])
    in_level = (kp.octave[None, :] >= query_level_lo[:, None]) & (
        kp.octave[None, :] <= query_level_hi[:, None]
    )
    mask = in_window & in_level & kp.valid[None, :] & query_valid[:, None]
    if kp_free is not None:
        mask = mask & kp_free[None, :]

    best_j, best_d, second_d = hamming.best_and_second(dist, mask)
    ok = best_d <= max_dist
    if ratio is not None:
        ok = ok & (best_d.astype(jnp.float32) <= ratio * second_d.astype(jnp.float32))
    best_kp = jnp.where(ok, best_j, -1)
    best_dist = jnp.where(ok, best_d, INVALID_DIST)
    assoc = resolve_conflicts(best_kp, best_dist, kp.n)
    # drop queries that lost their keypoint to a closer query
    p = query_uv.shape[0]
    won = (best_kp >= 0) & (assoc[jnp.clip(best_kp, 0, kp.n - 1)] == jnp.arange(p))
    return WindowedMatches(
        best_kp=jnp.where(won, best_kp, -1),
        best_dist=jnp.where(won, best_dist, INVALID_DIST),
        assoc=assoc,
    )


def resolve_conflicts(best_kp: jax.Array, best_dist: jax.Array, n_kp: int) -> jax.Array:
    """Scatter-min conflict resolution: for each keypoint, the query with the
    smallest distance wins (ties -> lowest query index). -> [N] int32."""
    p = best_kp.shape[0]
    valid = best_kp >= 0
    tgt = jnp.where(valid, best_kp, n_kp)  # dump invalids in an overflow slot
    per_kp_best = jnp.full((n_kp + 1,), INVALID_DIST, jnp.int32).at[tgt].min(
        jnp.where(valid, best_dist, INVALID_DIST)
    )
    is_winner = valid & (best_dist == per_kp_best[tgt])
    qidx = jnp.arange(p, dtype=jnp.int32)
    per_kp_query = jnp.full((n_kp + 1,), p, jnp.int32).at[
        jnp.where(is_winner, tgt, n_kp)
    ].min(qidx)
    assoc = per_kp_query[:n_kp]
    return jnp.where(assoc < p, assoc, -1).astype(jnp.int32)


def predict_scale_level(
    dist: jax.Array, max_dist: jax.Array, scale_factor: float, n_levels: int
) -> jax.Array:
    """Predicted pyramid level from viewing distance, mirroring
    MapPoint::PredictScale (/root/reference/src/MapPoint.cc:438-481):
    level = ceil(log(max_dist / dist) / log(scale_factor))."""
    ratio = jnp.maximum(max_dist / jnp.maximum(dist, 1e-9), 1e-9)
    lvl = jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor))
    return jnp.clip(lvl, 0, n_levels - 1).astype(jnp.int32)
