"""New-map-point creation by epipolar matching + batched triangulation.

Re-design of LocalMapping::CreateNewMapPoints + ORBmatcher::
SearchForTriangulation (/root/reference/src/LocalMapping.cc:237-513,
ORBmatcher.cc:704-871): for a keyframe pair, match unassociated keypoints
under the epipolar constraint with one dense Hamming matrix, then
triangulate and gate ALL candidates in one batched pass (parallax,
cheirality, reprojection chi2, scale consistency).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry import se3, triangulate as tri
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.ops import hamming, match
from orbslam2_tpu.ops.orb import Keypoints


class TriangulationResult(NamedTuple):
    kp2_idx: jax.Array   # [N1] matched keypoint in KF2, -1 if none survived
    points: jax.Array    # [N1, 3] world points (valid where kp2_idx >= 0)


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor", "n_levels"))
def triangulate_pair(
    tcw1: jax.Array,
    kp1: Keypoints,
    free1: jax.Array,       # [N1] keypoint has no map point yet
    ur1: jax.Array,         # [N1] stereo virtual right-u (<0 mono)
    depth1: jax.Array,      # [N1] keypoint depth (<0 unknown)
    tcw2: jax.Array,
    kp2: Keypoints,
    free2: jax.Array,
    ur2: jax.Array,
    depth2: jax.Array,
    cam: PinholeCamera,
    scale_factor: float = 1.2,
    n_levels: int = 8,
) -> TriangulationResult:
    k = cam.k_matrix()
    # epipolar geometry KF1 -> KF2
    f12 = tri.fundamental_from_poses(k, tcw1, k, tcw2)
    c1 = se3.camera_center(tcw1)
    c2 = se3.camera_center(tcw2)
    baseline = jnp.linalg.norm(c2 - c1)

    # epipole of camera 1 in image 2
    c1_in2 = se3.apply(tcw2, c1)
    ep2, _ = cam.project(c1_in2)

    # descriptor matrix with epipolar + availability masks
    dist = hamming.distance_matrix(kp1.desc, kp2.desc,
                                   kp1.valid & free1, kp2.valid & free2)
    ed = _pairwise_epipolar(kp1.xy, kp2.xy, f12)
    sigma2_2 = scale_factor ** (2.0 * kp2.octave.astype(jnp.float32))
    epi_ok = ed < 3.84 * sigma2_2[None, :]
    # reject kp2 too close to the epipole (reference: 100*scale^2 px^2)
    d_ep = jnp.sum((kp2.xy - ep2[None, :]) ** 2, axis=-1)
    ep_ok = d_ep >= 100.0 * scale_factor ** (2.0 * kp2.octave.astype(jnp.float32))

    mask = epi_ok & ep_ok[None, :]
    best_j, best_d, _ = hamming.best_and_second(dist, mask)
    matched = best_d <= hamming.TH_LOW

    # rotation consistency
    ang2 = kp2.angle[jnp.clip(best_j, 0, kp2.n - 1)]
    matched = hamming.rotation_consistency_mask(kp1.angle, ang2, matched)

    # --- triangulate all matches ---------------------------------------
    uv2 = kp2.xy[jnp.clip(best_j, 0, kp2.n - 1)]
    p1 = tri.projection_matrix(k, tcw1)
    p2 = tri.projection_matrix(k, tcw2)
    pts_dlt = tri.triangulate_dlt(p1[None], p2[None], kp1.xy, uv2)

    # parallax between rays
    pcos = tri.parallax_cos(c1, c2, pts_dlt)
    # stereo parallax alternatives (reference compares with stereo rays,
    # LocalMapping.cc:342-372); for RGB-D/stereo keypoints with depth, a
    # direct unprojection is available when rays are near-parallel
    twc1 = se3.inverse(tcw1)
    pts_depth1 = se3.apply(twc1, cam.backproject(kp1.xy, depth1))
    has_d1 = depth1 > 0
    low_parallax = pcos > 0.9998
    pts = jnp.where((low_parallax & has_d1)[:, None], pts_depth1, pts_dlt)
    usable = jnp.where(low_parallax, has_d1, True)
    usable = usable & (pcos > 0) & (pcos < 0.99999)

    # cheirality + reprojection both views
    sigma2_1 = scale_factor ** (2.0 * kp1.octave.astype(jnp.float32))
    e1, z1 = tri.reprojection_error_sq(k, tcw1, pts, kp1.xy)
    e2, z2 = tri.reprojection_error_sq(k, tcw2, pts, uv2)
    s2_best = sigma2_2[jnp.clip(best_j, 0, kp2.n - 1)]
    geo_ok = (z1 > 0) & (z2 > 0) & (e1 <= 5.991 * sigma2_1) & (e2 <= 5.991 * s2_best)

    # scale consistency (LocalMapping.cc:455-480)
    d1 = jnp.linalg.norm(pts - c1[None], axis=-1)
    d2 = jnp.linalg.norm(pts - c2[None], axis=-1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-9)
    oct2 = kp2.octave[jnp.clip(best_j, 0, kp2.n - 1)]
    ratio_octave = scale_factor ** (kp1.octave - oct2).astype(jnp.float32)
    ratio_factor = 1.5 * scale_factor
    scale_ok = (ratio_dist < ratio_octave * ratio_factor) & \
        (ratio_dist * ratio_factor > ratio_octave)

    # minimum baseline: reference requires baseline/medianDepth > 0.01 for
    # mono (LocalMapping.cc:286-295); approximate per-point
    baseline_ok = baseline > 0.01 * jnp.minimum(d1, d2)

    ok = matched & usable & geo_ok & scale_ok & baseline_ok & (d1 > 1e-6) & (d2 > 1e-6)
    # one kp2 can serve only one kp1: resolve by descriptor distance
    sel = jnp.where(ok, best_j, -1)
    assoc2 = match.resolve_conflicts(sel, jnp.where(ok, best_d, hamming.INVALID_DIST), kp2.n)
    won = (sel >= 0) & (assoc2[jnp.clip(sel, 0, kp2.n - 1)] == jnp.arange(kp1.n))
    return TriangulationResult(
        kp2_idx=jnp.where(won, sel, -1),
        points=pts,
    )


class BatchedTriangulation(NamedTuple):
    """Survivors compacted ACROSS neighbors into one flat list: the fetch
    is [G] rows instead of [B, M] (B=24 neighbors x M=512 slots = 245 KB;
    a keyframe yields a few hundred real survivors, so G=1024 rows = 24 KB
    — 10x less traffic through a remote-device link)."""
    nb_slot: jax.Array   # [G] neighbor batch index (-1 = pad)
    idx1: jax.Array      # [G] kp index in KF1 (-1 = pad)
    kp2_idx: jax.Array   # [G] matched kp index in the neighbor
    points: jax.Array    # [G, 3] world points


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor",
                                             "n_levels", "out_cap"))
def triangulate_neighbors(
    kf: jax.Array,           # [] keyframe row
    free1: jax.Array,        # [N] keypoint of kf has no map point yet
    nb_ids: jax.Array,       # [B] neighbor rows (padded)
    nb_valid: jax.Array,     # [B]
    free2: jax.Array,        # [B, N]
    kf_pose_all: jax.Array,  # [K, 4, 4]
    kf_xy: jax.Array,        # [K, N, 2] device keyframe store
    kf_desc: jax.Array,
    kf_octave: jax.Array,
    kf_angle: jax.Array,
    kf_valid: jax.Array,
    kf_ur: jax.Array,
    kf_depth: jax.Array,
    cam: PinholeCamera,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    out_cap: int = 512,
) -> BatchedTriangulation:
    """CreateNewMapPoints' epipolar matching + triangulation against ALL
    neighbor keyframes in ONE device program (LocalMapping.cc:237-513 loops
    targets; round-1 launched one kernel per neighbor). Results compacted
    to out_cap survivors ACROSS all neighbors so the fetch stays small."""
    from orbslam2_tpu.ops.orb import Keypoints

    n = kf_xy.shape[1]
    kp1 = Keypoints(
        xy=kf_xy[kf], response=jnp.zeros((n,), jnp.float32),
        angle=kf_angle[kf], octave=kf_octave[kf],
        size=jnp.ones((n,), jnp.float32), desc=kf_desc[kf],
        valid=kf_valid[kf])
    tcw1 = kf_pose_all[kf]
    ur1 = kf_ur[kf]
    depth1 = kf_depth[kf]

    def one(args):
        nb, nbv, f2 = args
        kp2 = Keypoints(
            xy=kf_xy[nb], response=jnp.zeros((n,), jnp.float32),
            angle=kf_angle[nb], octave=kf_octave[nb],
            size=jnp.ones((n,), jnp.float32), desc=kf_desc[nb],
            valid=kf_valid[nb] & nbv)
        res = triangulate_pair(
            tcw1, kp1, free1, ur1, depth1,
            kf_pose_all[nb], kp2, f2, kf_ur[nb], kf_depth[nb],
            cam, scale_factor, n_levels)
        return res.kp2_idx, res.points

    # lax.map, not vmap: each pair builds dense [N, N] epipolar/Hamming
    # matrices; the batching goal is one host round trip, not B-way SIMD
    kp2i_all, pts_all = jax.lax.map(one, (nb_ids, nb_valid, free2))

    # global compaction: winners from ALL neighbors, in (neighbor, slot)
    # order, into one fixed [out_cap] list. Cumsum-rank scatter, not an
    # argsort: a device-wide sort of B*N keys was a measurable chunk of
    # the program (winners have unique ranks, so the scatter is
    # conflict-free; overflow beyond out_cap lands in a discard slot)
    won = (kp2i_all >= 0).reshape(-1)                    # [B*N]
    rank = jnp.cumsum(won.astype(jnp.int32)) - 1
    dst = jnp.where(won & (rank < out_cap), rank, out_cap)
    src = jnp.full((out_cap + 1,), -1, jnp.int32).at[dst].set(
        jnp.arange(won.shape[0], dtype=jnp.int32))
    order = src[:out_cap]                                # [out_cap], -1 pad
    keep = order >= 0
    safe = jnp.maximum(order, 0)
    nb_slot = jnp.where(keep, safe // n, -1).astype(jnp.int32)
    idx1 = jnp.where(keep, safe % n, -1).astype(jnp.int32)
    kp2i = jnp.where(keep, kp2i_all.reshape(-1)[safe], -1).astype(jnp.int32)
    pts = pts_all.reshape(-1, 3)[safe]
    return BatchedTriangulation(nb_slot=nb_slot, idx1=idx1, kp2_idx=kp2i,
                                points=pts)


def _pairwise_epipolar(xy1: jax.Array, xy2: jax.Array, f12: jax.Array) -> jax.Array:
    """[N1, N2] squared distance of each kp2 from the epipolar line of kp1
    (line in image 2: l2 = x1^T F12 per the F12 convention of
    fundamental_from_poses/ComputeF12)."""
    ones = jnp.ones_like(xy1[:, :1])
    x1h = jnp.concatenate([xy1, ones], axis=1)        # [N1, 3]
    lines = x1h @ f12                                  # [N1, 3] (a, b, c)
    num = (lines[:, None, 0] * xy2[None, :, 0]
           + lines[:, None, 1] * xy2[None, :, 1]
           + lines[:, None, 2:3].squeeze(-1))
    den = lines[:, 0] ** 2 + lines[:, 1] ** 2
    return num * num / jnp.maximum(den[:, None], 1e-12)
