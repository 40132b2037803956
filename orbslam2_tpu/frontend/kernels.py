"""Jitted device kernels for the tracking front-end.

Each function is shape-static (fixed point/keypoint capacities, masked) and
jitted once per geometry. Together they replace the scalar per-point loops
of Tracking::SearchLocalPoints + Frame::isInFrustum + the
ORBmatcher::SearchByProjection family
(/root/reference/src/Tracking.cc:1403-1483, Frame.cc:310-377,
ORBmatcher.cc:48-136, 1396-1553).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry import se3, sim3
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.ops import hamming, match
from orbslam2_tpu.ops.orb import Keypoints
from orbslam2_tpu.backend import pose_opt


class FrustumInfo(NamedTuple):
    visible: jax.Array   # [C] bool passes all frustum gates
    uv: jax.Array        # [C, 2] projection
    pred_level: jax.Array  # [C] int32 predicted octave
    view_cos: jax.Array  # [C]


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor", "n_levels"))
def frustum_check(
    tcw: jax.Array,
    pt_pos: jax.Array,      # [C, 3]
    pt_valid: jax.Array,    # [C]
    pt_normal: jax.Array,   # [C, 3]
    pt_min_dist: jax.Array,  # [C]
    pt_max_dist: jax.Array,  # [C]
    cam: PinholeCamera,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    view_cos_limit: float = 0.5,
) -> FrustumInfo:
    """Frame::isInFrustum for all candidate points at once
    (/root/reference/src/Frame.cc:310-377): positive depth, inside image,
    distance within scale band, viewing angle < 60 deg."""
    pc = se3.apply(tcw, pt_pos)
    uv, z = cam.project(pc)
    # gate against the *undistorted* image rectangle (mnMinX..mnMaxX,
    # Frame.cc:329-333 + ComputeImageBounds:520-575): keypoint coords are
    # undistorted, so on distorted cameras valid projections can land
    # outside [0, width) — raw bounds would wrongly cull edge points
    min_x, max_x, min_y, max_y = cam.undistorted_bounds()
    in_img = (
        (uv[:, 0] >= min_x) & (uv[:, 0] < max_x)
        & (uv[:, 1] >= min_y) & (uv[:, 1] < max_y)
    )
    ow = se3.camera_center(tcw)
    rays = pt_pos - ow[None, :]
    dist = jnp.linalg.norm(rays, axis=-1)
    in_band = (dist >= 0.8 * pt_min_dist) & (dist <= 1.2 * pt_max_dist)
    view_cos = jnp.sum(rays * pt_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    pred_level = match.predict_scale_level(dist, pt_max_dist, scale_factor, n_levels)
    visible = pt_valid & (z > 0.05) & in_img & in_band & (view_cos > view_cos_limit)
    return FrustumInfo(visible=visible, uv=uv, pred_level=pred_level, view_cos=view_cos)


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor", "n_levels", "max_hamming"))
def search_local_points(
    tcw: jax.Array,
    pt_pos: jax.Array,
    pt_desc: jax.Array,
    pt_valid: jax.Array,
    pt_normal: jax.Array,
    pt_min_dist: jax.Array,
    pt_max_dist: jax.Array,
    kp: Keypoints,
    kp_taken: jax.Array,     # [N] bool keypoints already associated
    radius_mult: float,      # `th` in the reference (1 normally, larger post-reloc)
    cam: PinholeCamera,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    max_hamming: int = hamming.TH_HIGH,
):
    """Project local map points and match to free keypoints.

    Radius per point: 2.5 px if viewed head-on (viewCos > 0.998) else 4.0,
    scaled by the predicted octave and `radius_mult`
    (ORBmatcher.cc:72-90, SearchByProjection th parameter).
    -> (FrustumInfo, WindowedMatches over the full candidate array).
    """
    info = frustum_check(tcw, pt_pos, pt_valid, pt_normal, pt_min_dist, pt_max_dist,
                         cam, scale_factor, n_levels)
    base_r = jnp.where(info.view_cos > 0.998, 2.5, 4.0)
    radius = base_r * radius_mult * scale_factor ** info.pred_level.astype(jnp.float32)
    res = match.windowed_match(
        info.uv, pt_desc, info.visible, radius,
        jnp.maximum(info.pred_level - 1, 0), info.pred_level,
        kp, max_dist=max_hamming, ratio=0.8,
        kp_free=~kp_taken,
    )
    return info, res


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor", "n_levels", "max_hamming"))
def search_local_points_gathered(
    tcw: jax.Array,
    ids: jax.Array,          # [C] int32 rows into the full device map
    sel_valid: jax.Array,    # [C] bool candidate mask (local selection)
    pt_pos_all: jax.Array,   # [P, 3] full device-resident map arrays
    pt_desc_all: jax.Array,
    pt_valid_all: jax.Array,
    pt_normal_all: jax.Array,
    pt_min_all: jax.Array,
    pt_max_all: jax.Array,
    kp: Keypoints,
    kp_taken: jax.Array,
    radius_mult: float,
    cam: PinholeCamera,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    max_hamming: int = hamming.TH_HIGH,
):
    """search_local_points reading straight from the device-resident map
    mirror (slammap/device_map): the host ships only the local-point id
    list instead of ~250 KB of gathered rows per frame."""
    pos = pt_pos_all[ids]
    desc = pt_desc_all[ids]
    valid = pt_valid_all[ids] & sel_valid
    normal = pt_normal_all[ids]
    dmin = pt_min_all[ids]
    dmax = pt_max_all[ids]
    return search_local_points(tcw, pos, desc, valid, normal, dmin, dmax,
                               kp, kp_taken, radius_mult, cam,
                               scale_factor, n_levels, max_hamming)


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor", "n_levels", "max_hamming"))
def search_by_projection_last(
    tcw_pred: jax.Array,
    last_pt_pos: jax.Array,    # [N, 3] world pos of last frame's points
    last_pt_valid: jax.Array,  # [N]
    last_desc: jax.Array,      # [N, 8] descriptors (last frame keypoints)
    last_octave: jax.Array,    # [N]
    last_angle: jax.Array,     # [N]
    kp: Keypoints,
    radius_px: float,
    cam: PinholeCamera,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    max_hamming: int = hamming.TH_HIGH,
):
    """Motion-model tracking search (ORBmatcher::SearchByProjection of the
    last frame, /root/reference/src/ORBmatcher.cc:1396-1553): project last
    frame's map points with the predicted pose; window scaled by the last
    observation's octave; octave window +-1; rotation-consistency filter.
    -> WindowedMatches."""
    pc = se3.apply(tcw_pred, last_pt_pos)
    uv, z = cam.project(pc)
    # undistorted-rectangle gate (ORBmatcher.cc:1422-1425 uses mnMinX..mnMaxX)
    min_x, max_x, min_y, max_y = cam.undistorted_bounds()
    visible = last_pt_valid & (z > 0.05) & (uv[:, 0] >= min_x) & (uv[:, 0] < max_x) \
        & (uv[:, 1] >= min_y) & (uv[:, 1] < max_y)
    radius = radius_px * scale_factor ** last_octave.astype(jnp.float32)
    res = match.windowed_match(
        uv, last_desc, visible, radius,
        jnp.maximum(last_octave - 1, 0), jnp.minimum(last_octave + 1, n_levels - 1),
        kp, max_dist=max_hamming,
    )
    # rotation-consistency: compare matched keypoint angles
    matched = res.best_kp >= 0
    kp_angle = kp.angle[jnp.clip(res.best_kp, 0, kp.n - 1)]
    keep = hamming.rotation_consistency_mask(last_angle, kp_angle, matched)
    best_kp = jnp.where(keep, res.best_kp, -1)
    assoc = match.resolve_conflicts(best_kp, res.best_dist, kp.n)
    return res._replace(best_kp=best_kp, assoc=assoc)


@functools.partial(jax.jit, static_argnames=("cam", "max_hamming", "ratio"))
def search_by_descriptor(
    q_desc: jax.Array,     # [Q, 8] query descriptors (e.g. ref-KF keypoints)
    q_valid: jax.Array,    # [Q]
    q_angle: jax.Array,    # [Q]
    kp: Keypoints,
    cam: PinholeCamera,
    max_hamming: int = hamming.TH_LOW,
    ratio: float = 0.7,
):
    """Global (BoW-free) descriptor match: the dense-matrix equivalent of
    ORBmatcher::SearchByBoW (/root/reference/src/ORBmatcher.cc:171-303) —
    the vocabulary's only role there is pruning the candidate set, which the
    MXU makes unnecessary at N~2k. Ratio test + rotation consistency.
    -> (best_kp [Q], best_dist [Q])."""
    dist = hamming.distance_matrix(q_desc, kp.desc, q_valid, kp.valid)
    best_j, best_d, second_d = hamming.best_and_second(dist)
    ok = (best_d <= max_hamming) & (
        best_d.astype(jnp.float32) <= ratio * second_d.astype(jnp.float32))
    kp_angle = kp.angle[jnp.clip(best_j, 0, kp.n - 1)]
    keep = hamming.rotation_consistency_mask(q_angle, kp_angle, ok)
    best_kp = jnp.where(keep, best_j, -1)
    best_dist = jnp.where(keep, best_d, hamming.INVALID_DIST)
    assoc = match.resolve_conflicts(best_kp, best_dist, kp.n)
    q = q_desc.shape[0]
    won = (best_kp >= 0) & (assoc[jnp.clip(best_kp, 0, kp.n - 1)] == jnp.arange(q))
    return jnp.where(won, best_kp, -1), best_dist


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor",
                                             "n_levels", "max_hamming"))
def search_by_sim3_dir(
    s_dst_src: jax.Array,    # [4, 4] Sim3 mapping src-camera -> dst-camera
    t_src_w: jax.Array,      # [4, 4] src keyframe pose (world -> camera)
    pt_pos: jax.Array,       # [P, 3] world positions (src KF's map points)
    pt_desc: jax.Array,      # [P, 8]
    pt_valid: jax.Array,     # [P]
    pt_min_dist: jax.Array,  # [P]
    pt_max_dist: jax.Array,  # [P]
    kp_dst: Keypoints,
    radius_th: float,
    cam: PinholeCamera,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    max_hamming: int = hamming.TH_HIGH,
) -> jax.Array:
    """One direction of ORBmatcher::SearchBySim3
    (/root/reference/src/ORBmatcher.cc:1166-1290): project one keyframe's
    map points through the candidate Sim3 into the other's image and take
    the best descriptor match within th*scale^pred — no view-angle gate,
    no ratio test, no conflict resolution (mutual agreement between the
    two directions replaces them). -> [P] best dst keypoint per point."""
    p_src = se3.apply(t_src_w, pt_pos)
    p_dst = sim3.apply(s_dst_src, p_src)
    uv, z = cam.project(p_dst)
    min_x, max_x, min_y, max_y = cam.undistorted_bounds()
    in_img = ((uv[:, 0] >= min_x) & (uv[:, 0] < max_x)
              & (uv[:, 1] >= min_y) & (uv[:, 1] < max_y))
    dist = jnp.linalg.norm(p_dst, axis=-1)
    in_band = (dist >= 0.8 * pt_min_dist) & (dist <= 1.2 * pt_max_dist)
    pred = match.predict_scale_level(dist, pt_max_dist, scale_factor, n_levels)
    radius = radius_th * scale_factor ** pred.astype(jnp.float32)
    res = match.windowed_match(
        uv, pt_desc, pt_valid & (z > 0.0) & in_img & in_band, radius,
        jnp.maximum(pred - 1, 0), pred, kp_dst, max_dist=max_hamming)
    return res.best_kp


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor",
                                             "n_levels", "max_hamming"))
def fuse_targets(
    target_ids: jax.Array,     # [T] keyframe rows (padded)
    target_valid: jax.Array,   # [T] bool
    kf_pose_all: jax.Array,    # [K, 4, 4] device keyframe poses
    kf_xy: jax.Array,          # [K, N, 2] device keyframe store
    kf_desc: jax.Array,
    kf_octave: jax.Array,
    kf_angle: jax.Array,
    kf_valid: jax.Array,
    ids: jax.Array,            # [C] candidate point rows into the mirror
    sel_valid: jax.Array,      # [T, C] per-target candidate mask (forward
                               # and backward fuse share one program: each
                               # target sees only its own candidate set)
    pt_pos_all: jax.Array,
    pt_desc_all: jax.Array,
    pt_valid_all: jax.Array,
    pt_normal_all: jax.Array,
    pt_min_all: jax.Array,
    pt_max_all: jax.Array,
    radius_mult: float,
    cam: PinholeCamera,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    max_hamming: int = 50,
) -> jax.Array:
    """ORBmatcher::Fuse against T keyframes in ONE device program
    (LocalMapping::SearchInNeighbors projects the keyframe's points into
    ~20 neighbors, /root/reference/src/LocalMapping.cc:515-599,
    ORBmatcher.cc:873-1038 — the reference launches a scalar loop per
    target; round-1 launched one kernel per target). Candidate points and
    keyframe features are gathered on device from the resident
    mirrors/stores. -> assoc [T, N]: keypoint -> candidate row."""
    from orbslam2_tpu.ops.orb import Keypoints

    n = kf_xy.shape[1]

    def one(args):
        t, tv, sel = args
        kp = Keypoints(
            xy=kf_xy[t], response=jnp.zeros((n,), jnp.float32),
            angle=kf_angle[t], octave=kf_octave[t],
            size=jnp.ones((n,), jnp.float32), desc=kf_desc[t],
            valid=kf_valid[t] & tv)
        info, res = search_local_points_gathered(
            kf_pose_all[t], ids, sel, pt_pos_all, pt_desc_all,
            pt_valid_all, pt_normal_all, pt_min_all, pt_max_all,
            kp, jnp.zeros((n,), bool), radius_mult, cam,
            scale_factor, n_levels, max_hamming)
        # int16 halves the [T, N] fetch; candidate row indices are bounded
        # by the candidate cap (<= ba_max_points, far below 32767)
        return res.assoc.astype(jnp.int16)

    # lax.map (sequential scan), not vmap: each target materializes a
    # [C, N] distance matrix; T of them at once would be ~1 GB of HBM for
    # zero latency benefit — the point is ONE round trip, not T-way SIMD
    return jax.lax.map(one, (target_ids, target_valid, sel_valid))


class TrackStepResult(NamedTuple):
    """Fused search+optimize step outputs (fetched in one round trip)."""
    tcw: jax.Array        # [4, 4] optimized pose
    n_inliers: jax.Array  # [] int32
    inlier: jax.Array     # [N] bool per keypoint slot
    assoc: jax.Array      # [N] keypoint -> candidate row (-1 = none)
    n_matches: jax.Array  # [] int32 matches fed to the optimizer
    visible: jax.Array    # [C] bool candidate passed the frustum gates


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor", "n_levels"))
def motion_model_step(
    tcw_pred: jax.Array,
    last_pt_pos: jax.Array,    # [N, 3] world pos per last-frame slot
    last_pt_valid: jax.Array,  # [N]
    last_desc: jax.Array,
    last_octave: jax.Array,
    last_angle: jax.Array,
    kp: Keypoints,
    frame_ur: jax.Array,
    cam: PinholeCamera,
    scale_factor: float = 1.2,
    n_levels: int = 8,
) -> TrackStepResult:
    """TrackWithMotionModel's device work in ONE program (Tracking.cc:
    1036-1123): projection search at radius 15, conditional widen to 30
    (the reference's 2*th retry, cc:1070-1076), observation staging, and
    robust pose LM. One dispatch + one fetch per frame instead of four —
    kernel-launch and host-round-trip hygiene is the difference between
    ~5 programs/frame and ~2 on the production path."""
    res = search_by_projection_last(
        tcw_pred, last_pt_pos, last_pt_valid, last_desc, last_octave,
        last_angle, kp, 15.0, cam, scale_factor, n_levels)
    n15 = (res.assoc >= 0).sum()
    assoc = jax.lax.cond(
        n15 < 20,
        lambda _: search_by_projection_last(
            tcw_pred, last_pt_pos, last_pt_valid, last_desc, last_octave,
            last_angle, kp, 30.0, cam, scale_factor, n_levels).assoc,
        lambda _: res.assoc,
        None)
    matched = assoc >= 0
    pos_kp = last_pt_pos[jnp.clip(assoc, 0, last_pt_pos.shape[0] - 1)]
    obs = build_pose_obs_from_frame(kp, frame_ur, pos_kp, matched,
                                    scale_factor)
    tcw, inlier, n_in = pose_opt.pose_optimization(tcw_pred, obs, cam)
    return TrackStepResult(
        tcw=tcw, n_inliers=n_in, inlier=inlier, assoc=assoc,
        n_matches=matched.sum(), visible=jnp.zeros((1,), bool))


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor", "n_levels"))
def local_map_step(
    tcw: jax.Array,
    ids: jax.Array,            # [C] rows into the device map mirror
    sel_valid: jax.Array,      # [C] candidate mask
    pt_pos_all: jax.Array,
    pt_desc_all: jax.Array,
    pt_valid_all: jax.Array,
    pt_normal_all: jax.Array,
    pt_min_all: jax.Array,
    pt_max_all: jax.Array,
    kp: Keypoints,
    frame_ur: jax.Array,
    frame_depth: jax.Array,
    prior_pos: jax.Array,      # [N, 3] world pos for already-matched slots
    prior_mask: jax.Array,     # [N] bool slot already has an association
    radius_mult: float,
    cam: PinholeCamera,
    scale_factor: float = 1.2,
    n_levels: int = 8,
):
    """TrackLocalMap's device work in ONE program (Tracking.cc:1125-1188):
    gathered local-point projection search + merged observation staging +
    the frame's second pose optimization. Returns (step, depth, ur): the
    keyframe decision right after this step reads depth/ur
    (Tracking.cc:1229-1247), so riding them on this fetch saves the frame
    its separate host_depth_ur round trip."""
    info, res = search_local_points_gathered(
        tcw, ids, sel_valid, pt_pos_all, pt_desc_all, pt_valid_all,
        pt_normal_all, pt_min_all, pt_max_all, kp, prior_mask,
        radius_mult, cam, scale_factor, n_levels)
    assoc = res.assoc
    newly = assoc >= 0
    cand_pos = pt_pos_all[ids][jnp.clip(assoc, 0, ids.shape[0] - 1)]
    pos = jnp.where(newly[:, None], cand_pos, prior_pos)
    used = prior_mask | newly
    obs = build_pose_obs_from_frame(kp, frame_ur, pos, used, scale_factor)
    tcw_new, inlier, n_in = pose_opt.pose_optimization(tcw, obs, cam)
    return TrackStepResult(
        tcw=tcw_new, n_inliers=n_in, inlier=inlier, assoc=assoc,
        n_matches=used.sum(), visible=info.visible), frame_depth, frame_ur


class FusedFrameOut(NamedTuple):
    """One-fetch-per-frame bundle of the fused whole-frame program.

    `kp/ur/depth` stay on device (the Frame's arrays + next frame's
    motion-model carry); everything else is the compact host fetch."""
    kp: Keypoints
    ur: jax.Array          # [N]
    depth: jax.Array       # [N]
    tcw: jax.Array         # [4, 4] pose after the local-map optimization
    pt_ids: jax.Array      # [N] final map-point id per keypoint (-1 = none)
    is_outlier: jax.Array  # [N] associated but chi2-rejected
    visible: jax.Array     # [C] local candidate passed the frustum gates
    mm_matches: jax.Array  # [] motion-model matches (widened if needed)
    mm_inliers: jax.Array  # [] motion-model pose inliers
    n_inliers: jax.Array   # [] final (local-map) pose inliers


def _fused_track_core(kp, ur, depth, tcw_pred, last_kp, last_pid,
                      local_ids, local_sel, radius_mult,
                      pt_pos, pt_desc, pt_valid, pt_normal, pt_min, pt_max,
                      cam, scale_factor, n_levels):
    """Motion-model search + pose opt + local-map search + second pose opt
    on the freshly built frame — the device side of one whole tracked frame
    (Tracking.cc:354-424 OK-state path) in a single program.

    Design notes (TPU-first, no reference analogue):
    - last frame's map-point positions are gathered from the resident
      mirror via `last_pid` (the carry is one [N] int32 array, not 3 MB of
      keypoint rows);
    - the local candidate list `local_ids` is the HOST's selection from the
      PREVIOUS frame (one-frame lag): covisibility changes per keyframe
      event, not per frame, and the lag removes the host round trip that
      split the frame into two programs. The host refreshes the list right
      after each fetch.
    """
    p_cap = pt_pos.shape[0]

    # --- motion-model search (radius 15 -> widen 30) + first pose opt ---
    last_pos = pt_pos[jnp.clip(last_pid, 0, p_cap - 1)]
    last_valid = (last_pid >= 0) & pt_valid[jnp.clip(last_pid, 0, p_cap - 1)]
    res1 = search_by_projection_last(
        tcw_pred, last_pos, last_valid, last_kp.desc, last_kp.octave,
        last_kp.angle, kp, 15.0, cam, scale_factor, n_levels)
    n15 = (res1.assoc >= 0).sum()
    assoc = jax.lax.cond(
        n15 < 20,
        lambda _: search_by_projection_last(
            tcw_pred, last_pos, last_valid, last_kp.desc, last_kp.octave,
            last_kp.angle, kp, 30.0, cam, scale_factor, n_levels).assoc,
        lambda _: res1.assoc,
        None)
    matched = assoc >= 0
    n_last = last_pid.shape[0]
    pid_mm = jnp.where(matched, last_pid[jnp.clip(assoc, 0, n_last - 1)], -1)
    pos_mm = pt_pos[jnp.clip(pid_mm, 0, p_cap - 1)]
    obs1 = build_pose_obs_from_frame(kp, ur, pos_mm, matched, scale_factor)
    tcw1, inlier1, n_in1 = pose_opt.pose_optimization(tcw_pred, obs1, cam)
    mm_matches = matched.sum()
    # outlier associations are dropped before the local-map stage
    # (Tracking.cc:1100-1119)
    pid1 = jnp.where(matched & inlier1, pid_mm, -1)

    # --- local-map search + second pose opt ---------------------------
    taken = jnp.zeros(p_cap + 1, bool).at[
        jnp.where(pid1 >= 0, pid1, p_cap)].set(True)
    sel = local_sel & ~taken[local_ids]
    prior_mask = pid1 >= 0
    info, res2 = search_local_points_gathered(
        tcw1, local_ids, sel, pt_pos, pt_desc, pt_valid, pt_normal,
        pt_min, pt_max, kp, prior_mask, radius_mult, cam,
        scale_factor, n_levels)
    newly = res2.assoc >= 0
    c_cap = local_ids.shape[0]
    pid2 = jnp.where(newly, local_ids[jnp.clip(res2.assoc, 0, c_cap - 1)],
                     pid1)
    used = pid2 >= 0
    pos2 = pt_pos[jnp.clip(pid2, 0, p_cap - 1)]
    obs2 = build_pose_obs_from_frame(kp, ur, pos2, used, scale_factor)
    tcw2, inlier2, n_in2 = pose_opt.pose_optimization(tcw1, obs2, cam)
    is_outlier = used & ~inlier2
    pid_final = jnp.where(used & inlier2, pid2, -1)
    # NeedNewKeyFrame's close-point stats are derived on the HOST from the
    # fetched depth/ur + pt_ids (Tracking.cc:1229-1247 semantics) — no
    # extra device outputs needed
    return FusedFrameOut(
        kp=kp, ur=ur, depth=depth, tcw=tcw2, pt_ids=pid_final,
        is_outlier=is_outlier, visible=info.visible,
        mm_matches=mm_matches, mm_inliers=n_in1, n_inliers=n_in2)


def _resolve_pred(tcw_pred):
    """The fused programs accept the motion-model prediction either as a
    concrete [4,4] pose or as a `(velocity, tcw_prev)` pair composed
    in-program. The pair form lets a pipelined tracker chain a new frame
    off the PREVIOUS step's still-on-device pose (tcw_prev = the in-flight
    FusedFrameOut.tcw) without waiting for its fetch — the velocity is
    then one frame older (constant-velocity over two frames), which the
    search's widen-to-30px fallback absorbs."""
    if isinstance(tcw_pred, tuple):
        vel, tcw_prev = tcw_pred
        return vel @ tcw_prev
    return tcw_pred


@functools.lru_cache(maxsize=8)
def _fused_rgbd_program(extractor, cam, scale_factor, n_levels):
    from orbslam2_tpu.frontend import frame as frame_mod

    def run(gray, depth_img, tcw_pred, last_kp, last_pid, local_ids,
            local_sel, radius_mult,
            pt_pos, pt_desc, pt_valid, pt_normal, pt_min, pt_max):
        tcw_pred = _resolve_pred(tcw_pred)
        kp, ur, depth = frame_mod._rgbd_build(extractor, cam, gray, depth_img)
        return _fused_track_core(
            kp, ur, depth, tcw_pred, last_kp, last_pid, local_ids,
            local_sel, radius_mult, pt_pos, pt_desc, pt_valid,
            pt_normal, pt_min, pt_max, cam, scale_factor, n_levels)

    return jax.jit(run)


@functools.lru_cache(maxsize=8)
def _fused_stereo_program(extractor, cam, scale_factor, n_levels):
    from orbslam2_tpu.frontend import frame as frame_mod

    def run(gl, gr, tcw_pred, last_kp, last_pid, local_ids,
            local_sel, radius_mult,
            pt_pos, pt_desc, pt_valid, pt_normal, pt_min, pt_max):
        tcw_pred = _resolve_pred(tcw_pred)
        kp, ur, depth = frame_mod._stereo_build(extractor, cam, scale_factor,
                                                gl, gr)
        return _fused_track_core(
            kp, ur, depth, tcw_pred, last_kp, last_pid, local_ids,
            local_sel, radius_mult, pt_pos, pt_desc, pt_valid,
            pt_normal, pt_min, pt_max, cam, scale_factor, n_levels)

    return jax.jit(run)


@functools.lru_cache(maxsize=8)
def _fused_mono_program(extractor, cam, scale_factor, n_levels):
    from orbslam2_tpu.frontend import frame as frame_mod

    def run(gray, tcw_pred, last_kp, last_pid, local_ids,
            local_sel, radius_mult,
            pt_pos, pt_desc, pt_valid, pt_normal, pt_min, pt_max):
        tcw_pred = _resolve_pred(tcw_pred)
        kp = frame_mod._mono_build(extractor, cam, gray)
        neg = jnp.full((kp.n,), -1.0)
        return _fused_track_core(
            kp, neg, neg, tcw_pred, last_kp, last_pid, local_ids,
            local_sel, radius_mult, pt_pos, pt_desc, pt_valid,
            pt_normal, pt_min, pt_max, cam, scale_factor, n_levels)

    return jax.jit(run)


def fused_frame_step(sensor_images, extractor, cam, scale_factor, n_levels,
                     *args) -> FusedFrameOut:
    """Dispatch the fused whole-frame program for the sensor's image tuple
    (1 image = mono, 2 = RGB-D (gray, depth) or stereo (left, right) —
    disambiguated by the extractor call signature the tracker chose).
    Module-level seam so the benchmark's relay meter can wrap it."""
    kind, imgs = sensor_images
    prog = {"rgbd": _fused_rgbd_program, "stereo": _fused_stereo_program,
            "mono": _fused_mono_program}[kind](
        extractor, cam, scale_factor, n_levels)
    return prog(*imgs, *args)


def build_pose_obs_from_frame(
    frame_kp: Keypoints,
    frame_ur: jax.Array,
    matched_pt_pos: jax.Array,   # [N, 3] world position per keypoint slot
    matched_valid: jax.Array,    # [N] bool keypoint has a map point
    scale_factor: float = 1.2,
) -> pose_opt.PoseObs:
    """Assemble the pose-optimization observation set from per-keypoint
    associations (stereo rows where uR >= 0)."""
    uv3 = jnp.concatenate([frame_kp.xy, frame_ur[:, None]], axis=-1)
    inv_sigma2 = (1.0 / scale_factor ** 2) ** frame_kp.octave.astype(jnp.float32)
    return pose_opt.PoseObs(
        pts_w=matched_pt_pos,
        uv=uv3,
        inv_sigma2=inv_sigma2,
        is_stereo=frame_ur >= 0,
        valid=matched_valid & frame_kp.valid,
    )
