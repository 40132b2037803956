"""Multi-chip distributed bundle adjustment via shard_map + collectives.

The TPU-native scaling axis of this framework (SURVEY.md §2e): the
reference is single-process (no MPI/NCCL anywhere); its transient global-BA
thread (/root/reference/src/LoopClosing.cc:717) becomes a device-mesh
program here.

Parallel decomposition:
- observations (the O(10^5..10^6) axis) shard across the mesh
- camera poses and points are replicated (K*6 and P*3 floats — small)
- per LM step: per-shard residual/Jacobian products + local segment-sums,
  reduced with `psum` over ICI; every device then runs the identical PCG
  on the replicated reduced system, so no broadcast is needed afterwards

This mirrors the standard data-parallel Gauss-Newton: compute-bound stages
scale with devices, the psum of [K,6,6]+[P,3,3] blocks rides ICI.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from orbslam2_tpu.backend import ba
from orbslam2_tpu.backend.ba import BAProblem, BAResult
from orbslam2_tpu.geometry import se3
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.parallel.mesh import OBS_AXIS


def _psum(x):
    return jax.lax.psum(x, OBS_AXIS)


def _local_blocks(prob_local: BAProblem, cam: PinholeCamera, active, use_huber,
                  n_cams: int, n_pts: int):
    """Per-shard residuals, Jacobians (flat [O,D] layout), robust weights."""
    e, jc, jp, z = ba._residuals_jacobians_flat(prob_local, cam)
    w, cost_o = ba._robust_weights(e, prob_local, use_huber)
    w = jnp.where(active & (z > 1e-6), w, 0.0)
    cost = jnp.sum(jnp.where(active & (z > 1e-6), cost_o, 0.0))
    return e, jc, jp, w, cost


def _dist_lm_step(
    poses, points, lam, cost,
    obs_cam, obs_pt, obs_uv, obs_sig, obs_st, obs_valid, active,
    cam_fixed, pt_fixed, cam: PinholeCamera, use_huber, pcg_iters: int,
):
    """One LM iteration, executed inside shard_map (obs arrays are the
    local shard; poses/points replicated). `active` and `pt_fixed` must
    already carry the per-phase ray-unconstrained freeze computed in
    `run_phase` (mirrors ba.bundle_adjust_pcg's f32 guards)."""
    n_cams = poses.shape[0]
    n_pts = points.shape[0]
    prob = BAProblem(
        poses=poses, points=points, cam_fixed=cam_fixed,
        obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=obs_uv,
        obs_inv_sigma2=obs_sig, obs_stereo=obs_st, obs_valid=obs_valid)
    e, jc, jp, w, _ = _local_blocks(prob, cam, active, use_huber, n_cams, n_pts)

    jc_w = jc * w[:, None]
    jp_w = jp * w[:, None]
    h_cc = _psum(jnp.zeros((n_cams, 36)).at[obs_cam].add(
        ba._outer_flat(jc_w, jc, 6, 6, 3))).reshape(n_cams, 6, 6)
    h_pp = _psum(jnp.zeros((n_pts, 9)).at[obs_pt].add(
        ba._outer_flat(jp_w, jp, 3, 3, 3)))                  # [P, 9] flat
    b_c = _psum(jnp.zeros((n_cams, 6)).at[obs_cam].add(
        -ba._rowdot_flat(jc_w, e, 3, 6)))
    b_p = _psum(jnp.zeros((n_pts, 3)).at[obs_pt].add(
        -ba._rowdot_flat(jp_w, e, 3, 3)))
    b_p = jnp.where(pt_fixed[:, None], 0.0, b_p)

    h_cc_d = h_cc + lam * ba._diag_only(h_cc) + 1e-8 * jnp.eye(6)
    eye3_flat = jnp.asarray([1., 0., 0., 0., 1., 0., 0., 0., 1.], h_pp.dtype)
    diag_idx = jnp.asarray([0, 4, 8])
    h_pp_d = h_pp.at[:, diag_idx].set(h_pp[:, diag_idx] * (1.0 + lam) + 1e-8)
    h_pp_d = jnp.where(pt_fixed[:, None], eye3_flat[None], h_pp_d)
    h_pp_inv = ba._inv3x3_flat(h_pp_d)                       # [P, 9] flat
    h_pp_inv = jnp.where(pt_fixed[:, None], 0.0, h_pp_inv)
    free = ~cam_fixed

    def coupling_apply(v):
        """W^T v distributed: [K,6] -> [P,3] (psum over shards)."""
        t = ba._rowdot_flat(jp, ba._matvec_rows_flat(jc_w, v[obs_cam], 3, 6), 3, 3)
        return _psum(jnp.zeros((n_pts, 3)).at[obs_pt].add(t))

    def coupling_apply_t(y):
        """W y distributed: [P,3] -> [K,6] (psum over shards)."""
        s = ba._rowdot_flat(jc_w, ba._matvec_rows_flat(jp, y[obs_pt], 3, 3), 3, 6)
        return _psum(jnp.zeros((n_cams, 6)).at[obs_cam].add(s))

    def schur_matvec(v):
        v = jnp.where(free[:, None], v, 0.0)
        hv = jnp.einsum("kij,kj->ki", h_cc_d, v)
        u = coupling_apply(v)
        y = ba._matvec_rows_flat(h_pp_inv, u, 3, 3)
        out = hv - coupling_apply_t(y)
        return jnp.where(free[:, None], out, v)

    y0 = ba._matvec_rows_flat(h_pp_inv, b_p, 3, 3)
    b_red = b_c - coupling_apply_t(y0)
    b_red = jnp.where(free[:, None], b_red, 0.0)
    m_inv = ba._inv6x6_spd(h_cc_d + 1e-6 * jnp.eye(6))

    def precond(r):
        return jnp.where(free[:, None], jnp.einsum("kij,kj->ki", m_inv, r), r)

    def dot(a, b):
        return jnp.sum(a * b)

    x0 = jnp.zeros_like(b_red)
    r0 = b_red
    z0 = precond(r0)
    # truncated CG with the single-chip stopping rule (ba._solve_schur_pcg):
    # running fixed-length past convergence lets the floored alpha/beta
    # divisions corrupt a converged iterate (near-zero rz and pAp), which
    # measurably degraded LM convergence vs the single-chip solver. All CG
    # state is replicated (built from psum'd blocks), so the while_loop
    # condition is uniform across the mesh.
    rr_stop = 1e-6 * dot(b_red, b_red)

    def cg_cond(carry):
        _, r, _, _, _, i = carry
        return (i < pcg_iters) & (dot(r, r) > rr_stop)

    def cg_body(carry):
        x, r, z, pdir, rz, i = carry
        ap = schur_matvec(pdir)
        alpha = rz / jnp.maximum(dot(pdir, ap), 1e-20)
        x = x + alpha * pdir
        r = r - alpha * ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        return (x, r, z, z + beta * pdir, rz_new, i + 1)

    x, _, _, _, _, _ = jax.lax.while_loop(
        cg_cond, cg_body, (x0, r0, z0, z0, dot(r0, z0), jnp.int32(0)))
    delta_c = jnp.where(free[:, None], x, 0.0)
    u = coupling_apply(delta_c)
    delta_p = ba._matvec_rows_flat(h_pp_inv, b_p - u, 3, 3)
    delta_p = jnp.where(pt_fixed[:, None], 0.0, delta_p)

    poses_new = se3.retract(poses, delta_c)
    points_new = points + delta_p
    prob_new = prob._replace(poses=poses_new, points=points_new)
    e2, z2 = ba._residual_only_ba(prob_new, cam)
    _, cost_o2 = ba._robust_weights(e2, prob_new, use_huber)
    cost_new = _psum(jnp.sum(jnp.where(active & (z2 > 1e-6), cost_o2, 0.0)))
    # a non-finite step must never be accepted: NaN poses turn z NaN, the
    # z-gate then masks every residual out and the collapsed cost would
    # pass the plain < test (same f32 chain as ba.bundle_adjust_pcg; g2o
    # survives it only by running in double, Optimizer.cc:61-281).
    # delta_c/delta_p are replicated, so no psum is needed here.
    finite = (jnp.isfinite(cost_new)
              & jnp.isfinite(jnp.sum(delta_c))
              & jnp.isfinite(jnp.sum(delta_p)))
    accept = (cost_new < cost) & finite
    poses_out = jnp.where(accept, poses_new, poses)
    points_out = jnp.where(accept, points_new, points)
    lam_out = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 5.0, 1e8))
    cost_out = jnp.where(accept, cost_new, cost)
    return poses_out, points_out, lam_out, cost_out


def distributed_bundle_adjust(
    problem: BAProblem,
    cam: PinholeCamera,
    mesh: Mesh,
    phase_iters: Tuple[int, ...] = (5, 10),
    point_fixed: jax.Array | None = None,
    pcg_iters: int = 30,
    lam0: float = 1e-4,
) -> BAResult:
    """Distributed robust-LM BA. Observation arrays must have length
    divisible by the mesh size (pad with obs_valid=False rows)."""
    n_dev = mesh.devices.size
    o = problem.obs_cam.shape[0]
    assert o % n_dev == 0, f"pad observations ({o}) to a multiple of mesh size ({n_dev})"
    p = problem.points.shape[0]
    pt_fixed = point_fixed if point_fixed is not None else jnp.zeros((p,), bool)

    rep = P()
    shd = P(OBS_AXIS)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rep, shd, shd, shd, shd, shd, shd, shd, rep, rep, rep),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    def run_phase(poses, points, obs_cam, obs_pt, obs_uv, obs_sig, obs_st,
                  obs_valid, active, cam_fixed, pt_fixed, phase_flags):
        use_huber = phase_flags[0] > 0.5
        iters = phase_flags[1].astype(jnp.int32)

        # f32 guard (mirrors ba.bundle_adjust_pcg): a point with <2 active
        # observations and no stereo obs is unconstrained along its viewing
        # ray — freeze it for the phase and drop its observations from the
        # problem. Per-point counts need a psum: each shard sees only its
        # slice of the observation axis.
        n_pts_g = points.shape[0]
        n_obs_pt = _psum(jnp.zeros((n_pts_g,)).at[obs_pt].add(
            active.astype(jnp.float32)))
        n_st_pt = _psum(jnp.zeros((n_pts_g,)).at[obs_pt].add(
            (active & obs_st).astype(jnp.float32)))
        under = (n_obs_pt < 2) & (n_st_pt < 1) & ~pt_fixed
        pt_fixed = pt_fixed | under
        active = active & ~under[obs_pt]

        def step(carry, _):
            poses, points, lam, cost, it = carry
            poses, points, lam, cost = jax.lax.cond(
                it < iters,
                lambda args: _dist_lm_step(
                    *args, obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=obs_uv,
                    obs_sig=obs_sig, obs_st=obs_st, obs_valid=obs_valid,
                    active=active, cam_fixed=cam_fixed, pt_fixed=pt_fixed,
                    cam=cam, use_huber=use_huber, pcg_iters=pcg_iters),
                lambda args: args,
                (poses, points, lam, cost),
            )
            return (poses, points, lam, cost, it + 1), None

        prob = BAProblem(
            poses=poses, points=points, cam_fixed=cam_fixed,
            obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=obs_uv,
            obs_inv_sigma2=obs_sig, obs_stereo=obs_st, obs_valid=obs_valid)
        e, z = ba._residual_only_ba(prob, cam)
        _, cost_o = ba._robust_weights(e, prob, use_huber)
        cost0 = _psum(jnp.sum(jnp.where(active & (z > 1e-6), cost_o, 0.0)))
        (poses, points, _, cost, _), _ = jax.lax.scan(
            step, (poses, points, jnp.float32(lam0), cost0, jnp.int32(0)),
            None, length=max(phase_iters))
        return poses, points, cost

    poses, points = problem.poses, problem.points
    active = problem.obs_valid
    cost = jnp.float32(0.0)
    for phase, iters in enumerate(phase_iters):
        flags = jnp.array([float(phase == 0), float(iters)], jnp.float32)
        poses, points, cost = run_phase(
            poses, points, problem.obs_cam, problem.obs_pt, problem.obs_uv,
            problem.obs_inv_sigma2, problem.obs_stereo, problem.obs_valid,
            active, problem.cam_fixed, pt_fixed, flags)
        inlier = ba._classify_inliers(
            problem._replace(poses=poses, points=points), cam)
        # observations of phase-frozen (ray-unconstrained) points were
        # never optimized — judging them against the unmoved point would
        # erase the point's only observation; retain prior status
        # (mirrors ba.bundle_adjust_pcg). Full replicated arrays here, so
        # plain segment sums suffice.
        n_obs_pt = jnp.zeros((p,)).at[problem.obs_pt].add(
            active.astype(jnp.float32))
        n_st_pt = jnp.zeros((p,)).at[problem.obs_pt].add(
            (active & problem.obs_stereo).astype(jnp.float32))
        unjudged = ((n_obs_pt < 2) & (n_st_pt < 1) & ~pt_fixed)[problem.obs_pt]
        active = active & (inlier | unjudged)
    return BAResult(poses=poses, points=points, inlier=active, cost=cost)
