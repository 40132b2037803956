"""Bundle adjustment: batched Schur-complement Levenberg-Marquardt.

Replaces g2o's SparseOptimizer + BlockSolver pipeline used by
Optimizer::LocalBundleAdjustment (/root/reference/src/Optimizer.cc:528-862)
and Optimizer::BundleAdjustment (Optimizer.cc:61-281). The reference builds a
pointer graph with marginalized point vertices; here the problem is four flat
arrays (poses, points, observations, masks) and every step is batched:

- residuals + analytic Jacobians for ALL observations at once
- 6x6 / 3x3 Hessian blocks via scatter-add (segment sums over observations)
- point marginalization (the Schur trick, Optimizer.cc:660) as batched 3x3
  inverses + einsum contractions
- the reduced camera system solved densely (Cholesky) — local BA has tens of
  cameras, so the [6K, 6K] system is tiny; large/global problems use the
  matrix-free PCG path (solve_reduced_pcg) whose matvec never materializes S

Semantics mirrored from the reference:
- Huber delta sqrt(5.991) mono / sqrt(7.815) stereo (Optimizer.cc:584-586)
- two-phase schedule: 5 robust iters, outlier exclusion, 10 plain iters,
  final outlier classification (Optimizer.cc:740-839)
- fixed-camera gauge handling (KF0 fixed, Optimizer.cc:608)
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry import se3
from orbslam2_tpu.geometry.camera import PinholeCamera

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class BAProblem(NamedTuple):
    """Fixed-capacity bundle-adjustment problem (SoA, masked)."""
    poses: jax.Array       # [K, 4, 4] Tcw
    points: jax.Array      # [P, 3] world points
    cam_fixed: jax.Array   # [K] bool (gauge / out-of-window cameras)
    obs_cam: jax.Array     # [O] int32 camera index per observation
    obs_pt: jax.Array      # [O] int32 point index
    obs_uv: jax.Array      # [O, 3] observed (u, v, uR); uR ignored for mono
    obs_inv_sigma2: jax.Array  # [O] information scale (per octave)
    obs_stereo: jax.Array  # [O] bool
    obs_valid: jax.Array   # [O] bool


class BAResult(NamedTuple):
    poses: jax.Array
    points: jax.Array
    inlier: jax.Array      # [O] bool final inlier classification
    cost: jax.Array        # final robust cost


def _residuals_jacobians(problem: BAProblem, cam: PinholeCamera):
    """-> e [O,3], Jc [O,3,6], Jp [O,3,3], z [O]."""
    tcw = problem.poses[problem.obs_cam]          # [O, 4, 4]
    pw = problem.points[problem.obs_pt]           # [O, 3]
    r = tcw[:, :3, :3]
    pc = jnp.einsum("oij,oj->oi", r, pw) + tcw[:, :3, 3]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z

    e = jnp.stack(
        [
            problem.obs_uv[:, 0] - u,
            problem.obs_uv[:, 1] - v,
            jnp.where(problem.obs_stereo, problem.obs_uv[:, 2] - ur, 0.0),
        ],
        axis=-1,
    )

    zeros = jnp.zeros_like(x)
    du = jnp.stack([cam.fx * inv_z, zeros, -cam.fx * x * inv_z2], axis=-1)
    dv = jnp.stack([zeros, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    dr = du + jnp.stack([zeros, zeros, cam.bf * inv_z2], axis=-1)
    dr = jnp.where(problem.obs_stereo[:, None], dr, 0.0)
    d_proj = jnp.stack([du, dv, dr], axis=-2)     # [O, 3, 3]

    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    j_pc_cam = jnp.concatenate([eye, -se3.hat(pc)], axis=-1)  # [O, 3, 6]
    jc = -jnp.einsum("oij,ojk->oik", d_proj, j_pc_cam)
    jp = -jnp.einsum("oij,ojk->oik", d_proj, r)
    return e, jc, jp, z


def _residuals_jacobians_flat(problem: BAProblem, cam: PinholeCamera):
    """-> e [O,3], jc [O,18] (row-major [3,6]), jp [O,9] (row-major [3,3]),
    z [O].

    Flat-layout twin of _residuals_jacobians: rank-3 per-observation
    tensors ([O,3,6] etc.) pay heavy tile-padding/relayout costs on TPU —
    the product+scatter pipeline measured 8x faster in [O,D] form
    (tools/ab_flat_jac.py: 4.11 -> 0.49 ms at O=65536). Same math,
    hand-expanded rows."""
    tw = problem.poses.reshape(-1, 16)[problem.obs_cam]   # [O, 16]
    pw = problem.points[problem.obs_pt]                   # [O, 3]
    pwx, pwy, pwz = pw[:, 0], pw[:, 1], pw[:, 2]

    def cam_coord(i):
        return (tw[:, 4 * i] * pwx + tw[:, 4 * i + 1] * pwy
                + tw[:, 4 * i + 2] * pwz + tw[:, 4 * i + 3])

    x, y, z = cam_coord(0), cam_coord(1), cam_coord(2)
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    st = problem.obs_stereo
    e = jnp.stack([problem.obs_uv[:, 0] - u,
                   problem.obs_uv[:, 1] - v,
                   jnp.where(st, problem.obs_uv[:, 2] - ur, 0.0)], axis=-1)

    zeros = jnp.zeros_like(x)
    stf = st.astype(x.dtype)
    # d_i = d(proj_i)/d(pc) as three [O] columns per row
    d_rows = (
        (cam.fx * inv_z, zeros, -cam.fx * x * inv_z2),
        (zeros, cam.fy * inv_z, -cam.fy * y * inv_z2),
        (cam.fx * inv_z * stf, zeros,
         (-cam.fx * x * inv_z2 + cam.bf * inv_z2) * stf),
    )
    # jc row i = -(d_i @ [I | -hat(pc)]) — see _residuals_jacobians
    jc_cols = []
    for d0, d1, d2 in d_rows:
        jc_cols += [-d0, -d1, -d2,
                    -(-d1 * z + d2 * y),
                    -(d0 * z - d2 * x),
                    -(-d0 * y + d1 * x)]
    jc = jnp.stack(jc_cols, axis=-1)                      # [O, 18]
    # jp row i = -(d_i @ R); R entries are tw columns
    jp_cols = []
    for d0, d1, d2 in d_rows:
        for j in range(3):
            jp_cols.append(-(d0 * tw[:, j] + d1 * tw[:, 4 + j]
                             + d2 * tw[:, 8 + j]))
    jp = jnp.stack(jp_cols, axis=-1)                      # [O, 9]
    return e, jc, jp, z


def _residual_only_ba(problem: BAProblem, cam: PinholeCamera):
    """-> (e [O,3], z [O]) without jacobians (cost evaluations)."""
    tw = problem.poses.reshape(-1, 16)[problem.obs_cam]
    pw = problem.points[problem.obs_pt]
    pwx, pwy, pwz = pw[:, 0], pw[:, 1], pw[:, 2]

    def cam_coord(i):
        return (tw[:, 4 * i] * pwx + tw[:, 4 * i + 1] * pwy
                + tw[:, 4 * i + 2] * pwz + tw[:, 4 * i + 3])

    x, y, z = cam_coord(0), cam_coord(1), cam_coord(2)
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    inv_z = 1.0 / z_safe
    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    e = jnp.stack([problem.obs_uv[:, 0] - u,
                   problem.obs_uv[:, 1] - v,
                   jnp.where(problem.obs_stereo, problem.obs_uv[:, 2] - ur, 0.0)],
                  axis=-1)
    return e, z


def _outer_flat(a: jax.Array, b: jax.Array, ra: int, rb: int, nk: int) -> jax.Array:
    """Sum over nk of per-row outer products, all in flat [O, D] layout:
    a [O, nk*ra], b [O, nk*rb] -> [O, ra*rb] with out[:, i*rb+j] =
    sum_k a[:, k*ra+i] * b[:, k*rb+j]."""
    acc = None
    for k in range(nk):
        ak = a[:, k * ra:(k + 1) * ra]
        bk = b[:, k * rb:(k + 1) * rb]
        term = jnp.repeat(ak, rb, axis=1) * jnp.tile(bk, (1, ra))
        acc = term if acc is None else acc + term
    return acc


def _matvec_rows_flat(m: jax.Array, x: jax.Array, rows: int, cols: int) -> jax.Array:
    """Per-row matrix-vector in flat layout: m [N, rows*cols], x [N, cols]
    -> [N, rows]."""
    outs = []
    for i in range(rows):
        mi = m[:, i * cols:(i + 1) * cols]
        outs.append(jnp.sum(mi * x, axis=-1))
    return jnp.stack(outs, axis=-1)


def _rowdot_flat(m: jax.Array, x: jax.Array, rows: int, cols: int) -> jax.Array:
    """Transposed per-row matvec: m [N, rows*cols], x [N, rows] ->
    [N, cols] with out[:, j] = sum_i m[:, i*cols+j] * x[:, i]."""
    outs = []
    for j in range(cols):
        acc = None
        for i in range(rows):
            term = m[:, i * cols + j] * x[:, i]
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


def _robust_weights(e: jax.Array, problem: BAProblem, use_huber) -> Tuple[jax.Array, jax.Array]:
    """-> (per-obs IRLS weight incl. information, per-obs robust cost)."""
    chi2 = jnp.sum(e * e, axis=-1) * problem.obs_inv_sigma2
    delta = jnp.where(problem.obs_stereo, jnp.sqrt(CHI2_STEREO), jnp.sqrt(CHI2_MONO))
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_huber = jnp.where(use_huber & (s > delta), delta / s, 1.0)
    cost = jnp.where(use_huber & (s > delta), 2.0 * delta * s - delta * delta, chi2)
    return problem.obs_inv_sigma2 * w_huber, cost


def _build_blocks(problem: BAProblem, cam: PinholeCamera, active: jax.Array,
                  use_huber):
    """Assemble all Hessian blocks and gradients.

    -> h_cc [K,6,6], h_pp [P,3,3], b_c [K,6], b_p [P,3],
       w_cp [K,P,6,3] (dense camera-point coupling), cost (scalar).

    All per-observation products are built in flat [O, D] layout and
    scattered as contiguous rows; scattering rank-3 [O,6,6]/[O,6,3]
    values was the dominant local-BA cost (81 -> 19 ms per 15-step LM at
    24 KF / 4k pts / 12k obs on v5e after this restructuring).
    """
    k, p = problem.poses.shape[0], problem.points.shape[0]
    e, jc, jp, z = _residuals_jacobians_flat(problem, cam)
    w, cost_o = _robust_weights(e, problem, use_huber)
    w = jnp.where(active & (z > 1e-6), w, 0.0)

    jc_w = jc * w[:, None]
    jp_w = jp * w[:, None]
    hcc_o = _outer_flat(jc_w, jc, 6, 6, 3)     # [O, 36]
    hpp_o = _outer_flat(jp_w, jp, 3, 3, 3)     # [O, 9]
    bc_o = -_rowdot_flat(jc_w, e, 3, 6)        # [O, 6]
    bp_o = -_rowdot_flat(jp_w, e, 3, 3)        # [O, 3]
    w_cp_o = _outer_flat(jc_w, jp, 6, 3, 3)    # [O, 18] row-major [6,3]
    cost = jnp.sum(jnp.where(active & (z > 1e-6), cost_o, 0.0))

    h_cc = jnp.zeros((k, 36)).at[problem.obs_cam].add(hcc_o).reshape(k, 6, 6)
    h_pp = jnp.zeros((p, 9)).at[problem.obs_pt].add(hpp_o).reshape(p, 3, 3)
    b_c = jnp.zeros((k, 6)).at[problem.obs_cam].add(bc_o)
    b_p = jnp.zeros((p, 3)).at[problem.obs_pt].add(bp_o)
    w_cp = jnp.zeros((k, p, 18)).at[problem.obs_cam, problem.obs_pt].add(
        w_cp_o).reshape(k, p, 6, 3)
    return h_cc, h_pp, b_c, b_p, w_cp, cost


def _total_cost(problem: BAProblem, cam: PinholeCamera, active: jax.Array, use_huber):
    e, z = _residual_only_ba(problem, cam)
    _, cost_o = _robust_weights(e, problem, use_huber)
    return jnp.sum(jnp.where(active & (z > 1e-6), cost_o, 0.0))


def _inv3x3(a: jax.Array) -> jax.Array:
    """Batched closed-form (adjugate) 3x3 inverse. jnp.linalg.inv lowers to
    a per-block LU on TPU — measured 3.7 ms vs 0.35 ms for this form on
    [4096, 3, 3] (v5e); the damped point Hessians it inverts are SPD and
    far from singular."""
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c02 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c10 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c20 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c21 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c10 + a[..., 0, 2] * c20
    adj = jnp.stack([jnp.stack([c00, c01, c02], -1),
                     jnp.stack([c10, c11, c12], -1),
                     jnp.stack([c20, c21, c22], -1)], -2)
    return adj / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)[..., None, None]


def _inv3x3_flat(a: jax.Array) -> jax.Array:
    """Flat twin of _inv3x3: [N, 9] row-major -> [N, 9]."""
    a00, a01, a02 = a[:, 0], a[:, 1], a[:, 2]
    a10, a11, a12 = a[:, 3], a[:, 4], a[:, 5]
    a20, a21, a22 = a[:, 6], a[:, 7], a[:, 8]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    adj = jnp.stack([c00, c01, c02, c10, c11, c12, c20, c21, c22], axis=-1)
    return adj * inv_det[:, None]


def _inv6x6_spd(a: jax.Array) -> jax.Array:
    """Batched 6x6 SPD inverse via 3x3 block Schur complement (two
    closed-form 3x3 inverses + einsums). jnp.linalg.inv lowers to a
    batched LU on TPU — measured 7.7 ms on [256, 6, 6] (v5e) vs ~0.1 ms
    for this form; used for the damped block-Jacobi preconditioner, which
    is SPD by construction."""
    a11 = a[..., :3, :3]
    a12 = a[..., :3, 3:]
    a21 = a[..., 3:, :3]
    a22 = a[..., 3:, 3:]
    a11i = _inv3x3(a11)
    a11i_a12 = jnp.einsum("...ij,...jk->...ik", a11i, a12)
    s = a22 - jnp.einsum("...ij,...jk->...ik", a21, a11i_a12)
    si = _inv3x3(s)
    b12 = -jnp.einsum("...ij,...jk->...ik", a11i_a12, si)
    b21 = -jnp.einsum("...ij,...jk->...ik", si,
                      jnp.einsum("...ij,...jk->...ik", a21, a11i))
    b11 = a11i - jnp.einsum("...ij,...jk->...ik", a11i_a12, b21)
    top = jnp.concatenate([b11, b12], axis=-1)
    bot = jnp.concatenate([b21, si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _solve_schur_dense(h_cc, h_pp, b_c, b_p, w_cp, cam_fixed, lam):
    """Point marginalization + dense reduced-camera solve.

    -> (delta_c [K,6], delta_p [P,3]).
    """
    k, p = h_cc.shape[0], h_pp.shape[0]
    # damp
    h_cc_d = h_cc + lam * _diag_only(h_cc) + 1e-8 * jnp.eye(6)
    h_pp_d = h_pp + lam * _diag_only(h_pp) + 1e-8 * jnp.eye(3)
    h_pp_inv = _inv3x3(h_pp_d)

    # S = Hcc - W Hpp^-1 W^T  (block form). The point sum is folded INTO
    # the einsum: contracting (p, l) in one dot_general lowers to a single
    # [6K, 3P] @ [3P, 6K] MXU matmul. (A previous spelling produced the
    # [K, P, K, 6, 6] outer product and summed it afterwards — ~340 MB of
    # HBM traffic per LM step at local-BA scale.)
    wy = jnp.einsum("kpij,pjl->kpil", w_cp, h_pp_inv)       # [K,P,6,3]
    s = -jnp.einsum("kpil,qpml->kqim", wy, w_cp)            # [K,K,6,6]
    s = s.at[jnp.arange(k), jnp.arange(k)].add(h_cc_d)
    b_red = b_c - jnp.einsum("kpil,pl->ki", wy, b_p)

    # gauge: fixed cameras get identity rows/cols and zero rhs
    free = ~cam_fixed
    mask2 = free[:, None] & free[None, :]
    s = jnp.where(mask2[:, :, None, None], s, 0.0)
    s = s.at[jnp.arange(k), jnp.arange(k)].set(
        jnp.where(free[:, None, None], s[jnp.arange(k), jnp.arange(k)], jnp.eye(6)[None]))
    b_red = jnp.where(free[:, None], b_red, 0.0)

    s_dense = s.transpose(0, 2, 1, 3).reshape(k * 6, k * 6)
    delta_c = jnp.linalg.solve(s_dense, b_red.reshape(k * 6)).reshape(k, 6)
    delta_c = jnp.where(free[:, None], delta_c, 0.0)

    # back-substitute points: dp = Hpp^-1 (b_p - W^T dc)
    wt_dc = jnp.einsum("kpij,ki->pj", w_cp, delta_c)
    delta_p = jnp.einsum("pij,pj->pi", h_pp_inv, b_p - wt_dc)
    return delta_c, delta_p


def _solve_schur_pcg(
    e, jc, jp, w, obs_cam, obs_pt, n_cams, n_pts, cam_fixed, pt_fixed, lam,
    pcg_iters: int = 30,
):
    """Matrix-free Schur solve: preconditioned conjugate gradients on the
    reduced camera system, with S*v computed through the observation lists —
    never materializing S or the [K, P] coupling. This is the path for
    global-scale BA ("Bundle Adjustment in the Large"-style) and the basis
    of the multi-chip distributed solver (parallel/dist_ba.py), where the
    per-observation contractions shard over devices and the segment sums
    become psums.

    e [O,3], jc [O,18], jp [O,9] (flat row-major, see
    _residuals_jacobians_flat), w [O] (weights incl. robust+info, zeroed
    for inactive observations).
    -> (delta_c [K,6], delta_p [P,3]).
    """
    jc_w = jc * w[:, None]
    jp_w = jp * w[:, None]
    seg_cam = lambda v: jnp.zeros((n_cams, v.shape[-1])).at[obs_cam].add(v)
    seg_pt = lambda v: jnp.zeros((n_pts, v.shape[-1])).at[obs_pt].add(v)
    h_cc = seg_cam(_outer_flat(jc_w, jc, 6, 6, 3)).reshape(n_cams, 6, 6)
    h_pp = seg_pt(_outer_flat(jp_w, jp, 3, 3, 3))            # [P, 9] flat
    b_c = seg_cam(-_rowdot_flat(jc_w, e, 3, 6))
    b_p = seg_pt(-_rowdot_flat(jp_w, e, 3, 3))
    b_p = jnp.where(pt_fixed[:, None], 0.0, b_p)

    h_cc_d = h_cc + lam * _diag_only(h_cc) + 1e-8 * jnp.eye(6)
    eye3_flat = jnp.asarray([1., 0., 0., 0., 1., 0., 0., 0., 1.], h_pp.dtype)
    diag_idx = jnp.asarray([0, 4, 8])
    h_pp_d = h_pp.at[:, diag_idx].set(
        h_pp[:, diag_idx] * (1.0 + lam) + 1e-8)
    h_pp_d = jnp.where(pt_fixed[:, None], eye3_flat[None], h_pp_d)
    h_pp_inv = _inv3x3_flat(h_pp_d)                          # [P, 9] flat
    h_pp_inv = jnp.where(pt_fixed[:, None], 0.0, h_pp_inv)

    free = ~cam_fixed

    def schur_matvec(v):  # v [K, 6]
        v = jnp.where(free[:, None], v, 0.0)
        hv = jnp.einsum("kij,kj->ki", h_cc_d, v)
        # t_o = Jp^T (w Jc v[cam_o])
        t = _rowdot_flat(jp, _matvec_rows_flat(jc_w, v[obs_cam], 3, 6), 3, 3)
        u = seg_pt(t)
        y = _matvec_rows_flat(h_pp_inv, u, 3, 3)
        s = _rowdot_flat(jc_w, _matvec_rows_flat(jp, y[obs_pt], 3, 3), 3, 6)
        z = seg_cam(s)
        out = hv - z
        return jnp.where(free[:, None], out, v)

    # reduced RHS: b~ = b_c - W Hpp^-1 b_p
    y0 = _matvec_rows_flat(h_pp_inv, b_p, 3, 3)
    s0 = _rowdot_flat(jc_w, _matvec_rows_flat(jp, y0[obs_pt], 3, 3), 3, 6)
    b_red = b_c - seg_cam(s0)
    b_red = jnp.where(free[:, None], b_red, 0.0)

    # block-Jacobi preconditioner from damped H_cc (closed-form SPD inverse;
    # fixed cameras have h_cc = 0 -> the 1e-6 ridge keeps it invertible and
    # precond() bypasses them anyway)
    m_inv = _inv6x6_spd(h_cc_d + 1e-6 * jnp.eye(6))

    def precond(r):
        return jnp.where(free[:, None], jnp.einsum("kij,kj->ki", m_inv, r), r)

    def dot(a, b):
        return jnp.sum(a * b)

    x0 = jnp.zeros_like(b_red)
    r0 = b_red
    z0 = precond(r0)
    p0 = z0
    # truncated CG (inexact Newton): stop once ||r|| <= 1e-3 ||b|| — the LM
    # outer loop only needs a descent-quality step, and its accept/reject
    # cost test guards correctness; the fixed-length variant burned the
    # full budget on every solve
    rr_stop = 1e-6 * dot(b_red, b_red)

    def cond(carry):
        _, r, _, _, _, i = carry
        return (i < pcg_iters) & (dot(r, r) > rr_stop)

    def body(carry):
        x, r, z, p, rz, i = carry
        ap = schur_matvec(p)
        alpha = rz / jnp.maximum(dot(p, ap), 1e-20)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        p = z + beta * p
        return (x, r, z, p, rz_new, i + 1)

    x, _, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, z0, p0, dot(r0, z0), jnp.int32(0)))
    delta_c = jnp.where(free[:, None], x, 0.0)

    # back-substitute points
    t = _rowdot_flat(jp, _matvec_rows_flat(jc_w, delta_c[obs_cam], 3, 6), 3, 3)
    delta_p = _matvec_rows_flat(h_pp_inv, b_p - seg_pt(t), 3, 3)
    delta_p = jnp.where(pt_fixed[:, None], 0.0, delta_p)
    return delta_c, delta_p


@functools.partial(jax.jit, static_argnames=("cam", "phase_iters", "pcg_iters"))
def bundle_adjust_pcg(
    problem: BAProblem,
    cam: PinholeCamera,
    phase_iters: Tuple[int, ...] = (5, 10),
    point_fixed: jax.Array | None = None,
    lam0: float = 1e-4,
    pcg_iters: int = 30,
) -> BAResult:
    """Large-scale BA (global BA / loop-closure GBA): same robust LM
    schedule as `bundle_adjust` but with the matrix-free PCG Schur solve —
    memory O(observations), scales to the full map
    (GlobalBundleAdjustemnt analogue, Optimizer.cc:48-281)."""
    p = problem.points.shape[0]
    pt_fixed = point_fixed if point_fixed is not None else jnp.zeros((p,), bool)
    k = problem.poses.shape[0]

    def lm_phase(poses, points, active, use_huber, iters):
        # f32 guard: a point with <2 active MONO observations and no
        # stereo observation is unconstrained along its viewing ray — the
        # linear step can slide it tens of meters, and the following
        # iteration's near-singular damped point Hessian overflows f32
        # into NaN (measured at KITTI scale: 1400 KF / 557k obs diverged
        # through exactly this chain; g2o survives the same step only
        # because it runs in double). Freeze such points for the phase;
        # culling removes them anyway. A stereo observation (u,v,uR) is a
        # full 3-DoF constraint (depth from disparity), so a point with
        # even one stereo obs stays free — the reference's local BA
        # optimizes every freshly backprojected close point from exactly
        # one stereo obs (CreateNewKeyFrame close-point loop,
        # Tracking.cc:1323-1381, + Optimizer.cc:528-582).
        # Known mismatch (accepted): the counts gate on `active` only, not
        # on the per-step z>1e-6 visibility used for the weights — a point
        # whose lone stereo obs is behind the camera counts as constrained
        # while its weight is zeroed (rank-0 Hessian + 1e-8 ridge). The
        # finite-step rejection below backstops any resulting blow-up, and
        # such points classify outlier and are culled.
        n_obs_pt = jnp.zeros((p,)).at[problem.obs_pt].add(
            active.astype(jnp.float32))
        n_st_pt = jnp.zeros((p,)).at[problem.obs_pt].add(
            (active & problem.obs_stereo).astype(jnp.float32))
        under = (n_obs_pt < 2) & (n_st_pt < 1) & ~pt_fixed
        pt_fixed_ph = pt_fixed | under
        # an under-constrained point's lone observation also leaves the
        # problem: a free point would fit it exactly (zero residual, zero
        # net pull on the camera — the reference's effective behavior);
        # keeping it against a FROZEN point would wrongly drag the camera
        active_ph = active & ~under[problem.obs_pt]

        def step(carry, _):
            poses, points, lam, cost = carry
            prob = problem._replace(poses=poses, points=points)
            e, jc, jp, z = _residuals_jacobians_flat(prob, cam)
            w, _ = _robust_weights(e, prob, use_huber)
            w = jnp.where(active_ph & (z > 1e-6), w, 0.0)
            delta_c, delta_p = _solve_schur_pcg(
                e, jc, jp, w, problem.obs_cam, problem.obs_pt, k, p,
                problem.cam_fixed, pt_fixed_ph, lam, pcg_iters)
            poses_new = se3.retract(poses, delta_c)
            points_new = points + delta_p
            cost_new = _total_cost(
                problem._replace(poses=poses_new, points=points_new), cam, active_ph, use_huber)
            # a non-finite step must never be accepted: NaN poses turn z
            # NaN, the z-gate then masks every residual out and the
            # collapsed cost would pass the plain < test
            finite = (jnp.isfinite(cost_new)
                      & jnp.isfinite(jnp.sum(delta_c))
                      & jnp.isfinite(jnp.sum(delta_p)))
            accept = (cost_new < cost) & finite
            poses_out = jnp.where(accept, poses_new, poses)
            points_out = jnp.where(accept, points_new, points)
            lam_out = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 5.0, 1e8))
            cost_out = jnp.where(accept, cost_new, cost)
            return (poses_out, points_out, lam_out, cost_out), None

        cost0 = _total_cost(problem._replace(poses=poses, points=points), cam, active_ph, use_huber)
        (poses, points, _, cost), _ = jax.lax.scan(
            step, (poses, points, jnp.float32(lam0), cost0), None, length=iters)
        return poses, points, cost

    poses, points = problem.poses, problem.points
    active = problem.obs_valid
    cost = jnp.float32(0.0)
    for phase, iters in enumerate(phase_iters):
        use_huber = jnp.bool_(phase == 0)
        poses, points, cost = lm_phase(poses, points, active, use_huber, iters)
        inlier = _classify_inliers(problem._replace(poses=poses, points=points), cam)
        # observations of under-constrained (<2-obs, phase-frozen) points
        # were never optimized — judging them against the unmoved point
        # would mark them outliers and callers would ERASE the point's only
        # observation; they keep their prior status instead
        n_obs_pt = jnp.zeros((problem.points.shape[0],)).at[
            problem.obs_pt].add(active.astype(jnp.float32))
        n_st_pt = jnp.zeros((problem.points.shape[0],)).at[
            problem.obs_pt].add((active & problem.obs_stereo).astype(jnp.float32))
        unjudged = ((n_obs_pt < 2) & (n_st_pt < 1) & ~pt_fixed)[problem.obs_pt]
        active = active & (inlier | unjudged)
    return BAResult(poses=poses, points=points, inlier=active, cost=cost)


def _diag_only(blocks: jax.Array) -> jax.Array:
    d = jnp.zeros_like(blocks)
    n = blocks.shape[-1]
    idx = jnp.arange(n)
    return d.at[..., idx, idx].set(blocks[..., idx, idx])


def _classify_inliers(problem: BAProblem, cam: PinholeCamera) -> jax.Array:
    e, z = _residual_only_ba(problem, cam)
    chi2 = jnp.sum(e * e, axis=-1) * problem.obs_inv_sigma2
    th = jnp.where(problem.obs_stereo, CHI2_STEREO, CHI2_MONO)
    return problem.obs_valid & (chi2 <= th) & (z > 1e-6)


@functools.partial(jax.jit, static_argnames=("cam", "phase_iters"))
def bundle_adjust(
    problem: BAProblem,
    cam: PinholeCamera,
    phase_iters: Tuple[int, ...] = (5, 10),
    point_fixed: jax.Array | None = None,
    lam0: float = 1e-4,
) -> BAResult:
    """Robust LM bundle adjustment mirroring the reference's two-phase
    local-BA schedule: phase 0 with Huber, chi2 outlier exclusion between
    phases, later phases on inliers without Huber (Optimizer.cc:740-788).

    `point_fixed`: optional [P] bool — points kept constant (e.g. the
    fixed landmarks in OptimizeSim3-style problems).
    """
    p = problem.points.shape[0]
    pt_fixed = point_fixed if point_fixed is not None else jnp.zeros((p,), bool)

    def lm_phase(poses, points, active, use_huber, iters):
        prob0 = problem._replace(poses=poses, points=points)

        # f32 guard: freeze ray-unconstrained points — <2 active obs AND
        # no stereo obs (see bundle_adjust_pcg — same overflow chain; a
        # single stereo obs fully constrains the point)
        n_obs_pt = jnp.zeros((p,)).at[problem.obs_pt].add(
            active.astype(jnp.float32))
        n_st_pt = jnp.zeros((p,)).at[problem.obs_pt].add(
            (active & problem.obs_stereo).astype(jnp.float32))
        under = (n_obs_pt < 2) & (n_st_pt < 1) & ~pt_fixed
        pt_fixed_ph = pt_fixed | under
        active_ph = active & ~under[problem.obs_pt]  # see bundle_adjust_pcg

        def step(carry, _):
            poses, points, lam, cost = carry
            prob = problem._replace(poses=poses, points=points)
            h_cc, h_pp, b_c, b_p, w_cp, _ = _build_blocks(
                prob, cam, active_ph, use_huber)
            # freeze fixed points by zeroing their gradient and coupling
            b_p = jnp.where(pt_fixed_ph[:, None], 0.0, b_p)
            w_cp = jnp.where(pt_fixed_ph[None, :, None, None], 0.0, w_cp)
            h_pp = jnp.where(pt_fixed_ph[:, None, None], jnp.eye(3)[None], h_pp)
            delta_c, delta_p = _solve_schur_dense(
                h_cc, h_pp, b_c, b_p, w_cp, problem.cam_fixed, lam)
            poses_new = se3.retract(poses, delta_c)
            points_new = points + jnp.where(pt_fixed_ph[:, None], 0.0, delta_p)
            cost_new = _total_cost(
                problem._replace(poses=poses_new, points=points_new), cam, active_ph, use_huber)
            finite = (jnp.isfinite(cost_new)
                      & jnp.isfinite(jnp.sum(delta_c))
                      & jnp.isfinite(jnp.sum(delta_p)))
            accept = (cost_new < cost) & finite
            poses_out = jnp.where(accept, poses_new, poses)
            points_out = jnp.where(accept, points_new, points)
            lam_out = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 5.0, 1e8))
            cost_out = jnp.where(accept, cost_new, cost)
            return (poses_out, points_out, lam_out, cost_out), None

        cost0 = _total_cost(prob0, cam, active_ph, use_huber)
        (poses, points, _, cost), _ = jax.lax.scan(
            step, (poses, points, jnp.float32(lam0), cost0), None, length=iters)
        return poses, points, cost

    poses, points = problem.poses, problem.points
    active = problem.obs_valid
    cost = jnp.float32(0.0)
    for phase, iters in enumerate(phase_iters):
        use_huber = jnp.bool_(phase == 0)
        poses, points, cost = lm_phase(poses, points, active, use_huber, iters)
        inlier = _classify_inliers(problem._replace(poses=poses, points=points), cam)
        # observations of under-constrained (<2-obs, phase-frozen) points
        # were never optimized — judging them against the unmoved point
        # would mark them outliers and callers would ERASE the point's only
        # observation; they keep their prior status instead
        n_obs_pt = jnp.zeros((problem.points.shape[0],)).at[
            problem.obs_pt].add(active.astype(jnp.float32))
        n_st_pt = jnp.zeros((problem.points.shape[0],)).at[
            problem.obs_pt].add((active & problem.obs_stereo).astype(jnp.float32))
        unjudged = ((n_obs_pt < 2) & (n_st_pt < 1) & ~pt_fixed)[problem.obs_pt]
        active = active & (inlier | unjudged)
    return BAResult(poses=poses, points=points, inlier=active, cost=cost)
