"""EPnP + batched RANSAC: camera pose from 2D-3D correspondences.

Replaces PnPsolver (/root/reference/src/PnPsolver.cc): Lepetit's EPnP
(4 control points via PCA, barycentric coordinates, M-matrix nullspace,
beta cases) wrapped in RANSAC. The reference iterates sequentially with
early exit (PnPsolver::iterate, cc:176-269); here all hypotheses are
solved and scored in one vmapped pass, and the winner is refined on its
inlier set — equal-or-better inlier statistics at a fraction of the
wall-clock (SURVEY.md §7 hard-part f).

Beta cases N=1, N=2 and N=3 are implemented with Gauss-Newton refinement
of the betas against the control-point distance constraints, mirroring
find_betas_approx_{1,2,3} + gauss_newton (PnPsolver.cc:678-869), which
lets RANSAC use the reference's 4-point minimal sets.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry import se3
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.solvers.horn import umeyama


def _control_points(pts: jax.Array, w: jax.Array):
    """4 control points: centroid + principal directions (choose_control_points,
    PnPsolver.cc:386-420). pts [N,3], w [N] -> [4, 3]."""
    wn = w / jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.sum(pts * wn[:, None], axis=0)
    x = (pts - c0) * jnp.sqrt(wn)[:, None]
    cov = x.T @ x
    eigval, eigvec = jnp.linalg.eigh(cov)
    # scale each axis by sqrt of its variance
    scales = jnp.sqrt(jnp.maximum(eigval, 1e-12))
    cs = c0[None, :] + eigvec.T * scales[:, None]
    return jnp.concatenate([c0[None, :], cs], axis=0)


def _barycentric(pts: jax.Array, ctrl: jax.Array) -> jax.Array:
    """alphas [N, 4] with pts = alphas @ ctrl, sum(alphas) = 1."""
    m = jnp.concatenate([ctrl.T, jnp.ones((1, 4), ctrl.dtype)], axis=0)  # [4,4]
    rhs = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=1)      # [N,4]
    return jnp.linalg.solve(m, rhs.T).T


def _solve_epnp(pts: jax.Array, uv: jax.Array, w: jax.Array, cam: PinholeCamera):
    """Weighted EPnP: [N,3] world, [N,2] pixels, weights [N] -> Tcw [4,4]."""
    ctrl_w = _control_points(pts, w)
    alphas = _barycentric(pts, ctrl_w)  # [N, 4]

    fu, fv, uc, vc = cam.fx, cam.fy, cam.cx, cam.cy
    sw = jnp.sqrt(jnp.maximum(w, 0.0))
    # M rows (fill_M, PnPsolver.cc:422-446)
    a = alphas * sw[:, None]
    zeros = jnp.zeros_like(a)
    row_u = jnp.concatenate([
        (a * fu)[:, :, None],
        zeros[:, :, None],
        (a * (uc - uv[:, 0:1]))[:, :, None],
    ], axis=2).reshape(-1, 12)
    row_v = jnp.concatenate([
        zeros[:, :, None],
        (a * fv)[:, :, None],
        (a * (vc - uv[:, 1:2]))[:, :, None],
    ], axis=2).reshape(-1, 12)
    m = jnp.concatenate([row_u, row_v], axis=0)
    mtm = m.T @ m
    _, vecs = jnp.linalg.eigh(mtm)
    # 4 smallest eigenvectors, each [4 ctrl, 3]
    v = vecs[:, :4].T.reshape(4, 4, 3)

    # pairwise world control distances
    ii, jj = jnp.triu_indices(4, 1)
    d_w = jnp.linalg.norm(ctrl_w[ii] - ctrl_w[jj], axis=-1)  # [6]
    rho = d_w * d_w

    # L_6x10 over the 4 smallest nullspace vectors (compute_L_6x10,
    # PnPsolver.cc:780-821). Column order: the quadratic monomials
    # (b1b1, b1b2, b2b2, b1b3, b2b3, b3b3, b1b4, b2b4, b3b4, b4b4).
    dv = v[:, ii, :] - v[:, jj, :]  # [4, 6, 3]

    def dd(a, b):
        return jnp.sum(dv[a] * dv[b], axis=-1)

    l10 = jnp.stack([
        dd(0, 0), 2 * dd(0, 1), dd(1, 1), 2 * dd(0, 2), 2 * dd(1, 2),
        dd(2, 2), 2 * dd(0, 3), 2 * dd(1, 3), 2 * dd(2, 3), dd(3, 3),
    ], axis=-1)  # [6, 10]

    def lstsq_cols(cols):
        a = l10[:, jnp.asarray(cols)]
        ata = a.T @ a + 1e-9 * jnp.eye(len(cols))
        return jnp.linalg.solve(ata, a.T @ rho)

    def sqrt_signed(x):
        return jnp.sqrt(jnp.maximum(jnp.abs(x), 1e-12)) * jnp.sign(x + 1e-20)

    # find_betas_approx_1 (N=4 start, PnPsolver.cc:678-704):
    # solve for (b11, b12, b13, b14)
    s1 = lstsq_cols((0, 1, 3, 6))
    b1a = sqrt_signed(s1[0])
    betas_a = jnp.stack([b1a, s1[1] / b1a, s1[2] / b1a, s1[3] / b1a])

    # find_betas_approx_2 (N=2, cc:708-737): (b11, b12, b22)
    s2 = lstsq_cols((0, 1, 2))
    b1b = jnp.sqrt(jnp.maximum(jnp.abs(s2[0]), 1e-12)) * jnp.sign(s2[0] + 1e-20)
    b2b = jnp.sqrt(jnp.maximum(jnp.abs(s2[2]), 1e-12)) * jnp.sign(s2[1]) * jnp.sign(s2[0] + 1e-20)
    betas_b = jnp.stack([b1b, b2b, jnp.float32(0.0), jnp.float32(0.0)])

    # find_betas_approx_3 (N=3, cc:741-776): (b11, b12, b22, b13, b23)
    s3 = lstsq_cols((0, 1, 2, 3, 4))
    b1c = sqrt_signed(s3[0])
    b2c = jnp.sqrt(jnp.maximum(jnp.abs(s3[2]), 1e-12)) * jnp.sign(s3[1]) * jnp.sign(s3[0] + 1e-20)
    betas_c = jnp.stack([b1c, b2c, s3[3] / b1c, jnp.float32(0.0)])

    def b10_of(betas):
        b1, b2, b3, b4 = betas[0], betas[1], betas[2], betas[3]
        return jnp.stack([b1 * b1, b1 * b2, b2 * b2, b1 * b3, b2 * b3,
                          b3 * b3, b1 * b4, b2 * b4, b3 * b4, b4 * b4])

    def b10_jac(betas):
        b1, b2, b3, b4 = betas[0], betas[1], betas[2], betas[3]
        z = jnp.zeros_like(b1)
        return jnp.array([
            [2 * b1, z, z, z], [b2, b1, z, z], [z, 2 * b2, z, z],
            [b3, z, b1, z], [z, b3, b2, z], [z, z, 2 * b3, z],
            [b4, z, z, b1], [z, b4, z, b2], [z, z, b4, b3], [z, z, z, 2 * b4],
        ])  # [10, 4]

    def gauss_newton(betas):
        """5 GN iterations on ||L @ b10(betas) - rho||^2 (PnPsolver.cc:823-869)."""
        def step(b, _):
            r = l10 @ b10_of(b) - rho          # [6]
            j = l10 @ b10_jac(b)               # [6, 4]
            jtj = j.T @ j + 1e-9 * jnp.eye(4)
            b = b - jnp.linalg.solve(jtj, j.T @ r)
            return b, ()
        betas, _ = jax.lax.scan(step, betas, None, length=5)
        return betas

    def rt_from_ctrl_cam(ctrl_c):
        # sign: control points must give positive depths
        depth_sign = jnp.sign(jnp.sum(alphas @ ctrl_c[:, 2] * w) + 1e-12)
        ctrl_c = ctrl_c * depth_sign
        pc = alphas @ ctrl_c  # camera coords of all points
        _, r, t = umeyama(pts, pc, w, with_scale=False)
        tcw = se3.from_rt(r, t)
        return tcw

    def reproj_cost(tcw):
        pc = se3.apply(tcw, pts)
        uvp, z = cam.project(pc)
        e = jnp.sum((uvp - uv) ** 2, axis=-1)
        pen = jnp.where(z <= 0, 1e6, 0.0)
        return jnp.sum((e + pen) * w)

    # plain N=1 closed form (no GN): scale v0 to match the control-point
    # distances. GN occasionally diverges on minimal 4-point sets; this
    # candidate is immune and wins whenever v0 is the true nullvector.
    d_c1 = jnp.sqrt(jnp.maximum(l10[:, 0], 0.0))
    beta1 = jnp.sum(d_c1 * d_w) / jnp.maximum(jnp.sum(l10[:, 0]), 1e-12)
    betas_d = jnp.stack([beta1, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)])

    def case(betas, refine):
        b = jnp.where(refine, gauss_newton(betas), betas)
        ctrl_c = jnp.einsum("i,ikd->kd", b, v)
        tcw = rt_from_ctrl_cam(ctrl_c)
        return tcw, reproj_cost(tcw)

    tcws, costs = jax.vmap(case)(
        jnp.stack([betas_a, betas_b, betas_c, betas_d]),
        jnp.array([True, True, True, False]))
    return tcws[jnp.argmin(costs)]


class PnPResult(NamedTuple):
    success: jax.Array
    tcw: jax.Array
    inliers: jax.Array
    n_inliers: jax.Array


@functools.partial(jax.jit, static_argnames=("cam", "iters", "min_inliers"))
def epnp_ransac(
    pts: jax.Array,      # [N, 3] world points
    uv: jax.Array,       # [N, 2] observed pixels
    valid: jax.Array,    # [N]
    sigma2: jax.Array,   # [N] octave sigma^2
    cam: PinholeCamera,
    key: jax.Array,
    iters: int = 300,
    min_inliers: int = 10,
) -> PnPResult:
    """RANSAC over 4-point EPnP hypotheses (reference minimal set,
    PnPsolver.cc:129 mRansacMinSet=4); chi2 gate 5.991 * sigma2
    (ctor params from Tracking.cc:1695). The N=1..3 beta cases plus
    Gauss-Newton handle the 4-dim nullspace of a 4-point M matrix."""
    n = pts.shape[0]
    probs = valid.astype(jnp.float32) / jnp.maximum(jnp.sum(valid), 1)
    keys = jax.random.split(key, iters)
    sets = jax.vmap(lambda k_: jax.random.choice(k_, n, (4,), replace=False, p=probs))(keys)

    def count_inliers(tcw):
        pc = se3.apply(tcw, pts)
        uvp, z = cam.project(pc)
        e = jnp.sum((uvp - uv) ** 2, axis=-1) / sigma2
        return valid & (e < 5.991) & (z > 0)

    def hypo(idx):
        w = jnp.zeros(n).at[idx].set(1.0)
        tcw = _solve_epnp(pts, uv, w * valid, cam)
        inl = count_inliers(tcw)
        return jnp.sum(inl.astype(jnp.int32)), tcw

    counts, tcws = jax.vmap(hypo)(sets)
    best = jnp.argmax(counts)
    tcw_b = tcws[best]
    inl = count_inliers(tcw_b)
    # refine on all inliers (PnPsolver::Refine, cc:271-317)
    tcw_r = _solve_epnp(pts, uv, inl.astype(jnp.float32), cam)
    inl_r = count_inliers(tcw_r)
    better = jnp.sum(inl_r.astype(jnp.int32)) >= jnp.sum(inl.astype(jnp.int32))
    tcw_f = jnp.where(better, tcw_r, tcw_b)
    inl_f = jnp.where(better, inl_r, inl)
    n_inl = jnp.sum(inl_f.astype(jnp.int32))
    return PnPResult(success=n_inl >= min_inliers, tcw=tcw_f,
                     inliers=inl_f, n_inliers=n_inl)
