"""Pose-only optimization: robust Levenberg-Marquardt on one SE(3).

Replaces Optimizer::PoseOptimization (/root/reference/src/Optimizer.cc:286-513),
which builds a g2o graph with one SE3 vertex and N unary mono/stereo
reprojection edges and runs 4 rounds x 10 LM iterations with chi-square
inlier reclassification between rounds (Huber kernel dropped after the
second round, Optimizer.cc:468,497).

Here the whole problem is batched arrays: residuals/Jacobians for all N
observations at once (analytic Jacobians, mirroring
types_six_dof_expmap.h:143-205), a 6x6 normal-equation solve, and a
lax.scan LM loop — one jit, no graph construction.

Conventions:
- residual e = observed - projected (2D mono, 3D stereo with virtual right u)
- information = invSigma2(octave) * I (Optimizer.cc:356-357)
- chi2 thresholds 5.991 (mono) / 7.815 (stereo) (Optimizer.cc:435-500)
- left-multiplicative twist update exp(xi) * Tcw
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


class PoseObs(NamedTuple):
    """Batched unary observations of one frame (fixed capacity, masked)."""
    pts_w: jax.Array      # [N, 3] world points
    uv: jax.Array         # [N, 3] observed (u, v, uR); uR < 0 => mono
    inv_sigma2: jax.Array  # [N] per-octave information scale
    is_stereo: jax.Array  # [N] bool
    valid: jax.Array      # [N] bool


def _residual_only(tcw: jax.Array, obs: PoseObs, cam: PinholeCamera):
    """-> (e [N,3], depth [N]) without the Jacobian (cost evaluations)."""
    pc = se3.apply(tcw, obs.pts_w)
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    inv_z = 1.0 / z_safe
    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    e = jnp.stack([obs.uv[:, 0] - u, obs.uv[:, 1] - v,
                   jnp.where(obs.is_stereo, obs.uv[:, 2] - ur, 0.0)], axis=-1)
    return e, z


def _residual_jacobian(tcw: jax.Array, obs: PoseObs, cam: PinholeCamera):
    """-> (e [N,3], J [N,3,6], depth [N]). Third row zeroed for mono."""
    pc = se3.apply(tcw, obs.pts_w)  # [N, 3]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z

    e_u = obs.uv[:, 0] - u
    e_v = obs.uv[:, 1] - v
    e_r = jnp.where(obs.is_stereo, obs.uv[:, 2] - ur, 0.0)
    e = jnp.stack([e_u, e_v, e_r], axis=-1)

    # d(uvr)/d(pc): [N, 3, 3]
    zeros = jnp.zeros_like(x)
    du = jnp.stack([cam.fx * inv_z, zeros, -cam.fx * x * inv_z2], axis=-1)
    dv = jnp.stack([zeros, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    dr = du + jnp.stack([zeros, zeros, cam.bf * inv_z2], axis=-1)
    dr = jnp.where(obs.is_stereo[:, None], dr, 0.0)
    d_proj = jnp.stack([du, dv, dr], axis=-2)

    # d(pc)/d(xi) for left-mult twist: [I | -hat(pc)]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    j_pc = jnp.concatenate([eye, -se3.hat(pc)], axis=-1)  # [N, 3, 6]

    # residual = obs - proj, so J = -d(proj)/d(xi)
    j = -jnp.einsum("nij,njk->nik", d_proj, j_pc)
    return e, j, z


def _residual_jacobian_flat(tcw: jax.Array, obs: PoseObs, cam: PinholeCamera):
    """-> (e [N,3], j [N,18] row-major [3,6], depth [N]).

    Flat-layout twin of _residual_jacobian: rank-3 [N,3,6] tensors pay
    trailing-dim tile padding/relayout on TPU (see backend.ba's flat
    pipeline, tools/ab_flat_jac.py). Same math, hand-expanded rows."""
    pc = se3.apply(tcw, obs.pts_w)
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    st = obs.is_stereo
    e = jnp.stack([obs.uv[:, 0] - u, obs.uv[:, 1] - v,
                   jnp.where(st, obs.uv[:, 2] - ur, 0.0)], axis=-1)

    zeros = jnp.zeros_like(x)
    stf = st.astype(x.dtype)
    d_rows = (
        (cam.fx * inv_z, zeros, -cam.fx * x * inv_z2),
        (zeros, cam.fy * inv_z, -cam.fy * y * inv_z2),
        (cam.fx * inv_z * stf, zeros,
         (-cam.fx * x * inv_z2 + cam.bf * inv_z2) * stf),
    )
    # row i of J = -(d_i @ [I | -hat(pc)]) — identical to _residual_jacobian
    j_cols = []
    for d0, d1, d2 in d_rows:
        j_cols += [-d0, -d1, -d2,
                   -(-d1 * z + d2 * y),
                   -(d0 * z - d2 * x),
                   -(-d0 * y + d1 * x)]
    return e, jnp.stack(j_cols, axis=-1), z


def _chi2(e: jax.Array, obs: PoseObs) -> jax.Array:
    """Per-observation chi-square with octave information scaling."""
    sq = jnp.sum(e * e, axis=-1)
    return sq * obs.inv_sigma2


def _compact_obs(obs: PoseObs, cap: int) -> PoseObs:
    """Gather the valid rows of a mostly-masked PoseObs into a [cap] set
    (order-preserving; valid rows beyond cap are dropped).

    The LM chain's per-iteration cost scales with the observation capacity
    (measured on v5e: 0.30 ms at N=2048 vs 0.18 ms at N=1024 for the same
    ~30% match rate), while a frame's matched count is far below the
    keypoint capacity — so the latency-critical pose chain runs on the
    compacted set and the final inlier classification is done on the full
    set (which is also the reference's semantics: every edge is chi2-gated
    after optimization, Optimizer.cc:478-500)."""
    n = obs.valid.shape[0]
    pos = jnp.cumsum(obs.valid.astype(jnp.int32)) - 1
    slot = jnp.where(obs.valid & (pos < cap), pos, cap)
    gather = jnp.full((cap + 1,), n, jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:cap]
    occupied = gather < n
    take = jnp.minimum(gather, n - 1)
    return PoseObs(
        pts_w=obs.pts_w[take],
        uv=obs.uv[take],
        inv_sigma2=obs.inv_sigma2[take],
        is_stereo=obs.is_stereo[take],
        valid=occupied,
    )


@functools.partial(jax.jit, static_argnames=("cam", "rounds", "iters", "compact_cap"))
def pose_optimization(
    tcw0: jax.Array,
    obs: PoseObs,
    cam: PinholeCamera,
    rounds: int = 4,
    iters: int = 10,
    compact_cap: int | None = 1024,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """-> (tcw, inlier_mask [N] bool, n_inliers int32).

    Mirrors the reference's 4-round schedule: each round runs `iters` LM
    steps on the current inlier set, then reclassifies inliers by chi2
    against 5.991/7.815; the Huber kernel is active for the first two
    rounds only (Optimizer.cc:428-503).

    When the observation capacity exceeds ``compact_cap``, the LM rounds
    run on a compacted copy of the valid rows (see _compact_obs); the
    returned inlier mask is always the full-capacity chi2 classification
    at the final pose.
    """
    obs_full = obs
    if compact_cap is not None and obs.valid.shape[0] > compact_cap:
        obs = _compact_obs(obs, compact_cap)
    delta_mono = jnp.sqrt(CHI2_MONO)
    delta_stereo = jnp.sqrt(CHI2_STEREO)
    chi2_th = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)

    delta = jnp.where(obs.is_stereo, delta_stereo, delta_mono)

    def cost_from_chi2(c, z, inlier, use_huber):
        s = jnp.sqrt(jnp.maximum(c, 1e-12))
        huber_cost = jnp.where(s <= delta, c, 2.0 * delta * s - delta * delta)
        cost = jnp.where(use_huber, huber_cost, c)
        w = inlier & obs.valid & (z > 1e-6)
        return jnp.sum(jnp.where(w, cost, 0.0))

    def total_cost(tcw, inlier, use_huber):
        e, z = _residual_only(tcw, obs, cam)
        return cost_from_chi2(_chi2(e, obs), z, inlier, use_huber)

    def lm_round(tcw, inlier, use_huber, cost0):
        # Early-exit LM: the reference runs a fixed optimize(10) per round
        # (Optimizer.cc:442), but once an accepted step's update norm hits
        # numerical noise every further iteration is a no-op — on TPU each
        # no-op step still costs a full latency-bound dispatch chain, so a
        # while_loop that stops at convergence cuts the 40-step chain to
        # the ~10-15 productive steps with bitwise-negligible pose change.
        def cond(carry):
            i, _, _, _, done = carry
            return (i < iters) & ~done

        def step(carry):
            i, tcw, lam, cost, _ = carry
            e, j, z = _residual_jacobian_flat(tcw, obs, cam)
            c = _chi2(e, obs)
            s = jnp.sqrt(jnp.maximum(c, 1e-12))
            w_huber = jnp.where(use_huber & (s > delta), delta / s, 1.0)
            w = obs.inv_sigma2 * w_huber
            w = jnp.where(inlier & obs.valid & (z > 1e-6), w, 0.0)
            jw = j * w[:, None]                   # [N, 18] flat
            # H = sum_i Jw_i^T J_i, b = -sum_i Jw_i^T e_i over the 3
            # residual rows — [6,N]@[N,6] MXU matmuls on flat slices
            h = jnp.zeros((6, 6))
            b = jnp.zeros((6,))
            for r in range(3):
                jw_r = jw[:, 6 * r:6 * r + 6]
                h = h + jw_r.T @ j[:, 6 * r:6 * r + 6]
                b = b - jw_r.T @ e[:, r]
            h_damped = h + lam * jnp.diag(jnp.diag(h)) + 1e-9 * jnp.eye(6)
            xi = jnp.linalg.solve(h_damped, b)
            tcw_new = se3.retract(tcw, xi)
            cost_new = total_cost(tcw_new, inlier, use_huber)
            accept = cost_new < cost
            tcw_out = jnp.where(accept, tcw_new, tcw)
            lam_out = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 4.0, 1e6))
            cost_out = jnp.where(accept, cost_new, cost)
            # converged: the PROPOSED step is below noise (|xi| < 1e-5 ~
            # 5e-3 px at f=520, rotation ~1e-5 rad) — at a stationary point
            # LM keeps proposing/rejecting such steps (measured trace:
            # |xi|^2 ~ 1e-11..1e-14 for the tail iterations), so the test
            # must not be gated on acceptance; or damping is maxed out
            done = (jnp.sum(xi * xi) < 1e-10) | (lam_out >= 1e6)
            return (i + 1, tcw_out, lam_out, cost_out, done)

        carry = (jnp.int32(0), tcw, jnp.float32(1e-3), cost0, jnp.bool_(False))
        _, tcw, _, _, _ = jax.lax.while_loop(cond, step, carry)
        return tcw

    # Each round boundary runs ONE residual pass that yields both the chi2
    # reclassification and the next round's starting cost (the earlier form
    # paid a second full pass for lm_round's internal cost0 — 8 boundary
    # passes instead of 5 on a latency-bound sequential chain). A merged
    # single-while_loop variant with a lax.cond boundary branch was A/B'd
    # SLOWER end-to-end (456 vs 489 fps): the per-step cond overhead beat
    # the boundary saving.
    inlier = obs.valid
    tcw = tcw0
    cost0 = total_cost(tcw0, inlier, jnp.bool_(True))
    for r in range(rounds):
        use_huber = jnp.bool_(r < 2)
        tcw = lm_round(tcw, inlier, use_huber, cost0)
        e, z = _residual_only(tcw, obs, cam)
        c = _chi2(e, obs)
        inlier = obs.valid & (c <= chi2_th) & (z > 1e-6)
        if r + 1 < rounds:
            cost0 = cost_from_chi2(c, z, inlier, jnp.bool_(r + 1 < 2))
    # final inlier classification on the FULL observation set (identical to
    # the in-loop one when nothing was compacted away)
    if obs_full is not obs:
        chi2_th_full = jnp.where(obs_full.is_stereo, CHI2_STEREO, CHI2_MONO)
        e, z = _residual_only(tcw, obs_full, cam)
        c = _chi2(e, obs_full)
        inlier = obs_full.valid & (c <= chi2_th_full) & (z > 1e-6)
    return tcw, inlier, jnp.sum(inlier.astype(jnp.int32))


def make_pose_obs(
    pts_w: jax.Array,
    uv: jax.Array,
    octave: jax.Array,
    is_stereo: jax.Array,
    valid: jax.Array,
    scale_factor: float = 1.2,
) -> PoseObs:
    """Convenience: information from octave as 1/scale^(2*octave)
    (reference per-level invSigma2, ORBextractor scale pyramid)."""
    inv_sigma2 = (1.0 / scale_factor ** 2) ** octave.astype(jnp.float32)
    return PoseObs(
        pts_w=pts_w,
        uv=uv if uv.shape[-1] == 3 else jnp.concatenate([uv, -jnp.ones_like(uv[..., :1])], -1),
        inv_sigma2=inv_sigma2,
        is_stereo=is_stereo,
        valid=valid,
    )
