"""Essential-graph (Sim3 pose graph) optimization.

Replaces Optimizer::OptimizeEssentialGraph
(/root/reference/src/Optimizer.cc:885-1153): all keyframes as 7-DoF Sim3
vertices (scale frozen for stereo/RGB-D), edges = new loop connections +
spanning tree + past loop edges + high-covisibility pairs, relative-Sim3
measurements with identity information, LM for 20 iterations.

TPU re-design: residuals r_e = log(S_meas_e * S_i * S_j^-1) for ALL edges
at once; per-edge Jacobians by batched central differences (g2o also
differentiates these edges numerically); the normal system is dense
[7K, 7K] (a few hundred keyframes -> trivial for one chip) solved by
Cholesky each LM step.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry import sim3

_FD_EPS = 1e-4


def _edge_residual(s_i: jax.Array, s_j: jax.Array, s_meas: jax.Array) -> jax.Array:
    """r = log(S_meas * S_i * S_j^-1), with S_meas = measured S_j->S_i
    transform inverse ... convention: S_meas ~= S_j * S_i^-1, so
    r = log(S_meas * S_i * S_j^-1) -> 0 at consistency. [7]."""
    return sim3.log(s_meas @ s_i @ sim3.inverse(s_j))


def _edge_residuals_perturbed(poses, edges_i, edges_j, s_meas, xi_i, xi_j):
    """Residuals with left-multiplicative perturbations applied."""
    s_i = sim3.compose(sim3.exp(xi_i), poses[edges_i])
    s_j = sim3.compose(sim3.exp(xi_j), poses[edges_j])
    return jax.vmap(_edge_residual)(s_i, s_j, s_meas)


@functools.partial(jax.jit, static_argnames=("fix_scale", "iters"))
def optimize_essential_graph(
    poses: jax.Array,       # [K, 4, 4] initial Sim3 (Tcw-style, world->kf)
    kf_valid: jax.Array,    # [K]
    kf_fixed: jax.Array,    # [K] (the loop keyframe, Optimizer.cc:941)
    edges_i: jax.Array,     # [E] int32
    edges_j: jax.Array,     # [E] int32
    edges_meas: jax.Array,  # [E, 4, 4] measured S_ji' = S_j S_i^-1
    edges_valid: jax.Array,  # [E]
    fix_scale: bool = False,
    iters: int = 20,
) -> Tuple[jax.Array, jax.Array]:
    """-> (optimized Sim3 poses [K, 4, 4], final cost)."""
    k = poses.shape[0]
    e = edges_i.shape[0]
    n_dof = 7

    def residuals(p):
        s_i = p[edges_i]
        s_j = p[edges_j]
        return jax.vmap(_edge_residual)(s_i, s_j, edges_meas)  # [E, 7]

    def cost(p):
        r = residuals(p)
        return jnp.sum(jnp.where(edges_valid[:, None], r * r, 0.0))

    def jacobians(p):
        """Central differences wrt the two endpoint perturbations.
        -> (J_i [E, 7, 7], J_j [E, 7, 7])."""
        def one_dim(d):
            hvec = jnp.zeros(n_dof).at[d].set(_FD_EPS)
            zero = jnp.zeros((e, n_dof))
            hv = jnp.broadcast_to(hvec, (e, n_dof))
            r_ip = _edge_residuals_perturbed(p, edges_i, edges_j, edges_meas, hv, zero)
            r_im = _edge_residuals_perturbed(p, edges_i, edges_j, edges_meas, -hv, zero)
            r_jp = _edge_residuals_perturbed(p, edges_i, edges_j, edges_meas, zero, hv)
            r_jm = _edge_residuals_perturbed(p, edges_i, edges_j, edges_meas, zero, -hv)
            return (r_ip - r_im) / (2 * _FD_EPS), (r_jp - r_jm) / (2 * _FD_EPS)

        cols = [one_dim(d) for d in range(n_dof)]
        j_i = jnp.stack([c[0] for c in cols], axis=-1)  # [E, 7(res), 7(dof)]
        j_j = jnp.stack([c[1] for c in cols], axis=-1)
        return j_i, j_j

    free = kf_valid & ~kf_fixed

    def lm_step(carry, _):
        p, lam, c = carry
        r = residuals(p)
        w = edges_valid.astype(p.dtype)
        j_i, j_j = jacobians(p)
        j_i = j_i * w[:, None, None]
        j_j = j_j * w[:, None, None]

        h = jnp.zeros((k, k, n_dof, n_dof))
        h = h.at[edges_i, edges_i].add(jnp.einsum("eri,erj->eij", j_i, j_i))
        h = h.at[edges_j, edges_j].add(jnp.einsum("eri,erj->eij", j_j, j_j))
        h = h.at[edges_i, edges_j].add(jnp.einsum("eri,erj->eij", j_i, j_j))
        h = h.at[edges_j, edges_i].add(jnp.einsum("eri,erj->eij", j_j, j_i))
        b = jnp.zeros((k, n_dof))
        rw = r * w[:, None]
        b = b.at[edges_i].add(-jnp.einsum("eri,er->ei", j_i, rw))
        b = b.at[edges_j].add(-jnp.einsum("eri,er->ei", j_j, rw))

        # gauge/validity: clamp fixed and invalid vertices
        mask2 = free[:, None] & free[None, :]
        h = jnp.where(mask2[:, :, None, None], h, 0.0)
        eye_blk = jnp.eye(n_dof)
        diag_idx = jnp.arange(k)
        h = h.at[diag_idx, diag_idx].add(
            jnp.where(free[:, None, None], lam * eye_blk[None] + 1e-6 * eye_blk[None],
                      eye_blk[None]))
        b = jnp.where(free[:, None], b, 0.0)

        h_dense = h.transpose(0, 2, 1, 3).reshape(k * n_dof, k * n_dof)
        delta = jnp.linalg.solve(h_dense, b.reshape(-1)).reshape(k, n_dof)
        if fix_scale:
            delta = delta.at[:, 6].set(0.0)
        delta = jnp.where(free[:, None], delta, 0.0)
        p_new = sim3.compose(sim3.exp(delta), p)
        c_new = cost(p_new)
        accept = c_new < c
        p_out = jnp.where(accept, p_new, p)
        lam_out = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                            jnp.minimum(lam * 4.0, 1e6))
        c_out = jnp.where(accept, c_new, c)
        return (p_out, lam_out, c_out), None

    c0 = cost(poses)
    (p, _, c), _ = jax.lax.scan(lm_step, (poses, jnp.float32(1e-6), c0),
                                None, length=iters)
    return p, c
