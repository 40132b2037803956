"""Sim3 relative-pose optimization between two keyframes.

Replaces Optimizer::OptimizeSim3 (/root/reference/src/Optimizer.cc:1164-1365):
one Sim3 vertex, fixed matched point pairs, forward + inverse projection
residuals, Huber(sqrt(10)), chi2-10 outlier pruning, then continued
iterations. Here the residuals for all pairs are batched and the 7-dof GN
step uses autodiff Jacobians (the projection chain is smooth — no log map
in the residual).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry import sim3
from orbslam2_tpu.geometry.camera import PinholeCamera

CHI2_SIM3 = 10.0


def _residuals(s12: jax.Array, pts1: jax.Array, pts2: jax.Array,
               uv1: jax.Array, uv2: jax.Array, cam: PinholeCamera):
    """e = [uv1 - proj(S12 p2); uv2 - proj(S12^-1 p1)] -> [N, 4], depths."""
    p2in1 = sim3.apply(s12, pts2)
    p1in2 = sim3.apply(sim3.inverse(s12), pts1)
    uvp1, z1 = cam.project(p2in1)
    uvp2, z2 = cam.project(p1in2)
    e = jnp.concatenate([uv1 - uvp1, uv2 - uvp2], axis=-1)
    return e, z1, z2


@functools.partial(jax.jit, static_argnames=("cam", "fix_scale", "iters"))
def optimize_sim3(
    s12_0: jax.Array,     # [4, 4] initial Sim3 (frame2 -> frame1 coords)
    pts1: jax.Array,      # [N, 3] matched points in KF1 camera coords
    pts2: jax.Array,      # [N, 3] in KF2 camera coords
    uv1: jax.Array,       # [N, 2] observed pixels in image 1
    uv2: jax.Array,       # [N, 2] observed pixels in image 2
    inv_sigma2_1: jax.Array,
    inv_sigma2_2: jax.Array,
    valid: jax.Array,
    cam: PinholeCamera,
    fix_scale: bool = False,
    iters: int = 10,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """-> (s12, inlier mask, n_inliers). Two rounds of `iters` GN steps with
    chi2-10 reclassification between them (Optimizer.cc:1302-1351)."""
    delta = jnp.sqrt(CHI2_SIM3)

    def chi2(e):
        c1 = jnp.sum(e[:, :2] ** 2, axis=-1) * inv_sigma2_1
        c2 = jnp.sum(e[:, 2:] ** 2, axis=-1) * inv_sigma2_2
        return c1, c2

    def gn_rounds(s12, active, n_iters):
        def step(s12, _):
            def res_fn(xi):
                if fix_scale:
                    xi = xi.at[6].set(0.0)
                s = sim3.compose(sim3.exp(xi), s12)
                e, _, _ = _residuals(s, pts1, pts2, uv1, uv2, cam)
                return e
            e = res_fn(jnp.zeros(7))
            j = jax.jacfwd(res_fn)(jnp.zeros(7))  # [N, 4, 7]
            c1, c2 = chi2(e)
            s1 = jnp.sqrt(jnp.maximum(c1, 1e-12))
            s2 = jnp.sqrt(jnp.maximum(c2, 1e-12))
            w1 = jnp.where(s1 > delta, delta / s1, 1.0) * inv_sigma2_1
            w2 = jnp.where(s2 > delta, delta / s2, 1.0) * inv_sigma2_2
            w = jnp.stack([w1, w1, w2, w2], axis=-1) * active[:, None]
            jw = j * w[:, :, None]
            h = jnp.einsum("nri,nrj->ij", jw, j) + 1e-6 * jnp.eye(7)
            b = -jnp.einsum("nri,nr->i", jw, e)
            xi = jnp.linalg.solve(h, b)
            if fix_scale:
                xi = xi.at[6].set(0.0)
            return sim3.compose(sim3.exp(xi), s12), None

        s12, _ = jax.lax.scan(step, s12, None, length=n_iters)
        return s12

    active = valid.astype(jnp.float32)
    s12 = gn_rounds(s12_0, active, iters)
    e, z1, z2 = _residuals(s12, pts1, pts2, uv1, uv2, cam)
    c1, c2 = chi2(e)
    inlier = valid & (c1 < CHI2_SIM3) & (c2 < CHI2_SIM3) & (z1 > 0) & (z2 > 0)
    s12 = gn_rounds(s12, inlier.astype(jnp.float32), iters)
    e, z1, z2 = _residuals(s12, pts1, pts2, uv1, uv2, cam)
    c1, c2 = chi2(e)
    inlier = valid & (c1 < CHI2_SIM3) & (c2 < CHI2_SIM3) & (z1 > 0) & (z2 > 0)
    return s12, inlier, jnp.sum(inlier.astype(jnp.int32))
