"""Horn/Umeyama absolute orientation + batched Sim3 RANSAC.

Replaces Sim3Solver (/root/reference/src/Sim3Solver.cc): closed-form 3D-3D
similarity from 3-point sets (Horn 1987 — here via the SVD/Umeyama form,
which is equivalent and batches cleanly), wrapped in a vmapped RANSAC with
mutual-reprojection inlier checks (Sim3Solver::CheckInliers cc:347).
Scale can be frozen for stereo/RGB-D (mbFixScale, cc:299-318).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry import sim3
from orbslam2_tpu.geometry.camera import PinholeCamera


def umeyama(src: jax.Array, dst: jax.Array, w: jax.Array | None = None,
            with_scale: bool = True):
    """Weighted least-squares similarity: dst ~= s R src + t.

    src, dst: [..., N, 3]; w: [..., N] nonnegative weights.
    -> (s [...], r [..., 3, 3], t [..., 3]).
    """
    if w is None:
        w = jnp.ones(src.shape[:-1], src.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    wn = w / wsum
    mu_s = jnp.sum(src * wn[..., None], axis=-2)
    mu_d = jnp.sum(dst * wn[..., None], axis=-2)
    xs = src - mu_s[..., None, :]
    xd = dst - mu_d[..., None, :]
    cov = jnp.einsum("...ni,...nj,...n->...ij", xd, xs, wn)
    u, d, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u) * jnp.linalg.det(vt)
    sflip = jnp.ones_like(d).at[..., 2].set(jnp.sign(det))
    r = u @ (sflip[..., :, None] * vt)
    if with_scale:
        var_s = jnp.sum(jnp.sum(xs * xs, axis=-1) * wn, axis=-1)
        s = jnp.sum(d * sflip, axis=-1) / jnp.maximum(var_s, 1e-12)
    else:
        s = jnp.ones(src.shape[:-2], src.dtype)
    t = mu_d - s[..., None] * jnp.einsum("...ij,...j->...i", r, mu_s)
    return s, r, t


class Sim3RansacResult(NamedTuple):
    success: jax.Array   # bool
    s12: jax.Array       # [4, 4] Sim3 mapping frame-2 coords into frame-1
    inliers: jax.Array   # [N] bool
    n_inliers: jax.Array


@functools.partial(jax.jit, static_argnames=("cam", "fix_scale", "iters", "min_inliers"))
def sim3_ransac(
    pts1_cam: jax.Array,   # [N, 3] matched points in KF1 camera coords
    pts2_cam: jax.Array,   # [N, 3] same points in KF2 camera coords
    valid: jax.Array,      # [N]
    sigma2_1: jax.Array,   # [N] octave sigma^2 in image 1
    sigma2_2: jax.Array,   # [N]
    cam: PinholeCamera,
    key: jax.Array,
    fix_scale: bool = False,
    iters: int = 300,
    min_inliers: int = 20,
) -> Sim3RansacResult:
    """Batched RANSAC over 3-point sets; inliers by mutual projection with
    chi2 9.210 per direction (Sim3Solver.cc:37-76, 347-377)."""
    n = pts1_cam.shape[0]
    probs = valid.astype(jnp.float32) / jnp.maximum(jnp.sum(valid), 1)
    keys = jax.random.split(key, iters)
    sets = jax.vmap(lambda k_: jax.random.choice(k_, n, (3,), replace=False, p=probs))(keys)

    def count_inliers(s, r, t):
        p2in1 = s[..., None] * (pts2_cam @ r.T) + t
        s_inv = 1.0 / jnp.maximum(s, 1e-12)
        p1in2 = s_inv[..., None] * ((pts1_cam - t) @ r)
        uv1_proj, z1 = cam.project(p2in1)
        uv2_proj, z2 = cam.project(p1in2)
        uv1, _ = cam.project(pts1_cam)
        uv2, _ = cam.project(pts2_cam)
        e1 = jnp.sum((uv1_proj - uv1) ** 2, axis=-1) / sigma2_1
        e2 = jnp.sum((uv2_proj - uv2) ** 2, axis=-1) / sigma2_2
        inl = valid & (e1 < 9.210) & (e2 < 9.210) & (z1 > 0) & (z2 > 0)
        return inl

    def hypo(idx):
        s, r, t = umeyama(pts2_cam[idx], pts1_cam[idx], with_scale=not fix_scale)
        inl = count_inliers(s, r, t)
        return jnp.sum(inl.astype(jnp.int32)), s, r, t

    counts, ss, rs, tss = jax.vmap(hypo)(sets)
    best = jnp.argmax(counts)
    s_b, r_b, t_b = ss[best], rs[best], tss[best]
    inl = count_inliers(s_b, r_b, t_b)
    # refine on all inliers
    s_r, r_r, t_r = umeyama(pts2_cam, pts1_cam, inl.astype(jnp.float32),
                            with_scale=not fix_scale)
    inl_r = count_inliers(s_r, r_r, t_r)
    better = jnp.sum(inl_r.astype(jnp.int32)) >= jnp.sum(inl.astype(jnp.int32))
    s_f = jnp.where(better, s_r, s_b)
    r_f = jnp.where(better, r_r, r_b)
    t_f = jnp.where(better, t_r, t_b)
    inl_f = jnp.where(better, inl_r, inl)
    n_inl = jnp.sum(inl_f.astype(jnp.int32))
    return Sim3RansacResult(
        success=n_inl >= min_inliers,
        s12=sim3.from_srt(s_f, r_f, t_f),
        inliers=inl_f,
        n_inliers=n_inl,
    )
