"""Sim(3) similarity-transform operations, batched and jit-friendly.

Canonical representation: ``[..., 4, 4]`` matrix ``S = [[s R, t], [0, 1]]``
(scale folded into the rotation block), plus helpers to split/assemble
``(s, R, t)``. Tangent vectors are ``[..., 7]`` = ``(rho, phi, sigma)``
with ``s = exp(sigma)``.

Replaces g2o's Sim3 (/root/reference/Thirdparty/g2o/g2o/types/sim3.h) used by
loop closing (/root/reference/src/LoopClosing.cc:544-646) and the essential
graph optimizer (/root/reference/src/Optimizer.cc:885-1153).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry import se3

_EPS = 1e-8


def from_srt(s: jax.Array, r: jax.Array, t: jax.Array) -> jax.Array:
    return se3.from_rt(s[..., None, None] * r, t)


def _det3(m: jax.Array) -> jax.Array:
    """Closed-form 3x3 determinant (jnp.linalg.det lowers to a batched LU
    on TPU — orders of magnitude slower for [E,3,3] batches)."""
    return (m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
            - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
            + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]))


def scale(s_mat: jax.Array) -> jax.Array:
    """Recover the scale: |det(sR)|^(1/3) = s."""
    det = _det3(s_mat[..., :3, :3])
    return jnp.cbrt(jnp.maximum(det, _EPS))


def split(s_mat: jax.Array):
    """-> (s, R, t) with R orthonormal."""
    s = scale(s_mat)
    r = s_mat[..., :3, :3] / s[..., None, None]
    t = s_mat[..., :3, 3]
    return s, r, t


def identity(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    return se3.identity(batch_shape, dtype)


def inverse(s_mat: jax.Array) -> jax.Array:
    """S^-1 = [[(1/s) R^T, -(1/s) R^T t], [0, 1]]."""
    s, r, t = split(s_mat)
    rt = jnp.swapaxes(r, -1, -2)
    inv_s = 1.0 / (s + _EPS)
    return from_srt(inv_s, rt, -inv_s[..., None] * jnp.einsum("...ij,...j->...i", rt, t))


def compose(a: jax.Array, b: jax.Array) -> jax.Array:
    return a @ b


def apply(s_mat: jax.Array, points: jax.Array) -> jax.Array:
    """p' = s R p + t (reference: g2oCorrectedSwi.map(...)
    /root/reference/src/LoopClosing.cc:589-629)."""
    sr = s_mat[..., :3, :3]
    t = s_mat[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", sr, points) + t


def from_se3(t_mat: jax.Array, s: jax.Array | float = 1.0) -> jax.Array:
    s = jnp.asarray(s, dtype=t_mat.dtype)
    return from_srt(jnp.broadcast_to(s, t_mat.shape[:-2]), t_mat[..., :3, :3], t_mat[..., :3, 3])


def to_se3(s_mat: jax.Array) -> jax.Array:
    """SE3 with the translation de-scaled: [R, t/s] — how the reference turns
    an optimized Sim3 back into a keyframe pose
    (/root/reference/src/Optimizer.cc:1100-1119)."""
    s, r, t = split(s_mat)
    return se3.from_rt(r, t / (s[..., None] + _EPS))


def exp(xi: jax.Array) -> jax.Array:
    """Sim(3) exponential map: [..., 7] (rho, phi, sigma) -> [..., 4, 4].

    W matrix per Strasdat's thesis: with s = e^sigma,
    t = W rho where W = A I + B K + C K^2 built from (sigma, theta).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    r = se3.so3_exp(phi)
    k = se3.hat(phi)
    kk = k @ k

    # Evaluate (A, B, C) with theta and sigma clamped away from zero; the
    # resulting error near the singular points is O(clamp^2) ~ 1e-8, below
    # f32 resolution, which keeps the expression branch-free for XLA.
    theta = jnp.maximum(jnp.sqrt(jnp.sum(phi * phi, axis=-1) + _EPS * _EPS), 1e-4)
    sig_small = jnp.abs(sigma) < 1e-5
    a = jnp.where(
        sig_small,
        1.0 + sigma / 2.0 + sigma * sigma / 6.0,
        (s - 1.0) / jnp.where(sig_small, 1.0, sigma),
    )
    denom = sigma * sigma + theta * theta
    b = (s * jnp.sin(theta) * sigma + (1.0 - s * jnp.cos(theta)) * theta) / (theta * denom)
    c = (a - ((s * jnp.cos(theta) - 1.0) * sigma + s * jnp.sin(theta) * theta) / denom) / (theta * theta)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), k.shape)
    w = a[..., None, None] * eye + b[..., None, None] * k + c[..., None, None] * kk
    t = jnp.einsum("...ij,...j->...i", w, rho)
    return from_srt(s, r, t)


def log(s_mat: jax.Array) -> jax.Array:
    """Sim(3) logarithm via solving t = W rho (3x3 solve)."""
    s, r, t = split(s_mat)
    phi = se3.so3_log(r)
    sigma = jnp.log(jnp.maximum(s, _EPS))
    # Rebuild W as in exp, then solve for rho.
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.maximum(jnp.sqrt(theta_sq + _EPS * _EPS), 1e-4)
    sig_small = jnp.abs(sigma) < 1e-5
    a = jnp.where(sig_small, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (s - 1.0) / jnp.where(sig_small, 1.0, sigma))
    denom = sigma * sigma + theta * theta
    b = (s * jnp.sin(theta) * sigma + (1.0 - s * jnp.cos(theta)) * theta) / (theta * denom)
    c = (a - ((s * jnp.cos(theta) - 1.0) * sigma + s * jnp.sin(theta) * theta) / denom) / (theta * theta)
    k = se3.hat(phi)
    kk = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=s_mat.dtype), k.shape)
    w = a[..., None, None] * eye + b[..., None, None] * k + c[..., None, None] * kk
    # rho = W^-1 t via the closed-form adjugate (jnp.linalg.solve lowers to
    # a batched LU on TPU — the dominant cost of per-edge pose-graph math)
    c00 = w[..., 1, 1] * w[..., 2, 2] - w[..., 1, 2] * w[..., 2, 1]
    c01 = w[..., 0, 2] * w[..., 2, 1] - w[..., 0, 1] * w[..., 2, 2]
    c02 = w[..., 0, 1] * w[..., 1, 2] - w[..., 0, 2] * w[..., 1, 1]
    c10 = w[..., 1, 2] * w[..., 2, 0] - w[..., 1, 0] * w[..., 2, 2]
    c11 = w[..., 0, 0] * w[..., 2, 2] - w[..., 0, 2] * w[..., 2, 0]
    c12 = w[..., 0, 2] * w[..., 1, 0] - w[..., 0, 0] * w[..., 1, 2]
    c20 = w[..., 1, 0] * w[..., 2, 1] - w[..., 1, 1] * w[..., 2, 0]
    c21 = w[..., 0, 1] * w[..., 2, 0] - w[..., 0, 0] * w[..., 2, 1]
    c22 = w[..., 0, 0] * w[..., 1, 1] - w[..., 0, 1] * w[..., 1, 0]
    det = w[..., 0, 0] * c00 + w[..., 0, 1] * c10 + w[..., 0, 2] * c20
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    t0, t1, t2 = t[..., 0], t[..., 1], t[..., 2]
    rho = jnp.stack([
        (c00 * t0 + c01 * t1 + c02 * t2) * inv_det,
        (c10 * t0 + c11 * t1 + c12 * t2) * inv_det,
        (c20 * t0 + c21 * t1 + c22 * t2) * inv_det,
    ], axis=-1)
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
