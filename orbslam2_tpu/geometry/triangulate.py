"""Batched DLT triangulation and epipolar geometry helpers.

Replaces the per-point SVD loop of the reference
(Initializer::Triangulate /root/reference/src/Initializer.cc:814-829 and
LocalMapping::CreateNewMapPoints /root/reference/src/LocalMapping.cc:375-391)
with one batched 4x4 eigen-solve over all candidate pairs at once.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def projection_matrix(k: jax.Array, tcw: jax.Array) -> jax.Array:
    """P = K [R|t], [..., 3, 4]."""
    return k @ tcw[..., :3, :4]


def triangulate_dlt(p1: jax.Array, p2: jax.Array, uv1: jax.Array, uv2: jax.Array) -> jax.Array:
    """Linear triangulation of point pairs.

    p1, p2: [..., 3, 4] projection matrices; uv1, uv2: [..., 2] pixels.
    Returns world points [..., 3]. Solves the inhomogeneous DLT least
    squares B X = -a (the 4x4 system's first three columns against its
    last, i.e. the w=1 gauge) through closed-form 3x3 normal equations:
    `jnp.linalg.eigh` on [N, 4, 4] batches lowers to an iterative
    eigensolver on TPU and dominated the whole triangulation program
    (same lesson as the batched-LU det/solve in sim3). Points near
    infinity (w ~ 0) get garbage here AND from the eigenvector variant's
    normalization — the callers' parallax/cheirality/chi2 gates reject
    them either way.
    """
    rows = jnp.stack(
        [
            uv1[..., 0, None] * p1[..., 2, :] - p1[..., 0, :],
            uv1[..., 1, None] * p1[..., 2, :] - p1[..., 1, :],
            uv2[..., 0, None] * p2[..., 2, :] - p2[..., 0, :],
            uv2[..., 1, None] * p2[..., 2, :] - p2[..., 1, :],
        ],
        axis=-2,
    )  # [..., 4, 4]
    b = rows[..., :, :3]
    rhs = -rows[..., :, 3]
    ata = jnp.einsum("...ki,...kj->...ij", b, b)      # [..., 3, 3] SPD
    atb = jnp.einsum("...ki,...k->...i", b, rhs)
    # closed-form 3x3 solve via adjugate (all elementwise — VPU-friendly)
    a00, a01, a02 = ata[..., 0, 0], ata[..., 0, 1], ata[..., 0, 2]
    a11, a12, a22 = ata[..., 1, 1], ata[..., 1, 2], ata[..., 2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20,
                              jnp.where(det < 0, -1e-20, 1e-20), det)
    b0, b1, b2 = atb[..., 0], atb[..., 1], atb[..., 2]
    x = jnp.stack([
        c00 * b0 + c01 * b1 + c02 * b2,
        c01 * b0 + c11 * b1 + c12 * b2,
        c02 * b0 + c12 * b1 + c22 * b2,
    ], axis=-1) * inv_det[..., None]
    return x


def fundamental_from_poses(k1: jax.Array, tcw1: jax.Array, k2: jax.Array, tcw2: jax.Array) -> jax.Array:
    """F12 such that x1^T F12 x2 = 0 for corresponding pixels, mirroring
    LocalMapping::ComputeF12 (/root/reference/src/LocalMapping.cc:601-621)."""
    r1, t1 = tcw1[..., :3, :3], tcw1[..., :3, 3]
    r2, t2 = tcw2[..., :3, :3], tcw2[..., :3, 3]
    r12 = r1 @ jnp.swapaxes(r2, -1, -2)
    t12 = t1 - jnp.einsum("...ij,...j->...i", r12, t2)
    tx = _hat(t12)
    k1_inv_t = jnp.linalg.inv(jnp.swapaxes(k1, -1, -2))
    k2_inv = jnp.linalg.inv(k2)
    return k1_inv_t @ tx @ r12 @ k2_inv


def _hat(w: jax.Array) -> jax.Array:
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def epipolar_distance_sq(uv1: jax.Array, uv2: jax.Array, f12: jax.Array) -> jax.Array:
    """Squared distance of x2 from the epipolar line of x1 (and the line
    l2 = x1^T F12). Mirrors ORBmatcher::CheckDistEpipolarLine
    (/root/reference/src/ORBmatcher.cc:147-164)."""
    a = uv1[..., 0] * f12[..., 0, 0] + uv1[..., 1] * f12[..., 1, 0] + f12[..., 2, 0]
    b = uv1[..., 0] * f12[..., 0, 1] + uv1[..., 1] * f12[..., 1, 1] + f12[..., 2, 1]
    c = uv1[..., 0] * f12[..., 0, 2] + uv1[..., 1] * f12[..., 1, 2] + f12[..., 2, 2]
    num = a * uv2[..., 0] + b * uv2[..., 1] + c
    den = a * a + b * b
    return num * num / jnp.where(den < 1e-12, 1e-12, den)


def parallax_cos(center1: jax.Array, center2: jax.Array, pts: jax.Array) -> jax.Array:
    """Cosine of ray parallax angle at each point [..., 3] between two
    camera centers (reference gating: /root/reference/src/LocalMapping.cc:342-372)."""
    r1 = pts - center1
    r2 = pts - center2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)


def reprojection_error_sq(
    k: jax.Array, tcw: jax.Array, pts_w: jax.Array, uv: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """-> (squared pixel error, depth) for world points under pose tcw."""
    pc = jnp.einsum("...ij,...j->...i", tcw[..., :3, :3], pts_w) + tcw[..., :3, 3]
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    fx = k[..., 0, 0]
    fy = k[..., 1, 1]
    cx = k[..., 0, 2]
    cy = k[..., 1, 2]
    u = fx * pc[..., 0] * inv_z + cx
    v = fy * pc[..., 1] * inv_z + cy
    du = u - uv[..., 0]
    dv = v - uv[..., 1]
    return du * du + dv * dv, z
