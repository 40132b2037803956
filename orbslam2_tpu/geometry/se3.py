"""SE(3) Lie-group operations, batched and jit-friendly.

The canonical on-device pose representation is a homogeneous ``[..., 4, 4]``
float32 matrix ``T = [[R, t], [0, 1]]`` mapping world points into the frame
("Tcw" convention of the reference: world -> camera,
/root/reference/src/Frame.cc:294-306). Tangent vectors are ``[..., 6]`` with
translation first, rotation second: ``xi = (rho, phi)`` so that
``exp(xi) = [[exp(phi^), V(phi) rho], [0, 1]]``.

This replaces g2o's SE3Quat (/root/reference/Thirdparty/g2o/g2o/types/se3quat.h)
with pure-array math that vmaps/jits cleanly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of a 3-vector; batched over leading dims."""
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


def _so3_coeffs(theta_sq: jax.Array):
    """(A, B, C) coefficients for Rodrigues / left-Jacobian with small-angle
    Taylor fallbacks (numerically safe under f32 + autodiff)."""
    theta = jnp.sqrt(theta_sq + _EPS * _EPS)
    small = theta_sq < 1e-8
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq)
    c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (1.0 - a) / theta_sq)
    return a, b, c


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues formula: axis-angle [..., 3] -> rotation [..., 3, 3]."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    a, b, _ = _so3_coeffs(theta_sq)
    k = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * (k @ k)


def so3_log(r: jax.Array) -> jax.Array:
    """Rotation [..., 3, 3] -> axis-angle [..., 3]."""
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # vee of the antisymmetric part
    w = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    # theta / (2 sin theta), Taylor for small theta
    scale = jnp.where(
        theta < 1e-4,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * sin_theta + _EPS),
    )
    generic = scale[..., None] * w
    # Near theta = pi the vee part vanishes; recover axis from diagonal.
    # axis_i^2 = (R_ii + 1) / 2
    axis_sq = jnp.clip((jnp.stack([r[..., 0, 0], r[..., 1, 1], r[..., 2, 2]], axis=-1) + 1.0) * 0.5, 0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    # Fix signs using off-diagonal sums (R + R^T)_ij = 2 axis_i axis_j (1-cos)
    sxy = r[..., 0, 1] + r[..., 1, 0]
    sxz = r[..., 0, 2] + r[..., 2, 0]
    # take x >= 0; then sign(y) = sign(sxy), sign(z) = sign(sxz) when x > 0
    big = jnp.argmax(axis_sq, axis=-1)
    sgn_y = jnp.where(big == 0, jnp.sign(sxy + _EPS), 1.0)
    sgn_z = jnp.where(big == 0, jnp.sign(sxz + _EPS), jnp.where(big == 1, jnp.sign(r[..., 1, 2] + r[..., 2, 1] + _EPS), 1.0))
    sgn_x = jnp.where(big == 1, jnp.sign(sxy + _EPS), jnp.where(big == 2, jnp.sign(sxz + _EPS), 1.0))
    near_pi_axis = axis * jnp.stack([sgn_x, sgn_y, sgn_z], axis=-1)
    near_pi = theta[..., None] * near_pi_axis
    return jnp.where((jnp.pi - theta < 1e-3)[..., None], near_pi, generic)


def exp(xi: jax.Array) -> jax.Array:
    """SE(3) exponential: twist [..., 6] (rho, phi) -> [..., 4, 4]."""
    rho, phi = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(phi * phi, axis=-1)
    a, b, c = _so3_coeffs(theta_sq)
    k = hat(phi)
    kk = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), k.shape)
    rot = eye + a[..., None, None] * k + b[..., None, None] * kk
    v = eye + b[..., None, None] * k + c[..., None, None] * kk
    t = jnp.einsum("...ij,...j->...i", v, rho)
    return from_rt(rot, t)


def log(t_mat: jax.Array) -> jax.Array:
    """SE(3) logarithm: [..., 4, 4] -> twist [..., 6] (rho, phi)."""
    r = t_mat[..., :3, :3]
    t = t_mat[..., :3, 3]
    phi = so3_log(r)
    theta_sq = jnp.sum(phi * phi, axis=-1)
    _, b, c = _so3_coeffs(theta_sq)
    k = hat(phi)
    kk = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=t_mat.dtype), k.shape)
    # V^{-1} = I - 1/2 K + (1/theta^2)(1 - A/(2B)) K^2
    theta = jnp.sqrt(theta_sq + _EPS * _EPS)
    half = jnp.where(
        theta_sq < 1e-8,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - 0.5 * theta * jnp.sin(theta) / (1.0 - jnp.cos(theta) + _EPS)) / (theta_sq + _EPS),
    )
    v_inv = eye - 0.5 * k + half[..., None, None] * kk
    rho = jnp.einsum("...ij,...j->...i", v_inv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def from_rt(r: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble [..., 4, 4] from rotation [..., 3, 3] and translation [..., 3]."""
    batch = jnp.broadcast_shapes(r.shape[:-2], t.shape[:-1])
    r = jnp.broadcast_to(r, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([r, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=r.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def identity(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch_shape) + (4, 4))


def inverse(t_mat: jax.Array) -> jax.Array:
    """Closed-form inverse: [R^T, -R^T t]."""
    r = t_mat[..., :3, :3]
    t = t_mat[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    return from_rt(rt, -jnp.einsum("...ij,...j->...i", rt, t))


def compose(a: jax.Array, b: jax.Array) -> jax.Array:
    return a @ b


def apply(t_mat: jax.Array, points: jax.Array) -> jax.Array:
    """Transform points [..., 3] by pose(s) [..., 4, 4] (broadcasting)."""
    r = t_mat[..., :3, :3]
    t = t_mat[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", r, points) + t


def rotation(t_mat: jax.Array) -> jax.Array:
    return t_mat[..., :3, :3]


def translation(t_mat: jax.Array) -> jax.Array:
    return t_mat[..., :3, 3]


def camera_center(tcw: jax.Array) -> jax.Array:
    """Camera center in world coords: Ow = -Rcw^T tcw
    (reference: Frame::UpdatePoseMatrices /root/reference/src/Frame.cc:294-306)."""
    r = tcw[..., :3, :3]
    t = tcw[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", r, t)


def retract(t_mat: jax.Array, xi: jax.Array) -> jax.Array:
    """Left-multiplicative update exp(xi) * T — matches g2o's SE3 oplus
    (/root/reference/Thirdparty/g2o/g2o/types/types_six_dof_expmap.h:73-76)."""
    return compose(exp(xi), t_mat)


def to_quaternion(r: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (x, y, z, w),
    TUM trajectory convention (reference: System::SaveTrajectoryTUM
    /root/reference/src/System.cc:353-415). Shepperd's branchless method."""
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate quaternions (unnormalized), pick numerically best
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4 cand, 4 (wxyz)]
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([x, y, z, w], axis=-1)


def from_quaternion(q: jax.Array) -> jax.Array:
    """Unit quaternion [..., 4] (x, y, z, w) -> rotation matrix [..., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / (n + _EPS), 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
