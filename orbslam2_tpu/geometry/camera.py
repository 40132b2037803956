"""Pinhole camera model with radial-tangential distortion, batched.

Replaces the reference's scattered cv::projectPoints / cv::undistortPoints
usage (/root/reference/src/Frame.cc:470-575) with vectorized JAX ops. A
``PinholeCamera`` is a static dataclass (hashable, usable as a jit static
arg or closed over), holding intrinsics as plain floats.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    fx: float
    fy: float
    cx: float
    cy: float
    # distortion: k1, k2, p1, p2, k3 (OpenCV order, as parsed by
    # /root/reference/src/Tracking.cc:58-83)
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 640
    height: int = 480
    # stereo baseline times fx ("bf", /root/reference/src/Tracking.cc:90)
    bf: float = 0.0

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))

    @property
    def baseline(self) -> float:
        return self.bf / self.fx if self.fx else 0.0

    def k_matrix(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    def project(self, pts_cam: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Camera-frame points [..., 3] -> pixel coords [..., 2], depth [...].

        No distortion applied: the pipeline matches against *undistorted*
        keypoint coordinates, mirroring the reference which undistorts
        keypoints once at frame build (/root/reference/src/Frame.cc:470-515)
        and projects with the pinhole model thereafter
        (/root/reference/src/ORBmatcher.cc:62-70).
        """
        z = pts_cam[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = self.fx * pts_cam[..., 0] * inv_z + self.cx
        v = self.fy * pts_cam[..., 1] * inv_z + self.cy
        return jnp.stack([u, v], axis=-1), z

    def project_stereo(self, pts_cam: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """-> ((u, v, uR), depth): uR = u - bf/z, the virtual right-image
        column (reference: /root/reference/src/Frame.cc:754-775)."""
        uv, z = self.project(pts_cam)
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        ur = uv[..., 0] - self.bf * inv_z
        return jnp.concatenate([uv, ur[..., None]], axis=-1), z

    def backproject(self, uv: jax.Array, depth: jax.Array) -> jax.Array:
        """Undistorted pixels [..., 2] + depth [...] -> camera-frame [..., 3]
        (reference: Frame::UnprojectStereo /root/reference/src/Frame.cc:777-793)."""
        x = (uv[..., 0] - self.cx) / self.fx * depth
        y = (uv[..., 1] - self.cy) / self.fy * depth
        return jnp.stack([x, y, depth], axis=-1)

    def backproject_np(self, uv, depth):
        """Numpy twin of backproject for host bookkeeping paths (keyframe
        creation, init): trivial math — a device dispatch here costs a
        full relay round trip per keyframe for ~3 FLOPs/point."""
        import numpy as _np
        x = (uv[..., 0] - self.cx) / self.fx * depth
        y = (uv[..., 1] - self.cy) / self.fy * depth
        return _np.stack([x, y, depth], axis=-1).astype(_np.float32)

    def distort_normalized(self, xn: jax.Array) -> jax.Array:
        """Apply radial-tangential distortion to normalized coords [..., 2]."""
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
        xy = x * y
        dx = 2.0 * self.p1 * xy + self.p2 * (r2 + 2.0 * x * x)
        dy = self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * xy
        return jnp.stack([x * radial + dx, y * radial + dy], axis=-1)

    def undistort_points(self, uv: jax.Array, iters: int = 8) -> jax.Array:
        """Iteratively invert the distortion (fixed-point, like
        cv::undistortPoints). Identity when the camera has no distortion.
        Reference behavior: Frame::UndistortKeyPoints
        /root/reference/src/Frame.cc:470-515."""
        if not self.has_distortion:
            return uv
        xd = jnp.stack(
            [(uv[..., 0] - self.cx) / self.fx, (uv[..., 1] - self.cy) / self.fy],
            axis=-1,
        )

        def body(_, xn):
            x, y = xn[..., 0], xn[..., 1]
            r2 = x * x + y * y
            radial = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
            xy = x * y
            dx = 2.0 * self.p1 * xy + self.p2 * (r2 + 2.0 * x * x)
            dy = self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * xy
            return jnp.stack(
                [(xd[..., 0] - dx) / radial, (xd[..., 1] - dy) / radial], axis=-1
            )

        xn = jax.lax.fori_loop(0, iters, body, xd)
        return jnp.stack(
            [self.fx * xn[..., 0] + self.cx, self.fy * xn[..., 1] + self.cy],
            axis=-1,
        )

    def undistorted_bounds(self) -> Tuple[float, float, float, float]:
        """(min_x, max_x, min_y, max_y) of the undistorted image rectangle
        (reference: Frame::ComputeImageBounds /root/reference/src/Frame.cc:520-575).

        Pure numpy (no device dispatch): evaluated at trace time by the
        jitted frustum kernels, which gate projections against these bounds
        exactly like the reference's mnMinX/mnMaxX (Frame.cc:329-333)."""
        return _undistorted_bounds_cached(self)


@functools.lru_cache(maxsize=64)
def _undistorted_bounds_cached(cam: "PinholeCamera") -> Tuple[float, float, float, float]:
    import numpy as np

    if not cam.has_distortion:
        return 0.0, float(cam.width), 0.0, float(cam.height)
    corners = np.array(
        [[0.0, 0.0], [cam.width, 0.0], [0.0, cam.height], [cam.width, cam.height]],
        dtype=np.float64,
    )
    xd = np.stack([(corners[:, 0] - cam.cx) / cam.fx,
                   (corners[:, 1] - cam.cy) / cam.fy], axis=-1)
    xn = xd.copy()
    for _ in range(8):  # fixed-point inversion, mirroring undistort_points
        x, y = xn[:, 0], xn[:, 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        xy = x * y
        dx = 2.0 * cam.p1 * xy + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * xy
        xn = np.stack([(xd[:, 0] - dx) / radial, (xd[:, 1] - dy) / radial], axis=-1)
    und = np.stack([cam.fx * xn[:, 0] + cam.cx, cam.fy * xn[:, 1] + cam.cy], axis=-1)
    min_x = float(min(und[0, 0], und[2, 0]))
    max_x = float(max(und[1, 0], und[3, 0]))
    min_y = float(min(und[0, 1], und[1, 1]))
    max_y = float(max(und[2, 1], und[3, 1]))
    return min_x, max_x, min_y, max_y
