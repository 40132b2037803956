"""Per-frame container: ORB features + undistorted coords + depth/stereo.

Replaces the reference Frame (/root/reference/src/Frame.cc). Differences by
design: no 64x48 feature grid (dense masked matching replaces grid queries,
see ops/match.py) and fixed-capacity masked arrays everywhere.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.ops.orb import Keypoints, ORBExtractor


@dataclasses.dataclass
class HostKeypoints:
    """Numpy copies of a frame's device arrays, fetched ONCE per frame in a
    single batched device_get (over the remote relay every separate
    np.asarray is a ~30 ms round trip; the keyframe-creation path alone
    had eight)."""
    xy: np.ndarray
    octave: np.ndarray
    angle: np.ndarray
    response: np.ndarray
    desc: np.ndarray
    valid: np.ndarray
    ur: np.ndarray
    depth: np.ndarray


@dataclasses.dataclass
class Frame:
    """One processed input frame. Device arrays for kernels, numpy for
    host bookkeeping."""
    frame_id: int
    timestamp: float
    kp: Keypoints            # xy = undistorted level-0 coords
    ur: jax.Array            # [N] virtual right-image u (<0: mono / no depth)
    depth: jax.Array         # [N] keypoint depth (<0: unknown)
    tcw: np.ndarray          # [4, 4] float32 pose estimate (world->cam)
    pt_ids: np.ndarray       # [N] int32 map-point id per keypoint (-1 = none)
    is_outlier: np.ndarray   # [N] bool pose-opt outlier flag
    _host: Optional[HostKeypoints] = None
    _host_depth: Optional[tuple] = None

    @property
    def n(self) -> int:
        return self.kp.n

    def host_depth_ur(self):
        """-> (depth [N], ur [N]) numpy, one cached round trip (the
        per-frame keyframe decision reads depth, Tracking.cc:1229-1247)."""
        if self._host is not None:
            return self._host.depth, self._host.ur
        if self._host_depth is None:
            self._host_depth = jax.device_get((self.depth, self.ur))
        return self._host_depth

    def host_kp(self) -> HostKeypoints:
        """Full keypoint fetch (keyframe creation / init / reloc), one
        cached round trip."""
        if self._host is None:
            xy, octv, ang, resp, desc, val, ur, depth = jax.device_get(
                (self.kp.xy, self.kp.octave, self.kp.angle,
                 self.kp.response, self.kp.desc, self.kp.valid,
                 self.ur, self.depth))
            self._host = HostKeypoints(xy=xy, octave=octv, angle=ang,
                                       response=resp, desc=desc, valid=val,
                                       ur=ur, depth=depth)
        return self._host


def _rgbd_build(extractor: ORBExtractor, cam: PinholeCamera, gray, depth_img):
    """Traceable RGB-D frame build: ORB extraction, keypoint undistortion,
    depth sampling, and virtual-right synthesis uR = u - bf/d
    (Frame::UndistortKeyPoints + ComputeStereoFromRGBD,
    /root/reference/src/Frame.cc:470-515, 754-775). Shared by the
    standalone frame program and the fused whole-frame tracking program
    (frontend/kernels.fused_frame_step)."""
    kp = extractor(gray)
    und_xy = cam.undistort_points(kp.xy)
    # depth lookup at raw (distorted) keypoint coords
    xs = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0,
                  cam.width - 1)
    ys = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0,
                  cam.height - 1)
    d = depth_img[ys, xs]
    has_depth = (d > 0) & kp.valid
    ur = jnp.where(has_depth,
                   und_xy[:, 0] - cam.bf / jnp.where(d > 0, d, 1.0), -1.0)
    kp = Keypoints(
        xy=und_xy, response=kp.response, angle=kp.angle,
        octave=kp.octave, size=kp.size, desc=kp.desc, valid=kp.valid)
    return kp, ur, jnp.where(has_depth, d, -1.0)


@functools.lru_cache(maxsize=8)
def _rgbd_program(extractor: ORBExtractor, cam: PinholeCamera):
    """One jitted _rgbd_build per (extractor, camera) — a single device
    dispatch per RGB-D frame."""
    def run(gray, depth_img):
        return _rgbd_build(extractor, cam, gray, depth_img)
    return jax.jit(run)


def build_frame_rgbd(
    frame_id: int,
    timestamp: float,
    gray: np.ndarray,
    depth_img: np.ndarray,
    extractor: ORBExtractor,
    cam: PinholeCamera,
    extract_fn=None,
) -> Frame:
    """RGB-D frame via the fused single-dispatch program (_rgbd_program)."""
    kp, ur, depth = _rgbd_program(extractor, cam)(
        jnp.asarray(gray, dtype=jnp.float32),
        jnp.asarray(depth_img, dtype=jnp.float32))
    n = kp.n
    return Frame(
        frame_id=frame_id,
        timestamp=timestamp,
        kp=kp,
        ur=ur,
        depth=depth,
        tcw=np.eye(4, dtype=np.float32),
        pt_ids=np.full(n, -1, np.int32),
        is_outlier=np.zeros(n, bool),
    )


def _stereo_build(extractor: ORBExtractor, cam: PinholeCamera,
                  scale_factor: float, gl, gr):
    """Traceable stereo frame build: extract both images, reuse the shared
    blurred pyramids for SAD sub-pixel stereo matching, and undistort (the
    reference runs two extraction std::threads + a scalar matching loop,
    Frame.cc:82-85, 577-751). -> (kp with undistorted xy, ur, depth)."""
    from orbslam2_tpu.ops.stereo import match_stereo
    n_levels = extractor.config.n_levels
    kp_l, pyr_l = extractor.extract_with_pyramid(gl)
    kp_r, pyr_r = extractor.extract_with_pyramid(gr)
    ur, depth = match_stereo(kp_l, kp_r, pyr_l, pyr_r, cam,
                             scale_factor, n_levels,
                             level_budgets=tuple(extractor.level_budgets))
    und_xy = cam.undistort_points(kp_l.xy)
    kp = Keypoints(
        xy=und_xy, response=kp_l.response, angle=kp_l.angle,
        octave=kp_l.octave, size=kp_l.size, desc=kp_l.desc, valid=kp_l.valid)
    return kp, ur, depth


@functools.lru_cache(maxsize=8)
def _stereo_program(extractor: ORBExtractor, cam: PinholeCamera,
                    scale_factor: float):
    """One jitted _stereo_build per (extractor, camera) — a single device
    dispatch per stereo frame."""
    def run(gl, gr):
        kp, ur, depth = _stereo_build(extractor, cam, scale_factor, gl, gr)
        return kp, kp.xy, ur, depth

    import jax as _jax
    return _jax.jit(run)


def build_frame_stereo(
    frame_id: int,
    timestamp: float,
    gray_left: np.ndarray,
    gray_right: np.ndarray,
    extractor: ORBExtractor,
    cam: PinholeCamera,
    extract_fn=None,
    scale_factor: float = 1.2,
) -> Frame:
    """Stereo frame: fused extract(L) + extract(R) + left-right matching +
    undistortion in one compiled program; the SAD refinement reads the
    extractor's own blurred pyramids (no rebuild)."""
    gl = jnp.asarray(gray_left, dtype=jnp.float32)
    gr = jnp.asarray(gray_right, dtype=jnp.float32)
    kp, _, ur, depth = _stereo_program(extractor, cam, scale_factor)(gl, gr)
    n = kp.n
    return Frame(
        frame_id=frame_id,
        timestamp=timestamp,
        kp=kp,
        ur=ur,
        depth=depth,
        tcw=np.eye(4, dtype=np.float32),
        pt_ids=np.full(n, -1, np.int32),
        is_outlier=np.zeros(n, bool),
    )


def _mono_build(extractor: ORBExtractor, cam: PinholeCamera, gray):
    """Traceable mono frame build: extraction + undistortion."""
    kp = extractor(gray)
    und_xy = cam.undistort_points(kp.xy)
    return Keypoints(
        xy=und_xy, response=kp.response, angle=kp.angle,
        octave=kp.octave, size=kp.size, desc=kp.desc, valid=kp.valid)


@functools.lru_cache(maxsize=8)
def _mono_program(extractor: ORBExtractor, cam: PinholeCamera):
    """Fused extraction + undistortion (one dispatch per mono frame)."""
    def run(gray):
        return _mono_build(extractor, cam, gray)
    return jax.jit(run)


def build_frame_mono(
    frame_id: int,
    timestamp: float,
    gray: np.ndarray,
    extractor: ORBExtractor,
    cam: PinholeCamera,
    extract_fn=None,
) -> Frame:
    kp = _mono_program(extractor, cam)(jnp.asarray(gray, dtype=jnp.float32))
    n = kp.n
    neg = jnp.full((n,), -1.0)
    return Frame(
        frame_id=frame_id, timestamp=timestamp, kp=kp, ur=neg, depth=neg,
        tcw=np.eye(4, dtype=np.float32),
        pt_ids=np.full(n, -1, np.int32),
        is_outlier=np.zeros(n, bool),
    )
