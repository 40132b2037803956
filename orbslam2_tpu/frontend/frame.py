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

    @property
    def n(self) -> int:
        return self.kp.n


def build_frame_rgbd(
    frame_id: int,
    timestamp: float,
    gray: np.ndarray,
    depth_img: np.ndarray,
    extractor: ORBExtractor,
    cam: PinholeCamera,
    extract_fn=None,
) -> Frame:
    """RGB-D frame: extract ORB, undistort, sample depth at keypoints and
    synthesize virtual right coords uR = u - bf/d
    (reference: Frame::ComputeStereoFromRGBD /root/reference/src/Frame.cc:754-775).
    """
    fn = extract_fn if extract_fn is not None else extractor
    kp = fn(jnp.asarray(gray, dtype=jnp.float32))
    und_xy = cam.undistort_points(kp.xy)
    # depth lookup at raw (distorted) keypoint coords
    xs = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, gray.shape[1] - 1)
    ys = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, gray.shape[0] - 1)
    d = jnp.asarray(depth_img)[ys, xs]
    has_depth = (d > 0) & kp.valid
    ur = jnp.where(has_depth, und_xy[:, 0] - cam.bf / jnp.where(d > 0, d, 1.0), -1.0)
    kp = Keypoints(
        xy=und_xy, response=kp.response, angle=kp.angle, octave=kp.octave,
        size=kp.size, desc=kp.desc, valid=kp.valid,
    )
    n = kp.n
    return Frame(
        frame_id=frame_id,
        timestamp=timestamp,
        kp=kp,
        ur=ur,
        depth=jnp.where(has_depth, d, -1.0),
        tcw=np.eye(4, dtype=np.float32),
        pt_ids=np.full(n, -1, np.int32),
        is_outlier=np.zeros(n, bool),
    )


@functools.lru_cache(maxsize=8)
def _stereo_program(extractor: ORBExtractor, cam: PinholeCamera,
                    scale_factor: float):
    """One fused jitted program per (extractor, camera): extract both
    images, reuse the shared blurred pyramids for SAD sub-pixel stereo
    matching, and undistort — a single device dispatch per stereo frame
    (the reference runs two extraction std::threads + a scalar matching
    loop, Frame.cc:82-85, 577-751)."""
    n_levels = extractor.config.n_levels

    def run(gl, gr):
        from orbslam2_tpu.ops.stereo import match_stereo
        kp_l, pyr_l = extractor.extract_with_pyramid(gl)
        kp_r, pyr_r = extractor.extract_with_pyramid(gr)
        ur, depth = match_stereo(kp_l, kp_r, pyr_l, pyr_r, cam,
                                 scale_factor, n_levels)
        und_xy = cam.undistort_points(kp_l.xy)
        return kp_l, und_xy, ur, depth

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
    kp_l, und_xy, ur, depth = _stereo_program(extractor, cam, scale_factor)(gl, gr)
    kp = Keypoints(
        xy=und_xy, response=kp_l.response, angle=kp_l.angle, octave=kp_l.octave,
        size=kp_l.size, desc=kp_l.desc, valid=kp_l.valid,
    )
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


def build_frame_mono(
    frame_id: int,
    timestamp: float,
    gray: np.ndarray,
    extractor: ORBExtractor,
    cam: PinholeCamera,
    extract_fn=None,
) -> Frame:
    fn = extract_fn if extract_fn is not None else extractor
    kp = fn(jnp.asarray(gray, dtype=jnp.float32))
    und_xy = cam.undistort_points(kp.xy)
    kp = Keypoints(
        xy=und_xy, response=kp.response, angle=kp.angle, octave=kp.octave,
        size=kp.size, desc=kp.desc, valid=kp.valid,
    )
    n = kp.n
    neg = jnp.full((n,), -1.0)
    return Frame(
        frame_id=frame_id, timestamp=timestamp, kp=kp, ur=neg, depth=neg,
        tcw=np.eye(4, dtype=np.float32),
        pt_ids=np.full(n, -1, np.int32),
        is_outlier=np.zeros(n, bool),
    )
