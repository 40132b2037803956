"""Data-parallel multi-camera tracking over a device mesh.

The reference is strictly one camera per process. For production serving —
fleets of robots / multi-camera rigs streaming frames to a TPU pod — the
latency-critical per-frame step (ORB extraction -> local-map projection
matching -> robust pose LM) is embarrassingly parallel across camera
sessions: every session has its own image and its own local-map slice, all
with identical static shapes.

This module shards a batch of B sessions over the mesh with shard_map:
each device runs vmap(track_step) over its local B/n sessions. No
collectives are needed in the step itself (pure data parallelism; the
distributed BA in parallel/dist_ba.py is the collective workload), so
scaling is linear by construction and the mesh axis can ride either ICI or
DCN.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from orbslam2_tpu.backend import pose_opt
from orbslam2_tpu.frontend import kernels
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.ops.orb import ORBConfig, ORBExtractor
from orbslam2_tpu.parallel.mesh import OBS_AXIS


def make_multi_camera_step(cam: PinholeCamera, orb_cfg: ORBConfig,
                           local_cap: int, mesh: Mesh):
    """-> jitted fn(images [B,H,W], tcw0 [B,4,4], pt_pos [B,C,3],
    pt_desc [B,C,8], pt_valid [B,C], pt_normal [B,C,3], pt_min [B,C],
    pt_max [B,C]) -> (tcw [B,4,4], n_inliers [B]).

    B must be a multiple of the mesh size; sessions are sharded over the
    mesh's observation axis and tracked independently per device.
    """
    extractor = ORBExtractor(orb_cfg, (cam.height, cam.width))

    def track_step(image, tcw0, pt_pos, pt_desc, pt_valid, pt_normal,
                   pt_min_dist, pt_max_dist):
        kp = extractor(image)
        info, res = kernels.search_local_points.__wrapped__(
            tcw0, pt_pos, pt_desc, pt_valid, pt_normal, pt_min_dist,
            pt_max_dist, kp, jnp.zeros((kp.n,), bool), 1.0, cam,
            orb_cfg.scale_factor, orb_cfg.n_levels, 100)
        matched = res.assoc >= 0
        pos = pt_pos[jnp.clip(res.assoc, 0, local_cap - 1)]
        obs = kernels.build_pose_obs_from_frame(
            kp, jnp.full((kp.n,), -1.0), pos, matched, orb_cfg.scale_factor)
        tcw, inlier, n_in = pose_opt.pose_optimization.__wrapped__(
            tcw0, obs, cam)
        return tcw, n_in

    shd = P(OBS_AXIS)
    batched = shard_map(
        jax.vmap(track_step), mesh=mesh,
        in_specs=(shd,) * 8, out_specs=(shd, shd), check_vma=False)
    return jax.jit(batched)
