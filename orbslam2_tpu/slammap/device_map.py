"""Device-resident mirror of the map-point arrays the tracker reads
per frame.

The reference tracker walks pointer graphs under a mutex each frame
(Tracking::SearchLocalPoints, /root/reference/src/Tracking.cc:1403). The
array-map equivalent used to re-stage ~250 KB of gathered point rows from
host to device every frame; this mirror keeps the full point SoA resident
in device memory and uploads only rows dirtied by mapping events (adds,
culls, BA updates), so per-frame traffic drops to the local-point id list
(a few KB). Bulk rewrites (loop correction, global BA) fall back to one
full upload.

MapState records dirtiness via mark_pts_dirty / mark_all_pts_dirty at every
point-array write site; sync() consumes it under the caller's map lock.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

FIELDS = ("pt_pos", "pt_desc", "pt_valid", "pt_normal",
          "pt_min_dist", "pt_max_dist")

_PT_BUCKETS = (64, 256, 1024, 4096, 16384, 65536)
_KF_BUCKETS = (1, 2, 4, 8, 32, 128, 512, 2048)


@jax.jit
def _scatter_rows(arrays: dict, idx: jax.Array, rows: dict) -> dict:
    """One device dispatch updating every field's dirty rows (per-field
    .at[].set calls are ~6-13 separate dispatches; through a high-latency
    link each dispatch costs a full round trip)."""
    return {f: arrays[f].at[idx].set(rows[f]) for f in arrays}


def _pad_bucket(ids: np.ndarray, buckets=_PT_BUCKETS) -> np.ndarray:
    """Pad a dirty-row id list to a fixed bucket size so the scatter-update
    program compiles once per bucket, not once per distinct count (every
    mapping event produces a different number of dirty rows; an unpadded
    .at[idx].set would recompile each time — tens of seconds per compile on
    a remote compiler). Padding repeats the first id: duplicate scatter
    indices writing identical rows are deterministic."""
    n = len(ids)
    b = next((b for b in buckets if n <= b), n)
    out = np.full(b, ids[0] if n else 0, ids.dtype)
    out[:n] = ids
    return out


class DeviceMapMirror:
    def __init__(self):
        self.gen = -1
        self.arrays: Optional[dict] = None
        self.n_full_uploads = 0
        self.n_row_uploads = 0

    def sync(self, m) -> None:
        """Bring the mirror up to date with the host MapState. Call with
        the map lock held (the tracker holds it for the whole frame)."""
        if m.pt_dirty_gen == self.gen and self.arrays is not None:
            return
        dirty_all, dirty_ids = m.consume_pt_dirty()
        if self.arrays is None or dirty_all:
            self.arrays = {f: jnp.asarray(getattr(m, f)) for f in FIELDS}
            self.n_full_uploads += 1
        elif len(dirty_ids):
            padded = _pad_bucket(dirty_ids)
            idx = jnp.asarray(padded, jnp.int32)
            rows = {f: jnp.asarray(getattr(m, f)[padded]) for f in FIELDS}
            self.arrays = _scatter_rows(self.arrays, idx, rows)
            self.n_row_uploads += 1
        self.gen = m.pt_dirty_gen

    def __getattr__(self, name):
        arrays = self.__dict__.get("arrays")
        if arrays is not None and name in FIELDS:
            return arrays[name]
        raise AttributeError(name)


KF_FIELDS = ("kf_kp_xy", "kf_kp_desc", "kf_kp_octave", "kf_kp_angle",
             "kf_kp_valid", "kf_kp_ur", "kf_kp_depth")


class DeviceKFStore:
    """Device-resident keyframe feature arrays + poses.

    The mapping stages (triangulation against ~10 neighbors, fusion into
    ~20 targets, loop-neighborhood projection) read whole keyframes'
    keypoint arrays. Staging them from host per call is ~130 KB x targets
    per keyframe event; keeping the store resident means each keyframe row
    is uploaded exactly ONCE at insertion (the reference's KeyFrame feature
    arrays are likewise immutable, KeyFrame.h:120-189) and batched kernels
    gather rows on device. Poses are mutable (BA/loop corrections) and tiny
    — re-uploaded wholesale per sync."""

    def __init__(self):
        self.gen = -1
        self.arrays = None
        self.pose = None          # [K, 4, 4] device
        self._pose_host_id = None
        self.n_row_uploads = 0

    def sync(self, m) -> None:
        """Call with the map lock held."""
        if self.arrays is None:
            dirty_all, dirty_ids = m.consume_kf_dirty()
            self.arrays = {f: jnp.asarray(getattr(m, f)) for f in KF_FIELDS}
        elif m.kf_dirty_gen != self.gen:
            dirty_all, dirty_ids = m.consume_kf_dirty()
            if dirty_all:
                self.arrays = {f: jnp.asarray(getattr(m, f))
                               for f in KF_FIELDS}
            elif len(dirty_ids):
                padded = _pad_bucket(dirty_ids, _KF_BUCKETS)
                idx = jnp.asarray(padded, jnp.int32)
                rows = {f: jnp.asarray(getattr(m, f)[padded])
                        for f in KF_FIELDS}
                self.arrays = _scatter_rows(self.arrays, idx, rows)
                self.n_row_uploads += 1
        self.gen = m.kf_dirty_gen
        # poses: cheap full upload each sync (e.g. [1536, 4, 4] = 96 KB)
        self.pose = jnp.asarray(m.kf_pose)

    def keypoints_of(self, rows) -> "object":
        """Device-side Keypoints view of gathered keyframe rows ([T] or
        scalar index arrays) for vmapped kernels."""
        from orbslam2_tpu.ops.orb import Keypoints
        a = self.arrays
        return Keypoints(
            xy=a["kf_kp_xy"][rows], response=jnp.zeros(()),
            angle=a["kf_kp_angle"][rows], octave=a["kf_kp_octave"][rows],
            size=jnp.zeros(()), desc=a["kf_kp_desc"][rows],
            valid=a["kf_kp_valid"][rows])
