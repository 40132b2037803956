"""Trajectory export in TUM and KITTI formats.

Mirrors System::SaveTrajectoryTUM / SaveKeyFrameTrajectoryTUM /
SaveTrajectoryKITTI (/root/reference/src/System.cc:353-506): TUM rows are
`timestamp tx ty tz qx qy qz qw` of the camera-to-world pose; KITTI rows are
the row-major 3x4 camera-to-world matrix.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orbslam2_tpu.geometry import se3


def save_tum(path: str, timestamps: np.ndarray, twc: np.ndarray) -> None:
    q = np.asarray(se3.to_quaternion(jnp.asarray(twc[:, :3, :3])))
    t = twc[:, :3, 3]
    with open(path, "w") as f:
        for i in range(len(timestamps)):
            f.write(
                f"{timestamps[i]:.6f} {t[i,0]:.7f} {t[i,1]:.7f} {t[i,2]:.7f} "
                f"{q[i,0]:.7f} {q[i,1]:.7f} {q[i,2]:.7f} {q[i,3]:.7f}\n"
            )


def save_kitti(path: str, twc: np.ndarray) -> None:
    with open(path, "w") as f:
        for m in twc:
            row = m[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in row) + "\n")


def load_tum(path: str):
    data = np.loadtxt(path)
    ts = data[:, 0]
    t = data[:, 1:4]
    q = data[:, 4:8]
    r = np.asarray(se3.from_quaternion(jnp.asarray(q.astype(np.float32))))
    twc = np.tile(np.eye(4, dtype=np.float32), (len(ts), 1, 1))
    twc[:, :3, :3] = r
    twc[:, :3, 3] = t
    return ts, twc
