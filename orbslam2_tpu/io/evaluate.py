"""Trajectory evaluation: ATE (absolute) and RPE (relative) errors.

Equivalent of the TUM benchmark evaluation scripts the reference README
points users to (README.md §6); built in so tests/bench can assert accuracy
against ground truth directly.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = False
                      ) -> Tuple[float, np.ndarray, np.ndarray]:
    """Least-squares similarity aligning src -> dst ([N, 3] each).
    -> (s, R, t) with dst ~= s * R @ src + t."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    u, d, vt = np.linalg.svd(cov)
    s_mat = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s_mat[2, 2] = -1
    r = u @ s_mat @ vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        scale = np.trace(np.diag(d) @ s_mat) / var_s
    else:
        scale = 1.0
    t = mu_d - scale * r @ mu_s
    return float(scale), r, t


def ate_rmse(est_twc: np.ndarray, gt_twc: np.ndarray, with_scale: bool = False) -> float:
    """Absolute trajectory error RMSE after alignment.

    est_twc, gt_twc: [N, 4, 4] camera-to-world poses (paired by index).
    with_scale=True for monocular (Sim3 alignment), False for stereo/RGB-D.
    """
    p_est = est_twc[:, :3, 3]
    p_gt = gt_twc[:, :3, 3]
    s, r, t = umeyama_alignment(p_est, p_gt, with_scale)
    aligned = (s * (r @ p_est.T)).T + t
    err = np.linalg.norm(aligned - p_gt, axis=1)
    return float(np.sqrt((err ** 2).mean()))


def rpe(est_twc: np.ndarray, gt_twc: np.ndarray, delta: int = 1) -> Tuple[float, float]:
    """Relative pose error over frame gaps of `delta`.
    -> (trans RMSE per step, rot RMSE radians per step)."""
    t_errs, r_errs = [], []
    for i in range(len(est_twc) - delta):
        de = np.linalg.inv(est_twc[i]) @ est_twc[i + delta]
        dg = np.linalg.inv(gt_twc[i]) @ gt_twc[i + delta]
        err = np.linalg.inv(dg) @ de
        t_errs.append(np.linalg.norm(err[:3, 3]))
        cos = np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1)
        r_errs.append(np.arccos(cos))
    return float(np.sqrt(np.mean(np.square(t_errs)))), float(np.sqrt(np.mean(np.square(r_errs))))
