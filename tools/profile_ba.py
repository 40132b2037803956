"""TPU timing of the mapping-side optimizers: local BA (dense Schur) and
global BA (PCG) at production problem sizes."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.backend import ba
from orbslam2_tpu.backend.ba import BAProblem
from orbslam2_tpu.geometry import se3
from orbslam2_tpu.geometry.camera import PinholeCamera

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0)


def make_problem(n_cams, n_pts, n_obs, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-6, 6, (n_pts, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(6, 18, n_pts)
    poses = np.stack([np.asarray(se3.exp(jnp.asarray(
        (rng.normal(size=6) * 0.05).astype(np.float32)))) for _ in range(n_cams)])
    o_cam = rng.integers(0, n_cams, n_obs).astype(np.int32)
    o_pt = rng.integers(0, n_pts, n_obs).astype(np.int32)
    pc = np.einsum("nij,nj->ni", poses[o_cam][:, :3, :3], pts[o_pt]) \
        + poses[o_cam][:, :3, 3]
    uv = np.stack([500.0 * pc[:, 0] / pc[:, 2] + 320.0,
                   500.0 * pc[:, 1] / pc[:, 2] + 240.0,
                   -np.ones(n_obs)], 1).astype(np.float32)
    uv[:, :2] += rng.normal(size=(n_obs, 2)).astype(np.float32)
    cam_fixed = np.zeros(n_cams, bool)
    cam_fixed[0] = True
    return BAProblem(
        poses=jnp.asarray(poses), points=jnp.asarray(pts + rng.normal(size=pts.shape).astype(np.float32) * 0.02),
        cam_fixed=jnp.asarray(cam_fixed),
        obs_cam=jnp.asarray(o_cam), obs_pt=jnp.asarray(o_pt),
        obs_uv=jnp.asarray(uv), obs_inv_sigma2=jnp.ones(n_obs),
        obs_stereo=jnp.zeros(n_obs, bool), obs_valid=jnp.ones(n_obs, bool))


def timed(run, reps=4):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    @jax.jit
    def trivial(x):
        return x + 1.0
    z = jax.device_put(jnp.float32(0.0))
    np.asarray(trivial(z))
    t_fixed = timed(lambda: np.asarray(trivial(z)))
    print(f"fixed dispatch: {t_fixed*1e3:.1f} ms", flush=True)

    # local BA at the mapper's caps (local window ~20 KFs)
    prob = make_problem(24, 4096, 12288)
    t0 = time.perf_counter()
    r = ba.bundle_adjust(prob, CAM)
    np.asarray(r.poses)
    tc = time.perf_counter() - t0
    t = timed(lambda: np.asarray(ba.bundle_adjust(prob, CAM).poses)) - t_fixed
    print(f"local BA (24 KF, 4k pts, 12k obs): {t*1e3:8.1f} ms  (compile {tc:.0f}s)",
          flush=True)

    # global BA (PCG) at a mid-size map
    prob_g = make_problem(256, 16384, 65536)
    t0 = time.perf_counter()
    r = ba.bundle_adjust_pcg(prob_g, CAM, phase_iters=(5, 5))
    np.asarray(r.poses)
    tc = time.perf_counter() - t0
    t = timed(lambda: np.asarray(ba.bundle_adjust_pcg(
        prob_g, CAM, phase_iters=(5, 5)).poses)) - t_fixed
    print(f"global PCG BA (256 KF, 16k pts, 64k obs): {t*1e3:8.1f} ms  "
          f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
