"""Does pose_optimization latency scale with observation capacity N?
Times the 4-round LM chain at several N on the real TPU (scan-slope).

Usage: python tools/ab_pose_opt_n.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.backend import pose_opt
from orbslam2_tpu.geometry.camera import PinholeCamera


def timed(run, reps=4):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cam = PinholeCamera(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                        width=640, height=480, bf=40.0)
    M = 16
    rng = np.random.default_rng(0)

    @jax.jit
    def trivial(x):
        return x + 1.0

    z = jax.device_put(jnp.float32(0.0))
    np.asarray(trivial(z))
    t_fixed = timed(lambda: trivial(z))
    print(f"fixed dispatch: {t_fixed*1e3:.1f} ms", flush=True)

    for n in (512, 1024, 2048):
        pts = rng.uniform(-3, 3, (n, 3)).astype(np.float32) + [0, 0, 6]
        tcw_true = np.eye(4, dtype=np.float32)
        tcw_true[:3, 3] = [0.05, -0.03, 0.02]
        pc = pts @ tcw_true[:3, :3].T + tcw_true[:3, 3]
        uv = np.stack([520.0 * pc[:, 0] / pc[:, 2] + 320.0,
                       520.0 * pc[:, 1] / pc[:, 2] + 240.0,
                       -np.ones(n)], axis=1).astype(np.float32)
        uv[:, :2] += rng.normal(0, 0.5, (n, 2))
        valid = rng.uniform(size=n) < 0.3  # realistic match rate
        obs = pose_opt.PoseObs(
            pts_w=jax.device_put(jnp.asarray(pts)),
            uv=jax.device_put(jnp.asarray(uv)),
            inv_sigma2=jax.device_put(jnp.ones((n,), jnp.float32)),
            is_stereo=jax.device_put(jnp.zeros((n,), bool)),
            valid=jax.device_put(jnp.asarray(valid)),
        )
        tcw0 = jax.device_put(jnp.eye(4, dtype=jnp.float32))

        @jax.jit
        def run(t0_, o):
            def body(c, _):
                tcw, _, n_in = pose_opt.pose_optimization.__wrapped__(
                    t0_ + c * 1e-20, o, cam)
                return c + tcw[0, 3] * 1e-20 + n_in * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=M)
            return c

        np.asarray(run(tcw0, obs))
        t = timed(lambda: run(tcw0, obs))
        print(f"N={n:5d}: {(t - t_fixed) / M * 1e3:6.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
