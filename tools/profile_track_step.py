"""Per-component timing of the fused tracking step on the real TPU:
extraction vs local-map search vs pose optimization."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.backend import pose_opt
from orbslam2_tpu.frontend import kernels
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.ops.orb import ORBConfig, ORBExtractor


def timed(run, reps=4):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    local_cap = 4096
    cam = PinholeCamera(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                        width=640, height=480, bf=40.0)
    cfg = ORBConfig(n_features=2000, n_levels=8)
    ex = ORBExtractor(cfg, (480, 640))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
    tcw0 = jnp.eye(4, dtype=jnp.float32)
    pt_pos = jnp.asarray(rng.uniform(-3, 3, (local_cap, 3)).astype(np.float32) + [0, 0, 6])
    pt_desc = jnp.asarray(rng.integers(0, 2 ** 32, (local_cap, 8), dtype=np.uint32))
    pt_valid = jnp.ones((local_cap,), bool)
    pt_normal = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (local_cap, 1))
    pt_min = jnp.full((local_cap,), 0.5)
    pt_max = jnp.full((local_cap,), 50.0)

    kp0 = jax.jit(ex.__call__)(image)
    kp0 = jax.tree_util.tree_map(lambda x: np.asarray(x), kp0)
    kp0 = jax.tree_util.tree_map(jnp.asarray, kp0)

    M = 32

    def scanned(fn):
        @jax.jit
        def run(x):
            def body(c, _):
                out = fn(x + c * 1e-20)
                return c + out * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=M)
            return c
        return run

    def s_extract(x):
        kp = ex(x)
        return jnp.sum(kp.xy) + jnp.sum(kp.desc).astype(jnp.float32) * 1e-9

    def s_search(x):
        # carry-dependent descriptor bits (zero at runtime, opaque to XLA)
        # so the Hamming matmul cannot be hoisted out of the scan
        tweak = (jnp.abs(x[0, 0]) * 1e-30).astype(jnp.uint32)
        kp = kp0.replace(desc=kp0.desc ^ tweak)
        info, res = kernels.search_local_points.__wrapped__(
            tcw0, pt_pos + x[0, 0] * 1e-20, pt_desc ^ tweak, pt_valid, pt_normal,
            pt_min, pt_max, kp, jnp.zeros((kp.n,), bool), 1.0, cam,
            cfg.scale_factor, cfg.n_levels, 100)
        return jnp.sum(res.assoc).astype(jnp.float32) + jnp.sum(info.uv) * 1e-9

    def s_pose_opt(x):
        kp = kp0
        matched = jnp.arange(kp.n) % 2 == 0
        pos = pt_pos[jnp.arange(kp.n) % local_cap] + x[0, 0] * 1e-20
        obs = kernels.build_pose_obs_from_frame(
            kp, jnp.full((kp.n,), -1.0), pos, matched, cfg.scale_factor)
        tcw, inlier, n_in = pose_opt.pose_optimization.__wrapped__(tcw0, obs, cam)
        return jnp.sum(tcw) + n_in.astype(jnp.float32) * 1e-9

    @jax.jit
    def trivial(x):
        return x + 1.0

    z = jax.device_put(jnp.float32(0.0))
    np.asarray(trivial(z))
    t_fixed = timed(lambda: np.asarray(trivial(z)))
    print(f"fixed dispatch: {t_fixed*1e3:.1f} ms", flush=True)
    for name, fn in [("extract", s_extract), ("local_search", s_search),
                     ("pose_opt", s_pose_opt)]:
        prog = scanned(fn)
        t0 = time.perf_counter()
        np.asarray(prog(image))
        tc = time.perf_counter() - t0
        t = timed(lambda p=prog: np.asarray(p(image)))
        print(f"{name:14s} {(t - t_fixed) / M * 1e3:8.2f} ms/frame"
              f"  (compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
