"""Serving throughput: B concurrent camera sessions on ONE chip.

The reference is one camera per process per machine. For serving (fleets
of robots streaming to a TPU), the per-frame tracking step is batched with
vmap over sessions on a single chip (parallel/multi_session.py handles the
multi-chip mesh case; this measures the per-chip batching win).

Methodology: one device program scans M frames per session (host round
trips amortized, bench.py slope method); aggregate fps = B * M / slope.
Run on the TPU: `python tools/bench_multi_session.py [reps]`.
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
from orbslam2_tpu.frontend import kernels
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.ops.orb import ORBConfig, ORBExtractor

CAM = PinholeCamera(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                    width=640, height=480, bf=40.0)
LOCAL_CAP = 2048


def make_session_step(orb_cfg):
    extractor = ORBExtractor(orb_cfg, (CAM.height, CAM.width))

    def track_step(image, tcw0, pt_pos, pt_desc, pt_valid, pt_normal,
                   pt_min, pt_max):
        kp = extractor(image)
        info, res = kernels.search_local_points.__wrapped__(
            tcw0, pt_pos, pt_desc, pt_valid, pt_normal, pt_min, pt_max,
            kp, jnp.zeros((kp.n,), bool), 1.0, CAM,
            orb_cfg.scale_factor, orb_cfg.n_levels, 100)
        matched = res.assoc >= 0
        pos = pt_pos[jnp.clip(res.assoc, 0, LOCAL_CAP - 1)]
        obs = kernels.build_pose_obs_from_frame(
            kp, jnp.full((kp.n,), -1.0), pos, matched, orb_cfg.scale_factor)
        tcw, inlier, n_in = pose_opt.pose_optimization.__wrapped__(
            tcw0, obs, CAM)
        return tcw, n_in

    return track_step


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    orb_cfg = ORBConfig(n_features=2000, n_levels=8)
    step = make_session_step(orb_cfg)
    rng = np.random.default_rng(0)
    m = 8  # frames per session per program

    def run_b(b):
        imgs = jnp.asarray(rng.uniform(0, 255, (m, b, 480, 640))
                           .astype(np.float32))
        tcw0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
        pt_pos = jnp.asarray(
            rng.uniform(-3, 3, (b, LOCAL_CAP, 3)).astype(np.float32)
            + np.array([0, 0, 6], np.float32))
        pt_desc = jnp.asarray(rng.integers(
            0, 2 ** 32, (b, LOCAL_CAP, 8), dtype=np.uint32))
        pt_valid = jnp.ones((b, LOCAL_CAP), bool)
        pt_normal = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (b, LOCAL_CAP, 1))
        pt_min = jnp.full((b, LOCAL_CAP), 0.5)
        pt_max = jnp.full((b, LOCAL_CAP), 50.0)
        vstep = jax.vmap(step)

        @jax.jit
        def scan_fn(images, tcw):
            def body(carry, img):
                tcw_c, acc = carry
                tcw_n, n_in = vstep(img, tcw_c, pt_pos, pt_desc, pt_valid,
                                    pt_normal, pt_min, pt_max)
                return (tcw_n, acc + n_in.sum()), ()
            (tcw_f, total), _ = jax.lax.scan(body, (tcw, jnp.int32(0)),
                                             images)
            return total, tcw_f

        @jax.jit
        def trivial(x):
            return x + 1.0

        z = jnp.float32(0.0)
        np.asarray(trivial(z))
        np.asarray(scan_fn(imgs, tcw0)[0])  # compile

        def timed(run):
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(run())
                best = min(best, time.perf_counter() - t0)
            return best

        t_fixed = timed(lambda: trivial(z))
        t_total = timed(lambda: scan_fn(imgs, tcw0)[0])
        per_program = max(t_total - t_fixed, 1e-9)
        return b * m / per_program, per_program / m * 1e3

    out = {}
    for b in (1, 2, 4, 8):
        fps, ms_per_batch_frame = run_b(b)
        out[f"b{b}"] = {"agg_fps": round(fps, 1),
                        "ms_per_step": round(ms_per_batch_frame, 2)}
        print(f"B={b}: {fps:8.1f} aggregate frames/s "
              f"({ms_per_batch_frame:.2f} ms per batched step)", flush=True)
    import json
    print(json.dumps({"multi_session_serving": out}))


if __name__ == "__main__":
    main()
