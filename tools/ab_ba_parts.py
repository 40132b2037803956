"""Bisect the dense local-BA LM step cost on the real TPU.

Times: residual/jacobian build, block assembly (scatter-adds), the
[K,P,6,3] coupling scatter alone, the Schur reduction einsums, the dense
[6K,6K] solve, and the cost evaluation.

Usage: python tools/ab_ba_parts.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.backend import ba
from orbslam2_tpu.geometry.camera import PinholeCamera

sys.path.insert(0, os.path.dirname(__file__))
from profile_ba import make_problem  # noqa: E402

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0)


def timed(run, reps=4):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    prob = make_problem(24, 4096, 12288)
    prob = jax.tree_util.tree_map(jax.device_put, prob)
    k, p = 24, 4096
    M = 8
    use_huber = jnp.bool_(True)
    active = prob.obs_valid

    def scanned(fn):
        @jax.jit
        def run(pr):
            def body(c, _):
                out = fn(pr._replace(points=pr.points + c * 1e-20))
                return c + out * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=M)
            return c
        return run

    def s_resjac(pr):
        e, jc, jp, z = ba._residuals_jacobians(pr, CAM)
        return jnp.sum(e) + jnp.sum(jc) + jnp.sum(jp) + jnp.sum(z)

    def s_blocks(pr):
        h_cc, h_pp, b_c, b_p, w_cp, cost = ba._build_blocks(pr, CAM, active, use_huber)
        return (jnp.sum(h_cc) + jnp.sum(h_pp) + jnp.sum(b_c) + jnp.sum(b_p)
                + jnp.sum(w_cp) + cost)

    def s_blocks_nowcp(pr):
        e, jc, jp, z = ba._residuals_jacobians(pr, CAM)
        w, cost_o = ba._robust_weights(e, pr, use_huber)
        w = jnp.where(active & (z > 1e-6), w, 0.0)
        jc_w = jc * w[:, None, None]
        h_cc = jnp.zeros((k, 6, 6)).at[pr.obs_cam].add(jnp.einsum("oij,oik->ojk", jc_w, jc))
        h_pp = jnp.zeros((p, 3, 3)).at[pr.obs_pt].add(
            jnp.einsum("oij,oik->ojk", jp * w[:, None, None], jp))
        b_c = jnp.zeros((k, 6)).at[pr.obs_cam].add(-jnp.einsum("oij,oi->oj", jc_w, e))
        b_p = jnp.zeros((p, 3)).at[pr.obs_pt].add(
            -jnp.einsum("oij,oi->oj", jp * w[:, None, None], e))
        return jnp.sum(h_cc) + jnp.sum(h_pp) + jnp.sum(b_c) + jnp.sum(b_p)

    def s_wcp_only(pr):
        e, jc, jp, z = ba._residuals_jacobians(pr, CAM)
        w, _ = ba._robust_weights(e, pr, use_huber)
        w = jnp.where(active & (z > 1e-6), w, 0.0)
        jc_w = jc * w[:, None, None]
        w_cp_o = jnp.einsum("oij,oik->ojk", jc_w, jp)
        w_cp = jnp.zeros((k, p, 6, 3)).at[pr.obs_cam, pr.obs_pt].add(w_cp_o)
        return jnp.sum(w_cp)

    def s_full_step(pr):
        h_cc, h_pp, b_c, b_p, w_cp, _ = ba._build_blocks(pr, CAM, active, use_huber)
        dc, dp = ba._solve_schur_dense(h_cc, h_pp, b_c, b_p, w_cp,
                                       pr.cam_fixed, jnp.float32(1e-4))
        return jnp.sum(dc) + jnp.sum(dp)

    def s_cost(pr):
        return ba._total_cost(pr, CAM, active, use_huber)

    @jax.jit
    def trivial(x):
        return x + 1.0

    z0 = jax.device_put(jnp.float32(0.0))
    np.asarray(trivial(z0))
    t_fixed = timed(lambda: trivial(z0))
    print(f"fixed dispatch: {t_fixed*1e3:.1f} ms", flush=True)

    progs = {
        "resjac": s_resjac,
        "blocks_all": s_blocks,
        "blocks_no_wcp": s_blocks_nowcp,
        "wcp_scatter": s_wcp_only,
        "cost_eval": s_cost,
        "full_step(blocks+solve)": s_full_step,
    }
    for name, fn in progs.items():
        prog = scanned(fn)
        np.asarray(prog(prob))
        t = timed(lambda pr=prog: pr(prob))
        print(f"{name:26s} {(t - t_fixed) / M * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
