"""Bisect the global-PCG BA step cost on the real TPU (256 KF, 16k pts,
64k obs): residual/jacobian build, block assembly, preconditioner inverse,
single matvec, cost eval, full solve.

Usage: python tools/ab_pcg_parts.py
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
K, P, O = 256, 16384, 65536


def timed(run, reps=4):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    prob = make_problem(K, P, O)
    prob = jax.tree_util.tree_map(jax.device_put, prob)
    cc = ba.pow2_cap(np.bincount(np.asarray(prob.obs_cam), minlength=K).max())
    cp = ba.pow2_cap(np.bincount(np.asarray(prob.obs_pt), minlength=P).max())
    print(f"caps: cam {cc}, pt {cp}", flush=True)
    M = 4
    use_huber = jnp.bool_(True)
    active = prob.obs_valid
    pt_fixed = jnp.zeros((P,), bool)

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

    def s_cost(pr):
        return ba._total_cost(pr, CAM, active, use_huber)

    def make_solve(tables, n_iters):
        def s_solve(pr):
            e, jc, jp, z = ba._residuals_jacobians(pr, CAM)
            w, _ = ba._robust_weights(e, pr, use_huber)
            w = jnp.where(active & (z > 1e-6), w, 0.0)
            dc, dp = ba._solve_schur_pcg(
                e, jc, jp, w, pr.obs_cam, pr.obs_pt, K, P,
                pr.cam_fixed, pt_fixed, jnp.float32(1e-4), n_iters, tables)
            return jnp.sum(dc) + jnp.sum(dp)
        return s_solve

    def s_minv(pr):
        e, jc, jp, z = ba._residuals_jacobians(pr, CAM)
        w, _ = ba._robust_weights(e, pr, use_huber)
        w = jnp.where(active & (z > 1e-6), w, 0.0)
        jc_w = jc * w[:, None, None]
        h_cc = jnp.zeros((K, 6, 6)).at[pr.obs_cam].add(
            jnp.einsum("oij,oik->ojk", jc_w, jc))
        m_inv = jnp.linalg.inv(h_cc + (1e-4 + 1e-6) * jnp.eye(6))
        return jnp.sum(m_inv)

    tables = ba._build_obs_tables(prob.obs_cam, prob.obs_pt, prob.obs_valid,
                                  K, P, cc, cp)
    tables = jax.tree_util.tree_map(jax.device_put, tables)

    @jax.jit
    def trivial(x):
        return x + 1.0

    z0 = jax.device_put(jnp.float32(0.0))
    np.asarray(trivial(z0))
    t_fixed = timed(lambda: trivial(z0))
    print(f"fixed dispatch: {t_fixed*1e3:.1f} ms", flush=True)

    progs = {
        "resjac": s_resjac,
        "cost_eval": s_cost,
        "m_inv(linalg.inv 6x6xK)": s_minv,
        "solve_scatter_1it": make_solve(None, 1),
        "solve_scatter_30it": make_solve(None, 30),
        "solve_tables_1it": make_solve(tables, 1),
        "solve_tables_30it": make_solve(tables, 30),
    }
    for name, fn in progs.items():
        prog = scanned(fn)
        np.asarray(prog(prob))
        t = timed(lambda p=prog: p(prob))
        print(f"{name:24s} {(t - t_fixed) / M * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
