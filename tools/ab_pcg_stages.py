"""Cumulative-stage timing inside _solve_schur_pcg at global-BA scale:
block build -> +h_pp_inv -> +m_inv -> +b_red -> +1 matvec.

Usage: python tools/ab_pcg_stages.py
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
    M = 4
    use_huber = jnp.bool_(True)
    active = prob.obs_valid
    pt_fixed = jnp.zeros((P,), bool)
    lam = jnp.float32(1e-4)

    def scanned(fn):
        @jax.jit
        def run(pr):
            def body(c, _):
                out = fn(pr._replace(points=pr.points + c * 1e-20))
                return c + out * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=M)
            return c
        return run

    def upto(stage):
        def fn(pr):
            obs_cam, obs_pt = pr.obs_cam, pr.obs_pt
            e, jc, jp, z = ba._residuals_jacobians(pr, CAM)
            w, _ = ba._robust_weights(e, pr, use_huber)
            w = jnp.where(active & (z > 1e-6), w, 0.0)
            jc_w = jc * w[:, None, None]
            jp_w = jp * w[:, None, None]
            h_cc = jnp.zeros((K, 6, 6)).at[obs_cam].add(
                jnp.einsum("oij,oik->ojk", jc_w, jc))
            h_pp = jnp.zeros((P, 3, 3)).at[obs_pt].add(
                jnp.einsum("oij,oik->ojk", jp_w, jp))
            b_c = jnp.zeros((K, 6)).at[obs_cam].add(
                -jnp.einsum("oij,oi->oj", jc_w, e))
            b_p = jnp.zeros((P, 3)).at[obs_pt].add(
                -jnp.einsum("oij,oi->oj", jp_w, e))
            b_p = jnp.where(pt_fixed[:, None], 0.0, b_p)
            acc = (jnp.sum(h_cc) + jnp.sum(h_pp) + jnp.sum(b_c) + jnp.sum(b_p))
            if stage == "blocks":
                return acc
            h_cc_d = h_cc + lam * ba._diag_only(h_cc) + 1e-8 * jnp.eye(6)
            h_pp_d = h_pp + lam * ba._diag_only(h_pp) + 1e-8 * jnp.eye(3)
            h_pp_d = jnp.where(pt_fixed[:, None, None], jnp.eye(3)[None], h_pp_d)
            h_pp_inv = ba._inv3x3(h_pp_d)
            h_pp_inv = jnp.where(pt_fixed[:, None, None], 0.0, h_pp_inv)
            if stage == "hpp_inv":
                return acc + jnp.sum(h_pp_inv)
            m_inv = ba._inv6x6_spd(h_cc_d + 1e-6 * jnp.eye(6))
            if stage == "m_inv":
                return acc + jnp.sum(h_pp_inv) + jnp.sum(m_inv)
            free = ~pr.cam_fixed
            y0 = jnp.einsum("pij,pj->pi", h_pp_inv, b_p)
            s0 = jnp.einsum("oij,oi->oj", jc_w,
                            jnp.einsum("oij,oj->oi", jp, y0[obs_pt]))
            b_red = b_c - jnp.zeros((K, 6)).at[obs_cam].add(s0)
            b_red = jnp.where(free[:, None], b_red, 0.0)
            if stage == "b_red":
                return acc + jnp.sum(h_pp_inv) + jnp.sum(m_inv) + jnp.sum(b_red)
            # one matvec + precond
            v = b_red
            hv = jnp.einsum("kij,kj->ki", h_cc_d, v)
            t = jnp.einsum("oij,oi->oj", jp,
                           jnp.einsum("oij,oj->oi", jc_w, v[obs_cam]))
            u = jnp.zeros((P, 3)).at[obs_pt].add(t)
            y = jnp.einsum("pij,pj->pi", h_pp_inv, u)
            s = jnp.einsum("oij,oi->oj", jc_w,
                           jnp.einsum("oij,oj->oi", jp, y[obs_pt]))
            zz = jnp.zeros((K, 6)).at[obs_cam].add(s)
            out = hv - zz
            pr0 = jnp.einsum("kij,kj->ki", m_inv, out)
            return (acc + jnp.sum(h_pp_inv) + jnp.sum(m_inv) + jnp.sum(b_red)
                    + jnp.sum(pr0))
        return fn

    @jax.jit
    def trivial(x):
        return x + 1.0

    z0 = jax.device_put(jnp.float32(0.0))
    np.asarray(trivial(z0))
    t_fixed = timed(lambda: trivial(z0))
    print(f"fixed dispatch: {t_fixed*1e3:.1f} ms", flush=True)

    for stage in ("blocks", "hpp_inv", "m_inv", "b_red", "matvec1"):
        prog = scanned(upto(stage))
        np.asarray(prog(prob))
        t = timed(lambda p=prog: p(prob))
        print(f"upto {stage:10s} {(t - t_fixed) / M * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
