"""Segment-sum strategy shootout at global-BA scale (O=65536 obs):
camera side (K=256) and point side (P=16384), each via scatter-add,
gather-table, and (cam only) chunked one-hot matmul.

Usage: python tools/ab_segsum.py
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

K, P, O = 256, 16384, 65536


def timed(run, reps=4):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    obs_cam = jax.device_put(jnp.asarray(rng.integers(0, K, O), jnp.int32))
    obs_pt = jax.device_put(jnp.asarray(rng.integers(0, P, O), jnp.int32))
    vals42 = jax.device_put(jnp.asarray(rng.normal(size=(O, 42)).astype(np.float32)))
    vals15 = jax.device_put(jnp.asarray(rng.normal(size=(O, 15)).astype(np.float32)))
    valid = jnp.ones((O,), bool)
    cc = ba.pow2_cap(np.bincount(np.asarray(obs_cam), minlength=K).max())
    cp = ba.pow2_cap(np.bincount(np.asarray(obs_pt), minlength=P).max())
    print(f"caps: cam {cc}, pt {cp}", flush=True)
    cam_tab = jax.device_put(ba._rank_table(obs_cam, valid, K, cc))
    pt_tab = jax.device_put(ba._rank_table(obs_pt, valid, P, cp))
    M = 16

    def scanned(fn, v):
        @jax.jit
        def run(x):
            def body(c, _):
                out = fn(x + c * 1e-20)
                return c + jnp.sum(out) * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=M)
            return c
        return lambda: run(v)

    def cam_scatter(v):
        return jnp.zeros((K, v.shape[1])).at[obs_cam].add(v)

    def cam_table(v):
        return ba._segsum(v, cam_tab)

    def cam_onehot(v, chunk=8192):
        out = jnp.zeros((K, v.shape[1]))
        ids = obs_cam
        for c0 in range(0, O, chunk):
            oh = (ids[c0:c0 + chunk][None, :]
                  == jnp.arange(K, dtype=jnp.int32)[:, None]).astype(jnp.float32)
            out = out + oh @ v[c0:c0 + chunk]
        return out

    def pt_scatter(v):
        return jnp.zeros((P, v.shape[1])).at[obs_pt].add(v)

    def pt_table(v):
        return ba._segsum(v, pt_tab)

    @jax.jit
    def trivial(x):
        return x + 1.0

    z0 = jax.device_put(jnp.float32(0.0))
    np.asarray(trivial(z0))
    t_fixed = timed(lambda: trivial(z0))
    print(f"fixed dispatch: {t_fixed*1e3:.1f} ms", flush=True)

    progs = [
        ("cam_scatter[42]", cam_scatter, vals42),
        ("cam_table  [42]", cam_table, vals42),
        ("cam_onehot [42]", cam_onehot, vals42),
        ("pt_scatter [15]", pt_scatter, vals15),
        ("pt_table   [15]", pt_table, vals15),
    ]
    for name, fn, v in progs:
        prog = scanned(fn, v)
        np.asarray(prog())
        t = timed(prog)
        print(f"{name:16s} {(t - t_fixed) / M * 1e3:8.3f} ms", flush=True)

    # correctness spot check
    a = np.asarray(cam_scatter(vals42))
    b = np.asarray(cam_table(vals42))
    c = np.asarray(jax.jit(cam_onehot)(vals42))
    print("cam maxdiff table:", np.abs(a - b).max(), " onehot:", np.abs(a - c).max(),
          flush=True)
    d = np.asarray(pt_scatter(vals15))
    e = np.asarray(pt_table(vals15))
    print("pt maxdiff table:", np.abs(d - e).max(), flush=True)


if __name__ == "__main__":
    main()
