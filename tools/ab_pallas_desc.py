"""A/B: one-stage vs two-stage descriptor gather in the fused Pallas kernel.

Times fused_orient_describe at K keypoints on a 480x640 level image with the
scan-slope method (see tools/profile_extraction.py for the methodology).

Usage: python tools/ab_pallas_desc.py [K]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.ops import orb, pallas_orb


def timed(run, reps=4):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32)))
    ys = jax.device_put(jnp.asarray(rng.integers(20, 460, k), jnp.int32))
    xs = jax.device_put(jnp.asarray(rng.integers(20, 620, k), jnp.int32))
    pat = jax.device_put(jnp.asarray(orb.make_pattern(20120904)))
    M = 8

    def scanned(two_stage):
        @jax.jit
        def run(x):
            def body(c, _):
                a, d = pallas_orb.fused_orient_describe(
                    x + c * 1e-20, x * 0.9, ys, xs, pat, two_stage=two_stage)
                return c + jnp.sum(a) * 1e-20 + jnp.sum(d).astype(jnp.float32) * 1e-30, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=M)
            return c
        return run

    @jax.jit
    def trivial(x):
        return x + 1.0

    z = jax.device_put(jnp.float32(0.0))
    np.asarray(trivial(z))
    t_fixed = timed(lambda: trivial(z))
    print(f"fixed dispatch: {t_fixed*1e3:.1f} ms", flush=True)

    for name, ts in (("one_stage", False), ("two_stage", True)):
        prog = scanned(ts)
        t0 = time.perf_counter()
        np.asarray(prog(img))
        tc = time.perf_counter() - t0
        t = timed(lambda p=prog: p(img))
        print(f"{name}: {(t - t_fixed) / M * 1e3:.3f} ms/call  (compile {tc:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
