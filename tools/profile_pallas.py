"""Compare full ORB extraction: XLA path vs fused Pallas kernel, on TPU."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.ops import orb


def timed(run, reps=4):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (480, 640)).astype(np.float32)))
    M = 8

    def scanned(ex):
        @jax.jit
        def run(x):
            def body(c, _):
                kp = ex(x + c * 1e-20)
                out = (jnp.sum(kp.xy) + jnp.sum(kp.angle)
                       + jnp.sum(kp.desc).astype(jnp.float32) * 1e-9)
                return c + out * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=M)
            return c
        return run

    @jax.jit
    def trivial(x):
        return x + 1.0

    z = jax.device_put(jnp.float32(0.0))
    np.asarray(trivial(z))
    t_fixed = timed(lambda: np.asarray(trivial(z)))
    print(f"fixed dispatch: {t_fixed*1e3:.1f} ms", flush=True)

    for use_pallas in (False, True):
        cfg = orb.ORBConfig(n_features=2000, n_levels=8, use_pallas=use_pallas)
        ex = orb.ORBExtractor(cfg, (480, 640))
        prog = scanned(ex)
        t0 = time.perf_counter()
        np.asarray(prog(img))
        tc = time.perf_counter() - t0
        t = timed(lambda: np.asarray(prog(img)))
        print(f"use_pallas={use_pallas}: {(t - t_fixed) / M * 1e3:8.2f} ms/frame"
              f"   (compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
