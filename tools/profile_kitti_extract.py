"""Extraction + fused-step device time at KITTI geometry (1241x376) on the
real TPU, via the scan slope method (carry-dependent body so XLA cannot
hoist; one fetch per program — axon rules, CLAUDE.md).

Usage: python tools/profile_kitti_extract.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.ops.orb import ORBConfig, ORBExtractor


def slope_ms(fn, x, m=8):
    """Per-iteration ms of fn via scan with carry dependence."""
    def body(c, _):
        out = fn(x + c * 1e-20)
        return c + jnp.sum(out) * 1e-30, ()

    def run(n):
        prog = jax.jit(lambda x0: jax.lax.scan(
            lambda c, _: body(c, None), x0, None, length=n)[0])
        r = prog(jnp.float32(0.0))
        np.asarray(r)  # compile + settle

        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(prog(jnp.float32(0.0)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(1)
    tm = run(1 + m)
    return (tm - t1) / m * 1e3


def main():
    h, w = 376, 1241
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    img = jax.device_put(img)
    for feats, levels in ((2000, 8),):
        ex = ORBExtractor(ORBConfig(n_features=feats, n_levels=levels), (h, w))

        def extract(im):
            kp = ex(im)
            return kp.desc.astype(jnp.float32).sum() + kp.xy.sum()

        ms = slope_ms(extract, img)
        print(f"KITTI extract {feats}f/{levels}L {w}x{h}: {ms:.2f} ms/frame",
              flush=True)
    # 640x480 reference for the same build (sanity vs round-3 numbers)
    img2 = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (480, 640)).astype(np.float32)))
    ex2 = ORBExtractor(ORBConfig(n_features=2000, n_levels=8), (480, 640))

    def extract2(im):
        kp = ex2(im)
        return kp.desc.astype(jnp.float32).sum() + kp.xy.sum()

    ms2 = slope_ms(extract2, img2)
    print(f"640x480 extract 2000f/8L: {ms2:.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
