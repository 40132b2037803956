"""Layout experiment: rank-3 [O,3,6] jacobian-product pipeline vs flat
[O,D] (repeat/tile) form, at global-BA scale, each feeding a scatter
consumer. Tests the hypothesis that GBA's per-step cost is rank-3
layout handling, not the segment sums.

Usage: python tools/ab_flat_jac.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

K, O = 256, 65536


def timed(run, reps=4):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    a3 = jax.device_put(jnp.asarray(rng.normal(size=(O, 3, 6)).astype(np.float32)))
    b3 = jax.device_put(jnp.asarray(rng.normal(size=(O, 3, 6)).astype(np.float32)))
    a2 = jnp.reshape(a3, (O, 18))
    b2 = jnp.reshape(b3, (O, 18))
    ids = jax.device_put(jnp.asarray(rng.integers(0, K, O), jnp.int32))
    M = 16

    def scanned(fn):
        @jax.jit
        def run(x, y):
            def body(c, _):
                out = fn(x + c * 1e-20, y)
                return c + jnp.sum(out) * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=M)
            return c
        return run

    def rank3(a, b):
        # a,b [O,3,6] -> outer products [O,6,6] -> scatter to [K,6,6]
        prod = jnp.einsum("oij,oik->ojk", a, b)
        return jnp.zeros((K, 6, 6)).at[ids].add(prod)

    def flat(a, b):
        # a,b [O,18] -> same outer products computed in [O,36] flat layout
        acc = jnp.zeros((O, 36), a.dtype)
        for k in range(3):
            ak = a[:, k * 6:(k + 1) * 6]
            bk = b[:, k * 6:(k + 1) * 6]
            acc = acc + jnp.repeat(ak, 6, axis=1) * jnp.tile(bk, (1, 6))
        return jnp.zeros((K, 36)).at[ids].add(acc)

    @jax.jit
    def trivial(x):
        return x + 1.0

    z0 = jax.device_put(jnp.float32(0.0))
    np.asarray(trivial(z0))
    t_fixed = timed(lambda: trivial(z0))
    print(f"fixed dispatch: {t_fixed*1e3:.1f} ms", flush=True)

    for name, fn, args in (("rank3", rank3, (a3, b3)), ("flat ", flat, (a2, b2))):
        prog = scanned(fn)
        np.asarray(prog(*args))
        t = timed(lambda p=prog, ar=args: p(*ar))
        print(f"{name}: {(t - t_fixed) / M * 1e3:8.3f} ms", flush=True)

    r1 = np.asarray(jax.jit(rank3)(a3, b3)).reshape(K, 36)
    r2 = np.asarray(jax.jit(flat)(a2, b2))
    print("maxdiff:", np.abs(r1 - r2).max(), flush=True)


if __name__ == "__main__":
    main()
