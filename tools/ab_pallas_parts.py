"""Bisect the fused Pallas orient+describe kernel cost: which part of the
per-keypoint body dominates? Builds stripped kernel variants and times each
on the real TPU (scan-slope method).

Modes: full | moments (no descriptor path) | desc (fixed angle, no moments)
| loads (window loads + trivial reduce only) | empty (scalar stores only)

Usage: python tools/ab_pallas_parts.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbslam2_tpu.ops import orb
from orbslam2_tpu.ops.pallas_orb import HALF_PATCH, WIN_C, WIN_R, _pack_weights


def _kernel(ys_ref, xs_ref, raw_ref, blur_ref, dx_ref, dy_ref,
            wlo_ref, whi_ref, wconst_ref, mom_ref, desc_ref, *, mode: str):
    k = pl.program_id(0)
    y = ys_ref[k]
    x = xs_ref[k]
    h = raw_ref.shape[0]
    wp = raw_ref.shape[1]

    ya = jnp.clip(((y - HALF_PATCH) // 8) * 8, 0, h - WIN_R)
    ya = pl.multiple_of(ya, 8)
    rb = y - HALF_PATCH - ya
    xa = jnp.clip(((x - HALF_PATCH) // 128) * 128, 0, wp - WIN_C)
    xa = pl.multiple_of(xa, 128)
    cb = x - HALF_PATCH - xa

    if mode == "empty":
        mom_ref[k, 0] = jnp.float32(0.0) + rb
        mom_ref[k, 1] = jnp.float32(0.0) + cb
        desc_ref[k, :] = jnp.zeros((8,), jnp.uint32)
        return

    if mode == "loads":
        win_raw = raw_ref[pl.ds(ya, WIN_R), pl.ds(xa, WIN_C)]
        win_blur = blur_ref[pl.ds(ya, WIN_R), pl.ds(xa, WIN_C)]
        mom_ref[k, 0] = jnp.sum(win_raw)
        mom_ref[k, 1] = jnp.sum(win_blur)
        desc_ref[k, :] = jnp.zeros((8,), jnp.uint32)
        return

    if mode in ("full", "moments"):
        win_raw = raw_ref[pl.ds(ya, WIN_R), pl.ds(xa, WIN_C)]
        ir = jax.lax.broadcasted_iota(jnp.int32, (WIN_R, WIN_C), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (WIN_R, WIN_C), 1)
        dyy = ir - rb - HALF_PATCH
        dxx = ic - cb - HALF_PATCH
        disc = (dxx * dxx + dyy * dyy) <= HALF_PATCH * HALF_PATCH
        wdisc = jnp.where(disc, win_raw, 0.0)
        m10 = jnp.sum(wdisc * dxx.astype(jnp.float32))
        m01 = jnp.sum(wdisc * dyy.astype(jnp.float32))
        r2 = m10 * m10 + m01 * m01
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-12))
        degenerate = r2 < 1e-12
        ca = jnp.where(degenerate, 1.0, m10 * inv_r)
        sa = jnp.where(degenerate, 0.0, m01 * inv_r)
        if mode == "moments":
            mom_ref[k, 0] = m10
            mom_ref[k, 1] = m01
            desc_ref[k, :] = jnp.zeros((8,), jnp.uint32)
            return
    else:  # desc: fixed unit rotation
        m10 = jnp.float32(1.0)
        m01 = jnp.float32(0.0)
        ca = jnp.float32(1.0)
        sa = jnp.float32(0.0)

    dx = dx_ref[:]
    dy = dy_ref[:]
    rx = dx * ca - dy * sa
    ry = dx * sa + dy * ca
    col_t = jnp.round(rx).astype(jnp.int32) + HALF_PATCH + cb
    row_t = jnp.round(ry).astype(jnp.int32) + HALF_PATCH + rb

    win_blur = blur_ref[pl.ds(ya, WIN_R), pl.ds(xa, WIN_C)].astype(jnp.bfloat16)
    if mode == "desc_noonehot":
        # constant one-hot: measures matmul + row-select without the build
        oh_ct = wconst_ref[:].astype(jnp.bfloat16)
    else:
        cols_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, 512), 0)
        oh_ct = (cols_iota == col_t).astype(jnp.bfloat16)
    if mode == "desc_nomatmul":
        tmp = (jnp.zeros((WIN_R, 512), jnp.float32) + col_t.astype(jnp.float32)
               + jnp.sum(oh_ct.astype(jnp.float32)) * 1e-9
               + jnp.sum(win_blur.astype(jnp.float32)) * 1e-9)
    else:
        tmp = jnp.dot(win_blur, oh_ct, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
    if mode == "desc_norowsel":
        vals = jnp.sum(tmp, axis=0, keepdims=True)
    else:
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_R, 512), 0)
        vals = jnp.sum(jnp.where(rows_iota == row_t, tmp, 0.0), axis=0,
                       keepdims=True)

    bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.float32)
    lo = jnp.dot(bits, wlo_ref[:], preferred_element_type=jnp.float32)
    hi = jnp.dot(bits, whi_ref[:], preferred_element_type=jnp.float32)
    word = lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16)

    mom_ref[k, 0] = m10
    mom_ref[k, 1] = m01
    desc_ref[k, :] = word.reshape(8).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("mode",))
def run_kernel(raw, blur, ys, xs, pattern, mode):
    h, w = raw.shape
    kcount = ys.shape[0]
    wp = max(WIN_C, ((w + 127) // 128) * 128)
    if wp != w:
        raw = jnp.pad(raw, ((0, 0), (0, wp - w)))
        blur = jnp.pad(blur, ((0, 0), (0, wp - w)))
    hp = max(((h + 7) // 8) * 8, WIN_R)
    if hp != h:
        raw = jnp.pad(raw, ((0, hp - h), (0, 0)))
        blur = jnp.pad(blur, ((0, hp - h), (0, 0)))
    dx = jnp.concatenate([pattern[:, 0, 0], pattern[:, 1, 0]]).reshape(1, 512)
    dy = jnp.concatenate([pattern[:, 0, 1], pattern[:, 1, 1]]).reshape(1, 512)
    wlo, whi = _pack_weights()
    wconst = jnp.zeros((WIN_C, 512), jnp.float32).at[7, :].set(1.0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(kcount,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )
    mom, desc = pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((kcount, 2), jnp.float32),
            jax.ShapeDtypeStruct((kcount, 8), jnp.uint32),
        ),
    )(ys, xs, raw, blur, dx, dy, jnp.asarray(wlo), jnp.asarray(whi), wconst)
    return mom, desc


def timed(run, reps=4):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run()[0])
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

    def scanned(mode):
        @jax.jit
        def run(x):
            def body(c, _):
                mom, d = run_kernel(x + c * 1e-20, x * 0.9, ys, xs, pat, mode)
                return c + jnp.sum(mom) * 1e-20 + jnp.sum(d).astype(jnp.float32) * 1e-30, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=M)
            return c, ()
        return run

    @jax.jit
    def trivial(x):
        return x + 1.0, ()

    z = jax.device_put(jnp.float32(0.0))
    np.asarray(trivial(z)[0])
    t_fixed = timed(lambda: trivial(z))
    print(f"fixed dispatch: {t_fixed*1e3:.1f} ms", flush=True)

    for mode in ("empty", "loads", "moments", "desc", "desc_noonehot",
                 "desc_nomatmul", "desc_norowsel", "full"):
        prog = scanned(mode)
        np.asarray(prog(img)[0])
        t = timed(lambda p=prog: p(img))
        print(f"{mode:8s} {(t - t_fixed) / M * 1e3:8.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
