"""A/B: int8 descriptor path for the fused orient+describe kernel.

Candidate v5: store the blurred image as CENTERED int8 (I-128; the
reference's computeOrbDescriptor compares uchar pixels, so integer
comparisons are MORE faithful than bf16) and run the one-hot gather matmul
in int8 x int8 -> int32 on the MXU (2x bf16 throughput on v5e). int8 VMEM
tiles are (32, 128), so the window grows to 64 rows (32-aligned start,
offset in [0,31], 31-row patch) — more rows, but 1-byte loads and
double-rate MACs.

Times the current production kernel vs the candidate on the real TPU and
golden-checks descriptors against the XLA path.

Usage: python tools/ab_int8_desc.py
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

from orbslam2_tpu.ops import orb, pallas_orb
from orbslam2_tpu.ops.pallas_orb import HALF_PATCH, PHASE, WIN_C, _phase_copies

WIN_RB = 64   # blur window rows for the int8 (32, 128) tile
WIN_RR = 48   # raw window rows (f32, 16-aligned as in production)


def _kernel_v5(ys_ref, xs_ref, raw_ref, blur_ref, dx_ref, dy_ref,
               mom_ref, bits_ref):
    k = pl.program_id(0)
    y = ys_ref[k]
    x = xs_ref[k]
    h = raw_ref.shape[1]
    hb = blur_ref.shape[1]
    wp = raw_ref.shape[2]

    ya = jnp.clip(((y - HALF_PATCH) // 16) * 16, 0, h - WIN_RR)
    ya = pl.multiple_of(ya, 16)
    rb = y - HALF_PATCH - ya
    # int8 blur window: 32-row alignment
    yb = jnp.clip(((y - HALF_PATCH) // 32) * 32, 0, hb - WIN_RB)
    yb = pl.multiple_of(yb, 32)
    rbb = y - HALF_PATCH - yb                   # in [0, 31]
    xl = x - HALF_PATCH
    a = xl // PHASE
    ph = jnp.clip(a % 2, 0, 1)
    xa = jnp.clip((a // 2) * 128, 0, wp - WIN_C)
    xa = pl.multiple_of(xa, 128)
    cb = xl - ph * PHASE - xa

    win_raw = raw_ref[ph, pl.ds(ya, WIN_RR), pl.ds(xa, WIN_C)]
    ir = jax.lax.broadcasted_iota(jnp.int32, (WIN_RR, WIN_C), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (WIN_RR, WIN_C), 1)
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

    dx = dx_ref[:]
    dy = dy_ref[:]
    rx = dx * ca - dy * sa
    ry = dx * sa + dy * ca
    col_t = jnp.round(rx).astype(jnp.int32) + HALF_PATCH + cb
    row_t = jnp.round(ry).astype(jnp.int32) + HALF_PATCH + rbb

    win_blur = blur_ref[ph, pl.ds(yb, WIN_RB), pl.ds(xa, WIN_C)]  # int8
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, 512), 0)
    oh_ct = (cols_iota == col_t).astype(jnp.int8)
    tmp = jnp.dot(win_blur, oh_ct, preferred_element_type=jnp.int32,
                  precision=jax.lax.Precision.DEFAULT)          # [64, 512]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_RB, 512), 0)
    vals = jnp.sum(jnp.where(rows_iota == row_t, tmp, 0), axis=0,
                   keepdims=True)                               # [1, 512] i32

    bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.float32)

    mom_ref[k, 0] = m10
    mom_ref[k, 1] = m01
    bits_ref[k, :] = bits.reshape(256)


def _phase_copies_rows(img, wp2, hp):
    h, w = img.shape
    src = jnp.pad(img, ((0, hp - h), (0, max(PHASE + wp2 - w, 0))))
    return jnp.stack([src[:, :wp2], src[:, PHASE:PHASE + wp2]])


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_v5(raw, blur, ys, xs, pattern, interpret=False):
    h, w = raw.shape
    kcount = ys.shape[0]
    blur_i8 = (jnp.clip(jnp.round(blur), 0, 255) - 128).astype(jnp.int8)
    m_max = ((w - 2 * HALF_PATCH - 5) // PHASE) // 2 if w >= 40 else 0
    wp2 = 128 * max(1, m_max + 1)
    hp = max(((h + 15) // 16) * 16, WIN_RR)
    hb = max(((h + 31) // 32) * 32, WIN_RB)
    raw2 = _phase_copies_rows(raw, wp2, hp)
    blur2 = _phase_copies_rows(blur_i8, wp2, hb)

    dx = jnp.concatenate([pattern[:, 0, 0], pattern[:, 1, 0]]).reshape(1, 512)
    dy = jnp.concatenate([pattern[:, 0, 1], pattern[:, 1, 1]]).reshape(1, 512)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(kcount,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )
    mom, bits = pl.pallas_call(
        _kernel_v5,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((kcount, 2), jnp.float32),
                   jax.ShapeDtypeStruct((kcount, 256), jnp.float32)),
        interpret=interpret,
    )(ys, xs, raw2, blur2, dx, dy)
    angle = jnp.arctan2(mom[:kcount, 1], mom[:kcount, 0])
    from orbslam2_tpu.ops.orb import pack_bits
    desc = pack_bits(bits[:kcount].astype(jnp.uint32))
    return angle, desc


def main():
    rng = np.random.default_rng(7)
    h, w = 480, 640
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    k1 = orb.gaussian_kernel1d(1.5, 3)
    img = np.asarray(orb._separable_conv(jnp.asarray(img), k1))
    blur = np.asarray(orb._separable_conv(jnp.asarray(img),
                                          orb.gaussian_kernel1d(2.0, 3)))
    n = 2000
    ys = rng.integers(orb.EDGE_MARGIN, h - orb.EDGE_MARGIN, n).astype(np.int32)
    xs = rng.integers(orb.EDGE_MARGIN, w - orb.EDGE_MARGIN, n).astype(np.int32)
    pattern = orb.make_pattern(orb.ORBConfig().pattern_seed)

    di = jax.device_put(jnp.asarray(img))
    db = jax.device_put(jnp.asarray(blur))
    dys = jax.device_put(jnp.asarray(ys))
    dxs = jax.device_put(jnp.asarray(xs))
    dp = jax.device_put(jnp.asarray(pattern))

    @jax.jit
    def triv(x):
        return x + 1.0

    z = jax.device_put(jnp.float32(0))
    np.asarray(triv(z))

    def timed(fn, reps=6):
        # scan 8 calls per dispatch to amortize the relay
        @jax.jit
        def scan8(img_, blur_):
            def step(c, _):
                ang, desc = fn(img_ + c * 1e-20, blur_, dys, dxs, dp)
                return c + 1e-9, jnp.sum(desc)
            c, outs = jax.lax.scan(step, jnp.float32(0.0), None, length=8)
            return outs.sum()
        np.asarray(scan8(di, db))
        t_fix = min(_t(lambda: np.asarray(triv(z))) for _ in range(reps))
        best = min(_t(lambda: np.asarray(scan8(di, db))) for _ in range(reps))
        return (best - t_fix) / 8

    def _t(run):
        t0 = time.perf_counter()
        run()
        return time.perf_counter() - t0

    t_v4 = timed(lambda i, b, y, x, p: pallas_orb.fused_orient_describe(
        i, b, y, x, p))
    print(f"v4 (bf16, 48x128): {t_v4 * 1e3:.3f} ms / 2000 kp", flush=True)
    t_v5 = timed(lambda i, b, y, x, p: fused_v5(i, b, y, x, p))
    print(f"v5 (int8, 64x128): {t_v5 * 1e3:.3f} ms / 2000 kp", flush=True)

    a4, d4 = pallas_orb.fused_orient_describe(di, db, dys, dxs, dp)
    a5, d5 = fused_v5(di, db, dys, dxs, dp)
    d4, d5 = np.asarray(d4), np.asarray(d5)
    ham = np.unpackbits(np.ascontiguousarray(d4 ^ d5).view(np.uint8),
                        axis=1).sum(axis=1)
    da = np.abs(np.arctan2(np.sin(np.asarray(a4) - np.asarray(a5)),
                           np.cos(np.asarray(a4) - np.asarray(a5))))
    print(f"v4 vs v5: desc hamming median {np.median(ham)} max {ham.max()}, "
          f"angle max {da.max():.2e}")


if __name__ == "__main__":
    main()
