"""Pallas TPU kernel: fused per-keypoint orientation + rotated-BRIEF.

Replaces the two patch-slice passes of the XLA extraction path (IC-angle
moments on the raw level image + 512 descriptor samples on the blurred
image; reference IC_Angle /root/reference/src/ORBextractor.cc:83-111 and
computeOrbDescriptor cc:116-157) with ONE kernel that, per keypoint:

1. loads a 48x128 window of the raw and blurred level images straight from
   VMEM. The window start is tile-aligned (16 sublanes / 128 lanes), and
   the keypoint's sub-tile offset (rb, cb) is NOT resolved by shifting data
   — it is absorbed into index arithmetic (a lesson from the v1 kernel,
   whose four dynamic pltpu.rolls per keypoint dominated its runtime).
   The 128-lane window width (v3 used 256) is bought with TWO phase copies
   of each image, shifted 0 and 64 columns: picking the copy whose 64-cell
   contains the patch's left edge bounds the sub-tile column offset to
   [0, 63], so offset + 31-column patch fits one 128-lane tile. Halves
   window loads, the one-hot build, the moment math, and the descriptor
   matmul's contraction passes,
2. computes the intensity-centroid moments with disc/moment weights built
   on the fly from (rb, cb)-shifted iotas over the raw window,
3. rotates the BRIEF pattern by the resulting angle and gathers the 512
   samples with a column-one-hot matmul on the MXU
   (win[64,128] @ onehot_cols^T[128,512] in int8 -> int32; one-hot
   selection of integer pixels is exact) followed by a row-select masked
   reduction on the VPU; (rbb, cb) shift the one-hot targets for free,
4. stores the 256 comparison bits as one f32 row; the uint32 packing is a
   single batched XLA pass over all keypoints after the kernel (v2 packed
   in-kernel with two [1,256]x[256,8] matmuls per keypoint — M=1 MXU ops
   whose issue latency was pure overhead at 2000 grid steps).

The blurred image is VMEM-resident as CENTERED int8 (round(I) - 128):
the reference's computeOrbDescriptor compares GaussianBlur'd *uchar*
pixels (ORBextractor.cc:116-157), so integer comparisons are exactly its
semantics (the earlier bf16 blur perturbed near-tie bits by ~0.5 gray of
rounding), int8 MACs run at 2x the bf16 MXU rate on v5e, and the VMEM
footprint halves again (headroom that matters at KITTI geometry).
Measured: 0.756 -> 0.552 ms / 2000 keypoints (tools/ab_int8_desc.py).
The raw image stays f32: computing the moments from bf16-rounded pixels
was measured perf-neutral but costs up to ~0.1 rad of IC-angle noise on
weak-moment keypoints (the angle is ill-conditioned there).

Keypoint coordinates arrive via PrefetchScalarGridSpec so they are in SMEM
before the body runs. The grid is one step per keypoint.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALF_PATCH = 15
WIN_R = 48          # raw window rows: 31-row patch + up to 15 rows of
                    # 16-sublane alignment offset -> 46, padded to an f32/
                    # bf16 sublane-tile multiple (16)
WIN_RB = 64         # blur window rows: the blur image is int8 (sublane
                    # tile 32), so starts align to 32 -> 31 + up to 31 rows
                    # of offset -> 62, padded to 64
WIN_C = 128         # window cols: 31-col patch + up to 63 lanes of phase
                    # offset -> 94, padded to one 128-lane tile. Valid only
                    # because keypoints respect EDGE_MARGIN >= 19 and the
                    # phase copies bound cb to [0, 63]
PHASE = 64          # column shift between the two image phase copies


def _kernel(ys_ref, xs_ref, raw_ref, blur_ref, dx_ref, dy_ref,
            mom_ref, bits_ref):
    k = pl.program_id(0)
    y = ys_ref[k]
    x = xs_ref[k]
    h = raw_ref.shape[1]
    wp = raw_ref.shape[2]

    hb = blur_ref.shape[1]
    # 16-row alignment for the f32 raw window
    ya = jnp.clip(((y - HALF_PATCH) // 16) * 16, 0, h - WIN_R)
    ya = pl.multiple_of(ya, 16)
    rb = y - HALF_PATCH - ya                    # patch row offset, in [0, 15]
    # 32-row alignment for the int8 blur window
    yb = jnp.clip(((y - HALF_PATCH) // 32) * 32, 0, hb - WIN_RB)
    yb = pl.multiple_of(yb, 32)
    rbb = y - HALF_PATCH - yb                   # blur row offset, in [0, 31]
    # column phase: pick the copy whose 64-column cell holds the patch's
    # left edge; the in-copy window start is then 128-aligned with the
    # remaining offset cb in [0, 63] (clips only on garbage/invalid slots)
    xl = x - HALF_PATCH
    a = xl // PHASE
    ph = jnp.clip(a % 2, 0, 1)
    xa = jnp.clip((a // 2) * 128, 0, wp - WIN_C)
    xa = pl.multiple_of(xa, 128)
    cb = xl - ph * PHASE - xa                   # patch col offset, in [0, 63]

    # ---- orientation: moments with iota-shifted disc weights -------------
    win_raw = raw_ref[ph, pl.ds(ya, WIN_R), pl.ds(xa, WIN_C)]
    ir = jax.lax.broadcasted_iota(jnp.int32, (WIN_R, WIN_C), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (WIN_R, WIN_C), 1)
    dyy = ir - rb - HALF_PATCH                  # patch-centered row offset
    dxx = ic - cb - HALF_PATCH
    disc = (dxx * dxx + dyy * dyy) <= HALF_PATCH * HALF_PATCH
    wdisc = jnp.where(disc, win_raw, 0.0)
    m10 = jnp.sum(wdisc * dxx.astype(jnp.float32))
    m01 = jnp.sum(wdisc * dyy.astype(jnp.float32))
    # the rotation only needs cos/sin = m10/r, m01/r — no atan2 (which has
    # no Pallas TPU lowering); the angle itself is recovered by the caller
    r2 = m10 * m10 + m01 * m01
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-12))
    degenerate = r2 < 1e-12
    ca = jnp.where(degenerate, 1.0, m10 * inv_r)  # atan2(0,0)=0 convention
    sa = jnp.where(degenerate, 0.0, m01 * inv_r)

    # ---- rotated pattern sample coordinates ([1, 512] lane layout) ------
    dx = dx_ref[:]
    dy = dy_ref[:]
    rx = dx * ca - dy * sa
    ry = dx * sa + dy * ca
    col_t = jnp.round(rx).astype(jnp.int32) + HALF_PATCH + cb   # [1, 512]
    row_t = jnp.round(ry).astype(jnp.int32) + HALF_PATCH + rbb

    # ---- gather: column-one-hot matmul (MXU int8) + row-select (VPU) ----
    # The blur image is CENTERED int8 (round(I) - 128): integer pixel
    # comparisons reproduce the reference's uchar semantics EXACTLY
    # (computeOrbDescriptor compares GaussianBlur'd 8-bit pixels,
    # ORBextractor.cc:116-157), and int8 MACs run at 2x the bf16 MXU rate
    # on v5e. Measured 0.756 -> 0.552 ms / 2000 kp vs the bf16 kernel.
    win_blur = blur_ref[ph, pl.ds(yb, WIN_RB), pl.ds(xa, WIN_C)]  # int8
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, 512), 0)
    oh_ct = (cols_iota == col_t).astype(jnp.int8)               # [128c, 512]
    tmp = jnp.dot(win_blur, oh_ct, preferred_element_type=jnp.int32,
                  precision=jax.lax.Precision.DEFAULT)          # [64, 512]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_RB, 512), 0)
    vals = jnp.sum(jnp.where(rows_iota == row_t, tmp, 0), axis=0,
                   keepdims=True)                               # [1, 512] i32

    # ---- comparison bits: pattern lanes are [a_0..a_255, b_0..b_255] ----
    bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.float32)  # [1, 256]

    mom_ref[k, 0] = m10
    mom_ref[k, 1] = m01
    bits_ref[k, :] = bits.reshape(256)


def _phase_copies(img: jax.Array, wp2: int, hp: int) -> jax.Array:
    """[H, W] -> [2, hp, wp2]: phase 0 = the image, phase 1 = shifted left
    by PHASE columns; both zero-padded to the copy domain."""
    h, w = img.shape
    src = jnp.pad(img, ((0, hp - h), (0, max(PHASE + wp2 - w, 0))))
    return jnp.stack([src[:, :wp2], src[:, PHASE:PHASE + wp2]])


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_orient_describe(raw: jax.Array, blur: jax.Array,
                          ys: jax.Array, xs: jax.Array,
                          pattern: jax.Array,
                          interpret: bool = False):
    """raw/blur: [H, W] f32 level images; ys/xs: [K] int32 keypoint coords;
    pattern: [256, 2, 2] BRIEF pairs ((a, b) x (dx, dy)).

    -> (angle [K] f32 radians, desc [K, 8] uint32).
    """
    h, w = raw.shape
    kcount = ys.shape[0]
    # centered int8 blur: integer comparisons == the reference's uchar
    # comparisons; [0,255] - 128 fits int8 exactly
    blur_i8 = (jnp.clip(jnp.round(blur), 0, 255) - 128).astype(jnp.int8)
    # copy-domain width: the largest in-copy window start is
    # 128 * ((xl_max // 64) // 2) with xl_max = w - 35 (EDGE_MARGIN >= 19),
    # and the window extends 128 columns past it
    m_max = ((w - 2 * HALF_PATCH - 5) // PHASE) // 2 if w >= 40 else 0
    wp2 = 128 * max(1, m_max + 1)
    hp = max(((h + 15) // 16) * 16, WIN_R)
    hb = max(((h + 31) // 32) * 32, WIN_RB)
    raw2 = _phase_copies(raw, wp2, hp)
    blur2 = _phase_copies(blur_i8, wp2, hb)

    # pattern -> [1, 512] lane layout, a-points then b-points
    dx = jnp.concatenate([pattern[:, 0, 0], pattern[:, 1, 0]]).reshape(1, 512)
    dy = jnp.concatenate([pattern[:, 0, 1], pattern[:, 1, 1]]).reshape(1, 512)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(kcount,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # raw phase copies
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blur phase copies
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dx
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dy
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),  # moments (scalar stores)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # comparison bits
        ),
    )
    mom, bits = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((kcount, 2), jnp.float32),
            jax.ShapeDtypeStruct((kcount, 256), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=kcount * 2 * WIN_RB * WIN_C * 512,
            bytes_accessed=kcount * (WIN_R * WIN_C * 4 + WIN_RB * WIN_C),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ys, xs, raw2, blur2, dx, dy)
    angle = jnp.arctan2(mom[:kcount, 1], mom[:kcount, 0])
    # batched uint32 packing: one whole-array pass instead of per-keypoint
    # M=1 matmuls inside the kernel
    from orbslam2_tpu.ops.orb import pack_bits
    desc = pack_bits(bits[:kcount].astype(jnp.uint32))
    return angle, desc
