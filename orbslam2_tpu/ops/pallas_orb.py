"""Pallas TPU kernel: fused per-keypoint orientation + rotated-BRIEF.

Replaces the two patch-slice passes of the XLA extraction path (IC-angle
moments on the raw level image + 512 descriptor samples on the blurred
image; reference IC_Angle /root/reference/src/ORBextractor.cc:83-111 and
computeOrbDescriptor cc:116-157) with ONE kernel that, per keypoint:

1. loads a 32x256 window of the raw and blurred level images straight from
   VMEM (both images are VMEM-resident for the whole call; level images are
   at most 480x640 f32 = 1.2 MB each),
2. computes the intensity-centroid moments as an elementwise product with
   column-shifted moment kernels (the shift aligns the 31x31 disc to the
   keypoint's position inside the window),
3. rotates the BRIEF pattern by the resulting angle and gathers the 512
   samples with a one-hot row matmul on the MXU ([512,32] @ [32,256] in
   bfloat16 — one-hot selection of bf16-rounded pixels is exact) followed
   by a masked column reduction on the VPU,
4. packs the 256 comparison bits into 8 uint32 words.

v5e profiling motivated this: the XLA path spends ~6.5 ms/frame in
vmapped dynamic_slice patch extraction + moment einsum + descriptor
matmuls at 2000 keypoints; the scattered reads here stay in VMEM.

Keypoint coordinates arrive via PrefetchScalarGridSpec so they are in SMEM
before the body runs. The grid is one step per keypoint.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALF_PATCH = 15
WIN_R = 40          # window rows: 31-row patch + up to 7 rows of sublane
                    # alignment slack + padding to a sublane-tile multiple
WIN_C = 256         # window cols (>= 2 * 128 so any 31-wide patch fits after
                    # aligning the window start down to a lane multiple)
PATCH_C = 128       # roll-aligned patch canvas width


def _moment_kernels_padded() -> Tuple[np.ndarray, np.ndarray]:
    """[40, 128] canvases holding the 31x31 intensity-centroid moment
    kernels (see orb._moment_kernels) at the origin; the kernel rolls the
    image window so the patch sits at the origin too."""
    ys, xs = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
    disc = (xs ** 2 + ys ** 2) <= HALF_PATCH ** 2
    k10 = np.zeros((WIN_R, PATCH_C), np.float32)
    k01 = np.zeros((WIN_R, PATCH_C), np.float32)
    k10[:31, :31] = xs * disc
    k01[:31, :31] = ys * disc
    return k10, k01


KP_PER_STEP = 1     # keypoints per grid step. Negative result (v5e): 4
                    # kp/step benched SLOWER (207 vs 222 fps end-to-end) —
                    # Mosaic already pipelines grid steps; the batched body
                    # just raises VMEM/register pressure.


def _kernel(ys_ref, xs_ref, raw_ref, blur_ref, k10_ref, k01_ref,
            dx_ref, dy_ref, mom_ref, desc_ref):
    step = pl.program_id(0)
    for b in range(KP_PER_STEP):
        _one_keypoint(step * KP_PER_STEP + b, ys_ref, xs_ref, raw_ref,
                      blur_ref, k10_ref, k01_ref, dx_ref, dy_ref,
                      mom_ref, desc_ref)


def _one_keypoint(k, ys_ref, xs_ref, raw_ref, blur_ref, k10_ref, k01_ref,
                  dx_ref, dy_ref, mom_ref, desc_ref):
    y = ys_ref[k]
    x = xs_ref[k]
    h = raw_ref.shape[0]
    wp = raw_ref.shape[1]

    ya = jnp.clip(((y - HALF_PATCH) // 8) * 8, 0, h - WIN_R)
    ya = pl.multiple_of(ya, 8)
    rb = jnp.clip(y - HALF_PATCH - ya, 0, 7)    # patch row offset in window
    xa = jnp.clip(((x - HALF_PATCH) // 128) * 128, 0, wp - WIN_C)
    xa = pl.multiple_of(xa, 128)
    cb = jnp.clip(x - HALF_PATCH - xa, 0, 127)  # patch col offset in window

    def patch_window(ref):
        """32x128 window with the 31x31 patch rolled to the origin (Mosaic
        slice starts must be tile-aligned; a dynamic roll absorbs the
        sub-tile offset)."""
        win = ref[pl.ds(ya, WIN_R), pl.ds(xa, WIN_C)]
        win = pltpu.roll(win, (WIN_R - rb) % WIN_R, axis=0)
        win = pltpu.roll(win, (WIN_C - cb) % WIN_C, axis=1)
        return win[:, :PATCH_C]

    # ---- orientation: moments over the raw window -----------------------
    win_raw = patch_window(raw_ref)
    m10 = jnp.sum(win_raw * k10_ref[:])
    m01 = jnp.sum(win_raw * k01_ref[:])
    # the rotation only needs cos/sin = m10/r, m01/r — no atan2 (which has
    # no Pallas TPU lowering); the angle itself is recovered by the caller
    r2 = m10 * m10 + m01 * m01
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-12))
    degenerate = r2 < 1e-12
    ca = jnp.where(degenerate, 1.0, m10 * inv_r)  # atan2(0,0)=0 convention
    sa = jnp.where(degenerate, 0.0, m01 * inv_r)

    # ---- rotated pattern sample coordinates ([512, 1] layout) -----------
    dx = dx_ref[:]
    dy = dy_ref[:]
    rx = dx * ca - dy * sa
    ry = dx * sa + dy * ca
    col = jnp.round(rx).astype(jnp.int32) + HALF_PATCH          # [512, 1]
    row = jnp.round(ry).astype(jnp.int32) + HALF_PATCH

    # ---- gather: one-hot row matmul (MXU) + masked column reduce (VPU) --
    # contraction dim padded to 128 so both matmul operands are lane-tile
    # aligned (Mosaic rejects a 40-lane lhs). The concat happens in f32
    # (40 rows are f32-tile aligned but not bf16-tile aligned); the cast
    # to bf16 for the MXU comes after, on the aligned [128, 128] shape.
    # One-hot selection of bf16-rounded pixels is exact; the bf16 rounding
    # of the blurred intensity (~0.5 gray level) only perturbs near-tie
    # comparison bits.
    win_blur = patch_window(blur_ref)
    win_pad = jnp.concatenate(
        [win_blur, jnp.zeros((128 - WIN_R, PATCH_C), jnp.float32)],
        axis=0).astype(jnp.bfloat16)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 1)
    oh_r = (row == rows_iota).astype(jnp.bfloat16)              # [512, 128]
    # explicit DEFAULT precision: the package-wide f32 matmul default would
    # request an fp32 contraction on bf16 operands, which Mosaic rejects
    tmp = jnp.dot(oh_r, win_pad, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (512, PATCH_C), 1)
    val = jnp.sum(jnp.where(col == cols_iota, tmp, 0.0), axis=1,
                  keepdims=True)                                # [512, 1]

    # ---- pack bits: pattern rows are laid out [a_0..a_255, b_0..b_255] --
    # pack in int32 (Mosaic lacks unsigned reductions); two's-complement
    # wraparound keeps the bit pattern of the uint32 word exact
    bits = (val[:256] < val[256:]).astype(jnp.int32)            # [256, 1]
    b = bits.reshape(8, 32)
    weights = (jnp.int32(1) << jax.lax.broadcasted_iota(
        jnp.int32, (8, 32), 1))
    packed = jnp.sum(b * weights, axis=1).astype(jnp.uint32)    # [8]

    mom_ref[k, 0] = m10
    mom_ref[k, 1] = m01
    desc_ref[k, :] = packed


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
    # pad the keypoint list to a multiple of the per-step batch
    kpad = (-kcount) % KP_PER_STEP
    if kpad:
        ys = jnp.concatenate([ys, jnp.zeros((kpad,), ys.dtype)])
        xs = jnp.concatenate([xs, jnp.zeros((kpad,), xs.dtype)])
    ktot = kcount + kpad
    # pad width to a lane multiple with room for one full window
    wp = max(WIN_C, ((w + 127) // 128) * 128)
    if wp != w:
        raw = jnp.pad(raw, ((0, 0), (0, wp - w)))
        blur = jnp.pad(blur, ((0, 0), (0, wp - w)))
    hp = max(h, WIN_R)
    if hp != h:
        raw = jnp.pad(raw, ((0, hp - h), (0, 0)))
        blur = jnp.pad(blur, ((0, hp - h), (0, 0)))

    # pattern -> [512, 1] column layout, a-points then b-points
    dx = jnp.concatenate([pattern[:, 0, 0], pattern[:, 1, 0]]).reshape(512, 1)
    dy = jnp.concatenate([pattern[:, 0, 1], pattern[:, 1, 1]]).reshape(512, 1)
    k10, k01 = _moment_kernels_padded()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ktot // KP_PER_STEP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # raw
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blur
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k10
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k01
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dx
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dy
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),  # moments (scalar stores)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # desc
        ),
    )
    mom, desc = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ktot, 2), jnp.float32),
            jax.ShapeDtypeStruct((ktot, 8), jnp.uint32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=ktot * 2 * 512 * WIN_R * WIN_C,
            bytes_accessed=ktot * (2 * WIN_R * WIN_C * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ys, xs, raw, blur, jnp.asarray(k10), jnp.asarray(k01), dx, dy)
    angle = jnp.arctan2(mom[:kcount, 1], mom[:kcount, 0])
    return angle, desc[:kcount]
