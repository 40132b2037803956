"""Stereo left-right keypoint matching.

Replaces Frame::ComputeStereoMatches (/root/reference/src/Frame.cc:577-751):
the reference builds per-row candidate lists and runs a scalar
descriptor-distance loop plus an 11x11 SAD sub-pixel refinement. Here the
left-right relation is one dense Hamming matrix AND-ed with epipolar-row
and disparity-window masks; the matched right keypoint's (sub-pixel pyramid)
x-coordinate provides the disparity directly.

The 11x11 SAD sliding-window sub-pixel refinement with parabola
interpolation (Frame.cc:672-719) is reproduced on the blurred pyramid of
the keypoint's octave: the +-0.5 px quantization of the raw match costs
>5% depth error at moderate range, which measurably degrades stereo ATE.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.ops import hamming
from orbslam2_tpu.ops.orb import Keypoints

_SAD_W = 5      # half window (11x11, Frame.cc:672)
_SAD_SLIDE = 5  # +-5 columns searched (Frame.cc:675)


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor",
                                             "n_levels", "level_budgets"))
def match_stereo(
    kp_l: Keypoints,
    kp_r: Keypoints,
    pyr_l: Tuple[jax.Array, ...],
    pyr_r: Tuple[jax.Array, ...],
    cam: PinholeCamera,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    level_budgets: Tuple[int, ...] | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """-> (uR [N] virtual right-u per left keypoint (<0 if unmatched),
           depth [N] (<0 if unmatched)).

    ``pyr_l`` / ``pyr_r``: the extractor's blurred pyramids
    (ORBExtractor.extract_with_pyramid), shared with extraction exactly
    like the reference reads mvImagePyramid (Frame.cc:672-719).

    Masks mirror the reference: row window 2 * sigma(octave_L)
    (Frame.cc:617), disparity in (0, fx] i.e. depth >= baseline
    (Frame.cc:584-585), octave agreement within 1 (Frame.cc:632),
    Hamming <= TH_HIGH, SAD sub-pixel refinement, median-distance
    consistency sweep (Frame.cc:737-750).

    ``level_budgets``: the extractor's static per-level keypoint counts.
    Keypoints arrive CONCATENATED in level order, so each pyramid level's
    SAD refinement runs only on its own contiguous (statically sliced)
    block — without this every level processed all N keypoints, which
    made the refinement the single most expensive stage of the stereo
    frame program (8x redundant work; measured ~35 ms of a 40 ms KITTI
    frame build on v5e). None = legacy all-N-per-level behavior.
    """
    dist = hamming.distance_matrix(kp_l.desc, kp_r.desc, kp_l.valid, kp_r.valid)
    row_win = 2.0 * scale_factor ** kp_l.octave.astype(jnp.float32)
    dv = jnp.abs(kp_l.xy[:, 1:2] - kp_r.xy[None, :, 1])
    row_ok = dv <= row_win[:, None]
    disp = kp_l.xy[:, 0:1] - kp_r.xy[None, :, 0]
    min_d, max_d = 0.0, cam.fx  # maxD = bf/baseline = fx
    disp_ok = (disp > min_d) & (disp <= max_d)
    oct_ok = jnp.abs(kp_l.octave[:, None] - kp_r.octave[None, :]) <= 1
    mask = row_ok & disp_ok & oct_ok

    best_j, best_d, _ = hamming.best_and_second(dist, mask)
    matched = best_d <= hamming.TH_HIGH
    ur0 = kp_r.xy[jnp.clip(best_j, 0, kp_r.n - 1), 0]

    ur = _sad_subpixel(pyr_l, pyr_r, kp_l, ur0, scale_factor, n_levels,
                       level_budgets)
    disparity = kp_l.xy[:, 0] - ur
    matched = matched & (disparity > 0.01) & (disparity <= max_d)
    depth = cam.bf / jnp.maximum(disparity, 0.01)

    # median-consistency outlier sweep: drop matches with Hamming distance
    # beyond 1.5 * 1.4 * median of matched distances (Frame.cc:737-750)
    d_sorted = jnp.sort(jnp.where(matched, best_d, hamming.INVALID_DIST))
    n_m = jnp.sum(matched.astype(jnp.int32))
    median = d_sorted[jnp.maximum(n_m // 2, 0)].astype(jnp.float32)
    keep = matched & (best_d.astype(jnp.float32) <= 1.5 * 1.4 * median)

    return (jnp.where(keep, ur, -1.0),
            jnp.where(keep, depth, -1.0))


def _sad_level(bl, br, xy, ur0, s) -> Tuple[jax.Array, jax.Array]:
    """One pyramid level's SAD refinement over a keypoint block.
    -> (refined uR in level-0 coords, safe mask)."""
    n = xy.shape[0]
    win = 2 * _SAD_W + 1
    strip_w = win + 2 * _SAD_SLIDE
    lh, lw = bl.shape

    xl = jnp.round(xy[:, 0] / s).astype(jnp.int32)
    yl = jnp.round(xy[:, 1] / s).astype(jnp.int32)
    xr0 = jnp.round(ur0 / s).astype(jnp.int32)
    safe = (yl >= _SAD_W) & (yl < lh - _SAD_W) & \
        (xl >= _SAD_W) & (xl < lw - _SAD_W) & \
        (xr0 >= _SAD_W + _SAD_SLIDE) & (xr0 < lw - _SAD_W - _SAD_SLIDE)

    def get_l(y, x):
        return jax.lax.dynamic_slice(
            bl, (jnp.clip(y - _SAD_W, 0, lh - win),
                 jnp.clip(x - _SAD_W, 0, lw - win)), (win, win))

    def get_r(y, x):
        return jax.lax.dynamic_slice(
            br, (jnp.clip(y - _SAD_W, 0, lh - win),
                 jnp.clip(x - _SAD_W - _SAD_SLIDE, 0, lw - strip_w)),
            (win, strip_w))

    pl = jax.vmap(get_l)(yl, xl)            # [N, 11, 11]
    pr = jax.vmap(get_r)(yl, xr0)            # [N, 11, 21]
    # center-normalize like the reference (IL - IL.center)
    pl = pl - pl[:, _SAD_W:_SAD_W + 1, _SAD_W:_SAD_W + 1]
    sads = []
    for off in range(2 * _SAD_SLIDE + 1):
        pr_win = jax.lax.dynamic_slice_in_dim(pr, off, win, axis=2)
        pr_win = pr_win - pr_win[:, _SAD_W:_SAD_W + 1, _SAD_W:_SAD_W + 1]
        sads.append(jnp.sum(jnp.abs(pl - pr_win), axis=(1, 2)))
    sad = jnp.stack(sads, axis=1)            # [N, 11]
    best = jnp.argmin(sad, axis=1)
    interior = (best > 0) & (best < 2 * _SAD_SLIDE)
    bm1 = sad[jnp.arange(n), jnp.maximum(best - 1, 0)]
    b0 = sad[jnp.arange(n), best]
    bp1 = sad[jnp.arange(n), jnp.minimum(best + 1, 2 * _SAD_SLIDE)]
    denom = jnp.maximum(2.0 * (bm1 + bp1 - 2.0 * b0), 1e-6)
    delta = jnp.clip((bm1 - bp1) / denom, -1.0, 1.0)
    delta = jnp.where(interior, delta, 0.0)
    ur_lvl = (xr0.astype(jnp.float32)
              + (best - _SAD_SLIDE).astype(jnp.float32) + delta) * s
    return ur_lvl, safe


def _sad_subpixel(pyr_l, pyr_r, kp_l: Keypoints, ur0: jax.Array,
                  scale_factor: float, n_levels: int,
                  level_budgets=None) -> jax.Array:
    """Slide an 11x11 window +-5 columns on the blurred octave image of
    each keypoint; parabola-interpolate the SAD minimum (Frame.cc:672-719).
    Operates on the extractor's blurred pyramids (no rebuild).
    Returns refined uR in level-0 coordinates.

    With ``level_budgets`` (the extractor's static per-level counts and
    concatenation order), each level refines only its own contiguous
    keypoint block — the total work is N patches instead of
    n_levels * N."""
    if level_budgets is not None and sum(level_budgets) == kp_l.n:
        outs = []
        start = 0
        for lvl in range(n_levels):
            b = level_budgets[lvl]
            if b == 0:
                continue
            s = scale_factor ** lvl
            blk = slice(start, start + b)
            ur_lvl, safe = _sad_level(pyr_l[lvl], pyr_r[lvl],
                                      kp_l.xy[blk], ur0[blk], s)
            outs.append(jnp.where(safe, ur_lvl, ur0[blk]))
            start += b
        return jnp.concatenate(outs)

    ur_out = ur0
    for lvl in range(n_levels):
        s = scale_factor ** lvl
        ur_lvl, safe = _sad_level(pyr_l[lvl], pyr_r[lvl], kp_l.xy, ur0, s)
        use = (kp_l.octave == lvl) & safe
        ur_out = jnp.where(use, ur_lvl, ur_out)
    return ur_out
