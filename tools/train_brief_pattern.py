"""Train a greedy-decorrelated rBRIEF test pattern (ORB paper sec. 4.3).

The reference ships OpenCV's learned ``bit_pattern_31_`` table
(/root/reference/src/ORBextractor.cc:160-460) — 256 tests selected by a
greedy search that maximizes per-test variance (mean near 0.5) while
bounding pairwise correlation over a large corpus of *oriented* patches.
Copying the table is barred (and the sampling semantics differ anyway:
this framework samples single blurred pixels at float offsets, not 5x5
subwindows), so this tool re-runs the paper's learning procedure on the
same synthetic natural-image-statistics corpus used for the vocabulary
(tools/train_xxl_voc.py) with patches oriented by the extractor's own
IC-angle — matching runtime semantics exactly:

    bit = blurred[p + round(R(theta) @ a)] < blurred[p + round(R @ b)]

Constraint carried from the runtime kernel: every test point has L2 norm
<= 13 so any rotation stays inside the 31x31 patch (ops/orb.py
make_pattern, pallas_orb window geometry).

Writes orbslam2_tpu/ops/data/brief_pattern_learned.npz.
Usage: python tools/train_brief_pattern.py [n_images=220]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from orbslam2_tpu.ops.orb import (  # noqa: E402
    HALF_PATCH, ORBConfig, ORBExtractor, PATCH)

OUT = os.path.join(os.path.dirname(__file__), "..", "orbslam2_tpu", "ops",
                   "data", "brief_pattern_learned.npz")
POP = np.array([bin(i).count("1") for i in range(256)], np.uint16)


# ----------------------------------------------------------------------
# 1. oriented blurred patches from the synthetic corpus
# ----------------------------------------------------------------------
def collect_patches(n_images: int, per_image: int = 160,
                    seed: int = 20260821):
    from tools.train_xxl_voc import lighting, pink_texture
    from orbslam2_tpu.io.synthetic import SyntheticSequence, make_texture
    from orbslam2_tpu.geometry.camera import PinholeCamera

    rng = np.random.default_rng(seed)
    ex = ORBExtractor(ORBConfig(n_features=1200, n_levels=4), (480, 640))
    ex_jit = jax.jit(ex.extract_with_pyramid)
    cam = PinholeCamera(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                        width=640, height=480, bf=40.0)

    patches, angles = [], []
    half = HALF_PATCH  # 15

    def grab(img):
        kp, pyr = ex_jit(jnp.asarray(img.astype(np.float32)))
        valid = np.asarray(kp.valid)
        xy = np.asarray(kp.xy)[valid]
        ang = np.asarray(kp.angle)[valid]
        octv = np.asarray(kp.octave)[valid]
        keep = rng.permutation(len(xy))[:per_image]
        for j in keep:
            lvl = int(octv[j])
            blurred = np.asarray(pyr[lvl])
            s = ex.scales[lvl]
            x = int(round(xy[j, 0] / s))
            y = int(round(xy[j, 1] / s))
            lh, lw = blurred.shape
            if not (half <= y < lh - half and half <= x < lw - half):
                continue
            patches.append(
                blurred[y - half:y + half + 1, x - half:x + half + 1])
            angles.append(ang[j])

    n_pink = int(n_images * 0.40)
    n_tex = int(n_images * 0.25)
    for i in range(n_pink):
        img = pink_texture(rng, 768, float(rng.uniform(0.8, 1.6)))
        r0 = int(rng.integers(0, 768 - 480))
        grab(lighting(rng, img[r0:r0 + 480, :640]))
    for i in range(n_tex):
        tex = make_texture(rng, 768)
        if rng.random() < 0.5:
            tex = np.rot90(tex, k=int(rng.integers(1, 4))).copy()
        r0 = int(rng.integers(0, tex.shape[0] - 480))
        c0 = int(rng.integers(0, tex.shape[1] - 640))
        img = np.clip(tex[r0:r0 + 480, c0:c0 + 640]
                      * float(rng.uniform(0.5, 1.6)), 0, 255)
        grab(lighting(rng, img))
    worlds = ["cluttered", "room"]
    trajs = ["panorama", "lateral", "circuit", "forward"]
    s = 0
    target = n_images - n_pink - n_tex
    made = 0
    while made < target:
        try:
            seq = SyntheticSequence(cam, n_frames=4,
                                    trajectory=trajs[s % len(trajs)],
                                    seed=9100 + s, world=worlds[s % 2])
        except Exception:
            s += 1
            continue
        for f in range(seq.n_frames):
            gray, _ = seq.render(f)
            grab(gray)
            made += 1
            if made >= target:
                break
        s += 1
    return np.stack(patches).astype(np.float32), np.asarray(angles, np.float32)


# ----------------------------------------------------------------------
# 2. candidate tests and their bit outcomes over all patches
# ----------------------------------------------------------------------
def candidate_pool(m: int, seed: int = 5) -> np.ndarray:
    """[M, 2, 2] candidate (a, b) offset pairs, L2-clipped to radius 13:
    60% BRIEF-style Gaussian sigma=PATCH/5, 40% uniform in the disk (the
    learned-table statistics favor wider spread than the Gaussian)."""
    rng = np.random.default_rng(seed)
    n_g = int(m * 0.6)
    g = rng.normal(0.0, PATCH / 5.0, size=(n_g, 2, 2))
    u_r = 13.0 * np.sqrt(rng.uniform(0.02, 1.0, size=(m - n_g, 2)))
    u_t = rng.uniform(0, 2 * np.pi, size=(m - n_g, 2))
    u = np.stack([u_r * np.cos(u_t), u_r * np.sin(u_t)], axis=-1)
    pts = np.concatenate([g, u], axis=0)
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    pts = pts * np.minimum(1.0, 13.0 / np.maximum(norm, 1e-9))
    # drop degenerate pairs (a ~ b never fires)
    keep = np.linalg.norm(pts[:, 0] - pts[:, 1], axis=-1) > 2.0
    return pts[keep].astype(np.float32)


def test_bits(patches: np.ndarray, angles: np.ndarray,
              cands: np.ndarray, chunk: int = 512) -> np.ndarray:
    """[M, ceil(N/8)] packed bit outcomes (runtime semantics: rotated,
    rounded, single blurred pixel compare)."""
    n = len(patches)
    ca, sa = np.cos(angles), np.sin(angles)
    out = []
    flat = patches.reshape(n, -1)
    w = patches.shape[2]
    for c0 in range(0, len(cands), chunk):
        cc = cands[c0:c0 + chunk]                       # [C, 2, 2]
        dx = cc[:, :, 0].reshape(1, -1)                 # [1, 2C]
        dy = cc[:, :, 1].reshape(1, -1)
        rx = np.round(dx * ca[:, None] - dy * sa[:, None]).astype(np.int32)
        ry = np.round(dx * sa[:, None] + dy * ca[:, None]).astype(np.int32)
        idx = (ry + HALF_PATCH) * w + (rx + HALF_PATCH)  # [N, 2C]
        v = np.take_along_axis(flat, idx, axis=1).reshape(n, -1, 2)
        bits = (v[:, :, 0] < v[:, :, 1])                # [N, C]
        out.append(np.packbits(bits.T, axis=1))         # [C, N/8]
    return np.concatenate(out, axis=0)


# ----------------------------------------------------------------------
# 3. greedy decorrelated selection (ORB paper sec. 4.3)
# ----------------------------------------------------------------------
def greedy_select(bp: np.ndarray, n_patches: int, n_out: int = 256,
                  thr0: float = 0.2, thr_step: float = 0.05):
    counts = POP[bp].sum(axis=1).astype(np.float64)
    means = counts / n_patches
    order = np.argsort(np.abs(means - 0.5), kind="stable")
    thr = thr0
    while True:
        sel: list[int] = []
        sel_bp = np.empty((n_out, bp.shape[1]), np.uint8)
        sel_m = np.empty(n_out, np.float64)
        for t in order:
            mt = means[t]
            if mt < 0.03 or mt > 0.97:
                continue
            if sel:
                p11 = POP[sel_bp[:len(sel)] & bp[t]].sum(axis=1) / n_patches
                ms = sel_m[:len(sel)]
                denom = np.sqrt(np.maximum(
                    mt * (1 - mt) * ms * (1 - ms), 1e-12))
                phi = np.abs(p11 - mt * ms) / denom
                if phi.max() >= thr:
                    continue
            sel_bp[len(sel)] = bp[t]
            sel_m[len(sel)] = mt
            sel.append(int(t))
            if len(sel) == n_out:
                return np.asarray(sel), thr
        thr += thr_step
        if thr > 1.0:
            raise RuntimeError(f"only {len(sel)} tests found")


def pattern_stats(bp: np.ndarray, n_patches: int) -> tuple:
    means = POP[bp].sum(axis=1).astype(np.float64) / n_patches
    m = len(bp)
    corrs = []
    for i in range(m):
        p11 = POP[bp[i + 1:] & bp[i]].sum(axis=1) / n_patches
        ms = means[i + 1:]
        denom = np.sqrt(np.maximum(
            means[i] * (1 - means[i]) * ms * (1 - ms), 1e-12))
        corrs.append(np.abs(p11 - means[i] * ms) / denom)
    corr = np.concatenate(corrs) if corrs else np.zeros(1)
    return (float(np.abs(means - 0.5).mean()), float(corr.mean()),
            float(corr.max()))


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 220
    t0 = time.time()
    print(f"collecting oriented patches from {n_images} corpus images ...",
          flush=True)
    patches, angles = collect_patches(n_images)
    print(f"  {len(patches)} patches in {time.time() - t0:.0f}s", flush=True)

    cands = candidate_pool(24576)
    print(f"evaluating {len(cands)} candidate tests ...", flush=True)
    bp = test_bits(patches, angles, cands)
    sel, thr = greedy_select(bp, len(patches))
    pattern = cands[sel]                                  # [256, 2, 2]

    var_m, corr_mean, corr_max = pattern_stats(bp[sel], len(patches))
    from orbslam2_tpu.ops.orb import make_pattern
    base = make_pattern(20120904)
    bp_base = test_bits(patches, angles, base.astype(np.float32))
    bvar, bcorr_mean, bcorr_max = pattern_stats(bp_base, len(patches))
    print(f"selected 256/{len(cands)} at corr thr {thr:.2f} "
          f"({time.time() - t0:.0f}s)")
    print(f"  learned: |mean-0.5| {var_m:.4f}, |corr| mean {corr_mean:.4f} "
          f"max {corr_max:.4f}")
    print(f"  gaussian baseline: |mean-0.5| {bvar:.4f}, |corr| mean "
          f"{bcorr_mean:.4f} max {bcorr_max:.4f}")

    np.savez_compressed(
        OUT, pattern=pattern.astype(np.float32),
        meta=np.asarray([len(patches), len(cands), thr], np.float32))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
