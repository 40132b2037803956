"""Per-stage timing breakdown of ORB extraction on the real TPU.

Times each pipeline stage of the extractor (reference workload: 2000
features / 8 levels / 640x480) as its own scanned device program, using the
same fixed-overhead-cancelling slope method as bench.py. Axon notes
(CLAUDE.md): block_until_ready is a no-op; dispatch is synchronous, so
subtracting the trivial-program time isolates device time. Carry-dependent
bodies stop XLA from hoisting the work out of the scan.

Usage:  python tools/profile_extraction.py [reps_per_program]
"""
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
        jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = orb.ORBConfig(n_features=2000, n_levels=8)
    ex = orb.ORBExtractor(cfg, (480, 640))
    rng = np.random.default_rng(0)
    img_np = rng.uniform(0, 255, (480, 640)).astype(np.float32)
    img = jax.device_put(jnp.asarray(img_np))
    M = int(os.environ.get("PROF_M", "8"))  # scan length per program

    def scanned(fn):
        @jax.jit
        def run(x):
            def body(c, _):
                out = fn(x + c * 1e-20)
                return c + out * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=M)
            return c
        return run

    # ---- stage functions (mirror _extract_level's structure) -----------
    def all_levels(stage_fn):
        def run(x):
            tot = jnp.float32(0.0)
            im = x
            for level in range(cfg.n_levels):
                lh, lw = ex.level_shapes[level]
                if level > 0:
                    im = jax.image.resize(x, (lh, lw), method="bilinear")
                tot = tot + stage_fn(im, level)
            return tot
        return run

    def s_pyramid(x):
        tot = jnp.float32(0.0)
        for level in range(1, cfg.n_levels):
            lh, lw = ex.level_shapes[level]
            tot = tot + jnp.sum(jax.image.resize(x, (lh, lw), method="bilinear"))
        return tot

    def s_fast(im, level):
        c1, s1 = orb.fast_response(im, cfg.ini_th_fast)
        c2, _ = orb.fast_response(im, cfg.min_th_fast)
        return jnp.sum(s1) + jnp.sum(c1) + jnp.sum(c2)

    def s_select(im, level):
        # FAST outputs emulated from the image itself to isolate the
        # NMS + cell/topk selection cost.
        lh, lw = im.shape
        score = im * 1e-3
        detected = im > 128.0
        cell = cfg.cell_size
        ph = (cell - lh % cell) % cell
        pw = (cell - lw % cell) % cell
        det_p = jnp.pad(detected, ((0, ph), (0, pw)))
        score_p = jnp.pad(score, ((0, ph), (0, pw)))
        nms_score = jnp.where(det_p, score_p, -jnp.inf)
        keep = det_p & orb._nms3(nms_score)
        cand = jnp.where(keep, score_p, -jnp.inf)
        hp, wp = cand.shape
        ncy, ncx = hp // cell, wp // cell
        # mirrors orb._extract_level: cell-bucketed iterative masked argmax
        # (a reduce_window int-max variant A/B'd 4x slower on v5e)
        cells = cand.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3).reshape(ncy * ncx, cell * cell)
        tv, ti = orb._topk_small(cells, cfg.cell_topk)
        flat = tv.reshape(-1)
        k = min(ex.level_budgets[level], flat.shape[0])
        sv, si = jax.lax.top_k(flat, k)
        return jnp.sum(jnp.where(jnp.isfinite(sv), sv, 0.0)) + jnp.sum(si) * 1e-9 + jnp.sum(ti) * 1e-9

    def fixed_kps(level, lh, lw):
        budget = ex.level_budgets[level]
        r = np.random.default_rng(level)
        ys = jnp.asarray(r.integers(20, lh - 20, budget), jnp.int32)
        xs = jnp.asarray(r.integers(20, lw - 20, budget), jnp.int32)
        return ys, xs

    def s_moments(im, level):
        lh, lw = im.shape
        ys, xs = fixed_kps(level, lh, lw)
        patch = 2 * orb.HALF_PATCH + 1
        def one(y, x):
            return jax.lax.dynamic_slice(
                im, (jnp.clip(y - orb.HALF_PATCH, 0, lh - patch),
                     jnp.clip(x - orb.HALF_PATCH, 0, lw - patch)), (patch, patch))
        patches = jax.vmap(one)(ys, xs)
        m10 = jnp.einsum("kij,ij->k", patches, jnp.asarray(ex.k10))
        m01 = jnp.einsum("kij,ij->k", patches, jnp.asarray(ex.k01))
        return jnp.sum(jnp.arctan2(m01, m10))

    def s_blur(im, level):
        return jnp.sum(orb._separable_conv(im, ex.blur_kernel))

    def s_desc(im, level):
        lh, lw = im.shape
        ys, xs = fixed_kps(level, lh, lw)
        ang = (xs % 7).astype(jnp.float32)
        d = ex._descriptors(im, xs, ys, ang)
        return jnp.sum(d).astype(jnp.float32) * 1e-9

    def s_full(x):
        kp = ex(x)
        return (jnp.sum(kp.xy) + jnp.sum(kp.response) + jnp.sum(kp.angle)
                + jnp.sum(kp.desc).astype(jnp.float32) * 1e-9
                + jnp.sum(kp.valid))

    programs = {
        "full_extract": scanned(s_full),
        "pyramid": scanned(s_pyramid),
        "fast": scanned(all_levels(s_fast)),
        "select_nms_topk": scanned(all_levels(s_select)),
        "moments": scanned(all_levels(s_moments)),
        "blur": scanned(all_levels(s_blur)),
        "descriptors": scanned(all_levels(s_desc)),
    }

    @jax.jit
    def trivial(x):
        return x + 1.0

    z = jax.device_put(jnp.float32(0.0))
    np.asarray(trivial(z))  # warm dispatch
    t_fixed = timed(lambda: np.asarray(trivial(z)), reps)
    print(f"fixed dispatch: {t_fixed*1e3:.1f} ms", flush=True)

    results = {}
    for name, prog in programs.items():
        t0 = time.perf_counter()
        np.asarray(prog(img))  # compile
        tc = time.perf_counter() - t0
        t = timed(lambda p=prog: np.asarray(p(img)), reps)
        per = (t - t_fixed) / M * 1e3
        results[name] = per
        print(f"{name:18s} {per:8.2f} ms/call   (compile {tc:.0f}s)", flush=True)

    print("\nsummary (ms per frame):", flush=True)
    for k, v in results.items():
        print(f"  {k:18s} {v:8.2f}", flush=True)


if __name__ == "__main__":
    main()
