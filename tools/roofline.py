"""Per-kernel MFU / roofline accounting on the real TPU (VERDICT r4 item 3).

For every hot kernel: XLA's own cost analysis of the compiled single-call
program (flops + bytes accessed) combined with the measured steady device
time (scan-slope through the relay, same methodology as bench.py) gives

    achieved TFLOP/s, achieved GB/s,
    mfu        = achieved / peak matmul throughput,
    hbm_frac   = achieved / peak HBM bandwidth,
    roofline_x = t_measured / max(flops/peak, bytes/bw)   (1.0 = at roof)

Peaks (TPU v5e public spec): 197 TFLOP/s bf16 matmul, 819 GB/s HBM. The
package pins jax_default_matmul_precision=float32, so f32 matmuls run as
3-pass bf16x3 (~65.7 TFLOP/s effective peak); kernels whose matmuls opt
into bf16 (the Hamming matcher, the Pallas descriptor matmul) are judged
against the full 197.

Caveats (printed per kernel):
- XLA counts a while_loop body ONCE: iterative programs (pose LM's
  early-exit chain, the PCG inner loop) under-count; their rows carry a
  measured/assumed iteration multiplier instead.
- The Pallas kernel is a custom call XLA cannot cost: its flops/bytes are
  derived analytically from the kernel shapes (see _pallas_cost).

Usage: python tools/roofline.py [kernels...]   (default: all)
Emits one JSON line (consumed by ROADMAP/ROOFLINE tables) after a
human-readable table.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12      # v5e MXU, bf16
PEAK_F32 = PEAK_BF16 / 3.0  # 3-pass bf16x3 under precision=float32
PEAK_HBM = 819e9        # v5e HBM bytes/s

M_LONG = 8              # scan lengths for the slope method
M_SHORT = 1


def timed(run, reps=5):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run())          # fetch = the only real sync on axon
        best = min(best, time.perf_counter() - t0)
    return best


def scanned(fn, example, length):
    """fn(x)->scalar f32, carry-dependent so XLA cannot hoist/DCE."""
    @jax.jit
    def run(x):
        def body(c, _):
            # carry-dependent jitter on EVERY input (floats and ints):
            # the jitter is 0 at runtime but not provably so at compile
            # time, so XLA cannot hoist the body out of the scan
            ci = (c * 1e-20).astype(jnp.int32)

            def jit_leaf(a):
                if jnp.issubdtype(a.dtype, jnp.floating):
                    return a + (c * 1e-20).astype(a.dtype)
                if a.dtype == jnp.bool_:
                    return a
                return a + ci.astype(a.dtype)

            out = fn(jax.tree_util.tree_map(jit_leaf, x))
            return c + out * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
        return c
    return run


def _slope_once(fn, example, m_long, m_short, reps):
    long_r = scanned(fn, example, m_long)
    short_r = scanned(fn, example, m_short)
    np.asarray(long_r(example)); np.asarray(short_r(example))  # compile
    t_long = timed(lambda: long_r(example), reps)
    t_short = timed(lambda: short_r(example), reps)
    return max((t_long - t_short) / (m_long - m_short), 1e-9)


def slope_time(fn, example, reps=5):
    """Per-call steady device seconds: (t(M_long)-t(M_short))/(M_long-M_short).

    Cancels dispatch + fetch + relay overheads; valid because these
    kernels have no data-dependent early exit ACROSS calls (the pose LM's
    early exit is inside one call and converges identically each
    iteration of the scan since the input only moves by 1e-20).

    Relay round trips are ~30 ms with multi-ms tenant jitter, so the scan
    must hold >= ~25 ms of device work for the slope to resolve: sub-ms
    kernels are re-measured with a longer scan sized from the first
    estimate."""
    t = _slope_once(fn, example, M_LONG, M_SHORT, reps)
    if t * M_LONG < 25e-3:
        m2 = min(int(np.ceil(50e-3 / t)), 4096)
        if m2 > M_LONG:
            t = _slope_once(fn, example, m2, max(m2 // 8, 1), reps)
    return t


def xla_cost(fn, example):
    c = jax.jit(fn).lower(example).compile()
    d = c.cost_analysis()
    if isinstance(d, (list, tuple)):
        d = d[0]
    return float(d.get("flops", 0.0)), float(d.get("bytes accessed", 0.0))


def io_bytes(example):
    """Compulsory traffic: the input arrays (outputs of these kernels are
    small — packed descriptors / poses / masks). The true HBM traffic lies
    between this and XLA's per-op 'bytes accessed' (which counts fusion
    internals); the roofline bound uses the compulsory number."""
    return sum(np.asarray(a).nbytes
               for a in jax.tree_util.tree_leaves(example))


def row(name, t_s, flops, bytes_xla, bytes_io, peak_flops, note=""):
    tf = flops / t_s / 1e12
    t_roof = max(flops / peak_flops, bytes_io / PEAK_HBM)
    return {
        "kernel": name,
        "t_ms": round(t_s * 1e3, 3),
        "gflops": round(flops / 1e9, 3),
        "mb_io": round(bytes_io / 1e6, 2),
        "mb_xla": round(bytes_xla / 1e6, 2),
        "tflops_s": round(tf, 2),
        "mfu": round(flops / t_s / peak_flops, 4),
        "hbm_frac": round(bytes_io / t_s / PEAK_HBM, 4),
        # when the achieved fraction of BOTH roofs is tiny, the kernel is
        # limited by sequential dependency chains / fixed op latency, not
        # by a hardware throughput roof
        "bound": ("latency" if max(flops / peak_flops, bytes_io / PEAK_HBM)
                  < 0.02 * t_s
                  else "compute" if flops / peak_flops > bytes_io / PEAK_HBM
                  else "memory"),
        "roofline_x": round(t_s / max(t_roof, 1e-12), 1),
        "note": note,
    }


# ---------------------------------------------------------------------------
# kernel: full ORB extraction (640x480, 2000 features, 8 levels)
# ---------------------------------------------------------------------------
def _pallas_cost(n_kps):
    """Analytic flops/bytes of the fused orient+describe kernel
    (ops/pallas_orb.py): per keypoint one [48,128]@[128,512] bf16 matmul
    (descriptor gather), ~6 VPU passes over the 48x128 window (moments,
    one-hot build, row select), and VMEM window loads of raw f32 + blur
    bf16. Bytes here are VMEM traffic (the images are HBM-resident once:
    ~4 MB total for the pyramid + phase copies)."""
    from orbslam2_tpu.ops.pallas_orb import WIN_C, WIN_R
    matmul = 2.0 * WIN_R * WIN_C * 512
    vpu = 6.0 * WIN_R * WIN_C
    flops = n_kps * (matmul + vpu)
    vmem_bytes = n_kps * (WIN_R * WIN_C * (4 + 2) + 512 * 4)
    return flops, vmem_bytes


def k_extract():
    from orbslam2_tpu.ops import orb
    cfg = orb.ORBConfig(n_features=2000, n_levels=8)
    ex = orb.ORBExtractor(cfg, (480, 640))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))

    def f(x):
        kp = ex(x)
        return (jnp.sum(kp.xy) + jnp.sum(kp.response) + jnp.sum(kp.angle)
                + jnp.sum(kp.desc).astype(jnp.float32) * 1e-9)

    t = slope_time(f, img)
    flops, bytes_ = xla_cost(f, img)
    pf, pb = _pallas_cost(cfg.n_features)
    return row("extract_640x480_2000f", t, flops + pf, bytes_ + pb,
               io_bytes(img) + 2000 * (512 + 32 + 16), PEAK_F32,
               note="pallas custom call costed analytically "
                    f"({pf/1e9:.1f} GF bf16 gather-matmul); mixed f32/bf16 "
                    "judged vs f32 peak")


# ---------------------------------------------------------------------------
# kernel: dense Hamming matcher (2000 query x 4096 local map points)
# ---------------------------------------------------------------------------
def k_hamming():
    from orbslam2_tpu.ops import hamming
    rng = np.random.default_rng(0)
    d_a = jnp.asarray(rng.integers(0, 2**32, (2048, 8), np.uint32,
                                   endpoint=False))
    d_b = jnp.asarray(rng.integers(0, 2**32, (4096, 8), np.uint32,
                                   endpoint=False))

    def f(ab):
        a, b = ab
        dist = hamming.distance_matrix(a, b)
        bi, bd, sd = hamming.best_and_second(dist)
        return (jnp.sum(bd) + jnp.sum(sd) + jnp.sum(bi)).astype(jnp.float32)

    ex = (d_a, d_b)
    t = slope_time(f, ex)
    flops, bytes_ = xla_cost(f, ex)
    return row("hamming_2048x4096", t, flops, bytes_,
               io_bytes(ex) + 3 * 2048 * 4, PEAK_BF16,
               note="{-1,+1} bf16 matmul, f32 accumulate")


# ---------------------------------------------------------------------------
# kernel: per-frame pose LM (compacted N=1024, 4-round early-exit chain)
# ---------------------------------------------------------------------------
def k_pose_lm():
    from orbslam2_tpu.backend import pose_opt
    from orbslam2_tpu.geometry.camera import PinholeCamera
    cam = PinholeCamera(fx=520.0, fy=520.0, cx=320.0, cy=240.0, bf=40.0)
    rng = np.random.default_rng(0)
    n = 1024
    pts = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(4, 12, n)
    uv = np.stack([520.0 * pts[:, 0] / pts[:, 2] + 320.0,
                   520.0 * pts[:, 1] / pts[:, 2] + 240.0,
                   -np.ones(n)], 1).astype(np.float32)
    uv[:, :2] += rng.normal(size=(n, 2)).astype(np.float32)
    obs = pose_opt.make_pose_obs(
        jnp.asarray(pts), jnp.asarray(uv),
        jnp.asarray(rng.integers(0, 8, n, dtype=np.int32)),
        jnp.zeros(n, bool), jnp.ones(n, bool))
    tcw0 = jnp.eye(4, dtype=jnp.float32)

    def f(o):
        tcw, inl, ni = pose_opt.pose_optimization(tcw0, o, cam)
        return jnp.sum(tcw) + ni.astype(jnp.float32)

    t = slope_time(f, obs)
    flops, bytes_ = xla_cost(f, obs)
    # XLA counts the early-exit while body once per round; measured
    # convergence is ~8 effective LM iterations over the 4-round chain
    it_mult = 8.0
    return row("pose_lm_n1024", t, flops * it_mult, bytes_,
               io_bytes(obs) + 64, PEAK_F32,
               note="while-loop flops x8 (measured effective iters); "
                    "latency-bound sequential chain")


# ---------------------------------------------------------------------------
# kernel: local-BA LM step (dense Schur, stereo worker bucket)
# ---------------------------------------------------------------------------
def _ba_problem(n_cams, n_pts, n_obs, seed=0):
    from orbslam2_tpu.backend.ba import BAProblem
    from orbslam2_tpu.geometry import se3
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-6, 6, (n_pts, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(6, 18, n_pts)
    poses = np.stack([np.asarray(se3.exp(jnp.asarray(
        (rng.normal(size=6) * 0.05).astype(np.float32))))
        for _ in range(n_cams)])
    o_cam = rng.integers(0, n_cams, n_obs).astype(np.int32)
    o_pt = rng.integers(0, n_pts, n_obs).astype(np.int32)
    pc = np.einsum("nij,nj->ni", poses[o_cam][:, :3, :3], pts[o_pt]) \
        + poses[o_cam][:, :3, 3]
    uv = np.stack([500.0 * pc[:, 0] / pc[:, 2] + 320.0,
                   500.0 * pc[:, 1] / pc[:, 2] + 240.0,
                   -np.ones(n_obs)], 1).astype(np.float32)
    uv[:, :2] += rng.normal(size=(n_obs, 2)).astype(np.float32)
    cam_fixed = np.zeros(n_cams, bool)
    cam_fixed[0] = True
    return BAProblem(
        poses=jnp.asarray(poses), points=jnp.asarray(pts),
        cam_fixed=jnp.asarray(cam_fixed),
        obs_cam=jnp.asarray(o_cam), obs_pt=jnp.asarray(o_pt),
        obs_uv=jnp.asarray(uv),
        obs_inv_sigma2=jnp.ones(n_obs),
        obs_stereo=jnp.zeros(n_obs, bool),
        obs_valid=jnp.ones(n_obs, bool))


def k_local_ba():
    from orbslam2_tpu.backend import ba
    from orbslam2_tpu.geometry.camera import PinholeCamera
    cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0)
    prob = _ba_problem(16, 4096, 16384)

    def f_n(p, n_iter):
        r = ba.bundle_adjust(p, cam, phase_iters=(n_iter,))
        return jnp.sum(r.poses) + jnp.sum(r.points)

    # per-LM-step slope in iteration count (fixed-length scan, no early
    # exit in the local-BA LM chain -> slope is valid). XLA's cost model
    # counts a scan body ONCE regardless of trip count, so the per-step
    # flops/bytes come from the (1,)-vs-(0,) program delta instead.
    f5 = lambda p: f_n(p, 5)
    f1 = lambda p: f_n(p, 1)
    f0 = lambda p: f_n(p, 0)
    r5 = scanned(f5, prob, 2)
    r1 = scanned(f1, prob, 2)
    np.asarray(r5(prob)); np.asarray(r1(prob))
    t5 = timed(lambda: r5(prob)) / 2
    t1 = timed(lambda: r1(prob)) / 2
    t_step = max((t5 - t1) / 4.0, 1e-9)
    fl1, by1 = xla_cost(f1, prob)
    fl0, by0 = xla_cost(f0, prob)
    return row("local_ba_step_k16_o16k", t_step, fl1 - fl0,
               by1 - by0, io_bytes(prob), PEAK_F32,
               note="dense Schur LM step; flops/bytes = (1,)-vs-(0,) "
                    "XLA program delta (scan bodies counted once)")


# ---------------------------------------------------------------------------
# kernel: global-BA (PCG) LM step at production scale (256 KF / 64k obs)
# ---------------------------------------------------------------------------
def k_gba():
    from orbslam2_tpu.backend import ba
    from orbslam2_tpu.geometry.camera import PinholeCamera
    cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0)
    prob = _ba_problem(256, 16384, 65536)

    def f_n(p, n_iter):
        r = ba.bundle_adjust_pcg(p, cam, phase_iters=(n_iter,),
                                 pcg_iters=30)
        return jnp.sum(r.poses) + jnp.sum(r.points)

    # t(1 step) - t(0 steps) from the identical initial state: the
    # truncated-CG early stop makes an iteration slope invalid
    # (CLAUDE.md round-4 lesson)
    f1 = lambda p: f_n(p, 1)
    f0 = lambda p: f_n(p, 0)
    r1 = scanned(f1, prob, 1)
    r0 = scanned(f0, prob, 1)
    np.asarray(r1(prob)); np.asarray(r0(prob))
    t1 = timed(lambda: r1(prob), reps=4)
    t0 = timed(lambda: r0(prob), reps=4)
    t_step = max(t1 - t0, 1e-9)
    fl1, by1 = xla_cost(f1, prob)
    fl0, by0 = xla_cost(f0, prob)
    # the PCG while body is counted once; charge the full 30 iterations
    # (first LM step runs unconverged -> full depth)
    # the PCG while body is counted once by XLA; charge the 30 CG
    # iterations analytically (flat matvec: ~150 FLOP/obs + pose/point
    # block work per iteration) on top of the program delta
    n_obs, k, p = 65536, 256, 16384
    cg_analytic = 30.0 * (n_obs * 150 + k * 100 + p * 60)
    return row("gba_step_k256_o65k", t_step, (fl1 - fl0) + cg_analytic,
               (by1 - by0) * 1.0, io_bytes(prob), PEAK_F32,
               note="PCG while body counted once by XLA; +analytic 30-iter "
                    "CG flops. Sequential CG chain -> latency-bound")


KERNELS = {
    "extract": k_extract,
    "hamming": k_hamming,
    "pose_lm": k_pose_lm,
    "local_ba": k_local_ba,
    "gba": k_gba,
}


def main():
    names = sys.argv[1:] or list(KERNELS)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rows = []
    for n in names:
        t0 = time.time()
        r = KERNELS[n]()
        print(f"[{n}] {time.time()-t0:.0f}s  t={r['t_ms']} ms  "
              f"{r['tflops_s']} TF/s  mfu={r['mfu']}  "
              f"hbm={r['hbm_frac']}  bound={r['bound']}  "
              f"roofline_x={r['roofline_x']}", file=sys.stderr, flush=True)
        rows.append(r)
    hdr = (f"{'kernel':26s} {'t_ms':>8s} {'GFLOP':>8s} {'MB_io':>8s} "
           f"{'MB_xla':>8s} {'TF/s':>7s} {'MFU':>7s} {'HBM%':>6s} "
           f"{'bound':>8s} {'x-off':>6s}")
    print(hdr)
    for r in rows:
        print(f"{r['kernel']:26s} {r['t_ms']:8.3f} {r['gflops']:8.2f} "
              f"{r['mb_io']:8.1f} {r['mb_xla']:8.1f} {r['tflops_s']:7.2f} "
              f"{r['mfu']*100:6.2f}% {r['hbm_frac']*100:5.1f}% "
              f"{r['bound']:>8s} {r['roofline_x']:6.1f}")
    print(json.dumps({"roofline": rows}))


if __name__ == "__main__":
    main()
