"""Monocular two-view bootstrap: batched H / F RANSAC + reconstruction.

Replaces the reference Initializer (/root/reference/src/Initializer.cc),
which scores homography and fundamental hypotheses in two parallel threads
over 200 8-point RANSAC sets (Initializer.cc:89-142). Here all 200 sets for
BOTH models are evaluated in one vmapped pass each; model selection uses the
same RH = SH/(SH+SF) > 0.40 rule.

Reconstruction mirrors ReconstructF (E decomposition -> 4 cheirality
hypotheses, Initializer.cc:533-640) and ReconstructH (Faugeras's 8-solution
decomposition, Initializer.cc:642-812), with all candidate triangulations
batched. Thresholds: chi2 5.991 (H symmetric transfer), 3.841/5.991 (F
epipolar), min parallax 1 degree.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry import triangulate as tri

SIGMA = 1.0
CHI2_H = 5.991
CHI2_F_DIR = 3.841
CHI2_F_SCORE = 5.991


class InitResult(NamedTuple):
    success: jax.Array      # bool
    used_homography: jax.Array  # bool
    r21: jax.Array          # [3, 3] rotation frame1 -> frame2
    t21: jax.Array          # [3] unit-norm translation
    points: jax.Array       # [N, 3] triangulated points in frame-1 coords
    good: jax.Array         # [N] bool triangulation accepted
    n_good: jax.Array       # int32


def _normalize(uv: jax.Array, valid: jax.Array):
    """Hartley normalization (Initializer.cc:831-869): zero-mean, unit mean
    absolute deviation. -> (normalized uv, T [3,3])."""
    w = valid.astype(uv.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(uv * w[:, None], axis=0) / n
    dev = jnp.sum(jnp.abs(uv - mean) * w[:, None], axis=0) / n
    s = 1.0 / jnp.maximum(dev, 1e-9)
    uvn = (uv - mean) * s
    t = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], uv.dtype)
    t = t.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    t = t.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return uvn, t


def _dlt_homography(p1: jax.Array, p2: jax.Array, w: jax.Array | None = None) -> jax.Array:
    """H21 from >= 4 normalized correspondences via (weighted) DLT."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    rows_a = jnp.stack([zero, zero, zero, -x1, -y1, -one, y2 * x1, y2 * y1, y2], axis=-1)
    rows_b = jnp.stack([x1, y1, one, zero, zero, zero, -x2 * x1, -x2 * y1, -x2], axis=-1)
    a = jnp.concatenate([rows_a, rows_b], axis=0)
    if w is not None:
        ww = jnp.concatenate([w, w])[:, None]
        a = a * ww
    _, v = jnp.linalg.eigh(a.T @ a)
    h = v[:, 0].reshape(3, 3)
    return h


def _eight_point_f(p1: jax.Array, p2: jax.Array, w: jax.Array | None = None) -> jax.Array:
    """F21 from >= 8 normalized correspondences (weighted); rank-2 enforced."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    one = jnp.ones_like(x1)
    a = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1)
    if w is not None:
        a = a * w[:, None]
    _, v = jnp.linalg.eigh(a.T @ a)
    f = v[:, 0].reshape(3, 3)
    u, d, vt = jnp.linalg.svd(f)
    d = d.at[2].set(0.0)
    return u @ jnp.diag(d) @ vt


def _score_h(h21: jax.Array, uv1: jax.Array, uv2: jax.Array, valid: jax.Array):
    """Symmetric transfer score (Initializer.cc:CheckHomography)."""
    h12 = jnp.linalg.inv(h21 + 1e-12 * jnp.eye(3))

    def transfer(h, a, b):
        x = h[0, 0] * a[:, 0] + h[0, 1] * a[:, 1] + h[0, 2]
        y = h[1, 0] * a[:, 0] + h[1, 1] * a[:, 1] + h[1, 2]
        z = h[2, 0] * a[:, 0] + h[2, 1] * a[:, 1] + h[2, 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        du = b[:, 0] - x * inv_z
        dv = b[:, 1] - y * inv_z
        return (du * du + dv * dv) / (SIGMA * SIGMA)

    c1 = transfer(h21, uv1, uv2)
    c2 = transfer(h12, uv2, uv1)
    in1 = (c1 < CHI2_H) & valid
    in2 = (c2 < CHI2_H) & valid
    score = jnp.sum(jnp.where(in1, CHI2_H - c1, 0.0) + jnp.where(in2, CHI2_H - c2, 0.0))
    return score, in1 & in2


def _line_dist_sq(line: jax.Array, uv: jax.Array) -> jax.Array:
    """Squared distance of pixels [N,2] from lines [N,3] (ax+by+c=0)."""
    num = line[:, 0] * uv[:, 0] + line[:, 1] * uv[:, 1] + line[:, 2]
    den = line[:, 0] ** 2 + line[:, 1] ** 2
    return num * num / jnp.maximum(den, 1e-12)


def _score_f(f21: jax.Array, uv1: jax.Array, uv2: jax.Array, valid: jax.Array):
    """Epipolar distance score (Initializer.cc:CheckFundamental).
    Convention: x2^T F21 x1 = 0, so the line in image 2 is F21 x1 and the
    line in image 1 is F21^T x2."""
    ones = jnp.ones_like(uv1[:, :1])
    x1h = jnp.concatenate([uv1, ones], axis=1)
    x2h = jnp.concatenate([uv2, ones], axis=1)
    line2 = x1h @ f21.T   # [N, 3] = (F21 x1)^T rows
    line1 = x2h @ f21     # [N, 3] = (F21^T x2)^T rows
    d2 = _line_dist_sq(line2, uv2) / (SIGMA * SIGMA)
    d1 = _line_dist_sq(line1, uv1) / (SIGMA * SIGMA)
    in1 = (d2 < CHI2_F_DIR) & valid
    in2 = (d1 < CHI2_F_DIR) & valid
    score = jnp.sum(jnp.where(in1, CHI2_F_SCORE - d2, 0.0)
                    + jnp.where(in2, CHI2_F_SCORE - d1, 0.0))
    return score, in1 & in2


def _check_rt(r: jax.Array, t: jax.Array, uv1: jax.Array, uv2: jax.Array,
              valid: jax.Array, k: jax.Array):
    """Cheirality + reprojection gate for one (R, t) hypothesis
    (Initializer::CheckRT, Initializer.cc:874-981).
    -> (n_good, good mask, parallax_cos_50th, points3d)."""
    eye34 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    p1 = k @ eye34
    rt = jnp.concatenate([r, t[:, None]], axis=1)
    p2 = k @ rt
    pts = tri.triangulate_dlt(p1[None], p2[None], uv1, uv2)  # [N, 3] frame-1

    finite = jnp.all(jnp.isfinite(pts), axis=-1)
    z1 = pts[:, 2]
    pts2 = pts @ r.T + t
    z2 = pts2[:, 2]

    c1 = jnp.zeros(3)
    c2 = -r.T @ t
    pcos = tri.parallax_cos(c1, c2, pts)

    e1, _ = tri.reprojection_error_sq(k, jnp.eye(4).at[:3, :4].set(eye34), pts, uv1)
    t2m = jnp.eye(4).at[:3, :4].set(rt)
    e2, _ = tri.reprojection_error_sq(k, t2m, pts, uv2)

    th = 4.0 * SIGMA * SIGMA
    good = (valid & finite & (z1 > 0) & (z2 > 0) & (pcos < 0.99998)
            & (e1 < th) & (e2 < th))
    n_good = jnp.sum(good.astype(jnp.int32))
    # parallax statistic: ~50th best (reference takes the 50th smallest angle)
    pcos_sorted = jnp.sort(jnp.where(good, pcos, 1.0))
    idx = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    parallax_cos50 = pcos_sorted[idx]
    return n_good, good, parallax_cos50, pts


def _decompose_e(e: jax.Array):
    """E -> 4 (R, t) hypotheses (DecomposeE, Initializer.cc:983-1027)."""
    u, _, vt = jnp.linalg.svd(e)
    w = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    r1 = u @ w @ vt
    r2 = u @ w.T @ vt
    r1 = r1 * jnp.sign(jnp.linalg.det(r1))
    r2 = r2 * jnp.sign(jnp.linalg.det(r2))
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    rs = jnp.stack([r1, r1, r2, r2])
    ts = jnp.stack([t, -t, t, -t])
    return rs, ts


def _decompose_h(h21: jax.Array, k: jax.Array):
    """Faugeras SVD decomposition of a homography into 8 motion hypotheses
    (ReconstructH, Initializer.cc:642-812)."""
    a = jnp.linalg.inv(k) @ h21 @ k
    u, d, vt = jnp.linalg.svd(a)
    s = jnp.linalg.det(u) * jnp.linalg.det(vt)
    d1, d2, d3 = d[0], d[1], d[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' > 0 (theta)
    aux_st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    sts = jnp.array([aux_st, -aux_st, -aux_st, aux_st])

    def make_rt_pos(i):
        st = sts[i]
        rp = jnp.array([[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]])
        r = s * u @ rp @ vt
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = u @ tp
        return r, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    # case d' < 0 (phi)
    aux_sp = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sps = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])

    def make_rt_neg(i):
        sp = sps[i]
        rp = jnp.array([[cp, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cp]])
        r = s * u @ rp @ vt
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = u @ tp
        return r, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    rs_pos, ts_pos = jax.vmap(make_rt_pos)(jnp.arange(4))
    rs_neg, ts_neg = jax.vmap(make_rt_neg)(jnp.arange(4))
    return jnp.concatenate([rs_pos, rs_neg]), jnp.concatenate([ts_pos, ts_neg])


@functools.partial(jax.jit, static_argnames=("iters",))
def initialize_two_view(
    uv1: jax.Array,
    uv2: jax.Array,
    valid: jax.Array,
    k: jax.Array,
    key: jax.Array,
    iters: int = 200,
) -> InitResult:
    """Full monocular bootstrap on matched pairs (uv1[i] <-> uv2[i]).

    All RANSAC hypotheses for both models are scored in parallel; the
    winning model is reconstructed with all its candidate motions checked
    by batched triangulation; acceptance mirrors Initializer.cc:
    clear cheirality winner, >= 50 good points, >= 90% of best, parallax.
    """
    n = uv1.shape[0]
    uv1n, t1 = _normalize(uv1, valid)
    uv2n, t2 = _normalize(uv2, valid)

    # --- sample 8-point sets among valid matches --------------------------
    probs = valid.astype(jnp.float32) / jnp.maximum(jnp.sum(valid), 1)
    keys = jax.random.split(key, iters)

    def sample(k_):
        return jax.random.choice(k_, n, shape=(8,), replace=False, p=probs)

    sets = jax.vmap(sample)(keys)  # [iters, 8]

    # --- homography hypotheses -------------------------------------------
    def h_hypo(idx):
        h_n = _dlt_homography(uv1n[idx], uv2n[idx])
        h = jnp.linalg.inv(t2) @ h_n @ t1    # de-normalize: x2 = H21 x1
        h = h / jnp.where(jnp.abs(h[2, 2]) < 1e-12, 1e-12, h[2, 2])
        score, inl = _score_h(h, uv1, uv2, valid)
        return h, score

    hs, h_scores = jax.vmap(h_hypo)(sets)
    best_h_i = jnp.argmax(h_scores)
    best_h = hs[best_h_i]
    sh = h_scores[best_h_i]

    # --- fundamental hypotheses ------------------------------------------
    def f_hypo(idx):
        f_n = _eight_point_f(uv1n[idx], uv2n[idx])
        f = t2.T @ f_n @ t1
        score, inl = _score_f(f, uv1, uv2, valid)
        return f, score

    fs, f_scores = jax.vmap(f_hypo)(sets)
    best_f_i = jnp.argmax(f_scores)
    best_f = fs[best_f_i]
    sf = f_scores[best_f_i]

    rh = sh / jnp.maximum(sh + sf, 1e-12)
    use_h = rh > 0.40

    # refine the winning models on their full inlier sets (two rounds of
    # all-inlier least squares; recovers the precision the reference gets
    # from double-precision 8-point fits)
    def refine_f(f):
        _, inl = _score_f(f, uv1, uv2, valid)
        f_n = _eight_point_f(uv1n, uv2n, inl.astype(uv1.dtype))
        return t2.T @ f_n @ t1

    def refine_h(h):
        _, inl = _score_h(h, uv1, uv2, valid)
        h_n = _dlt_homography(uv1n, uv2n, inl.astype(uv1.dtype))
        h = jnp.linalg.inv(t2) @ h_n @ t1
        return h / jnp.where(jnp.abs(h[2, 2]) < 1e-12, 1e-12, h[2, 2])

    best_f = refine_f(refine_f(best_f))
    best_h = refine_h(refine_h(best_h))

    _, h_inliers = _score_h(best_h, uv1, uv2, valid)
    _, f_inliers = _score_f(best_f, uv1, uv2, valid)
    inliers = jnp.where(use_h, h_inliers, f_inliers)

    # --- motion hypotheses: pad F's 4 to 8 so shapes are static ----------
    e = k.T @ best_f @ k
    rs_f, ts_f = _decompose_e(e)
    rs_f = jnp.concatenate([rs_f, jnp.broadcast_to(jnp.eye(3), (4, 3, 3))])
    ts_f = jnp.concatenate([ts_f, jnp.zeros((4, 3))])
    f_hypo_valid = jnp.arange(8) < 4
    rs_h, ts_h = _decompose_h(best_h, k)
    rs = jnp.where(use_h, rs_h, rs_f)
    ts = jnp.where(use_h, ts_h, ts_f)
    hypo_valid = jnp.where(use_h, jnp.ones(8, bool), f_hypo_valid)

    n_goods, goods, pcos, ptss = jax.vmap(
        lambda r, t: _check_rt(r, t, uv1, uv2, inliers, k))(rs, ts)
    n_goods = jnp.where(hypo_valid, n_goods, -1)

    best = jnp.argmax(n_goods)
    n_best = n_goods[best]
    # clear-winner rule: no other hypothesis within 70% of best
    # (reference: nsimilar <= 1 at 0.7*maxGood, Initializer.cc:595-600)
    n_similar = jnp.sum((n_goods > 0.7 * n_best).astype(jnp.int32))
    n_inliers = jnp.sum(inliers.astype(jnp.int32))
    min_good = jnp.maximum((0.9 * n_inliers).astype(jnp.int32), 50)
    parallax_ok = pcos[best] < jnp.cos(jnp.deg2rad(1.0))
    success = (n_best >= min_good) & (n_similar == 1) & parallax_ok

    return InitResult(
        success=success,
        used_homography=use_h,
        r21=rs[best],
        t21=ts[best],
        points=ptss[best],
        good=goods[best],
        n_good=n_best,
    )
