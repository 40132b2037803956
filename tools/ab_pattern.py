"""A/B: learned decorrelated BRIEF pattern vs the seeded-Gaussian baseline.

Measures, over synthetic worlds with ground-truth geometry (VERDICT r3
item 5 'Done' criterion):
  1. two-view matcher inlier ratio: matches whose partner lands within
     3 px of the ground-truth reprojection (gt pose + rendered depth)
  2. BoW word repeatability: fraction of gt-corresponding keypoint pairs
     assigned the same vocabulary leaf (drives KFDB retrieval directly);
     each pattern gets its own freshly trained small tree for fairness
  3. KFDB same-place-vs-elsewhere score margin with those trees

Usage: python tools/ab_pattern.py
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from orbslam2_tpu.geometry.camera import PinholeCamera  # noqa: E402
from orbslam2_tpu.io.synthetic import SyntheticSequence, make_texture  # noqa: E402
from orbslam2_tpu.ops import hamming  # noqa: E402
from orbslam2_tpu.ops.orb import ORBConfig, ORBExtractor  # noqa: E402
from orbslam2_tpu.place import vocabulary as voc_mod  # noqa: E402

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)


def gt_correspondence(seq, i, j, xy, depth_i):
    """Project frame-i keypoints into frame j with gt pose + depth."""
    tcw_i, tcw_j = seq.poses[i], seq.poses[j]
    x = (xy[:, 0] - CAM.cx) / CAM.fx * depth_i
    y = (xy[:, 1] - CAM.cy) / CAM.fy * depth_i
    pc = np.stack([x, y, depth_i], axis=1)
    twc_i = np.linalg.inv(tcw_i)
    pw = pc @ twc_i[:3, :3].T + twc_i[:3, 3]
    pj = pw @ tcw_j[:3, :3].T + tcw_j[:3, 3]
    z = pj[:, 2]
    uv = np.stack([CAM.fx * pj[:, 0] / np.maximum(z, 1e-6) + CAM.cx,
                   CAM.fy * pj[:, 1] / np.maximum(z, 1e-6) + CAM.cy], axis=1)
    ok = (z > 0.05) & (uv[:, 0] >= 0) & (uv[:, 0] < CAM.width) \
        & (uv[:, 1] >= 0) & (uv[:, 1] < CAM.height)
    return uv, ok


def run_pattern(kind: str):
    cfg = ORBConfig(n_features=800, n_levels=4, pattern_kind=kind)
    ex = ORBExtractor(cfg, (240, 320))
    ex_jit = jax.jit(ex.__call__)

    # ---- two-view inlier ratio over worlds/trajectories -----------------
    total_m, total_ok = 0, 0
    pair_sets = [("room", "panorama", 7, [(10, 13), (40, 44), (70, 75)]),
                 ("cluttered", "lateral", 3, [(5, 9), (12, 18), (20, 26)]),
                 ("room", "circuit", 9, [(30, 34), (80, 85), (120, 126)])]
    word_pairs = []  # (desc_i, desc_j) of gt-verified correspondences
    for world, traj, seed, pairs in pair_sets:
        seq = SyntheticSequence(CAM, n_frames=160, trajectory=traj,
                                seed=seed, world=world)
        for i, j in pairs:
            gi, di = seq.render(i)
            gj, _ = seq.render(j)
            ki = ex_jit(jnp.asarray(gi.astype(np.float32)))
            kj = ex_jit(jnp.asarray(gj.astype(np.float32)))
            vi, vj = np.asarray(ki.valid), np.asarray(kj.valid)
            xyi, xyj = np.asarray(ki.xy), np.asarray(kj.xy)
            depth_i = di[np.clip(xyi[:, 1].astype(int), 0, 239),
                         np.clip(xyi[:, 0].astype(int), 0, 319)]
            uv_gt, vis = gt_correspondence(seq, i, j, xyi, depth_i)
            dist = np.asarray(hamming.distance_matrix(
                ki.desc, kj.desc, ki.valid, kj.valid))
            best = dist.argmin(axis=1)
            bd = dist[np.arange(len(best)), best]
            d2 = dist.copy()
            d2[np.arange(len(best)), best] = 10 ** 6
            second = d2.min(axis=1)
            matched = vi & vis & (bd <= 50) & (bd <= 0.9 * second)
            err = np.linalg.norm(xyj[best] - uv_gt, axis=1)
            correct = matched & (err < 3.0)
            total_m += int(matched.sum())
            total_ok += int(correct.sum())
            di_np = np.asarray(ki.desc)
            dj_np = np.asarray(kj.desc)
            for q in np.where(correct)[0]:
                word_pairs.append((di_np[q], dj_np[best[q]]))

    # ---- per-pattern small vocabulary -----------------------------------
    rng = np.random.default_rng(555)
    descs = []
    for t in range(16):
        tex = make_texture(rng, 768)
        kp = ex_jit(jnp.asarray(tex[:240, :320].astype(np.float32) *
                                float(rng.uniform(0.6, 1.4))))
        descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])
    voc = voc_mod.train_vocabulary(np.concatenate(descs), k=10, levels=4,
                                   seed=7)

    # word repeatability over gt correspondences
    wp = np.asarray([p[0] for p in word_pairs] + [p[1] for p in word_pairs],
                    np.uint32)
    words = np.asarray(voc.transform_packed(
        jnp.asarray(wp), jnp.ones(len(wp), bool)))
    nh = len(word_pairs)
    same_word = float((words[:nh] == words[nh:]).mean())

    # KFDB margin: same place (panorama frame 10 vs 12) vs elsewhere (60)
    seq = SyntheticSequence(CAM, n_frames=160, trajectory="panorama",
                            seed=7, world="room")
    vecs = []
    for f in (10, 12, 60, 90):
        g, _ = seq.render(f)
        kp = ex_jit(jnp.asarray(g.astype(np.float32)))
        ids = np.asarray(voc.transform_packed(kp.desc, kp.valid))
        vecs.append(voc.bow_vector(ids))
    same = float(np.minimum(vecs[0], vecs[1]).sum())
    other = max(float(np.minimum(vecs[0], vecs[2]).sum()),
                float(np.minimum(vecs[0], vecs[3]).sum()))
    return {
        "inlier_ratio": total_ok / max(total_m, 1),
        "n_matches": total_m,
        "word_repeat": same_word,
        "kfdb_margin": same / max(other, 1e-6),
    }


def main():
    for kind in ("gaussian", "learned"):
        r = run_pattern(kind)
        print(f"{kind:9s}: inlier_ratio {r['inlier_ratio']:.3f} "
              f"({r['n_matches']} matches), word_repeat {r['word_repeat']:.3f}, "
              f"kfdb_margin {r['kfdb_margin']:.2f}", flush=True)


if __name__ == "__main__":
    main()
