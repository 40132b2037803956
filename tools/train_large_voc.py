"""Train the large (k=10, depth-4, 10k-word) default vocabulary and
measure its place-recognition separation against the small one.

The reference ships/expects a ~1M-word k=10 depth-6 DBoW2 tree trained
offline on a large image corpus (/root/reference/Vocabulary, absent from
the snapshot; loaded at System.cc:70). This framework's descriptors use a
different BRIEF pattern, so the tree is trained on the framework's own
descriptor distribution: a corpus of synthetic textures and rendered
world views at multiple scales/viewpoints.

Writes orbslam2_tpu/place/data/default_voc_k10l4.npz and prints a
same-place vs different-place BoW score separation report for both
vocabularies.

Usage: python tools/train_large_voc.py [n_corpus_images]
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

from orbslam2_tpu.geometry.camera import PinholeCamera  # noqa: E402
from orbslam2_tpu.io.synthetic import SyntheticSequence, make_texture  # noqa: E402
from orbslam2_tpu.ops.orb import ORBConfig, ORBExtractor  # noqa: E402
from orbslam2_tpu.place import vocabulary as voc_mod  # noqa: E402
from orbslam2_tpu.place.pretrained import get_default_vocabulary  # noqa: E402

def _out_path():
    from orbslam2_tpu.place import pretrained
    return pretrained._path("k10l4")
OUT = None  # resolved lazily after orbslam2_tpu imports (pattern suffix)


def corpus_descriptors(n_images: int) -> np.ndarray:
    """Extract descriptors from a diverse synthetic corpus: flat textures
    at two crops + rendered 3D world views from several worlds/seeds."""
    rng = np.random.default_rng(20260818)
    extractor = ORBExtractor(ORBConfig(n_features=2000, n_levels=8), (480, 640))
    ex_jit = jax.jit(extractor.__call__)
    cam = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                        width=320, height=240, bf=26.0)
    ex_small = ORBExtractor(ORBConfig(n_features=1200, n_levels=6), (240, 320))
    ex_small_jit = jax.jit(ex_small.__call__)

    descs = []
    n_tex = n_images // 2
    for i in range(n_tex):
        tex = make_texture(rng, 1024)
        r0 = int(rng.integers(0, 1024 - 480))
        c0 = int(rng.integers(0, 1024 - 640))
        img = tex[r0:r0 + 480, c0:c0 + 640]
        kp = ex_jit(jnp.asarray(img.astype(np.float32)))
        descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])

    worlds = ["cluttered", "room"]
    trajs = ["panorama", "lateral", "shuttle", "forward"]
    n_seq = max(1, (n_images - n_tex) // 8)
    made = 0
    for s in range(n_seq):
        if made >= n_images - n_tex:
            break
        world = worlds[s % len(worlds)]
        traj = trajs[s % len(trajs)]
        try:
            seq = SyntheticSequence(cam, n_frames=8, trajectory=traj,
                                    seed=1000 + s, world=world)
        except Exception:
            continue
        for f in range(seq.n_frames):
            gray, _ = seq.render(f)
            kp = ex_small_jit(jnp.asarray(gray.astype(np.float32)))
            descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])
            made += 1
            if made >= n_images - n_tex:
                break
    corpus = np.concatenate(descs)
    return corpus


def separation_report(voc: voc_mod.Vocabulary, name: str) -> None:
    """Same-place vs different-place L1 BoW score distributions on
    held-out rendered views."""
    cam = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                        width=320, height=240, bf=26.0)
    ex = ORBExtractor(ORBConfig(n_features=1000, n_levels=4), (240, 320))
    ex_jit = jax.jit(ex.__call__)

    def bow_of(img):
        kp = ex_jit(jnp.asarray(img.astype(np.float32)))
        ids = np.asarray(voc.transform_packed(kp.desc, kp.valid))
        return voc.bow_vector(ids)

    # retrieval framing (what DetectLoopCandidates actually relies on:
    # RELATIVE scores — candidates are gated by 0.75*bestAccScore and
    # minScore, KeyFrameDatabase.cc:80-229): for each query view, the
    # same-place view must outscore every different-place view, and the
    # ratio same/best-different is the discrimination headroom.
    n_seq = 10
    queries, positives = [], []
    for s in range(n_seq):
        seq = SyntheticSequence(cam, n_frames=2, trajectory="lateral",
                                seed=7000 + s, world=("room" if s % 2 else "cluttered"))
        queries.append(bow_of(seq.render(0)[0]))
        positives.append(bow_of(seq.render(1)[0]))
    top1 = 0
    ratios = []
    for q in range(n_seq):
        s_pos = voc.score_l1(queries[q], positives[q])
        s_neg = max(voc.score_l1(queries[q], queries[o])
                    for o in range(n_seq) if o != q)
        top1 += s_pos > s_neg
        ratios.append(s_pos / max(s_neg, 1e-9))
    ratios = np.array(ratios)
    print(f"{name}: top-1 {top1}/{n_seq}  same/best-diff ratio "
          f"mean {ratios.mean():.2f} min {ratios.min():.2f}", flush=True)


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    t0 = time.time()
    corpus = corpus_descriptors(n_images)
    print(f"corpus: {len(corpus)} descriptors from ~{n_images} images "
          f"({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    voc4 = voc_mod.train_vocabulary(corpus, k=10, levels=4, seed=7)
    n_used = int((voc4.word_weights > 0).sum())
    print(f"trained k=10 L=4: {voc4.n_words} words, {n_used} populated "
          f"({time.time()-t0:.0f}s)", flush=True)
    globals()['OUT'] = _out_path()
    voc_mod.save_vocabulary(voc4, OUT)
    print(f"saved {OUT} ({os.path.getsize(OUT)/1e6:.1f} MB)", flush=True)

    separation_report(get_default_vocabulary(), "small (1k words)")
    separation_report(voc4, "large (10k words)")


if __name__ == "__main__":
    main()
