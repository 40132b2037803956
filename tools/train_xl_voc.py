"""Train the XL (k=10, depth-5, ~100k-word) vocabulary.

The reference ships/expects a ~1M-word k=10 depth-6 DBoW2 tree trained
offline on a large real-image corpus (/root/reference/Vocabulary, loaded at
System.cc:70; tree geometry TemplatedVocabulary.h:1358). No real imagery
exists in this environment (zero egress), so the corpus is the most diverse
synthetic distribution the framework can render: procedural multi-scale
textures under random crops/rotations, plus 3D world renders across every
world/trajectory/seed/camera (including strong barrel distortion and
exposure swings). The descriptors come from the framework's own extractor,
which is the point — the tree must quantize THIS BRIEF pattern's
distribution, not OpenCV's.

Writes orbslam2_tpu/place/data/default_voc_k10l5.npz and prints
separation + keyframe-database discrimination reports.

Usage: python tools/train_xl_voc.py [n_images=320]
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

def _out_path():
    from orbslam2_tpu.place import pretrained
    return pretrained._path("k10l5")
OUT = None  # resolved lazily after orbslam2_tpu imports (pattern suffix)

CAMS = [
    PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                  width=320, height=240, bf=26.0),
    # EuRoC-like barrel distortion: edge descriptors see the warp
    PinholeCamera(fx=230.9, fy=230.3, cx=187.3, cy=126.2,
                  k1=-0.2834, k2=0.0739, p1=0.0002, p2=0.00002,
                  width=376, height=240, bf=23.09),
    # long focal (KITTI-like narrow FoV at reduced scale)
    PinholeCamera(fx=360.0, fy=360.0, cx=160.0, cy=120.0,
                  width=320, height=240, bf=36.0),
]


def corpus_descriptors(n_images: int) -> np.ndarray:
    rng = np.random.default_rng(20260820)
    ex_big = ORBExtractor(ORBConfig(n_features=2000, n_levels=8), (480, 640))
    ex_big_jit = jax.jit(ex_big.__call__)
    ex_small = {}
    for c in CAMS:
        key = (c.height, c.width)
        if key not in ex_small:
            ex_small[key] = jax.jit(ORBExtractor(
                ORBConfig(n_features=1500, n_levels=6), key).__call__)

    descs = []
    n_tex = int(n_images * 0.4)
    for i in range(n_tex):
        size = int(rng.choice([768, 1024, 1536]))
        tex = make_texture(rng, size)
        if rng.random() < 0.5:  # rotate for orientation diversity
            tex = np.rot90(tex, k=int(rng.integers(1, 4))).copy()
        r0 = int(rng.integers(0, tex.shape[0] - 480))
        c0 = int(rng.integers(0, tex.shape[1] - 640))
        img = tex[r0:r0 + 480, c0:c0 + 640]
        gain = float(rng.uniform(0.5, 1.6))
        img = np.clip(img * gain, 0, 255)
        kp = ex_big_jit(jnp.asarray(img.astype(np.float32)))
        descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])
        if (i + 1) % 25 == 0:
            print(f"  textures {i + 1}/{n_tex}", flush=True)

    worlds = ["cluttered", "room"]
    trajs = ["panorama", "lateral", "shuttle", "forward"]
    made, s = 0, 0
    target = n_images - n_tex
    while made < target:
        cam = CAMS[s % len(CAMS)]
        kw = {}
        if s % 3 == 0:
            kw["exposure"] = 0.3
        try:
            seq = SyntheticSequence(cam, n_frames=6,
                                    trajectory=trajs[s % len(trajs)],
                                    seed=5000 + s,
                                    world=worlds[s % len(worlds)], **kw)
        except Exception:
            s += 1
            continue
        ex = ex_small[(cam.height, cam.width)]
        for f in range(seq.n_frames):
            gray, _ = seq.render(f)
            kp = ex(jnp.asarray(gray.astype(np.float32)))
            descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])
            made += 1
            if made >= target:
                break
        s += 1
        if made % 48 < 6:
            print(f"  renders {made}/{target}", flush=True)
    return np.concatenate(descs)


def db_discrimination_report(voc: voc_mod.Vocabulary, name: str) -> None:
    """KeyFrameDatabase discrimination as the map grows: store views from
    many distinct places, query a revisit of place 0, and check the true
    place outranks everything else at growing database sizes."""
    from orbslam2_tpu.slammap.keyframe_db import KeyFrameDatabase

    cam = CAMS[0]
    ex = ORBExtractor(ORBConfig(n_features=1000, n_levels=4), (240, 320))
    ex_jit = jax.jit(ex.__call__)

    def wids_of(img):
        kp = ex_jit(jnp.asarray(img.astype(np.float32)))
        return np.asarray(voc.transform_packed(kp.desc, kp.valid))

    n_places = 48
    views, revisits = [], []
    for s in range(n_places):
        seq = SyntheticSequence(cam, n_frames=2, trajectory="lateral",
                                seed=9000 + s,
                                world=("room" if s % 2 else "cluttered"))
        views.append(wids_of(seq.render(0)[0]))
        revisits.append(wids_of(seq.render(1)[0]))
    for n_db in (12, 24, 48):
        db = KeyFrameDatabase(voc, max_keyframes=n_db)
        for k in range(n_db):
            db.add(k, views[k])
        top1, margins = 0, []
        for q in range(min(n_db, 16)):
            v = voc.bow_vector(revisits[q])
            scores = db.score_against_all(v)
            order = np.argsort(-scores)
            top1 += order[0] == q
            best_other = scores[order[order != q][0] if order[0] == q
                                else order[0]]
            margins.append(scores[q] / max(best_other, 1e-9))
        m = np.array(margins)
        print(f"{name}: db={n_db:3d} top-1 {top1}/16  margin mean "
              f"{m.mean():.2f} min {m.min():.2f}", flush=True)


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    t0 = time.time()
    corpus = corpus_descriptors(n_images)
    print(f"corpus: {len(corpus)} descriptors from ~{n_images} images "
          f"({time.time() - t0:.0f}s)", flush=True)
    t0 = time.time()
    voc = voc_mod.train_vocabulary(corpus, k=10, levels=5, seed=11, iters=6)
    live = int((voc.word_weights > 0).sum())
    print(f"trained k=10 L=5: {voc.n_words} slots, {live} live words "
          f"({time.time() - t0:.0f}s)", flush=True)
    globals()['OUT'] = _out_path()
    voc_mod.save_vocabulary(voc, OUT)
    print(f"saved {OUT} ({os.path.getsize(OUT) / 1e6:.1f} MB)", flush=True)
    db_discrimination_report(voc, "xl-k10l5")
    from orbslam2_tpu.place.pretrained import get_large_vocabulary
    db_discrimination_report(get_large_vocabulary(), "large-k10l4")


if __name__ == "__main__":
    main()
