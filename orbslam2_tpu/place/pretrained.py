"""Default vocabulary: trained once on this framework's own descriptors.

The reference ships (or expects) a 145 MB ORBvoc.txt trained offline on a
large image corpus (/root/reference/Vocabulary, absent from the snapshot —
SURVEY.md §2a). This framework's descriptors use a different BRIEF pattern,
so a vocabulary must be trained on its own distribution anyway: this module
renders corner-rich synthetic textures, extracts descriptors with the
standard extractor, trains a k=10 depth-3 tree (1000 words), and caches the
result beside the package. Call train_vocabulary directly to build larger
vocabularies from real imagery.
"""
from __future__ import annotations

import os

import numpy as np

from orbslam2_tpu.place import vocabulary as voc_mod

_CACHE = os.path.join(os.path.dirname(__file__), "data", "default_voc_k10l3.npz")
_CACHE_LARGE = os.path.join(os.path.dirname(__file__), "data", "default_voc_k10l4.npz")


def get_default_vocabulary(force_retrain: bool = False) -> voc_mod.Vocabulary:
    if not force_retrain and os.path.exists(_CACHE):
        return voc_mod.load_vocabulary(_CACHE)
    voc = _train_default()
    os.makedirs(os.path.dirname(_CACHE), exist_ok=True)
    voc_mod.save_vocabulary(voc, _CACHE)
    return voc


_CACHE_XL = os.path.join(os.path.dirname(__file__), "data", "default_voc_k10l5.npz")
_CACHE_XXL = os.path.join(os.path.dirname(__file__), "data", "default_voc_k10l6.npz")


def get_best_vocabulary() -> voc_mod.Vocabulary:
    """Largest shipped vocabulary: XXL (k=10 depth-6, the reference
    ORBvoc tree geometry, TemplatedVocabulary.h:1358 — trained by
    tools/train_xxl_voc.py on a natural-image-statistics corpus),
    falling back XL (~100k words) -> large (10k) -> default (1k).
    Mirrors how ORB-SLAM2 always loads the big offline ORBvoc.txt
    (/root/reference/src/System.cc:68-80). Dataset drivers use this;
    unit tests keep the small default for speed."""
    for path in (_CACHE_XXL, _CACHE_XL):
        if os.path.exists(path):
            return voc_mod.load_vocabulary(path)
    return get_large_vocabulary()


def get_large_vocabulary() -> voc_mod.Vocabulary:
    """10k-word k=10 depth-4 tree (closer to the reference's k=10 depth-6
    ORBvoc scale; trained by tools/train_large_voc.py on a diverse
    synthetic corpus). Prefer this for long sequences with many keyframes,
    where the 1k-word tree's BoW vectors saturate and loop/reloc candidate
    discrimination degrades. Falls back to the small default if the large
    artifact is missing."""
    if os.path.exists(_CACHE_LARGE):
        return voc_mod.load_vocabulary(_CACHE_LARGE)
    return get_default_vocabulary()


def _train_default() -> voc_mod.Vocabulary:
    import jax.numpy as jnp
    from orbslam2_tpu.io.synthetic import make_texture
    from orbslam2_tpu.ops.orb import ORBConfig, ORBExtractor

    rng = np.random.default_rng(1234)
    extractor = ORBExtractor(ORBConfig(n_features=1500, n_levels=4), (480, 640))
    descs = []
    for i in range(12):
        tex = make_texture(rng, 1024)
        img = tex[:480, :640] if i % 2 == 0 else tex[-480:, -640:]
        kp = extractor(jnp.asarray(img.astype(np.float32)))
        d = np.asarray(kp.desc)[np.asarray(kp.valid)]
        descs.append(d)
    corpus = np.concatenate(descs)
    return voc_mod.train_vocabulary(corpus, k=10, levels=3, seed=7)
