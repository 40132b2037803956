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
import warnings

import numpy as np

from orbslam2_tpu.place import vocabulary as voc_mod

_DATA = os.path.join(os.path.dirname(__file__), "data")


def _pattern_suffix() -> str:
    """Vocabulary artifacts are keyed by the active descriptor pattern:
    trees trained on the legacy Gaussian pattern keep their original
    filenames, trees trained on the learned decorrelated pattern
    (ops/data/brief_pattern_learned.npz) carry an ``_lp`` suffix. The
    suffix follows what the DEFAULT ORBConfig resolves to, which is what
    every driver and test extractor uses; ORBSLAM2_PATTERN=gaussian
    overrides it for A/B runs that construct gaussian-pattern extractors
    explicitly."""
    if os.environ.get("ORBSLAM2_PATTERN") == "gaussian":
        return ""
    from orbslam2_tpu.ops import orb
    cfg = orb.ORBConfig()
    if cfg.pattern_kind == "learned" and os.path.exists(
            orb._LEARNED_PATTERN_PATH):
        return "_lp"
    return ""


def _path(tier: str, suffix: str | None = None) -> str:
    sfx = _pattern_suffix() if suffix is None else suffix
    return os.path.join(_DATA, f"default_voc_{tier}{sfx}.npz")


def get_default_vocabulary(force_retrain: bool = False) -> voc_mod.Vocabulary:
    cache = _path("k10l3")
    if not force_retrain and os.path.exists(cache):
        return voc_mod.load_vocabulary(cache)
    voc = _train_default()
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    voc_mod.save_vocabulary(voc, cache)
    return voc


def get_best_vocabulary() -> voc_mod.Vocabulary:
    """Largest shipped vocabulary: XXL (k=10 depth-6, the reference
    ORBvoc tree geometry, TemplatedVocabulary.h:1358 — trained by
    tools/train_xxl_voc.py on a natural-image-statistics corpus),
    falling back XL (~100k words) -> large (10k) -> default (1k).
    Mirrors how ORB-SLAM2 always loads the big offline ORBvoc.txt
    (/root/reference/src/System.cc:68-80). Dataset drivers use this;
    unit tests keep the small default for speed."""
    for tier in ("k10l6", "k10l5"):
        p = _path(tier)
        if os.path.exists(p):
            return voc_mod.load_vocabulary(p)
    # mismatched-pattern fallback: a tree trained on the other pattern
    # still functions as a partition of descriptor space, with degraded
    # discrimination — usable until the retrained artifact lands
    for tier in ("k10l6", "k10l5"):
        for sfx in ("", "_lp"):
            p = _path(tier, sfx)
            if os.path.exists(p):
                warnings.warn(
                    f"vocabulary {os.path.basename(p)} was trained on a "
                    "different descriptor pattern; retrain via "
                    "tools/train_xxl_voc.py for full discrimination")
                return voc_mod.load_vocabulary(p)
    return get_large_vocabulary()


def get_large_vocabulary() -> voc_mod.Vocabulary:
    """10k-word k=10 depth-4 tree (closer to the reference's k=10 depth-6
    ORBvoc scale; trained by tools/train_large_voc.py on a diverse
    synthetic corpus). Prefer this for long sequences with many keyframes,
    where the 1k-word tree's BoW vectors saturate and loop/reloc candidate
    discrimination degrades. Falls back to the small default if the large
    artifact is missing."""
    p = _path("k10l4")
    if os.path.exists(p):
        return voc_mod.load_vocabulary(p)
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
