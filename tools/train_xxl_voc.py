"""Train the XXL (k=10, depth-6, reference-geometry ~1M-slot) vocabulary.

The reference ships a ~1M-word k=10 L=6 DBoW2 tree trained on a large
real-image corpus (/root/reference/Thirdparty/DBoW2/DBoW2/
TemplatedVocabulary.h:1358, loaded at System.cc:70). No real imagery exists
in this environment (zero egress), so the corpus approximates REAL-IMAGE
STATISTICS as closely as a renderer can (VERDICT r2 item 5 "scale and
de-bias"):

- 1/f^a spectrum textures (a in [0.8, 1.6] — the natural-image amplitude
  spectrum), beyond the procedural multi-scale textures of the XL corpus
- collage composites (pasted patches => occlusion boundaries, mixed
  statistics inside one view)
- lighting fields (low-frequency gain ramps + vignette) and exposure swings
- 3D world renders across every world/trajectory/camera incl. barrel
  distortion

The held-out discrimination report uses generator families and seeds the
tree never saw (tests/test_place_solvers.py exercises the shipped tier).

Writes orbslam2_tpu/place/data/default_voc_k10l6.npz.
Usage: python tools/train_xxl_voc.py [n_images=1200]
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
from tools.train_xl_voc import CAMS, db_discrimination_report  # noqa: E402

def _out_path():
    from orbslam2_tpu.place import pretrained
    return pretrained._path("k10l6")
OUT = None  # resolved lazily after orbslam2_tpu imports (pattern suffix)


def pink_texture(rng: np.random.Generator, size: int, alpha: float) -> np.ndarray:
    """1/f^alpha amplitude-spectrum texture (natural-image statistics)."""
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.rfftfreq(size)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    spec = (rng.normal(size=(size, size // 2 + 1))
            + 1j * rng.normal(size=(size, size // 2 + 1))) / f ** alpha
    img = np.fft.irfft2(spec, s=(size, size))
    img = (img - img.min()) / max(float(np.ptp(img)), 1e-9)
    return (img * 255.0).astype(np.float32)


def lighting(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """Low-frequency gain ramp + vignette, like uneven indoor lighting."""
    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w]
    gx, gy = rng.uniform(-0.4, 0.4, 2)
    ramp = 1.0 + gx * (xx / w - 0.5) + gy * (yy / h - 0.5)
    r2 = ((xx / w - 0.5) ** 2 + (yy / h - 0.5) ** 2)
    vig = 1.0 - rng.uniform(0.0, 0.5) * r2 * 2.0
    return np.clip(img * ramp * vig, 0, 255).astype(np.float32)


def corpus_descriptors(n_images: int) -> np.ndarray:
    rng = np.random.default_rng(20260821)
    ex_big = ORBExtractor(ORBConfig(n_features=3000, n_levels=8), (480, 640))
    ex_big_jit = jax.jit(ex_big.__call__)
    ex_small = {}
    for c in CAMS:
        key = (c.height, c.width)
        if key not in ex_small:
            ex_small[key] = jax.jit(ORBExtractor(
                ORBConfig(n_features=1500, n_levels=6), key).__call__)

    descs = []

    def grab(img, ex=ex_big_jit):
        kp = ex(jnp.asarray(img.astype(np.float32)))
        descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])

    # 1/f textures (35%), procedural textures (20%), collages (15%)
    n_pink = int(n_images * 0.35)
    n_tex = int(n_images * 0.20)
    n_col = int(n_images * 0.15)
    for i in range(n_pink):
        size = int(rng.choice([768, 1024]))
        img = pink_texture(rng, size, float(rng.uniform(0.8, 1.6)))
        r0 = int(rng.integers(0, size - 480))
        c0 = int(rng.integers(0, size - 640)) if size > 640 else 0
        img = img[r0:r0 + 480, c0:c0 + 640]
        if img.shape != (480, 640):
            img = np.pad(img, ((0, 480 - img.shape[0]), (0, 640 - img.shape[1])),
                         mode="reflect")
        grab(lighting(rng, img))
        if (i + 1) % 50 == 0:
            print(f"  pink {i + 1}/{n_pink}", flush=True)
    for i in range(n_tex):
        size = int(rng.choice([768, 1024, 1536]))
        tex = make_texture(rng, size)
        if rng.random() < 0.5:
            tex = np.rot90(tex, k=int(rng.integers(1, 4))).copy()
        r0 = int(rng.integers(0, tex.shape[0] - 480))
        c0 = int(rng.integers(0, tex.shape[1] - 640))
        img = tex[r0:r0 + 480, c0:c0 + 640] * float(rng.uniform(0.5, 1.6))
        grab(lighting(rng, np.clip(img, 0, 255)))
        if (i + 1) % 50 == 0:
            print(f"  tex {i + 1}/{n_tex}", flush=True)
    for i in range(n_col):
        base = pink_texture(rng, 768, 1.2)[:480, :640] if rng.random() < 0.5 \
            else make_texture(rng, 768)[:480, :640]
        img = base.copy()
        for _ in range(int(rng.integers(3, 8))):   # pasted patches
            src = make_texture(rng, 256) if rng.random() < 0.5 \
                else pink_texture(rng, 256, float(rng.uniform(0.8, 1.6)))
            ph, pw = int(rng.integers(60, 220)), int(rng.integers(60, 220))
            y0, x0 = int(rng.integers(0, 480 - ph)), int(rng.integers(0, 640 - pw))
            img[y0:y0 + ph, x0:x0 + pw] = src[:ph, :pw]
        grab(lighting(rng, img))
        if (i + 1) % 50 == 0:
            print(f"  collage {i + 1}/{n_col}", flush=True)

    # 3D world renders (remaining 30%)
    worlds = ["cluttered", "room"]
    trajs = ["panorama", "lateral", "shuttle", "forward", "circuit"]
    made, s = 0, 0
    target = n_images - n_pink - n_tex - n_col
    while made < target:
        cam = CAMS[s % len(CAMS)]
        kw = {"exposure": 0.3} if s % 3 == 0 else {}
        try:
            seq = SyntheticSequence(cam, n_frames=6,
                                    trajectory=trajs[s % len(trajs)],
                                    seed=7000 + s,
                                    world=worlds[s % len(worlds)], **kw)
        except Exception:
            s += 1
            continue
        ex = ex_small[(cam.height, cam.width)]
        for f in range(seq.n_frames):
            gray, _ = seq.render(f)
            grab(gray, ex)
            made += 1
            if made >= target:
                break
        s += 1
        if made % 60 < 6:
            print(f"  renders {made}/{target}", flush=True)
    return np.concatenate(descs)


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    t0 = time.time()
    corpus = corpus_descriptors(n_images)
    print(f"corpus: {len(corpus)} descriptors from ~{n_images} images "
          f"({time.time() - t0:.0f}s)", flush=True)
    t0 = time.time()
    voc = voc_mod.train_vocabulary(corpus, k=10, levels=6, seed=11, iters=6,
                                   fit_cap=60_000)
    live = int((voc.word_weights > 0).sum())
    print(f"trained k=10 L=6: {voc.n_words} slots, {live} live words "
          f"({time.time() - t0:.0f}s)", flush=True)
    globals()['OUT'] = _out_path()
    voc_mod.save_vocabulary(voc, OUT)
    print(f"saved {OUT} ({os.path.getsize(OUT) / 1e6:.1f} MB)", flush=True)
    db_discrimination_report(voc, "xxl-k10l6")


if __name__ == "__main__":
    main()
