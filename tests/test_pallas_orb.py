"""Fused Pallas orientation+descriptor kernel vs the XLA reference path.

Runs the kernel in interpreter mode on CPU (tests/conftest.py forces the
cpu backend) and checks it against the dynamic_slice + one-hot-matmul XLA
implementation on the same inputs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.ops import orb, pallas_orb


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    h, w = 120, 160
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    # smooth it a bit so descriptors aren't pure noise
    k = orb.gaussian_kernel1d(1.5, 3)
    img = np.asarray(orb._separable_conv(jnp.asarray(img), k))
    blur = np.asarray(orb._separable_conv(jnp.asarray(img), orb.gaussian_kernel1d(2.0, 3)))
    n = 64
    ys = rng.integers(orb.EDGE_MARGIN, h - orb.EDGE_MARGIN, n).astype(np.int32)
    xs = rng.integers(orb.EDGE_MARGIN, w - orb.EDGE_MARGIN, n).astype(np.int32)
    # the pattern the default config resolves to (learned table when the
    # artifact ships, Gaussian otherwise) — must match what xla_reference's
    # internal ORBExtractor uses, or the two paths compare different bits
    pattern = orb.load_pattern(orb.ORBConfig())
    return img, blur, ys, xs, pattern


def xla_reference(img, blur, ys, xs, pattern):
    ex = orb.ORBExtractor(orb.ORBConfig(use_pallas=False), img.shape)
    lh, lw = img.shape
    patch = 2 * orb.HALF_PATCH + 1

    def one_patch(y, x):
        return jax.lax.dynamic_slice(
            jnp.asarray(img),
            (jnp.clip(y - orb.HALF_PATCH, 0, lh - patch),
             jnp.clip(x - orb.HALF_PATCH, 0, lw - patch)),
            (patch, patch))

    patches = jax.vmap(one_patch)(jnp.asarray(ys), jnp.asarray(xs))
    m10 = jnp.einsum("kij,ij->k", patches, jnp.asarray(ex.k10))
    m01 = jnp.einsum("kij,ij->k", patches, jnp.asarray(ex.k01))
    angle = jnp.arctan2(m01, m10)
    desc = ex._descriptors(jnp.asarray(blur), jnp.asarray(xs), jnp.asarray(ys), angle)
    return np.asarray(angle), np.asarray(desc)


def test_fused_kernel_matches_xla_path(setup):
    img, blur, ys, xs, pattern = setup
    ang_ref, desc_ref = xla_reference(img, blur, ys, xs, pattern)
    ang, desc = pallas_orb.fused_orient_describe(
        jnp.asarray(img), jnp.asarray(blur), jnp.asarray(ys), jnp.asarray(xs),
        jnp.asarray(pattern), interpret=True)
    ang, desc = np.asarray(ang), np.asarray(desc)
    # angles: same moments up to f32 summation order
    d = np.abs(np.arctan2(np.sin(ang - ang_ref), np.cos(ang - ang_ref)))
    assert d.max() < 1e-3, d.max()
    # descriptors: both paths sample bf16-rounded pixels, so only
    # summation-order near-ties and one-pixel rounding flips differ.
    # A handful of bits of 256.
    ham = np.asarray(jnp.sum(jnp.asarray(
        np.unpackbits((desc ^ desc_ref).view(np.uint8), axis=1)), axis=1))
    assert np.median(ham) <= 4, ham
    assert (ham <= 12).mean() > 0.9, ham
    assert ham.max() <= 40, ham


@pytest.mark.parametrize("h,w", [(480, 640), (96, 200), (120, 1241)])
def test_fused_kernel_edge_keypoints(h, w):
    """Phase-copy window geometry at the extremes: keypoints hugging every
    edge margin and straddling each 64-column phase cell, at widths that
    exercise the copy-domain padding (including a KITTI-like 1241)."""
    rng = np.random.default_rng(11)
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    k = orb.gaussian_kernel1d(1.5, 3)
    img = np.asarray(orb._separable_conv(jnp.asarray(img), k))
    blur = np.asarray(orb._separable_conv(jnp.asarray(img), orb.gaussian_kernel1d(2.0, 3)))
    m = orb.EDGE_MARGIN
    xs_list = [m, m + 1, w - m - 1, w - m - 2]
    xs_list += [x for x in range(m, w - m, 61)]  # sweep phase offsets
    ys_list = [m, m + 1, h - m - 1, h - m - 2] + [h // 2] * max(
        0, len(xs_list) - 4)
    n = min(len(xs_list), len(ys_list))
    xs = np.array(xs_list[:n], np.int32)
    ys = np.array(ys_list[:n], np.int32)
    pattern = orb.load_pattern(orb.ORBConfig())
    ang_ref, desc_ref = xla_reference(img, blur, ys, xs, pattern)
    ang, desc = pallas_orb.fused_orient_describe(
        jnp.asarray(img), jnp.asarray(blur), jnp.asarray(ys), jnp.asarray(xs),
        jnp.asarray(pattern), interpret=True)
    ang, desc = np.asarray(ang), np.asarray(desc)
    d = np.abs(np.arctan2(np.sin(ang - ang_ref), np.cos(ang - ang_ref)))
    assert d.max() < 1e-3, d.max()
    ham = np.unpackbits((desc ^ desc_ref).view(np.uint8), axis=1).sum(axis=1)
    assert np.median(ham) <= 4, ham
    assert ham.max() <= 40, ham


def test_extractor_pallas_mode_end_to_end(setup):
    """Full extractor with use_pallas=True (interpret on CPU) against the
    XLA-path extractor: keypoints identical, descriptors near-identical."""
    img, _, _, _, _ = setup
    cfg_x = orb.ORBConfig(n_features=200, n_levels=3, use_pallas=False)
    cfg_p = orb.ORBConfig(n_features=200, n_levels=3, use_pallas=True)
    ex_x = orb.ORBExtractor(cfg_x, img.shape)
    ex_p = orb.ORBExtractor(cfg_p, img.shape)
    assert ex_p.use_pallas and ex_p.pallas_interpret
    kx = jax.jit(ex_x.__call__)(jnp.asarray(img))
    kp = jax.jit(ex_p.__call__)(jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(kx.valid), np.asarray(kp.valid))
    np.testing.assert_allclose(np.asarray(kx.xy), np.asarray(kp.xy), atol=1e-5)
    v = np.asarray(kx.valid)
    ax, ap = np.asarray(kx.angle)[v], np.asarray(kp.angle)[v]
    d = np.abs(np.arctan2(np.sin(ax - ap), np.cos(ax - ap)))
    assert d.max() < 1e-3
    dx = np.asarray(kx.desc)[v]
    dp = np.asarray(kp.desc)[v]
    ham = np.unpackbits((dx ^ dp).view(np.uint8), axis=1).sum(axis=1)
    assert np.median(ham) <= 4
    assert (ham <= 12).mean() > 0.9
