"""Batched 256-bit Hamming distance on the MXU.

The reference computes Hamming distance pair-by-pair with popcount
(ORBmatcher::DescriptorDistance /root/reference/src/ORBmatcher.cc:1733-1749)
inside grid-limited candidate loops. On TPU the idiomatic form is a dense
distance *matrix*: map each 256-bit descriptor to a {-1,+1}^256 vector; then

    dot(a, b) = 256 - 2 * hamming(a, b)
    hamming(a, b) = (256 - dot(a, b)) / 2

so an [N, 256] x [256, M] matmul yields all N*M distances in one MXU pass.
+-1 values are exact in bfloat16 and the f32 accumulator is exact for sums
up to 256, so the low-precision path loses nothing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from orbslam2_tpu.ops.orb import unpack_bits, DESC_BITS

# reference matcher thresholds (ORBmatcher.cc:37-39)
TH_HIGH = 100
TH_LOW = 50
HISTO_LENGTH = 30

# distance assigned to invalid rows/cols; larger than any real distance
INVALID_DIST = DESC_BITS + 1


def to_pm1(desc_packed: jax.Array) -> jax.Array:
    """[..., 8] uint32 -> [..., 256] bfloat16 in {-1, +1}."""
    bits = unpack_bits(desc_packed).astype(jnp.bfloat16)
    return bits * 2.0 - 1.0


def distance_matrix(
    desc_a: jax.Array,
    desc_b: jax.Array,
    valid_a: jax.Array | None = None,
    valid_b: jax.Array | None = None,
) -> jax.Array:
    """All-pairs Hamming distance.

    desc_a: [N, 8] uint32, desc_b: [M, 8] uint32 -> [N, M] int32 in [0, 256];
    invalid rows/cols get INVALID_DIST.
    """
    a = to_pm1(desc_a)
    b = to_pm1(desc_b)
    dot = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    dist = ((DESC_BITS - dot) * 0.5).astype(jnp.int32)
    if valid_a is not None:
        dist = jnp.where(valid_a[:, None], dist, INVALID_DIST)
    if valid_b is not None:
        dist = jnp.where(valid_b[None, :], dist, INVALID_DIST)
    return dist


def pairwise_distance(desc_a: jax.Array, desc_b: jax.Array) -> jax.Array:
    """Row-aligned Hamming distance: [..., 8] x [..., 8] -> [...] int32."""
    bits_a = unpack_bits(desc_a)
    bits_b = unpack_bits(desc_b)
    return jnp.sum((bits_a != bits_b).astype(jnp.int32), axis=-1)


def best_and_second(
    dist: jax.Array, mask: jax.Array | None = None
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-row best match with second-best distance for the ratio test.

    dist: [N, M]; mask: [N, M] bool of admissible pairs.
    -> (best_idx [N] int32, best_dist [N] int32, second_dist [N] int32).
    Rows with no admissible pair get best_dist = INVALID_DIST.
    """
    if mask is not None:
        dist = jnp.where(mask, dist, INVALID_DIST)
    # explicit two-pass min instead of lax.top_k: top_k lowers to a per-row
    # sort on TPU (O(M log M) over thousands of columns); two masked
    # reductions are plain VPU passes
    best_idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
    best = jnp.min(dist, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    second = jnp.min(jnp.where(cols == best_idx[:, None], INVALID_DIST, dist), axis=1)
    return best_idx, best, second


def mutual_best(dist: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """[N, M] -> [N] index of col-best that also row-bests back, else -1."""
    if mask is not None:
        dist = jnp.where(mask, dist, INVALID_DIST)
    best_j = jnp.argmin(dist, axis=1)
    best_i = jnp.argmin(dist, axis=0)
    n = dist.shape[0]
    rows = jnp.arange(n)
    ok = best_i[best_j] == rows
    ok = ok & (dist[rows, best_j] < INVALID_DIST)
    return jnp.where(ok, best_j, -1).astype(jnp.int32)


def rotation_consistency_mask(
    angle_a: jax.Array, angle_b: jax.Array, match_valid: jax.Array
) -> jax.Array:
    """Keep only matches whose orientation difference falls in the 3 dominant
    histogram bins (reference: ComputeThreeMaxima + the rotation-histogram
    filter used by every Search* variant, ORBmatcher.cc:1687-1728).

    angle_a/angle_b: radians per match pair [N]; match_valid: [N] bool.
    """
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(angle_a - angle_b, two_pi)  # [0, 2pi)
    bins = jnp.clip((rot * (HISTO_LENGTH / two_pi)).astype(jnp.int32), 0, HISTO_LENGTH - 1)
    hist = jnp.zeros((HISTO_LENGTH,), jnp.int32).at[bins].add(match_valid.astype(jnp.int32))
    top3_vals, top3_idx = jax.lax.top_k(hist, 3)
    max1 = top3_vals[0]
    # drop 2nd/3rd bins when much weaker than the best (ORBmatcher.cc:1712-1726)
    keep2 = top3_vals[1].astype(jnp.float32) >= 0.1 * max1.astype(jnp.float32)
    keep3 = top3_vals[2].astype(jnp.float32) >= 0.1 * max1.astype(jnp.float32)
    in1 = bins == top3_idx[0]
    in2 = (bins == top3_idx[1]) & keep2
    in3 = (bins == top3_idx[2]) & keep3
    return match_valid & (in1 | in2 | in3)
