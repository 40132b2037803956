"""Per-point statistics: representative descriptor, viewing normal, scale band.

Host-side numpy implementations of MapPoint::ComputeDistinctiveDescriptors
(/root/reference/src/MapPoint.cc:266-340) and UpdateNormalAndDepth
(MapPoint.cc:371-421), applied in batch after mapping operations.
"""
from __future__ import annotations

import numpy as np


def hamming_np(desc_a: np.ndarray, desc_b: np.ndarray) -> np.ndarray:
    """Packed uint32 descriptors [..., 8] x [..., 8] -> pairwise counts.
    Broadcasts leading dims."""
    x = np.bitwise_xor(desc_a, desc_b)
    # popcount via uint8 view + unpackbits-free table
    b = x.view(np.uint8)
    return _POPCOUNT8[b].sum(axis=-1).astype(np.int32)


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def camera_centers(poses_tcw: np.ndarray) -> np.ndarray:
    """[K, 4, 4] Tcw -> [K, 3] world camera centers."""
    r = poses_tcw[:, :3, :3]
    t = poses_tcw[:, :3, 3]
    return -np.einsum("kji,kj->ki", r, t)


def update_points(m, pts: np.ndarray, scale_factor: float, n_levels: int) -> None:
    """Recompute descriptor/normal/scale-band for the given point ids."""
    if len(pts) == 0:
        return
    centers = camera_centers(m.kf_pose)
    max_scale = scale_factor ** (n_levels - 1)
    for p in pts:
        if not m.pt_valid[p]:
            continue
        ks, slots = np.where(m.kf_pt == p)
        keep = m.kf_valid[ks]
        ks, slots = ks[keep], slots[keep]
        if len(ks) == 0:
            continue
        # representative descriptor: min median Hamming to the others
        descs = m.kf_kp_desc[ks, slots]  # [M, 8]
        if len(ks) == 1:
            m.pt_desc[p] = descs[0]
        else:
            d = hamming_np(descs[:, None, :], descs[None, :, :])
            med = np.median(d, axis=1)
            m.pt_desc[p] = descs[np.argmin(med)]
        # viewing normal: mean unit vector point->center... reference uses
        # (pos - Ow) normalized, averaged (MapPoint.cc:371-421)
        rays = m.pt_pos[p][None, :] - centers[ks]
        norms = np.linalg.norm(rays, axis=-1, keepdims=True)
        rays = rays / np.maximum(norms, 1e-9)
        normal = rays.mean(axis=0)
        m.pt_normal[p] = normal / max(np.linalg.norm(normal), 1e-9)
        # scale-invariance band from the reference keyframe
        ref = m.pt_ref_kf[p]
        if ref < 0 or not m.kf_valid[ref] or ref not in ks:
            ref = ks[0]
            m.pt_ref_kf[p] = ref
        ref_slot = slots[list(ks).index(ref)] if ref in ks else slots[0]
        dist = np.linalg.norm(m.pt_pos[p] - centers[ref])
        level = m.kf_kp_octave[ref, ref_slot]
        max_dist = dist * (scale_factor ** level)
        m.pt_max_dist[p] = max_dist
        m.pt_min_dist[p] = max_dist / max_scale
