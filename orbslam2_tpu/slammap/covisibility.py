"""Covisibility graph, spanning tree, and local-map selection.

The reference maintains per-KeyFrame sorted neighbor lists under mutexes
(KeyFrame::UpdateConnections /root/reference/src/KeyFrame.cc:303-377,
UpdateBestCovisibles:143). Here the whole graph is one weight matrix
W = incidence @ incidence.T — a single (MXU-friendly) matmul over the
observation incidence — and every query is a masked argsort.

Thresholds mirrored from the reference:
- covisibility edge if >= 15 shared points, else keep only the single best
  neighbor (KeyFrame.cc:342-377)
- essential-graph edges at weight >= 100 (Optimizer.cc:911)
- local map bounded at 80 keyframes (Tracking.cc:1576)
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

COVIS_THRESHOLD = 15
ESSENTIAL_THRESHOLD = 100
LOCAL_MAP_MAX_KF = 80


def weight_matrix(m) -> np.ndarray:
    """[K, K] int32 covisibility weights (shared map points), zero diagonal.
    Uses the native engine (native/mapgraph.cpp) when built."""
    from orbslam2_tpu.slammap.mapstate import _use_native
    if _use_native():
        from orbslam2_tpu.slammap import native
        w = native.covis_weights(m.kf_pt, m.kf_valid, m.pt_valid)
        if w is not None:
            return w
    inc = m.incidence()
    w = (inc.astype(np.int32) @ inc.astype(np.int32).T)
    np.fill_diagonal(w, 0)
    return w


def covisible_neighbors(w: np.ndarray, kf: int, min_weight: int = COVIS_THRESHOLD) -> np.ndarray:
    """Neighbor kf ids ordered by descending weight; if none reach the
    threshold, the single best is kept (KeyFrame.cc:342-377)."""
    row = w[kf]
    above = np.where(row >= min_weight)[0]
    if len(above) == 0:
        best = int(row.argmax())
        return np.array([best], np.int64) if row[best] > 0 else np.array([], np.int64)
    return above[np.argsort(-row[above], kind="stable")]


def best_covisible(w: np.ndarray, kf: int, n: int) -> np.ndarray:
    """Top-n neighbors by weight (GetBestCovisibilityKeyFrames KeyFrame.cc:183).
    argpartition + small sort: this runs ~80x per frame in the local-map
    neighbor ring; a full argsort over K keyframes dominates at map scale."""
    row = w[kf]
    if n < len(row):
        cand = np.argpartition(-row, n)[:n + 1]
    else:
        cand = np.arange(len(row))
    cand = cand[row[cand] > 0]
    return cand[np.argsort(-row[cand], kind="stable")][:n]


def assign_spanning_parent(m, w: np.ndarray, kf: int) -> None:
    """First-connection parent assignment: most covisible earlier keyframe
    (KeyFrame::UpdateConnections /root/reference/src/KeyFrame.cc:404-411)."""
    if m.kf_parent[kf] >= 0:
        return
    row = w[kf].copy()
    earlier = m.kf_valid & (m.kf_order >= 0) & (m.kf_order < m.kf_order[kf])
    row[~earlier] = 0
    if row.max() > 0:
        m.kf_parent[kf] = int(row.argmax())


def local_keyframes(m, frame_pt_ids: np.ndarray, w: np.ndarray) -> Tuple[np.ndarray, int]:
    """Tracking::UpdateLocalKeyFrames (/root/reference/src/Tracking.cc:1515):
    keyframes observing the frame's points (weighted by #shared), plus one
    ring of best covisible neighbors + parents/children, capped at 80.

    -> (local kf ids, reference kf id = max sharing)."""
    pts = frame_pt_ids[frame_pt_ids >= 0]
    if len(pts) == 0:
        return np.array([], np.int64), -1
    # O(K*N) membership lookup (a [K, N, n_pts] comparison tensor costs
    # seconds at KITTI scale: 1500 KFs x 150k points); native single pass
    # when the engine is built
    from orbslam2_tpu.slammap.mapstate import _use_native
    share = None
    if _use_native():
        from orbslam2_tpu.slammap import native
        idx = m.obs_index()  # cached CSR per mapping event
        if idx is not None:
            share = native.share_from_index(idx[0], idx[1], pts,
                                            m.cap.max_keyframes)
    if share is None:
        in_frame = np.zeros(m.cap.max_points, bool)
        in_frame[pts] = True
        kf_pt = m.kf_pt
        share = (in_frame[np.maximum(kf_pt, 0)] & (kf_pt >= 0)).sum(axis=1)
        share[~m.kf_valid] = 0
    share = share.astype(np.int64)
    seeds = np.where(share > 0)[0]
    if len(seeds) == 0:
        return np.array([], np.int64), -1
    ref_kf = int(seeds[np.argmax(share[seeds])])

    local = list(seeds[np.argsort(-share[seeds], kind="stable")])
    in_local = set(local)
    for kf in list(local):
        if len(local) >= LOCAL_MAP_MAX_KF:
            break
        for nb in best_covisible(w, kf, 10):
            if nb not in in_local and m.kf_valid[nb]:
                local.append(int(nb))
                in_local.add(int(nb))
                break  # reference adds only the first new best neighbor
        # spanning-tree children: first not-yet-included child
        # (Tracking.cc:1570-1583)
        for ch in np.where(m.kf_parent == kf)[0]:
            if ch not in in_local and m.kf_valid[ch]:
                local.append(int(ch))
                in_local.add(int(ch))
                break
        # parent (Tracking.cc:1585-1594; the reference `break`s out of the
        # whole expansion after the first parent added — a known quirk we
        # deliberately do not reproduce)
        par = m.kf_parent[kf]
        if par >= 0 and par not in in_local and m.kf_valid[par]:
            local.append(int(par))
            in_local.add(int(par))
    return np.array(local[:LOCAL_MAP_MAX_KF], np.int64), ref_kf


def local_points(m, local_kfs: np.ndarray) -> np.ndarray:
    """Unique valid point ids observed by the local keyframes."""
    if len(local_kfs) == 0:
        return np.array([], np.int64)
    ids = np.unique(m.kf_pt[local_kfs])
    ids = ids[ids >= 0]
    return ids[m.pt_valid[ids]]


def essential_edges(m, w: np.ndarray) -> List[Tuple[int, int]]:
    """Edges of the essential graph: spanning tree + loop edges +
    high-covisibility (>= 100) pairs (Optimizer.cc:958-1091)."""
    edges = set()
    for kf in np.where(m.kf_valid)[0]:
        par = m.kf_parent[kf]
        if par >= 0 and m.kf_valid[par]:
            edges.add((min(kf, par), max(kf, par)))
        for le in m.kf_loop_edges[kf]:
            if m.kf_valid[le]:
                edges.add((min(kf, le), max(kf, le)))
    hi = np.argwhere(np.triu(w, 1) >= ESSENTIAL_THRESHOLD)
    for a, b in hi:
        if m.kf_valid[a] and m.kf_valid[b]:
            edges.add((int(a), int(b)))
    return sorted(edges)
