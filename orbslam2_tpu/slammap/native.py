"""ctypes bindings for the native map-graph library (native/mapgraph.cpp).

Builds on demand with `make` (once per environment) and falls back to the
numpy implementations when no compiler is available. The native path is the
runtime analogue of the reference's C++ KeyFrame/MapPoint bookkeeping.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         "native", "libmapgraph.so")
_MAKE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")

_lib: Optional[ctypes.CDLL] = None
_tried = False


_ABI_VERSION = 2


def _is_stale(path: str) -> bool:
    """A library built before the current ABI lacks the version symbol.
    Checked on the file bytes — dlopen-ing a stale .so first would pin the
    old image for the process lifetime."""
    try:
        with open(path, "rb") as f:
            return b"mg_abi_version" not in f.read()
    except OSError:
        return True


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    needs_build = not os.path.exists(_LIB_PATH) or _is_stale(_LIB_PATH)
    if needs_build and os.path.isdir(_MAKE_DIR):
        try:
            subprocess.run(["make", "-s", "-B"], cwd=_MAKE_DIR, check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH) or _is_stale(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.mg_covis_weights.argtypes = [i32p, u8p, u8p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, i32p]
    lib.mg_point_obs_count.argtypes = [i32p, u8p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, i32p]
    lib.mg_local_share.argtypes = [i32p, u8p, u8p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int, i32p]
    lib.mg_abi_version.restype = ctypes.c_int32
    if lib.mg_abi_version() != _ABI_VERSION:
        return None
    lib.mg_invert_obs.argtypes = [i32p, u8p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, i32p, i32p]
    lib.mg_invert_obs_slots.argtypes = [i32p, u8p, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, i32p, i32p, i32p]
    lib.mg_share_from_index.argtypes = [i32p, i32p, i64p, ctypes.c_int,
                                        ctypes.c_int, i32p]
    lib.mg_update_point_stats.argtypes = [
        i64p, ctypes.c_int, i32p, u8p, u32p, i32p, f32p, f32p, i32p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, u32p, f32p, f32p, f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _ensure_built() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def covis_weights(kf_pt: np.ndarray, kf_valid: np.ndarray,
                  pt_valid: np.ndarray) -> Optional[np.ndarray]:
    lib = _ensure_built()
    if lib is None:
        return None
    k, n = kf_pt.shape
    p = len(pt_valid)
    kf_pt = np.ascontiguousarray(kf_pt, np.int32)
    kv = np.ascontiguousarray(kf_valid, np.uint8)
    pv = np.ascontiguousarray(pt_valid, np.uint8)
    out = np.zeros((k, k), np.int32)
    lib.mg_covis_weights(_ptr(kf_pt, ctypes.c_int32), _ptr(kv, ctypes.c_uint8),
                         _ptr(pv, ctypes.c_uint8), k, n, p,
                         _ptr(out, ctypes.c_int32))
    return out


def point_obs_count(kf_pt: np.ndarray, kf_valid: np.ndarray,
                    n_points: int) -> Optional[np.ndarray]:
    lib = _ensure_built()
    if lib is None:
        return None
    k, n = kf_pt.shape
    kf_pt = np.ascontiguousarray(kf_pt, np.int32)
    kv = np.ascontiguousarray(kf_valid, np.uint8)
    out = np.zeros(n_points, np.int32)
    lib.mg_point_obs_count(_ptr(kf_pt, ctypes.c_int32), _ptr(kv, ctypes.c_uint8),
                           k, n, n_points, _ptr(out, ctypes.c_int32))
    return out


def local_share(kf_pt: np.ndarray, kf_valid: np.ndarray,
                in_set: np.ndarray) -> Optional[np.ndarray]:
    """[K] per-keyframe count of observations whose point is in `in_set`
    ([P] bool) — the UpdateLocalKeyFrames seed computation."""
    lib = _ensure_built()
    if lib is None:
        return None
    k, n = kf_pt.shape
    p = len(in_set)
    kf_pt = np.ascontiguousarray(kf_pt, np.int32)
    kv = np.ascontiguousarray(kf_valid, np.uint8)
    mask = np.ascontiguousarray(in_set, np.uint8)
    out = np.zeros(k, np.int32)
    lib.mg_local_share(_ptr(kf_pt, ctypes.c_int32), _ptr(kv, ctypes.c_uint8),
                       _ptr(mask, ctypes.c_uint8), k, n, p,
                       _ptr(out, ctypes.c_int32))
    return out


def invert_obs(kf_pt: np.ndarray, kf_valid: np.ndarray, n_points: int):
    """-> (offsets [P+1] int32, obs_kf [total] int32) CSR point->keyframe
    index, or None without the native engine."""
    lib = _ensure_built()
    if lib is None:
        return None
    k, n = kf_pt.shape
    kf_pt = np.ascontiguousarray(kf_pt, np.int32)
    kv = np.ascontiguousarray(kf_valid, np.uint8)
    offsets = np.zeros(n_points + 1, np.int32)
    buf = np.zeros(k * n, np.int32)
    lib.mg_invert_obs(_ptr(kf_pt, ctypes.c_int32), _ptr(kv, ctypes.c_uint8),
                      k, n, n_points, _ptr(offsets, ctypes.c_int32),
                      _ptr(buf, ctypes.c_int32))
    total = int(offsets[-1])
    return offsets, buf[:total].copy()


def invert_obs_slots(kf_pt: np.ndarray, kf_valid: np.ndarray, n_points: int):
    """-> (offsets [P+1] int32, obs_kf [total] int32, obs_slot [total]
    int32) CSR point->(keyframe, keypoint slot) index, or None without the
    native engine."""
    lib = _ensure_built()
    if lib is None:
        return None
    k, n = kf_pt.shape
    kf_pt = np.ascontiguousarray(kf_pt, np.int32)
    kv = np.ascontiguousarray(kf_valid, np.uint8)
    offsets = np.zeros(n_points + 1, np.int32)
    buf_kf = np.zeros(k * n, np.int32)
    buf_slot = np.zeros(k * n, np.int32)
    lib.mg_invert_obs_slots(
        _ptr(kf_pt, ctypes.c_int32), _ptr(kv, ctypes.c_uint8),
        k, n, n_points, _ptr(offsets, ctypes.c_int32),
        _ptr(buf_kf, ctypes.c_int32), _ptr(buf_slot, ctypes.c_int32))
    total = int(offsets[-1])
    return offsets, buf_kf[:total].copy(), buf_slot[:total].copy()


def share_from_index(offsets: np.ndarray, obs_kf: np.ndarray,
                     pt_ids: np.ndarray, n_kf: int):
    lib = _ensure_built()
    if lib is None:
        return None
    pt_ids = np.ascontiguousarray(pt_ids, np.int64)
    out = np.zeros(n_kf, np.int32)
    lib.mg_share_from_index(
        _ptr(np.ascontiguousarray(offsets, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(obs_kf, np.int32), ctypes.c_int32),
        _ptr(pt_ids, ctypes.c_int64), len(pt_ids), n_kf,
        _ptr(out, ctypes.c_int32))
    return out


def update_point_stats(m, pts: np.ndarray, scale_factor: float,
                       n_levels: int) -> bool:
    """Update pt_desc/pt_normal/pt_min_dist/pt_max_dist (and pt_ref_kf)
    in-place for the given point ids. -> True if the native path ran."""
    lib = _ensure_built()
    if lib is None or len(pts) == 0:
        return lib is not None and len(pts) == 0
    from orbslam2_tpu.slammap.point_stats import camera_centers
    k, n = m.kf_pt.shape
    p = m.cap.max_points
    pts64 = np.ascontiguousarray(pts, np.int64)
    kf_pt = np.ascontiguousarray(m.kf_pt, np.int32)
    kv = np.ascontiguousarray(m.kf_valid, np.uint8)
    desc = np.ascontiguousarray(m.kf_kp_desc, np.uint32)
    octv = np.ascontiguousarray(m.kf_kp_octave, np.int32)
    centers = np.ascontiguousarray(camera_centers(m.kf_pose), np.float32)
    pos = np.ascontiguousarray(m.pt_pos, np.float32)
    ref = np.ascontiguousarray(m.pt_ref_kf, np.int32)
    out_desc = np.ascontiguousarray(m.pt_desc, np.uint32)
    out_norm = np.ascontiguousarray(m.pt_normal, np.float32)
    out_min = np.ascontiguousarray(m.pt_min_dist, np.float32)
    out_max = np.ascontiguousarray(m.pt_max_dist, np.float32)
    lib.mg_update_point_stats(
        _ptr(pts64, ctypes.c_int64), len(pts64),
        _ptr(kf_pt, ctypes.c_int32), _ptr(kv, ctypes.c_uint8),
        _ptr(desc, ctypes.c_uint32), _ptr(octv, ctypes.c_int32),
        _ptr(centers, ctypes.c_float), _ptr(pos, ctypes.c_float),
        _ptr(ref, ctypes.c_int32), k, n, p,
        ctypes.c_float(scale_factor), n_levels,
        _ptr(out_desc, ctypes.c_uint32), _ptr(out_norm, ctypes.c_float),
        _ptr(out_min, ctypes.c_float), _ptr(out_max, ctypes.c_float))
    m.pt_desc[...] = out_desc
    m.pt_normal[...] = out_norm
    m.pt_min_dist[...] = out_min
    m.pt_max_dist[...] = out_max
    m.pt_ref_kf[...] = ref
    return True
