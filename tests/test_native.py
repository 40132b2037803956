"""Native map-graph engine vs numpy reference implementations."""
import numpy as np
import pytest

from orbslam2_tpu.slammap import covisibility, native, point_stats
from orbslam2_tpu.slammap.mapstate import MapCapacity, MapState
from test_mapstate import make_map


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def populated_map(rng, n_kf=6, n_pts=100, n_feat=64):
    m = MapState(MapCapacity(max_keyframes=8, max_points=128, n_features=n_feat))
    kfs = []
    for k in range(n_kf):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = rng.normal(size=3).astype(np.float32)
        kf = m.add_keyframe(
            pose=pose, timestamp=float(k), frame_id=k,
            kp_xy=rng.uniform(0, 300, (n_feat, 2)).astype(np.float32),
            kp_octave=rng.integers(0, 4, n_feat).astype(np.int32),
            kp_angle=np.zeros(n_feat, np.float32),
            kp_response=np.ones(n_feat, np.float32),
            kp_desc=rng.integers(0, 2**32, (n_feat, 8), dtype=np.uint32),
            kp_valid=np.ones(n_feat, bool),
            kp_ur=np.full(n_feat, -1, np.float32),
            kp_depth=np.full(n_feat, -1, np.float32),
        )
        kfs.append(kf)
    pts = []
    for _ in range(n_pts):
        pid = m.add_point(rng.normal(size=3).astype(np.float32) + [0, 0, 5],
                          rng.integers(0, 2**32, 8, dtype=np.uint32), kfs[0], 0)
        pts.append(pid)
    # random observations, at most one slot per (kf, point)
    for p in pts:
        for k in kfs:
            if rng.random() < 0.5:
                slot = int(rng.integers(0, n_feat))
                if m.kf_pt[k, slot] < 0:
                    m.add_observation(k, slot, p)
    return m, kfs, pts


class TestNativeParity:
    def test_covis_weights(self, rng):
        m, kfs, pts = populated_map(rng)
        w_native = native.covis_weights(m.kf_pt, m.kf_valid, m.pt_valid)
        inc = m.incidence()
        w_np = inc.astype(np.int32) @ inc.astype(np.int32).T
        np.fill_diagonal(w_np, 0)
        np.testing.assert_array_equal(w_native, w_np)

    def test_point_obs_count(self, rng):
        m, kfs, pts = populated_map(rng)
        c_native = native.point_obs_count(m.kf_pt, m.kf_valid, m.cap.max_points)
        # numpy reference
        counts = np.zeros(m.cap.max_points + 1, np.int64)
        obs = m.kf_pt[m.kf_valid]
        np.add.at(counts, obs[obs >= 0], 1)
        np.testing.assert_array_equal(c_native, counts[:m.cap.max_points])

    def test_update_point_stats(self, rng):
        import copy
        m, kfs, pts = populated_map(rng)
        m2 = copy.deepcopy(m)
        pts_arr = np.array(pts, np.int64)
        ok = native.update_point_stats(m, pts_arr, 1.2, 4)
        assert ok
        point_stats.update_points(m2, pts_arr, 1.2, 4)
        np.testing.assert_array_equal(m.pt_desc, m2.pt_desc)
        np.testing.assert_allclose(m.pt_normal, m2.pt_normal, atol=1e-5)
        np.testing.assert_allclose(m.pt_max_dist, m2.pt_max_dist, rtol=1e-5)
        np.testing.assert_allclose(m.pt_min_dist, m2.pt_min_dist, rtol=1e-5)
        np.testing.assert_array_equal(m.pt_ref_kf, m2.pt_ref_kf)

    def test_weight_matrix_dispatch(self, rng):
        """covisibility.weight_matrix must agree with the numpy fallback."""
        import os
        m, kfs, pts = populated_map(rng)
        w1 = covisibility.weight_matrix(m)
        os.environ["ORBSLAM2_TPU_NATIVE"] = "0"
        try:
            w2 = covisibility.weight_matrix(m)
        finally:
            os.environ.pop("ORBSLAM2_TPU_NATIVE")
        np.testing.assert_array_equal(w1, w2)


def test_local_share_matches_numpy():
    from orbslam2_tpu.slammap import native
    if not native.available():
        import pytest
        pytest.skip("native engine not built")
    rng = np.random.default_rng(5)
    k, n, p = 32, 64, 500
    kf_pt = rng.integers(-1, p, (k, n)).astype(np.int32)
    kf_valid = rng.random(k) > 0.2
    in_set = rng.random(p) > 0.7
    out = native.local_share(kf_pt, kf_valid, in_set)
    ref = (in_set[np.maximum(kf_pt, 0)] & (kf_pt >= 0)).sum(axis=1)
    ref[~kf_valid] = 0
    np.testing.assert_array_equal(out, ref)


def test_invert_obs_and_share_from_index():
    from orbslam2_tpu.slammap import native
    if not native.available():
        import pytest
        pytest.skip("native engine not built")
    rng = np.random.default_rng(9)
    k, n, p = 24, 48, 300
    kf_pt = rng.integers(-1, p, (k, n)).astype(np.int32)
    kf_valid = rng.random(k) > 0.25
    offsets, obs_kf = native.invert_obs(kf_pt, kf_valid, p)
    # index is a faithful inversion
    for pt in rng.integers(0, p, 20):
        observers = sorted(obs_kf[offsets[pt]:offsets[pt + 1]].tolist())
        ref = sorted(int(kk) for kk in range(k)
                     if kf_valid[kk] and (kf_pt[kk] == pt).any()
                     for _ in range((kf_pt[kk] == pt).sum()))
        assert observers == ref, pt
    # share query matches the direct mask computation
    pts = rng.choice(p, 40, replace=False).astype(np.int64)
    share = native.share_from_index(offsets, obs_kf, pts, k)
    in_set = np.zeros(p, bool)
    in_set[pts] = True
    ref = (in_set[np.maximum(kf_pt, 0)] & (kf_pt >= 0)).sum(axis=1)
    ref[~kf_valid] = 0
    np.testing.assert_array_equal(share, ref)
