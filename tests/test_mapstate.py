import numpy as np

from orbslam2_tpu.slammap import covisibility
from orbslam2_tpu.slammap.mapstate import MapCapacity, MapState


def make_map(n_kf=4, n_pts=50, n_feat=64):
    m = MapState(MapCapacity(max_keyframes=8, max_points=128, n_features=n_feat))
    rng = np.random.default_rng(0)
    kfs = []
    for k in range(n_kf):
        kf = m.add_keyframe(
            pose=np.eye(4, dtype=np.float32),
            timestamp=float(k), frame_id=k,
            kp_xy=rng.uniform(0, 300, (n_feat, 2)).astype(np.float32),
            kp_octave=np.zeros(n_feat, np.int32),
            kp_angle=np.zeros(n_feat, np.float32),
            kp_response=np.ones(n_feat, np.float32),
            kp_desc=rng.integers(0, 2**32, (n_feat, 8), dtype=np.uint32),
            kp_valid=np.ones(n_feat, bool),
            kp_ur=np.full(n_feat, -1, np.float32),
            kp_depth=np.full(n_feat, -1, np.float32),
        )
        kfs.append(kf)
    pts = []
    for p in range(n_pts):
        pid = m.add_point(rng.normal(size=3).astype(np.float32),
                          rng.integers(0, 2**32, 8, dtype=np.uint32), kfs[0], 0)
        pts.append(pid)
    return m, kfs, pts


class TestMapState:
    def test_allocation_and_counts(self):
        m, kfs, pts = make_map()
        assert m.n_keyframes() == 4
        assert m.n_points() == 50

    def test_observations(self):
        m, kfs, pts = make_map()
        m.add_observation(kfs[0], 3, pts[0])
        m.add_observation(kfs[1], 5, pts[0])
        obs = m.point_observations(pts[0])
        assert (kfs[0], 3) in obs and (kfs[1], 5) in obs
        counts = m.point_obs_count()
        assert counts[pts[0]] == 2

    def test_erase_point_clears_observations(self):
        m, kfs, pts = make_map()
        m.add_observation(kfs[0], 3, pts[0])
        m.erase_point(pts[0])
        assert not m.pt_valid[pts[0]]
        assert (m.kf_pt[kfs[0]] != pts[0]).all()

    def test_replace_point_redirects(self):
        m, kfs, pts = make_map()
        m.add_observation(kfs[0], 3, pts[0])
        m.add_observation(kfs[1], 5, pts[0])
        m.add_observation(kfs[1], 7, pts[1])  # kf1 already sees pts[1]
        m.replace_point(pts[0], pts[1])
        assert not m.pt_valid[pts[0]]
        # kf0 redirected; kf1 kept its existing observation of pts[1]
        assert m.kf_pt[kfs[0], 3] == pts[1]
        assert m.kf_pt[kfs[1], 5] == -1
        assert m.kf_pt[kfs[1], 7] == pts[1]

    def test_erase_keyframe_reparents(self):
        m, kfs, pts = make_map()
        m.kf_parent[kfs[1]] = kfs[0]
        m.kf_parent[kfs[2]] = kfs[1]
        m.erase_keyframe(kfs[1])
        assert m.kf_parent[kfs[2]] == kfs[0]
        assert not m.kf_valid[kfs[1]]

    def test_slot_reuse(self):
        m, kfs, pts = make_map()
        m.erase_point(pts[0])
        new = m.add_point(np.zeros(3, np.float32), np.zeros(8, np.uint32), kfs[0], 9)
        assert new == pts[0]


class TestCovisibility:
    def test_weight_matrix(self):
        m, kfs, pts = make_map()
        # kf0 and kf1 share 20 points; kf1 and kf2 share 5
        for i in range(20):
            m.add_observation(kfs[0], i, pts[i])
            m.add_observation(kfs[1], i, pts[i])
        for i in range(5):
            m.add_observation(kfs[2], 30 + i, pts[i])
        w = covisibility.weight_matrix(m)
        assert w[kfs[0], kfs[1]] == 20
        assert w[kfs[1], kfs[2]] == 5
        assert w[kfs[0], kfs[0]] == 0

    def test_covisible_neighbors_threshold(self):
        m, kfs, pts = make_map()
        for i in range(20):
            m.add_observation(kfs[0], i, pts[i])
            m.add_observation(kfs[1], i, pts[i])
        for i in range(5):
            m.add_observation(kfs[2], i, pts[i])
        w = covisibility.weight_matrix(m)
        nb = covisibility.covisible_neighbors(w, kfs[0])
        assert list(nb) == [kfs[1]]  # kf2 below threshold 15
        nb2 = covisibility.covisible_neighbors(w, kfs[2])
        # below threshold everywhere -> single best kept
        assert len(nb2) == 1

    def test_spanning_parent(self):
        m, kfs, pts = make_map()
        for i in range(30):
            m.add_observation(kfs[0], i, pts[i])
            m.add_observation(kfs[1], i, pts[i])
        w = covisibility.weight_matrix(m)
        covisibility.assign_spanning_parent(m, w, kfs[1])
        assert m.kf_parent[kfs[1]] == kfs[0]
        # parent must be an earlier keyframe
        covisibility.assign_spanning_parent(m, w, kfs[0])
        assert m.kf_parent[kfs[0]] == -1

    def test_local_keyframes(self):
        m, kfs, pts = make_map()
        for i in range(30):
            m.add_observation(kfs[0], i, pts[i])
            m.add_observation(kfs[1], i, pts[i])
        w = covisibility.weight_matrix(m)
        frame_pts = np.array(pts[:10], np.int64)
        local, ref = covisibility.local_keyframes(m, frame_pts, w)
        assert ref in (kfs[0], kfs[1])
        assert set([kfs[0], kfs[1]]).issubset(set(local.tolist()))

    def test_essential_edges(self):
        m, kfs, pts = make_map()
        m.kf_parent[kfs[1]] = kfs[0]
        m.kf_loop_edges[kfs[2]].add(kfs[0])
        w = covisibility.weight_matrix(m)
        edges = covisibility.essential_edges(m, w)
        assert (kfs[0], kfs[1]) in edges
        assert (kfs[0], kfs[2]) in edges


class TestDeviceMapMirror:
    def test_dirty_row_sync(self):
        import jax.numpy as jnp
        from orbslam2_tpu.slammap.device_map import DeviceMapMirror
        m, kfs, pts = make_map()
        mir = DeviceMapMirror()
        mir.sync(m)
        assert mir.n_full_uploads == 1
        np.testing.assert_allclose(np.asarray(mir.pt_pos), m.pt_pos)
        # idempotent when clean
        mir.sync(m)
        assert mir.n_full_uploads == 1 and mir.n_row_uploads == 0
        # dirty a few rows -> row upload, values match
        m.pt_pos[pts[3]] = [9, 9, 9]
        m.mark_pts_dirty([pts[3]])
        new_pt = m.add_point(np.array([1, 2, 3], np.float32),
                             np.zeros(8, np.uint32), kfs[0], 5)
        mir.sync(m)
        assert mir.n_row_uploads == 1 and mir.n_full_uploads == 1
        np.testing.assert_allclose(np.asarray(mir.pt_pos)[pts[3]], [9, 9, 9])
        np.testing.assert_allclose(np.asarray(mir.pt_pos)[new_pt], [1, 2, 3])
        assert bool(np.asarray(mir.pt_valid)[new_pt])
        # erase -> validity propagates
        m.erase_point(pts[0])
        mir.sync(m)
        assert not bool(np.asarray(mir.pt_valid)[pts[0]])
        # bulk rewrite -> full upload
        m.pt_pos[:] += 1.0
        m.mark_all_pts_dirty()
        mir.sync(m)
        assert mir.n_full_uploads == 2
        np.testing.assert_allclose(np.asarray(mir.pt_pos), m.pt_pos)

    def test_mirror_survives_map_clear(self):
        from orbslam2_tpu.slammap.device_map import DeviceMapMirror
        m, kfs, pts = make_map()
        mir = DeviceMapMirror()
        mir.sync(m)
        m.clear()  # fresh generation; mirror must resync, not alias stale
        assert m.pt_dirty_gen != mir.gen
        mir.sync(m)
        assert not np.asarray(mir.pt_valid).any()
