"""Loop-correction measurement semantics (Optimizer.cc:885-1153).

The essential-graph edge measurements are the most delicate bookkeeping in
loop closing: edges that existed BEFORE the loop must measure the
PRE-correction relative pose (NonCorrectedSim3, Optimizer.cc:977-1010,
1032-1058), while connections newly created by the loop fusion and the
loop edge itself measure the corrected relatives (cc:920-950). These tests
capture the measurements fed to the optimizer and check both regimes, plus
the first-observer point remap.
"""
import numpy as np
import pytest

import orbslam2_tpu.frontend.loop_closing as lc
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.slammap import covisibility
from orbslam2_tpu.slammap.mapstate import MapCapacity, MapState

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)


def _line_map(n_kf=6, pts_per_kf=40):
    """KFs along +x with identity rotations; each KF observes its own
    fresh points plus the previous KF's (covisibility chain)."""
    rng = np.random.default_rng(0)
    m = MapState(MapCapacity(max_keyframes=8, max_points=512, n_features=64))
    for k in range(n_kf):
        m.kf_valid[k] = True
        m.kf_order[k] = k
        m.kf_pose[k] = np.eye(4, dtype=np.float32)
        m.kf_pose[k][0, 3] = -k * 0.5  # camera at x = k*0.5
        m.kf_kp_valid[k] = True
        m.kf_kp_xy[k] = rng.uniform([0, 0], [320, 240], (64, 2))
    m._kf_counter = n_kf
    m.kf_parent[1:n_kf] = np.arange(n_kf - 1)
    pid = 0
    for k in range(n_kf):
        for j in range(pts_per_kf):
            m.pt_valid[pid] = True
            m.pt_pos[pid] = [k * 0.5 + rng.uniform(-0.2, 0.2),
                             rng.uniform(-1, 1), rng.uniform(3, 6)]
            m.pt_ref_kf[pid] = k
            m.pt_stamp[pid] = pid
            m.kf_pt[k, j] = pid
            pid += 1
    m._pt_counter = pid
    # overlap: KF k+1 also observes the first half of KF k's points
    for k in range(n_kf - 1):
        base = k * pts_per_kf
        m.kf_pt[k + 1, 40:60] = np.arange(base, base + 20)
    m.touch_obs()
    return m


@pytest.fixture
def stubbed(monkeypatch):
    captured = {}

    def fake_opt(poses, valid, fixed, e_i, e_j, meas, e_valid, fix_scale):
        captured["e_i"] = np.asarray(e_i)
        captured["e_j"] = np.asarray(e_j)
        captured["meas"] = np.asarray(meas)
        captured["init"] = np.asarray(poses)
        return poses, None

    def fake_fuse(t_ids, t_val, pose_all, xy, desc, octv, ang, val,
                  ids, sel, *rest, **kw):
        return np.full((len(np.asarray(t_ids)), np.asarray(xy).shape[1]),
                       -1, np.int32)

    monkeypatch.setattr(lc.pose_graph, "optimize_essential_graph", fake_opt)
    monkeypatch.setattr(lc.kernels, "fuse_targets", fake_fuse)
    return captured


def _closer(m):
    c = lc.LoopCloser.__new__(lc.LoopCloser)
    c.map = m
    c.cam = CAM
    c.cfg = lc.LoopCloserConfig(run_global_ba=False)
    return c


def _edge_meas(cap, a, b):
    sel = (cap["e_i"] == a) & (cap["e_j"] == b)
    assert sel.any(), f"edge ({a},{b}) missing from the graph"
    return cap["meas"][np.where(sel)[0][0]]


class TestNonCorrectedSim3:
    def test_edge_measurements(self, stubbed):
        m = _line_map()
        n_kf = 6
        pre = m.kf_pose.copy()
        w = covisibility.weight_matrix(m)
        kf, loop_kf = n_kf - 1, 0
        assert w[kf, kf - 1] >= covisibility.COVIS_THRESHOLD  # window has 4
        # corrected pose of KF5: true pose is near KF0's (loop), with drift
        s_cw = pre[loop_kf].copy()
        s_cw[0, 3] -= 0.12
        closer = _closer(m)
        closer._correct_loop(kf, loop_kf, s_cw, w)
        cap = stubbed

        # pre-existing spanning-tree edge fully outside the window:
        # pre-correction relative (poses unchanged there)
        m_01 = _edge_meas(cap, 0, 1)
        np.testing.assert_allclose(
            m_01, pre[1] @ np.linalg.inv(pre[0]), atol=1e-5)

        # pre-existing boundary edge (3,4): KF4 is in the window and WAS
        # corrected in the map, but the measurement must use its
        # PRE-correction pose (NonCorrectedSim3)
        m_34 = _edge_meas(cap, 3, 4)
        np.testing.assert_allclose(
            m_34, pre[4] @ np.linalg.inv(pre[3]), atol=1e-5)
        assert not np.allclose(m.kf_pose[4], pre[4], atol=1e-4), \
            "KF4 should have been corrected in the map"

        # the loop edge measures the CORRECTED relative: S5_corr S0^-1
        t_5c = pre[kf] @ np.linalg.inv(pre[kf])  # T_5 T_c^-1 with c=5 = I
        s5_corr = t_5c @ s_cw
        m_05 = _edge_meas(cap, 0, kf)
        np.testing.assert_allclose(
            m_05, s5_corr @ np.linalg.inv(pre[0]), atol=1e-5)

        # initial values: window KFs enter with their corrected Sim3
        np.testing.assert_allclose(cap["init"][kf], s5_corr, atol=1e-5)

    def test_window_points_remap_through_first_observer(self, stubbed):
        m = _line_map()
        pre = m.kf_pose.copy()
        pre_pts = m.pt_pos.copy()
        w = covisibility.weight_matrix(m)
        kf, loop_kf = 5, 0
        s_cw = pre[loop_kf].copy()
        s_cw[0, 3] -= 0.12
        closer = _closer(m)
        closer._correct_loop(kf, loop_kf, s_cw, w)
        # a point observed ONLY by window KFs moved by the window correction
        # p' = S_corr^-1 (S_old p); with identity rotations this is a shift
        win = [kf, *map(int, covisibility.covisible_neighbors(w, kf))]
        only_window = [p for p in range(m.cap.max_points) if m.pt_valid[p]
                       and all(k in win for k, _ in m.point_observations(p))]
        # fake optimizer returned the corrected initial poses unchanged, so
        # the final apply uses remap_k = inv(new) @ cur = identity for
        # all reference KFs -> positions reflect the window remap only
        moved = [p for p in only_window
                 if not np.allclose(m.pt_pos[p], pre_pts[p], atol=1e-5)]
        assert len(moved) > 0, "window points did not move"
        # and points observed only far outside the window stayed put
        far = [p for p in range(40) if m.pt_valid[p]
               and all(k not in win for k, _ in m.point_observations(p))]
        for p in far[:10]:
            np.testing.assert_allclose(m.pt_pos[p], pre_pts[p], atol=1e-5)
