"""End-to-end loop closing and relocalization with place recognition."""
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.frontend.tracking import SLAMConfig, TrackingState
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.evaluate import ate_rmse
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.place.pretrained import get_default_vocabulary
from orbslam2_tpu.system import SLAMSystem, Sensor

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)


@pytest.fixture(scope="module")
def voc():
    return get_default_vocabulary()


def make_system(voc, **kw):
    cfg = SLAMConfig(
        cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
        th_depth=4.0, max_keyframes=96, max_points=16384,
        local_point_cap=2048, max_frames_between_kf=5,
        min_init_features=300, **kw)
    return SLAMSystem(cfg, Sensor.RGBD, vocabulary=voc)


class TestLoopClosing:
    def test_panorama_loop_closes(self, voc):
        seq = SyntheticSequence(CAM, n_frames=100, trajectory="panorama",
                                seed=7, world="room")
        system = make_system(voc, force_kf_every=4)
        system.loop_closer.cfg.consistency_threshold = 2
        system.local_mapper.cfg.kf_cull_redundancy = 2.0
        import time
        for i in range(seq.n_frames):
            # sustainable cadence: at max drive rate this 2-vCPU box outruns
            # the mapping worker and the keyframe gate (AcceptKeyFrames
            # analogue) starts rejecting — reference mains sleep-to-timestamp
            t0 = time.time()
            while (system.mapping_worker is not None
                   and system.mapping_worker.queue_size() >= 2
                   and time.time() - t0 < 10.0):
                time.sleep(0.01)
            gray, depth = seq.render(i)
            system.track_rgbd(gray, depth, i / seq.fps)
        # drain the async worker: the loop-closing keyframe may still be
        # queued when the sequence ends
        system.wait_mapping_idle()
        assert system.loop_closer.n_loops_closed >= 1
        # loop edge recorded in the map graph
        n_loop_edges = sum(len(e) for e in system.map.kf_loop_edges)
        assert n_loop_edges >= 2  # symmetric pair
        est = system.tracker.full_trajectory_twc()
        gt = np.stack([np.linalg.inv(seq.poses[i]) for i in range(seq.n_frames)])
        err = ate_rmse(est, gt)
        assert err < 0.15, f"post-loop ATE {err:.3f}"


class TestRelocalization:
    def test_kidnapped_robot(self, voc):
        """Map a scene, force LOST, present a view of mapped territory:
        the tracker must relocalize via KFDB + EPnP."""
        seq = SyntheticSequence(CAM, n_frames=30, trajectory="lateral", seed=11)
        system = make_system(voc)
        for i in range(25):
            gray, depth = seq.render(i)
            system.track_rgbd(gray, depth, i / seq.fps)
        assert system.map.n_keyframes() >= 1
        # kidnap: declare tracking lost, no motion model
        system.tracker.state = TrackingState.LOST
        system.tracker.velocity = None
        # frame 5 revisits early-mapped territory
        gray, depth = seq.render(5)
        tcw = system.track_rgbd(gray, depth, 99.0)
        assert tcw is not None, "relocalization failed"
        assert system.tracker.state == TrackingState.OK
        # recovered pose close to ground truth of frame 5
        err = np.linalg.norm(tcw[:3, 3] - seq.poses[5][:3, 3])
        assert err < 0.1, f"reloc pose error {err:.3f}"


class TestSearchBySim3Expansion:
    """SearchBySim3 match expansion (ORBmatcher.cc:1166, LoopClosing.cc:
    391-401): after Sim3-RANSAC the reference mutually projects both point
    sets to ADD matches before OptimizeSim3 — borderline loops whose BoW
    matching is thin must be rescued by the expansion (r3 verdict #4)."""

    def _drive(self, voc, thin_to, expansion_on, min_inliers):
        import time

        from orbslam2_tpu.frontend import kernels as k
        seq = SyntheticSequence(CAM, n_frames=100, trajectory="panorama",
                                seed=7, world="room")
        system = make_system(voc, force_kf_every=4)
        lc = system.loop_closer
        lc.cfg.consistency_threshold = 2
        lc.cfg.min_sim3_inliers = min_inliers
        system.local_mapper.cfg.kf_cull_redundancy = 2.0
        orig_search = k.search_by_descriptor
        orig_sim3 = lc._compute_sim3
        stats = {"bow_pairs": [], "opt_calls": 0}

        def thin_search(*a, **kw):
            best_kp, d = orig_search(*a, **kw)
            bk = np.asarray(best_kp).copy()
            qs = np.where(bk >= 0)[0]
            stats["bow_pairs"].append(len(qs))
            bk[qs[thin_to:]] = -1
            return jnp.asarray(bk), d

        def sim3_with_thin_bow(kf, cands, w):
            # scope the thinning to the loop closer's BoW stage only
            k.search_by_descriptor = thin_search
            try:
                return orig_sim3(kf, cands, w)
            finally:
                k.search_by_descriptor = orig_search

        lc._compute_sim3 = sim3_with_thin_bow
        if not expansion_on:
            lc._search_by_sim3 = lambda *a: (
                np.zeros(0, np.int64), np.zeros(0, np.int64))
        for i in range(seq.n_frames):
            t0 = time.time()
            while (system.mapping_worker is not None
                   and system.mapping_worker.queue_size() >= 2
                   and time.time() - t0 < 10.0):
                time.sleep(0.01)
            gray, depth = seq.render(i)
            system.track_rgbd(gray, depth, i / seq.fps)
        system.wait_mapping_idle()
        return system, stats

    def test_expansion_rescues_thin_ransac(self, voc):
        # BoW matching thinned to 22 pairs; the inlier gate raised to 30 so
        # the RANSAC inliers alone (<=22) can NEVER pass — only matches
        # ADDED by SearchBySim3 can. Without expansion the identical drive
        # must fail the gate (mechanism control).
        system, stats = self._drive(voc, thin_to=22, expansion_on=True,
                                    min_inliers=30)
        assert system.loop_closer.n_loops_closed >= 1, \
            "expansion failed to rescue the thin-BoW loop"
        system2, _ = self._drive(voc, thin_to=22, expansion_on=False,
                                 min_inliers=30)
        assert system2.loop_closer.n_loops_closed == 0, \
            "control without expansion should not pass the raised gate"


class TestRelocEscalation:
    """Reference escalation protocol (Tracking.cc:1749-1803): accept only
    at >=50 inliers, with widened SearchByProjection rounds rescuing
    candidates whose BoW matching alone is too thin (r3 verdict #3)."""

    def _mapped_system(self, voc):
        seq = SyntheticSequence(CAM, n_frames=30, trajectory="lateral",
                                seed=11)
        system = make_system(voc)
        for i in range(25):
            gray, depth = seq.render(i)
            system.track_rgbd(gray, depth, i / seq.fps)
        assert system.map.n_keyframes() >= 1
        system.tracker.state = TrackingState.LOST
        system.tracker.velocity = None
        return system, seq

    def _lost_frame(self, system, seq, idx=5):
        from orbslam2_tpu.frontend import frame as frame_mod
        gray, depth = seq.render(idx)
        tr = system.tracker
        return frame_mod.build_frame_rgbd(
            999, 99.0, gray, depth, tr.extractor, tr.cam)

    def test_widened_round_rescues_thin_bow_match(self, voc, monkeypatch):
        """Starve the BoW stage to ~25 matches: the first pose-opt lands
        <50 inliers, and ONLY the widened projection round can push the
        count past the acceptance gate — the reference's rescue path."""
        system, seq = self._mapped_system(voc)
        tr = system.tracker
        fr = self._lost_frame(system, seq)

        from orbslam2_tpu.frontend import kernels as k
        orig = k.search_by_descriptor

        def thin_search(*a, **kw):
            best_kp, d = orig(*a, **kw)
            bk = np.asarray(best_kp).copy()
            qs = np.where(bk >= 0)[0]
            bk[qs[25:]] = -1  # keep only 25 BoW matches
            return jnp.asarray(bk), d

        monkeypatch.setattr(k, "search_by_descriptor", thin_search)
        calls = []
        orig_proj = tr._reloc_project_candidate

        def spy(fr_, cand, radius_mult, max_hamming):
            n = orig_proj(fr_, cand, radius_mult, max_hamming)
            calls.append((radius_mult, max_hamming, n))
            return n

        monkeypatch.setattr(tr, "_reloc_project_candidate", spy)
        assert tr._relocalize(fr), "widened round failed to rescue"
        assert calls, "escalation protocol never ran the projection round"
        assert calls[0][0] == 3.0 and calls[0][1] == 100
        assert sum(c[2] for c in calls) > 0, "projection round added nothing"
        assert tr.matches_inliers >= 50
        err = np.linalg.norm(
            np.linalg.inv(fr.tcw)[:3, 3] - np.linalg.inv(seq.poses[5])[:3, 3])
        assert err < 0.1, f"rescued reloc pose error {err:.3f}"

    def test_thin_candidate_without_rescue_rejected(self, voc, monkeypatch):
        """A candidate passing the old >=10 gate but with no projection
        rescue must now be REJECTED at <50 — the r3 verdict's wrong-pose
        acceptance hole."""
        system, seq = self._mapped_system(voc)
        tr = system.tracker
        fr = self._lost_frame(system, seq)

        from orbslam2_tpu.frontend import kernels as k
        orig = k.search_by_descriptor

        def thin_search(*a, **kw):
            best_kp, d = orig(*a, **kw)
            bk = np.asarray(best_kp).copy()
            qs = np.where(bk >= 0)[0]
            bk[qs[25:]] = -1
            return jnp.asarray(bk), d

        monkeypatch.setattr(k, "search_by_descriptor", thin_search)
        monkeypatch.setattr(tr, "_reloc_project_candidate",
                            lambda *a, **kw: 0)
        assert not tr._relocalize(fr), \
            "a <50-inlier pose with no rescue must be rejected"


class TestGBAProtocol:
    """Abort-and-rerun global BA on a map snapshot with spanning-tree
    propagation (RunGlobalBundleAdjustment, LoopClosing.cc:792-896)."""

    def _bare_closer(self, m):
        import threading
        from orbslam2_tpu.frontend.loop_closing import LoopCloser, LoopCloserConfig
        lc = LoopCloser.__new__(LoopCloser)
        lc.map = m
        lc.cam = CAM
        lc.cfg = LoopCloserConfig()
        lc.map_lock = threading.RLock()
        lc.full_ba_idx = 0
        lc.n_gba_applied = 0
        lc.n_gba_superseded = 0
        lc._gba_thread = None
        return lc

    def _make_map(self):
        from tests.test_mapstate import make_map
        m, kfs, pts = make_map(n_kf=4, n_pts=30)
        rng = np.random.default_rng(1)
        for i, k in enumerate(kfs):
            m.kf_pose[k, :3, 3] = [0.1 * i, 0, 0]
            m.kf_parent[k] = kfs[i - 1] if i else -1
        for j, p in enumerate(pts):
            m.kf_pt[kfs[j % 4], j] = p
            m.pt_pos[p] = rng.normal(size=3)
        return m, kfs, pts

    def test_propagation_to_fresh_kfs_and_points(self):
        m, kfs, pts = self._make_map()
        lc = self._bare_closer(m)
        snap = {
            "idx": 1, "fixed_kf": kfs[0], "problem": None, "pt_fixed": None,
            "kf_in": m.kf_valid.copy(), "kf_order": m.kf_order.copy(),
            "pt_in": m.pt_valid.copy(), "pt_stamp": m.pt_stamp.copy(),
        }
        # grow the map AFTER the snapshot: one child KF of kfs[-1], one point
        n_feat = m.cap.n_features
        rng = np.random.default_rng(2)
        new_kf = m.add_keyframe(
            pose=np.eye(4, dtype=np.float32), timestamp=9.0, frame_id=9,
            kp_xy=rng.uniform(0, 300, (n_feat, 2)).astype(np.float32),
            kp_octave=np.zeros(n_feat, np.int32),
            kp_angle=np.zeros(n_feat, np.float32),
            kp_response=np.ones(n_feat, np.float32),
            kp_desc=rng.integers(0, 2**32, (n_feat, 8), dtype=np.uint32),
            kp_valid=np.ones(n_feat, bool),
            kp_ur=np.full(n_feat, -1, np.float32),
            kp_depth=np.full(n_feat, -1, np.float32))
        m.kf_parent[new_kf] = kfs[-1]
        m.kf_pose[new_kf, :3, 3] = [0.4, 0, 0]
        new_pt = m.add_point(np.array([1.0, 2.0, 3.0], np.float32),
                             rng.integers(0, 2**32, 8, dtype=np.uint32),
                             kfs[-1], 9)
        # fake GBA output: shift every snapshot pose by +1 in y
        shift = np.eye(4, dtype=np.float32)
        shift[1, 3] = 1.0
        new_poses = m.kf_pose.copy()
        for k in kfs:
            new_poses[k] = shift @ m.kf_pose[k]
        moved = m.pt_pos.copy() + np.array([0, 0, 0.5], np.float32)
        pt_pos_before = m.pt_pos[new_pt].copy()
        lc._apply_gba(snap, new_poses, moved)
        # snapshot KFs took the GBA poses
        for k in kfs:
            np.testing.assert_allclose(m.kf_pose[k], new_poses[k], atol=1e-5)
        # fresh KF got the parent-chain correction: T_rel unchanged
        t_rel = m.kf_pose[new_kf] @ np.linalg.inv(m.kf_pose[kfs[-1]])
        expect_rel = np.eye(4, dtype=np.float32)
        expect_rel[:3, 3] = [0.4 - 0.3, 0, 0]
        np.testing.assert_allclose(t_rel, expect_rel, atol=1e-5)
        # snapshot points took optimized positions
        np.testing.assert_allclose(m.pt_pos[pts[0]], moved[pts[0]], atol=1e-5)
        # fresh point moved consistently with its ref KF (camera coords kept)
        t_old = np.eye(4, dtype=np.float32)
        t_old[:3, 3] = [0.3, 0, 0]
        pc = t_old[:3, :3] @ pt_pos_before + t_old[:3, 3]
        t_new = new_poses[kfs[-1]]
        expect = t_new[:3, :3].T @ (pc - t_new[:3, 3])
        np.testing.assert_allclose(m.pt_pos[new_pt], expect, atol=1e-5)

    def test_superseded_run_is_discarded(self):
        m, kfs, pts = self._make_map()
        lc = self._bare_closer(m)
        lc.full_ba_idx = 1
        snap = {
            "idx": 1, "fixed_kf": kfs[0], "problem": None, "pt_fixed": None,
            "kf_in": m.kf_valid.copy(), "kf_order": m.kf_order.copy(),
            "pt_in": m.pt_valid.copy(), "pt_stamp": m.pt_stamp.copy(),
        }
        lc.full_ba_idx = 2  # a newer loop landed while "running"
        poses_before = m.kf_pose.copy()

        class FakeRes:
            poses = jnp.asarray(m.kf_pose + 7.0)
            points = jnp.asarray(m.pt_pos + 7.0)

        import orbslam2_tpu.backend.ba as _ba
        orig = _ba.bundle_adjust_pcg
        _ba.bundle_adjust_pcg = lambda *a, **k: FakeRes()
        try:
            snap["problem"] = None
            snap["pt_fixed"] = np.zeros(m.cap.max_points, bool)
            lc._run_gba(snap)
        finally:
            _ba.bundle_adjust_pcg = orig
        assert lc.n_gba_superseded == 1
        assert lc.n_gba_applied == 0
        np.testing.assert_allclose(m.kf_pose, poses_before)
