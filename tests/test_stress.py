"""Stress: long sequence under tight capacities (slot churn, no crashes)."""
import numpy as np

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.evaluate import ate_rmse
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.system import SLAMSystem, Sensor

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)


class TestCapacityStress:
    def test_long_run_tight_capacity(self):
        """Aggressive keyframe cadence against small keyframe/point pools:
        culling must recycle slots and creation paths must degrade
        gracefully at capacity, never crash."""
        seq = SyntheticSequence(CAM, n_frames=80, trajectory="shuttle",
                                seed=13, world="cluttered")
        cfg = SLAMConfig(
            cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
            th_depth=4.0, max_keyframes=20, max_points=2500,
            local_point_cap=2048, max_frames_between_kf=4,
            min_init_features=300, force_kf_every=3)
        system = SLAMSystem(cfg, Sensor.RGBD)
        ok = 0
        for i in range(seq.n_frames):
            gray, depth = seq.render(i)
            tcw = system.track_rgbd(gray, depth, i / seq.fps)
            ok += tcw is not None
            assert system.map.n_points() <= cfg.max_points
            assert system.map.n_keyframes() <= cfg.max_keyframes
        assert ok >= seq.n_frames - 3, f"tracked {ok}/{seq.n_frames}"
        est = system.tracker.full_trajectory_twc()
        gt = np.stack([np.linalg.inv(seq.poses[i]) for i in range(seq.n_frames)])
        err = ate_rmse(est, gt)
        assert err < 0.25, f"stress ATE {err:.3f}"
        # slot recycling actually happened
        assert system.map._kf_counter > cfg.max_keyframes


class TestKittiScaleMap:
    """KITTI-00-sized map (ROADMAP item 4): ~1400 keyframes / 150k points.
    The per-keyframe host bookkeeping (covisibility, observation counts,
    local-map selection) must stay interactive at this scale — these are
    the ops the tracker and mapper run between device calls."""

    def test_host_ops_at_scale(self):
        import time
        from orbslam2_tpu.slammap import covisibility
        from orbslam2_tpu.slammap.mapstate import MapCapacity, MapState

        rng = np.random.default_rng(0)
        n_feat = 512   # observation slots per KF (full geometry uses 2255)
        m = MapState(MapCapacity(max_keyframes=1536, max_points=150_000,
                                 n_features=n_feat))
        n_kf, n_pt = 1400, 150_000
        # bulk-fill the SoA arrays (add_keyframe per-KF copies are not the
        # point here; observation structure is)
        m.kf_valid[:n_kf] = True
        m.kf_order[:n_kf] = np.arange(n_kf)
        m._kf_counter = n_kf
        m.pt_valid[:n_pt] = True
        m.pt_stamp[:n_pt] = np.arange(n_pt)
        m._pt_counter = n_pt
        m.pt_pos[:n_pt] = rng.normal(size=(n_pt, 3))
        # each KF observes a contiguous-ish window of points, as in a real
        # trajectory (covisibility = window overlap)
        for k in range(n_kf):
            base = int(k / n_kf * (n_pt - 1200))
            m.kf_pt[k, :400] = base + rng.choice(1200, 400, replace=False)
            m.kf_kp_valid[k, :400] = True
        m.pt_ref_kf[:n_pt] = rng.integers(0, n_kf, n_pt)

        t0 = time.perf_counter()
        w = covisibility.weight_matrix(m)
        t_w = time.perf_counter() - t0
        assert w.shape == (1536, 1536)
        assert w[0, 1] > 0 and w[0, n_kf - 1] == 0
        t0 = time.perf_counter()
        counts = m.point_obs_count()
        t_c = time.perf_counter() - t0
        assert counts.sum() == n_kf * 400
        # local-map selection for a frame seeing KF-700's points
        fr_pt = np.full(n_feat, -1, np.int64)
        fr_pt[:300] = m.kf_pt[700, :300]
        t0 = time.perf_counter()
        local, ref = covisibility.local_keyframes(m, fr_pt, w)
        t_l = time.perf_counter() - t0
        assert ref >= 0 and len(local) > 0
        # loose interactivity budgets (2 vCPU CI box; production hosts are
        # far faster and the native engine scales linearly)
        assert t_w < 5.0, f"weight_matrix {t_w:.2f}s"
        assert t_c < 1.0, f"point_obs_count {t_c:.2f}s"
        assert t_l < 0.5, f"local_keyframes {t_l:.2f}s"
        print(f"\nKITTI-scale: weight_matrix {t_w*1e3:.0f} ms, "
              f"obs_count {t_c*1e3:.0f} ms, local_kfs {t_l*1e3:.0f} ms")


class TestRobustness:
    """Real-dataset failure modes on synthetic worlds (ROADMAP item 2):
    auto-exposure swings and a moving occluder."""

    def _run(self, **seq_kw):
        from orbslam2_tpu.frontend.tracking import SLAMConfig
        from orbslam2_tpu.geometry.camera import PinholeCamera
        from orbslam2_tpu.io.evaluate import ate_rmse
        from orbslam2_tpu.io.synthetic import SyntheticSequence
        from orbslam2_tpu.ops.orb import ORBConfig
        from orbslam2_tpu.system import SLAMSystem, Sensor

        cam = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                            width=320, height=240, bf=26.0)
        cfg = SLAMConfig(cam=cam, orb=ORBConfig(n_features=800, n_levels=4),
                         th_depth=4.0, min_init_features=250)
        system = SLAMSystem(cfg, Sensor.RGBD)
        seq = SyntheticSequence(cam, n_frames=30, trajectory="lateral",
                                seed=3, **seq_kw)
        lost = 0
        for i in range(seq.n_frames):
            gray, depth = seq.render(i)
            if system.track_rgbd(gray, depth, i / seq.fps) is None:
                lost += 1
        est = system.tracker.full_trajectory_twc()
        gt = np.stack([np.linalg.inv(seq.poses[i]) for i in range(seq.n_frames)])
        from orbslam2_tpu.io.evaluate import ate_rmse as _ate
        return lost, _ate(est, gt)

    def test_exposure_swings(self):
        lost, ate = self._run(exposure=0.3)
        assert lost <= 2, lost
        assert ate < 0.06, ate

    def test_moving_occluder(self):
        lost, ate = self._run(occluder=True)
        assert lost <= 3, lost
        assert ate < 0.08, ate
