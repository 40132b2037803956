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
