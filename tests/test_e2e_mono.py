"""End-to-end monocular SLAM: two-view bootstrap, tracking, map growth."""
import numpy as np

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.evaluate import ate_rmse
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.system import SLAMSystem, Sensor

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)


def make_system():
    cfg = SLAMConfig(
        cam=CAM,
        orb=ORBConfig(n_features=800, n_levels=4),
        max_keyframes=64,
        max_points=8192,
        local_point_cap=2048,
        max_frames_between_kf=10,
    )
    return SLAMSystem(cfg, Sensor.MONOCULAR)


class TestMonocularSlam:
    def test_lateral_sequence(self):
        seq = SyntheticSequence(CAM, n_frames=40, trajectory="lateral", seed=5)
        system = make_system()
        first_ok = -1
        ok_count = 0
        for i in range(seq.n_frames):
            gray, _ = seq.render(i)
            tcw = system.track_monocular(gray, i / seq.fps)
            if tcw is not None:
                ok_count += 1
                if first_ok < 0:
                    first_ok = i
        # bootstrap must happen early and tracking must continue
        assert 0 < first_ok < 15, f"initialized at frame {first_ok}"
        assert ok_count >= seq.n_frames - first_ok - 2
        # map must grow beyond the initial two keyframes
        assert system.map.n_keyframes() >= 3
        assert system.map.n_points() > 150
        est = system.tracker.full_trajectory_twc()[first_ok:]
        gt = np.stack([np.linalg.inv(seq.poses[i])
                       for i in range(first_ok, seq.n_frames)])
        err = ate_rmse(est, gt, with_scale=True)  # Sim3 alignment (mono scale)
        assert err < 0.06, f"mono ATE {err:.4f}"
