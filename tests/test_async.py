"""Async orchestration: background mapping thread vs synchronous results."""
import numpy as np

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.evaluate import ate_rmse
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.system import SLAMSystem, Sensor

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)


def run(async_mode: bool):
    seq = SyntheticSequence(CAM, n_frames=40, trajectory="forward", seed=1)
    cfg = SLAMConfig(
        cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
        th_depth=4.0, max_keyframes=64, max_points=8192,
        local_point_cap=2048, max_frames_between_kf=10,
        min_init_features=300, async_mapping=async_mode)
    system = SLAMSystem(cfg, Sensor.RGBD)
    ok = 0
    for i in range(seq.n_frames):
        gray, depth = seq.render(i)
        tcw = system.track_rgbd(gray, depth, i / seq.fps)
        ok += tcw is not None
    system.wait_mapping_idle()
    est = system.tracker.full_trajectory_twc()
    gt = np.stack([np.linalg.inv(seq.poses[i]) for i in range(seq.n_frames)])
    err = ate_rmse(est, gt)
    n_kf = system.map.n_keyframes()
    n_pt = system.map.n_points()
    system.shutdown()
    return ok, err, n_kf, n_pt


class TestAsyncMapping:
    def test_async_matches_sync_quality(self):
        ok_s, err_s, kf_s, pt_s = run(async_mode=False)
        ok_a, err_a, kf_a, pt_a = run(async_mode=True)
        assert ok_a == ok_s == 40
        assert err_a < 0.06, f"async ATE {err_a:.4f} (sync {err_s:.4f})"
        # map must still grow under async mapping
        assert kf_a >= 2
        assert pt_a > 400

    def test_shutdown_idempotent(self):
        cfg = SLAMConfig(cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
                         max_keyframes=32, max_points=4096,
                         local_point_cap=1024, async_mapping=True)
        system = SLAMSystem(cfg, Sensor.RGBD)
        system.shutdown()
        system.shutdown()
