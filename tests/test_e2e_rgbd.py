"""End-to-end RGB-D SLAM on synthetic sequences with ground-truth ATE.

The array-world analogue of running the reference rgbd_tum example and
checking against TUM ground truth (SURVEY.md §4). Sequences are rendered
textured-plane worlds with analytic depth (io/synthetic.py).
"""
import numpy as np
import pytest

from orbslam2_tpu.frontend.tracking import SLAMConfig, TrackingState
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.evaluate import ate_rmse, rpe
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.system import SLAMSystem, Sensor

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)


def make_system():
    cfg = SLAMConfig(
        cam=CAM,
        orb=ORBConfig(n_features=800, n_levels=4),
        th_depth=4.0,
        max_keyframes=64,
        max_points=8192,
        local_point_cap=2048,
        max_frames_between_kf=10,
        min_init_features=300,
    )
    return SLAMSystem(cfg, Sensor.RGBD)


def run_sequence(system, seq):
    ok_frames = 0
    for i in range(seq.n_frames):
        gray, depth = seq.render(i)
        tcw = system.track_rgbd(gray, depth, i / seq.fps)
        if tcw is not None:
            ok_frames += 1
    est = system.tracker.full_trajectory_twc()
    gt = np.stack([np.linalg.inv(seq.poses[i]) for i in range(seq.n_frames)])
    return est, gt, ok_frames


class TestRGBDSlam:
    def test_lateral_sequence_ate(self):
        seq = SyntheticSequence(CAM, n_frames=25, trajectory="lateral", seed=1)
        system = make_system()
        est, gt, ok = run_sequence(system, seq)
        assert ok == seq.n_frames, f"lost tracking: {ok}/{seq.n_frames}"
        err = ate_rmse(est, gt)
        assert err < 0.05, f"ATE {err:.4f} m"
        t_rpe, r_rpe = rpe(est, gt)
        assert t_rpe < 0.03

    def test_forward_sequence_with_mapping(self):
        seq = SyntheticSequence(CAM, n_frames=40, trajectory="forward", seed=1)
        system = make_system()
        est, gt, ok = run_sequence(system, seq)
        assert ok == seq.n_frames
        # forward motion must trigger map growth
        assert system.map.n_keyframes() >= 2
        err = ate_rmse(est, gt)
        assert err < 0.05, f"ATE {err:.4f} m"

    def test_trajectory_savers(self, tmp_path):
        seq = SyntheticSequence(CAM, n_frames=10, trajectory="lateral", seed=2)
        system = make_system()
        run_sequence(system, seq)
        tum = tmp_path / "traj.txt"
        kitti = tmp_path / "traj_kitti.txt"
        kf = tmp_path / "kf.txt"
        system.save_trajectory_tum(str(tum))
        system.save_trajectory_kitti(str(kitti))
        system.save_keyframe_trajectory_tum(str(kf))
        from orbslam2_tpu.io.trajectory import load_tum
        ts, twc = load_tum(str(tum))
        assert len(ts) == 10
        assert twc.shape == (10, 4, 4)
        data = np.loadtxt(str(kitti))
        assert data.shape == (10, 12)

    def test_localization_mode(self):
        seq = SyntheticSequence(CAM, n_frames=15, trajectory="lateral", seed=1)
        system = make_system()
        # map the first 10 frames, then localize only
        for i in range(10):
            gray, depth = seq.render(i)
            system.track_rgbd(gray, depth, i / seq.fps)
        n_kf = system.map.n_keyframes()
        n_pt = system.map.n_points()
        system.activate_localization_mode()
        for i in range(10, 15):
            gray, depth = seq.render(i)
            tcw = system.track_rgbd(gray, depth, i / seq.fps)
            assert tcw is not None
        assert system.map.n_keyframes() == n_kf  # map frozen
        assert system.map.n_points() == n_pt

    def test_reset(self):
        seq = SyntheticSequence(CAM, n_frames=5, trajectory="lateral", seed=1)
        system = make_system()
        for i in range(5):
            gray, depth = seq.render(i)
            system.track_rgbd(gray, depth, i / seq.fps)
        assert system.map.n_keyframes() >= 1
        system.reset()
        assert system.map.n_keyframes() == 0
        assert system.tracking_state() in (TrackingState.NO_IMAGES_YET,
                                           TrackingState.NOT_INITIALIZED)
        # system must re-initialize after reset
        for i in range(5):
            gray, depth = seq.render(i)
            system.track_rgbd(gray, depth, i / seq.fps)
        assert system.map.n_keyframes() >= 1
