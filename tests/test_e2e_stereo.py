"""Stereo matching unit + end-to-end stereo SLAM tests."""
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.evaluate import ate_rmse
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig, ORBExtractor
from orbslam2_tpu.ops.stereo import match_stereo
from orbslam2_tpu.system import SLAMSystem, Sensor

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)  # baseline 0.1 m


class TestStereoMatch:
    def test_depth_against_ground_truth(self):
        seq = SyntheticSequence(CAM, n_frames=2, trajectory="lateral", seed=3)
        left, right, depth_gt = seq.render_stereo(0)
        ex = ORBExtractor(ORBConfig(n_features=800, n_levels=4), (240, 320))
        gl = jnp.asarray(left.astype(np.float32))
        gr = jnp.asarray(right.astype(np.float32))
        kp_l, pyr_l = ex.extract_with_pyramid(gl)
        kp_r, pyr_r = ex.extract_with_pyramid(gr)
        ur, depth = match_stereo(kp_l, kp_r, pyr_l, pyr_r, CAM, 1.2, 4)
        ur, depth = np.asarray(ur), np.asarray(depth)
        xy = np.asarray(kp_l.xy)
        ok = depth > 0
        assert ok.sum() > 150, f"only {ok.sum()} stereo matches"
        xi = np.clip(np.round(xy[ok, 0]).astype(int), 0, 319)
        yi = np.clip(np.round(xy[ok, 1]).astype(int), 0, 239)
        gt = depth_gt[yi, xi]
        valid_gt = gt > 0
        rel_err = np.abs(depth[ok][valid_gt] - gt[valid_gt]) / gt[valid_gt]
        assert np.median(rel_err) < 0.05, f"median depth error {np.median(rel_err):.3f}"
        # most matches should be reasonable
        assert (rel_err < 0.2).mean() > 0.8


class TestStereoSlam:
    def test_lateral_sequence(self):
        # "cluttered" world: a single textured wall is near-degenerate for
        # planar yaw-vs-translation with noisy stereo depth; panels at
        # varied depths condition the problem like a real scene
        seq = SyntheticSequence(CAM, n_frames=20, trajectory="lateral",
                                seed=3, world="cluttered")
        cfg = SLAMConfig(
            cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
            th_depth=4.0, max_keyframes=64, max_points=8192,
            local_point_cap=2048, max_frames_between_kf=10, min_init_features=200)
        system = SLAMSystem(cfg, Sensor.STEREO)
        ok = 0
        for i in range(seq.n_frames):
            left, right, _ = seq.render_stereo(i)
            tcw = system.track_stereo(left, right, i / seq.fps)
            ok += tcw is not None
        assert ok == seq.n_frames
        est = system.tracker.full_trajectory_twc()
        gt = np.stack([np.linalg.inv(seq.poses[i]) for i in range(seq.n_frames)])
        err = ate_rmse(est, gt)  # true-scale ATE (stereo has metric scale)
        assert err < 0.03, f"stereo ATE {err:.4f}"
