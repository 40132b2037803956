"""Distortion-heavy camera end-to-end + lost-frame trajectory semantics.

The reference's primary dataset (TUM1) has strong radial distortion
(k1=0.2624, k2=-0.9531, k3=1.1633 — TUM1.yaml); its pipeline undistorts
keypoints once (Frame.cc:470-515) and gates projections against the
undistorted image rectangle (Frame.cc:520-575, ORBmatcher.cc:64-70). These
tests drive the same geometry through the full system on a synthetic world
rendered with the true distortion model.
"""
import numpy as np

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.evaluate import ate_rmse
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.system import SLAMSystem, Sensor

# TUM1 distortion at half resolution (normalized-coordinate distortion is
# resolution-invariant; fx/cx scale with the image). k1>0: undistortion
# pulls corners INWARD — the valid rectangle shrinks.
CAM_TUM = PinholeCamera(
    fx=258.6, fy=258.3, cx=159.3, cy=127.6,
    k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0027, k3=1.1633,
    width=320, height=240, bf=25.86)

# EuRoC-like barrel distortion (EuRoC.yaml k1=-0.2834, k2=0.0739): the
# undistorted corners land OUTSIDE the raw rectangle, so undistorted
# keypoint coords can be negative — the case where a raw [0,w) gate
# wrongly culls edge points (Frame.cc:520-575 motivates mnMinX<0).
CAM_DIST = PinholeCamera(
    fx=230.9, fy=230.3, cx=187.3, cy=126.2,
    k1=-0.2834, k2=0.0739, p1=0.0002, p2=0.00002,
    width=376, height=240, bf=23.09)


class TestDistortedCamera:
    def test_undistorted_bounds_follow_distortion_sign(self):
        # barrel (k1<0): corners map outside the raw rectangle
        min_x, max_x, min_y, max_y = CAM_DIST.undistorted_bounds()
        assert min_x < -1.0 and max_x > CAM_DIST.width + 1.0, (min_x, max_x)
        assert min_y < -1.0 and max_y > CAM_DIST.height + 1.0, (min_y, max_y)
        # pincushion-direction (k1>0, TUM1): corners pull inward
        tmin_x, tmax_x, tmin_y, tmax_y = CAM_TUM.undistorted_bounds()
        assert tmin_x > 1.0 and tmax_x < CAM_TUM.width - 1.0, (tmin_x, tmax_x)

    def test_bounds_match_undistort_points(self):
        # the cached numpy inversion must agree with the jitted
        # undistort_points path used on keypoints (same fixed-point model)
        corners = np.array([[0.0, 0.0], [CAM_DIST.width, 0.0],
                            [0.0, CAM_DIST.height],
                            [CAM_DIST.width, CAM_DIST.height]], np.float32)
        und = np.asarray(CAM_DIST.undistort_points(corners))
        min_x, max_x, min_y, max_y = CAM_DIST.undistorted_bounds()
        assert abs(min(und[0, 0], und[2, 0]) - min_x) < 0.1
        assert abs(max(und[1, 0], und[3, 0]) - max_x) < 0.1
        assert abs(min(und[0, 1], und[1, 1]) - min_y) < 0.1
        assert abs(max(und[2, 1], und[3, 1]) - max_y) < 0.1

    def test_rgbd_slam_with_distortion(self):
        seq = SyntheticSequence(CAM_DIST, n_frames=25, trajectory="lateral",
                                seed=4, world="cluttered")
        cfg = SLAMConfig(cam=CAM_DIST, orb=ORBConfig(n_features=800, n_levels=4),
                         th_depth=4.0, max_keyframes=64, max_points=8192,
                         local_point_cap=2048, min_init_features=300)
        system = SLAMSystem(cfg, Sensor.RGBD)
        n_ok = 0
        edge_tracked = 0
        for i in range(seq.n_frames):
            gray, depth = seq.render(i)
            tcw = system.track_rgbd(gray, depth, i / seq.fps)
            n_ok += tcw is not None
            lf = system.tracker.last_frame
            if lf is not None:
                xy = np.asarray(lf.kp.xy)
                tracked = (lf.pt_ids >= 0) & ~lf.is_outlier
                outside = (xy[:, 0] < 0) | (xy[:, 0] >= CAM_DIST.width) \
                    | (xy[:, 1] < 0) | (xy[:, 1] >= CAM_DIST.height)
                edge_tracked += int((tracked & outside).sum())
        assert n_ok >= 23, f"tracked only {n_ok}/25 distorted frames"
        est = system.tracker.full_trajectory_twc()
        gt = np.stack([np.linalg.inv(seq.poses[i]) for i in range(seq.n_frames)])
        err = ate_rmse(est, gt)
        assert err < 0.05, f"distorted-camera ATE {err:.3f} m"
        # edge points whose undistorted coords leave the raw rectangle must
        # still be matched (the round-1 raw-bounds gate culled them all)
        assert edge_tracked > 20, f"only {edge_tracked} edge-point tracks"


class TestLostFrameTrajectory:
    def test_tum_saver_skips_lost_frames(self, tmp_path):
        cam = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                            width=320, height=240, bf=26.0)
        seq = SyntheticSequence(cam, n_frames=16, trajectory="lateral", seed=2,
                                world="cluttered")
        cfg = SLAMConfig(cam=cam, orb=ORBConfig(n_features=800, n_levels=4),
                         th_depth=4.0, max_keyframes=64, max_points=8192,
                         local_point_cap=2048, min_init_features=300)
        system = SLAMSystem(cfg, Sensor.RGBD)
        black = np.zeros((240, 320), np.float32)
        nodepth = np.full((240, 320), -1.0, np.float32)
        for i in range(seq.n_frames):
            if 6 <= i < 9:  # blackout: tracking must go LOST
                system.track_rgbd(black, nodepth, i / seq.fps)
            else:
                gray, depth = seq.render(i)
                system.track_rgbd(gray, depth, i / seq.fps)
        lost = system.tracker.trajectory_lost_mask()
        assert lost[6:9].all(), "blackout frames not marked lost"
        assert not lost[:6].any()
        # one pose per frame regardless (KITTI semantics, System.cc:426)
        assert len(system.tracker.full_trajectory_twc()) == seq.n_frames
        # TUM saver drops the lost rows (System.cc:380-385)
        tum = tmp_path / "traj.txt"
        system.save_trajectory_tum(str(tum))
        from orbslam2_tpu.io.trajectory import load_tum
        ts, poses = load_tum(str(tum))
        assert len(ts) == seq.n_frames - int(lost.sum())
        lost_times = {round(i / seq.fps, 4) for i in np.where(lost)[0]}
        assert not (set(np.round(ts, 4)) & lost_times)
