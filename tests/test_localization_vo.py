"""Localization-mode visual odometry on temporal points.

Maps a first segment, freezes the map, then drives into unmapped territory:
the tracker must keep producing poses from temporal VO points (reference:
UpdateLastFrame VO machinery + mbVO state, Tracking.cc:354-424, 949-1028).
"""
import numpy as np

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.evaluate import rpe
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.system import SLAMSystem, Sensor

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)


class TestLocalizationVO:
    def test_vo_beyond_mapped_region(self):
        seq = SyntheticSequence(CAM, n_frames=60, trajectory="shuttle",
                                seed=9, world="cluttered")
        cfg = SLAMConfig(cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
                         th_depth=4.0, max_keyframes=64, max_points=8192,
                         local_point_cap=2048, max_frames_between_kf=10,
                         min_init_features=300)
        system = SLAMSystem(cfg, Sensor.RGBD)
        # map only the first few frames (small region near origin)
        for i in range(6):
            gray, depth = seq.render(i)
            assert system.track_rgbd(gray, depth, i / seq.fps) is not None
        system.activate_localization_mode()
        n_pts = system.map.n_points()
        ok = 0
        # frames 6..30 travel several meters beyond the mapped region
        for i in range(6, 30):
            gray, depth = seq.render(i)
            tcw = system.track_rgbd(gray, depth, i / seq.fps)
            ok += tcw is not None
        assert system.map.n_points() == n_pts  # map frozen
        assert ok >= 22, f"VO kept only {ok}/24 frames"
        est = system.tracker.full_trajectory_twc()[6:30]
        gt = np.stack([np.linalg.inv(seq.poses[i]) for i in range(6, 30)])
        t_rpe, _ = rpe(est, gt)
        assert t_rpe < 0.05, f"VO drift per frame {t_rpe:.3f}"
