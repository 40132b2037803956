"""End-to-end loop closing and relocalization with place recognition."""
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
        for i in range(seq.n_frames):
            gray, depth = seq.render(i)
            system.track_rgbd(gray, depth, i / seq.fps)
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
