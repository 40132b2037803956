"""ROS-style nodes (topic bus + approximate-time sync) and the AR overlay."""
import numpy as np
import pytest

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.ros_nodes import (ApproxTimeSync, ImageMsg,
                                       LocalTopicBus, MonoNode, RGBDNode)
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.system import SLAMSystem, Sensor
from orbslam2_tpu.viewer import ar

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)


def make_system():
    cfg = SLAMConfig(cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
                     th_depth=4.0, min_init_features=300)
    return SLAMSystem(cfg, Sensor.RGBD)


class TestApproxTimeSync:
    def test_pairs_within_slop_only(self):
        bus = LocalTopicBus()
        pairs = []
        ApproxTimeSync(bus, "/a", "/b", lambda a, b: pairs.append((a.stamp, b.stamp)),
                       slop=0.05)
        bus.publish("/a", ImageMsg(np.zeros((2, 2)), 0.00))
        bus.publish("/b", ImageMsg(np.zeros((2, 2)), 0.20))  # too far
        assert pairs == []
        bus.publish("/b", ImageMsg(np.zeros((2, 2)), 0.03))  # pairs with 0.00
        assert pairs == [(0.00, 0.03)]
        bus.publish("/a", ImageMsg(np.zeros((2, 2)), 0.21))  # pairs with 0.20
        assert pairs == [(0.00, 0.03), (0.21, 0.20)]


class TestRGBDNode:
    def test_synthetic_sequence_through_topics(self):
        system = make_system()
        bus = LocalTopicBus()
        poses = []
        bus.subscribe("/orbslam2/pose", poses.append)
        node = RGBDNode(system, bus)
        seq = SyntheticSequence(CAM, n_frames=12, trajectory="lateral", seed=3)
        for i in range(seq.n_frames):
            gray, depth = seq.render(i)
            stamp = i / seq.fps
            bus.publish("/camera/rgb/image_raw", ImageMsg(gray, stamp))
            bus.publish("/camera/depth/image_raw", ImageMsg(depth, stamp))
        node.flush()   # drain the in-flight pipelined frame
        assert node.frames == 12
        assert node.tracked >= 10
        assert len(poses) == node.tracked
        assert poses[-1].tcw.shape == (4, 4)
        # pose error vs ground truth of the last tracked frame
        err = np.linalg.norm(poses[-1].tcw[:3, 3] - seq.poses[11][:3, 3])
        assert err < 0.05, err


class TestARPlane:
    def test_detect_plane_on_synthetic_floor(self):
        rng = np.random.default_rng(0)
        n = 200
        # plane z = 2 + 0.1x - 0.2y with noise, plus 30% outliers
        x = rng.uniform(-1, 1, n)
        y = rng.uniform(-1, 1, n)
        z = 2 + 0.1 * x - 0.2 * y + rng.normal(0, 0.003, n)
        pts = np.stack([x, y, z], axis=1)
        pts[:60] += rng.uniform(0.3, 1.0, (60, 3))
        plane = ar.detect_plane(pts, threshold=0.02, min_inliers=50, seed=1)
        assert plane is not None
        assert plane.n_inliers >= 120
        expected = np.array([0.1, -0.2, -1.0])
        expected /= np.linalg.norm(expected)
        cos = abs(float(plane.normal @ expected))
        assert cos > 0.999, (plane.normal, expected)
        # t_pw maps plane points to z ~ 0
        inl = pts[plane.inliers]
        pz = (inl @ plane.t_pw[:3, :3].T + plane.t_pw[:3, 3])[:, 2]
        assert np.abs(pz).max() < 0.03

    def test_ar_viewer_overlay_end_to_end(self):
        system = make_system()
        viewer = ar.ARViewer(system, cube_size=0.3, plane_threshold=0.05,
                             min_inliers=30)
        seq = SyntheticSequence(CAM, n_frames=10, trajectory="lateral", seed=3)
        drawn = 0
        for i in range(seq.n_frames):
            gray, depth = seq.render(i)
            system.track_rgbd(gray, depth, i / seq.fps)
            overlay = viewer.update(gray)
            assert overlay.shape == (240, 320, 3)
            base = np.repeat(gray.astype(np.uint8)[:, :, None], 3, axis=2)
            if (overlay != base).any():
                drawn += 1
        assert viewer.plane is not None
        assert drawn >= 5, drawn
