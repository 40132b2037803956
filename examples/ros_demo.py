"""ROS-node-style live pipeline demo (reference: Examples/ROS/ORB_SLAM2).

With ROS installed, `--rospy` binds the same node classes to live topics
(ros_rgbd.cc equivalent). Without ROS (this image), an in-process topic bus
replays a synthetic RGB-D sequence through the identical subscriber
architecture: publisher -> approximate-time sync -> TrackRGBD -> pose topic.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import numpy as np

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.ros_nodes import ImageMsg, LocalTopicBus, RGBDNode
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.place.pretrained import get_default_vocabulary
from orbslam2_tpu.system import SLAMSystem, Sensor


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--rospy", action="store_true",
                   help="bind to live ROS topics instead of the local bus")
    args = p.parse_args()

    cam = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                        width=320, height=240, bf=26.0)
    cfg = SLAMConfig(cam=cam, orb=ORBConfig(n_features=800, n_levels=4),
                     th_depth=4.0, min_init_features=300)
    system = SLAMSystem(cfg, Sensor.RGBD, vocabulary=get_default_vocabulary())

    if args.rospy:
        from orbslam2_tpu.io.ros_nodes import make_rospy_bus
        import rospy
        rospy.init_node("orbslam2_tpu_rgbd")
        bus = make_rospy_bus()
        RGBDNode(system, bus)
        rospy.spin()
        return

    bus = LocalTopicBus()
    poses = []
    bus.subscribe("/orbslam2/pose", poses.append)
    node = RGBDNode(system, bus)
    seq = SyntheticSequence(cam, n_frames=args.frames, trajectory="lateral",
                            seed=3)
    for i in range(seq.n_frames):
        gray, depth = seq.render(i)
        stamp = i / seq.fps
        bus.publish("/camera/rgb/image_raw", ImageMsg(gray, stamp))
        bus.publish("/camera/depth/image_raw", ImageMsg(depth, stamp))
    node.flush()  # publish the last in-flight frame's solved pose
    print(f"frames={node.frames} tracked={node.tracked} "
          f"poses_published={len(poses)} keyframes={system.map.n_keyframes()}")


if __name__ == "__main__":
    main()
