"""Monocular/RGB-D AR demo (reference MonoAR: Examples/ROS/ORB_SLAM2/src/AR).

Tracks a synthetic sequence, RANSACs a dominant plane through the tracked
map points, and writes frames with a virtual cube anchored to that plane —
the headless equivalent of ViewerAR's insert-cube GL overlay.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.system import SLAMSystem, Sensor
from orbslam2_tpu.viewer.ar import ARViewer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--out", default="ar_frames")
    args = p.parse_args()

    cam = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                        width=320, height=240, bf=26.0)
    cfg = SLAMConfig(cam=cam, orb=ORBConfig(n_features=800, n_levels=4),
                     th_depth=4.0, min_init_features=300)
    system = SLAMSystem(cfg, Sensor.RGBD)
    ar = ARViewer(system, cube_size=0.3, plane_threshold=0.05)

    import cv2
    os.makedirs(args.out, exist_ok=True)
    seq = SyntheticSequence(cam, n_frames=args.frames, trajectory="lateral",
                            seed=3)
    for i in range(seq.n_frames):
        gray, depth = seq.render(i)
        system.track_rgbd(gray, depth, i / seq.fps)
        overlay = ar.update(gray)
        cv2.imwrite(os.path.join(args.out, f"ar_{i:04d}.png"), overlay)
    print(f"plane={'found' if ar.plane is not None else 'none'} "
          f"inliers={ar.plane.n_inliers if ar.plane else 0} "
          f"frames_written={seq.n_frames} -> {args.out}/")


if __name__ == "__main__":
    main()
