"""Stereo driver for KITTI odometry (reference: Examples/Stereo/stereo_kitti.cc)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import build_parser, make_system, run_loop, save_outputs
from orbslam2_tpu.io.datasets import kitti_stereo_frames
from orbslam2_tpu.system import Sensor


def main():
    p = build_parser("Stereo SLAM on a KITTI odometry sequence")
    p.add_argument("sequence_dir")
    args = p.parse_args()
    system = make_system(args, Sensor.STEREO, capacity_hint=(2048, 200_000))
    run_loop(system, kitti_stereo_frames(args.sequence_dir),
             lambda s, it: s.track_stereo(it.left, it.right, it.timestamp),
             args.max_frames, trace_dir=args.device_trace)
    save_outputs(system, args)


if __name__ == "__main__":
    main()
