"""Stereo driver for EuRoC MAV with online rectification
(reference: Examples/Stereo/stereo_euroc.cc)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import build_parser, make_system, run_loop, save_outputs
from orbslam2_tpu.io.datasets import EurocRectifier, euroc_stereo_frames
from orbslam2_tpu.system import Sensor


def main():
    p = build_parser("Stereo SLAM on a EuRoC MAV sequence")
    p.add_argument("data_dir", help=".../mav0 directory")
    p.add_argument("timestamps", help="EuRoC timestamps txt")
    args = p.parse_args()
    system = make_system(args, Sensor.STEREO, capacity_hint=(1024, 100_000))
    rectifier = EurocRectifier(args.settings)
    run_loop(system, euroc_stereo_frames(args.data_dir, args.timestamps, rectifier),
             lambda s, it: s.track_stereo(it.left, it.right, it.timestamp),
             args.max_frames, trace_dir=args.device_trace)
    save_outputs(system, args)


if __name__ == "__main__":
    main()
