"""Monocular driver for EuRoC MAV (reference: Examples/Monocular/mono_euroc.cc)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import build_parser, make_system, run_loop, save_outputs
from orbslam2_tpu.io.datasets import euroc_mono_frames
from orbslam2_tpu.system import Sensor


def main():
    p = build_parser("Monocular SLAM on a EuRoC MAV sequence")
    p.add_argument("data_dir")
    p.add_argument("timestamps")
    args = p.parse_args()
    system = make_system(args, Sensor.MONOCULAR, capacity_hint=(1024, 100_000))
    run_loop(system, euroc_mono_frames(args.data_dir, args.timestamps),
             lambda s, it: s.track_monocular(it.gray, it.timestamp),
             args.max_frames, trace_dir=args.device_trace)
    save_outputs(system, args)


if __name__ == "__main__":
    main()
