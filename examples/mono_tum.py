"""Monocular driver for TUM sequences (reference: Examples/Monocular/mono_tum.cc)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import build_parser, make_system, run_loop, save_outputs
from orbslam2_tpu.io.datasets import tum_rgbd_frames
from orbslam2_tpu.system import Sensor


def main():
    p = build_parser("Monocular SLAM on a TUM sequence")
    p.add_argument("dataset_dir")
    p.add_argument("associations")
    args = p.parse_args()
    system = make_system(args, Sensor.MONOCULAR)
    frames = tum_rgbd_frames(args.dataset_dir, args.associations,
                             getattr(system.cfg, "depth_map_factor", 5000.0))
    run_loop(system, frames,
             lambda s, it: s.track_monocular(it.gray, it.timestamp),
             args.max_frames, trace_dir=args.device_trace)
    save_outputs(system, args)


if __name__ == "__main__":
    main()
