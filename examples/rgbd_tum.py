"""RGB-D driver for TUM sequences (reference: Examples/RGB-D/rgbd_tum.cc)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import (build_parser, make_system, make_viewer,
                             run_loop, save_outputs)
from orbslam2_tpu.io.datasets import tum_rgbd_frames
from orbslam2_tpu.system import Sensor


def main():
    p = build_parser("RGB-D SLAM on a TUM sequence")
    p.add_argument("dataset_dir")
    p.add_argument("associations")
    args = p.parse_args()
    system = make_system(args, Sensor.RGBD)
    viewer = make_viewer(system, args)
    factor = getattr(system.cfg, "depth_map_factor", 5000.0)
    frames = tum_rgbd_frames(args.dataset_dir, args.associations, factor)

    def track(s, it):
        s.track_rgbd(it.gray, it.depth, it.timestamp)
        if viewer is not None:
            viewer.push_frame(it.gray)

    run_loop(system, frames, track, args.max_frames,
             trace_dir=args.device_trace)
    if viewer is not None:
        viewer.close()
    save_outputs(system, args)


if __name__ == "__main__":
    main()
