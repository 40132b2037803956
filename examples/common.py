"""Shared driver plumbing for the example mains.

Mirrors what every reference example binary does around the System calls
(e.g. /root/reference/Examples/RGB-D/rgbd_tum.cc:61-124): construct the
system from (vocabulary, settings), loop frames with timing statistics,
save trajectories, print the median/mean track time
(stereo_kitti.cc:131-141).
"""
from __future__ import annotations

import argparse
import time
from typing import Callable, Iterable

import numpy as np

from orbslam2_tpu.io.settings import load_settings
from orbslam2_tpu.system import SLAMSystem, Sensor


def build_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("settings", help="reference-format settings YAML")
    p.add_argument("--vocabulary", default=None,
                   help="vocabulary .npz (default: packaged synthetic vocabulary)")
    p.add_argument("--no-loop-closing", action="store_true")
    p.add_argument("--localization", action="store_true",
                   help="localization-only mode (no mapping)")
    p.add_argument("--trajectory-out", default="CameraTrajectory.txt")
    p.add_argument("--kf-trajectory-out", default="KeyFrameTrajectory.txt")
    p.add_argument("--kitti-trajectory-out", default=None)
    p.add_argument("--max-frames", type=int, default=None)
    return p


def make_system(args, sensor: Sensor, image_size=None) -> SLAMSystem:
    cfg = load_settings(args.settings, image_size=image_size)
    voc = None
    if not args.no_loop_closing:
        if args.vocabulary:
            from orbslam2_tpu.place.vocabulary import load_vocabulary
            voc = load_vocabulary(args.vocabulary)
        else:
            from orbslam2_tpu.place.pretrained import get_default_vocabulary
            voc = get_default_vocabulary()
    system = SLAMSystem(cfg, sensor, vocabulary=voc)
    if args.localization:
        system.activate_localization_mode()
    return system


def run_loop(system: SLAMSystem, frames: Iterable, track: Callable,
             max_frames=None) -> None:
    times = []
    n = 0
    for item in frames:
        t0 = time.perf_counter()
        track(system, item)
        times.append(time.perf_counter() - t0)
        n += 1
        if max_frames is not None and n >= max_frames:
            break
    if times:
        times = np.array(times)
        print(f"tracked {n} frames: median {np.median(times)*1e3:.1f} ms, "
              f"mean {times.mean()*1e3:.1f} ms")


def save_outputs(system: SLAMSystem, args) -> None:
    system.save_trajectory_tum(args.trajectory_out)
    system.save_keyframe_trajectory_tum(args.kf_trajectory_out)
    if args.kitti_trajectory_out:
        system.save_trajectory_kitti(args.kitti_trajectory_out)
    system.shutdown()
