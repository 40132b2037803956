"""Dataset loaders: TUM RGB-D, KITTI odometry, EuRoC MAV.

Replacements for the reference example mains' ad-hoc loaders
(/root/reference/Examples/RGB-D/rgbd_tum.cc LoadImages,
Examples/Monocular/mono_kitti.cc, Examples/Stereo/stereo_euroc.cc), with the
same dataset conventions: TUM associations files, KITTI times.txt +
image_0/image_1, EuRoC timestamp lists + online stereo rectification.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class RGBDItem:
    timestamp: float
    gray: np.ndarray
    depth: np.ndarray


@dataclasses.dataclass
class StereoItem:
    timestamp: float
    left: np.ndarray
    right: np.ndarray


@dataclasses.dataclass
class MonoItem:
    timestamp: float
    gray: np.ndarray


def _to_gray(img: np.ndarray, rgb_order: bool = True) -> np.ndarray:
    import cv2
    if img.ndim == 2:
        return img.astype(np.float32)
    code = cv2.COLOR_RGB2GRAY if rgb_order else cv2.COLOR_BGR2GRAY
    return cv2.cvtColor(img, code).astype(np.float32)


# ----------------------------------------------------------------------
# TUM RGB-D (rgbd_tum.cc:24-60; associations from associate.py output)
# ----------------------------------------------------------------------
def load_tum_associations(path: str) -> List[Tuple[float, str, str]]:
    """-> [(timestamp, rgb_rel_path, depth_rel_path)]."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1], parts[3]))
    return out


def tum_rgbd_frames(dataset_dir: str, associations_path: str,
                    depth_map_factor: float = 5000.0) -> Iterator[RGBDItem]:
    import cv2
    for ts, rgb_rel, depth_rel in load_tum_associations(associations_path):
        rgb = cv2.imread(os.path.join(dataset_dir, rgb_rel), cv2.IMREAD_UNCHANGED)
        depth = cv2.imread(os.path.join(dataset_dir, depth_rel), cv2.IMREAD_UNCHANGED)
        if rgb is None or depth is None:
            continue
        d = depth.astype(np.float32) / depth_map_factor
        d[depth == 0] = -1.0
        yield RGBDItem(ts, _to_gray(rgb, rgb_order=False), d)


# ----------------------------------------------------------------------
# KITTI odometry (mono_kitti.cc:126-153, stereo_kitti.cc)
# ----------------------------------------------------------------------
def kitti_timestamps(sequence_dir: str) -> np.ndarray:
    return np.loadtxt(os.path.join(sequence_dir, "times.txt"))


def kitti_mono_frames(sequence_dir: str) -> Iterator[MonoItem]:
    import cv2
    times = kitti_timestamps(sequence_dir)
    img_dir = os.path.join(sequence_dir, "image_0")
    for i, ts in enumerate(times):
        img = cv2.imread(os.path.join(img_dir, f"{i:06d}.png"), cv2.IMREAD_GRAYSCALE)
        if img is None:
            break
        yield MonoItem(float(ts), img.astype(np.float32))


def kitti_stereo_frames(sequence_dir: str) -> Iterator[StereoItem]:
    import cv2
    times = kitti_timestamps(sequence_dir)
    for i, ts in enumerate(times):
        l = cv2.imread(os.path.join(sequence_dir, "image_0", f"{i:06d}.png"),
                       cv2.IMREAD_GRAYSCALE)
        r = cv2.imread(os.path.join(sequence_dir, "image_1", f"{i:06d}.png"),
                       cv2.IMREAD_GRAYSCALE)
        if l is None or r is None:
            break
        yield StereoItem(float(ts), l.astype(np.float32), r.astype(np.float32))


# ----------------------------------------------------------------------
# EuRoC MAV (mono_euroc.cc, stereo_euroc.cc:97-137 online rectification)
# ----------------------------------------------------------------------
def load_euroc_timestamps(path: str) -> List[str]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                out.append(line.split(",")[0].split(".")[0])
    return out


class EurocRectifier:
    """Online stereo rectification from the reference's EuRoC settings keys
    (LEFT./RIGHT. K, D, R, P — Examples/Stereo/EuRoC.yaml:35-81), using
    cv2.initUndistortRectifyMap + remap exactly like stereo_euroc.cc."""

    def __init__(self, settings_path: str):
        import cv2
        fs = cv2.FileStorage(settings_path, cv2.FILE_STORAGE_READ)
        k_l = fs.getNode("LEFT.K").mat()
        k_r = fs.getNode("RIGHT.K").mat()
        d_l = fs.getNode("LEFT.D").mat()
        d_r = fs.getNode("RIGHT.D").mat()
        r_l = fs.getNode("LEFT.R").mat()
        r_r = fs.getNode("RIGHT.R").mat()
        p_l = fs.getNode("LEFT.P").mat()
        p_r = fs.getNode("RIGHT.P").mat()
        rows = int(fs.getNode("LEFT.height").real())
        cols = int(fs.getNode("LEFT.width").real())
        fs.release()
        self.map_l = cv2.initUndistortRectifyMap(
            k_l, d_l, r_l, p_l[0:3, 0:3], (cols, rows), cv2.CV_32F)
        self.map_r = cv2.initUndistortRectifyMap(
            k_r, d_r, r_r, p_r[0:3, 0:3], (cols, rows), cv2.CV_32F)

    def __call__(self, left: np.ndarray, right: np.ndarray):
        import cv2
        l = cv2.remap(left, self.map_l[0], self.map_l[1], cv2.INTER_LINEAR)
        r = cv2.remap(right, self.map_r[0], self.map_r[1], cv2.INTER_LINEAR)
        return l, r


def euroc_stereo_frames(data_dir: str, timestamps_path: str,
                        rectifier: Optional[EurocRectifier] = None
                        ) -> Iterator[StereoItem]:
    import cv2
    for ts in load_euroc_timestamps(timestamps_path):
        l = cv2.imread(os.path.join(data_dir, "cam0", "data", ts + ".png"),
                       cv2.IMREAD_GRAYSCALE)
        r = cv2.imread(os.path.join(data_dir, "cam1", "data", ts + ".png"),
                       cv2.IMREAD_GRAYSCALE)
        if l is None or r is None:
            continue
        if rectifier is not None:
            l, r = rectifier(l, r)
        yield StereoItem(float(ts) * 1e-9, l.astype(np.float32), r.astype(np.float32))


def euroc_mono_frames(data_dir: str, timestamps_path: str) -> Iterator[MonoItem]:
    import cv2
    for ts in load_euroc_timestamps(timestamps_path):
        img = cv2.imread(os.path.join(data_dir, "cam0", "data", ts + ".png"),
                         cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        yield MonoItem(float(ts) * 1e-9, img.astype(np.float32))


# ----------------------------------------------------------------------
# synthetic-dataset export (test fixture generator): writes a rendered
# sequence in TUM RGB-D layout so the dataset drivers can be exercised
# without external data
# ----------------------------------------------------------------------
def export_synthetic_tum(seq, out_dir: str, depth_map_factor: float = 5000.0) -> str:
    """-> path of the generated associations file."""
    import cv2
    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    assoc_path = os.path.join(out_dir, "associations.txt")
    with open(assoc_path, "w") as f:
        for i in range(seq.n_frames):
            gray, depth = seq.render(i)
            ts = i / seq.fps
            rgb_rel = f"rgb/{ts:.6f}.png"
            depth_rel = f"depth/{ts:.6f}.png"
            cv2.imwrite(os.path.join(out_dir, rgb_rel),
                        np.clip(gray, 0, 255).astype(np.uint8))
            d16 = np.where(depth > 0, depth * depth_map_factor, 0)
            cv2.imwrite(os.path.join(out_dir, depth_rel),
                        np.clip(d16, 0, 65535).astype(np.uint16))
            f.write(f"{ts:.6f} {rgb_rel} {ts:.6f} {depth_rel}\n")
    # groundtruth.txt in the TUM benchmark's own format ('ts tx ty tz qx
    # qy qz qw', Twc) so the drivers' --eval path runs end-to-end on
    # exported synthetic sequences exactly as it would on a real download
    with open(os.path.join(out_dir, "groundtruth.txt"), "w") as f:
        f.write("# ground truth trajectory\n# timestamp tx ty tz qx qy qz qw\n")
        for i in range(seq.n_frames):
            twc = np.linalg.inv(seq.poses[i])
            t = twc[:3, 3]
            qx, qy, qz, qw = _rot_to_quat(twc[:3, :3])
            f.write(f"{i / seq.fps:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                    f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}\n")
    return assoc_path


def _rot_to_quat(r: np.ndarray):
    """3x3 rotation -> (qx, qy, qz, qw)."""
    tr = np.trace(r)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        qw = 0.25 * s
        qx = (r[2, 1] - r[1, 2]) / s
        qy = (r[0, 2] - r[2, 0]) / s
        qz = (r[1, 0] - r[0, 1]) / s
    else:
        i = int(np.argmax([r[0, 0], r[1, 1], r[2, 2]]))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + r[i, i] - r[j, j] - r[k, k], 1e-12)) * 2
        q = [0.0, 0.0, 0.0]
        q[i] = 0.25 * s
        q[j] = (r[j, i] + r[i, j]) / s
        q[k] = (r[k, i] + r[i, k]) / s
        qw = (r[k, j] - r[j, k]) / s
        qx, qy, qz = q
    return qx, qy, qz, qw
