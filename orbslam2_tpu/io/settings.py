"""Settings loading: reference-compatible OpenCV YAML camera/ORB configs.

Reads the exact YAML files the reference ships (e.g.
/root/reference/Examples/RGB-D/TUM1.yaml, Examples/Monocular/KITTI00-02.yaml)
via cv2.FileStorage — the same parser the reference uses (System.cc:58,
Tracking.cc:46-154) — and maps them onto this framework's SLAMConfig.
"""
from __future__ import annotations

from typing import Tuple

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.ops.orb import ORBConfig


def _read(fs, key: str, default=None):
    node = fs.getNode(key)
    if node.empty():
        return default
    if node.isInt() or node.isReal():
        return node.real()
    if node.isString():
        return node.string()
    return default


def load_settings(path: str, image_size: Tuple[int, int] | None = None,
                  **overrides) -> SLAMConfig:
    """Parse a reference-format settings YAML into a SLAMConfig.

    image_size: (width, height) — the reference infers it from the first
    image; pass it explicitly or accept the Camera.width/height keys if
    present. `overrides` override any SLAMConfig field.
    """
    import cv2

    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    if not fs.isOpened():
        raise FileNotFoundError(f"cannot open settings file {path}")
    try:
        fx = _read(fs, "Camera.fx")
        fy = _read(fs, "Camera.fy")
        cx = _read(fs, "Camera.cx")
        cy = _read(fs, "Camera.cy")
        width = int(_read(fs, "Camera.width", image_size[0] if image_size else 640))
        height = int(_read(fs, "Camera.height", image_size[1] if image_size else 480))
        cam = PinholeCamera(
            fx=fx, fy=fy, cx=cx, cy=cy,
            k1=_read(fs, "Camera.k1", 0.0),
            k2=_read(fs, "Camera.k2", 0.0),
            p1=_read(fs, "Camera.p1", 0.0),
            p2=_read(fs, "Camera.p2", 0.0),
            k3=_read(fs, "Camera.k3", 0.0),
            width=width, height=height,
            bf=_read(fs, "Camera.bf", 0.0),
        )
        orb = ORBConfig(
            n_features=int(_read(fs, "ORBextractor.nFeatures", 2000)),
            scale_factor=_read(fs, "ORBextractor.scaleFactor", 1.2),
            n_levels=int(_read(fs, "ORBextractor.nLevels", 8)),
            ini_th_fast=_read(fs, "ORBextractor.iniThFAST", 20.0),
            min_th_fast=_read(fs, "ORBextractor.minThFAST", 7.0),
        )
        fps = _read(fs, "Camera.fps", 30.0) or 30.0
        th_depth_units = _read(fs, "ThDepth", 40.0)
        # mThDepth = bf * ThDepth / fx (Tracking.cc:105-110)
        th_depth = cam.bf * th_depth_units / fx if cam.bf else 3.0
        cfg = SLAMConfig(
            cam=cam, orb=orb, th_depth=th_depth,
            max_frames_between_kf=int(fps),
            # map capacities: framework extension keys (the reference's
            # pointer map grows unbounded; fixed-capacity arrays need a
            # budget — KITTI 00 peaks around 1400 KFs / 150k points).
            # 0/absent = SLAMConfig defaults (drivers may raise them).
            max_keyframes=int(_read(fs, "Map.MaxKeyFrames", 0)) or 256,
            max_points=int(_read(fs, "Map.MaxPoints", 0)) or 16384,
        )
        depth_map_factor = _read(fs, "DepthMapFactor", 1.0) or 1.0
        cfg.depth_map_factor = depth_map_factor  # used by the RGB-D driver
        cfg.rgb_order = bool(int(_read(fs, "Camera.RGB", 1) or 1))
        for k, v in overrides.items():
            setattr(cfg, k, v)
        return cfg
    finally:
        fs.release()
