"""Live viewer: render loop thread over a real tracking session
(Viewer.cc:54-196 analogue; headless publish mode on this display-less CI)."""
import os
import time

import numpy as np

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.system import SLAMSystem, Sensor
from orbslam2_tpu.viewer.live import LiveViewer

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)


def test_live_viewer_renders_during_tracking(tmp_path):
    cfg = SLAMConfig(cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
                     th_depth=4.0, max_keyframes=32, max_points=4096,
                     local_point_cap=1024, min_init_features=300)
    system = SLAMSystem(cfg, Sensor.RGBD)
    viewer = LiveViewer(system, fps=60, map_every=2,
                        out_dir=str(tmp_path), use_gui=False)
    seq = SyntheticSequence(CAM, n_frames=10, trajectory="lateral", seed=2)
    for i in range(seq.n_frames):
        gray, depth = seq.render(i)
        system.track_rgbd(gray, depth, i / seq.fps)
        viewer.push_frame(gray)
        time.sleep(0.02)  # give the 60 Hz loop a tick per frame
    deadline = time.time() + 5.0
    while viewer.n_rendered < 3 and time.time() < deadline:
        time.sleep(0.05)
    viewer.close()
    system.shutdown()
    assert viewer.n_rendered >= 3, viewer.n_rendered
    assert os.path.exists(tmp_path / "latest_frame.jpg")
    assert os.path.exists(tmp_path / "latest_map.jpg")
    # overlay has the status bar row appended
    assert viewer.last_frame_img.shape[0] == CAM.height + 20
    assert viewer.last_map_img.shape == (640, 640, 3)
    # thread actually stopped
    assert not viewer._thread.is_alive()


def test_draw_map_3d_frusta_and_edges():
    """Perspective 3D map view (MapDrawer.cc:93-256 parity): keyframe
    frusta, graph edges, trajectory and current camera must rasterize into
    a non-trivial image, and loop edges must add red strokes."""
    from tests.test_mapstate import make_map
    from orbslam2_tpu.viewer.headless import draw_map_3d

    m, kfs, pts = make_map(n_kf=6, n_pts=60)
    rng = np.random.default_rng(0)
    for i, k in enumerate(kfs):
        m.kf_pose[k, :3, 3] = [0.4 * i, 0.0, 0.2 * (i % 2)]
        m.kf_parent[k] = kfs[i - 1] if i else -1
    for j, p in enumerate(pts):
        m.pt_pos[p] = rng.normal(size=3) + [1.0, 0.0, 3.0]
        m.kf_pt[kfs[j % len(kfs)], j % m.cap.n_features] = p
    m.touch_obs()
    traj = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    traj[:, 0, 3] = np.linspace(0, 2.4, 8)
    img = draw_map_3d(m, traj, cur_tcw=m.kf_pose[kfs[-1]])
    assert img.shape == (640, 640, 3)
    # something was drawn (non-white pixels), including blue frustum
    # strokes and green graph/camera strokes
    nonwhite = (img != 255).any(axis=2)
    assert nonwhite.sum() > 500
    blue = (img[:, :, 0] == 200) & (img[:, :, 1] == 80) & (img[:, :, 2] == 0)
    assert blue.sum() > 50, "no keyframe frusta drawn"
    m.kf_loop_edges[kfs[0]].add(kfs[-1])
    m.kf_loop_edges[kfs[-1]].add(kfs[0])
    img2 = draw_map_3d(m, traj)
    red = (img2[:, :, 2] == 255) & (img2[:, :, 0] == 0)
    assert red.sum() > 10, "loop edge not drawn"


def test_viewer_system_controls(tmp_path):
    """The reference GUI's menu surface (/root/reference/src/Viewer.cc:69-75,
    139-148): Localization Mode drives System::ActivateLocalizationMode /
    Deactivate, Reset resets the SLAM system, and the Show Points /
    KeyFrames / Graph checkboxes gate the map drawing."""
    cfg = SLAMConfig(cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
                     th_depth=4.0, max_keyframes=32, max_points=4096,
                     local_point_cap=1024, min_init_features=300)
    system = SLAMSystem(cfg, Sensor.RGBD)
    viewer = LiveViewer(system, fps=60, out_dir=str(tmp_path), use_gui=False)
    try:
        seq = SyntheticSequence(CAM, n_frames=4, trajectory="lateral", seed=2)
        for i in range(seq.n_frames):
            gray, depth = seq.render(i)
            system.track_rgbd(gray, depth, i / seq.fps)
        # Localization Mode toggle (menuLocalizationMode, Viewer.cc:131-138)
        assert not system.cfg.localization_only
        viewer._handle_key(ord("l"))
        assert system.cfg.localization_only
        assert system.tracker.cfg.localization_only
        viewer._handle_key(ord("l"))
        assert not system.cfg.localization_only
        # Show Points / KeyFrames / Graph checkboxes
        for key, attr in (("p", "show_points"), ("k", "show_keyframes"),
                          ("g", "show_graph")):
            assert getattr(viewer.nav, attr)
            viewer._handle_key(ord(key))
            assert not getattr(viewer.nav, attr)
        # drawing respects the toggles: all three off -> only trajectory +
        # current camera remain
        from orbslam2_tpu.viewer.headless import draw_map_3d
        full = draw_map_3d(system.map, nav=None)
        bare = draw_map_3d(system.map, nav=viewer.nav)
        assert ((full != 255).any(axis=2)).sum() > \
            ((bare != 255).any(axis=2)).sum()
        # Reset (menuReset, Viewer.cc:139-148): system map is cleared
        assert system.map.n_keyframes() > 0
        viewer._handle_key(ord("c"))
        assert system.map.n_keyframes() == 0
    finally:
        viewer.close()
        system.shutdown()
