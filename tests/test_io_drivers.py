"""Dataset drivers, settings parsing, map save/load, headless viewer."""
import os
import subprocess
import sys

import numpy as np
import pytest

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io import datasets
from orbslam2_tpu.io.settings import load_settings
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.system import SLAMSystem, Sensor

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)

SETTINGS_YAML = """%YAML:1.0
Camera.fx: 260.0
Camera.fy: 260.0
Camera.cx: 160.0
Camera.cy: 120.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 320
Camera.height: 240
Camera.fps: 30.0
Camera.bf: 26.0
Camera.RGB: 1
ThDepth: 40.0
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 800
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


class TestSettings:
    def test_load_reference_format_yaml(self, tmp_path):
        p = tmp_path / "settings.yaml"
        p.write_text(SETTINGS_YAML)
        cfg = load_settings(str(p))
        assert cfg.cam.fx == 260.0
        assert cfg.cam.bf == 26.0
        assert cfg.orb.n_features == 800
        assert cfg.orb.n_levels == 4
        assert cfg.max_frames_between_kf == 30
        assert abs(cfg.th_depth - 26.0 * 40.0 / 260.0) < 1e-6
        assert cfg.depth_map_factor == 5000.0

    def test_load_actual_reference_yaml(self):
        """Parse one of the reference's own settings files."""
        ref = "/root/reference/Examples/RGB-D/TUM1.yaml"
        if not os.path.exists(ref):
            pytest.skip("reference not mounted")
        cfg = load_settings(ref)
        assert abs(cfg.cam.fx - 517.306408) < 1e-3
        assert cfg.orb.n_features == 1000


class TestTumDriver:
    @pytest.fixture(scope="class")
    def tum_dataset(self, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("tum"))
        seq = SyntheticSequence(CAM, n_frames=8, trajectory="lateral", seed=2)
        assoc = datasets.export_synthetic_tum(seq, out)
        return out, assoc, seq

    def test_roundtrip(self, tum_dataset):
        out, assoc, seq = tum_dataset
        items = list(datasets.tum_rgbd_frames(out, assoc))
        assert len(items) == 8
        gray0, depth0 = seq.render(0)
        np.testing.assert_allclose(items[0].gray, np.round(gray0), atol=1.0)
        ok = (depth0 > 0) & (items[0].depth > 0)
        np.testing.assert_allclose(items[0].depth[ok], depth0[ok], atol=2e-3)

    def test_rgbd_tum_driver_end_to_end(self, tum_dataset, tmp_path):
        out, assoc, seq = tum_dataset
        settings = tmp_path / "settings.yaml"
        settings.write_text(SETTINGS_YAML)
        traj = tmp_path / "traj.txt"
        kft = tmp_path / "kf.txt"
        env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
                   PYTHONPATH="/root/repo")
        res = subprocess.run(
            [sys.executable, "examples/rgbd_tum.py", str(settings), out, assoc,
             "--no-loop-closing", "--max-frames", "6",
             "--trajectory-out", str(traj), "--kf-trajectory-out", str(kft),
             "--eval", os.path.join(out, "groundtruth.txt")],
            cwd="/root/repo", env=env, capture_output=True, text=True, timeout=420)
        assert res.returncode == 0, res.stderr[-2000:]
        assert "tracked 6 frames" in res.stdout
        data = np.loadtxt(str(traj))
        assert data.shape == (6, 8)
        # --eval ran the TUM association + ATE/RPE path on the exported
        # groundtruth (r3 verdict item 8: parity numbers one command away)
        eval_lines = [ln for ln in res.stdout.splitlines()
                      if ln.startswith("eval:")]
        assert eval_lines, res.stdout[-2000:]
        import ast as _ast
        stats = _ast.literal_eval(eval_lines[0][5:].strip())
        assert stats["n_associated"] == 6
        assert stats["ate_rmse_m"] < 0.05, stats


class TestMapPersistence:
    def test_save_load_and_relocalize(self, tmp_path):
        seq = SyntheticSequence(CAM, n_frames=10, trajectory="lateral", seed=4)
        cfg = SLAMConfig(cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
                         th_depth=4.0, max_keyframes=32, max_points=8192,
                         local_point_cap=2048, min_init_features=300)
        s1 = SLAMSystem(cfg, Sensor.RGBD)
        for i in range(10):
            gray, depth = seq.render(i)
            s1.track_rgbd(gray, depth, i / seq.fps)
        path = str(tmp_path / "map.npz")
        s1.save_map(path)

        s2 = SLAMSystem(cfg, Sensor.RGBD)
        s2.load_map(path)
        assert s2.map.n_keyframes() == s1.map.n_keyframes()
        assert s2.map.n_points() == s1.map.n_points()
        np.testing.assert_array_equal(s2.map.kf_pose, s1.map.kf_pose)
        # localization against the loaded map (ref-KF fallback reloc)
        s2.activate_localization_mode()
        s2.tracker.ref_kf = int(s2.map.keyframe_ids()[0])
        gray, depth = seq.render(2)
        tcw = s2.track_rgbd(gray, depth, 99.0)
        assert tcw is not None
        err = np.linalg.norm(tcw[:3, 3] - seq.poses[2][:3, 3])
        assert err < 0.05


class TestHeadlessViewer:
    def test_draw_frame_and_map(self, tmp_path):
        from orbslam2_tpu.viewer.headless import HeadlessViewer, draw_map_topdown
        seq = SyntheticSequence(CAM, n_frames=4, trajectory="lateral", seed=4)
        cfg = SLAMConfig(cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
                         max_keyframes=32, max_points=8192,
                         local_point_cap=2048, min_init_features=300)
        s = SLAMSystem(cfg, Sensor.RGBD)
        viewer = HeadlessViewer(s, out_dir=str(tmp_path / "viz"), map_every=2)
        for i in range(4):
            gray, depth = seq.render(i)
            s.track_rgbd(gray, depth, i / seq.fps)
            img = viewer.update(gray)
        assert img.shape == (260, 320, 3)  # frame + status bar
        assert os.path.exists(tmp_path / "viz" / "frame_000003.png")
        assert os.path.exists(tmp_path / "viz" / "map_000002.png")
        m_img = draw_map_topdown(s.map, s.tracker.full_trajectory_twc())
        assert m_img.shape == (640, 640, 3)
        assert (m_img < 250).any()  # something was drawn
        # interactive navigation (Viewer.cc:116-196 analogue): follow
        # camera, orbit, zoom and pan all produce distinct valid renders
        from orbslam2_tpu.viewer.headless import ViewNav, draw_map_3d
        traj = s.tracker.full_trajectory_twc()
        cur = s.tracker.last_frame.tcw
        base = draw_map_3d(s.map, traj, cur_tcw=cur)
        views = [
            ViewNav(follow=True),
            ViewNav(azim_deg=40.0, elev_deg=10.0),
            ViewNav(zoom=0.4),
            ViewNav(pan=(0.3, -0.2)),
        ]
        for nav in views:
            img2 = draw_map_3d(s.map, traj, cur_tcw=cur, nav=nav)
            assert img2.shape == base.shape
            assert (img2 < 250).any()
            assert (img2 != base).any(), f"nav {nav} did not change the view"


class TestSystemAPI:
    def test_global_ba_and_calibration(self):
        from orbslam2_tpu.frontend.tracking import SLAMConfig
        from orbslam2_tpu.ops.orb import ORBConfig
        seq = SyntheticSequence(CAM, n_frames=12, trajectory="forward", seed=6)
        cfg = SLAMConfig(cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
                         th_depth=4.0, max_keyframes=32, max_points=8192,
                         local_point_cap=2048, max_frames_between_kf=5,
                         min_init_features=300, force_kf_every=4)
        s = SLAMSystem(cfg, Sensor.RGBD)
        for i in range(12):
            gray, depth = seq.render(i)
            s.track_rgbd(gray, depth, i / seq.fps)
        assert s.map.n_keyframes() >= 3
        poses_before = s.map.kf_pose.copy()
        s.global_bundle_adjust()
        # GBA ran and left a consistent map (first KF = gauge, unchanged)
        ids = s.map.keyframe_ids()
        np.testing.assert_allclose(s.map.kf_pose[ids[0]], poses_before[ids[0]],
                                   atol=1e-6)
        xy, tracked = s.get_tracked_keypoints()
        assert xy.shape[1] == 2 and tracked.dtype == bool


def test_stage_profiling_collects_and_reports():
    """utils/profiling.StageTimer wired through the tracker (SURVEY §5
    tracing/profiling gap): stages accumulate and the report renders."""
    from orbslam2_tpu.frontend.tracking import SLAMConfig
    from orbslam2_tpu.geometry.camera import PinholeCamera
    from orbslam2_tpu.io.synthetic import SyntheticSequence
    from orbslam2_tpu.ops.orb import ORBConfig
    from orbslam2_tpu.system import SLAMSystem, Sensor

    cam = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                        width=320, height=240, bf=26.0)
    cfg = SLAMConfig(cam=cam, orb=ORBConfig(n_features=600, n_levels=3),
                     th_depth=4.0, min_init_features=200, profile_stages=True)
    system = SLAMSystem(cfg, Sensor.RGBD)
    seq = SyntheticSequence(cam, n_frames=6, trajectory="lateral", seed=3)
    for i in range(seq.n_frames):
        gray, depth = seq.render(i)
        system.track_rgbd(gray, depth, i / seq.fps)
    s = system.tracker.stats.summary()
    # frames 0-1: classic path (init + first motion-model-less frame);
    # steady-state frames go through the fused one-program step
    assert s["frame_build"]["n"] >= 1
    assert s["fused_step"]["n"] >= 3
    assert s["frame_build"]["n"] + s["fused_step"]["n"] == 6
    rep = system.tracker.stats.report()
    assert "fused_step" in rep and "median" in rep
    system.tracker.stats.reset()
    assert system.tracker.stats.summary() == {}
