"""First-contact readiness for real datasets (VERDICT r4 item 7).

No KITTI/TUM/EuRoC data exists in this image, so the first real sequence
must work on the first try. These tests (a) golden-check the EuRoC online
rectification against a closed-form reimplementation on a fabricated
calibration shaped like the reference's EuRoC.yaml LEFT./RIGHT. blocks
(/root/reference/Examples/Stereo/EuRoC.yaml:35-81), and (b) fabricate
on-disk KITTI and EuRoC mini-trees exercising every loader branch plus
the stereo_kitti driver end-to-end with --eval (KITTI-format ground
truth, index association), so running on real data is one command.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io import datasets
from orbslam2_tpu.io.synthetic import SyntheticSequence

cv2 = pytest.importorskip("cv2")

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


# ----------------------------------------------------------------------
# EuRoC rectifier golden test
# ----------------------------------------------------------------------
def _euroc_like_calib():
    """Fabricated but realistically-shaped EuRoC stereo calibration."""
    k_l = np.array([[458.654, 0, 367.215],
                    [0, 457.296, 248.375], [0, 0, 1]])
    k_r = np.array([[457.587, 0, 379.999],
                    [0, 456.134, 255.238], [0, 0, 1]])
    d_l = np.array([-0.2834, 0.0739, 0.00019, 1.76e-5])
    d_r = np.array([-0.2836, 0.0745, -0.00011, -5.7e-5])
    r_l, _ = cv2.Rodrigues(np.array([0.003, -0.002, 0.001]))
    r_r, _ = cv2.Rodrigues(np.array([-0.002, 0.0025, -0.0008]))
    p = np.array([[435.2046, 0, 367.4517, 0],
                  [0, 435.2046, 252.2004, 0],
                  [0, 0, 1, 0]])
    return (k_l, d_l, r_l, p), (k_r, d_r, r_r, p), (480, 752)


def _opencv_mat(m):
    m = np.asarray(m, np.float64)
    data = ", ".join(f"{x:.12g}" for x in m.reshape(-1))
    return (f"!!opencv-matrix\n   rows: {m.shape[0]}\n"
            f"   cols: {m.shape[1]}\n   dt: d\n   data: [{data}]")


def _write_euroc_yaml(path, left, right, shape):
    """cv2.FileStorage cannot WRITE dotted keys (LEFT.K), but reads them
    fine — the reference's own EuRoC.yaml uses exactly this layout, so
    emit the YAML text directly."""
    out = ["%YAML:1.0"]
    for side, (k, d, r, p) in (("LEFT", left), ("RIGHT", right)):
        out.append(f"{side}.height: {shape[0]}")
        out.append(f"{side}.width: {shape[1]}")
        out.append(f"{side}.K: {_opencv_mat(k)}")
        out.append(f"{side}.D: {_opencv_mat(np.asarray(d).reshape(1, -1))}")
        out.append(f"{side}.R: {_opencv_mat(r)}")
        out.append(f"{side}.P: {_opencv_mat(p)}")
    with open(str(path), "w") as f:
        f.write("\n".join(out) + "\n")


def _closed_form_maps(k, d, r, p, shape):
    """cv2.initUndistortRectifyMap semantics from first principles:
    output pixel -> P^-1 -> rectified ray -> R^-1 -> camera ray ->
    radtan distortion -> K -> source pixel."""
    h, w = shape
    fx_p, fy_p = p[0, 0], p[1, 1]
    cx_p, cy_p = p[0, 2], p[1, 2]
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    x = (u - cx_p) / fx_p
    y = (v - cy_p) / fy_p
    ones = np.ones_like(x)
    vec = np.stack([x, y, ones], axis=-1) @ np.linalg.inv(r).T
    xp = vec[..., 0] / vec[..., 2]
    yp = vec[..., 1] / vec[..., 2]
    k1, k2, p1, p2 = d[:4]
    r2 = xp * xp + yp * yp
    rad = 1 + k1 * r2 + k2 * r2 * r2
    xd = xp * rad + 2 * p1 * xp * yp + p2 * (r2 + 2 * xp * xp)
    yd = yp * rad + p1 * (r2 + 2 * yp * yp) + 2 * p2 * xp * yp
    mapx = k[0, 0] * xd + k[0, 2]
    mapy = k[1, 1] * yd + k[1, 2]
    return mapx.astype(np.float32), mapy.astype(np.float32)


def test_euroc_rectifier_golden(tmp_path):
    left, right, shape = _euroc_like_calib()
    yaml = tmp_path / "euroc.yaml"
    _write_euroc_yaml(yaml, left, right, shape)
    rect = datasets.EurocRectifier(str(yaml))
    for maps, (k, d, r, p) in ((rect.map_l, left), (rect.map_r, right)):
        gx, gy = _closed_form_maps(k, d, r, p, shape)
        # interior comparison: edge pixels map far outside and cv2 clamps
        # differently there
        sl = (slice(40, shape[0] - 40), slice(40, shape[1] - 40))
        assert np.abs(maps[0][sl] - gx[sl]).max() < 0.05
        assert np.abs(maps[1][sl] - gy[sl]).max() < 0.05
    # identity calibration rectifies to (near) identity mapping
    eye_p = np.zeros((3, 4))
    eye_p[:3, :3] = left[0]
    ident = (left[0], np.zeros(4), np.eye(3), eye_p)
    yaml2 = tmp_path / "ident.yaml"
    _write_euroc_yaml(yaml2, ident, ident, shape)
    rect2 = datasets.EurocRectifier(str(yaml2))
    u, v = np.meshgrid(np.arange(shape[1], dtype=np.float32),
                       np.arange(shape[0], dtype=np.float32))
    assert np.abs(rect2.map_l[0] - u).max() < 1e-3
    assert np.abs(rect2.map_l[1] - v).max() < 1e-3
    img = np.random.default_rng(0).uniform(
        0, 255, shape).astype(np.uint8)
    l2, r2 = rect2(img, img)
    np.testing.assert_array_equal(l2, img)


# ----------------------------------------------------------------------
# fabricated mini dataset trees
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti") / "00"
    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir()
    # 40-frame trajectory, first 10 written: the per-frame motion of the
    # parametric path scales with 1/n, and a 10-frame path moves too fast
    # for a cold-started motion model
    seq = SyntheticSequence(CAM, n_frames=40, trajectory="lateral", seed=2)
    seq.n_written = 10
    for i in range(seq.n_written):
        gl, gr, _ = seq.render_stereo(i)
        cv2.imwrite(str(root / "image_0" / f"{i:06d}.png"),
                    np.clip(np.round(gl), 0, 255).astype(np.uint8))
        cv2.imwrite(str(root / "image_1" / f"{i:06d}.png"),
                    np.clip(np.round(gr), 0, 255).astype(np.uint8))
    times = np.arange(seq.n_written) / seq.fps
    np.savetxt(str(root / "times.txt"), times, fmt="%.6e")
    # KITTI-format ground truth: per-frame 3x4 Twc rows
    gt = np.stack([np.linalg.inv(seq.poses[i])[:3, :4].reshape(-1)
                   for i in range(seq.n_written)])
    np.savetxt(str(root / "poses.txt"), gt, fmt="%.9e")
    return str(root), seq


def test_kitti_loaders(kitti_tree):
    root, seq = kitti_tree
    stereo = list(datasets.kitti_stereo_frames(root))
    assert len(stereo) == seq.n_written
    gl, gr, _ = seq.render_stereo(0)
    np.testing.assert_allclose(stereo[0].left, np.round(gl), atol=1.0)
    np.testing.assert_allclose(stereo[0].right, np.round(gr), atol=1.0)
    assert stereo[3].timestamp == pytest.approx(3 / seq.fps, abs=1e-6)
    mono = list(datasets.kitti_mono_frames(root))
    assert len(mono) == seq.n_written
    np.testing.assert_allclose(mono[0].gray, stereo[0].left)


@pytest.fixture(scope="module")
def euroc_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("euroc") / "mav0"
    (root / "cam0" / "data").mkdir(parents=True)
    (root / "cam1" / "data").mkdir(parents=True)
    seq = SyntheticSequence(CAM, n_frames=6, trajectory="lateral", seed=5)
    ts_path = root.parent / "timestamps.txt"
    lines = ["# timestamp [ns]"]
    t0 = 1403636579763555584
    for i in range(seq.n_frames):
        ts = t0 + int(i / seq.fps * 1e9)
        gl, gr, _ = seq.render_stereo(i)
        cv2.imwrite(str(root / "cam0" / "data" / f"{ts}.png"),
                    np.clip(np.round(gl), 0, 255).astype(np.uint8))
        cv2.imwrite(str(root / "cam1" / "data" / f"{ts}.png"),
                    np.clip(np.round(gr), 0, 255).astype(np.uint8))
        lines.append(f"{ts},{ts}.png")
    ts_path.write_text("\n".join(lines) + "\n")
    return str(root), str(ts_path), seq


def test_euroc_loaders(euroc_tree, tmp_path):
    root, ts_path, seq = euroc_tree
    # comment lines are skipped; both raw and rectified branches run
    stereo = list(datasets.euroc_stereo_frames(root, ts_path))
    assert len(stereo) == seq.n_frames
    gl, gr, _ = seq.render_stereo(0)
    np.testing.assert_allclose(stereo[0].left, np.round(gl), atol=1.0)
    dt = stereo[1].timestamp - stereo[0].timestamp
    assert dt == pytest.approx(1 / seq.fps, abs=1e-6)
    # identity rectifier branch: images pass through unchanged
    eye_p = np.zeros((3, 4))
    k = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1]])
    eye_p[:3, :3] = k
    ident = (k, np.zeros(4), np.eye(3), eye_p)
    yaml = tmp_path / "ident.yaml"
    _write_euroc_yaml(yaml, ident, ident, (240, 320))
    rect = datasets.EurocRectifier(str(yaml))
    stereo_r = list(datasets.euroc_stereo_frames(root, ts_path,
                                                 rectifier=rect))
    np.testing.assert_allclose(stereo_r[0].left, stereo[0].left, atol=1.0)
    mono = list(datasets.euroc_mono_frames(root, ts_path))
    assert len(mono) == seq.n_frames
    np.testing.assert_allclose(mono[0].gray, stereo[0].left)


# ----------------------------------------------------------------------
# stereo_kitti driver end-to-end with KITTI-format --eval
# ----------------------------------------------------------------------
def test_stereo_kitti_driver_eval(kitti_tree, tmp_path):
    root, seq = kitti_tree
    settings = tmp_path / "settings.yaml"
    settings.write_text(SETTINGS_YAML)
    traj = tmp_path / "traj.txt"
    kitti_traj = tmp_path / "kitti_traj.txt"
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH="/root/repo")
    res = subprocess.run(
        [sys.executable, "examples/stereo_kitti.py", str(settings), root,
         "--no-loop-closing", "--max-frames", "8",
         "--trajectory-out", str(traj),
         "--kitti-trajectory-out", str(kitti_traj),
         "--eval", os.path.join(root, "poses.txt")],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=420)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "tracked 8 frames" in res.stdout
    # KITTI trajectory export: 12-column rows, loadable by the same
    # KITTI-format reader the --eval path uses
    data = np.loadtxt(str(kitti_traj))
    assert data.shape == (8, 12)
    eval_lines = [ln for ln in res.stdout.splitlines()
                  if ln.startswith("eval:")]
    assert eval_lines, res.stdout[-2000:]
    import ast
    stats = ast.literal_eval(eval_lines[0][5:].strip())
    assert stats["n_associated"] == 8
    assert stats["ate_rmse_m"] < 0.05, stats
