import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.geometry import se3
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.solvers import initializer

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
K = np.asarray(CAM.k_matrix())


def general_scene(rng, n=300, noise=0.3, outlier_frac=0.0):
    """3D scene with depth variation (fundamental-matrix regime)."""
    pts = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(4.0, 14.0, size=n)
    return project_two_views(rng, pts, noise, outlier_frac)


def planar_scene(rng, n=300, noise=0.3, outlier_frac=0.0):
    """All points on z = 6 plane (homography regime)."""
    pts = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    pts[:, 2] = 6.0
    return project_two_views(rng, pts, noise, outlier_frac)


def project_two_views(rng, pts, noise, outlier_frac):
    n = len(pts)
    xi = np.array([0.6, 0.05, 0.02, 0.01, 0.08, 0.005], np.float32)
    t21 = np.asarray(se3.exp(jnp.asarray(xi)))
    uv1, _ = CAM.project(jnp.asarray(pts))
    uv2, _ = CAM.project(se3.apply(jnp.asarray(t21), jnp.asarray(pts)))
    uv1 = np.array(uv1) + rng.normal(size=(n, 2)).astype(np.float32) * noise
    uv2 = np.array(uv2) + rng.normal(size=(n, 2)).astype(np.float32) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        uv2[:n_out] += rng.uniform(20, 80, size=(n_out, 2)).astype(np.float32)
    valid = ((uv1 > 0) & (uv1 < [640, 480])).all(1) & ((uv2 > 0) & (uv2 < [640, 480])).all(1)
    return uv1.astype(np.float32), uv2.astype(np.float32), valid, t21, pts


def run_init(uv1, uv2, valid):
    return initializer.initialize_two_view(
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid),
        jnp.asarray(K.astype(np.float32)), jax.random.PRNGKey(7))


def check_motion(res, t21_true, atol_rot=0.02, atol_dir=0.05):
    r_est = np.asarray(res.r21)
    t_est = np.asarray(res.t21)
    r_true = t21_true[:3, :3]
    t_true = t21_true[:3, 3]
    rot_err = np.linalg.norm(np.asarray(se3.so3_log(jnp.asarray(r_est @ r_true.T))))
    t_dir_true = t_true / np.linalg.norm(t_true)
    dir_err = 1.0 - abs(float(t_est @ t_dir_true))
    assert rot_err < atol_rot, f"rotation error {rot_err}"
    assert dir_err < atol_dir, f"translation direction error {dir_err}"


class TestInitializer:
    def test_general_scene_uses_fundamental(self, rng):
        uv1, uv2, valid, t21, pts = general_scene(rng, noise=0.2)
        res = run_init(uv1, uv2, valid)
        assert bool(res.success)
        assert not bool(res.used_homography)
        check_motion(res, t21)
        # triangulated points match ground truth up to scale
        good = np.asarray(res.good)
        est = np.asarray(res.points)[good]
        gt = pts[good]
        scale = np.median(gt[:, 2] / est[:, 2])
        err = np.linalg.norm(est * scale - gt, axis=1)
        assert np.median(err) < 0.1

    def test_planar_scene_uses_homography(self, rng):
        uv1, uv2, valid, t21, pts = planar_scene(rng, noise=0.2)
        res = run_init(uv1, uv2, valid)
        assert bool(res.success)
        assert bool(res.used_homography)
        check_motion(res, t21, atol_rot=0.05, atol_dir=0.1)

    def test_outlier_robustness(self, rng):
        uv1, uv2, valid, t21, pts = general_scene(rng, noise=0.3, outlier_frac=0.2)
        res = run_init(uv1, uv2, valid)
        assert bool(res.success)
        check_motion(res, t21, atol_rot=0.03)
        good = np.asarray(res.good)
        assert good[:int(0.2 * len(uv1))].mean() < 0.15  # outliers rejected

    def test_pure_rotation_rejected(self, rng):
        """No parallax -> must not initialize (degenerate for SfM)."""
        pts = rng.uniform(-3, 3, size=(300, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(4.0, 14.0, size=300)
        r = np.asarray(se3.so3_exp(jnp.asarray(np.array([0.0, 0.05, 0.0], np.float32))))
        t21 = np.eye(4, dtype=np.float32)
        t21[:3, :3] = r
        uv1, _ = CAM.project(jnp.asarray(pts))
        uv2, _ = CAM.project(jnp.asarray(pts @ r.T))
        uv1, uv2 = np.array(uv1), np.array(uv2)
        valid = np.ones(300, bool)
        res = run_init(uv1, uv2, valid)
        assert not bool(res.success)
