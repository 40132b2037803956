import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from orbslam2_tpu.geometry import se3, sim3, camera, triangulate


def random_rotations(rng, n):
    return Rotation.random(n, random_state=np.random.RandomState(7)).as_matrix().astype(np.float32)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(64, 6)).astype(np.float32) * 0.7
        t = se3.exp(jnp.asarray(xi))
        xi2 = se3.log(t)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=2e-4)

    def test_exp_small_angle(self):
        xi = jnp.array([1e-9, 0, 0, 0, 1e-9, 0], dtype=jnp.float32)
        t = se3.exp(xi)
        assert np.allclose(np.asarray(t), np.eye(4), atol=1e-6)

    def test_exp_matches_scipy(self, rng):
        phi = rng.normal(size=(16, 3)).astype(np.float32)
        r = se3.so3_exp(jnp.asarray(phi))
        r_ref = Rotation.from_rotvec(phi).as_matrix()
        np.testing.assert_allclose(np.asarray(r), r_ref, atol=1e-5)

    def test_so3_log_matches_scipy(self, rng):
        r_ref = random_rotations(rng, 32)
        phi = se3.so3_log(jnp.asarray(r_ref))
        expected = Rotation.from_matrix(r_ref).as_rotvec()
        # log is unique up to 2*pi wrapping; for random rotations |phi| < pi
        np.testing.assert_allclose(np.asarray(phi), expected, atol=1e-3)

    def test_inverse_compose(self, rng):
        xi = rng.normal(size=(8, 6)).astype(np.float32)
        t = se3.exp(jnp.asarray(xi))
        ident = se3.compose(t, se3.inverse(t))
        np.testing.assert_allclose(np.asarray(ident), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)

    def test_apply(self, rng):
        xi = rng.normal(size=(6,)).astype(np.float32)
        t = se3.exp(jnp.asarray(xi))
        p = rng.normal(size=(10, 3)).astype(np.float32)
        out = se3.apply(t, jnp.asarray(p))
        tn = np.asarray(t)
        expected = p @ tn[:3, :3].T + tn[:3, 3]
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_camera_center(self, rng):
        xi = rng.normal(size=(6,)).astype(np.float32)
        tcw = se3.exp(jnp.asarray(xi))
        ow = se3.camera_center(tcw)
        # camera center maps to origin in camera frame
        np.testing.assert_allclose(np.asarray(se3.apply(tcw, ow)), np.zeros(3), atol=1e-5)

    def test_quaternion_roundtrip(self, rng):
        r = random_rotations(rng, 16)
        q = se3.to_quaternion(jnp.asarray(r))
        r2 = se3.from_quaternion(q)
        np.testing.assert_allclose(np.asarray(r2), r, atol=1e-5)
        q_ref = Rotation.from_matrix(r).as_quat()  # xyzw
        qn = np.asarray(q)
        # quaternions are sign-ambiguous
        sign = np.sign(np.sum(qn * q_ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(qn, q_ref * sign, atol=1e-5)

    def test_retract_matches_left_multiplication(self, rng):
        t = se3.exp(jnp.asarray(rng.normal(size=(6,)).astype(np.float32)))
        xi = jnp.asarray(rng.normal(size=(6,)).astype(np.float32) * 0.1)
        np.testing.assert_allclose(
            np.asarray(se3.retract(t, xi)),
            np.asarray(se3.exp(xi) @ t),
            atol=1e-6,
        )


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 7)).astype(np.float32) * 0.5
        s = sim3.exp(jnp.asarray(xi))
        xi2 = sim3.log(s)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=3e-4)

    def test_scale_extraction(self, rng):
        r = random_rotations(rng, 8)
        s_val = rng.uniform(0.5, 2.0, size=(8,)).astype(np.float32)
        t = rng.normal(size=(8, 3)).astype(np.float32)
        s_mat = sim3.from_srt(jnp.asarray(s_val), jnp.asarray(r), jnp.asarray(t))
        s_out, r_out, t_out = sim3.split(s_mat)
        np.testing.assert_allclose(np.asarray(s_out), s_val, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(r_out), r, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_out), t, atol=1e-5)

    def test_inverse(self, rng):
        xi = rng.normal(size=(4, 7)).astype(np.float32) * 0.5
        s = sim3.exp(jnp.asarray(xi))
        ident = sim3.compose(s, sim3.inverse(s))
        np.testing.assert_allclose(np.asarray(ident), np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-5)

    def test_sim3_reduces_to_se3(self, rng):
        xi6 = rng.normal(size=(6,)).astype(np.float32)
        xi7 = np.concatenate([xi6, [0.0]]).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(sim3.exp(jnp.asarray(xi7))),
            np.asarray(se3.exp(jnp.asarray(xi6))),
            atol=1e-5,
        )

    def test_to_se3_descale(self, rng):
        r = random_rotations(rng, 1)[0]
        s_mat = sim3.from_srt(jnp.asarray(2.0), jnp.asarray(r), jnp.asarray([2.0, 4.0, 6.0], dtype=jnp.float32))
        t_mat = sim3.to_se3(s_mat)
        np.testing.assert_allclose(np.asarray(t_mat[:3, :3]), r, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t_mat[:3, 3]), [1.0, 2.0, 3.0], atol=1e-5)


class TestCamera:
    CAM = camera.PinholeCamera(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                               k1=0.26, k2=-0.95, p1=-0.005, p2=0.003, k3=1.16,
                               width=640, height=480, bf=40.0)

    def test_project_backproject(self, rng):
        pts = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(0.5, 5.0, size=100)
        uv, z = self.CAM.project(jnp.asarray(pts))
        back = self.CAM.backproject(uv, z)
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)

    def test_undistort_matches_opencv(self, rng):
        cv2 = pytest.importorskip("cv2")
        uv = rng.uniform([50, 50], [590, 430], size=(200, 2)).astype(np.float32)
        k = np.array([[self.CAM.fx, 0, self.CAM.cx], [0, self.CAM.fy, self.CAM.cy], [0, 0, 1]])
        d = np.array([self.CAM.k1, self.CAM.k2, self.CAM.p1, self.CAM.p2, self.CAM.k3])
        ref = cv2.undistortPoints(uv.reshape(-1, 1, 2), k, d, P=k).reshape(-1, 2)
        out = np.asarray(self.CAM.undistort_points(jnp.asarray(uv), iters=20))
        np.testing.assert_allclose(out, ref, atol=0.1)

    def test_distort_undistort_roundtrip(self, rng):
        uv = rng.uniform([100, 100], [540, 380], size=(50, 2)).astype(np.float32)
        und = self.CAM.undistort_points(jnp.asarray(uv), iters=20)
        xn = jnp.stack([(und[..., 0] - self.CAM.cx) / self.CAM.fx,
                        (und[..., 1] - self.CAM.cy) / self.CAM.fy], axis=-1)
        xd = self.CAM.distort_normalized(xn)
        back = jnp.stack([self.CAM.fx * xd[..., 0] + self.CAM.cx,
                          self.CAM.fy * xd[..., 1] + self.CAM.cy], axis=-1)
        np.testing.assert_allclose(np.asarray(back), uv, atol=0.05)

    def test_stereo_projection(self):
        pts = jnp.array([[0.5, 0.2, 2.0]], dtype=jnp.float32)
        uvr, z = self.CAM.project_stereo(pts)
        assert np.allclose(np.asarray(uvr[0, 2]), np.asarray(uvr[0, 0]) - 40.0 / 2.0)


class TestTriangulate:
    def test_dlt_recovers_points(self, rng):
        cam = camera.PinholeCamera(fx=500, fy=500, cx=320, cy=240)
        k = cam.k_matrix()
        t1 = se3.identity()
        t2 = se3.exp(jnp.asarray([0.5, 0.02, 0.01, 0.01, 0.05, 0.0], dtype=jnp.float32))
        pts = rng.uniform(-2, 2, size=(128, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(3.0, 10.0, size=128)
        uv1, _ = cam.project(se3.apply(t1, jnp.asarray(pts)))
        uv2, _ = cam.project(se3.apply(t2, jnp.asarray(pts)))
        p1 = triangulate.projection_matrix(k, t1)
        p2 = triangulate.projection_matrix(k, t2)
        rec = triangulate.triangulate_dlt(p1, p2, uv1, uv2)
        np.testing.assert_allclose(np.asarray(rec), pts, atol=2e-2)

    def test_epipolar_distance_zero_for_matches(self, rng):
        cam = camera.PinholeCamera(fx=500, fy=500, cx=320, cy=240)
        k = cam.k_matrix()
        t1 = se3.identity()
        t2 = se3.exp(jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.02, 0.0], dtype=jnp.float32))
        pts = rng.uniform(-2, 2, size=(64, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(3.0, 10.0, size=64)
        uv1, _ = cam.project(se3.apply(t1, jnp.asarray(pts)))
        uv2, _ = cam.project(se3.apply(t2, jnp.asarray(pts)))
        f12 = triangulate.fundamental_from_poses(k, t1, k, t2)
        d = triangulate.epipolar_distance_sq(uv1, uv2, f12)
        assert float(jnp.max(d)) < 1e-2

    def test_reprojection_error(self, rng):
        cam = camera.PinholeCamera(fx=500, fy=500, cx=320, cy=240)
        k = cam.k_matrix()
        t = se3.exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.1))
        pts = rng.uniform(-1, 1, size=(32, 3)).astype(np.float32) + np.array([0, 0, 5.0], dtype=np.float32)
        uv, _ = cam.project(se3.apply(t, jnp.asarray(pts)))
        err, z = triangulate.reprojection_error_sq(k, t, jnp.asarray(pts), uv)
        assert float(jnp.max(err)) < 1e-4
        assert float(jnp.min(z)) > 0
