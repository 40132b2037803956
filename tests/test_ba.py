import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.backend import ba
from orbslam2_tpu.geometry import se3
from orbslam2_tpu.geometry.camera import PinholeCamera

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0)


def make_ba_problem(rng, n_cams=6, n_pts=120, noise=0.3, outlier_frac=0.0,
                    pose_noise=0.02, point_noise=0.05, stereo=False):
    """Cameras on an arc looking at a point cloud; observations of every
    point from every camera (dense visibility)."""
    pts = rng.uniform(-4, 4, size=(n_pts, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(8.0, 16.0, size=n_pts)

    poses_true = []
    for i in range(n_cams):
        xi = np.array([0.4 * i, 0.02 * i, 0.0, 0.0, 0.03 * i, 0.0], np.float32)
        poses_true.append(np.asarray(se3.exp(jnp.asarray(xi))))
    poses_true = np.stack(poses_true)

    obs_cam, obs_pt, obs_uv = [], [], []
    for k in range(n_cams):
        pc = pts @ poses_true[k, :3, :3].T + poses_true[k, :3, 3]
        uvr, z = CAM.project_stereo(jnp.asarray(pc))
        uvr = np.array(uvr)
        uvr[:, :2] += rng.normal(size=(n_pts, 2)).astype(np.float32) * noise
        for j in range(n_pts):
            obs_cam.append(k)
            obs_pt.append(j)
            obs_uv.append(uvr[j])
    obs_uv = np.array(obs_uv, np.float32)
    n_obs = len(obs_cam)
    n_out = int(n_obs * outlier_frac)
    if n_out:
        idx = rng.choice(n_obs, size=n_out, replace=False)
        obs_uv[idx, :2] += rng.uniform(25, 60, size=(n_out, 2)).astype(np.float32)
        outlier_mask = np.zeros(n_obs, bool)
        outlier_mask[idx] = True
    else:
        outlier_mask = np.zeros(n_obs, bool)

    # perturb initial estimates. Gauge: camera 0 fixed; for mono, camera 1
    # is fixed too, otherwise global scale is unconstrained (the reference
    # mono local BA has the same gauge freedom).
    cam_fixed = np.zeros(n_cams, bool)
    cam_fixed[0] = True
    if not stereo:
        cam_fixed[1] = True
    poses0 = poses_true.copy()
    for k in range(n_cams):
        if cam_fixed[k]:
            continue
        xi = (rng.normal(size=6) * pose_noise).astype(np.float32)
        poses0[k] = np.asarray(se3.retract(jnp.asarray(poses_true[k]), jnp.asarray(xi)))
    pts0 = pts + rng.normal(size=pts.shape).astype(np.float32) * point_noise

    problem = ba.BAProblem(
        poses=jnp.asarray(poses0),
        points=jnp.asarray(pts0),
        cam_fixed=jnp.asarray(cam_fixed),
        obs_cam=jnp.asarray(np.array(obs_cam, np.int32)),
        obs_pt=jnp.asarray(np.array(obs_pt, np.int32)),
        obs_uv=jnp.asarray(obs_uv),
        obs_inv_sigma2=jnp.ones((n_obs,), jnp.float32),
        obs_stereo=jnp.full((n_obs,), stereo),
        obs_valid=jnp.ones((n_obs,), bool),
    )
    return problem, poses_true, pts, outlier_mask


def pose_errors(poses_est, poses_true):
    errs = []
    for k in range(poses_true.shape[0]):
        d = se3.log(se3.compose(jnp.asarray(np.asarray(poses_est)[k]),
                                se3.inverse(jnp.asarray(poses_true[k]))))
        errs.append(np.linalg.norm(np.asarray(d)))
    return np.array(errs)


class TestBundleAdjust:
    def test_clean_convergence(self, rng):
        problem, poses_true, pts_true, _ = make_ba_problem(rng, noise=0.0)
        res = jax.jit(ba.bundle_adjust, static_argnums=(1, 2))(problem, CAM, (5, 10))
        errs = pose_errors(res.poses, poses_true)
        assert errs.max() < 1e-3, errs
        pt_err = np.linalg.norm(np.asarray(res.points) - pts_true, axis=-1)
        assert np.median(pt_err) < 5e-3
        assert bool(jnp.all(res.inlier))

    def test_noisy_convergence_beats_init(self, rng):
        problem, poses_true, pts_true, _ = make_ba_problem(rng, noise=0.5)
        init_err = pose_errors(problem.poses, poses_true).max()
        res = ba.bundle_adjust(problem, CAM)
        final_err = pose_errors(res.poses, poses_true).max()
        assert final_err < init_err * 0.5
        assert final_err < 0.02  # statistical floor for 0.5px noise, 120 pts

    def test_outlier_classification(self, rng):
        problem, poses_true, pts_true, out_mask = make_ba_problem(
            rng, noise=0.3, outlier_frac=0.1)
        res = ba.bundle_adjust(problem, CAM)
        inl = np.asarray(res.inlier)
        # outliers excluded, inliers kept
        assert inl[out_mask].mean() < 0.05
        assert inl[~out_mask].mean() > 0.9
        assert pose_errors(res.poses, poses_true).max() < 0.01

    def test_gauge_fixed_camera_unchanged(self, rng):
        problem, poses_true, _, _ = make_ba_problem(rng, noise=0.3)
        res = ba.bundle_adjust(problem, CAM)
        np.testing.assert_allclose(
            np.asarray(res.poses)[0], np.asarray(problem.poses)[0], atol=1e-6)

    def test_stereo_observations(self, rng):
        problem, poses_true, _, _ = make_ba_problem(rng, noise=0.3, stereo=True)
        res = ba.bundle_adjust(problem, CAM)
        assert pose_errors(res.poses, poses_true).max() < 0.01

    def test_fixed_points_stay(self, rng):
        problem, poses_true, pts_true, _ = make_ba_problem(rng, noise=0.2)
        pt_fixed = np.zeros(pts_true.shape[0], bool)
        pt_fixed[:20] = True
        res = ba.bundle_adjust(problem, CAM, point_fixed=jnp.asarray(pt_fixed))
        np.testing.assert_allclose(
            np.asarray(res.points)[:20], np.asarray(problem.points)[:20], atol=1e-6)

    def test_masked_observations_ignored(self, rng):
        problem, poses_true, _, _ = make_ba_problem(rng, noise=0.2)
        # corrupt 30% of observations but mark invalid
        n_obs = problem.obs_uv.shape[0]
        idx = rng.choice(n_obs, size=int(0.3 * n_obs), replace=False)
        uv = np.array(problem.obs_uv)
        uv[idx] += 500.0
        valid = np.ones(n_obs, bool)
        valid[idx] = False
        problem = problem._replace(obs_uv=jnp.asarray(uv), obs_valid=jnp.asarray(valid))
        res = ba.bundle_adjust(problem, CAM)
        assert pose_errors(res.poses, poses_true).max() < 0.01


class TestFlatJacobianPipeline:
    def test_flat_matches_rank3(self, rng):
        """The flat [O,D] jacobian pipeline (the TPU layout fast path) must
        match the rank-3 reference formulation."""
        problem, _, _, _ = make_ba_problem(rng, n_cams=6, n_pts=120, noise=0.3,
                                           outlier_frac=0.1, stereo=True)
        e1, jc1, jp1, z1 = ba._residuals_jacobians(problem, CAM)
        e2, jc2, jp2, z2 = ba._residuals_jacobians_flat(problem, CAM)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-3)
        np.testing.assert_allclose(np.asarray(jc1).reshape(-1, 18),
                                   np.asarray(jc2), atol=1e-3)
        np.testing.assert_allclose(np.asarray(jp1).reshape(-1, 9),
                                   np.asarray(jp2), atol=1e-3)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-4)
        e3, z3 = ba._residual_only_ba(problem, CAM)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e3), atol=1e-3)

    def test_inv6x6_spd(self, rng):
        x = rng.normal(size=(64, 6, 6)).astype(np.float32)
        spd = np.einsum("kij,klj->kil", x, x) + 0.1 * np.eye(6, dtype=np.float32)
        inv = np.asarray(ba._inv6x6_spd(jnp.asarray(spd)))
        ident = np.einsum("kij,kjl->kil", spd, inv)
        np.testing.assert_allclose(ident, np.broadcast_to(np.eye(6), ident.shape),
                                   atol=1e-3)

    def test_inv3x3_flat(self, rng):
        x = rng.normal(size=(64, 3, 3)).astype(np.float32)
        spd = np.einsum("kij,klj->kil", x, x) + 0.1 * np.eye(3, dtype=np.float32)
        inv = np.asarray(ba._inv3x3_flat(jnp.asarray(spd.reshape(64, 9))))
        ident = np.einsum("kij,kjl->kil", spd, inv.reshape(64, 3, 3))
        np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), ident.shape),
                                   atol=1e-4)
