import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.backend import pose_opt
from orbslam2_tpu.geometry import se3
from orbslam2_tpu.geometry.camera import PinholeCamera

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0)


def make_problem(rng, n=200, noise=0.5, outlier_frac=0.0, stereo=False):
    pts = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(4.0, 12.0, size=n)
    xi_true = (rng.normal(size=6) * 0.2).astype(np.float32)
    tcw = se3.exp(jnp.asarray(xi_true))
    if stereo:
        uvr, z = CAM.project_stereo(se3.apply(tcw, jnp.asarray(pts)))
        uv = np.array(uvr)
    else:
        uv2, z = CAM.project(se3.apply(tcw, jnp.asarray(pts)))
        uv = np.concatenate([np.asarray(uv2), -np.ones((n, 1), np.float32)], axis=1)
    uv[:, :2] += rng.normal(size=(n, 2)).astype(np.float32) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        uv[:n_out, :2] += rng.uniform(30, 80, size=(n_out, 2)).astype(np.float32)
    obs = pose_opt.PoseObs(
        pts_w=jnp.asarray(pts),
        uv=jnp.asarray(uv),
        inv_sigma2=jnp.ones((n,), jnp.float32),
        is_stereo=jnp.full((n,), stereo),
        valid=jnp.ones((n,), bool),
    )
    return tcw, obs, n_out


def pose_error(t_est, t_true):
    delta = np.asarray(se3.log(se3.compose(t_est, se3.inverse(t_true))))
    return np.linalg.norm(delta)


class TestPoseOptimization:
    def test_converges_from_perturbed_init(self, rng):
        tcw_true, obs, _ = make_problem(rng, noise=0.0)
        tcw0 = se3.retract(tcw_true, jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.1))
        tcw, inlier, n_in = jax.jit(pose_opt.pose_optimization, static_argnums=2)(tcw0, obs, CAM)
        assert pose_error(tcw, tcw_true) < 1e-3
        assert int(n_in) == 200

    def test_noise_robustness(self, rng):
        tcw_true, obs, _ = make_problem(rng, noise=0.5)
        tcw0 = se3.retract(tcw_true, jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.05))
        tcw, inlier, n_in = pose_opt.pose_optimization(tcw0, obs, CAM)
        assert pose_error(tcw, tcw_true) < 0.01
        assert int(n_in) > 150

    def test_outlier_rejection(self, rng):
        tcw_true, obs, n_out = make_problem(rng, noise=0.3, outlier_frac=0.25)
        tcw0 = se3.retract(tcw_true, jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.05))
        tcw, inlier, n_in = pose_opt.pose_optimization(tcw0, obs, CAM)
        assert pose_error(tcw, tcw_true) < 0.01
        inlier = np.asarray(inlier)
        # outliers (first n_out) must be classified out
        assert inlier[:n_out].sum() <= 2
        assert inlier[n_out:].sum() > 140

    def test_stereo_edges(self, rng):
        tcw_true, obs, _ = make_problem(rng, noise=0.3, stereo=True)
        tcw0 = se3.retract(tcw_true, jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.08))
        tcw, inlier, n_in = pose_opt.pose_optimization(tcw0, obs, CAM)
        assert pose_error(tcw, tcw_true) < 0.01
        assert int(n_in) > 150

    def test_invalid_obs_ignored(self, rng):
        tcw_true, obs, _ = make_problem(rng, noise=0.0)
        # corrupt half the observations but mark them invalid
        uv = np.array(obs.uv)
        uv[100:, :2] = 0.0
        valid = np.ones(200, bool)
        valid[100:] = False
        obs = obs._replace(uv=jnp.asarray(uv), valid=jnp.asarray(valid))
        tcw0 = se3.retract(tcw_true, jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.05))
        tcw, inlier, n_in = pose_opt.pose_optimization(tcw0, obs, CAM)
        assert pose_error(tcw, tcw_true) < 1e-3
        assert int(n_in) == 100

    def test_jacobian_matches_autodiff(self, rng):
        tcw_true, obs, _ = make_problem(rng, noise=0.0, stereo=True)
        e0, j, _ = pose_opt._residual_jacobian(tcw_true, obs, CAM)

        def res_fn(xi):
            e, _, _ = pose_opt._residual_jacobian(se3.retract(tcw_true, xi), obs, CAM)
            return e

        j_auto = jax.jacfwd(res_fn)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(j), np.asarray(j_auto), atol=2e-2, rtol=1e-3)

    def test_compaction_matches_full(self, rng):
        # scatter 200 valid obs across a 2048-capacity set: the compacted
        # LM chain must give the same pose and the same full-size inlier
        # mask as running on the raw capacity
        tcw_true, obs, _ = make_problem(rng, noise=0.3, outlier_frac=0.1)
        cap = 2048
        sel = np.sort(rng.choice(cap, size=200, replace=False))
        big = pose_opt.PoseObs(
            pts_w=jnp.zeros((cap, 3), jnp.float32).at[sel].set(obs.pts_w),
            uv=jnp.zeros((cap, 3), jnp.float32).at[sel].set(obs.uv),
            inv_sigma2=jnp.ones((cap,), jnp.float32),
            is_stereo=jnp.zeros((cap,), bool),
            valid=jnp.zeros((cap,), bool).at[sel].set(True),
        )
        tcw0 = se3.retract(tcw_true, jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.05))
        t_a, in_a, n_a = pose_opt.pose_optimization(tcw0, big, CAM, compact_cap=1024)
        t_b, in_b, n_b = pose_opt.pose_optimization(tcw0, big, CAM, compact_cap=None)
        assert pose_error(t_a, t_b) < 1e-5
        assert int(n_a) == int(n_b)
        np.testing.assert_array_equal(np.asarray(in_a), np.asarray(in_b))
        # overflow: cap smaller than the valid count still returns a sane
        # pose and classifies inliers over the full set
        t_c, in_c, n_c = pose_opt.pose_optimization(tcw0, big, CAM, compact_cap=128)
        assert pose_error(t_c, tcw_true) < 0.05
        assert np.asarray(in_c).shape == (cap,)
        assert int(n_c) > 150
