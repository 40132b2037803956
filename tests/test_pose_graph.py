"""Sim3 pose-graph optimizer + OptimizeSim3 tests."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.backend import pose_graph, sim3_opt
from orbslam2_tpu.geometry import se3, sim3
from orbslam2_tpu.geometry.camera import PinholeCamera

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)


def ring_problem(rng, n_kf=12, drift_per_step=0.02, scale_drift=1.01):
    """Keyframes around a loop; odometry edges with accumulated drift plus
    one loop edge closing the ring with the true relative transform."""
    # ground-truth poses on a circle
    true = []
    for i in range(n_kf):
        ang = 2 * np.pi * i / n_kf
        r = np.asarray(se3.so3_exp(jnp.asarray(np.array([0, ang, 0], np.float32))))
        t = np.array([np.sin(ang) * 2, 0.0, 2 - np.cos(ang) * 2], np.float32)
        twc = np.eye(4, dtype=np.float32)
        twc[:3, :3] = r
        twc[:3, 3] = t
        true.append(np.linalg.inv(twc).astype(np.float32))
    true = np.stack(true)

    # odometry measurements = true relatives (no noise in the measurement;
    # the *initial guess* is what drifts)
    meas_ij = []
    edges = []
    for i in range(n_kf - 1):
        s_i = true[i]
        s_j = true[i + 1]
        meas_ij.append(s_j @ np.linalg.inv(s_i))
        edges.append((i, i + 1))
    # loop edge 0 <-> n-1
    meas_ij.append(true[n_kf - 1] @ np.linalg.inv(true[0]))
    edges.append((0, n_kf - 1))

    # drifted initial estimates: integrate odometry with an error twist and
    # growing scale
    est = [true[0]]
    for i in range(1, n_kf):
        err = np.asarray(se3.exp(jnp.asarray(
            (rng.normal(size=6) * drift_per_step).astype(np.float32))))
        rel = true[i] @ np.linalg.inv(true[i - 1])
        drifted = err @ rel @ est[i - 1]
        s_mat = np.asarray(sim3.from_se3(jnp.asarray(drifted), scale_drift ** i))
        est.append(s_mat.astype(np.float32))
    est = np.stack(est)
    return true, est, edges, meas_ij


class TestEssentialGraph:
    def test_loop_closure_corrects_drift(self, rng):
        true, est, edges, meas = ring_problem(rng)
        n_kf = len(true)
        e_i = np.array([e[0] for e in edges], np.int32)
        e_j = np.array([e[1] for e in edges], np.int32)
        meas = np.stack(meas).astype(np.float32)
        fixed = np.zeros(n_kf, bool)
        fixed[0] = True
        poses, cost = pose_graph.optimize_essential_graph(
            jnp.asarray(est), jnp.ones(n_kf, bool), jnp.asarray(fixed),
            jnp.asarray(e_i), jnp.asarray(e_j), jnp.asarray(meas),
            jnp.ones(len(e_i), bool))
        poses = np.asarray(poses)
        init_err, final_err = [], []
        for i in range(n_kf):
            se3_init = np.asarray(sim3.to_se3(jnp.asarray(est[i])))
            se3_final = np.asarray(sim3.to_se3(jnp.asarray(poses[i])))
            init_err.append(np.linalg.norm(np.asarray(se3.log(
                jnp.asarray(se3_init @ np.linalg.inv(true[i]))))))
            final_err.append(np.linalg.norm(np.asarray(se3.log(
                jnp.asarray(se3_final @ np.linalg.inv(true[i]))))))
        assert max(final_err) < 0.02, (max(init_err), max(final_err))
        assert max(final_err) < 0.2 * max(init_err)
        # scale drift removed
        scales = [float(sim3.scale(jnp.asarray(p))) for p in poses]
        assert max(abs(s - 1.0) for s in scales) < 0.02

    def test_fix_scale_mode(self, rng):
        true, est, edges, meas = ring_problem(rng, scale_drift=1.0)
        n_kf = len(true)
        e_i = np.array([e[0] for e in edges], np.int32)
        e_j = np.array([e[1] for e in edges], np.int32)
        fixed = np.zeros(n_kf, bool)
        fixed[0] = True
        poses, _ = pose_graph.optimize_essential_graph(
            jnp.asarray(est), jnp.ones(n_kf, bool), jnp.asarray(fixed),
            jnp.asarray(e_i), jnp.asarray(e_j),
            jnp.asarray(np.stack(meas).astype(np.float32)),
            jnp.ones(len(e_i), bool), fix_scale=True)
        scales = [float(sim3.scale(jnp.asarray(p))) for p in np.asarray(poses)]
        assert max(abs(s - 1.0) for s in scales) < 1e-3


class TestOptimizeSim3:
    def test_refines_ransac_estimate(self, rng):
        n = 80
        pts1 = rng.uniform(-2, 2, (n, 3)).astype(np.float32) + [0, 0, 6]
        s_true, rvec, t_true = 1.25, np.array([0.1, -0.15, 0.05], np.float32), \
            np.array([0.3, -0.1, 0.2], np.float32)
        r_true = np.asarray(se3.so3_exp(jnp.asarray(rvec)))
        pts2 = ((pts1 - t_true) @ r_true / s_true).astype(np.float32)
        uv1, _ = CAM.project(jnp.asarray(pts1))
        uv2, _ = CAM.project(jnp.asarray(pts2))
        uv1 = np.array(uv1) + rng.normal(size=(n, 2)).astype(np.float32) * 0.3
        uv2 = np.array(uv2) + rng.normal(size=(n, 2)).astype(np.float32) * 0.3
        # start from a perturbed Sim3
        s0 = sim3.from_srt(jnp.asarray(s_true * 1.1),
                           jnp.asarray(r_true) @ np.asarray(
                               se3.so3_exp(jnp.asarray(np.array([0.03, 0, 0], np.float32)))),
                           jnp.asarray(t_true + 0.1))
        ones = jnp.ones(n, jnp.float32)
        s12, inl, n_in = sim3_opt.optimize_sim3(
            s0, jnp.asarray(pts1), jnp.asarray(pts2),
            jnp.asarray(uv1), jnp.asarray(uv2), ones, ones,
            jnp.ones(n, bool), CAM)
        assert int(n_in) > 60
        s, r, t = sim3.split(s12)
        assert abs(float(s) - s_true) < 0.01
        np.testing.assert_allclose(np.asarray(r), r_true, atol=0.01)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=0.05)
