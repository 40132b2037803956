"""f32 robustness of the Schur/PCG stack against an f64 oracle.

The reference solves its bundle adjustments in g2o's double precision; this
framework runs f32 on TPU (SURVEY hard part (c)). These tests stress the
conditioning cases where f32 could silently diverge — long thin
trajectories and distant points — and bound the f32 solution against the
SAME solver run in float64 (jax_enable_x64 recompiles the identical
program in double precision: a true oracle, not a reimplementation).

Finding (documented bound, SURVEY hard part (c)): on every stress geometry
the f32 stack reaches a COST-IDENTICAL optimum (<0.1%% cost delta vs f64)
with gt error within 1.2x of the oracle; parameter-space differences lie
along near-flat drift directions of the anchored chain. No f64 island or
compensated reduction is required at these scales.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.backend import ba
from orbslam2_tpu.geometry.camera import PinholeCamera

CAM = PinholeCamera(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                    width=640, height=480, bf=40.0)


def make_long_thin_problem(n_cams=256, n_pts=8192, n_obs=49152, seed=0,
                           far=False, noise=0.5, perturb=0.01):
    """Straight-line trajectory (KITTI-highway-like): the reduced camera
    system's condition number grows with trajectory length; `far` pushes
    points to 50-200 m where triangulation Jacobians are weakest."""
    rng = np.random.default_rng(seed)
    length = 100.0
    poses = np.tile(np.eye(4, dtype=np.float64), (n_cams, 1, 1))
    poses[:, 0, 3] = -np.linspace(0, length, n_cams)  # Tcw: camera at x=i
    pts = np.zeros((n_pts, 3))
    pts[:, 0] = rng.uniform(-5, length + 5, n_pts)
    pts[:, 1] = rng.uniform(-3, 3, n_pts)
    pts[:, 2] = rng.uniform(50.0, 200.0, n_pts) if far \
        else rng.uniform(4.0, 40.0, n_pts)
    # each camera sees points from a window ahead of it
    obs_cam = rng.integers(0, n_cams, n_obs).astype(np.int32)
    cam_x = length * obs_cam / n_cams
    lo = np.searchsorted(np.sort(pts[:, 0]), cam_x - 5)
    order = np.argsort(pts[:, 0])
    span = max(n_pts // 10, 64)
    obs_pt = order[(lo + rng.integers(0, span, n_obs)) % n_pts].astype(np.int32)
    pc = pts[obs_pt] + poses[obs_cam][:, :3, 3]
    z = np.maximum(pc[:, 2], 1.0)
    stereo = rng.random(n_obs) < 0.5
    u = CAM.fx * pc[:, 0] / z + CAM.cx
    v = CAM.fy * pc[:, 1] / z + CAM.cy
    ur = np.where(stereo, u - CAM.bf / z, -1.0)
    uv = np.stack([u + rng.normal(0, noise, n_obs),
                   v + rng.normal(0, noise, n_obs), ur], axis=1)
    # perturb the initial estimate (the solver must pull it back)
    poses_init = poses.copy()
    poses_init[1:, 0, 3] += rng.normal(0, perturb, n_cams - 1)
    poses_init[1:, 1, 3] += rng.normal(0, perturb, n_cams - 1)
    pts_init = pts + rng.normal(0, perturb, (n_pts, 3))

    def problem(dtype):
        return ba.BAProblem(
            poses=jnp.asarray(poses_init.astype(dtype)),
            points=jnp.asarray(pts_init.astype(dtype)),
            cam_fixed=jnp.asarray(np.arange(n_cams) == 0),
            obs_cam=jnp.asarray(obs_cam),
            obs_pt=jnp.asarray(obs_pt),
            obs_uv=jnp.asarray(uv.astype(dtype)),
            obs_inv_sigma2=jnp.ones((n_obs,), dtype),
            obs_stereo=jnp.asarray(stereo),
            obs_valid=jnp.ones((n_obs,), bool),
        )
    return problem, poses, pts


def max_pose_err(res_poses, poses_true):
    p = np.asarray(res_poses, np.float64)
    return np.abs(p - poses_true).max()


class TestF32VsF64Oracle:
    @pytest.mark.parametrize("far", [False, True],
                             ids=["near-points", "distant-points"])
    def test_pcg_long_thin_trajectory(self, far):
        """256-camera straight-line GBA: the f32 PCG solution must stay
        within a small factor of the f64 oracle's accuracy (no silent
        divergence), on both near and far (weakly-conditioned) points."""
        problem, poses_true, _ = make_long_thin_problem(far=far)
        res32 = ba.bundle_adjust_pcg(problem(np.float32), CAM,
                                     phase_iters=(4, 6), pcg_iters=30)
        e32 = max_pose_err(res32.poses, poses_true)
        jax.config.update("jax_enable_x64", True)
        try:
            res64 = ba.bundle_adjust_pcg(problem(np.float64), CAM,
                                         phase_iters=(4, 6), pcg_iters=30)
            e64 = max_pose_err(res64.poses, poses_true)
        finally:
            jax.config.update("jax_enable_x64", False)
        # On a 100 m noisy chain anchored at one end, the TRUE optimum
        # drifts from ground truth with distance (random-walk error
        # accumulation), and ill-conditioning makes the cost surface
        # near-flat along drift directions — f32 and f64 may land on
        # different PARAMETERS along those flat directions. The meaningful
        # precision criterion is COST parity (same optimum quality) plus a
        # bounded gt-error ratio. Measured (and why no f64 island is
        # needed): costs agree to <0.1% and e32 is within noise of e64 on
        # every stress geometry, f32 occasionally beating the oracle.
        c32, c64 = float(res32.cost), float(res64.cost)
        assert abs(c32 - c64) <= 1e-3 * c64 + 1e-6, \
            f"f32 cost diverged: {c32:.3f} vs f64 {c64:.3f}"
        assert e32 <= 1.2 * e64 + 5e-3, \
            f"f32 gt-error diverged: err32={e32:.5f} err64={e64:.5f}"
        assert e64 < 1.0  # sanity: the chain did not explode

    def test_dense_schur_local_window(self):
        """Local-BA-shaped dense Schur at f32 vs f64 (64-camera window)."""
        problem, poses_true, _ = make_long_thin_problem(
            n_cams=64, n_pts=2048, n_obs=12288, seed=3)
        res32 = ba.bundle_adjust(problem(np.float32), CAM)
        e32 = max_pose_err(res32.poses, poses_true)
        jax.config.update("jax_enable_x64", True)
        try:
            res64 = ba.bundle_adjust(problem(np.float64), CAM)
            e64 = max_pose_err(res64.poses, poses_true)
        finally:
            jax.config.update("jax_enable_x64", False)
        c32, c64 = float(res32.cost), float(res64.cost)
        assert abs(c32 - c64) <= 1e-3 * c64 + 1e-6, \
            f"f32 cost diverged: {c32:.3f} vs f64 {c64:.3f}"
        assert e32 <= 1.2 * e64 + 5e-3, \
            f"f32 gt-error diverged: err32={e32:.5f} err64={e64:.5f}"
        assert e64 < 1.0  # sanity: the chain did not explode


class TestWeaklyObservedPoints:
    def test_kitti_density_observation_graph(self):
        """KITTI-map observation density (~3-7 obs/pt with a tail of 0/1-obs
        points): round-3 regression — 1-obs points are unconstrained along
        their ray, the linear step slid them tens of meters, and the next
        iteration's near-singular damped point Hessian overflowed f32 into
        an all-NaN delta that the cost test then ACCEPTED (NaN poses turn
        the z-gate off and collapse the masked cost). The solver now
        freezes <2-obs points per phase and rejects non-finite steps."""
        problem_fn, poses_true, _ = make_long_thin_problem(
            n_cams=256, n_pts=20_000, n_obs=131_072, seed=1, perturb=0.01)
        res = ba.bundle_adjust_pcg(problem_fn(np.float32), CAM,
                                   phase_iters=(4, 6), pcg_iters=30)
        poses = np.asarray(res.poses, np.float64)
        assert np.isfinite(poses).all(), "NaN/inf poses at KITTI density"
        assert np.abs(poses - poses_true).max() < 0.3
        assert float(np.asarray(res.inlier).mean()) > 0.9
        # dense path hits the same chain
        problem_fn2, poses_true2, _ = make_long_thin_problem(
            n_cams=48, n_pts=4_000, n_obs=16_384, seed=2, perturb=0.01)
        res2 = ba.bundle_adjust(problem_fn2(np.float32), CAM)
        poses2 = np.asarray(res2.poses, np.float64)
        assert np.isfinite(poses2).all()
        assert float(np.asarray(res2.inlier).mean()) > 0.9


    def test_lone_observation_keeps_prior_status(self):
        """A lone-MONO-obs point is ray-unconstrained, so it is frozen for
        the phase and its observation is never optimized; judging it
        against the unmoved point would mark it an outlier and callers
        would ERASE the point's only observation. g2o instead optimizes
        the free point, which fits its lone residual exactly and
        classifies inlier (/root/reference/src/Optimizer.cc:230-246 over
        the full set) — so retaining the prior (valid) status matches the
        reference's effective behavior. A lone-STEREO-obs point is fully
        constrained (u,v,uR fixes all 3 DoF) and must stay FREE: the
        reference's local BA optimizes every freshly backprojected close
        point from exactly one stereo obs (CreateNewKeyFrame close-point loop, Tracking.cc:1323-1381; UpdateLastFrame temporal points, Tracking.cc:986-1030) —
        freezing those degraded the whole stereo pipeline (round-3
        regression: e2e loop detection starved, +2 lost frames)."""
        problem_fn, _, pts_true = make_long_thin_problem(
            n_cams=16, n_pts=512, n_obs=4096, seed=7, perturb=0.0)
        prob = problem_fn(np.float32)
        obs_pt = np.asarray(prob.obs_pt).copy()
        obs_cam = np.asarray(prob.obs_cam)
        stereo = np.asarray(prob.obs_stereo).copy()
        uv = np.asarray(prob.obs_uv).copy()
        # 8 lone-MONO points (any depth) and 8 lone-STEREO points chosen
        # at z < 12 m — strong disparity, the regime of the reference's
        # freshly backprojected close points (mCurrentFrame.mvDepth <
        # mThDepth, CreateNewKeyFrame, Tracking.cc:1323-1381). Far lone-stereo points
        # (bf/z^2 -> 0) degenerate toward mono and may legitimately slide
        # along the ray and classify outlier, as they would in g2o with
        # the same pixel noise.
        valid = np.asarray(prob.obs_valid).copy()
        close = [int(p) for p in np.flatnonzero(pts_true[:, 2] < 12.0)
                 if p < 200]
        far = [int(p) for p in np.flatnonzero(pts_true[:, 2] >= 12.0)
               if p < 200]
        lone_mono, lone_stereo = [], []
        mono_pts, stereo_pts = [], []
        for p in far[:8]:
            idx = np.flatnonzero(obs_pt == p)
            if len(idx) == 0:
                continue
            valid[idx[1:]] = False  # keep exactly one observation
            o = int(idx[0])
            stereo[o] = False
            uv[o, 2] = -1.0
            lone_mono.append(o)
            mono_pts.append(p)
        for p in close[:8]:
            idx = np.flatnonzero(obs_pt == p)
            if len(idx) == 0:
                continue
            valid[idx[1:]] = False
            o = int(idx[0])
            # force a stereo measurement: uR = u - bf/z_true (disparity
            # consistent with the observed u, true depth)
            stereo[o] = True
            uv[o, 2] = uv[o, 0] - CAM.bf / pts_true[p][2]
            lone_stereo.append(o)
            stereo_pts.append(p)
        assert len(lone_mono) >= 4 and len(lone_stereo) >= 4
        pts = np.asarray(prob.points).copy()
        # mono-lone points: gross init error — judged naively they would
        # classify outlier (the frozen point never moves toward its obs)
        pts[mono_pts] += 3.0
        # stereo-lone points: a real (convergable) init error — the free
        # point must be pulled onto its full-rank residual and kept
        pts[stereo_pts] += 0.2
        prob = prob._replace(obs_pt=jnp.asarray(obs_pt),
                             obs_stereo=jnp.asarray(stereo),
                             obs_uv=jnp.asarray(uv),
                             obs_valid=jnp.asarray(valid),
                             points=jnp.asarray(pts))
        lone_mono = np.asarray(lone_mono)
        lone_stereo = np.asarray(lone_stereo)
        mono_pts = obs_pt[lone_mono]
        for solve in (lambda p: ba.bundle_adjust(p, CAM),
                      lambda p: ba.bundle_adjust_pcg(
                          p, CAM, phase_iters=(3, 3), pcg_iters=20)):
            res = solve(prob)
            inl = np.asarray(res.inlier)
            out_pts = np.asarray(res.points)
            # lone MONO observations keep their prior (valid) status
            assert inl[lone_mono].all(), \
                "lone mono observations of frozen points were judged outliers"
            # and their (frozen) points were not moved
            assert np.allclose(out_pts[mono_pts], pts[mono_pts]), \
                "ray-unconstrained points must stay frozen through the solve"
            # lone STEREO observations are optimized: the free point fits
            # its full-rank residual and classifies inlier
            assert inl[lone_stereo].all(), \
                "lone stereo observations must be optimized and kept"
            st_pts = obs_pt[lone_stereo]
            assert not np.allclose(out_pts[st_pts], pts[st_pts]), \
                "single-stereo-obs points must stay free (reference behavior)"
            assert np.isfinite(out_pts).all() and \
                np.isfinite(np.asarray(res.poses)).all()


def teardown_module(module):
    # the 8-device / full-capacity compiles in this module are the suite's
    # largest; dropping the executable cache keeps the whole-suite memory
    # footprint from tripping XLA-CPU segfaults in later big compiles
    import gc
    import jax
    jax.clear_caches()
    gc.collect()
