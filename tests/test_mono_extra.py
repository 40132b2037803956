"""Monocular coverage beyond the basic e2e: 7-DoF loop closure with scale
correction, relocalization, and robustness worlds.

The reference's monocular validation story is TUM/KITTI mono runs with
scale-drift-aware loop closing (OptimizeEssentialGraph with bFixScale=false,
/root/reference/src/Optimizer.cc:885-1120) and KFDB relocalization
(Tracking.cc:1641-1812). These tests exercise the same paths on synthetic
ground-truth worlds.
"""
import numpy as np
import pytest

from orbslam2_tpu.frontend.tracking import SLAMConfig, TrackingState
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.evaluate import ate_rmse
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.place.pretrained import get_default_vocabulary
from orbslam2_tpu.system import SLAMSystem, Sensor

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)


@pytest.fixture(scope="module")
def voc():
    return get_default_vocabulary()


def make_system(voc=None, **kw):
    cfg = SLAMConfig(
        cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
        max_keyframes=96, max_points=16384, local_point_cap=2048,
        max_frames_between_kf=8, **kw)
    return SLAMSystem(cfg, Sensor.MONOCULAR, vocabulary=voc)


def _seg_scale_error(est_twc, gt_twc):
    """Median |log(s)| of per-step scale: ||est step|| / ||gt step||,
    measured over consecutive-frame translations. Scale drift in a mono
    run shows up as this ratio wandering from its initial value."""
    e = np.diff(est_twc[:, :3, 3], axis=0)
    g = np.diff(gt_twc[:, :3, 3], axis=0)
    en = np.linalg.norm(e, axis=1)
    gn = np.linalg.norm(g, axis=1)
    keep = (gn > 1e-4) & (en > 1e-9)
    r = en[keep] / gn[keep]
    r = r / np.median(r[: max(5, len(r) // 10)])  # normalize the free gauge
    return float(np.median(np.abs(np.log(r))))


class TestMonoLoopClosure:
    def test_circuit_loop_fix_scale_false(self, voc):
        """Mono tour of a room returning to the start: the loop must close
        with the 7-DoF essential graph (fix_scale=False — the entire point
        of the sim3 pose graph for mono, Optimizer.cc:945,1100-1119), and
        the trajectory's scale error must not grow versus the pre-loop
        state."""
        # circuit3 (full turn + 135 deg): mono init consumes the first
        # ~55 deg of arc before any keyframe exists, so smaller overshoots
        # leave too few revisit keyframes for the consistency chain; the
        # exposure swing induces enough drift that re-association breaks
        # and a genuine loop EVENT fires — without it this renderer's mono
        # drift is so small that the revisit reconnects seamlessly through
        # covisibility (correct behavior, but no loop to test)
        seq = SyntheticSequence(CAM, n_frames=200, trajectory="circuit3",
                                seed=9, world="room", exposure=0.35)
        system = make_system(voc)
        assert system.loop_closer.cfg.fix_scale is False  # mono wiring
        system.loop_closer.cfg.consistency_threshold = 2
        system.local_mapper.cfg.kf_cull_redundancy = 2.0
        pre_traj = None
        pre_n = 0
        for i in range(seq.n_frames):
            gray, _ = seq.render(i)
            system.track_monocular(gray, i / seq.fps)
            # drain the async loop-closing worker every frame: which
            # keyframe the loop event fires on (and hence the corrected
            # geometry the scale assertion below measures) is otherwise a
            # race against worker scheduling — measured pre/post scale
            # varied 0.18-0.28 run-to-run on a loaded box, failing the
            # 5% bound either way at random (reference mains feed at
            # dataset rate, which keeps the loop thread caught up too)
            system.wait_mapping_idle(timeout=30.0)
            if system.loop_closer.n_loops_closed == 0:
                # latest pre-loop snapshot (poses are re-resolved through
                # their reference keyframes, so it must be captured before
                # the correction rewrites keyframe poses)
                if i % 10 == 9:
                    pre_traj = system.tracker.full_trajectory_twc(wait=False)
                    pre_n = len(pre_traj)
        system.wait_mapping_idle()
        assert system.loop_closer.n_loops_closed >= 1, "mono loop not closed"
        assert pre_traj is not None and pre_n > 40
        post_traj = system.tracker.full_trajectory_twc()
        lost = system.tracker.trajectory_lost_mask()
        gt = np.stack([np.linalg.inv(seq.poses[i])
                       for i in range(seq.n_frames)])
        keep_pre = ~lost[:pre_n]
        keep_post = ~lost
        pre_scale = _seg_scale_error(pre_traj[keep_pre], gt[:pre_n][keep_pre])
        win_scale = _seg_scale_error(post_traj[:pre_n][keep_pre],
                                     gt[:pre_n][keep_pre])
        full_scale = _seg_scale_error(post_traj[keep_post], gt[keep_post])
        # What the 7-DoF correction must deliver: the FULL trajectory's
        # scale drift shrinks below the uncorrected pre-loop level (the
        # closure removes the accumulated Sim3 error). The pre-loop
        # WINDOW alone may get slightly WORSE: the essential graph
        # redistributes the closure error over all edges, perturbing the
        # locally-accurate early segment — exactly g2o's behavior
        # (Optimizer.cc:1100-1119 spreads the residual along the graph),
        # so that is bounded, not forbidden (measured deterministic on a
        # drained worker: window 0.223 -> 0.264 while full drops to
        # 0.183; the old no-growth assertion passed in round 4 only by a
        # worker-timing race over WHICH keyframe closed the loop).
        assert full_scale <= pre_scale + 1e-3, \
            f"full-trajectory scale error grew: {pre_scale:.4f} -> " \
            f"{full_scale:.4f}"
        assert win_scale <= pre_scale * 1.5 + 1e-3, \
            f"pre-loop window scale error blew up: {pre_scale:.4f} -> " \
            f"{win_scale:.4f}"
        err = ate_rmse(post_traj[keep_post], gt[keep_post], with_scale=True)
        assert err < 0.30, f"post-loop mono ATE {err:.3f}"


class TestMonoRelocalization:
    def test_kidnapped_mono(self, voc):
        seq = SyntheticSequence(CAM, n_frames=30, trajectory="lateral",
                                seed=11)
        system = make_system(voc)
        first_ok = None
        for i in range(25):
            gray, _ = seq.render(i)
            if system.track_monocular(gray, i / seq.fps) is not None \
                    and first_ok is None:
                first_ok = i
        assert system.map.n_keyframes() >= 2
        system.wait_mapping_idle()
        # the map's own estimate for the revisited frame: relocalization
        # must return to the MAP's frame (which carries mono scale/drift),
        # not to ground truth
        revisit = first_ok + 2
        est_before = system.tracker.full_trajectory_twc()
        expect_tcw = np.linalg.inv(est_before[revisit])
        system.tracker.state = TrackingState.LOST
        system.tracker.velocity = None
        gray, _ = seq.render(revisit)
        tcw = system.track_monocular(gray, 99.0)
        assert tcw is not None, "mono relocalization failed"
        assert system.tracker.state == TrackingState.OK
        r_err = np.linalg.norm(tcw[:3, :3] - expect_tcw[:3, :3])
        t_err = np.linalg.norm(tcw[:3, 3] - expect_tcw[:3, 3])
        assert r_err < 0.1, f"reloc rotation error {r_err:.3f}"
        assert t_err < 0.15, f"reloc translation error {t_err:.3f}"


class TestMonoRobustness:
    def _run(self, **seq_kw):
        system = make_system()
        seq = SyntheticSequence(CAM, n_frames=30, trajectory="lateral",
                                seed=3, **seq_kw)
        lost = 0
        first_ok = None
        for i in range(seq.n_frames):
            gray, _ = seq.render(i)
            ok = system.track_monocular(gray, i / seq.fps) is not None
            if ok and first_ok is None:
                first_ok = i
            if not ok and first_ok is not None:
                lost += 1
        system.wait_mapping_idle()
        assert first_ok is not None, "mono never initialized"
        est = system.tracker.full_trajectory_twc()[first_ok:]
        gt = np.stack([np.linalg.inv(seq.poses[i])
                       for i in range(first_ok, seq.n_frames)])
        keep = ~system.tracker.trajectory_lost_mask()[first_ok:]
        return lost, ate_rmse(est[keep], gt[keep], with_scale=True)

    def test_mono_exposure_swings(self):
        lost, ate = self._run(exposure=0.3)
        assert lost <= 3, lost
        assert ate < 0.10, ate

    def test_mono_moving_occluder(self):
        lost, ate = self._run(occluder=True)
        assert lost <= 4, lost
        assert ate < 0.12, ate


def teardown_module(module):
    # the 8-device / full-capacity compiles in this module are the suite's
    # largest; dropping the executable cache keeps the whole-suite memory
    # footprint from tripping XLA-CPU segfaults in later big compiles
    import gc
    import jax
    jax.clear_caches()
    gc.collect()
