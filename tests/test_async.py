"""Async orchestration: background mapping thread vs synchronous results."""
import time

import numpy as np

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.evaluate import ate_rmse
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.system import SLAMSystem, Sensor

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)


def run(async_mode: bool):
    seq = SyntheticSequence(CAM, n_frames=40, trajectory="forward", seed=1)
    cfg = SLAMConfig(
        cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
        th_depth=4.0, max_keyframes=64, max_points=8192,
        local_point_cap=2048, max_frames_between_kf=10,
        min_init_features=300, async_mapping=async_mode)
    system = SLAMSystem(cfg, Sensor.RGBD)
    ok = 0
    for i in range(seq.n_frames):
        gray, depth = seq.render(i)
        tcw = system.track_rgbd(gray, depth, i / seq.fps)
        ok += tcw is not None
    system.wait_mapping_idle()
    est = system.tracker.full_trajectory_twc()
    gt = np.stack([np.linalg.inv(seq.poses[i]) for i in range(seq.n_frames)])
    err = ate_rmse(est, gt)
    n_kf = system.map.n_keyframes()
    n_pt = system.map.n_points()
    system.shutdown()
    return ok, err, n_kf, n_pt


class TestAsyncMapping:
    def test_async_matches_sync_quality(self):
        ok_s, err_s, kf_s, pt_s = run(async_mode=False)
        ok_a, err_a, kf_a, pt_a = run(async_mode=True)
        assert ok_a == ok_s == 40
        assert err_a < 0.06, f"async ATE {err_a:.4f} (sync {err_s:.4f})"
        # map must still grow under async mapping
        assert kf_a >= 2
        assert pt_a > 400

    def test_shutdown_idempotent(self):
        cfg = SLAMConfig(cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
                         max_keyframes=32, max_points=4096,
                         local_point_cap=1024, async_mapping=True)
        system = SLAMSystem(cfg, Sensor.RGBD)
        system.shutdown()
        system.shutdown()

    def test_async_is_default(self):
        """The reference spawns the mapping/loop threads unconditionally
        (System.cc:97-112); async is our default architecture too."""
        assert SLAMConfig(cam=CAM).async_mapping
        system = SLAMSystem(SLAMConfig(
            cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
            max_keyframes=32, max_points=4096, local_point_cap=1024),
            Sensor.RGBD)
        assert system.mapping_worker is not None
        system.shutdown()


class TestAsyncRaces:
    def test_tracker_races_worker_with_async_gba(self):
        """Aggressive keyframe cadence + async GBA landing mid-stream: the
        tracker keeps consuming map snapshots while the worker mutates the
        map and a GBA thread applies corrections. Asserts no torn state:
        every valid point has a live reference KF, kf_pt only points at
        valid points, device-mirror generations are monotone, and the
        trajectory stays sane."""
        from orbslam2_tpu.place.pretrained import get_default_vocabulary
        seq = SyntheticSequence(CAM, n_frames=100, trajectory="panorama",
                                seed=7, world="room")
        cfg = SLAMConfig(
            cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
            th_depth=4.0, max_keyframes=96, max_points=16384,
            local_point_cap=2048, max_frames_between_kf=5,
            min_init_features=300, force_kf_every=3, async_mapping=True)
        system = SLAMSystem(cfg, Sensor.RGBD,
                            vocabulary=get_default_vocabulary())
        system.loop_closer.cfg.consistency_threshold = 2
        system.loop_closer.cfg.async_gba = True
        gens = []
        ok = 0
        for i in range(seq.n_frames):
            # sustainable input cadence: the reference mains throttle to
            # the dataset rate (sleep-to-timestamp, mono_tum.cc) so the
            # mapping thread keeps pace; an unthrottled CPU loop outruns
            # the worker, starves the map of keyframes, and loses tracking
            # regardless of concurrency correctness. Racing stays real:
            # the worker/GBA run concurrently whenever the queue is short.
            t0 = time.time()
            while (system.mapping_worker.queue_size() >= 2
                   and time.time() - t0 < 10.0):
                time.sleep(0.01)
            gray, depth = seq.render(i)
            tcw = system.track_rgbd(gray, depth, i / seq.fps)
            ok += tcw is not None
            gens.append(system.map.pt_dirty_gen)
            if i % 10 == 0:
                # consistency snapshot under the map lock, mid-race
                with system.tracker.map_lock:
                    m = system.map
                    obs = m.kf_pt[m.kf_valid]
                    live_obs = obs[obs >= 0]
                    assert m.pt_valid[live_obs].all(), \
                        "keyframe observation points at a dead point"
                    assert np.isfinite(m.kf_pose[m.kf_valid]).all()
                    assert np.isfinite(m.pt_pos[m.pt_valid]).all()
        system.wait_mapping_idle()
        system.loop_closer.wait_gba()
        assert ok >= seq.n_frames - 2
        assert system.loop_closer.n_loops_closed >= 1
        assert system.loop_closer.n_gba_applied + \
            system.loop_closer.n_gba_superseded >= 1
        # mirror generations are strictly monotone (no stale-mirror reuse)
        assert all(b >= a for a, b in zip(gens, gens[1:]))
        est = system.tracker.full_trajectory_twc()
        gt = np.stack([np.linalg.inv(seq.poses[i])
                       for i in range(seq.n_frames)])
        assert ate_rmse(est, gt) < 0.15
        system.shutdown()


class TestMonoAsyncMapping:
    def test_mono_async_at_sustainable_cadence(self):
        """mono_async_mapping=True queues mono keyframes to the worker
        like the reference (Tracking.cc:834-835). At a sustainable feed
        rate (drive gated on worker IDLE — queue-empty is NOT enough,
        the worker may be mid-stage) this matches inline accuracy:
        measured circuit ATE sync {0.080, 0.027, 0.080} vs async
        {0.046, 0.045, 0.064} over seeds 5/7/9. Max-rate ungated feeds
        starve the map (ATE 1.17, 63/160 lost) — that regime keeps the
        inline default."""
        cfg = SLAMConfig(cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
                         max_keyframes=96, max_points=16384,
                         local_point_cap=2048, max_frames_between_kf=8,
                         mono_async_mapping=True)
        system = SLAMSystem(cfg, Sensor.MONOCULAR)
        assert system.mapping_worker.sync_mapping is False
        seq = SyntheticSequence(CAM, n_frames=160, trajectory="circuit",
                                seed=5, world="room")
        lost = 0
        first_ok = None
        for i in range(seq.n_frames):
            system.wait_mapping_idle(timeout=20.0)
            gray, _ = seq.render(i)
            ok = system.track_monocular(gray, i / seq.fps)
            if ok is not None and first_ok is None:
                first_ok = i
            if ok is None and first_ok is not None:
                lost += 1
        system.wait_mapping_idle()
        gt = np.stack([np.linalg.inv(seq.poses[i])
                       for i in range(seq.n_frames)])
        est = system.tracker.full_trajectory_twc()
        keep = ~system.tracker.trajectory_lost_mask()
        ate = float(ate_rmse(est[keep], gt[keep], with_scale=True))
        system.shutdown()
        assert lost <= 3, f"{lost} frames lost"
        assert ate < 0.10, f"mono async ATE {ate:.3f}"


class TestBatchedFetch:
    """cfg.fetch_batch > 1: K frames' results fetched in ONE round trip
    (the relay serializes round trips, so a deeper pipeline of per-frame
    fetches cannot help — only fewer round trips can). Bookkeeping lags
    up to 2K-1 frames; quality must stay equivalent."""

    def _run(self, k: int, n_frames: int = 40):
        seq = SyntheticSequence(CAM, n_frames=n_frames,
                                trajectory="forward", seed=1)
        cfg = SLAMConfig(
            cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
            th_depth=4.0, max_keyframes=64, max_points=8192,
            local_point_cap=2048, max_frames_between_kf=10,
            min_init_features=300, async_mapping=True, fetch_batch=k)
        system = SLAMSystem(cfg, Sensor.RGBD)
        ok = 0
        for i in range(seq.n_frames):
            gray, depth = seq.render(i)
            tcw = system.track_rgbd(gray, depth, i / seq.fps)
            ok += tcw is not None
        system.wait_mapping_idle()
        est = system.tracker.full_trajectory_twc()
        gt = np.stack([np.linalg.inv(seq.poses[i])
                       for i in range(seq.n_frames)])
        err = ate_rmse(est, gt)
        n_kf = system.map.n_keyframes()
        system.shutdown()
        return ok, err, n_kf

    def test_batched_fetch_matches_unbatched_quality(self):
        # measured baseline: K=1/2/4 -> ATE 0.0079/0.0104/0.0095 (the lag
        # shifts keyframe cadence slightly; quality is equivalent)
        ok1, err1, kf1 = self._run(1)
        ok4, err4, kf4 = self._run(4)
        assert ok4 == ok1 == 40, f"tracked {ok4} vs {ok1} at fetch_batch=4"
        assert err4 < max(2.0 * err1, 0.03), \
            f"ATE {err4:.4f} vs {err1:.4f} at fetch_batch=4"
        assert kf4 >= 2

    def test_batched_fetch_savers_flush(self):
        """Trajectory reads mid-stream flush the in-flight batch: every
        tracked frame must have an entry even with 7 frames in flight."""
        seq = SyntheticSequence(CAM, n_frames=25, trajectory="forward",
                                seed=1)
        cfg = SLAMConfig(
            cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
            th_depth=4.0, max_keyframes=64, max_points=8192,
            local_point_cap=2048, max_frames_between_kf=10,
            min_init_features=300, async_mapping=True, fetch_batch=4)
        system = SLAMSystem(cfg, Sensor.RGBD)
        for i in range(seq.n_frames):
            gray, depth = seq.render(i)
            system.track_rgbd(gray, depth, i / seq.fps)
        est = system.tracker.full_trajectory_twc()
        assert est.shape[0] == seq.n_frames
        system.shutdown()
