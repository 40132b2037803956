"""System facade: the public entry point of the framework.

Equivalent of the reference ORB_SLAM2::System (/root/reference/src/System.cc):
constructs the map, tracker and local mapper, exposes per-sensor track
calls, the SLAM/localization mode switch, reset, shutdown, and trajectory
savers. Threads are replaced by the synchronous/async orchestrator inside
the tracker (System.cc:92-112 thread spawns have no equivalent here by
design).
"""
from __future__ import annotations

import enum
from typing import Optional

import numpy as np

from orbslam2_tpu.frontend.local_mapping import LocalMapper, LocalMapperConfig
from orbslam2_tpu.frontend.tracking import SLAMConfig, Tracker, TrackingState
from orbslam2_tpu.io import trajectory as traj_io
from orbslam2_tpu.slammap.mapstate import MapCapacity, MapState


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2


class SLAMSystem:
    def __init__(self, config: SLAMConfig, sensor: Sensor, vocabulary=None):
        """`vocabulary`: an orbslam2_tpu.place.vocabulary.Vocabulary (or
        None to disable place recognition — loop closing and BoW
        relocalization need it, basic tracking does not). Mirrors the
        System(voc, settings, sensor, useViewer) constructor
        (/root/reference/src/System.cc:37)."""
        self.cfg = config
        self.sensor = sensor
        self.map = MapState(MapCapacity(
            config.max_keyframes, config.max_points,
            # total feature slots as produced by the extractor
            _n_features(config)))
        self.local_mapper = LocalMapper(
            self.map, config.cam,
            LocalMapperConfig(scale_factor=config.orb.scale_factor,
                              n_levels=config.orb.n_levels,
                              monocular=(sensor == Sensor.MONOCULAR)))
        self.local_mapper.stats.enabled = config.profile_stages
        self.vocabulary = vocabulary
        self.kfdb = None
        self.loop_closer = None
        if vocabulary is not None:
            from orbslam2_tpu.frontend.loop_closing import LoopCloser, LoopCloserConfig
            from orbslam2_tpu.slammap.keyframe_db import KeyFrameDatabase
            self.kfdb = KeyFrameDatabase(vocabulary, config.max_keyframes)
            self.loop_closer = LoopCloser(
                self.map, config.cam, self.kfdb,
                LoopCloserConfig(scale_factor=config.orb.scale_factor,
                                 n_levels=config.orb.n_levels,
                                 fix_scale=(sensor != Sensor.MONOCULAR),
                                 async_gba=config.async_mapping))
            self.local_mapper.kfdb = self.kfdb
        self.tracker = Tracker(config, self.map, self.local_mapper)
        # one shared map lock: tracker frames, mapping-stage write-backs,
        # and the GBA thread all serialize host-map mutation through it
        self.local_mapper.map_lock = self.tracker.map_lock
        if self.loop_closer is not None:
            # one map lock shared by tracking, mapping, and the GBA thread
            self.loop_closer.map_lock = self.tracker.map_lock
        self.tracker.vocabulary = vocabulary
        self.tracker.kfdb = self.kfdb
        self.tracker.loop_closer = self.loop_closer
        self.mapping_worker = None
        if config.async_mapping:
            from orbslam2_tpu.frontend.orchestrator import MappingWorker
            self.mapping_worker = MappingWorker(
                self.local_mapper, self.loop_closer, self.tracker.map_lock,
                sync_mapping=(sensor == Sensor.MONOCULAR
                              and not config.mono_async_mapping))
            self.tracker.mapping_worker = self.mapping_worker
        # join worker threads BEFORE the interpreter tears the XLA runtime
        # down: a daemon worker mid-device-call at exit aborts the process
        # ("FATAL: exception not rethrown" from pthread teardown inside
        # XLA). Registered per-system and weakly, so an un-shutdown system
        # (interactive sessions, tests) exits cleanly; explicit shutdown()
        # makes this a no-op.
        import atexit
        import weakref
        ref = weakref.ref(self)
        atexit.register(lambda: ref() is not None and ref().shutdown())

    # ------------------------------------------------------------------
    def track_rgbd(self, gray: np.ndarray, depth: np.ndarray, timestamp: float
                   ) -> Optional[np.ndarray]:
        """-> Tcw or None if tracking failed (System::TrackRGBD, System.cc:183)."""
        assert self.sensor == Sensor.RGBD
        return self.tracker.track_rgbd(gray, depth, timestamp)

    def track_monocular(self, gray: np.ndarray, timestamp: float) -> Optional[np.ndarray]:
        assert self.sensor == Sensor.MONOCULAR
        return self.tracker.track_mono(gray, timestamp)

    def track_stereo(self, left: np.ndarray, right: np.ndarray, timestamp: float
                     ) -> Optional[np.ndarray]:
        assert self.sensor == Sensor.STEREO
        return self.tracker.track_stereo(left, right, timestamp)

    # ------------------------------------------------------------------
    def activate_localization_mode(self) -> None:
        """System::ActivateLocalizationMode (System.cc:295): stop mapping,
        track only."""
        self.cfg.localization_only = True
        self.tracker.cfg.localization_only = True

    def deactivate_localization_mode(self) -> None:
        self.cfg.localization_only = False
        self.tracker.cfg.localization_only = False

    def reset(self) -> None:
        """System::Reset (System.cc:320, Tracking.cc:1815)."""
        self.wait_mapping_idle()
        with self.tracker.map_lock:
            self.tracker.reset()

    def shutdown(self) -> None:
        """System::Shutdown (System.cc:329): drain and join the workers
        (incl. a running global BA, System.cc:337-344)."""
        self.tracker.flush_frames()
        if self.mapping_worker is not None:
            self.mapping_worker.wait_idle()
            self.mapping_worker.stop()
            self.mapping_worker = None
            self.tracker.mapping_worker = None
        if self.loop_closer is not None:
            self.loop_closer.wait_gba()

    def wait_mapping_idle(self, timeout: float = 60.0) -> bool:
        """Block until background mapping has drained (useful before
        trajectory export or map save in async mode)."""
        ok = True
        if self.mapping_worker is not None:
            ok = self.mapping_worker.wait_idle(timeout)
        if self.loop_closer is not None:
            self.loop_closer.wait_gba(timeout)
        return ok

    # ------------------------------------------------------------------
    def tracking_state(self) -> TrackingState:
        return self.tracker.state

    def map_changed(self) -> int:
        return self.map.change_index

    def get_tracked_points(self) -> np.ndarray:
        lf = self.tracker.last_frame
        if lf is None:
            return np.zeros(0, np.int32)
        return lf.pt_ids[lf.pt_ids >= 0]

    # ------------------------------------------------------------------
    def global_bundle_adjust(self, iters: int = 10) -> None:
        """Full-map bundle adjustment (GlobalBundleAdjustemnt,
        /root/reference/src/Optimizer.cc:48): PCG Schur over every valid
        observation, first keyframe fixed."""
        self.tracker.flush_frames()
        self.wait_mapping_idle()
        with self.tracker.map_lock:
            ids = self.map.keyframe_ids()
            if len(ids) < 2:
                return
            from orbslam2_tpu.frontend.loop_closing import LoopCloser, LoopCloserConfig
            gba = LoopCloser.__new__(LoopCloser)
            gba.map = self.map
            gba.cam = self.cfg.cam
            gba.cfg = LoopCloserConfig(
                scale_factor=self.cfg.orb.scale_factor,
                n_levels=self.cfg.orb.n_levels)
            gba.map_lock = self.tracker.map_lock
            gba.full_ba_idx = 0
            gba.n_gba_applied = 0
            gba.n_gba_superseded = 0
            gba._gba_thread = None
            gba.request_global_ba(fixed_kf=int(ids[0]))
            self.map.change_index += 1

    def change_calibration(self, cam) -> None:
        """Tracking::ChangeCalibration (Tracking.cc:1863): swap camera
        intrinsics; takes effect from the next frame (kernels recompile
        for the new static camera)."""
        self.cfg.cam = cam
        self.tracker.cam = cam
        self.tracker.cfg.cam = cam
        self.local_mapper.cam = cam
        if self.loop_closer is not None:
            self.loop_closer.cam = cam

    def get_tracked_keypoints(self):
        """Undistorted keypoints of the last frame (GetTrackedKeyPointsUn,
        System.cc:516-524). -> (xy [N,2], tracked mask [N])."""
        lf = self.tracker.last_frame
        if lf is None:
            return np.zeros((0, 2), np.float32), np.zeros(0, bool)
        return np.asarray(lf.kp.xy), (lf.pt_ids >= 0) & ~lf.is_outlier

    def save_map(self, path: str) -> None:
        """Persist the full map (the reference leaves SaveMap as a TODO,
        System.h:115-117; array maps make it one compressed npz)."""
        self.tracker.flush_frames()
        self.map.save(path)

    def load_map(self, path: str) -> None:
        """Load a saved map and enter localization-friendly state: the
        tracker can relocalize against it (requires a vocabulary for
        KFDB-based relocalization)."""
        from orbslam2_tpu.slammap.mapstate import MapState
        loaded = MapState.load(path)
        # copy arrays into the existing shared MapState instance
        self.map.__dict__.update(loaded.__dict__)
        if self.kfdb is not None:
            for kf in self.map.keyframe_ids():
                wids = np.asarray(self.vocabulary.transform_packed(
                    self.map.kf_kp_desc[kf], self.map.kf_kp_valid[kf]))
                self.kfdb.add(int(kf), wids)
        from orbslam2_tpu.frontend.tracking import TrackingState
        self.tracker.state = TrackingState.LOST if self.map.n_keyframes() \
            else TrackingState.NO_IMAGES_YET

    def save_trajectory_tum(self, path: str) -> None:
        """Lost frames are skipped, matching the reference saver
        (System.cc:380-385: `if(*lbL) continue;`)."""
        twc = self.tracker.full_trajectory_twc()
        ts = np.array([e.timestamp for e in self.tracker.trajectory])
        keep = ~self.tracker.trajectory_lost_mask()
        traj_io.save_tum(path, ts[keep], twc[keep])

    def save_keyframe_trajectory_tum(self, path: str) -> None:
        ids = self.map.keyframe_ids()
        twc = np.stack([np.linalg.inv(self.map.kf_pose[k]) for k in ids]) \
            if len(ids) else np.zeros((0, 4, 4), np.float32)
        ts = self.map.kf_timestamp[ids]
        traj_io.save_tum(path, ts, twc)

    def save_trajectory_kitti(self, path: str) -> None:
        twc = self.tracker.full_trajectory_twc()
        traj_io.save_kitti(path, twc)


def _n_features(config: SLAMConfig) -> int:
    from orbslam2_tpu.ops.orb import ORBExtractor
    return ORBExtractor(config.orb, (config.cam.height, config.cam.width)).n_total
