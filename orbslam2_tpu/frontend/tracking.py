"""Tracking front-end: per-frame pose estimation state machine.

Re-design of the reference Tracking thread (/root/reference/src/Tracking.cc).
The structure mirrors Track() (Tracking.cc:290-559): initialization ->
motion-model / reference-KF tracking -> local-map tracking -> keyframe
decision; but every per-point loop is a batched device kernel
(frontend/kernels.py) and the map is a functional array snapshot instead of
a mutex-guarded pointer graph.

Round-1 scope: RGB-D and stereo-from-depth pipelines with synchronous local
mapping; relocalization and monocular init land with the place-recognition
milestone.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.backend import pose_opt
from orbslam2_tpu.frontend import frame as frame_mod
from orbslam2_tpu.frontend import kernels
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.ops.orb import ORBConfig, ORBExtractor
from orbslam2_tpu.slammap import covisibility
from orbslam2_tpu.slammap.mapstate import MapCapacity, MapState


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclasses.dataclass
class SLAMConfig:
    cam: PinholeCamera
    orb: ORBConfig = dataclasses.field(default_factory=ORBConfig)
    th_depth: float = 3.0           # meters; reference mThDepth = baseline*ThDepth
    max_keyframes: int = 256
    max_points: int = 16384
    local_point_cap: int = 4096
    min_frames_between_kf: int = 0  # mMinFrames (Tracking.cc:1219)
    max_frames_between_kf: int = 30  # mMaxFrames = fps
    min_init_features: int = 500    # stereo/RGBD init gate (Tracking.cc:565)
    max_new_points_per_kf: int = 100  # close-point budget (Tracking.cc:1382)
    localization_only: bool = False
    # run local mapping + loop closing on a background worker thread
    # (reference thread architecture); False = synchronous per keyframe
    # background mapping/loop-closing worker thread — the reference's
    # default architecture (System.cc:97-112 spawns the threads
    # unconditionally); False runs mapping inline per keyframe
    async_mapping: bool = True
    # testing/benchmark hook: unconditionally insert a keyframe every N
    # frames (None = reference keyframe-decision logic only)
    force_kf_every: Optional[int] = None
    # collect per-stage wall-clock stats in tracker.stats (utils/profiling)
    profile_stages: bool = False
    # keep the point arrays device-resident (slammap/device_map) and gather
    # local-map rows on device; False = re-stage gathered rows per frame
    device_local_map: bool = True
    # steady-state frames run ONE device program (build + motion-model +
    # local-map + both pose optimizations) with ONE fetch
    # (kernels.fused_frame_step); False = two-program path per frame
    fused_frame: bool = True
    # monocular mapping placement. False (default): triangulation runs
    # INLINE at keyframe insertion — rate-robust, since triangulation is
    # mono's only point source and a max-rate feed starves the map behind
    # a busy worker (measured: ATE 1.17, 63/160 frames lost ungated).
    # True: keyframes queue to the mapping worker like the reference's
    # mono path (Tracking.cc:834-835) — at SUSTAINABLE feed rates (the
    # reference mains' sleep-to-timestamp; drive gated on worker idle)
    # this matches or beats inline accuracy (measured circuit ATE
    # sync {0.080, 0.027, 0.080} vs async {0.046, 0.045, 0.064} over
    # seeds 5/7/9) and removes the per-keyframe latency spike from the
    # tracker thread. Use for live/real-time deployments.
    mono_async_mapping: bool = False
    # overlap the frame's result fetch with the NEXT frame's dispatch: the
    # fused step for frame i+1 chains off frame i's still-on-device pose /
    # keypoints / associations, and frame i's results are fetched on a
    # background thread and applied when frame i+1 arrives (one-frame-lag
    # bookkeeping; state transitions fall back to a synchronous re-track).
    # Removes the blocking per-frame round trip from the critical path.
    pipelined_fetch: bool = True
    # frames per fetch ROUND TRIP in pipelined mode. The relay serializes
    # round trips (measured: joining a 1-frame-lag fetch still waits a
    # full ~25 ms rt regardless of pipeline depth), but ONE device_get
    # over K frames' target tuples costs a single round trip (measured
    # 26/26/27/28 ms for K=1/2/4/8 -> 3.7 ms/frame at K=8). K > 1
    # therefore batches K consecutive frames' results into one fetch,
    # double-buffered: batch N's fetch rides under batch N+1's dispatches.
    # Host bookkeeping (trajectory, keyframe decision, loss handling)
    # lags up to 2K-1 frames; state transitions re-track the affected
    # frames synchronously. Worth it only on high-latency links (remote
    # TPU); on PCIe hosts fetches are microseconds — keep 1.
    fetch_batch: int = 1


@dataclasses.dataclass
class FrameTrajectoryEntry:
    """Relative-pose bookkeeping for trajectory export, mirroring
    mlRelativeFramePoses / mlpReferences (Tracking.h:108-111)."""
    tcr: np.ndarray       # frame pose relative to its reference keyframe
    ref_kf: int
    ref_order: int        # insertion order of the ref KF (survives slot reuse)
    timestamp: float
    lost: bool


class Tracker:
    def __init__(self, config: SLAMConfig, map_state: Optional[MapState] = None,
                 local_mapper=None):
        self.cfg = config
        self.cam = config.cam
        self.extractor = ORBExtractor(config.orb, (config.cam.height, config.cam.width))
        import jax
        self._extract_jit = jax.jit(self.extractor.__call__)
        self.map = map_state or MapState(MapCapacity(
            config.max_keyframes, config.max_points, self.extractor.n_total))
        self.local_mapper = local_mapper  # set by System; called per new KF
        self.state = TrackingState.NO_IMAGES_YET
        self.last_frame: Optional[frame_mod.Frame] = None
        self.velocity: Optional[np.ndarray] = None   # Tcl: last->current
        self.ref_kf: int = -1
        self.last_kf_frame_id: int = -1
        self.frame_counter = 0
        self.trajectory: list[FrameTrajectoryEntry] = []
        self.matches_inliers = 0
        self._covis_w: Optional[np.ndarray] = None
        self.last_reloc_frame_id: int = -1000000
        self.is_mono = False
        # localization-mode VO state (mbVO, Tracking.h:104): True when the
        # frame tracks <10 real map points and survives on temporal points
        self.mb_vo = False
        self._map_inliers = 0
        self._init_ref: Optional[frame_mod.Frame] = None
        # place-recognition hooks (set by SLAMSystem when a vocabulary exists)
        self.vocabulary = None
        self.kfdb = None
        self.loop_closer = None
        # fused-frame state: local candidate selection computed from the
        # PREVIOUS frame (one-frame lag removes the mid-frame host round
        # trip) and the device-resident carry of last frame's associations
        self._local_ids: Optional[np.ndarray] = None   # [cap] int32 padded
        self._local_sel: Optional[np.ndarray] = None   # [cap] bool
        self._local_pts: Optional[np.ndarray] = None   # [n_local] int64
        self._selection_fresh = False  # set when a classic-path frame just
        # computed the selection (skip the end-of-frame recompute)
        self._last_pid_dev = None                      # device [N] int32
        # pipelined-fetch state: `_pending` holds dispatched frames whose
        # batch fetch has not been submitted yet (at most fetch_batch-1);
        # `_inflight` is the one (batch, future) whose single batched
        # device_get runs on the background thread. The fetch pool has one
        # worker so fetch round trips stay FIFO.
        self._pending: list = []
        self._inflight: Optional[tuple] = None
        self._carry_wrong = False  # apply found stale ids / took a fallback
        # optional hook: called as (timestamp, tcw|None) once per APPLIED
        # frame (see _record_trajectory) — the solved-pose stream for
        # consumers like the ROS pose topic
        self.applied_pose_cb = None
        import concurrent.futures
        self._fetch_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="frame-fetch")
        # async orchestration (set by SLAMSystem when async_mapping is on)
        import threading
        self.map_lock = threading.RLock()
        self.mapping_worker = None
        from orbslam2_tpu.utils.profiling import StageTimer
        self.stats = StageTimer(enabled=config.profile_stages)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def track_rgbd(self, gray: np.ndarray, depth: np.ndarray, timestamp: float) -> Optional[np.ndarray]:
        return self._track_images("rgbd", (gray, depth), timestamp)

    def track_stereo(self, left: np.ndarray, right: np.ndarray,
                     timestamp: float) -> Optional[np.ndarray]:
        return self._track_images("stereo", (left, right), timestamp)

    def track_mono(self, gray: np.ndarray, timestamp: float) -> Optional[np.ndarray]:
        self.is_mono = True
        return self._track_images("mono", (gray,), timestamp)

    # ------------------------------------------------------------------
    def _build_frame(self, kind: str, imgs, timestamp: float) -> frame_mod.Frame:
        with self.stats.stage("frame_build"):
            if kind == "rgbd":
                fr = frame_mod.build_frame_rgbd(
                    self.frame_counter, timestamp, imgs[0], imgs[1],
                    self.extractor, self.cam, extract_fn=self._extract_jit)
            elif kind == "stereo":
                fr = frame_mod.build_frame_stereo(
                    self.frame_counter, timestamp, imgs[0], imgs[1],
                    self.extractor, self.cam, extract_fn=self._extract_jit,
                    scale_factor=self.cfg.orb.scale_factor)
            else:
                fr = frame_mod.build_frame_mono(
                    self.frame_counter, timestamp, imgs[0], self.extractor,
                    self.cam, extract_fn=self._extract_jit)
        self.frame_counter += 1
        return fr

    # ------------------------------------------------------------------
    # main state machine (Tracking::Track, Tracking.cc:290-559)
    # ------------------------------------------------------------------
    def _track_images(self, kind: str, imgs, timestamp: float
                      ) -> Optional[np.ndarray]:
        # The fused steady-state path manages its own lock scope: host
        # staging and result application run under the map lock, but the
        # device dispatch + fetch (the bulk of the frame's wall clock
        # through a high-latency link) runs UNLOCKED so mapping-worker
        # stages interleave with in-flight frames. This mirrors the
        # reference's actual contention profile: Tracking::Track holds
        # mMutexMapUpdate (Tracking.cc:299), but the expensive per-frame
        # work it serializes against is only the BA write-backs and loop
        # corrections — guarded here by the correction_gen rerun and the
        # pt_stamp slot-reuse validation in _track_fused.
        with self.map_lock:
            fused = (self.cfg.fused_frame and self.state == TrackingState.OK
                     and self.velocity is not None
                     and not self.cfg.localization_only
                     and self._local_ids is not None)
        if fused:
            return self._track_fused(kind, imgs, timestamp)
        # classic path (init, reloc, localization mode, motion-model
        # fallback): apply any in-flight pipelined frame first (ordering),
        # then a coarse whole-frame lock, like the reference's
        # mMutexMapUpdate hold across Track() (Tracking.cc:299)
        self.flush_frames()
        with self.map_lock:
            fr = self._build_frame(kind, imgs, timestamp)
            return self._track_locked(fr)

    def _track(self, fr: frame_mod.Frame) -> Optional[np.ndarray]:
        with self.map_lock:
            return self._track_locked(fr)

    def _track_locked(self, fr: frame_mod.Frame) -> Optional[np.ndarray]:
        # any classic-path frame invalidates the fused device carry (its
        # associations live in fr.pt_ids on the host)
        self._last_pid_dev = None
        if self.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            self.state = TrackingState.NOT_INITIALIZED
            if self.is_mono:
                ok = self._monocular_initialization(fr)
            else:
                ok = self._stereo_initialization(fr)
            if ok:
                self.state = TrackingState.OK
            self._record_trajectory(fr, lost=not ok)
            self.last_frame = fr
            return fr.tcw.copy() if ok else None

        ok = False
        if self.state == TrackingState.OK:
            self._update_last_frame()
            with self.stats.stage("initial_track"):
                if not self.cfg.localization_only:
                    if self.velocity is not None:
                        ok = self._track_with_motion_model(fr)
                    if not ok:
                        ok = self._track_reference_keyframe(fr)
                else:
                    ok = self._track_localization_mode(fr)
        else:
            with self.stats.stage("relocalize"):
                ok = self._relocalize(fr)

        if ok and not self.cfg.localization_only:
            with self.stats.stage("local_map"):
                ok = self._track_local_map(fr)
        elif ok and not self.mb_vo:
            # localization mode with enough map-point matches: refine
            # against the local map (Tracking.cc:413-424); in VO mode
            # (mb_vo) the local map is skipped entirely
            ok = self._track_local_map(fr)

        return self._finish_frame(fr, ok)

    # ------------------------------------------------------------------
    def _finish_frame(self, fr: frame_mod.Frame, ok: bool
                      ) -> Optional[np.ndarray]:
        """Shared frame epilogue: state/velocity update, keyframe decision,
        loss handling, trajectory bookkeeping (Tracking.cc:462-559)."""
        if ok:
            self.state = TrackingState.OK
            if self.last_frame is not None:
                self.velocity = fr.tcw @ np.linalg.inv(self.last_frame.tcw)
            if not self.cfg.localization_only and self._need_new_keyframe(fr):
                with self.stats.stage("new_keyframe"):
                    self._create_new_keyframe(fr)
            if self.cfg.fused_frame and not self.cfg.localization_only:
                if self._selection_fresh:
                    self._selection_fresh = False
                else:
                    with self.stats.stage("local_select"):
                        self._refresh_local_selection(fr)
        else:
            self.state = TrackingState.LOST
            self.velocity = None
            self._last_pid_dev = None
            # auto-reset when lost right after initialization
            # (Tracking.cc:526-533: <= 5 keyframes in the map)
            if self.map.n_keyframes() <= 5 and not self.cfg.localization_only:
                self._record_trajectory(fr, lost=True)
                self.last_frame = fr
                self.reset()
                return None

        self._record_trajectory(fr, lost=not ok)
        self.last_frame = fr
        return fr.tcw.copy() if ok else None

    # ------------------------------------------------------------------
    # fused whole-frame path: ONE device program + ONE fetch per frame
    # ------------------------------------------------------------------
    def _refresh_local_selection(self, fr: frame_mod.Frame) -> None:
        """Select the local-map candidates for the NEXT frame from this
        frame's associations (UpdateLocalKeyFrames/UpdateLocalPoints,
        Tracking.cc:1490-1614, evaluated one frame early — covisibility
        changes per keyframe event, not per frame)."""
        w = self._covis_w if self._covis_w is not None \
            else covisibility.weight_matrix(self.map)
        local_kfs, ref_kf = covisibility.local_keyframes(self.map, fr.pt_ids, w)
        if ref_kf >= 0:
            self.ref_kf = ref_kf
        pt_ids = covisibility.local_points(self.map, local_kfs)
        cap = self.cfg.local_point_cap
        pt_ids = pt_ids[:cap]
        n = len(pt_ids)
        ids = np.zeros(cap, np.int32)
        ids[:n] = pt_ids
        sel = np.zeros(cap, bool)
        sel[:n] = True
        self._local_ids, self._local_sel, self._local_pts = ids, sel, pt_ids

    def _track_fused(self, kind: str, imgs, timestamp: float
                     ) -> Optional[np.ndarray]:
        """Fused steady-state frame. In pipelined mode (cfg.pipelined_fetch)
        the frame is dispatched chained off the PREVIOUS frame's
        still-on-device outputs, its fetch runs on the background thread,
        and the previous frame's results are applied now — so the device
        round trip overlaps the next frame's dispatch instead of blocking
        the critical path. Host bookkeeping (trajectory, keyframe decision,
        loss handling) therefore lags one frame; state transitions discard
        the speculative dispatch and re-track synchronously."""
        with self.stats.stage("fused_step"):
            imgs_d = tuple(jnp.asarray(im, jnp.float32) for im in imgs)
            # backpressure: a saturated mapping worker (queue >= 3 — the
            # same threshold that blocks keyframe insertion,
            # Tracking.cc:1294) means the tracker is outrunning mapping.
            # Keep such frames SYNCHRONOUS so the fetch round trip
            # throttles the feed; otherwise an unthrottled offline drive
            # starves keyframe insertion through the reference's own
            # queue<3 rule until tracking dies (measured: 8-device CPU
            # twin, queue pinned at 3 for 10 frames, inliers 253 -> 30,
            # LOST; synchronous cadence keeps the queue < 3 throughout).
            # The reference's drives never hit this only because their
            # mains sleep to frame timestamps.
            pipelined = self.cfg.pipelined_fetch and (
                self.mapping_worker is None
                or self.mapping_worker.accept_keyframes())
            rec = self._fused_dispatch(kind, imgs_d, timestamp)
            self._pending.append(rec)
            k = max(1, self.cfg.fetch_batch) if pipelined else 1
            if len(self._pending) >= k:
                # the new batch stays DETACHED from self._inflight until
                # the previous batch has applied: a reset() fired during
                # that apply must not see (and discard) frames this call
                # still owns — it would double-append trajectory entries
                batch, self._pending = self._pending, []
                fut = self._submit_batch_fetch(batch)
                prev, self._inflight = self._inflight, None
                if prev is not None:
                    self._carry_wrong = False
                    kf0 = self.last_kf_frame_id
                    self._finish_batch(prev)
                    with self.map_lock:
                        chain_ok = (self.state == TrackingState.OK
                                    and self.velocity is not None
                                    and not self._carry_wrong
                                    and not self.cfg.localization_only
                                    and not (self.cfg.fetch_batch > 1
                                             and self.last_kf_frame_id
                                             != kf0))
                    if not chain_ok:
                        # the applied batch invalidated the submitted
                        # batch's premises (loss / fallback / stale
                        # carry): re-track its frames from the applied
                        # state (wasted device passes; rare)
                        fut.result()  # keep fetch-thread FIFO; discard
                        ret = None
                        for r in batch:
                            ret = self._retrack_sync(r)
                        return ret
                if not pipelined:
                    self._carry_wrong = False
                    return self._finish_batch((batch, fut))
                self._inflight = (batch, fut)
            # the frame's solved pose arrives with a later call; return
            # the motion-model prediction as the best current estimate
            with self.map_lock:
                return (self.velocity @ self.last_frame.tcw
                        ).astype(np.float32)

    # ------------------------------------------------------------------
    def _fused_dispatch(self, kind: str, imgs_d, timestamp: float,
                        frame_id: Optional[int] = None,
                        chain_off_pipe: bool = True) -> dict:
        """Stage a consistent snapshot under the map lock and dispatch the
        fused program. Returns the in-flight record (with its un-fetched
        device targets) consumed by _finish_batch/_apply_one.
        `chain_off_pipe=False` forces chaining off the applied host state
        (re-dispatches of invalidated frames: the pipeline holds NEWER
        frames, which would be the wrong chain parent)."""
        with self.map_lock:
            chain = None
            if chain_off_pipe:
                chain = (self._pending[-1] if self._pending
                         else (self._inflight[0][-1] if self._inflight
                               else None))
            if chain is None:
                self._update_last_frame()
                last = self.last_frame
                vel = np.asarray(self.velocity, np.float32)
                tcw_prev = np.asarray(last.tcw, np.float32)
                last_kp = last.kp
                last_pid = self._last_pid_dev
                if last_pid is None:
                    last_pid = last.pt_ids  # staged with the call (8 KB)
            else:
                # chain off the in-flight frame's device outputs; velocity
                # is one frame older (constant-velocity over two frames —
                # the search's widen fallback absorbs the extra error)
                vel = np.asarray(self.velocity, np.float32)
                tcw_prev = chain["out"].tcw
                last_kp = chain["out"].kp
                last_pid = chain["out"].pt_ids
            mir = self.map.device_mirror()
            corr_gen = self.map.correction_gen
            stamp_snap = self.map._pt_counter
            if frame_id is None:
                frame_id = self.frame_counter
                self.frame_counter += 1
            radius_mult = 3.0 \
                if frame_id - self.last_reloc_frame_id < 2 else 1.0
            local_ids, local_sel = self._local_ids, self._local_sel
            local_pts = self._local_pts
        # device dispatch + background fetch, UNLOCKED: mapping-worker
        # stages interleave here (the device mirror sync produces fresh
        # functional arrays, so the captured handles stay a snapshot)
        out = kernels.fused_frame_step(
            (kind, imgs_d), self.extractor, self.cam,
            self.cfg.orb.scale_factor, self.cfg.orb.n_levels,
            (vel, tcw_prev), last_kp, last_pid, local_ids,
            local_sel, np.float32(radius_mult),
            mir.pt_pos, mir.pt_desc, mir.pt_valid, mir.pt_normal,
            mir.pt_min_dist, mir.pt_max_dist)
        targets = (out.tcw, out.pt_ids, out.is_outlier, out.visible,
                   out.mm_matches, out.mm_inliers, out.n_inliers,
                   out.depth, out.ur)
        return dict(out=out, targets=targets, kind=kind, imgs_d=imgs_d,
                    timestamp=timestamp, frame_id=frame_id,
                    corr_gen=corr_gen, stamp_snap=stamp_snap,
                    local_pts=local_pts)

    def _submit_batch_fetch(self, batch: list):
        """ONE device_get over the whole batch's target tuples = ONE relay
        round trip regardless of batch size (measured: 26/26/27/28 ms for
        1/2/4/8 frames)."""
        targets = [r["targets"] for r in batch]
        return self._fetch_pool.submit(lambda: jax.device_get(targets))

    def _finish_batch(self, entry) -> Optional[np.ndarray]:
        """Join a batch's fetch and apply its frames in order. If an
        apply breaks the chain (loss, fallback path, stale carry, mode
        switch), the remaining frames' speculative results are premised
        on invalidated state — discard them and re-track each
        synchronously."""
        batch, fut = entry
        with self.stats.stage("fused_dev"):
            fetched_list = fut.result()
        ret = None
        broken = False
        kf0 = self.last_kf_frame_id
        for rec, fetched in zip(batch, fetched_list):
            if broken:
                ret = self._retrack_sync(rec)
                continue
            ret = self._apply_one(rec, fetched)
            with self.map_lock:
                # a keyframe spawned mid-batch adds map points the
                # remaining frames' speculative solves never saw; with a
                # multi-frame batch the staleness spans up to 2K-1 frames
                # — long enough for the inlier count to collapse below
                # the loss threshold before the rescue lands (measured:
                # auto-reset thrash on the shuttle drive at K=4).
                # Re-track the rest against the new map. K=1 keeps the
                # measured one-frame-staleness behavior.
                broken = (self.state != TrackingState.OK
                          or self.velocity is None
                          or self._carry_wrong
                          or self.cfg.localization_only
                          or (self.cfg.fetch_batch > 1
                              and self.last_kf_frame_id != kf0))
        return ret

    def _apply_one(self, rec: dict, fetched) -> Optional[np.ndarray]:
        """Apply one fetched frame. A loop correction / GBA apply that
        rebased the map mid-flight (the event the reference serializes
        with mMutexMapUpdate) voids the solved pose — re-track against
        the corrected state."""
        for _attempt in range(2):
            with self.map_lock:
                if self.map.correction_gen == rec["corr_gen"]:
                    return self._fused_apply(rec, fetched)
                self._last_pid_dev = None
                self._carry_wrong = True
            rec = self._fused_dispatch(rec["kind"], rec["imgs_d"],
                                       rec["timestamp"],
                                       frame_id=rec["frame_id"],
                                       chain_off_pipe=False)
            with self.stats.stage("fused_dev"):
                fetched = jax.device_get(rec["targets"])
        # two corrections in a row (pathological): classic path
        with self.map_lock:
            fr = self._build_frame(rec["kind"], rec["imgs_d"],
                                   rec["timestamp"])
            return self._track_locked(fr)

    def _retrack_sync(self, rec: dict) -> Optional[np.ndarray]:
        """Re-track a frame whose speculative dispatch was invalidated:
        fused re-dispatch from the now-current state when tracking is
        healthy, classic path otherwise."""
        with self.map_lock:
            classic = (self.state != TrackingState.OK
                       or self.velocity is None
                       or self.cfg.localization_only)
        if classic:
            with self.map_lock:
                fr = self._build_frame(rec["kind"], rec["imgs_d"],
                                       rec["timestamp"])
                return self._track_locked(fr)
        self._carry_wrong = False
        rec2 = self._fused_dispatch(rec["kind"], rec["imgs_d"],
                                    rec["timestamp"],
                                    frame_id=rec["frame_id"],
                                    chain_off_pipe=False)
        with self.stats.stage("fused_dev"):
            fetched = jax.device_get(rec2["targets"])
        return self._apply_one(rec2, fetched)

    def flush_frames(self) -> None:
        """Apply every in-flight pipelined frame (blocks on the batch
        fetch). Precedes any read of per-frame bookkeeping (trajectory,
        savers) and any classic-path frame."""
        entry, self._inflight = self._inflight, None
        pending, self._pending = self._pending, []
        kf0 = self.last_kf_frame_id
        if entry is not None:
            self._carry_wrong = False
            self._finish_batch(entry)
        if pending:
            with self.map_lock:
                chain_ok = (self.state == TrackingState.OK
                            and self.velocity is not None
                            and not self._carry_wrong
                            and not self.cfg.localization_only
                            and not (self.cfg.fetch_batch > 1
                                     and self.last_kf_frame_id != kf0))
            if entry is not None and not chain_ok:
                for rec in pending:
                    self._retrack_sync(rec)
            else:
                self._carry_wrong = False
                self._finish_batch((pending,
                                    self._submit_batch_fetch(pending)))

    def _fused_apply(self, rec: dict, fetched) -> Optional[np.ndarray]:
        """Host bookkeeping for a fused frame step (map lock held).
        Associations staged before mid-flight mapping mutations are
        re-validated: erased or re-allocated point slots (pt_stamp >=
        the staging snapshot) are dropped, matching the reference
        tracker's per-use isBad() checks (Tracking.cc:1100-1119)."""
        (tcw_h, pid_h, outl_h, vis_h, mm_m, mm_in, n_in, depth_h,
         ur_h) = fetched
        out = rec["out"]
        frame_id = rec["frame_id"]
        stamp_snap = rec["stamp_snap"]
        self._update_last_frame()
        fr = frame_mod.Frame(
            frame_id=frame_id, timestamp=rec["timestamp"], kp=out.kp,
            ur=out.ur, depth=out.depth,
            tcw=np.asarray(tcw_h, np.float32).copy(),
            pt_ids=np.full(out.kp.n, -1, np.int32),
            is_outlier=np.zeros(out.kp.n, bool))
        fr._host_depth = (depth_h, ur_h)

        if int(mm_m) < 20 or int(mm_in) < 10:
            # motion-model failure: reference-KF fallback on the classic
            # path (rare; costs the extra round trips only on these frames)
            self._last_pid_dev = None
            self._carry_wrong = True
            fr.tcw = (self.velocity @ self.last_frame.tcw).astype(np.float32)
            ok = self._track_reference_keyframe(fr)
            if ok:
                with self.stats.stage("local_map"):
                    ok = self._track_local_map(fr)
            return self._finish_frame(fr, ok)

        m = self.map
        pid = np.asarray(pid_h, np.int32).copy()
        has = pid >= 0
        safe = np.clip(pid, 0, m.cap.max_points - 1)
        stale = has & (~m.pt_valid[safe] | (m.pt_stamp[safe] >= stamp_snap))
        pid[stale] = -1
        fr.pt_ids = pid
        fr.is_outlier = np.asarray(outl_h).copy()
        fr.is_outlier[stale] = False
        self.matches_inliers = int(n_in)
        self._map_inliers = int((fr.pt_ids >= 0).sum())
        min_inliers = 30 if frame_id - self.last_reloc_frame_id > 30 else 50
        ok = int(n_in) >= min_inliers
        if ok:
            lp = rec["local_pts"]
            vis_ids = lp[vis_h[: len(lp)]]
            vis_ids = vis_ids[m.pt_valid[vis_ids]
                              & (m.pt_stamp[vis_ids] < stamp_snap)]
            m.increase_visible(vis_ids)
            m.increase_found(fr.pt_ids[fr.pt_ids >= 0])
            if stale.any():
                # the device carry holds the stale ids too
                self._last_pid_dev = None
                self._carry_wrong = True
            else:
                self._last_pid_dev = out.pt_ids  # device carry, next frame
        else:
            self._last_pid_dev = None
        return self._finish_frame(fr, ok)

    # ------------------------------------------------------------------
    # initialization (Tracking::StereoInitialization, Tracking.cc:562-614)
    # ------------------------------------------------------------------
    def _stereo_initialization(self, fr: frame_mod.Frame) -> bool:
        h = fr.host_kp()
        depth, valid = h.depth, h.valid
        n_usable = int(valid.sum())
        if n_usable < self.cfg.min_init_features:
            return False
        fr.tcw = np.eye(4, dtype=np.float32)
        kf = self._insert_keyframe(fr)
        # create a map point for every keypoint with positive depth
        # (one batched insertion; frame 0 camera frame == world frame)
        idx = np.where(valid & (depth > 0))[0]
        pts_cam = self.cam.backproject_np(h.xy[idx], depth[idx])
        new_pts = self.map.add_points_batch(pts_cam, h.desc[idx], kf,
                                            fr.frame_id)
        idx = idx[: len(new_pts)]
        self.map.kf_pt[kf, idx] = new_pts
        self.map.touch_obs()
        fr.pt_ids[idx] = new_pts
        self.map.update_point_descriptor_and_normal(
            new_pts, self.cfg.orb.scale_factor, self.cfg.orb.n_levels)
        self.ref_kf = kf
        self.last_kf_frame_id = fr.frame_id
        self._covis_w = covisibility.weight_matrix(self.map)
        if self.kfdb is not None:
            self.kfdb.add(kf, self._word_ids(fr))
        if self.local_mapper is not None:
            self.local_mapper.on_first_keyframe(kf)
        return True

    # ------------------------------------------------------------------
    # monocular initialization (Tracking::MonocularInitialization,
    # Tracking.cc:626-857 + CreateInitialMapMonocular:738)
    # ------------------------------------------------------------------
    def _monocular_initialization(self, fr: frame_mod.Frame) -> bool:
        n_kp = int(fr.host_kp().valid.sum())
        if self._init_ref is None:
            if n_kp > 100:
                self._init_ref = fr
            return False
        if n_kp <= 100:
            self._init_ref = None
            return False
        ref = self._init_ref
        # windowed search around the reference keypoint positions
        # (SearchForInitialization: radius 100, level 0, ratio 0.9)
        from orbslam2_tpu.ops import match as match_ops
        level0 = (ref.kp.octave == 0) & ref.kp.valid
        res = match_ops.windowed_match(
            ref.kp.xy, ref.kp.desc, level0,
            jnp.full((ref.n,), 100.0), jnp.zeros((ref.n,), jnp.int32),
            jnp.zeros((ref.n,), jnp.int32), fr.kp,
            max_dist=50, ratio=0.9)
        best_kp = np.asarray(res.best_kp)
        n_matches = int((best_kp >= 0).sum())
        if n_matches < 100:
            self._init_ref = None  # restart (Tracking.cc:660-688)
            return False

        from orbslam2_tpu.solvers.initializer import initialize_two_view
        uv2 = np.zeros((ref.n, 2), np.float32)
        sel = best_kp >= 0
        uv2[sel] = fr.host_kp().xy[best_kp[sel]]
        init = initialize_two_view(
            ref.kp.xy, jnp.asarray(uv2), jnp.asarray(sel),
            self.cam.k_matrix(), jax.random.PRNGKey(int(fr.frame_id)))
        if not bool(init.success):
            return False

        good = np.asarray(init.good)
        pts = np.asarray(init.points)
        r21 = np.asarray(init.r21)
        t21 = np.asarray(init.t21)

        # median-depth normalization (Tracking.cc:803-832)
        med = float(np.median(pts[good, 2]))
        if med <= 0 or good.sum() < 50:
            return False
        inv_med = 1.0 / med
        pts = pts * inv_med
        tcw2 = np.eye(4, dtype=np.float32)
        tcw2[:3, :3] = r21
        tcw2[:3, 3] = t21 * inv_med

        ref.tcw = np.eye(4, dtype=np.float32)
        fr.tcw = tcw2
        kf1 = self._insert_keyframe(ref)
        kf2 = self._insert_keyframe(fr)
        idx = np.where(good & sel)[0]
        new_pts = self.map.add_points_batch(
            pts[idx], np.asarray(ref.kp.desc)[idx], kf1, int(ref.frame_id))
        idx = idx[: len(new_pts)]
        self.map.kf_pt[kf1, idx] = new_pts
        self.map.kf_pt[kf2, best_kp[idx]] = new_pts
        self.map.touch_obs()
        ref.pt_ids[idx] = new_pts
        fr.pt_ids[best_kp[idx]] = new_pts
        if len(new_pts) < 50:
            self.map.clear()
            self._init_ref = None
            return False
        self.map.update_point_descriptor_and_normal(
            new_pts, self.cfg.orb.scale_factor, self.cfg.orb.n_levels)
        self._covis_w = covisibility.weight_matrix(self.map)
        covisibility.assign_spanning_parent(self.map, self._covis_w, kf2)

        # initial global BA (20 iters, Tracking.cc:803)
        if self.local_mapper is not None:
            self.local_mapper._local_ba(kf2, self._covis_w)
        if self.kfdb is not None:
            self.kfdb.add(kf1, self._word_ids(ref))
            self.kfdb.add(kf2, self._word_ids(fr))
        self.ref_kf = kf2
        self.last_kf_frame_id = fr.frame_id
        self._init_ref = None
        return True

    # ------------------------------------------------------------------
    def _update_last_frame(self) -> None:
        """Refresh last frame's pose from its reference keyframe and, in
        localization mode with depth, synthesize temporal "visual odometry"
        points for unmatched close keypoints
        (Tracking::UpdateLastFrame, Tracking.cc:949-1028)."""
        self._vo_mask = None
        self._vo_pos = None
        self._aux_pos = None
        self._aux_mask = None
        if not self.trajectory:
            return
        entry = self.trajectory[-1]
        if entry.ref_kf >= 0 and self.map.kf_valid[entry.ref_kf]:
            self.last_frame.tcw = entry.tcr @ self.map.kf_pose[entry.ref_kf]
        if not self.cfg.localization_only:
            return
        last = self.last_frame
        h = last.host_kp()
        depth, valid = h.depth, h.valid
        cand = np.where(valid & (depth > 0) & (last.pt_ids < 0))[0]
        if len(cand) == 0:
            return
        order = cand[np.argsort(depth[cand])]
        close = order[(depth[order] < self.cfg.th_depth)]
        take = order[:max(len(close), min(100, len(order)))]
        pc = self.cam.backproject_np(h.xy[take], depth[take])
        twc = np.linalg.inv(last.tcw)
        pw = pc @ twc[:3, :3].T + twc[:3, 3]
        self._vo_mask = np.zeros(last.n, bool)
        self._vo_mask[take] = True
        self._vo_pos = np.zeros((last.n, 3), np.float32)
        self._vo_pos[take] = pw

    # ------------------------------------------------------------------
    # localization-mode arbitration (Tracking.cc:354-412): with enough
    # map matches (not mb_vo) track normally; in VO mode run the motion
    # model AND relocalization in the same frame and prefer the reloc.
    # ------------------------------------------------------------------
    def _track_localization_mode(self, fr: frame_mod.Frame) -> bool:
        if not self.mb_vo:
            if self.velocity is not None:
                return self._track_with_motion_model(fr)
            return self._track_reference_keyframe(fr)
        ok_mm = False
        tcw_mm = pt_mm = out_mm = None
        mm_inliers = 0
        if self.velocity is not None:
            ok_mm = self._track_with_motion_model(fr)
            tcw_mm = fr.tcw.copy()
            pt_mm = fr.pt_ids.copy()
            out_mm = fr.is_outlier.copy()
            mm_inliers = self.matches_inliers
        ok_reloc = self._relocalize(fr)
        if ok_mm and not ok_reloc:
            fr.tcw = tcw_mm
            fr.pt_ids = pt_mm
            fr.is_outlier = out_mm
            self.matches_inliers = mm_inliers
            if self.mb_vo:
                # in pure-VO survival, matched map points count as found
                # (Tracking.cc:390-398)
                tracked = fr.pt_ids[(fr.pt_ids >= 0) & ~fr.is_outlier]
                self.map.increase_found(tracked)
        elif ok_reloc:
            self.mb_vo = False  # map tracking restored (Tracking.cc:404)
        return ok_reloc or ok_mm

    # ------------------------------------------------------------------
    # motion-model tracking (Tracking.cc:1036-1123)
    # ------------------------------------------------------------------
    def _track_with_motion_model(self, fr: frame_mod.Frame) -> bool:
        last = self.last_frame
        tcw_pred = (self.velocity @ last.tcw).astype(np.float32)
        last_pt = last.pt_ids
        has_map_pt = (last_pt >= 0) & self.map.pt_valid[np.maximum(last_pt, 0)]
        vo = getattr(self, "_vo_mask", None)
        has_pt = has_map_pt if vo is None else (has_map_pt | vo)
        if has_pt.sum() < 10:
            return False
        pos = np.zeros((last.n, 3), np.float32)
        pos[has_map_pt] = self.map.pt_pos[last_pt[has_map_pt]]
        if vo is not None:
            only_vo = vo & ~has_map_pt
            pos[only_vo] = self._vo_pos[only_vo]

        # fused device step: search (with conditional widen), observation
        # staging, and robust pose LM in ONE program + ONE fetch
        # numpy args go straight to the jitted kernel (one conversion in
        # the jit boundary; bench's relay meter counts the staged bytes)
        step = jax.device_get(kernels.motion_model_step(
            tcw_pred, pos, has_pt,
            last.kp.desc, last.kp.octave, last.kp.angle, fr.kp, fr.ur,
            self.cam, self.cfg.orb.scale_factor, self.cfg.orb.n_levels))
        assoc = step.assoc
        if int(step.n_matches) < 20:
            return False

        fr.pt_ids[:] = -1
        m = assoc >= 0
        fr.pt_ids[m] = last_pt[assoc[m]]
        aux_pos = aux_mask = None
        if vo is not None:
            # matches landing on temporal VO points carry their own 3D
            # position instead of a map id
            aux_mask = np.zeros(fr.n, bool)
            aux_pos = np.zeros((fr.n, 3), np.float32)
            idx = np.where(m & (fr.pt_ids < 0))[0]
            idx = idx[vo[assoc[idx]]]
            aux_mask[idx] = True
            aux_pos[idx] = pos[assoc[idx]]
        fr.tcw = tcw_pred
        ok = self._apply_pose_result(fr, step, min_inliers=10)
        # keep the temporal-point associations for the local-map stage: the
        # reference's localization-mode mnMatchesInliers counts VO points
        # too (Tracking.cc:1158-1169, mbOnlyTracking branch)
        self._aux_pos = aux_pos
        self._aux_mask = aux_mask
        if self.cfg.localization_only:
            # mbVO bookkeeping (Tracking.cc:1100-1121): <10 *map*-point
            # inliers means we are doing visual odometry on temporal
            # points; survival needs >20 total inliers
            self.mb_vo = self._map_inliers < 10
            return self.matches_inliers > 20
        return ok

    # ------------------------------------------------------------------
    # reference-KF tracking (Tracking.cc:891-947)
    # ------------------------------------------------------------------
    def _track_reference_keyframe(self, fr: frame_mod.Frame) -> bool:
        kf = self.ref_kf
        if kf < 0 or not self.map.kf_valid[kf]:
            return False
        kf_pt = self.map.kf_pt[kf]
        q_valid = (kf_pt >= 0) & self.map.kf_kp_valid[kf]
        best_kp, _ = kernels.search_by_descriptor(
            jnp.asarray(self.map.kf_kp_desc[kf]), jnp.asarray(q_valid),
            jnp.asarray(self.map.kf_kp_angle[kf]), fr.kp, self.cam)
        best_kp = np.asarray(best_kp)  # [Q] -> current kp slot
        n_matches = int((best_kp >= 0).sum())
        if n_matches < 15:
            return False
        fr.pt_ids[:] = -1
        sel = best_kp >= 0  # targets unique (resolve_conflicts)
        fr.pt_ids[best_kp[sel]] = kf_pt[sel]
        if self.last_frame is not None:
            fr.tcw = self.last_frame.tcw.copy()
        else:  # e.g. first frame after a map load: start from the ref KF
            fr.tcw = self.map.kf_pose[kf].copy()
        return self._optimize_frame_pose(fr, min_inliers=10)

    # ------------------------------------------------------------------
    def reset(self) -> None:
        """Tracking::Reset (Tracking.cc:1815-1861): clear map, database and
        tracking state; trajectory bookkeeping survives for export (entries
        referencing cleared keyframes resolve to their last pose)."""
        entry, self._inflight = self._inflight, None
        pending, self._pending = self._pending, []
        for rec in (entry[0] if entry else []) + pending:
            # discard in-flight frames (their map is being cleared) but
            # keep one trajectory entry per tracked frame for the savers
            self.trajectory.append(FrameTrajectoryEntry(
                tcr=np.eye(4, dtype=np.float32), ref_kf=-1, ref_order=-1,
                timestamp=rec["timestamp"], lost=True))
        self.map.clear()
        if self.kfdb is not None:
            self.kfdb.__init__(self.kfdb.voc, self.cfg.max_keyframes)
        if self.loop_closer is not None:
            self.loop_closer.last_loop_kf_order = -10 ** 9
            self.loop_closer._consistent_groups = []
        if self.local_mapper is not None:
            self.local_mapper._recent.clear()
        self.state = TrackingState.NOT_INITIALIZED
        self.velocity = None
        self.ref_kf = -1
        self._init_ref = None
        self._covis_w = None
        self.mb_vo = False
        self._local_ids = self._local_sel = self._local_pts = None
        self._selection_fresh = False
        self._last_pid_dev = None

    # ------------------------------------------------------------------
    def _word_ids(self, fr: frame_mod.Frame) -> Optional[np.ndarray]:
        if self.vocabulary is None:
            return None
        return np.asarray(self.vocabulary.transform_packed(
            fr.kp.desc, fr.kp.valid))

    # ------------------------------------------------------------------
    # Relocalization (Tracking::Relocalization, Tracking.cc:1641-1812):
    # KFDB candidates -> descriptor matching -> EPnP RANSAC -> pose opt.
    # ------------------------------------------------------------------
    def _relocalize(self, fr: frame_mod.Frame) -> bool:
        if self.kfdb is None:
            # no vocabulary: single-candidate fallback via the reference KF
            fr.tcw = self.last_frame.tcw.copy() if self.last_frame is not None \
                else np.eye(4, dtype=np.float32)
            ok = self._track_reference_keyframe(fr)
            if ok:
                self.last_reloc_frame_id = fr.frame_id
            return ok

        from orbslam2_tpu.solvers.epnp import epnp_ransac
        wids = self._word_ids(fr)
        w = self._covis_w if self._covis_w is not None else covisibility.weight_matrix(self.map)
        candidates = self.kfdb.detect_reloc_candidates(wids, w)[:5]
        for cand in candidates:
            if not self.map.kf_valid[cand]:
                continue
            q_valid = (self.map.kf_pt[cand] >= 0) & self.map.kf_kp_valid[cand]
            best_kp, _ = kernels.search_by_descriptor(
                jnp.asarray(self.map.kf_kp_desc[cand]), jnp.asarray(q_valid),
                jnp.asarray(self.map.kf_kp_angle[cand]), fr.kp, self.cam,
                max_hamming=50, ratio=0.75)
            best_kp = np.asarray(best_kp)
            qs = np.where(best_kp >= 0)[0]
            if len(qs) < 15:
                continue
            cap = 512
            qs = qs[:cap]
            n = len(qs)
            pts = np.zeros((cap, 3), np.float32)
            uv = np.zeros((cap, 2), np.float32)
            sigma2 = np.ones(cap, np.float32)
            valid = np.zeros(cap, bool)
            pids = self.map.kf_pt[cand, qs]
            pts[:n] = self.map.pt_pos[pids]
            kp_idx = best_kp[qs]
            hk = fr.host_kp()
            uv[:n] = hk.xy[kp_idx]
            sigma2[:n] = self.cfg.orb.scale_factor ** (
                2.0 * hk.octave[kp_idx])
            valid[:n] = self.map.pt_valid[pids]
            res = epnp_ransac(
                jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(valid),
                jnp.asarray(sigma2), self.cam,
                jax.random.PRNGKey(fr.frame_id * 17 + int(cand)))
            if not bool(res.success):
                continue
            fr.tcw = np.asarray(res.tcw).astype(np.float32)
            fr.pt_ids[:] = -1
            inl = np.asarray(res.inliers)
            for j in np.where(inl[:n])[0]:
                fr.pt_ids[kp_idx[j]] = pids[j]
            # reference escalation protocol (Tracking.cc:1749-1803):
            # pose-opt -> if <50 inliers, widened SearchByProjection
            # (th=10, ORBdist=100) -> re-opt -> if 30<n<50, narrow pass
            # (th=3, ORBdist=64) -> final opt; accept ONLY at >=50 —
            # a pose supported by 10 BoW inliers alone is too easy to be
            # wrong (r3 verdict missing #4).
            if not self._optimize_frame_pose(fr, min_inliers=10):
                continue
            n_good = self.matches_inliers
            if n_good < 50:
                n_add = self._reloc_project_candidate(fr, cand, 3.0, 100)
                if n_good + n_add >= 50:
                    self._optimize_frame_pose(fr, min_inliers=1)
                    n_good = self.matches_inliers
                    if 30 < n_good < 50:
                        n_add = self._reloc_project_candidate(
                            fr, cand, 0.75, 64)
                        if n_good + n_add >= 50:
                            self._optimize_frame_pose(fr, min_inliers=1)
                            n_good = self.matches_inliers
            if n_good >= 50:
                self.last_reloc_frame_id = fr.frame_id
                self.ref_kf = int(cand)
                return True
        return False

    def _reloc_project_candidate(self, fr: frame_mod.Frame, cand: int,
                                 radius_mult: float,
                                 max_hamming: int) -> int:
        """SearchByProjection(F, KF, sFound, th, ORBdist)
        (/root/reference/src/ORBmatcher.cc reloc overload, used at
        Tracking.cc:1763/1777): project the candidate keyframe's map
        points into the frame with a widened window, matching only free
        keypoints and skipping already-associated points (sFound).
        Radius divergence (documented): the reference uses th*scale
        directly; this reuses the view-angle base (2.5/4.0 px) times
        `radius_mult`, so th=10 maps to radius_mult=3.0 (7.5-12 px) and
        th=3 to 0.75 (1.9-3 px). Returns the number of new associations.
        Shapes are the KF's fixed keypoint capacity — no per-candidate
        recompiles."""
        pids = self.map.kf_pt[cand]
        safe = np.clip(pids, 0, self.map.pt_pos.shape[0] - 1)
        valid = (pids >= 0) & self.map.kf_kp_valid[cand] \
            & self.map.pt_valid[safe]
        found = fr.pt_ids[fr.pt_ids >= 0]
        valid &= ~np.isin(pids, found)
        kp_taken = fr.pt_ids >= 0
        info, res = kernels.search_local_points(
            jnp.asarray(fr.tcw), jnp.asarray(self.map.pt_pos[safe]),
            jnp.asarray(self.map.pt_desc[safe]), jnp.asarray(valid),
            jnp.asarray(self.map.pt_normal[safe]),
            jnp.asarray(self.map.pt_min_dist[safe]),
            jnp.asarray(self.map.pt_max_dist[safe]),
            fr.kp, jnp.asarray(kp_taken), radius_mult, self.cam,
            self.cfg.orb.scale_factor, self.cfg.orb.n_levels,
            max_hamming=max_hamming)
        assoc = np.asarray(res.assoc)
        newly = (assoc >= 0) & ~kp_taken
        fr.pt_ids[newly] = pids[assoc[newly]]
        return int(newly.sum())

    # ------------------------------------------------------------------
    # local-map tracking (Tracking.cc:1125-1188, 1403-1614)
    # ------------------------------------------------------------------
    def _track_local_map(self, fr: frame_mod.Frame) -> bool:
        w = self._covis_w if self._covis_w is not None else covisibility.weight_matrix(self.map)
        local_kfs, ref_kf = covisibility.local_keyframes(self.map, fr.pt_ids, w)
        if ref_kf >= 0:
            self.ref_kf = ref_kf
        pt_ids = covisibility.local_points(self.map, local_kfs)
        cap = self.cfg.local_point_cap
        if len(pt_ids) > cap:
            pt_ids = pt_ids[:cap]
        n_local = len(pt_ids)
        # this IS the selection the next frame's fused step needs — store
        # it so _finish_frame skips an identical recompute (one-frame lag
        # either way); invalidated if this frame creates a keyframe
        sel_ids = np.zeros(cap, np.int32)
        sel_ids[:n_local] = pt_ids
        sel_all = np.zeros(cap, bool)
        sel_all[:n_local] = True
        self._local_ids, self._local_sel, self._local_pts = \
            sel_ids, sel_all, pt_ids
        self._selection_fresh = True
        # don't re-match points already associated by motion-model tracking
        already = np.isin(pt_ids, fr.pt_ids[fr.pt_ids >= 0])
        kp_taken = fr.pt_ids >= 0
        radius_mult = 3.0 if fr.frame_id - self.last_reloc_frame_id < 2 else 1.0

        # prior associations (motion model / reloc / localization-mode VO
        # points) keep their staged world positions through the second
        # pose optimization
        aux_pos = getattr(self, "_aux_pos", None) \
            if self.cfg.localization_only else None
        aux_mask = getattr(self, "_aux_mask", None) \
            if self.cfg.localization_only else None
        prior_mask = kp_taken.copy()
        prior_pos = np.zeros((fr.n, 3), np.float32)
        prior_pos[kp_taken] = self.map.pt_pos[fr.pt_ids[kp_taken]]
        if aux_mask is not None:
            sel_aux = aux_mask & ~prior_mask
            prior_mask |= sel_aux
            prior_pos[sel_aux] = aux_pos[sel_aux]

        min_inliers = 30 if fr.frame_id - self.last_reloc_frame_id > 30 else 50
        if self.cfg.device_local_map:
            # device-resident map: ship only the local id list; rows are
            # gathered on device from the synced mirror. Fused program:
            # projection search + staging + second pose optimization.
            mir = self.map.device_mirror()
            ids = np.zeros(cap, np.int32)
            ids[:n_local] = pt_ids
            sel = np.zeros(cap, bool)
            sel[:n_local] = ~already
            step, depth_h, ur_h = jax.device_get(kernels.local_map_step(
                fr.tcw, ids, sel,
                mir.pt_pos, mir.pt_desc, mir.pt_valid, mir.pt_normal,
                mir.pt_min_dist, mir.pt_max_dist,
                fr.kp, fr.ur, fr.depth, prior_pos,
                prior_mask, radius_mult, self.cam,
                self.cfg.orb.scale_factor, self.cfg.orb.n_levels))
            if fr._host is None and fr._host_depth is None:
                fr._host_depth = (depth_h, ur_h)
            assoc, visible = step.assoc, step.visible
        else:
            c = cap
            pos = np.zeros((c, 3), np.float32)
            desc = np.zeros((c, 8), np.uint32)
            valid = np.zeros(c, bool)
            normal = np.zeros((c, 3), np.float32)
            dmin = np.zeros(c, np.float32)
            dmax = np.zeros(c, np.float32)
            pos[:n_local] = self.map.pt_pos[pt_ids]
            desc[:n_local] = self.map.pt_desc[pt_ids]
            valid[:n_local] = True
            normal[:n_local] = self.map.pt_normal[pt_ids]
            dmin[:n_local] = self.map.pt_min_dist[pt_ids]
            dmax[:n_local] = self.map.pt_max_dist[pt_ids]
            valid[:n_local] &= ~already
            info, res = kernels.search_local_points(
                jnp.asarray(fr.tcw), jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(valid),
                jnp.asarray(normal), jnp.asarray(dmin), jnp.asarray(dmax),
                fr.kp, jnp.asarray(kp_taken), radius_mult, self.cam,
                self.cfg.orb.scale_factor, self.cfg.orb.n_levels)
            assoc = np.asarray(res.assoc)
            visible = np.asarray(info.visible)
            step = None

        newly = assoc >= 0
        fr.pt_ids[newly] = pt_ids[assoc[newly]]
        # visibility counters (SearchLocalPoints, Tracking.cc:1403-1483)
        self.map.increase_visible(pt_ids[visible[:n_local]])

        if step is not None:
            ok = self._apply_pose_result(fr, step, min_inliers)
        else:
            ok = self._optimize_frame_pose(fr, min_inliers,
                                           aux_pos=aux_pos, aux_mask=aux_mask)
        if ok:
            tracked = fr.pt_ids[(fr.pt_ids >= 0) & ~fr.is_outlier]
            self.map.increase_found(tracked)
        return ok

    # ------------------------------------------------------------------
    def _apply_pose_result(self, fr: frame_mod.Frame, step,
                           min_inliers: int) -> bool:
        """Host bookkeeping after a fused search+optimize device step
        (already device_get: numpy): outlier clearing (Tracking.cc:
        1100-1119), inlier counters, pose acceptance."""
        has_pt = fr.pt_ids >= 0
        inlier = step.inlier
        n_in = int(step.n_inliers)
        fr.is_outlier = has_pt & ~inlier
        fr.pt_ids[fr.is_outlier] = -1
        self.matches_inliers = n_in
        # inliers that are real map points (nmatchesMap, Tracking.cc:1104)
        self._map_inliers = int((fr.pt_ids >= 0).sum())
        if n_in < min_inliers:
            return False
        fr.tcw = np.asarray(step.tcw)
        return True

    # ------------------------------------------------------------------
    def _optimize_frame_pose(self, fr: frame_mod.Frame, min_inliers: int,
                             aux_pos: Optional[np.ndarray] = None,
                             aux_mask: Optional[np.ndarray] = None) -> bool:
        """aux_pos/aux_mask: per-slot world positions for observations that
        are not map points (localization-mode VO points)."""
        has_pt = fr.pt_ids >= 0
        used = has_pt if aux_mask is None else (has_pt | aux_mask)
        if used.sum() < 4:
            return False
        pos = np.zeros((fr.n, 3), np.float32)
        pos[has_pt] = self.map.pt_pos[fr.pt_ids[has_pt]]
        if aux_mask is not None:
            sel = aux_mask & ~has_pt
            pos[sel] = aux_pos[sel]
        obs = kernels.build_pose_obs_from_frame(
            fr.kp, fr.ur, jnp.asarray(pos), jnp.asarray(used),
            self.cfg.orb.scale_factor)
        tcw, inlier, n_in = pose_opt.pose_optimization(
            jnp.asarray(fr.tcw), obs, self.cam)
        n_in = int(n_in)
        inlier = np.asarray(inlier)
        fr.is_outlier = has_pt & ~inlier
        # drop outlier associations (reference clears them after pose opt,
        # Tracking.cc:1100-1119)
        fr.pt_ids[fr.is_outlier] = -1
        self.matches_inliers = n_in
        # inliers that are real map points (nmatchesMap, Tracking.cc:1104)
        self._map_inliers = int((fr.pt_ids >= 0).sum())
        if n_in < min_inliers:
            return False
        fr.tcw = np.asarray(tcw)
        return True

    # ------------------------------------------------------------------
    # keyframe decision (Tracking::NeedNewKeyFrame, Tracking.cc:1190-1300)
    # ------------------------------------------------------------------
    def _need_new_keyframe(self, fr: frame_mod.Frame) -> bool:
        n_kfs = self.map.n_keyframes()
        if n_kfs >= self.cfg.max_keyframes - 2:
            return False
        # bLocalMappingIdle (Tracking.cc:1222): the worker has drained its
        # queue and finished processing; in sync mode mapping always runs
        # inline before the next frame, so it is always "idle"
        mapping_idle = self.mapping_worker is None or self.mapping_worker.idle()
        if self.cfg.force_kf_every is not None:
            if self.mapping_worker is not None \
                    and not self.mapping_worker.accept_keyframes():
                return False
            return (fr.frame_id - self.last_kf_frame_id >= self.cfg.force_kf_every
                    and self.matches_inliers > 15)
        # reference tracked-point count in the reference keyframe
        min_obs = 3 if n_kfs > 2 else 2
        obs_count = self.map.point_obs_count()
        ref_pts = self.map.kf_pt[self.ref_kf]
        ref_tracked = int(((ref_pts >= 0) & (obs_count[np.maximum(ref_pts, 0)] >= min_obs)).sum())

        # close-point statistics (RGBD/stereo, Tracking.cc:1229-1247)
        depth, _ = fr.host_depth_ur()
        close = (depth > 0) & (depth < self.cfg.th_depth)
        tracked_close = int((close & (fr.pt_ids >= 0) & ~fr.is_outlier).sum())
        non_tracked_close = int((close & (fr.pt_ids < 0)).sum())
        need_close = tracked_close < 100 and non_tracked_close > 70

        frames_since_kf = fr.frame_id - self.last_kf_frame_id
        # conditions exactly as Tracking.cc:1249-1297
        c1a = frames_since_kf >= self.cfg.max_frames_between_kf
        c1b = frames_since_kf >= self.cfg.min_frames_between_kf and mapping_idle
        c1c = (not self.is_mono) and (
            self.matches_inliers < ref_tracked * 0.25 or need_close)
        # thRefRatio: 0.9 mono, 0.4 with <2 KFs, else 0.75 (Tracking.cc:1255-1266)
        if self.is_mono:
            th_ref = 0.9
        else:
            th_ref = 0.75 if n_kfs >= 2 else 0.4
        c2 = (self.matches_inliers < ref_tracked * th_ref or need_close) \
            and self.matches_inliers > 15
        if not ((c1a or c1b or c1c) and c2):
            return False
        if mapping_idle:
            return True
        # mapping busy: signal BA abort; stereo/RGB-D may queue up to 3
        # keyframes, monocular never queues (Tracking.cc:1277-1297)
        if self.local_mapper is not None:
            self.local_mapper.interrupt_ba = True
        if self.is_mono:
            return False
        return self.mapping_worker.queue_size() < 3

    # ------------------------------------------------------------------
    # keyframe creation (Tracking::CreateNewKeyFrame, Tracking.cc:1306-1389)
    # ------------------------------------------------------------------
    def _create_new_keyframe(self, fr: frame_mod.Frame) -> None:
        with self.stats.stage("kf_insert"):
            kf = self._insert_keyframe(fr)
        self.ref_kf = kf
        self.last_kf_frame_id = fr.frame_id
        # a keyframe changes the map (spawned points, covisibility): any
        # selection computed earlier this frame is stale
        self._selection_fresh = False
        # existing associations become observations (one scatter)
        obs_sel = (fr.pt_ids >= 0) & self.map.pt_valid[np.maximum(fr.pt_ids, 0)]
        self.map.kf_pt[kf, obs_sel] = fr.pt_ids[obs_sel]
        self.map.touch_obs()
        # RGBD/stereo: spawn points for the closest unmatched keypoints
        h = fr.host_kp()
        depth, valid = h.depth, h.valid
        candidates = np.where(valid & (depth > 0) & (fr.pt_ids < 0))[0]
        if len(candidates):
            with self.stats.stage("kf_new_points"):
                order = candidates[np.argsort(depth[candidates])]
                # spawn every close point, and far points only within the
                # budget (the reference's depth-sorted break,
                # Tracking.cc:1374-1386); depth-sorted order makes the
                # break equivalent to this filter
                take = order[(depth[order] <= self.cfg.th_depth)
                             | (np.arange(len(order))
                                < self.cfg.max_new_points_per_kf)]
                pts_cam = self.cam.backproject_np(h.xy[take], depth[take])
                twc = np.linalg.inv(fr.tcw)
                pts_w = pts_cam @ twc[:3, :3].T + twc[:3, 3]
                new_pts = self.map.add_points_batch(
                    pts_w.astype(np.float32), h.desc[take], kf, fr.frame_id)
                take = take[: len(new_pts)]
                self.map.kf_pt[kf, take] = new_pts
                self.map.touch_obs()
                fr.pt_ids[take] = new_pts
                # the device-side carry no longer matches fr.pt_ids
                self._last_pid_dev = None
                self.map.update_point_descriptor_and_normal(
                    new_pts, self.cfg.orb.scale_factor, self.cfg.orb.n_levels)
        with self.stats.stage("kf_covis"):
            self._covis_w = covisibility.weight_matrix(self.map)
            covisibility.assign_spanning_parent(self.map, self._covis_w, kf)
        wids = self._word_ids(fr) if self.vocabulary is not None else None
        if self.mapping_worker is not None:
            # async: hand the keyframe to the background worker
            with self.stats.stage("kf_handoff"):
                self.mapping_worker.insert_keyframe(kf, wids)
            if self.mapping_worker.sync_mapping:
                # monocular inline mapping just triangulated this
                # keyframe's points — the ONLY point source for mono. An
                # in-flight chained dispatch predates them: left to land,
                # its depleted inlier ratio re-fires the keyframe decision
                # and cascades keyframes (measured: 94 vs 71 KFs on the
                # mono circuit, cap hit, loop event missed). Mark the
                # carry wrong so the in-flight frame re-dispatches against
                # the post-triangulation map (one extra device pass per
                # keyframe).
                self._carry_wrong = True
            return
        if self.local_mapper is not None:
            self.local_mapper.process_keyframe(kf)
            self._covis_w = covisibility.weight_matrix(self.map)
        # place recognition: loop detection (adds to the KFDB) or plain add
        if wids is not None and self.map.kf_valid[kf]:
            if self.loop_closer is not None:
                if self.loop_closer.process_keyframe(kf, wids):
                    self._covis_w = covisibility.weight_matrix(self.map)
            elif self.kfdb is not None:
                self.kfdb.add(kf, wids)

    # ------------------------------------------------------------------
    def _insert_keyframe(self, fr: frame_mod.Frame) -> int:
        h = fr.host_kp()  # one batched fetch for all eight arrays
        return self.map.add_keyframe(
            pose=fr.tcw,
            timestamp=fr.timestamp,
            frame_id=fr.frame_id,
            kp_xy=h.xy,
            kp_octave=h.octave,
            kp_angle=h.angle,
            kp_response=h.response,
            kp_desc=h.desc,
            kp_valid=h.valid,
            kp_ur=h.ur,
            kp_depth=h.depth,
        )

    # ------------------------------------------------------------------
    def _record_trajectory(self, fr: frame_mod.Frame, lost: bool) -> None:
        # solved-pose hook (ROS pose topic, AR overlay): fires once per
        # APPLIED frame in order. In pipelined mode this lags the track_*
        # call by one frame — consumers that need the solved pose (not the
        # motion-model prediction the call returns for in-flight frames)
        # subscribe here; stamps stay frame-accurate
        if self.applied_pose_cb is not None:
            self.applied_pose_cb(fr.timestamp,
                                 None if lost else fr.tcw.copy())
        if self.ref_kf >= 0 and self.map.kf_valid[self.ref_kf]:
            tcr = fr.tcw @ np.linalg.inv(self.map.kf_pose[self.ref_kf])
            ref_order = int(self.map.kf_order[self.ref_kf])
        else:
            tcr = np.eye(4, dtype=np.float32)
            ref_order = -1
        self.trajectory.append(FrameTrajectoryEntry(
            tcr=tcr.astype(np.float32), ref_kf=self.ref_kf, ref_order=ref_order,
            timestamp=fr.timestamp, lost=lost))

    def full_trajectory_twc(self, wait: bool = True) -> np.ndarray:
        """Recover all frame poses through their reference keyframes,
        chaining through culled keyframes via stored relative poses
        (System::SaveTrajectoryKITTI logic, System.cc:426-506: one pose per
        frame, lost frames carried forward). For TUM export, which skips
        lost frames (System.cc:380-385), pair with `trajectory_lost_mask`.

        Drains the async mapping queue first and reads under the map lock:
        the reference requires Shutdown() before its savers (System.cc:
        353-356); self-synchronizing is strictly safer. Pass wait=False
        for a non-blocking snapshot (live viewer)."""
        if wait:
            self.flush_frames()
            if self.mapping_worker is not None:
                self.mapping_worker.wait_idle()
        with self.map_lock:
            return self._full_trajectory_twc_locked()

    def _full_trajectory_twc_locked(self) -> np.ndarray:
        out = []
        last = np.eye(4, dtype=np.float32)
        for e in self.trajectory:
            ref_pose = None
            if e.ref_kf >= 0:
                ref_pose = self.map.resolve_kf_pose(e.ref_kf, e.ref_order)
            if ref_pose is None:
                out.append(last)
                continue
            tcw = e.tcr @ ref_pose
            last = np.linalg.inv(tcw).astype(np.float32)
            out.append(last)
        return np.stack(out)

    def trajectory_lost_mask(self) -> np.ndarray:
        """[F] bool: frame was lost (mlbLost analogue, Tracking.h:111).
        The TUM saver drops these rows (System.cc:380-385)."""
        return np.array([e.lost for e in self.trajectory], bool)
