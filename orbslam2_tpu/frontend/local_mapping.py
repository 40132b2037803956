"""Local mapping: keyframe processing, point culling, fusion, local BA.

Re-design of the reference LocalMapping thread
(/root/reference/src/LocalMapping.cc). Runs synchronously per inserted
keyframe in round 1 (the async dispatch orchestrator replaces the
usleep-poll thread loop, LocalMapping.cc:47-123, in a later milestone);
each stage is the batched-array equivalent of the reference stage:

- ProcessNewKeyFrame (cc:147): observation bookkeeping + stats refresh
- MapPointCulling (cc:195): found-ratio / observation-count gates
- CreateNewMapPoints (cc:237): RGB-D points spawn from depth at keyframe
  creation (Tracking.cc:1346-1386 path); epipolar triangulation for
  mono/stereo arrives with the monocular milestone
- SearchInNeighbors (cc:515): two-ring neighbor fusion via dense windowed
  matching + observation-count arbitration
- LocalBundleAdjustment -> backend.ba Schur LM on a fixed-capacity window
- KeyFrameCulling (cc:704): >=90%-redundant keyframes removed
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

_log = logging.getLogger("orbslam2_tpu")

from orbslam2_tpu.backend import ba
from orbslam2_tpu.frontend import kernels
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.ops.orb import Keypoints
from orbslam2_tpu.slammap import covisibility
from orbslam2_tpu.slammap.mapstate import MapState


def size_bucket(n: int, floor: int, growth: int = 4,
                cap: int | None = None) -> int:
    """Smallest padded capacity >= n from a geometric series: device
    programs compile per shape, so problem sizes quantize to a handful of
    buckets instead of one compile per keyframe. `cap` bounds the bucket
    (e.g. at the map capacity)."""
    b = floor
    while b < n:
        b *= growth
    if cap is not None:
        b = min(b, max(cap, floor))
    return b


@dataclasses.dataclass
class LocalMapperConfig:
    scale_factor: float = 1.2
    n_levels: int = 8
    # hard caps for the local-BA window — None (default) = unbounded: the
    # full first covisibility ring and every observation enter the problem
    # (Optimizer.cc:531-582 has no cap), padded to size buckets. An int
    # truncates WITH a logged warning (memory-constrained deployments).
    ba_max_cams: int | None = None
    ba_max_points: int | None = None
    ba_max_obs: int | None = None
    # candidate cap for fuse staging (device program width)
    fuse_max_points: int = 4096
    cull_found_ratio: float = 0.25   # MapPointCulling (LocalMapping.cc:212)
    cull_min_obs_age2: int = 3       # stereo/RGBD: >=3 obs within 2 KFs (cc:216)
    kf_cull_redundancy: float = 0.9  # KeyFrameCulling (cc:704)
    fuse_radius: float = 3.0         # Fuse search radius base (ORBmatcher.cc:898)
    triangulation_neighbors: int = 10  # 20 for mono (LocalMapping.cc:247)
    monocular: bool = False


def kf_keypoints(m: MapState, kf: int) -> Keypoints:
    """View a stored keyframe's features as a Keypoints struct."""
    return Keypoints(
        xy=jnp.asarray(m.kf_kp_xy[kf]),
        response=jnp.asarray(m.kf_kp_response[kf]),
        angle=jnp.asarray(m.kf_kp_angle[kf]),
        octave=jnp.asarray(m.kf_kp_octave[kf]),
        size=jnp.ones(m.cap.n_features, jnp.float32),
        desc=jnp.asarray(m.kf_kp_desc[kf]),
        valid=jnp.asarray(m.kf_kp_valid[kf]),
    )


class LocalMapper:
    def __init__(self, m: MapState, cam: PinholeCamera, cfg: LocalMapperConfig | None = None):
        self.map = m
        self.cam = cam
        self.cfg = cfg or LocalMapperConfig()
        # recent points under probation: pt_id -> kf order at creation
        self._recent: Dict[int, int] = {}
        self.interrupt_ba = False  # InterruptBA analogue (LocalMapping.cc:696)
        # CheckNewKeyFrames probe, wired by the async orchestrator: True
        # when more keyframes wait in the worker queue
        self.pending_fn = None
        self.kfdb = None  # set by SLAMSystem when place recognition is on
        from orbslam2_tpu.utils.profiling import StageTimer
        self.stats = StageTimer(enabled=False)  # enabled with profile_stages
        # map lock, shared with the tracker (SLAMSystem wires the tracker's
        # RLock in). The reference's LocalMapping thread holds the map
        # mutex only around host-state mutation, NOT across its solves —
        # local BA runs unlocked and takes mMutexMapUpdate just for the
        # write-back (Optimizer.cc:842-862, LocalMapping.cc:147-195). Each
        # stage here follows that discipline: snapshot/stage under the
        # lock, device program + fetch unlocked, apply under the lock with
        # re-validation. Under the synchronous (non-worker) path the
        # tracker's re-entrant lock makes these no-ops.
        import threading
        self.map_lock = threading.RLock()

    # ------------------------------------------------------------------
    def on_first_keyframe(self, kf: int) -> None:
        pass

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int, backlog: bool = False) -> None:
        """`backlog`: more keyframes are already queued behind this one —
        the tracker is outrunning mapping (only possible when input arrives
        faster than real time, e.g. offline max-rate drives). Triangulation
        and fusion then run atomically under the map lock, which throttles
        the tracker and lets mapping catch up — the same graceful
        degradation the reference gets from its AcceptKeyFrames gate; at
        sustainable cadence the optimistic fast path never blocks the
        tracker."""
        m = self.map
        with self.stats.stage("mp_culling"), self.map_lock:
            order = int(m.kf_order[kf])
            # register newly created points for probation
            for pid in np.unique(m.kf_pt[kf]):
                if pid >= 0 and pid not in self._recent \
                        and m.pt_first_kf[pid] == kf:
                    self._recent[pid] = order
            self._map_point_culling(order)
            w = covisibility.weight_matrix(m)
        # Triangulation and fusion apply association decisions (new point
        # pairs, merges) whose geometric validity was checked against the
        # staged snapshot — applying them against a map the tracker moved
        # on meanwhile merges distinct physical points and was measured to
        # collapse tracking (race bisect: unlocked fuse alone -> 18/100
        # frames lost, unlocked triangulate -> 2.8x ATE). They therefore
        # run OPTIMISTICALLY: snapshot + generation capture under the lock,
        # device solve unlocked, apply under the lock ONLY if the map's
        # generation counters prove nothing changed; on a conflict (a
        # keyframe landed mid-solve — rare at keyframe cadence) the stage
        # reruns atomically. The local-BA solve below runs unlocked
        # unconditionally (pose/point refinement is not associative), as
        # in the reference (Optimizer.cc:598 vs LocalMapping.cc:515-599).
        def _atomic(stage_fn):
            # the conflicting mutation may have changed covisibility (or
            # culled this keyframe / reset the map): re-derive the weight
            # matrix inside the lock before re-staging
            with self.map_lock:
                if not m.kf_valid[kf]:
                    return
                stage_fn(kf, covisibility.weight_matrix(m), atomic=True)

        def _pending() -> bool:
            """More keyframes already queued (CheckNewKeyFrames,
            LocalMapping.cc:74-93): the reference then skips fusion, local
            BA and culling to drain the queue — the skipped work is covered
            by the next keyframe's pass."""
            if self.pending_fn is not None and self.pending_fn():
                return True
            return backlog

        with self.stats.stage("triangulate"):
            if backlog:
                _atomic(self._create_new_map_points)
            elif self._create_new_map_points(kf, w) == "conflict":
                _atomic(self._create_new_map_points)
        if not _pending():
            with self.stats.stage("fuse"):
                if self._search_in_neighbors(kf, w) == "conflict":
                    _atomic(self._search_in_neighbors)
                with self.map_lock:
                    pts = np.unique(m.kf_pt[kf])
                    pts = pts[pts >= 0]
                    m.update_point_descriptor_and_normal(
                        pts, self.cfg.scale_factor, self.cfg.n_levels)
        # InterruptBA (LocalMapping.cc:81-96, Tracking.cc:1283): a tracker
        # that wanted to insert while the earlier stages ran — or a queued
        # keyframe — skips the local BA and culling; the window is
        # re-optimized with the next keyframe. (The one-program device
        # solve cannot be aborted mid-flight like g2o's pbStopFlag, so the
        # flag is honored at the stage boundary instead.)
        aborted = self.interrupt_ba
        self.interrupt_ba = False
        if not aborted and not _pending():
            with self.stats.stage("local_ba"):
                if m.n_keyframes() > 2:
                    with self.map_lock:
                        w = covisibility.weight_matrix(m)
                    self._local_ba(kf, w)
            with self.stats.stage("kf_culling"), self.map_lock:
                self._keyframe_culling(kf, covisibility.weight_matrix(m))
        with self.map_lock:
            m.change_index += 1

    # ------------------------------------------------------------------
    # MapPointCulling (LocalMapping.cc:195-235)
    # ------------------------------------------------------------------
    def _map_point_culling(self, current_order: int) -> None:
        m = self.map
        obs_count = m.point_obs_count()
        found_ratio = m.found_ratio()
        drop: List[int] = []
        done: List[int] = []
        for pid, born in self._recent.items():
            if not m.pt_valid[pid]:
                done.append(pid)
                continue
            age = current_order - born
            if found_ratio[pid] < self.cfg.cull_found_ratio:
                drop.append(pid)
            elif age >= 2 and obs_count[pid] < self.cfg.cull_min_obs_age2:
                drop.append(pid)
            elif age >= 3:
                done.append(pid)  # survived probation
        m.erase_points(np.array(drop, np.int64))
        done.extend(drop)
        for pid in done:
            self._recent.pop(pid, None)

    # ------------------------------------------------------------------
    # CreateNewMapPoints (LocalMapping.cc:237-513)
    # ------------------------------------------------------------------
    def scene_median_depth(self, kf: int) -> float:
        """KeyFrame::ComputeSceneMedianDepth (KeyFrame.cc:674)."""
        m = self.map
        pids = m.kf_pt[kf][m.kf_pt[kf] >= 0]
        pids = pids[m.pt_valid[pids]]
        if len(pids) == 0:
            return -1.0
        tcw = m.kf_pose[kf]
        z = (m.pt_pos[pids] @ tcw[:3, :3].T + tcw[:3, 3])[:, 2]
        return float(np.median(z))

    NB_CAP = 24        # padded neighbor batch for the one-dispatch program

    @property
    def _nb_cap(self) -> int:
        """Stereo/RGB-D triangulates against 10 covisible neighbors
        (LocalMapping.cc:243 nn=10), mono against 20 — padding both to 24
        made the one-dispatch program 2x more expensive than stereo needs
        (measured 162 ms at B=24 vs ~half at B=12 on v5e at KITTI
        shapes). One compile per cap value."""
        return 24 if self.cfg.monocular else 12
    TRI_OUT_CAP = 1024  # compacted survivors fetched across ALL neighbors

    def _map_gens(self):
        """Generation triple covering every mutation that can invalidate a
        staged association decision: observation edits (obs_gen), point
        add/erase/move (pt_dirty_gen), keyframe add/erase (kf_dirty_gen).
        Counter-less mutations (found/visible counters, spanning-tree
        parents) do not affect triangulation/fuse applies."""
        m = self.map
        return (m.obs_gen, m.pt_dirty_gen, m.kf_dirty_gen)

    def _create_new_map_points(self, kf: int, w: np.ndarray,
                               atomic: bool = False):
        from orbslam2_tpu.frontend.triangulation import triangulate_neighbors
        m = self.map
        cfg = self.cfg
        # --- stage under the lock -------------------------------------
        with self.stats.stage("tri_stage"), self.map_lock:
            gens = self._map_gens()
            n_neigh = cfg.triangulation_neighbors * (2 if cfg.monocular else 1)
            neighbors = covisibility.best_covisible(w, kf, n_neigh)
            if len(neighbors) == 0:
                return
            med_depth1 = self.scene_median_depth(kf)
            c1 = -(m.kf_pose[kf][:3, :3].T @ m.kf_pose[kf][:3, 3])
            # baseline gates on host (LocalMapping.cc:286-295)
            keep = []
            for nb in map(int, neighbors):
                c2 = -(m.kf_pose[nb][:3, :3].T @ m.kf_pose[nb][:3, 3])
                baseline = float(np.linalg.norm(c2 - c1))
                if cfg.monocular:
                    if med_depth1 > 0 and baseline / med_depth1 < 0.01:
                        continue
                else:
                    if baseline < 0.01:
                        continue
                keep.append(nb)
            nb_cap = self._nb_cap
            keep = keep[: nb_cap]
            if not keep:
                return
            # one device program matches + triangulates against ALL neighbors
            store = m.device_kf_store()
            b = len(keep)
            nb_ids = np.zeros(nb_cap, np.int32)
            nb_ids[:b] = keep
            nb_valid = np.zeros(nb_cap, bool)
            nb_valid[:b] = True
            free1 = (m.kf_pt[kf] < 0) & m.kf_kp_valid[kf]
            free2 = np.zeros((nb_cap, m.cap.n_features), bool)
            free2[:b] = (m.kf_pt[np.array(keep)] < 0) & m.kf_kp_valid[np.array(keep)]
            a = store.arrays
            pose = store.pose  # snapshot: a concurrent sync may swap it
        # --- device program + fetch, unlocked (tracker frames proceed) --
        with self.stats.stage("tri_dev"):
            res = jax.device_get(triangulate_neighbors(
                np.int32(kf), free1, nb_ids,
                nb_valid, free2, pose,
                a["kf_kp_xy"], a["kf_kp_desc"], a["kf_kp_octave"],
                a["kf_kp_angle"], a["kf_kp_valid"], a["kf_kp_ur"],
                a["kf_kp_depth"], self.cam, cfg.scale_factor, cfg.n_levels,
                self.TRI_OUT_CAP))
        # --- apply under the lock; generation-validated -----------------
        with self.stats.stage("tri_apply"), self.map_lock:
            if not atomic and self._map_gens() != gens:
                return "conflict"  # nothing applied; caller reruns atomically
            rows = np.where(res.idx1 >= 0)[0]
            nb = np.array(keep, np.int64)[res.nb_slot[rows]]
            i1 = res.idx1[rows].astype(np.int64)
            j2 = res.kp2_idx[rows].astype(np.int64)
            # drop pairs whose slots are taken, then first-wins dedup
            # within the batch (matching the sequential loop's "taken by
            # an earlier pair this round" semantics)
            ok = (m.kf_pt[kf, i1] < 0) & (m.kf_pt[nb, j2] < 0)
            rows, nb, i1, j2 = rows[ok], nb[ok], i1[ok], j2[ok]
            _, first = np.unique(i1, return_index=True)
            sel = np.zeros(len(i1), bool)
            sel[first] = True
            pair_key = nb * m.cap.n_features + j2
            pair_key[~sel] = -1  # already dropped
            _, first2 = np.unique(pair_key, return_index=True)
            sel2 = np.zeros(len(i1), bool)
            sel2[first2] = True
            sel &= sel2
            rows, nb, i1, j2 = rows[sel], nb[sel], i1[sel], j2[sel]
            new_pts = m.add_points_batch(res.points[rows],
                                         m.kf_kp_desc[kf, i1], kf,
                                         int(m.kf_frame_id[kf]))
            nb, i1, j2 = (a[: len(new_pts)] for a in (nb, i1, j2))
            if len(new_pts):
                m.kf_pt[kf, i1] = new_pts
                m.kf_pt[nb, j2] = new_pts
                m.touch_obs()
                m.update_point_descriptor_and_normal(
                    new_pts, cfg.scale_factor, cfg.n_levels)
                order = int(m.kf_order[kf])
                for pid in new_pts:
                    self._recent[int(pid)] = order

    # ------------------------------------------------------------------
    # SearchInNeighbors / Fuse (LocalMapping.cc:515-599, ORBmatcher.cc:873-1038)
    # ------------------------------------------------------------------
    def _search_in_neighbors(self, kf: int, w: np.ndarray,
                             atomic: bool = False):
        m = self.map
        with self.map_lock:
            gens = None if atomic else self._map_gens()
            targets = list(covisibility.best_covisible(w, kf, 10))
            second_ring: List[int] = []
            for t in targets:
                second_ring.extend(covisibility.best_covisible(w, int(t), 5))
            target_kfs = [int(t) for t in
                          dict.fromkeys([*targets, *second_ring])
                          if t != kf][:20]
            if not target_kfs:
                return None
            own_pts = np.unique(m.kf_pt[kf])
            own_pts = own_pts[own_pts >= 0]
            own_pts = own_pts[m.pt_valid[own_pts]]
            neigh_pts = np.unique(m.kf_pt[np.array(target_kfs)])
            neigh_pts = neigh_pts[neigh_pts >= 0]
            neigh_pts = neigh_pts[m.pt_valid[neigh_pts]]
            # forward (this KF's points into every neighbor) and backward
            # (neighbors' points into this KF) share ONE device program:
            # the per-target candidate mask keeps the reference's exact
            # semantics (LocalMapping.cc:541-562) at half the round trips
            cand = np.unique(np.concatenate([own_pts, neigh_pts])) \
                if len(own_pts) + len(neigh_pts) else np.array([], np.int64)
            if len(cand) > self.cfg.fuse_max_points:
                # bounded by the one-chunk optimistic-apply contract
                # (_fuse_matrix); the tail is re-fused with later keyframes
                _log.warning("SearchInNeighbors candidates truncated: "
                             "%d -> %d", len(cand), self.cfg.fuse_max_points)
                cand = cand[: self.cfg.fuse_max_points]
            if len(cand) == 0:
                return None
            sel_rows = np.zeros((len(target_kfs) + 1, len(cand)), bool)
            sel_rows[:-1] = np.isin(cand, own_pts)[None, :]
            sel_rows[-1] = np.isin(cand, neigh_pts)
        return self._fuse_matrix(cand, [*target_kfs, kf], sel_rows,
                                 gens=gens)

    FUSE_T_CAP = 24  # padded target batch for the one-dispatch fuse

    def _fuse_points_into_targets(self, pt_ids: np.ndarray,
                                  targets: List[int]) -> None:
        """One shared candidate set fused into every target (loop-closing's
        neighborhood fuse, LoopClosing.cc:651-675, uses this form). Large
        candidate sets are processed in fuse_max_points-sized chunks —
        every point participates (the reference fuses the full
        mvpLoopMapPoints set, no cap)."""
        if len(pt_ids) == 0 or not targets:
            return
        step = self.cfg.fuse_max_points
        for s in range(0, len(pt_ids), step):
            chunk = pt_ids[s:s + step]
            sel_rows = np.ones((len(targets), len(chunk)), bool)
            self._fuse_matrix(chunk, targets, sel_rows)

    def _fuse_matrix(self, cand: np.ndarray, targets: List[int],
                     sel_rows: np.ndarray, gens=None):
        """ORBmatcher::Fuse of per-target candidate subsets (`sel_rows`
        [T, len(cand)]) into the targets: ONE device program over the
        resident point mirror + keyframe store, then per-target host
        arbitration (add observation vs duplicate merge keeping the
        better-observed point). With `gens` set, each chunk's apply is
        generation-validated (optimistic concurrency — see
        process_keyframe); returns "conflict" without applying if the map
        changed since staging."""
        m = self.map
        cap = self.cfg.fuse_max_points
        n = len(cand)
        # generation-validated applies are all-or-nothing per call: with
        # more than one chunk, a later conflict would strand the earlier
        # chunk's already-applied associations (violating the "nothing
        # applied" contract the atomic rerun relies on)
        assert gens is None or len(targets) <= self.FUSE_T_CAP, \
            "optimistic fuse requires a single target chunk"
        with self.map_lock:
            mir = m.device_mirror()
            store = m.device_kf_store()
            a = store.arrays
            pose = store.pose
            mpos, mdesc, mval = mir.pt_pos, mir.pt_desc, mir.pt_valid
            mnrm, mmin, mmax = mir.pt_normal, mir.pt_min_dist, mir.pt_max_dist
        ids = np.zeros(cap, np.int32)
        ids[:n] = cand
        for t0 in range(0, len(targets), self.FUSE_T_CAP):
            chunk = targets[t0:t0 + self.FUSE_T_CAP]
            t_ids = np.zeros(self.FUSE_T_CAP, np.int32)
            t_ids[:len(chunk)] = chunk
            t_val = np.zeros(self.FUSE_T_CAP, bool)
            t_val[:len(chunk)] = True
            sel = np.zeros((self.FUSE_T_CAP, cap), bool)
            sel[:len(chunk), :n] = sel_rows[t0:t0 + self.FUSE_T_CAP]
            assoc_all = jax.device_get(kernels.fuse_targets(
                t_ids, t_val, pose,
                a["kf_kp_xy"], a["kf_kp_desc"], a["kf_kp_octave"],
                a["kf_kp_angle"], a["kf_kp_valid"],
                ids, sel,
                mpos, mdesc, mval, mnrm, mmin, mmax,
                self.cfg.fuse_radius / 4.0 * 4.0, self.cam,
                self.cfg.scale_factor, self.cfg.n_levels, 50))
            with self.map_lock:
                if gens is not None and self._map_gens() != gens:
                    return "conflict"
                for i, t in enumerate(chunk):
                    self._apply_fuse_assoc(cand, t, assoc_all[i])
                if gens is not None:
                    gens = self._map_gens()  # our applies advanced them
        return None

    def _apply_fuse_assoc(self, pt_ids: np.ndarray, kf: int,
                          assoc: np.ndarray) -> None:
        """Host arbitration for one target's fuse matches (ORBmatcher::Fuse
        tail, ORBmatcher.cc:980-1035): candidates the keyframe already
        observes are skipped (pMP->IsInKeyFrame, cc:941); a match onto an
        occupied slot merges, keeping the better-observed point."""
        m = self.map
        row = m.kf_pt[kf]
        seen = set(int(p) for p in row[row >= 0])
        obs_count = m.point_obs_count()
        replaces = []
        for slot in np.where(assoc >= 0)[0]:
            pid = int(pt_ids[assoc[slot]])
            if not m.pt_valid[pid] or pid in seen:
                continue
            existing = int(m.kf_pt[kf, slot])
            if existing >= 0 and m.pt_valid[existing]:
                # duplicate: keep the better-observed point
                if obs_count[existing] >= obs_count[pid]:
                    replaces.append((pid, existing))
                else:
                    replaces.append((existing, pid))
            else:
                m.add_observation(kf, slot, pid)
                seen.add(pid)
        # one batched Replace for all duplicates (MapPoint.cc:190-232):
        # a single CSR pass instead of a [K, N] rescan per merge
        m.replace_points(replaces)

    # ------------------------------------------------------------------
    # Local bundle adjustment (Optimizer.cc:528-862)
    # ------------------------------------------------------------------
    def _local_ba(self, kf: int, w: np.ndarray) -> None:
        with self.map_lock:
            staged = self._local_ba_stage(kf, w)
            correction_gen = self.map.correction_gen
        if staged is None:
            return
        problem, pt_fixed, apply_ctx = staged
        # solve unlocked: the reference likewise runs the g2o optimization
        # outside the map mutex and takes mMutexMapUpdate only for the
        # write-back (Optimizer.cc:598-607, 842-862)
        res = ba.bundle_adjust(problem, self.cam,
                               point_fixed=jnp.asarray(pt_fixed))
        new_poses = np.asarray(res.poses)
        new_points = np.asarray(res.points)
        inlier = np.asarray(res.inlier)
        with self.map_lock:
            # a loop correction / GBA apply moved the map while the solve
            # was in flight: writing back would revert the local window to
            # pre-correction geometry (the reference prevents this by
            # stopping local mapping around the GBA apply,
            # LoopClosing.cc:500-540, 828-833)
            if self.map.correction_gen != correction_gen:
                return
            self._local_ba_apply(apply_ctx, new_poses, new_points, inlier)

    def _local_ba_stage(self, kf: int, w: np.ndarray):
        m = self.map
        cfg = self.cfg
        # the FULL first covisibility ring optimizes (Optimizer.cc:531-545,
        # no cap); an explicit ba_max_cams truncates with a warning
        local = [kf, *[int(t) for t in covisibility.covisible_neighbors(w, kf)]]
        if cfg.ba_max_cams is not None and len(local) > cfg.ba_max_cams - 1:
            _log.warning("local BA window truncated: %d -> %d cameras",
                         len(local), cfg.ba_max_cams - 1)
            local = local[: cfg.ba_max_cams - 1]
        local_set = set(local)

        # points seen by local KFs (all of them, Optimizer.cc:547-561)
        pts = np.unique(m.kf_pt[np.array(local)])
        pts = pts[pts >= 0]
        pts = pts[m.pt_valid[pts]]
        if cfg.ba_max_points is not None and len(pts) > cfg.ba_max_points:
            _log.warning("local BA points truncated: %d -> %d",
                         len(pts), cfg.ba_max_points)
            pts = pts[: cfg.ba_max_points]
        if len(pts) < 20 or len(local) < 2:
            return None

        # fixed cameras: other KFs observing these points (second ring) —
        # one CSR gather over the window's points (an all-pairs comparison
        # tensor is [K, N, P_local] ~ 10^10 elements at KITTI scale)
        _, obs_kf_ids, _ = m.gather_point_obs(pts)
        sees = np.zeros(m.cap.max_keyframes, bool)
        sees[obs_kf_ids] = True
        sees &= m.kf_valid
        fixed = [int(k) for k in np.where(sees)[0] if k not in local_set]
        n_free = len(local)
        cams = [*local, *fixed]
        if cfg.ba_max_cams is not None and len(cams) > cfg.ba_max_cams:
            cams = cams[: cfg.ba_max_cams]
        cam_slot = {int(c): i for i, c in enumerate(cams)}
        # padded capacities quantize to buckets: a handful of device
        # compiles over the map's lifetime instead of one per keyframe
        cam_cap = size_bucket(len(cams), 16, 2, m.cap.max_keyframes)
        pt_cap = size_bucket(len(pts), 1024, 4, m.cap.max_points)

        # gauge: without out-of-window fixed observers, fix the two oldest
        # local KFs — one pins the SE3 gauge, the second pins monocular
        # scale (a single fixed camera leaves scale as a flat direction
        # that LM noise random-walks along; measured 2.6x drift / 35
        # frames before this anchor).
        cam_fixed = np.zeros(cam_cap, bool)
        cam_fixed[n_free:] = True
        if len(fixed) == 0:
            order = np.argsort([m.kf_order[c] for c in local])
            cam_fixed[order[0]] = True
            if len(local) > 2:
                cam_fixed[order[1]] = True

        poses = np.tile(np.eye(4, dtype=np.float32), (cam_cap, 1, 1))
        cams_arr = np.array(cams, np.int32)
        poses[: len(cams)] = m.kf_pose[cams_arr]
        points = np.zeros((pt_cap, 3), np.float32)
        points[: len(pts)] = m.pt_pos[pts]

        # observations from all included cameras — vectorized gather via a
        # point-id -> BA-slot lookup table (the per-cam/per-slot Python
        # double loop was ~10^4 iterations per keyframe)
        pt_lut = np.full(m.cap.max_points, -1, np.int32)
        pt_lut[pts] = np.arange(len(pts), dtype=np.int32)
        sub = m.kf_pt[cams_arr]                      # [C, N]
        pslot = np.where(sub >= 0, pt_lut[np.maximum(sub, 0)], -1)
        ci_idx, slot_idx = np.nonzero(pslot >= 0)
        n_obs = len(ci_idx)
        if cfg.ba_max_obs is not None and n_obs > cfg.ba_max_obs:
            _log.warning("local BA observations truncated: %d -> %d",
                         n_obs, cfg.ba_max_obs)
            n_obs = cfg.ba_max_obs
        if n_obs < 30:
            return None
        obs_cap = size_bucket(n_obs, 4096, 4,
                              cfg.ba_max_obs if cfg.ba_max_obs else None)
        ci_idx, slot_idx = ci_idx[:n_obs], slot_idx[:n_obs]
        sel_kf = cams_arr[ci_idx]
        ur = m.kf_kp_ur[sel_kf, slot_idx]
        inv_sig_base = 1.0 / cfg.scale_factor ** 2
        o_cam = np.zeros(obs_cap, np.int32)
        o_pt = np.zeros(obs_cap, np.int32)
        o_uv = np.zeros((obs_cap, 3), np.float32)
        o_sig = np.ones(obs_cap, np.float32)
        o_st = np.zeros(obs_cap, bool)
        o_val = np.zeros(obs_cap, bool)
        o_cam[:n_obs] = ci_idx
        o_pt[:n_obs] = pslot[ci_idx, slot_idx]
        o_uv[:n_obs, :2] = m.kf_kp_xy[sel_kf, slot_idx]
        o_uv[:n_obs, 2] = np.maximum(ur, -1.0)
        o_sig[:n_obs] = inv_sig_base ** m.kf_kp_octave[sel_kf, slot_idx]
        o_st[:n_obs] = ur >= 0
        o_val[:n_obs] = True

        problem = ba.BAProblem(
            poses=jnp.asarray(poses),
            points=jnp.asarray(points),
            cam_fixed=jnp.asarray(cam_fixed),
            obs_cam=jnp.asarray(o_cam),
            obs_pt=jnp.asarray(o_pt),
            obs_uv=jnp.asarray(o_uv),
            obs_inv_sigma2=jnp.asarray(o_sig),
            obs_stereo=jnp.asarray(o_st),
            obs_valid=jnp.asarray(o_val),
        )
        pt_fixed = np.zeros(pt_cap, bool)
        pt_fixed[len(pts):] = True
        apply_ctx = (cam_slot, cam_fixed, pts, sel_kf, slot_idx, n_obs)
        return problem, pt_fixed, apply_ctx

    def _local_ba_apply(self, apply_ctx, new_poses: np.ndarray,
                        new_points: np.ndarray, inlier: np.ndarray) -> None:
        """Write back BA results under the map lock, re-validating against
        mutations that landed while the solve ran unlocked (a concurrent
        async-GBA apply or reset may have culled keyframes/points)."""
        m = self.map
        cam_slot, cam_fixed, pts, sel_kf, slot_idx, n_obs = apply_ctx
        for c, i in cam_slot.items():
            if not cam_fixed[i] and m.kf_valid[c]:
                m.kf_pose[c] = new_poses[i]
        still = m.pt_valid[pts]
        m.pt_pos[pts[still]] = new_points[: len(pts)][still]
        m.mark_pts_dirty(pts[still])
        # erase outlier observations (Optimizer.cc:792-839) — the staging
        # above kept each observation's (kf, slot), so this is one scatter
        bad = ~inlier[:n_obs]
        if bad.any():
            m.kf_pt[sel_kf[bad], slot_idx[bad]] = -1
            m.touch_obs()

    # ------------------------------------------------------------------
    # KeyFrameCulling (LocalMapping.cc:704-790)
    # ------------------------------------------------------------------
    def _keyframe_culling(self, kf: int, w: np.ndarray) -> None:
        m = self.map
        obs_count = m.point_obs_count()
        # gauge anchors: never cull the two oldest surviving keyframes (the
        # reference only protects mnId==0; with our two-anchor local-BA
        # gauge, culling the second-oldest re-seats the scale anchor onto a
        # drifted keyframe — measured 2x mono scale drift)
        live_orders = np.sort(m.kf_order[m.kf_valid & (m.kf_order >= 0)])
        protected = set(live_orders[:2].tolist())
        for cand in covisibility.covisible_neighbors(w, kf):
            cand = int(cand)
            if int(m.kf_order[cand]) in protected:
                continue
            slots = np.where(m.kf_pt[cand] >= 0)[0]
            if len(slots) == 0:
                continue
            pids = m.kf_pt[cand, slots]
            live = m.pt_valid[pids]
            slots, pids = slots[live], pids[live]
            if len(slots) == 0:
                continue
            cand_oct = m.kf_kp_octave[cand, slots]
            # count, per point, other-KF observations at octave <= oct_c+1
            # via the CSR index (the per-observation [K, N] scan was ~1e9
            # element-touches per cull at KITTI scale); the CSR index only
            # holds valid KFs, so no kf_valid re-check is needed
            seg, oks, osl = m.gather_point_obs(pids.astype(np.int64))
            other = oks != cand
            finer_obs = other & (m.kf_kp_octave[oks, osl]
                                 <= cand_oct[seg] + 1)
            finer = np.bincount(seg[finer_obs], minlength=len(pids))
            redundant = int(((obs_count[pids] >= 3) & (finer >= 3)).sum())
            if redundant > self.cfg.kf_cull_redundancy * len(slots):
                m.erase_keyframe(cand)
                if self.kfdb is not None:
                    self.kfdb.erase(cand)
