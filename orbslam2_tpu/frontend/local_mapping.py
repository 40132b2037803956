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
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.backend import ba
from orbslam2_tpu.frontend import kernels
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.ops.orb import Keypoints
from orbslam2_tpu.slammap import covisibility
from orbslam2_tpu.slammap.mapstate import MapState


@dataclasses.dataclass
class LocalMapperConfig:
    scale_factor: float = 1.2
    n_levels: int = 8
    ba_max_cams: int = 16
    ba_max_points: int = 4096
    ba_max_obs: int = 12288
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
        self.kfdb = None  # set by SLAMSystem when place recognition is on

    # ------------------------------------------------------------------
    def on_first_keyframe(self, kf: int) -> None:
        pass

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int) -> None:
        m = self.map
        order = int(m.kf_order[kf])
        # register newly created points for probation
        for pid in np.unique(m.kf_pt[kf]):
            if pid >= 0 and pid not in self._recent and m.pt_first_kf[pid] == kf:
                self._recent[pid] = order
        self._map_point_culling(order)
        w = covisibility.weight_matrix(m)
        self._create_new_map_points(kf, w)
        self._search_in_neighbors(kf, w)
        pts = np.unique(m.kf_pt[kf])
        pts = pts[pts >= 0]
        m.update_point_descriptor_and_normal(
            pts, self.cfg.scale_factor, self.cfg.n_levels)
        self._local_ba(kf, covisibility.weight_matrix(m))
        self._keyframe_culling(kf, covisibility.weight_matrix(m))
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

    def _create_new_map_points(self, kf: int, w: np.ndarray) -> None:
        from orbslam2_tpu.frontend.triangulation import triangulate_pair
        m = self.map
        cfg = self.cfg
        n_neigh = cfg.triangulation_neighbors * (2 if cfg.monocular else 1)
        neighbors = covisibility.best_covisible(w, kf, n_neigh)
        if len(neighbors) == 0:
            return
        kp1 = kf_keypoints(m, kf)
        med_depth1 = self.scene_median_depth(kf)
        c1 = -(m.kf_pose[kf][:3, :3].T @ m.kf_pose[kf][:3, 3])
        new_pts = []
        for nb in neighbors:
            nb = int(nb)
            c2 = -(m.kf_pose[nb][:3, :3].T @ m.kf_pose[nb][:3, 3])
            baseline = float(np.linalg.norm(c2 - c1))
            if cfg.monocular:
                if med_depth1 > 0 and baseline / med_depth1 < 0.01:
                    continue  # LocalMapping.cc:286-295
            else:
                if baseline < 0.01:
                    continue
            free1 = (m.kf_pt[kf] < 0) & m.kf_kp_valid[kf]
            free2 = (m.kf_pt[nb] < 0) & m.kf_kp_valid[nb]
            res = triangulate_pair(
                jnp.asarray(m.kf_pose[kf]), kp1, jnp.asarray(free1),
                jnp.asarray(m.kf_kp_ur[kf]), jnp.asarray(m.kf_kp_depth[kf]),
                jnp.asarray(m.kf_pose[nb]), kf_keypoints(m, nb), jnp.asarray(free2),
                jnp.asarray(m.kf_kp_ur[nb]), jnp.asarray(m.kf_kp_depth[nb]),
                self.cam, cfg.scale_factor, cfg.n_levels)
            kp2_idx = np.asarray(res.kp2_idx)
            pts = np.asarray(res.points)
            for i in np.where(kp2_idx >= 0)[0]:
                if m.kf_pt[kf, i] >= 0 or m.kf_pt[nb, kp2_idx[i]] >= 0:
                    continue  # taken by an earlier pair this round
                try:
                    pid = m.add_point(pts[i], m.kf_kp_desc[kf, i], kf,
                                      int(m.kf_frame_id[kf]))
                except RuntimeError:
                    return  # capacity full; culling will free slots later
                m.add_observation(kf, i, pid)
                m.add_observation(nb, int(kp2_idx[i]), pid)
                new_pts.append(pid)
        if new_pts:
            m.update_point_descriptor_and_normal(
                np.array(new_pts), cfg.scale_factor, cfg.n_levels)
            order = int(m.kf_order[kf])
            for pid in new_pts:
                self._recent[pid] = order

    # ------------------------------------------------------------------
    # SearchInNeighbors / Fuse (LocalMapping.cc:515-599, ORBmatcher.cc:873-1038)
    # ------------------------------------------------------------------
    def _search_in_neighbors(self, kf: int, w: np.ndarray) -> None:
        m = self.map
        targets = list(covisibility.best_covisible(w, kf, 10))
        second_ring: List[int] = []
        for t in targets:
            second_ring.extend(covisibility.best_covisible(w, int(t), 5))
        target_kfs = [t for t in dict.fromkeys([*targets, *second_ring]) if t != kf][:20]
        if not target_kfs:
            return

        own_pts = np.unique(m.kf_pt[kf])
        own_pts = own_pts[own_pts >= 0]
        own_pts = own_pts[m.pt_valid[own_pts]]
        # forward: fuse this KF's points into neighbors
        for t in target_kfs:
            self._fuse_points_into_kf(own_pts, int(t))
        # backward: fuse neighbors' points into this KF
        neigh_pts = np.unique(m.kf_pt[np.array(target_kfs)])
        neigh_pts = neigh_pts[neigh_pts >= 0]
        neigh_pts = neigh_pts[m.pt_valid[neigh_pts]]
        self._fuse_points_into_kf(neigh_pts, kf)

    def _fuse_points_into_kf(self, pt_ids: np.ndarray, kf: int) -> None:
        """Project points into keyframe kf; matched keypoints either gain an
        observation or trigger a duplicate merge (keep the point with more
        observations, ORBmatcher::Fuse semantics)."""
        m = self.map
        if len(pt_ids) == 0:
            return
        cap = self.cfg.ba_max_points
        pt_ids = pt_ids[:cap]
        n = len(pt_ids)
        pos = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, 8), np.uint32)
        valid = np.zeros(cap, bool)
        normal = np.zeros((cap, 3), np.float32)
        dmin = np.zeros(cap, np.float32)
        dmax = np.zeros(cap, np.float32)
        pos[:n] = m.pt_pos[pt_ids]
        desc[:n] = m.pt_desc[pt_ids]
        valid[:n] = True
        normal[:n] = m.pt_normal[pt_ids]
        dmin[:n] = m.pt_min_dist[pt_ids]
        dmax[:n] = m.pt_max_dist[pt_ids]
        # points already observed by kf need no fusion
        already = np.isin(pt_ids, m.kf_pt[kf][m.kf_pt[kf] >= 0])
        valid[:n] &= ~already

        kp = kf_keypoints(m, kf)
        info, res = kernels.search_local_points(
            jnp.asarray(m.kf_pose[kf]), jnp.asarray(pos), jnp.asarray(desc),
            jnp.asarray(valid), jnp.asarray(normal), jnp.asarray(dmin), jnp.asarray(dmax),
            kp, jnp.zeros(kp.n, bool), self.cfg.fuse_radius / 4.0 * 4.0, self.cam,
            self.cfg.scale_factor, self.cfg.n_levels, max_hamming=50)
        assoc = np.asarray(res.assoc)  # [N_kp] -> candidate row
        obs_count = m.point_obs_count()
        replaces = []
        for slot in np.where(assoc >= 0)[0]:
            pid = int(pt_ids[assoc[slot]])
            if not m.pt_valid[pid]:
                continue
            existing = int(m.kf_pt[kf, slot])
            if existing >= 0 and m.pt_valid[existing]:
                if existing == pid:
                    continue
                # duplicate: keep the better-observed point
                if obs_count[existing] >= obs_count[pid]:
                    replaces.append((pid, existing))
                else:
                    replaces.append((existing, pid))
            else:
                m.add_observation(kf, slot, pid)
        # one batched Replace for all duplicates (MapPoint.cc:190-232):
        # a single CSR pass instead of a [K, N] rescan per merge
        m.replace_points(replaces)

    # ------------------------------------------------------------------
    # Local bundle adjustment (Optimizer.cc:528-862)
    # ------------------------------------------------------------------
    def _local_ba(self, kf: int, w: np.ndarray) -> None:
        m = self.map
        cfg = self.cfg
        local = [kf, *[int(t) for t in covisibility.covisible_neighbors(w, kf)]]
        local = local[: cfg.ba_max_cams - 1]
        local_set = set(local)

        # points seen by local KFs
        pts = np.unique(m.kf_pt[np.array(local)])
        pts = pts[pts >= 0]
        pts = pts[m.pt_valid[pts]][: cfg.ba_max_points]
        if len(pts) < 20 or len(local) < 2:
            return
        pt_slot = {int(p): i for i, p in enumerate(pts)}

        # fixed cameras: other KFs observing these points (second ring) —
        # one CSR gather over the window's points (an all-pairs comparison
        # tensor is [K, N, P_local] ~ 10^10 elements at KITTI scale)
        _, obs_kf_ids, _ = m.gather_point_obs(pts)
        sees = np.zeros(m.cap.max_keyframes, bool)
        sees[obs_kf_ids] = True
        sees &= m.kf_valid
        fixed = [int(k) for k in np.where(sees)[0] if k not in local_set]
        n_free = len(local)
        cams = [*local, *fixed][: cfg.ba_max_cams]
        cam_slot = {int(c): i for i, c in enumerate(cams)}

        # gauge: without out-of-window fixed observers, fix the two oldest
        # local KFs — one pins the SE3 gauge, the second pins monocular
        # scale (a single fixed camera leaves scale as a flat direction
        # that LM noise random-walks along; measured 2.6x drift / 35
        # frames before this anchor).
        cam_fixed = np.zeros(cfg.ba_max_cams, bool)
        cam_fixed[n_free:] = True
        if len(fixed) == 0:
            order = np.argsort([m.kf_order[c] for c in local])
            cam_fixed[order[0]] = True
            if len(local) > 2:
                cam_fixed[order[1]] = True

        poses = np.tile(np.eye(4, dtype=np.float32), (cfg.ba_max_cams, 1, 1))
        for c, i in cam_slot.items():
            poses[i] = m.kf_pose[c]
        points = np.zeros((cfg.ba_max_points, 3), np.float32)
        points[: len(pts)] = m.pt_pos[pts]

        # observations from all included cameras — vectorized gather via a
        # point-id -> BA-slot lookup table (the per-cam/per-slot Python
        # double loop was ~10^4 iterations per keyframe)
        cams_arr = np.array(cams, np.int32)
        pt_lut = np.full(m.cap.max_points, -1, np.int32)
        pt_lut[pts] = np.arange(len(pts), dtype=np.int32)
        sub = m.kf_pt[cams_arr]                      # [C, N]
        pslot = np.where(sub >= 0, pt_lut[np.maximum(sub, 0)], -1)
        ci_idx, slot_idx = np.nonzero(pslot >= 0)
        n_obs = min(len(ci_idx), cfg.ba_max_obs)
        if n_obs < 30:
            return
        ci_idx, slot_idx = ci_idx[:n_obs], slot_idx[:n_obs]
        sel_kf = cams_arr[ci_idx]
        ur = m.kf_kp_ur[sel_kf, slot_idx]
        inv_sig_base = 1.0 / cfg.scale_factor ** 2
        o_cam = np.zeros(cfg.ba_max_obs, np.int32)
        o_pt = np.zeros(cfg.ba_max_obs, np.int32)
        o_uv = np.zeros((cfg.ba_max_obs, 3), np.float32)
        o_sig = np.ones(cfg.ba_max_obs, np.float32)
        o_st = np.zeros(cfg.ba_max_obs, bool)
        o_val = np.zeros(cfg.ba_max_obs, bool)
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
        pt_fixed = np.zeros(cfg.ba_max_points, bool)
        pt_fixed[len(pts):] = True
        res = ba.bundle_adjust(problem, self.cam, point_fixed=jnp.asarray(pt_fixed))

        new_poses = np.asarray(res.poses)
        new_points = np.asarray(res.points)
        for c, i in cam_slot.items():
            if not cam_fixed[i]:
                m.kf_pose[c] = new_poses[i]
        m.pt_pos[pts] = new_points[: len(pts)]
        m.mark_pts_dirty(pts)
        # erase outlier observations (Optimizer.cc:792-839) — the staging
        # above kept each observation's (kf, slot), so this is one scatter
        inlier = np.asarray(res.inlier)
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
