"""Loop closing: detection, Sim3 computation, correction, pose graph, GBA.

Re-design of the reference LoopClosing thread
(/root/reference/src/LoopClosing.cc). Runs synchronously per processed
keyframe (the async orchestrator replaces the 5 ms poll loop, cc:64-98).

Stages mirror the reference:
- DetectLoop (cc:119): >=10 KFs since last loop, min-score from covisible
  BoW scores, KFDB candidates, covisibility-consistency chaining over 3
  consecutive detections
- ComputeSim3 (cc:282): per-candidate descriptor matching of map points,
  Sim3 RANSAC (scale frozen for stereo/RGB-D), OptimizeSim3 (>=20
  inliers), then projection of the loop neighborhood (>=40 total)
- CorrectLoop (cc:500): Sim3 propagation to the covisible window, point
  remapping p' = S_corr^-1 S_old p, loop-point fusion, essential-graph
  optimization, and a final global BA (the reference spawns a thread;
  here the PCG global BA runs inline)
"""
from __future__ import annotations

import dataclasses
import threading
from typing import Dict, List, Optional, Set

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.backend import ba, pose_graph, sim3_opt
from orbslam2_tpu.backend.ba import BAProblem
from orbslam2_tpu.frontend import kernels
from orbslam2_tpu.frontend.local_mapping import kf_keypoints
from orbslam2_tpu.geometry import sim3, sim3_np
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.ops import hamming
from orbslam2_tpu.slammap import covisibility
from orbslam2_tpu.slammap.keyframe_db import KeyFrameDatabase
from orbslam2_tpu.slammap.mapstate import MapState


@dataclasses.dataclass
class LoopCloserConfig:
    scale_factor: float = 1.2
    n_levels: int = 8
    fix_scale: bool = True            # false for monocular
    consistency_threshold: int = 3    # mnCovisibilityConsistencyTh (cc:43)
    min_kfs_between_loops: int = 10   # cc:133
    recent_exclude: int = 5           # recency exclusion (see KFDB docstring)
    min_sim3_matches: int = 20        # cc:323-332
    min_sim3_inliers: int = 20        # cc:397-401
    min_total_matches: int = 40       # cc:464-474
    # hard cap on GBA observations — None (default) = every valid
    # observation enters the problem (Optimizer.cc:61-281 has no cap),
    # padded to size buckets; an int truncates WITH a logged warning
    gba_max_obs: int | None = None
    run_global_ba: bool = True
    # run the loop GBA in a background thread on a map snapshot, with
    # spanning-tree propagation of corrections to keyframes/points created
    # while it ran (RunGlobalBundleAdjustment, LoopClosing.cc:792-896).
    # A newer loop supersedes an in-flight GBA (mnFullBAIdx, cc:796-806).
    async_gba: bool = False


class LoopCloser:
    def __init__(self, m: MapState, cam: PinholeCamera, kfdb: KeyFrameDatabase,
                 cfg: LoopCloserConfig | None = None):
        self.map = m
        self.cam = cam
        self.kfdb = kfdb
        self.cfg = cfg or LoopCloserConfig()
        self.last_loop_kf_order = -10**9
        # consistency chaining state: list of (group set, chain length)
        self._consistent_groups: List[tuple[Set[int], int]] = []
        self.n_loops_closed = 0
        # --- GBA abort-and-rerun state (mnFullBAIdx, LoopClosing.cc:796) --
        self.map_lock: threading.RLock = threading.RLock()
        self.full_ba_idx = 0
        self.n_gba_applied = 0
        self.n_gba_superseded = 0
        self._gba_thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int, word_ids: np.ndarray) -> bool:
        """-> True if a loop was closed at this keyframe."""
        m = self.map
        w = covisibility.weight_matrix(m)
        candidates = self._detect_loop(kf, word_ids, w)
        self.kfdb.add(kf, word_ids)
        if not candidates:
            return False
        ok, loop_kf, s_cw = self._compute_sim3(kf, candidates, w)
        if not ok:
            return False
        self._correct_loop(kf, loop_kf, s_cw, w)
        self.last_loop_kf_order = int(m.kf_order[kf])
        self.n_loops_closed += 1
        return True

    # ------------------------------------------------------------------
    # DetectLoop (LoopClosing.cc:119-258)
    # ------------------------------------------------------------------
    def _detect_loop(self, kf: int, word_ids: np.ndarray, w: np.ndarray) -> List[int]:
        m = self.map
        if int(m.kf_order[kf]) - self.last_loop_kf_order < self.cfg.min_kfs_between_loops:
            self._consistent_groups = []
            return []
        if m.n_keyframes() < self.cfg.min_kfs_between_loops:
            return []
        # min score among covisible neighbors (cc:144-161)
        v = self.kfdb.voc.bow_vector(word_ids)
        neighbors = covisibility.covisible_neighbors(w, kf)
        min_score = 1.0
        for nb in neighbors:
            if self.kfdb.valid[nb]:
                s = self.kfdb.score_kf(v, nb)
                min_score = min(min_score, s)
        recent = np.abs(m.kf_order - int(m.kf_order[kf])) <= self.cfg.recent_exclude
        cands = self.kfdb.detect_loop_candidates(kf, min_score, w, m,
                                                 exclude_mask=recent, query_bow=v)
        if not cands:
            self._consistent_groups = []
            return []

        # consistency chaining (cc:195-258)
        enough: List[int] = []
        new_groups: List[tuple[Set[int], int]] = []
        for cand in cands:
            group = set([cand, *map(int, covisibility.covisible_neighbors(w, cand))])
            best_chain = 0
            for prev_group, chain in self._consistent_groups:
                if group & prev_group:
                    best_chain = max(best_chain, chain + 1)
            new_groups.append((group, best_chain))
            if best_chain >= self.cfg.consistency_threshold:
                enough.append(cand)
        self._consistent_groups = new_groups
        return enough

    # ------------------------------------------------------------------
    # ComputeSim3 (LoopClosing.cc:282-498)
    # ------------------------------------------------------------------
    def _compute_sim3(self, kf: int, candidates: List[int], w: np.ndarray):
        m = self.map
        cfg = self.cfg
        kf_slots = np.where(m.kf_pt[kf] >= 0)[0]
        if len(kf_slots) < cfg.min_sim3_matches:
            return False, -1, None

        for cand in candidates:
            if not m.kf_valid[cand]:
                continue
            # match map points by descriptor between the two keyframes
            cand_slots_mask = (m.kf_pt[cand] >= 0) & m.kf_kp_valid[cand]
            best_kp, _ = kernels.search_by_descriptor(
                jnp.asarray(m.kf_kp_desc[kf]),
                jnp.asarray((m.kf_pt[kf] >= 0) & m.kf_kp_valid[kf]),
                jnp.asarray(m.kf_kp_angle[kf]),
                kf_keypoints(m, cand).replace(valid=jnp.asarray(cand_slots_mask)),
                self.cam, max_hamming=hamming.TH_LOW, ratio=0.75)
            best_kp = np.asarray(best_kp)
            pairs = [(i, int(best_kp[i])) for i in np.where(best_kp >= 0)[0]]
            if len(pairs) < cfg.min_sim3_matches:
                continue

            n_feat = m.cap.n_features
            idx1 = np.array([p[0] for p in pairs])
            idx2 = np.array([p[1] for p in pairs])
            pid1 = m.kf_pt[kf, idx1]
            pid2 = m.kf_pt[cand, idx2]
            keep = (pid1 >= 0) & (pid2 >= 0) & m.pt_valid[np.maximum(pid1, 0)] \
                & m.pt_valid[np.maximum(pid2, 0)]
            idx1, idx2, pid1, pid2 = idx1[keep], idx2[keep], pid1[keep], pid2[keep]
            if len(idx1) < cfg.min_sim3_matches:
                continue

            # camera-frame coordinates of each matched point pair — ALL of
            # them (the reference's vpMapPointMatches carries every match,
            # LoopClosing.cc:340; a fixed 256 cap silently changed RANSAC
            # statistics at KITTI densities), padded to a size bucket
            t1 = m.kf_pose[kf]
            t2 = m.kf_pose[cand]
            p1c = m.pt_pos[pid1] @ t1[:3, :3].T + t1[:3, 3]
            p2c = m.pt_pos[pid2] @ t2[:3, :3].T + t2[:3, 3]
            from orbslam2_tpu.frontend.local_mapping import size_bucket
            cap = size_bucket(len(idx1), 256, 4, m.cap.n_features)
            n = min(len(idx1), cap)
            pad = cap - n
            p1c_p = np.pad(p1c[:n], ((0, pad), (0, 0))).astype(np.float32)
            p2c_p = np.pad(p2c[:n], ((0, pad), (0, 0))).astype(np.float32)
            valid = np.zeros(cap, bool)
            valid[:n] = True
            sf = cfg.scale_factor
            s1 = sf ** (2.0 * m.kf_kp_octave[kf, idx1[:n]])
            s2 = sf ** (2.0 * m.kf_kp_octave[cand, idx2[:n]])
            s1 = np.pad(s1, (0, pad), constant_values=1.0).astype(np.float32)
            s2 = np.pad(s2, (0, pad), constant_values=1.0).astype(np.float32)

            from orbslam2_tpu.solvers.horn import sim3_ransac
            res = sim3_ransac(
                jnp.asarray(p1c_p), jnp.asarray(p2c_p), jnp.asarray(valid),
                jnp.asarray(s1), jnp.asarray(s2), self.cam,
                jax.random.PRNGKey(kf * 131 + cand),
                fix_scale=cfg.fix_scale, min_inliers=cfg.min_sim3_matches)
            if not bool(res.success):
                continue

            # SearchBySim3 match expansion (ORBmatcher.cc:1166, used at
            # LoopClosing.cc:391-401): mutually project both keyframes'
            # map points through the RANSAC Sim3 (th=7.5) to ADD matches
            # before OptimizeSim3 — only then is the >=20-inlier gate
            # applied, so borderline loops with thin BoW matching are
            # rescued the way the reference rescues them (r3 verdict #4).
            inl_pairs = np.asarray(res.inliers)[:n]
            k_idx1 = idx1[:n][inl_pairs]
            k_idx2 = idx2[:n][inl_pairs]
            e_idx1, e_idx2 = self._search_by_sim3(
                kf, cand, np.asarray(res.s12), k_idx1, k_idx2)
            a_idx1 = np.concatenate([k_idx1, e_idx1])
            a_idx2 = np.concatenate([k_idx2, e_idx2])
            pid1a = m.kf_pt[kf, a_idx1]
            pid2a = m.kf_pt[cand, a_idx2]
            p1ca = m.pt_pos[pid1a] @ t1[:3, :3].T + t1[:3, 3]
            p2ca = m.pt_pos[pid2a] @ t2[:3, :3].T + t2[:3, 3]
            cap2 = size_bucket(len(a_idx1), 256, 4, m.cap.n_features)
            n2 = min(len(a_idx1), cap2)
            pad2 = cap2 - n2
            p1c_o = np.pad(p1ca[:n2], ((0, pad2), (0, 0))).astype(np.float32)
            p2c_o = np.pad(p2ca[:n2], ((0, pad2), (0, 0))).astype(np.float32)
            valid_o = np.zeros(cap2, bool)
            valid_o[:n2] = True
            s1o = sf ** (2.0 * m.kf_kp_octave[kf, a_idx1[:n2]])
            s2o = sf ** (2.0 * m.kf_kp_octave[cand, a_idx2[:n2]])
            s1o = np.pad(s1o, (0, pad2), constant_values=1.0).astype(np.float32)
            s2o = np.pad(s2o, (0, pad2), constant_values=1.0).astype(np.float32)
            uv1 = m.kf_kp_xy[kf, a_idx1[:n2]]
            uv2 = m.kf_kp_xy[cand, a_idx2[:n2]]
            uv1 = np.pad(uv1, ((0, pad2), (0, 0))).astype(np.float32)
            uv2 = np.pad(uv2, ((0, pad2), (0, 0))).astype(np.float32)
            s12, inl, n_in = sim3_opt.optimize_sim3(
                res.s12, jnp.asarray(p1c_o), jnp.asarray(p2c_o),
                jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.asarray(1.0 / s1o), jnp.asarray(1.0 / s2o),
                jnp.asarray(valid_o), self.cam,
                fix_scale=cfg.fix_scale)
            if int(n_in) < cfg.min_sim3_inliers:
                continue

            # corrected pose of current KF: S_cw = S_12(cand->cur) * T_cand_w
            s_mw = sim3.from_se3(jnp.asarray(t2))
            s_cw = sim3.compose(np.asarray(s12), s_mw)

            # verify with loop-neighborhood projection (cc:420-474)
            total = self._count_neighborhood_matches(kf, cand, np.asarray(s_cw), w)
            if total >= cfg.min_total_matches:
                return True, cand, np.asarray(s_cw)
        return False, -1, None

    def _search_by_sim3(self, kf: int, cand: int, s12: np.ndarray,
                        matched1: np.ndarray, matched2: np.ndarray):
        """Mutual Sim3-guided projection matching between the current and
        candidate keyframes (ORBmatcher::SearchBySim3, th=7.5): each side's
        unmatched map points project into the other's image through the
        candidate Sim3; a pair survives only if both directions agree.
        `s12` maps cand-camera coords -> current-KF-camera coords.
        -> (idx1, idx2) arrays of NEW keypoint-slot pairs."""
        m = self.map

        def one_dir(src, dst, s_dst_src, matched_src):
            pids = m.kf_pt[src]
            safe = np.maximum(pids, 0)
            q_valid = (pids >= 0) & m.kf_kp_valid[src] & m.pt_valid[safe]
            q_valid[matched_src] = False
            best = kernels.search_by_sim3_dir(
                jnp.asarray(np.asarray(s_dst_src, np.float32)),
                jnp.asarray(m.kf_pose[src].astype(np.float32)),
                jnp.asarray(m.pt_pos[safe]), jnp.asarray(m.pt_desc[safe]),
                jnp.asarray(q_valid), jnp.asarray(m.pt_min_dist[safe]),
                jnp.asarray(m.pt_max_dist[safe]),
                kf_keypoints(m, dst), 7.5, self.cam,
                self.cfg.scale_factor, self.cfg.n_levels)
            return np.asarray(best)

        s21 = np.asarray(sim3.inverse(jnp.asarray(s12)))
        best_a = one_dir(kf, cand, s21, matched1)   # kf slot -> cand kp
        best_b = one_dir(cand, kf, s12, matched2)   # cand slot -> kf kp
        i1 = np.where(best_a >= 0)[0]
        s2 = best_a[i1]
        agree = best_b[s2] == i1
        return i1[agree].astype(np.int64), s2[agree].astype(np.int64)

    def _count_neighborhood_matches(self, kf: int, cand: int, s_cw: np.ndarray,
                                    w: np.ndarray) -> int:
        """Project all points of the candidate's covisible neighborhood into
        the current KF under the corrected pose; count matches."""
        m = self.map
        hood = [cand, *map(int, covisibility.covisible_neighbors(w, cand))]
        pts = np.unique(m.kf_pt[np.array(hood)])
        pts = pts[pts >= 0]
        pts = pts[m.pt_valid[pts]]
        if len(pts) == 0:
            return 0
        # every neighborhood point is projected (LoopClosing.cc:439-452
        # passes the full mvpLoopMapPoints); bucketed padding, no silent cap
        from orbslam2_tpu.frontend.local_mapping import size_bucket
        cap = size_bucket(len(pts), 4096, 4, m.cap.max_points)
        pts = pts[:cap]
        n = len(pts)
        pos = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, 8), np.uint32)
        valid = np.zeros(cap, bool)
        normal = np.zeros((cap, 3), np.float32)
        dmin = np.zeros(cap, np.float32)
        dmax = np.full(cap, 1.0, np.float32)
        pos[:n] = m.pt_pos[pts]
        desc[:n] = m.pt_desc[pts]
        valid[:n] = True
        normal[:n] = m.pt_normal[pts]
        dmin[:n] = m.pt_min_dist[pts]
        dmax[:n] = m.pt_max_dist[pts]
        tcw_corr = np.asarray(sim3.to_se3(jnp.asarray(s_cw))).astype(np.float32)
        info, res = kernels.search_local_points(
            jnp.asarray(tcw_corr), jnp.asarray(pos), jnp.asarray(desc),
            jnp.asarray(valid), jnp.asarray(normal), jnp.asarray(dmin), jnp.asarray(dmax),
            kf_keypoints(m, kf), jnp.zeros(m.cap.n_features, bool), 2.0, self.cam,
            self.cfg.scale_factor, self.cfg.n_levels)
        return int((np.asarray(res.assoc) >= 0).sum())

    # ------------------------------------------------------------------
    # CorrectLoop (LoopClosing.cc:500-760)
    # ------------------------------------------------------------------
    def _correct_loop(self, kf: int, loop_kf: int, s_cw: np.ndarray, w: np.ndarray):
        """All staging is batched numpy (geometry/sim3_np): at KITTI scale
        (~1400 KF / 14k edges / 150k pts) the per-element eager-JAX version
        was O(K + E + P) device dispatches — minutes of host time per loop."""
        m = self.map
        cfg = self.cfg
        window = [kf, *map(int, covisibility.covisible_neighbors(w, kf))]
        win_arr = np.array(window, np.int64)
        kmax = m.cap.max_keyframes

        # pre-correction poses: the NonCorrectedSim3 side (scale-1 Sim3,
        # LoopClosing.cc:575-578)
        pre_pose = m.kf_pose.astype(np.float32).copy()

        # Sim3 for every window KF: S_iw_corr = (T_i T_c^-1) * S_cw
        # (cc:544-585) — one batched compose
        t_ic = pre_pose[win_arr] @ sim3_np.se3_inverse(pre_pose[kf])
        corrected_w = t_ic @ np.asarray(s_cw, np.float32)  # [Kw, 4, 4]

        # remap window map points p' = S_corr^-1 (S_old p) (cc:589-629),
        # each point through its FIRST observing window KF (the reference's
        # mnCorrectedByKF guard)
        sub = m.kf_pt[win_arr]                           # [Kw, N]
        wi, sl = np.nonzero(sub >= 0)
        pids = sub[wi, sl]
        keep = m.pt_valid[pids]
        wi, pids = wi[keep], pids[keep]
        order = np.lexsort((wi, pids))
        pids_s, wi_s = pids[order], wi[order]
        first = np.ones(len(pids_s), bool)
        first[1:] = pids_s[1:] != pids_s[:-1]
        upids, uwi = pids_s[first], wi_s[first]
        remap = sim3_np.inverse(corrected_w) @ pre_pose[win_arr]  # [Kw,4,4]
        if len(upids):
            m.pt_pos[upids] = sim3_np.apply(remap[uwi], m.pt_pos[upids])
            m.mark_pts_dirty(upids)
        m.kf_pose[win_arr] = sim3_np.to_se3(corrected_w)

        # fuse loop-neighborhood points into the window (cc:651-675, 728-760)
        from orbslam2_tpu.frontend.local_mapping import LocalMapper, LocalMapperConfig
        hood = [loop_kf, *map(int, covisibility.covisible_neighbors(w, loop_kf))]
        hood_pts = np.unique(m.kf_pt[np.array(hood)])
        hood_pts = hood_pts[hood_pts >= 0]
        hood_pts = hood_pts[m.pt_valid[hood_pts]]
        fuser = LocalMapper.__new__(LocalMapper)
        fuser.map = m
        fuser.cam = self.cam
        fuser.cfg = LocalMapperConfig(scale_factor=cfg.scale_factor, n_levels=cfg.n_levels)
        # loop correction runs under the caller's map lock already; the
        # fuser's own stage locks must be re-entrant with it
        fuser.map_lock = getattr(self, "map_lock", None) \
            or __import__("threading").RLock()
        fuser._fuse_points_into_targets(hood_pts, window)

        # essential-graph optimization (cc:680-703 -> Optimizer.cc:885)
        w2 = covisibility.weight_matrix(m)
        edges = covisibility.essential_edges(m, w2)
        edges.append((min(kf, loop_kf), max(kf, loop_kf)))
        edges = sorted(set(edges))
        old_loop_pairs = {(min(a, b), max(a, b))
                          for a in range(kmax) for b in m.kf_loop_edges[a]}
        m.kf_loop_edges[kf].add(loop_kf)
        m.kf_loop_edges[loop_kf].add(kf)

        # current-state Sim3 per KF (vScw, Optimizer.cc:931-956): corrected
        # WITH scale for window KFs, the (unchanged) pose elsewhere
        cur_sim3 = m.kf_pose.astype(np.float32).copy()
        cur_sim3[win_arr] = corrected_w
        e_i = np.array([e[0] for e in edges], np.int32)
        e_j = np.array([e[1] for e in edges], np.int32)
        # NonCorrectedSim3 semantics (Optimizer.cc:958-1058): edges that
        # existed BEFORE the loop (spanning tree, prior covisibility, old
        # loop edges) measure the pre-correction relative pose; connections
        # newly created by the loop fusion (LoopConnections, cc:680-703) and
        # the loop edge itself measure the corrected relatives.
        parent_pair = (m.kf_parent[e_i] == e_j) | (m.kf_parent[e_j] == e_i)
        pre_covis = w[e_i, e_j] >= covisibility.COVIS_THRESHOLD
        prev_loop = np.array([(int(a), int(b)) in old_loop_pairs
                              for a, b in zip(e_i, e_j)], bool)
        is_new = ~(parent_pair | pre_covis | prev_loop)
        is_new[(e_i == min(kf, loop_kf)) & (e_j == max(kf, loop_kf))] = True
        s_a = np.where(is_new[:, None, None], cur_sim3[e_i], pre_pose[e_i])
        s_b = np.where(is_new[:, None, None], cur_sim3[e_j], pre_pose[e_j])
        meas = (s_b @ sim3_np.inverse(s_a)).astype(np.float32)

        kf_fixed = np.zeros(kmax, bool)
        kf_fixed[loop_kf] = True
        new_sim3, _ = pose_graph.optimize_essential_graph(
            jnp.asarray(cur_sim3), jnp.asarray(m.kf_valid),
            jnp.asarray(kf_fixed), jnp.asarray(e_i), jnp.asarray(e_j),
            jnp.asarray(meas), jnp.ones(len(e_i), bool),
            fix_scale=cfg.fix_scale)
        new_sim3 = np.asarray(new_sim3)

        # apply: remap every point via its reference KF correction
        # (Optimizer.cc:1122-1152) — one gathered einsum — then poses
        remap_k = sim3_np.inverse(new_sim3) @ cur_sim3     # [K, 4, 4]
        pids = np.where(m.pt_valid)[0]
        refs = m.pt_ref_kf[pids]
        good = (refs >= 0) & m.kf_valid[np.maximum(refs, 0)]
        pids, refs = pids[good], refs[good]
        m.pt_pos[pids] = sim3_np.apply(remap_k[refs], m.pt_pos[pids])
        m.mark_all_pts_dirty()
        valid = m.kf_valid
        m.kf_pose[valid] = sim3_np.to_se3(new_sim3[valid])
        m.correction_gen += 1  # invalidate in-flight unlocked solves
        m.change_index += 1

        # global BA (cc:717 RunGlobalBundleAdjustment): on a map snapshot,
        # async when configured (the reference spawns a thread)
        if cfg.run_global_ba:
            self.request_global_ba(fixed_kf=loop_kf)

    # ------------------------------------------------------------------
    # Global BA with abort-and-rerun (RunGlobalBundleAdjustment,
    # LoopClosing.cc:792-896). The BA runs on a functional snapshot of the
    # map (cheap: the map IS arrays); a loop closure that lands while it
    # runs bumps full_ba_idx, superseding the in-flight run — its results
    # are discarded at apply time (the bounded-iteration device program is
    # the abort analogue of the reference's pbStopFlag). On an up-to-date
    # completion, corrections propagate through the spanning tree to
    # keyframes and points created during the run (cc:824-884).
    # ------------------------------------------------------------------
    def request_global_ba(self, fixed_kf: int) -> None:
        self.full_ba_idx += 1  # supersedes any in-flight GBA
        snap = self._snapshot_gba(fixed_kf, self.full_ba_idx)
        if snap is None:
            return
        if self.cfg.async_gba:
            self.wait_gba()  # one in-flight run at a time
            t = threading.Thread(target=self._run_gba, args=(snap,),
                                 daemon=True, name="gba-worker")
            self._gba_thread = t
            t.start()
        else:
            self._run_gba(snap)

    def wait_gba(self, timeout: float = 300.0) -> None:
        t = self._gba_thread
        if t is not None and t.is_alive():
            t.join(timeout)

    def _snapshot_gba(self, fixed_kf: int, idx: int):
        """Build the BA problem from the current map state. Caller holds
        the map lock (or is single-threaded)."""
        m = self.map
        cfg = self.cfg
        kmax = m.cap.max_keyframes
        ks, slots = np.where(m.kf_pt >= 0)
        pids = m.kf_pt[ks, slots]
        keep = m.kf_valid[ks] & m.pt_valid[pids]
        ks, slots, pids = ks[keep], slots[keep], pids[keep]
        n_obs = len(ks)
        if cfg.gba_max_obs is not None and n_obs > cfg.gba_max_obs:
            import logging
            logging.getLogger("orbslam2_tpu").warning(
                "GBA observations truncated: %d -> %d", n_obs,
                cfg.gba_max_obs)
            n_obs = cfg.gba_max_obs
            ks, slots, pids = ks[:n_obs], slots[:n_obs], pids[:n_obs]
        if n_obs < 100:
            return None
        from orbslam2_tpu.frontend.local_mapping import size_bucket
        obs_cap = size_bucket(n_obs, 16384, 4,
                              cfg.gba_max_obs if cfg.gba_max_obs else None)
        o_cam = np.zeros(obs_cap, np.int32)
        o_pt = np.zeros(obs_cap, np.int32)
        o_uv = np.zeros((obs_cap, 3), np.float32)
        o_sig = np.ones(obs_cap, np.float32)
        o_st = np.zeros(obs_cap, bool)
        o_val = np.zeros(obs_cap, bool)
        o_cam[:n_obs] = ks[:n_obs]
        o_pt[:n_obs] = pids[:n_obs]
        ur = m.kf_kp_ur[ks[:n_obs], slots[:n_obs]]
        o_uv[:n_obs, :2] = m.kf_kp_xy[ks[:n_obs], slots[:n_obs]]
        o_uv[:n_obs, 2] = np.maximum(ur, -1.0)
        o_sig[:n_obs] = (1.0 / cfg.scale_factor ** 2) ** m.kf_kp_octave[
            ks[:n_obs], slots[:n_obs]]
        o_st[:n_obs] = ur >= 0
        o_val[:n_obs] = True

        cam_fixed = np.zeros(kmax, bool)
        cam_fixed[fixed_kf] = True
        cam_fixed[~m.kf_valid] = True
        pt_fixed = ~m.pt_valid

        problem = BAProblem(
            poses=jnp.asarray(m.kf_pose.astype(np.float32)),
            points=jnp.asarray(m.pt_pos.astype(np.float32)),
            cam_fixed=jnp.asarray(cam_fixed),
            obs_cam=jnp.asarray(o_cam), obs_pt=jnp.asarray(o_pt),
            obs_uv=jnp.asarray(o_uv), obs_inv_sigma2=jnp.asarray(o_sig),
            obs_stereo=jnp.asarray(o_st), obs_valid=jnp.asarray(o_val))
        return {
            "idx": idx,
            "fixed_kf": fixed_kf,
            "problem": problem,
            "pt_fixed": pt_fixed,
            "kf_in": m.kf_valid.copy(),
            "kf_order": m.kf_order.copy(),
            "pt_in": m.pt_valid.copy(),
            "pt_stamp": m.pt_stamp.copy(),
        }

    def _run_gba(self, snap) -> None:
        res = ba.bundle_adjust_pcg(snap["problem"], self.cam, phase_iters=(5, 5),
                                   point_fixed=jnp.asarray(snap["pt_fixed"]))
        new_poses = np.asarray(res.poses)
        new_points = np.asarray(res.points)
        with self.map_lock:
            if snap["idx"] != self.full_ba_idx:
                self.n_gba_superseded += 1  # a newer loop landed: discard
                return
            self._apply_gba(snap, new_poses, new_points)
            self.n_gba_applied += 1
            self.map.change_index += 1

    def _apply_gba(self, snap, new_poses: np.ndarray, new_points: np.ndarray) -> None:
        """Write GBA results into the (possibly grown) map. KFs/points the
        snapshot covered take their optimized values; ones created during
        the run are corrected through the spanning tree / reference-KF
        chain (LoopClosing.cc:824-884)."""
        m = self.map
        # keyframes covered by the snapshot, still alive in the same slot
        covered = snap["kf_in"] & m.kf_valid & (m.kf_order == snap["kf_order"])
        old_pose = m.kf_pose.copy()   # poses at apply time
        corrected = dict()            # kf -> new pose
        for k in np.where(covered)[0]:
            corrected[int(k)] = new_poses[k]
        # new keyframes in insertion order: T_new = (T_old T_parent_old^-1) T_parent_new
        fresh = m.kf_valid & ~covered
        for k in np.argsort(m.kf_order):
            if not fresh[k]:
                continue
            par = int(m.kf_parent[k])
            if par < 0 or par not in corrected:
                continue  # rootless: leave untouched
            t_rel = old_pose[k] @ np.linalg.inv(old_pose[par])
            corrected[int(k)] = (t_rel @ corrected[par]).astype(np.float32)
        # points covered by the snapshot take the optimized positions
        pt_cov = snap["pt_in"] & m.pt_valid & (m.pt_stamp == snap["pt_stamp"])
        m.pt_pos[pt_cov] = new_points[pt_cov]
        # points created during the run: remap via their reference KF —
        # batched p' = T_new^-1 (T_old p) over one gathered einsum
        corr_mask = np.zeros(m.cap.max_keyframes, bool)
        corr_pose = np.zeros_like(m.kf_pose, dtype=np.float32)
        for k, pose in corrected.items():
            corr_mask[k] = True
            corr_pose[k] = pose
        pt_fresh = np.where(m.pt_valid & ~pt_cov)[0]
        refs = m.pt_ref_kf[pt_fresh]
        good = (refs >= 0) & corr_mask[np.maximum(refs, 0)]
        pt_fresh, refs = pt_fresh[good], refs[good]
        if len(pt_fresh):
            remap = sim3_np.se3_inverse(corr_pose[refs]) @ old_pose[refs]
            m.pt_pos[pt_fresh] = sim3_np.apply(remap, m.pt_pos[pt_fresh])
        m.mark_all_pts_dirty()
        for k, pose in corrected.items():
            m.kf_pose[k] = pose
        m.correction_gen += 1  # invalidate in-flight unlocked solves
