"""Keyframe database: place-recognition index over bag-of-words vectors.

Replaces DBoW2's inverted file + KeyFrameDatabase
(/root/reference/src/KeyFrameDatabase.cc). The reference walks per-word
lists of keyframes (mvInvertedFile); here the whole database is a dense
[K, n_words] tf-idf matrix, so shared-word counts and L1 scores against all
keyframes are two vectorized passes — the array form of the inverted file.

Candidate selection mirrors DetectLoopCandidates (cc:80-229) and
DetectRelocalizationCandidates (cc:234-349): 0.8*maxCommonWords gate,
min-score gate, covisibility-group score accumulation over the top-10
neighbors, 0.75*bestAccScore final cut.
"""
from __future__ import annotations

from typing import List

import numpy as np

from orbslam2_tpu.place.vocabulary import Vocabulary
from orbslam2_tpu.slammap import covisibility


class KeyFrameDatabase:
    def __init__(self, voc: Vocabulary, max_keyframes: int):
        self.voc = voc
        self.bow = np.zeros((max_keyframes, voc.n_words), np.float32)
        self.has_word = np.zeros((max_keyframes, voc.n_words), bool)
        self.valid = np.zeros(max_keyframes, bool)

    def add(self, kf: int, word_ids: np.ndarray) -> None:
        self.bow[kf] = self.voc.bow_vector(word_ids)
        self.has_word[kf] = self.bow[kf] > 0
        self.valid[kf] = True

    def erase(self, kf: int) -> None:
        self.valid[kf] = False
        self.bow[kf] = 0
        self.has_word[kf] = False

    def score_against_all(self, v: np.ndarray) -> np.ndarray:
        """L1 similarity of query vector v against every stored KF."""
        s = 1.0 - 0.5 * np.abs(self.bow - v[None, :]).sum(axis=1)
        return np.where(self.valid, s, -1.0)

    # ------------------------------------------------------------------
    def _group_and_select(self, cand_mask: np.ndarray, scores: np.ndarray,
                          w: np.ndarray) -> List[int]:
        """Covisibility-group score accumulation + 0.75*best cut."""
        cands = np.where(cand_mask)[0]
        if len(cands) == 0:
            return []
        acc_best_kf = np.zeros(len(cands), np.int64)
        acc_scores = np.zeros(len(cands), np.float32)
        for i, c in enumerate(cands):
            group = [c, *covisibility.best_covisible(w, int(c), 10)]
            g_scores = [scores[g] if cand_mask[g] else 0.0 for g in group]
            acc_scores[i] = float(np.sum(g_scores))
            acc_best_kf[i] = group[int(np.argmax(g_scores))]
        best_acc = acc_scores.max()
        keep = acc_scores > 0.75 * best_acc
        out: List[int] = []
        for kf in acc_best_kf[keep]:
            if kf not in out:
                out.append(int(kf))
        return out

    # ------------------------------------------------------------------
    def detect_loop_candidates(self, kf: int, min_score: float,
                               w: np.ndarray, m,
                               exclude_mask: np.ndarray | None = None,
                               query_bow: np.ndarray | None = None) -> List[int]:
        """Loop candidates for keyframe kf, excluding its covisible set.

        `exclude_mask`: extra exclusions (e.g. temporally recent keyframes —
        in the reference these are implicitly excluded because its denser
        covisibility graph marks them as connected).
        `query_bow`: the query's bow vector — required when kf has not been
        added to the database yet (detection runs before insertion,
        LoopClosing.cc:270-276)."""
        v = query_bow if query_bow is not None else self.bow[kf]
        hw = v > 0
        common = (self.has_word & hw[None, :]).sum(axis=1)
        connected = np.zeros(len(self.valid), bool)
        connected[w[kf] > 0] = True
        connected[kf] = True
        if exclude_mask is not None:
            connected |= exclude_mask
        eligible = self.valid & ~connected & (common > 0)
        if not eligible.any():
            return []
        max_common = common[eligible].max()
        min_common = 0.8 * max_common
        scores = self.score_against_all(v)
        cand_mask = eligible & (common > min_common) & (scores >= min_score)
        return self._group_and_select(cand_mask, scores, w)

    def detect_reloc_candidates(self, word_ids: np.ndarray, w: np.ndarray) -> List[int]:
        """Relocalization candidates for an untracked frame."""
        v = self.voc.bow_vector(word_ids)
        hw = v > 0
        common = (self.has_word & hw[None, :]).sum(axis=1)
        eligible = self.valid & (common > 0)
        if not eligible.any():
            return []
        max_common = common[eligible].max()
        cand_mask = eligible & (common > 0.8 * max_common)
        scores = self.score_against_all(v)
        return self._group_and_select(cand_mask, scores, w)
