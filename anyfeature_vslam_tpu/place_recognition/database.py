"""Keyframe database: loop / relocalization candidate retrieval.

Replaces the reference KeyFrameDatabase (reference
src/KeyFrameDatabase.cc:33-309). The DBoW2 inverted file becomes a dense
(max_kf, n_words) bow matrix + a (max_kf, n_words) word-presence bitmap, so
"shared word counts" and L1 scores against ALL keyframes are two vectorized
reductions. Selection semantics mirror the reference:

  loop candidates (KeyFrameDatabase.cc:76-197):
    - exclude the query's covisible keyframes
    - shared-word count >= 0.8 * max shared
    - L1 score >= minScore (min score of query vs its covisibles)
    - accumulate scores over each candidate's 10 best covisibles; keep
      groups with accScore > 0.75 * bestAccScore (best member returned)

  relocalization candidates (KeyFrameDatabase.cc:199-309): same without the
  covisibility exclusion / minScore gate.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import vocab as vocab_mod


class KeyFrameDatabase:
    def __init__(self, vocabulary: vocab_mod.Vocabulary, max_kf: int):
        self.vocab = vocabulary
        self.max_kf = max_kf
        self.bow = np.zeros((max_kf, vocabulary.n_words), np.float32)
        self.has_word = np.zeros((max_kf, vocabulary.n_words), bool)
        self.present = np.zeros(max_kf, bool)

    def compute_bow(self, desc_bits, valid):
        """(bow vector, word-presence mask) for a frame/keyframe."""
        words = np.asarray(
            vocab_mod.transform_words(self.vocab, jnp.asarray(desc_bits), jnp.asarray(valid))
        )
        bow = np.asarray(
            vocab_mod.bow_from_words(jnp.asarray(words), jnp.asarray(self.vocab.idf))
        )
        mask = np.zeros(self.vocab.n_words, bool)
        mask[words[words >= 0]] = True
        return bow, mask

    def add(self, kf: int, desc_bits, valid):
        bow, mask = self.compute_bow(desc_bits, valid)
        self.bow[kf] = bow
        self.has_word[kf] = mask
        self.present[kf] = True

    def erase(self, kf: int):
        self.present[kf] = False

    def _shared_and_scores(self, bow_q, words_q_mask, exclude):
        cand = self.present & ~exclude
        shared = (self.has_word & words_q_mask[None, :]).sum(-1)
        shared = np.where(cand, shared, 0)
        scores = np.asarray(vocab_mod.l1_score(jnp.asarray(bow_q), jnp.asarray(self.bow)))
        return cand, shared, scores

    def _query(self, bow_q, word_mask, exclude, min_score, covis_groups):
        cand, shared, scores = self._shared_and_scores(bow_q, word_mask, exclude)
        if shared.max(initial=0) == 0:
            return []
        min_common = 0.8 * shared.max()
        ok = cand & (shared > min_common) & (scores >= min_score)
        if not ok.any():
            return []
        # accumulate over covisibility groups
        acc_best = []
        for kf in np.nonzero(ok)[0]:
            group = [kf] + [g for g in covis_groups.get(int(kf), []) if ok[g] or (cand[g] and shared[g] > min_common)]
            acc = float(scores[group].sum())
            best_kf = int(group[int(np.argmax(scores[group]))])
            acc_best.append((acc, best_kf))
        best_acc = max(a for a, _ in acc_best)
        th = 0.75 * best_acc
        out, seen = [], set()
        for acc, kf in acc_best:
            if acc > th and kf not in seen:
                seen.add(kf)
                out.append(kf)
        return out

    def detect_loop_candidates(self, kf: int, slam_map, min_score: float):
        """Candidates for closing a loop at `kf` (excludes covisibles).

        The query keyframe need not be in the database yet (the reference
        also adds it only after detection, LoopClosing.cc:235); its bow is
        computed from the map's stored descriptors.
        """
        bow_q, mask_q = self._kf_bow(kf, slam_map)
        cov, _ = slam_map.covisible_keyframes(kf, min_weight=15)
        exclude = np.zeros(self.max_kf, bool)
        exclude[kf] = True
        exclude[cov] = True
        covis_groups = self._covis_groups(slam_map)
        return self._query(bow_q, mask_q, exclude, min_score, covis_groups)

    def _kf_bow(self, kf: int, slam_map):
        if self.present[kf]:
            return self.bow[kf], self.has_word[kf]
        return self.compute_bow(
            slam_map.kf_desc_bits[kf], slam_map.kf_feat_valid[kf]
        )

    def detect_relocalization_candidates(self, desc_bits, valid, slam_map):
        bow_q, mask = self.compute_bow(desc_bits, valid)
        exclude = np.zeros(self.max_kf, bool)
        covis_groups = self._covis_groups(slam_map)
        return self._query(bow_q, mask, exclude, 0.0, covis_groups)

    def _covis_groups(self, slam_map, top: int = 10):
        groups = {}
        for kf in np.nonzero(self.present)[0]:
            if not slam_map.kf_valid[kf]:
                continue
            cov, _ = slam_map.covisible_keyframes(int(kf), min_weight=15, max_n=top)
            groups[int(kf)] = [int(c) for c in cov]
        return groups

    def min_score_vs_covisibles(self, kf: int, slam_map) -> float:
        """Reference DetectLoop: minScore = min BoW score between the new KF
        and its covisibles (LoopClosing.cc:136-151)."""
        cov, _ = slam_map.covisible_keyframes(kf, min_weight=15)
        cov = [int(c) for c in cov if self.present[c]]
        if len(cov) == 0:
            return 0.0
        bow_q, _ = self._kf_bow(kf, slam_map)
        scores = np.asarray(
            vocab_mod.l1_score(jnp.asarray(bow_q), jnp.asarray(self.bow[cov]))
        )
        return float(scores.min())
