"""Keyframe database: loop / relocalization candidate retrieval.

Replaces the reference KeyFrameDatabase (reference
src/KeyFrameDatabase.cc:33-309). The DBoW2 inverted file becomes SPARSE
per-keyframe word lists: each keyframe stores its ~n_feat (word id, tf-idf
weight) pairs in fixed-width arrays, so memory and query cost scale with
keyframes * features-per-frame, NOT with vocabulary size — a 32k- or
1M-word vocabulary costs the same per query. Scoring uses the identity
L1score(a, b) = 1 - 0.5*|a - b|_1 = sum over common words of min(a_w, b_w)
for L1-normalized nonnegative vectors, evaluated as one gather + min + sum
over the (max_kf, W) sparse tables against a dense query vector.
Selection semantics mirror the reference:

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
        # sparse per-KF word lists: ids (-1 pad) + L1-normalized tf-idf
        # weights, width grown on demand
        self._cap = 64
        self.kf_words = np.full((max_kf, self._cap), -1, np.int32)
        self.kf_weights = np.zeros((max_kf, self._cap), np.float32)
        self.present = np.zeros(max_kf, bool)

    def dispatch_bow(self, desc_bits, valid):
        """Launch the vocabulary tree descent on device, returning the
        word-id device array WITHOUT waiting (pair with bow_from_words; the
        threaded loop stage folds it one keyframe later so no event blocks
        on the tunnel round trip)."""
        words = vocab_mod.transform_words(
            self.vocab, jnp.asarray(desc_bits), jnp.asarray(valid)
        )
        try:
            words.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        return words

    def bow_from_words(self, words):
        """Sparse bow (unique word ids, L1-normalized tf-idf weights) from a
        fetched word-id array."""
        words = np.asarray(words)
        ids, counts = np.unique(words[words >= 0], return_counts=True)
        w = counts.astype(np.float32) * self.vocab.idf[ids]
        norm = np.abs(w).sum()
        if norm > 0:
            w = w / norm
        return ids.astype(np.int32), w

    def compute_bow(self, desc_bits, valid):
        """Sparse bow: (unique word ids, L1-normalized tf-idf weights).

        One device dispatch + readback; callers that need a keyframe's bow
        more than once per event (loop detection THEN add — reference
        LoopClosing computes mBowVec once in ProcessNewKeyFrame) should
        compute it once and pass it through `bow=`."""
        from anyfeature_vslam_tpu import perfcount

        words_dev = self.dispatch_bow(desc_bits, valid)
        with perfcount.timed_fetch():
            words = np.asarray(words_dev)
        return self.bow_from_words(words)

    def add(self, kf: int, desc_bits=None, valid=None, bow=None):
        while kf >= self.max_kf:
            # track SlamMap keyframe-capacity growth
            self.kf_words = np.pad(
                self.kf_words, ((0, self.max_kf), (0, 0)), constant_values=-1
            )
            self.kf_weights = np.pad(self.kf_weights, ((0, self.max_kf), (0, 0)))
            self.present = np.pad(self.present, (0, self.max_kf))
            self.max_kf *= 2
        ids, w = bow if bow is not None else self.compute_bow(desc_bits, valid)
        while len(ids) > self._cap:
            self.kf_words = np.pad(
                self.kf_words, ((0, 0), (0, self._cap)), constant_values=-1
            )
            self.kf_weights = np.pad(self.kf_weights, ((0, 0), (0, self._cap)))
            self._cap *= 2
        self.kf_words[kf] = -1
        self.kf_weights[kf] = 0.0
        self.kf_words[kf, : len(ids)] = ids
        self.kf_weights[kf, : len(ids)] = w
        self.present[kf] = True

    def erase(self, kf: int):
        self.present[kf] = False

    def _shared_and_scores(self, bow_q, exclude):
        """bow_q: sparse (ids, weights) query. One gather over the sparse
        tables gives shared-word counts and L1 scores for ALL keyframes."""
        ids_q, w_q = bow_q
        cand = self.present & ~exclude
        q_w = np.zeros(self.vocab.n_words, np.float32)
        q_w[ids_q] = w_q
        q_has = np.zeros(self.vocab.n_words, bool)
        q_has[ids_q] = True
        valid_slot = self.kf_words >= 0
        wi = np.maximum(self.kf_words, 0)
        common = valid_slot & q_has[wi]
        shared = np.where(cand, common.sum(-1), 0)
        scores = np.where(common, np.minimum(q_w[wi], self.kf_weights), 0.0).sum(-1)
        return cand, shared, scores.astype(np.float32)

    def _query(self, bow_q, exclude, min_score, covis_groups,
               order_by_score: bool = False):
        cand, shared, scores = self._shared_and_scores(bow_q, exclude)
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
        # order_by_score: relocalization truncates to a fixed candidate
        # capacity, so slot order could drop the best match (the reference
        # iterates ALL candidates round-robin, src/Tracking.cc:1146-1309;
        # score order preserves the top ones under fixed-capacity
        # batching). Loop detection keeps insertion order: its consumers
        # try every candidate anyway.
        ranked = (sorted(acc_best, key=lambda x: -x[0])
                  if order_by_score else acc_best)
        for acc, kf in ranked:
            if acc > th and kf not in seen:
                seen.add(kf)
                out.append(kf)
        return out

    def detect_loop_candidates(self, kf: int, slam_map, min_score: float,
                               bow_q=None):
        """Candidates for closing a loop at `kf` (excludes covisibles).

        The query keyframe need not be in the database yet (the reference
        also adds it only after detection, LoopClosing.cc:235); its bow is
        computed from the map's stored descriptors.
        """
        if bow_q is None:
            bow_q = self._kf_bow(kf, slam_map)
        cov, _ = slam_map.covisible_keyframes(kf, min_weight=15)
        # the map may have grown past the database arrays between adds;
        # out-of-range ids cannot be in the database anyway
        exclude = np.zeros(self.max_kf, bool)
        if kf < self.max_kf:
            exclude[kf] = True
        cov = np.asarray(cov)
        exclude[cov[cov < self.max_kf]] = True
        covis_groups = self._covis_groups(slam_map)
        return self._query(bow_q, exclude, min_score, covis_groups)

    def _kf_bow(self, kf: int, slam_map):
        if kf < self.max_kf and self.present[kf]:
            v = self.kf_words[kf] >= 0
            return self.kf_words[kf][v], self.kf_weights[kf][v]
        return self.compute_bow(
            slam_map.kf_desc_bits[kf], slam_map.kf_feat_valid[kf]
        )

    def detect_relocalization_candidates(self, desc_bits, valid, slam_map):
        bow_q = self.compute_bow(desc_bits, valid)
        exclude = np.zeros(self.max_kf, bool)
        covis_groups = self._covis_groups(slam_map)
        return self._query(bow_q, exclude, 0.0, covis_groups,
                           order_by_score=True)

    def _covis_groups(self, slam_map, top: int = 10):
        """Top-covisible groups for every present keyframe, from ONE native
        covisibility-matrix pass; cached on the map revision (the per-query
        rebuild was the dominant loop-detection cost at ~30 keyframes)."""
        cache = getattr(self, "_groups_cache", None)
        rev = getattr(slam_map, "rev", None)
        if cache is not None and rev is not None and cache[0] == rev:
            return cache[1]
        from anyfeature_vslam_tpu import native

        groups = {}
        w = None
        if hasattr(slam_map, "kf_matches"):  # test fakes expose only the API
            w = native.covisibility_matrix(
                slam_map.kf_matches, slam_map.kf_valid, slam_map.max_pt
            )
        present = np.nonzero(self.present)[0]
        if w is not None:
            for kf in present:
                kf = int(kf)
                if kf >= w.shape[0] or not slam_map.kf_valid[kf]:
                    continue
                row = w[kf].copy()
                row[kf] = 0
                ids = np.nonzero(row >= 15)[0]
                ids = ids[np.argsort(-row[ids], kind="stable")][:top]
                groups[kf] = [int(c) for c in ids if c < self.max_kf]
        else:
            for kf in present:
                if not slam_map.kf_valid[kf]:
                    continue
                cov, _ = slam_map.covisible_keyframes(
                    int(kf), min_weight=15, max_n=top
                )
                groups[int(kf)] = [int(c) for c in cov if c < self.max_kf]
        self._groups_cache = (rev, groups)
        return groups

    def min_score_vs_covisibles(self, kf: int, slam_map, bow_q=None) -> float:
        """Reference DetectLoop: minScore = min BoW score between the new KF
        and its covisibles (LoopClosing.cc:136-151)."""
        cov, _ = slam_map.covisible_keyframes(kf, min_weight=15)
        cov = [int(c) for c in cov if c < self.max_kf and self.present[c]]
        if len(cov) == 0:
            return 0.0
        ids_q, w_q = bow_q if bow_q is not None else self._kf_bow(kf, slam_map)
        q_w = np.zeros(self.vocab.n_words, np.float32)
        q_w[ids_q] = w_q
        wi = np.maximum(self.kf_words[cov], 0)
        common = (self.kf_words[cov] >= 0) & (q_w[wi] > 0)
        scores = np.where(
            common, np.minimum(q_w[wi], self.kf_weights[cov]), 0.0
        ).sum(-1)
        return float(scores.min())
