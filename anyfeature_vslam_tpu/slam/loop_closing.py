"""Loop closing: detection, Sim3 computation, loop correction, global BA.

Synchronous counterpart of the reference LoopClosing thread (reference
src/LoopClosing.cc:64-763):
  - DetectLoop (:119-245): BoW candidates above the min covisible score,
    covisibility-consistency across 3 consecutive keyframes
  - ComputeSim3 (:247-416): descriptor matches between the KFs' map points
    (>=20), Sim3 RANSAC (>=20 inliers; monocular scale free)
  - CorrectLoop (:418-599): propagate the corrected Sim3 to the current
    KF's covisible group, transform their points, fuse duplicated points,
    essential-graph optimization (ops/pose_graph), then global BA
    (reference spawns a thread :593; here it runs bounded, inline)

The reference's spanning tree is approximated by the insertion-order chain
plus strong covisibility edges (weight >= 100, reference Optimizer.cc:46).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from anyfeature_vslam_tpu.ops import se3 as se3_ops
from anyfeature_vslam_tpu.ops import sim3 as sim3_ops
from anyfeature_vslam_tpu.ops import pose_graph
from . import frame_ops
from .local_mapping import run_bundle_adjustment

MIN_BOW_MATCHES = 20      # reference LoopClosing.cc:283
MIN_SIM3_INLIERS = 20     # reference LoopClosing.cc:345
MIN_TOTAL_MATCHES = 40    # reference LoopClosing.cc:401 (projection gate)
CONSISTENCY_TH = 3        # reference LoopClosing.cc:46
COVIS_EDGE_MIN_WEIGHT = 100  # reference Optimizer.cc:46 (minFeat)
SIM3_SEARCH_RADIUS = 7.5  # reference LoopClosing.cc:324 (SearchBySim3 th)
PROJ_GATE_RADIUS = 10.0   # reference LoopClosing.cc:393 (SearchByProjection th)
FUSE_RADIUS = 4.0         # reference LoopClosing.cc:617 (SearchAndFuse th)



def _pad_pairs(arrays, n, schedule=(64, 256, 1024)):
    """Pad per-pair arrays to a coarse bucket with a valid mask: the sim3
    solvers are jit programs, and calling them at the EXACT pair count
    compiles a fresh XLA program per loop attempt (measured as multi-
    second stalls the first time a loop fires in a process)."""
    cap = schedule[-1]
    for c in schedule:
        if n <= c:
            cap = c
            break
    while cap < n:
        cap *= 2
    out = []
    for a in arrays:
        pad = np.zeros((cap,) + a.shape[1:], a.dtype)
        pad[:n] = a
        out.append(pad)
    valid = np.zeros(cap, bool)
    valid[:n] = True
    return out, valid


class LoopCloser:
    def __init__(self, slam_map, cam, database, match_th: float = 75.0,
                 seed: int = 0, mesh=None, lock=None):
        import threading

        self.map = slam_map
        self.cam = cam
        self.mesh = mesh  # optional device mesh: global BA runs sharded
        self.db = database
        self.match_th = match_th
        self.seed = seed
        # serializes map MUTATIONS against the tracker (System passes its
        # map_lock in threaded mode). Detection / Sim3 computation read the
        # map lock-free — the same transient-staleness class the tracker's
        # own lock-free reads accept; the lock is held only around the
        # deferred-fold landing (pre_mutate) and the actual loop
        # correction, so the ~15-30 ms/KF detection stage never stalls
        # keyframe minting on the tracking thread.
        self.lock = lock if lock is not None else threading.RLock()
        self.consistent_groups: list[tuple[set, int]] = []
        self._pending_merge = None
        self._loop_points = None
        self.last_loop_kf = -1000
        self.n_loops_closed = 0
        self.debug = False
        # threaded mode: the BoW transform is dispatched at keyframe N's
        # event and FOLDED (fetched + database-inserted + detection run) at
        # keyframe N+1's event — one keyframe of loop-closing latency (the
        # reference's LoopClosing queue has the same latency class,
        # src/LoopClosing.cc:106-111) in exchange for a worker event with
        # zero blocking device round trips
        self.deferred_bow = False
        self._pending_bow = None
        # when set (System wires it to the LocalMapper's pending-fold slot),
        # the post-loop global BA is dispatched asynchronously and folded
        # back before the next map mutation — the TPU-native counterpart of
        # the reference's detached GBA thread (src/LoopClosing.cc:589-593,
        # RunGlobalBundleAdjustment :659-763). Keyframes created while the
        # solve runs are corrected at fold time by walking the spanning
        # tree from their corrected parents, and mid-solve points via
        # their reference keyframe's old/new pose pair — the reference's
        # exact scheme (src/LoopClosing.cc:683-744); see _propagate_gba.
        self.defer_ba_sink = None

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int, pre_mutate=None) -> bool:
        """Returns True if a loop was closed at this keyframe.

        pre_mutate: optional callback invoked before any pose/point reads
        or mutations (used to land a deferred local-BA fold — the
        counterpart of the reference stopping LocalMapping before
        CorrectLoop, src/LoopClosing.cc:424-445)."""
        if self.deferred_bow:
            closed = False
            prev, self._pending_bow = self._pending_bow, None
            if prev is not None:
                pkf, puid, words = prev
                if (
                    self.map.kf_valid[pkf]
                    and int(self.map.kf_uid[pkf]) == puid
                ):
                    bow = self.db.bow_from_words(words)
                    closed = self._process_with_bow(pkf, bow, pre_mutate)
            self._pending_bow = (
                kf, int(self.map.kf_uid[kf]),
                self.db.dispatch_bow(
                    self.map.kf_desc_bits[kf], self.map.kf_feat_valid[kf]
                ),
            )
            return closed
        # synchronous mode: the keyframe's bow is computed ONCE per event
        # and shared by detection and the database insert (each compute is
        # a device dispatch + readback; round 3 paid it twice per keyframe)
        bow = self.db.compute_bow(
            self.map.kf_desc_bits[kf], self.map.kf_feat_valid[kf]
        )
        return self._process_with_bow(kf, bow, pre_mutate)

    def flush_bow(self):
        """Land a deferred BoW (database insert only — no detection) so
        shutdown/reset leaves the retrieval database complete."""
        prev, self._pending_bow = self._pending_bow, None
        if prev is not None:
            pkf, puid, words = prev
            if self.map.kf_valid[pkf] and int(self.map.kf_uid[pkf]) == puid:
                self.db.add(pkf, bow=self.db.bow_from_words(words))

    def _process_with_bow(self, kf: int, bow, pre_mutate=None) -> bool:
        closed = False
        uid = int(self.map.kf_uid[kf])
        if (
            self.map.n_keyframes() > 10
            # >=10 keyframes since the last closure (reference
            # LoopClosing.cc:128) — by stable uid, NOT slot (slots recycle)
            and uid - self.last_loop_kf > 10
        ):
            candidates = self._detect_loop(kf, bow)
            if self.debug:
                print(f"    [loop] kf={kf} uid={int(self.map.kf_uid[kf])} "
                      f"candidates={candidates} groups="
                      f"{[(sorted(g)[:4], c) for g, c in self.consistent_groups]}",
                      flush=True)
            if candidates and pre_mutate is not None:
                with self.lock:
                    pre_mutate()
            for cand in candidates:
                ok, r, t, s = self._compute_sim3(kf, cand)
                if self.debug:
                    print(f"    [loop] sim3 kf={kf} cand={cand} ok={ok}",
                          flush=True)
                if ok:
                    # a real correction stops the world exactly as the
                    # reference does (LoopClosing.cc:424-445)
                    with self.lock:
                        self._correct_loop(kf, cand, r, t, s)
                    self.last_loop_kf = uid
                    self.n_loops_closed += 1
                    closed = True
                    break
        self.db.add(kf, bow=bow)
        return closed

    # ------------------------------------------------------------------
    def _detect_loop(self, kf: int, bow=None):
        min_score = self.db.min_score_vs_covisibles(kf, self.map, bow_q=bow)
        candidates = [
            c for c in self.db.detect_loop_candidates(
                kf, self.map, min_score, bow_q=bow
            )
            if self.map.kf_valid[c]
        ]
        if self.debug:
            print(f"    [loop] db raw candidates for kf={kf}: {candidates} "
                  f"(min_score={min_score:.4f})", flush=True)
        if not candidates:
            self.consistent_groups = []
            return []
        # covisibility consistency over consecutive keyframes
        enough = []
        new_groups = []
        for cand in candidates:
            cov, _ = self.map.covisible_keyframes(cand, min_weight=15)
            group = set([cand] + [int(c) for c in cov])
            matched = False
            for prev_group, count in self.consistent_groups:
                if group & prev_group:
                    new_groups.append((group, count + 1))
                    if count + 1 >= CONSISTENCY_TH:
                        enough.append(cand)
                    matched = True
                    break
            if not matched:
                new_groups.append((group, 1))
        self.consistent_groups = new_groups
        return enough

    # ------------------------------------------------------------------
    def _compute_sim3(self, kf: int, cand: int):
        m = self.map
        has1 = (m.kf_matches[kf] >= 0) & m.kf_feat_valid[kf]
        has2 = (m.kf_matches[cand] >= 0) & m.kf_feat_valid[cand]
        # ratio 0.9, not the reference's 0.75: the reference's SearchByBoW
        # evaluates best/second-best INSIDE one BoW node (a handful of
        # candidates, src/FeatureMatcher.cc:561-660); our dense matcher's
        # second-best is global, which on self-similar scenes sits much
        # closer to the best — the same 0.75 would reject genuinely
        # correct correspondences the reference keeps (measured: 6-12
        # survivors between two views of the SAME region vs the >=20 gate)
        res = {
            k: np.asarray(v)
            for k, v in frame_ops.match_descriptors_global(
                jnp.asarray(m.kf_desc_bits[kf]), jnp.asarray(has1),
                jnp.asarray(m.kf_angle[kf]),
                jnp.asarray(m.kf_desc_bits[cand]), jnp.asarray(has2),
                jnp.asarray(m.kf_angle[cand]),
                self.match_th, 0.9,
            ).items()
        }
        sl1 = np.nonzero(res["valid"])[0]
        if self.debug:
            d = res.get("dist")
            print(f"    [loop] sim3 match: kf={kf}({int(has1.sum())} slots) "
                  f"cand={cand}({int(has2.sum())} slots) -> {len(sl1)} "
                  f"accepted"
                  + (f", dist med {np.median(d[sl1]):.0f}" if d is not None
                     and len(sl1) else ""),
                  flush=True)
        if len(sl1) < MIN_BOW_MATCHES:
            if self.debug:
                print(f"    [loop] sim3 gate1: {len(sl1)} desc matches < "
                      f"{MIN_BOW_MATCHES}", flush=True)
            return False, None, None, None
        sl2 = res["idx"][sl1]
        pt1 = m.kf_matches[kf][sl1]
        pt2 = m.kf_matches[cand][sl2]

        t1 = m.kf_pose[kf]
        t2 = m.kf_pose[cand]
        pc1 = m.pt_pos[pt1] @ t1[:3, :3].T + t1[:3, 3]
        pc2 = m.pt_pos[pt2] @ t2[:3, :3].T + t2[:3, 3]
        uv1 = m.kf_uv[kf][sl1]
        uv2 = m.kf_uv[cand][sl2]
        s2_1 = 1.0 / np.clip(m.kf_inv_sigma2[kf][sl1], 1e-9, None)
        s2_2 = 1.0 / np.clip(m.kf_inv_sigma2[cand][sl2], 1e-9, None)

        n = len(sl1)
        (p1, p2, u1, u2, w1, w2), vmask = _pad_pairs(
            [pc1.astype(np.float32), pc2.astype(np.float32),
             uv1.astype(np.float32), uv2.astype(np.float32),
             s2_1.astype(np.float32), s2_2.astype(np.float32)], n
        )
        out = {
            k: np.asarray(v)
            for k, v in sim3_ops.sim3_ransac(
                jnp.asarray(p1), jnp.asarray(p2),
                jnp.asarray(u1), jnp.asarray(u2),
                jnp.asarray(w1), jnp.asarray(w2),
                jnp.asarray(vmask),
                float(self.cam.fx), float(self.cam.fy),
                float(self.cam.cx), float(self.cam.cy),
                self.seed, fix_scale=False,
            ).items()
        }
        if int(out["n_inliers"]) < MIN_SIM3_INLIERS:
            if self.debug:
                print(f"    [loop] sim3 gate2: RANSAC {int(out['n_inliers'])} "
                      f"inliers < {MIN_SIM3_INLIERS}", flush=True)
            return False, None, None, None

        # mutual SearchBySim3 round: use the RANSAC Sim3 to project each
        # keyframe's points into the other and add agreeing correspondences
        # before refinement (reference LoopClosing.cc:324-333,
        # src/FeatureMatcher.cc:1066-1289)
        add1, add2 = self._search_by_sim3(
            kf, cand, out["r"], out["t"], float(out["s"]),
            np.stack([sl1, sl2], axis=1),
        )
        if len(add1):
            sl1 = np.concatenate([sl1, add1])
            sl2 = np.concatenate([sl2, add2])
            pt1 = m.kf_matches[kf][sl1]
            pt2 = m.kf_matches[cand][sl2]
            pc1 = m.pt_pos[pt1] @ t1[:3, :3].T + t1[:3, 3]
            pc2 = m.pt_pos[pt2] @ t2[:3, :3].T + t2[:3, 3]
            uv1 = m.kf_uv[kf][sl1]
            uv2 = m.kf_uv[cand][sl2]
            s2_1 = 1.0 / np.clip(m.kf_inv_sigma2[kf][sl1], 1e-9, None)
            s2_2 = 1.0 / np.clip(m.kf_inv_sigma2[cand][sl2], 1e-9, None)
        n = len(sl1)

        # LM refinement of the RANSAC Sim3 over all pairs (reference
        # Optimizer::OptimizeSim3 with th2=10, src/Optimizer.cc:1033-1226;
        # accepted at >= 20 inliers, LoopClosing.cc:352-359)
        (p1, p2, u1, u2, iw1, iw2), vmask = _pad_pairs(
            [pc1.astype(np.float32), pc2.astype(np.float32),
             uv1.astype(np.float32), uv2.astype(np.float32),
             (1.0 / s2_1).astype(np.float32), (1.0 / s2_2).astype(np.float32)],
            n,
        )
        ref = {
            k: np.asarray(v)
            for k, v in sim3_ops.sim3_optimize(
                out["r"], out["t"], float(out["s"]),
                jnp.asarray(p1), jnp.asarray(p2),
                jnp.asarray(u1), jnp.asarray(u2),
                jnp.asarray(iw1), jnp.asarray(iw2),
                jnp.asarray(vmask),
                float(self.cam.fx), float(self.cam.fy),
                float(self.cam.cx), float(self.cam.cy),
            ).items()
        }
        if int(ref["n_inliers"]) < MIN_SIM3_INLIERS:
            if self.debug:
                print(f"    [loop] sim3 gate3: LM {int(ref['n_inliers'])} "
                      f"inliers < {MIN_SIM3_INLIERS}", flush=True)
            return False, None, None, None

        # strictest gate (reference LoopClosing.cc:365-401): project the
        # loop neighborhood's points (cand + its covisibles) into the
        # current keyframe with the refined S_cw; accept the loop only if
        # the total distinct matched points reach 40
        cov, _ = m.covisible_keyframes(cand, min_weight=15)
        loop_kfs = [cand] + [int(c) for c in cov]
        loop_pts = np.unique(np.concatenate(
            [m.kf_matches[i][m.kf_matches[i] >= 0] for i in loop_kfs]
        )) if loop_kfs else np.zeros(0, np.int64)
        loop_pts = loop_pts[m.pt_valid[loop_pts]].astype(np.int64)

        s_mw = (t2[:3, :3], t2[:3, 3], np.float32(1.0))
        s_cw = _compose((np.asarray(ref["r"], np.float32),
                         np.asarray(ref["t"], np.float32),
                         np.float32(ref["s"])), s_mw)
        slots_gate, pts_gate = self._project_loop_points(
            kf, loop_pts, s_cw, PROJ_GATE_RADIUS
        )
        # distinct current-KF slots matched to a loop point, merged with
        # the Sim3 inlier pairs
        inl = np.asarray(ref["inliers"])[:n]
        matched = dict(zip(sl1[inl].tolist(), pt2[inl].tolist()))
        for s_, p_ in zip(slots_gate.tolist(), pts_gate.tolist()):
            matched.setdefault(s_, p_)
        if len(matched) < MIN_TOTAL_MATCHES:
            if self.debug:
                print(f"    [loop] sim3 gate4: {len(matched)} total matches "
                      f"< {MIN_TOTAL_MATCHES}", flush=True)
            return False, None, None, None

        # matched loop point pairs (fused AFTER pose correction, reference
        # CorrectLoop order :533-556) + loop points for SearchAndFuse
        self._pending_merge = (
            np.asarray(list(matched.keys()), np.int64),
            np.asarray(list(matched.values()), np.int64),
        )
        self._loop_points = loop_pts
        return True, ref["r"], ref["t"], float(ref["s"])

    # ------------------------------------------------------------------
    def _project_sim3(self, pt_ids, s_cw):
        """uv / predicted size / visibility of world points under a Sim3
        world->camera map (reference SearchByProjection(KF, Scw, ...)
        geometry, src/FeatureMatcher.cc:300-360)."""
        m = self.map
        r, t, s = s_cw
        x = m.pt_pos[pt_ids]
        pc = s * (x @ r.T) + t
        z = pc[:, 2]
        zs = np.where(np.abs(z) < 1e-9, 1e-9, z)
        u = float(self.cam.fx) * pc[:, 0] / zs + float(self.cam.cx)
        v = float(self.cam.fy) * pc[:, 1] / zs + float(self.cam.cy)
        uv = np.stack([u, v], axis=-1).astype(np.float32)
        ow = (-(r.T @ t) / s).astype(np.float32)
        po = x - ow
        dist = np.linalg.norm(po, axis=-1)
        nrm = np.linalg.norm(m.pt_normal[pt_ids], axis=-1)
        viewcos = (po * m.pt_normal[pt_ids]).sum(-1) / np.clip(dist * nrm, 1e-9, None)
        visible = (
            (z > 0)
            & (u >= 0) & (u < self.cam.width) & (v >= 0) & (v < self.cam.height)
            & (dist >= m.pt_min_dist[pt_ids]) & (dist <= m.pt_max_dist[pt_ids])
            & (viewcos > 0.5)
        )
        pred_size = (
            m.pt_ref_size[pt_ids] * m.pt_ref_dist[pt_ids]
            / np.clip(dist, 1e-9, None)
        ).astype(np.float32)
        return uv, pred_size, visible

    def _project_loop_points(self, kf: int, pt_ids, s_cw, radius):
        """Match world points into kf's keypoints under Sim3 s_cw.
        Returns (kf slots, point ids) of accepted matches."""
        m = self.map
        if len(pt_ids) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        bucket = 256
        while bucket < len(pt_ids):
            bucket *= 2
        idx = np.concatenate([pt_ids, np.zeros(bucket - len(pt_ids), np.int64)])
        uv, pred, vis = self._project_sim3(idx, s_cw)
        vis[len(pt_ids):] = False
        # descriptors gathered on device from the map mirror (only the id
        # array crosses the tunnel)
        desc_dev = m.mirror().gather(idx.astype(np.int32))[6]
        res = {
            k: np.asarray(v)
            for k, v in frame_ops.match_loop_projection(
                jnp.asarray(uv), jnp.asarray(pred),
                desc_dev, jnp.asarray(vis),
                jnp.asarray(m.kf_uv[kf]), jnp.asarray(m.kf_desc_bits[kf]),
                jnp.asarray(m.kf_size[kf]), jnp.asarray(m.kf_feat_valid[kf]),
                float(radius), self.match_th,
            ).items()
        }
        src = np.nonzero(res["valid"])[0]
        return res["idx"][src].astype(np.int64), idx[src]

    def _search_by_sim3(self, kf: int, cand: int, r, t, s, pairs):
        """Mutual Sim3-guided search (reference SearchBySim3,
        src/FeatureMatcher.cc:1066-1289): project cand's points into kf and
        kf's points into cand with S_cm / S_mc; keep mutually-agreeing new
        correspondences. Returns (new kf slots, new cand slots)."""
        m = self.map
        r = np.asarray(r, np.float32)
        t = np.asarray(t, np.float32)
        t1 = m.kf_pose[kf]
        t2 = m.kf_pose[cand]
        s_mw = (t2[:3, :3], t2[:3, 3], np.float32(1.0))
        s_cm = (r, t, np.float32(s))
        s_cw = _compose(s_cm, s_mw)           # world -> kf cam via loop Sim3
        s_mw_from_c = _compose(_inv(s_cm), (t1[:3, :3], t1[:3, 3], np.float32(1.0)))

        used1 = set(pairs[:, 0].tolist())
        used2 = set(pairs[:, 1].tolist())
        m2 = m.kf_matches[cand]
        pts2 = np.unique(m2[m2 >= 0])
        pts2 = pts2[m.pt_valid[pts2]].astype(np.int64)
        m1 = m.kf_matches[kf]
        pts1 = np.unique(m1[m1 >= 0])
        pts1 = pts1[m.pt_valid[pts1]].astype(np.int64)

        # cand points -> kf keypoints; kf points -> cand keypoints
        slots_in_kf, pts2_matched = self._project_loop_points(
            kf, pts2, s_cw, SIM3_SEARCH_RADIUS
        )
        slots_in_cand, pts1_matched = self._project_loop_points(
            cand, pts1, s_mw_from_c, SIM3_SEARCH_RADIUS
        )
        # mutual agreement: (kf slot with point p1) <-> (cand slot with p2)
        # agree when projecting p2 lands on a kf slot whose point is p1 AND
        # projecting p1 lands on a cand slot whose point is p2
        cand_slot_of_p2 = {}
        for sl, p in zip(slots_in_cand.tolist(), pts1_matched.tolist()):
            cand_slot_of_p2[p] = sl
        new1, new2 = [], []
        pt_of_cand_slot = m.kf_matches[cand]
        for sl_kf, p2 in zip(slots_in_kf.tolist(), pts2_matched.tolist()):
            p1 = int(m.kf_matches[kf][sl_kf])
            if p1 < 0 or sl_kf in used1:
                continue
            sl_cand = cand_slot_of_p2.get(p1)
            if sl_cand is None or sl_cand in used2:
                continue
            if int(pt_of_cand_slot[sl_cand]) != int(p2):
                continue
            new1.append(sl_kf)
            new2.append(sl_cand)
            used1.add(sl_kf)
            used2.add(sl_cand)
        return np.asarray(new1, np.int64), np.asarray(new2, np.int64)

    # ------------------------------------------------------------------
    def _correct_loop(self, kf: int, cand: int, r, t, s):
        """Apply S_cm: maps cand-camera coords into kf-camera coords.

        Reference CorrectLoop order (LoopClosing.cc:418-599): correct the
        current covisible group's poses and points with the propagated Sim3,
        THEN fuse the matched loop points, then essential-graph optimize
        using PRE-correction poses for the structural edge measurements.
        """
        m = self.map
        r = np.asarray(r, np.float32)
        t = np.asarray(t, np.float32)

        # snapshot pre-correction poses: structural edges of the essential
        # graph are measured from these (reference NonCorrectedSim3)
        pre_poses = m.kf_pose.copy()

        # corrected Sim3 world->kf: S_cw = S_cm o S_mw (reference :247-416)
        t_mw = m.kf_pose[cand]
        s_mw = (t_mw[:3, :3], t_mw[:3, 3], np.float32(1.0))
        s_cw_corr = _compose((r, t, np.float32(s)), s_mw)

        # current covisible group, BEFORE loop-point fusion
        cov, _ = m.covisible_keyframes(kf, min_weight=15)
        group = [kf] + [int(c) for c in cov]
        t_cw_old = m.kf_pose[kf]
        corrected = {}
        for i in group:
            t_iw = m.kf_pose[i]
            # S_ic = T_iw T_cw^-1 (scale 1)
            t_ic = t_iw @ np.linalg.inv(t_cw_old)
            s_ic = (t_ic[:3, :3], t_ic[:3, 3], np.float32(1.0))
            corrected[i] = _compose(s_ic, s_cw_corr)

        # correct points of the group (avoid double-correcting shared points)
        done = set()
        for i in group:
            mm = m.kf_matches[i]
            pts = np.unique(mm[mm >= 0])
            pts = [p for p in pts if p not in done]
            done.update(pts)
            if not pts:
                continue
            pts = np.asarray(pts)
            t_iw_old = m.kf_pose[i]
            s_iw_old = (t_iw_old[:3, :3], t_iw_old[:3, 3], np.float32(1.0))
            s_corr = corrected[i]
            # p' = S_corr^-1 ( S_old (p) )
            x = m.pt_pos[pts]
            x_cam = _apply(s_iw_old, x)
            m.pt_pos[pts] = _apply(_inv(s_corr), x_cam)
            m.mark_points_dirty(pts)

        # write corrected SE3 poses: T = [R, t/s]
        for i, (ri, ti, si) in corrected.items():
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = ri
            pose[:3, 3] = ti / si
            m.kf_pose[i] = pose

        # fuse matched loop points now that poses are corrected (reference
        # LoopClosing.cc:533-556: loop point REPLACES the current one, or
        # becomes a new observation on an empty slot)
        if self._pending_merge is not None:
            slots, loop_pt = self._pending_merge
            keep, drop = [], []
            for sl, lp in zip(slots.tolist(), loop_pt.tolist()):
                lp = int(lp)
                if not m.pt_valid[lp]:
                    continue
                existing = int(m.kf_matches[kf][sl])
                if existing == lp:
                    continue
                if existing >= 0:
                    keep.append(lp)
                    drop.append(existing)
                else:
                    m.kf_matches[kf][sl] = lp
            if keep:
                m.merge_points(keep, drop)
            self._pending_merge = None

        # SearchAndFuse (reference LoopClosing.cc:601-627, called :556):
        # project ALL loop-side points into every corrected keyframe
        # (radius 4) and fuse — this removes the duplicated structure
        # across the loop, not just the pre-matched pairs
        self._search_and_fuse(corrected)

        self.map.update_point_stats()

        # ---------------- essential graph ----------------
        self._optimize_essential_graph(kf, cand, corrected, pre_poses)
        # persist the accepted loop edge for all future essential-graph
        # solves (reference KeyFrame::AddLoopEdge, LoopClosing.cc:577-579)
        m.loop_edges.append((int(m.kf_uid[kf]), int(m.kf_uid[cand])))

        # ---------------- global BA ----------------
        kf_ids = [int(k) for k in m.keyframe_ids()]
        pt_ids = np.nonzero(m.pt_valid)[0]
        fixed = [min(kf_ids)]
        free = [k for k in kf_ids if k not in fixed]
        defer = self.defer_ba_sink is not None
        fold = run_bundle_adjustment(
            m, self.cam, free, fixed, pt_ids, n_iters_a=5, n_iters_b=10,
            mesh=self.mesh, defer=defer,
        )
        if defer and fold is not None:
            # snapshot solve membership by IDENTITY: the fold must later
            # tell keyframes/points created DURING the solve apart from
            # solve members (reference buffers TcwGBA/PosGBA and walks the
            # spanning tree for the rest, src/LoopClosing.cc:683-744)
            uid_in_solve = {int(m.kf_uid[k]) for k in kf_ids}
            pt_in_solve = np.zeros(m.max_pt, bool)
            pt_in_solve[pt_ids] = True

            def gba_fold(f=fold, m=m):
                pre_poses = m.kf_pose.copy()
                f()
                self._propagate_gba(uid_in_solve, pt_in_solve, pre_poses)
                m.update_point_stats()
                # loop closure + GBA = a "big change" (reference
                # InformNewBigChange, surfaced through System::MapChanged)
                m.inform_big_change()

            gba_fold.ready = fold.ready
            self.defer_ba_sink(gba_fold)
        else:
            self.map.update_point_stats()
            self.map.inform_big_change()

    def _propagate_gba(self, uid_in_solve: set, pt_in_solve, pre_poses):
        """Correct keyframes/points created while the deferred global BA
        executed (reference RunGlobalBundleAdjustment propagation,
        src/LoopClosing.cc:683-744):

          - keyframes, in creation (uid) order, walk the spanning tree:
            Tcw_child_new = (Tcw_child_old Tcw_parent_old^-1) Tcw_parent_new
            — each child's relative pose to its (already corrected) parent
            is preserved;
          - points not in the solve move with their reference keyframe:
            p' = T_ref_new^-1 (T_ref_old (p)).

        pre_poses: every keyframe's pose immediately BEFORE the fold wrote
        the GBA results (the 'old' side of both formulas)."""
        m = self.map
        pending = {
            int(s) for s in m.keyframe_ids()
            if int(m.kf_uid[s]) not in uid_in_solve
        }
        # walk children-of-corrected keyframes iteratively (the reference
        # BFS-walks the spanning tree from the root,
        # src/LoopClosing.cc:683-744): KF-culling re-parenting can give a
        # child a LARGER-uid parent, so uid order could correct a child
        # against a parent that has not moved yet
        progress = True
        while pending and progress:
            progress = False
            for s in sorted(pending, key=lambda x: int(m.kf_uid[x])):
                p = int(m.kf_parent[s])
                if p < 0 or not m.kf_valid[p] or p == s:
                    pending.discard(s)  # rootless: nothing to anchor to
                    progress = True
                    break
                if p in pending:
                    continue  # parent not corrected yet; revisit
                t_rel = pre_poses[s] @ np.linalg.inv(pre_poses[p])
                m.kf_pose[s] = (t_rel @ m.kf_pose[p]).astype(np.float32)
                pending.discard(s)
                progress = True
                break
        # parent cycles among mid-solve keyframes (possible only through
        # pathological re-parenting): fall back to uid order
        for s in sorted(pending, key=lambda x: int(m.kf_uid[x])):
            p = int(m.kf_parent[s])
            if p < 0 or not m.kf_valid[p] or p == s:
                continue
            t_rel = pre_poses[s] @ np.linalg.inv(pre_poses[p])
            m.kf_pose[s] = (t_rel @ m.kf_pose[p]).astype(np.float32)
        # mid-solve points: valid now, absent from the solve
        is_new = m.pt_valid.copy()
        k = min(len(is_new), len(pt_in_solve))
        is_new[:k] &= ~pt_in_solve[:k]
        ids = np.nonzero(is_new)[0]
        if len(ids) == 0:
            return
        refs = m.pt_ref_kf[ids]
        ok = (refs >= 0) & m.kf_valid[np.maximum(refs, 0)]
        ids, refs = ids[ok], refs[ok]
        for r in np.unique(refs):
            sel = ids[refs == r]
            t_old, t_new = pre_poses[r], m.kf_pose[r]
            x_cam = m.pt_pos[sel] @ t_old[:3, :3].T + t_old[:3, 3]
            m.pt_pos[sel] = (
                (x_cam - t_new[:3, 3]) @ t_new[:3, :3]
            ).astype(np.float32)
            m.mark_points_dirty(sel)

    def _search_and_fuse(self, corrected: dict):
        """Project every loop-side map point into each corrected keyframe
        and fuse duplicates (reference SearchAndFuse,
        src/LoopClosing.cc:601-627: Fuse(pKF, cvScw, loopPoints, 4,
        replace); the loop point replaces the keyframe's duplicate)."""
        m = self.map
        loop_pts = self._loop_points
        self._loop_points = None
        if loop_pts is None or len(loop_pts) == 0:
            return
        loop_pts = loop_pts[m.pt_valid[loop_pts]]
        for i, s_iw in corrected.items():
            if not m.kf_valid[i] or len(loop_pts) == 0:
                continue
            slots, pts = self._project_loop_points(
                i, loop_pts, s_iw, FUSE_RADIUS
            )
            keep, drop = [], []
            for sl, lp in zip(slots.tolist(), pts.tolist()):
                lp = int(lp)
                if not m.pt_valid[lp]:
                    continue
                existing = int(m.kf_matches[i][sl])
                if existing == lp:
                    continue
                if existing >= 0:
                    keep.append(lp)
                    drop.append(existing)
                else:
                    m.kf_matches[i][sl] = lp
            if keep:
                m.merge_points(keep, drop)
            # forwarded merges can invalidate later loop points; refresh
            loop_pts = loop_pts[m.pt_valid[loop_pts]]

    def _optimize_essential_graph(self, kf: int, cand: int, corrected: dict, pre_poses):
        m = self.map
        kf_ids = sorted(int(k) for k in m.keyframe_ids())
        if len(kf_ids) < 3:
            return
        k_cap = m.max_kf
        # vertex initial values: CURRENT (post-correction) poses
        r_all = np.tile(np.eye(3, dtype=np.float32), (k_cap, 1, 1))
        t_all = np.zeros((k_cap, 3), np.float32)
        s_all = np.ones(k_cap, np.float32)
        for i in kf_ids:
            r_all[i] = m.kf_pose[i][:3, :3]
            t_all[i] = m.kf_pose[i][:3, 3]

        edges = []
        seen_pairs = set()

        def add_edge(i, j, poses, w=1.0):
            """Measurement S_ij from the given pose snapshot."""
            key = frozenset((i, j))
            if key in seen_pairs or i == j:
                return
            seen_pairs.add(key)
            si = (poses[i][:3, :3], poses[i][:3, 3], np.float32(1.0))
            sj = (poses[j][:3, :3], poses[j][:3, 3], np.float32(1.0))
            meas = _compose(si, _inv(sj))
            edges.append((i, j, meas, w))

        # loop edge measured from the CORRECTED relative pose (added first
        # so the structural duplicate of the same pair is skipped)
        add_edge(kf, cand, m.kf_pose, w=1.0)
        # ALL past accepted loop edges (reference Optimizer.cc:914-927 via
        # KeyFrame::GetLoopEdges) — without these a second loop closure can
        # undo the first one's correction
        for ua, ub in m.loop_edges:
            a = m.uid_slot.get(int(ua))
            b = m.uid_slot.get(int(ub))
            if (
                a is not None and b is not None
                and m.kf_valid[a] and m.kf_valid[b]
            ):
                add_edge(int(a), int(b), pre_poses)
        # structural edges measured from PRE-correction poses (reference
        # NonCorrectedSim3, Optimizer.cc:850-960): maintained covisibility
        # spanning tree + strong covisibility
        for i in kf_ids:
            p = int(m.kf_parent[i])
            if p >= 0 and m.kf_valid[p]:
                add_edge(i, p, pre_poses)
        # safety net for parentless keyframes (e.g. maps restored from old
        # checkpoints): chain to the previous keyframe so the graph stays
        # connected
        for a, b in zip(kf_ids[1:], kf_ids[:-1]):
            if int(m.kf_parent[a]) < 0:
                add_edge(a, b, pre_poses)
        for i in kf_ids:
            w = m.covisibility_weights(i)
            for j in np.nonzero(w >= COVIS_EDGE_MIN_WEIGHT)[0]:
                if j > i:
                    add_edge(int(j), int(i), pre_poses)

        # edge arrays padded to a coarse bucket (exact edge counts would
        # compile a fresh pose-graph program per loop closure)
        e = len(edges)
        e_cap = 64
        while e_cap < e:
            e_cap *= 4
        ei = np.zeros(e_cap, np.int32)
        ej = np.zeros(e_cap, np.int32)
        er = np.tile(np.eye(3, dtype=np.float32), (e_cap, 1, 1))
        et = np.zeros((e_cap, 3), np.float32)
        es = np.ones(e_cap, np.float32)
        ew = np.zeros(e_cap, np.float32)
        evalid = np.zeros(e_cap, bool)
        ei[:e] = [x[0] for x in edges]
        ej[:e] = [x[1] for x in edges]
        er[:e] = np.stack([x[2][0] for x in edges]).astype(np.float32)
        et[:e] = np.stack([x[2][1] for x in edges]).astype(np.float32)
        es[:e] = [x[2][2] for x in edges]
        ew[:e] = [x[3] for x in edges]
        evalid[:e] = True

        valid = np.zeros(k_cap, bool)
        valid[kf_ids] = True
        fixed = np.zeros(k_cap, bool)
        fixed[cand] = True  # reference fixes the loop KF (Optimizer.cc:818)

        r2, t2, s2 = pose_graph.optimize_pose_graph(
            jnp.asarray(r_all), jnp.asarray(t_all), jnp.asarray(s_all),
            jnp.asarray(valid), jnp.asarray(fixed),
            jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(er), jnp.asarray(et), jnp.asarray(es),
            jnp.asarray(ew), jnp.asarray(evalid),
        )
        r2, t2, s2 = np.asarray(r2), np.asarray(t2), np.asarray(s2)

        # rescale points via their reference KF's Sim3 pair (reference
        # Optimizer.cc:985-1026): p' = S_new^-1 ( S_old (p) )
        for i in kf_ids:
            s_old = (r_all[i], t_all[i], s_all[i])
            s_new = (r2[i], t2[i], s2[i])
            mm = m.kf_matches[i]
            pts = np.unique(mm[mm >= 0])
            pts = pts[m.pt_ref_kf[pts] == i] if len(pts) else pts
            if len(pts):
                x_cam = _apply(s_old, m.pt_pos[pts])
                m.pt_pos[pts] = _apply(_inv(s_new), x_cam)
                m.mark_points_dirty(pts)
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = r2[i]
            pose[:3, 3] = t2[i] / s2[i]
            m.kf_pose[i] = pose


# ---------------------------------------------------------------- helpers
def _compose(a, b):
    ra, ta, sa = a
    rb, tb, sb = b
    return (ra @ rb).astype(np.float32), (sa * (ra @ tb) + ta).astype(np.float32), np.float32(sa * sb)


def _inv(a):
    r, t, s = a
    ri = r.T
    si = 1.0 / s
    return ri.astype(np.float32), (-si * (ri @ t)).astype(np.float32), np.float32(si)


def _apply(a, pts):
    r, t, s = a
    return (s * (pts @ r.T) + t).astype(np.float32)
