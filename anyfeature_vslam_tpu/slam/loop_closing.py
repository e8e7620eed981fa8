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
CONSISTENCY_TH = 3        # reference LoopClosing.cc:46
COVIS_EDGE_MIN_WEIGHT = 100  # reference Optimizer.cc:46 (minFeat)


class LoopCloser:
    def __init__(self, slam_map, cam, database, match_th: float = 75.0,
                 seed: int = 0, mesh=None):
        self.map = slam_map
        self.cam = cam
        self.mesh = mesh  # optional device mesh: global BA runs sharded
        self.db = database
        self.match_th = match_th
        self.seed = seed
        self.consistent_groups: list[tuple[set, int]] = []
        self._pending_merge = None
        self.last_loop_kf = -1000
        self.n_loops_closed = 0

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int) -> bool:
        """Returns True if a loop was closed at this keyframe."""
        closed = False
        if (
            self.map.n_keyframes() > 10
            and kf - self.last_loop_kf > 10  # reference LoopClosing.cc:128
        ):
            candidates = self._detect_loop(kf)
            for cand in candidates:
                ok, r, t, s = self._compute_sim3(kf, cand)
                if ok:
                    self._correct_loop(kf, cand, r, t, s)
                    self.last_loop_kf = kf
                    self.n_loops_closed += 1
                    closed = True
                    break
        self.db.add(kf, self.map.kf_desc_bits[kf], self.map.kf_feat_valid[kf])
        return closed

    # ------------------------------------------------------------------
    def _detect_loop(self, kf: int):
        min_score = self.db.min_score_vs_covisibles(kf, self.map)
        candidates = self.db.detect_loop_candidates(kf, self.map, min_score)
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
        res = {
            k: np.asarray(v)
            for k, v in frame_ops.match_descriptors_global(
                jnp.asarray(m.kf_desc_bits[kf]), jnp.asarray(has1),
                jnp.asarray(m.kf_angle[kf]),
                jnp.asarray(m.kf_desc_bits[cand]), jnp.asarray(has2),
                jnp.asarray(m.kf_angle[cand]),
                self.match_th, 0.75,
            ).items()
        }
        sl1 = np.nonzero(res["valid"])[0]
        if len(sl1) < MIN_BOW_MATCHES:
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
        out = {
            k: np.asarray(v)
            for k, v in sim3_ops.sim3_ransac(
                jnp.asarray(pc1.astype(np.float32)), jnp.asarray(pc2.astype(np.float32)),
                jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.asarray(s2_1.astype(np.float32)), jnp.asarray(s2_2.astype(np.float32)),
                jnp.asarray(np.ones(n, bool)),
                float(self.cam.fx), float(self.cam.fy),
                float(self.cam.cx), float(self.cam.cy),
                self.seed, fix_scale=False,
            ).items()
        }
        if int(out["n_inliers"]) < MIN_SIM3_INLIERS:
            return False, None, None, None
        # LM refinement of the RANSAC Sim3 over all pairs (reference
        # Optimizer::OptimizeSim3 with th2=10, src/Optimizer.cc:1033-1226;
        # accepted at >= 20 inliers, LoopClosing.cc:352-359)
        ref = {
            k: np.asarray(v)
            for k, v in sim3_ops.sim3_optimize(
                out["r"], out["t"], float(out["s"]),
                jnp.asarray(pc1.astype(np.float32)), jnp.asarray(pc2.astype(np.float32)),
                jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.asarray((1.0 / s2_1).astype(np.float32)),
                jnp.asarray((1.0 / s2_2).astype(np.float32)),
                jnp.asarray(np.ones(n, bool)),
                float(self.cam.fx), float(self.cam.fy),
                float(self.cam.cx), float(self.cam.cy),
            ).items()
        }
        if int(ref["n_inliers"]) < MIN_SIM3_INLIERS:
            return False, None, None, None
        # matched loop point pairs (fused AFTER pose correction, reference
        # CorrectLoop order :533-556)
        inl = ref["inliers"]
        self._pending_merge = (pt2[inl].copy(), pt1[inl].copy())
        return True, ref["r"], ref["t"], float(ref["s"])

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

        # write corrected SE3 poses: T = [R, t/s]
        for i, (ri, ti, si) in corrected.items():
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = ri
            pose[:3, 3] = ti / si
            m.kf_pose[i] = pose

        # fuse matched loop points now that poses are corrected
        if self._pending_merge is not None:
            keep, drop = self._pending_merge
            m.merge_points(keep, drop)
            self._pending_merge = None

        self.map.update_point_stats()

        # ---------------- essential graph ----------------
        self._optimize_essential_graph(kf, cand, corrected, pre_poses)

        # ---------------- global BA ----------------
        kf_ids = [int(k) for k in m.keyframe_ids()]
        pt_ids = np.nonzero(m.pt_valid)[0]
        fixed = [min(kf_ids)]
        free = [k for k in kf_ids if k not in fixed]
        run_bundle_adjustment(
            m, self.cam, free, fixed, pt_ids, n_iters_a=5, n_iters_b=10,
            mesh=self.mesh,
        )
        self.map.update_point_stats()
        # loop closure + GBA = a "big change" (reference InformNewBigChange,
        # surfaced through System::MapChanged)
        self.map.inform_big_change()

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

        def add_edge(i, j, poses, w=1.0):
            """Measurement S_ij from the given pose snapshot."""
            si = (poses[i][:3, :3], poses[i][:3, 3], np.float32(1.0))
            sj = (poses[j][:3, :3], poses[j][:3, 3], np.float32(1.0))
            meas = _compose(si, _inv(sj))
            edges.append((i, j, meas, w))

        # structural edges measured from PRE-correction poses (reference
        # NonCorrectedSim3, Optimizer.cc:850-960): insertion-order chain
        # (spanning-tree surrogate) + strong covisibility
        for a, b in zip(kf_ids[1:], kf_ids[:-1]):
            add_edge(a, b, pre_poses)
        for i in kf_ids:
            w = m.covisibility_weights(i)
            for j in np.nonzero(w >= COVIS_EDGE_MIN_WEIGHT)[0]:
                if j > i:
                    add_edge(int(j), int(i), pre_poses)
        # loop edge measured from the CORRECTED relative pose
        add_edge(kf, cand, m.kf_pose, w=1.0)

        e = len(edges)
        ei = np.array([x[0] for x in edges], np.int32)
        ej = np.array([x[1] for x in edges], np.int32)
        er = np.stack([x[2][0] for x in edges]).astype(np.float32)
        et = np.stack([x[2][1] for x in edges]).astype(np.float32)
        es = np.array([x[2][2] for x in edges], np.float32)
        ew = np.array([x[3] for x in edges], np.float32)

        valid = np.zeros(k_cap, bool)
        valid[kf_ids] = True
        fixed = np.zeros(k_cap, bool)
        fixed[cand] = True  # reference fixes the loop KF (Optimizer.cc:818)

        r2, t2, s2 = pose_graph.optimize_pose_graph(
            jnp.asarray(r_all), jnp.asarray(t_all), jnp.asarray(s_all),
            jnp.asarray(valid), jnp.asarray(fixed),
            jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(er), jnp.asarray(et), jnp.asarray(es),
            jnp.asarray(ew), jnp.asarray(np.ones(e, bool)),
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
