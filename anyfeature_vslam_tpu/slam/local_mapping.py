"""Local mapping: keyframe processing, triangulation, culling, local BA.

Synchronous TPU-native counterpart of the reference LocalMapping thread
(reference src/LocalMapping.cc:48-119): per new keyframe — observation
bookkeeping, recent-map-point culling (:194-229), new-point triangulation
against the best covisible keyframes (:231-473), local bundle adjustment
(via ops.ba two-stage schedule, reference src/Optimizer.cc:450-768), and
redundant-keyframe culling (:651-741).

The reference's cross-thread queue + BA-abort flags become a plain function
call chain with bounded iteration counts (SURVEY 2.7).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from anyfeature_vslam_tpu.ops import ba as ba_ops
from anyfeature_vslam_tpu.ops import triangulation
from . import frame_ops
from .map_state import SlamMap

TRI_RATIO = 0.6          # reference matcher(0.6) for triangulation
TRI_CHI2 = 5.991
MIN_BASELINE_DEPTH_RATIO = 0.01  # reference LocalMapping.cc:284-288
COS_PARALLAX_MAX = 0.9998
SCALE_CONSISTENCY_FACTOR = 1.8   # ~1.5 * scaleFactor (reference ratioFactor)


def _pad_pow2(n, lo=256):
    c = lo
    while c < n:
        c *= 2
    return c


def _fundamental_from_poses(t1, t2, k):
    """F12 mapping points in image 1 to epipolar lines in image 2's frame?

    Convention (reference ComputeF12, src/LocalMapping.cc:557-574):
    x2^T F12 x1 = 0 with T12 = T1w * T2w^-1 ... we use T21 = T2 T1^-1,
    E21 = [t]x R, F = K^-T E K^-1 such that x2^T F x1 = 0.
    """
    t21 = t2 @ np.linalg.inv(t1)
    r = t21[:3, :3]
    t = t21[:3, 3]
    tx = np.array(
        [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]], np.float32
    )
    k_inv = np.linalg.inv(k)
    return (k_inv.T @ (tx @ r) @ k_inv).astype(np.float32)


def run_bundle_adjustment(
    slam_map: SlamMap, cam, free_kfs, fixed_kfs, pt_ids,
    n_iters_a: int = 5, n_iters_b: int = 10, remove_outliers: bool = True,
    mesh=None, defer: bool = False,
):
    """Assemble COO arrays from the map and run two-stage Schur LM.

    Writes refined poses (free KFs) and point positions back into the map;
    erases outlier observations (reference src/Optimizer.cc:701-747).
    With `mesh`, the solve is observation-sharded over the device mesh
    (parallel/sharded_ba.py) — same math, psum-reduced.

    With defer=True, returns a `fold()` closure instead of writing back:
    JAX has already dispatched the solve asynchronously, so the device
    works while the host tracks the next frames; call fold() before the
    next map mutation to land the results.
    """
    free_kfs = [int(k) for k in free_kfs]
    fixed_kfs = [int(k) for k in fixed_kfs if k not in free_kfs]
    kf_list = free_kfs + fixed_kfs
    if not kf_list:
        return
    pt_ids = np.asarray(sorted(int(p) for p in pt_ids), np.int64)
    pt_ids = pt_ids[slam_map.pt_valid[pt_ids]]
    if len(pt_ids) == 0:
        return
    pt_local = np.full(slam_map.max_pt, -1, np.int64)
    pt_local[pt_ids] = np.arange(len(pt_ids))

    obs_kf, obs_slot, obs_pt, obs_uv, obs_w = [], [], [], [], []
    for li, kf in enumerate(kf_list):
        m = slam_map.kf_matches[kf]
        sl = np.nonzero((m >= 0) & (pt_local[np.clip(m, 0, None)] >= 0))[0]
        obs_kf.extend([li] * len(sl))
        obs_slot.extend(sl.tolist())
        obs_pt.extend(pt_local[m[sl]].tolist())
        obs_uv.append(slam_map.kf_uv[kf][sl])
        obs_w.append(slam_map.kf_inv_sigma2[kf][sl])
    n_obs = len(obs_kf)
    if n_obs < 10:
        return
    obs_uv = np.concatenate(obs_uv).astype(np.float32)
    obs_w = np.concatenate(obs_w).astype(np.float32)

    # pad to buckets (jit cache friendliness)
    k_cap = _pad_pow2(len(kf_list), lo=4)
    p_cap = _pad_pow2(len(pt_ids), lo=256)
    o_cap = _pad_pow2(n_obs, lo=1024)

    poses = np.tile(np.eye(4, dtype=np.float32), (k_cap, 1, 1))
    poses[: len(kf_list)] = slam_map.kf_pose[kf_list]
    pts = np.zeros((p_cap, 3), np.float32)
    pts[: len(pt_ids)] = slam_map.pt_pos[pt_ids]
    free = np.zeros(k_cap, bool)
    free[: len(free_kfs)] = True

    okf = np.zeros(o_cap, np.int32)
    okf[:n_obs] = obs_kf
    opt = np.zeros(o_cap, np.int32)
    opt[:n_obs] = obs_pt
    ouv = np.zeros((o_cap, 2), np.float32)
    ouv[:n_obs] = obs_uv
    ow = np.zeros(o_cap, np.float32)
    ow[:n_obs] = obs_w
    ovalid = np.zeros(o_cap, bool)
    ovalid[:n_obs] = True

    args = (
        jnp.asarray(poses), jnp.asarray(pts), jnp.asarray(free),
        jnp.asarray(okf), jnp.asarray(opt), jnp.asarray(ouv),
        jnp.asarray(ow), jnp.asarray(ovalid),
        float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
    )
    if mesh is not None and o_cap % mesh.size == 0:
        from anyfeature_vslam_tpu.parallel import sharded_ba

        new_poses, new_pts, chi2, z, valid2 = (
            sharded_ba.sharded_bundle_adjust_two_stage(
                mesh, *args, n_iters_a=n_iters_a, n_iters_b=n_iters_b
            )
        )
    else:
        new_poses, new_pts, chi2, z, valid2 = ba_ops.bundle_adjust_two_stage(
            *args, n_iters_a=n_iters_a, n_iters_b=n_iters_b
        )
    outlier_dev = ba_ops.classify_outliers(chi2, z)
    obs_kf = np.asarray(obs_kf)
    obs_slot = np.asarray(obs_slot)
    # identity snapshot: a keyframe slot culled between dispatch and fold
    # can be RECYCLED by the tracker's next add_keyframe — writes must be
    # gated on the slot still holding the same keyframe (uid), not just
    # on kf_valid
    kf_uids = {kf: int(slam_map.kf_uid[kf]) for kf in kf_list}

    def fold():
        """Block on the (already dispatched, asynchronously executing)
        solve and write results back into the map. The TPU-native
        counterpart of the reference's LocalMapping-thread overlap with
        mbAbortBA (src/LocalMapping.cc:48-119, Optimizer.cc:510-747):
        tracking keeps using the pre-BA state until the fold lands, just
        as the reference's tracking reads the map while g2o iterates."""
        np_poses = np.asarray(new_poses)
        np_pts = np.asarray(new_pts)
        outlier = np.asarray(outlier_dev)[:n_obs]
        slam_map.rev += 1

        def same_kf(kf):
            return (
                slam_map.kf_valid[kf]
                and int(slam_map.kf_uid[kf]) == kf_uids[kf]
            )

        for li, kf in enumerate(free_kfs):
            if same_kf(kf):
                slam_map.kf_pose[kf] = np_poses[li]
        # guard against points culled/recycled between dispatch and fold
        still = slam_map.pt_valid[pt_ids]
        slam_map.pt_pos[pt_ids[still]] = np_pts[: len(pt_ids)][still]
        if remove_outliers:
            for i in np.nonzero(outlier)[0]:
                kf = kf_list[obs_kf[i]]
                if same_kf(kf):
                    slam_map.kf_matches[kf][obs_slot[i]] = -1

    if defer:
        return fold
    fold()
    return None


class LocalMapper:
    def __init__(self, slam_map: SlamMap, cam, match_th: float = 75.0,
                 max_tri_kfs: int = 10, max_ba_kfs: int = 20, mesh=None,
                 size_tolerance: float = 1.2, sensor: str = "monocular",
                 th_depth: float = 0.0):
        self.map = slam_map
        self.cam = cam
        self.mesh = mesh  # optional device mesh: local BA runs sharded
        self.k = np.asarray(cam.k_matrix, np.float32)
        self.match_th = match_th
        self.max_tri_kfs = max_tri_kfs
        self.max_ba_kfs = max_ba_kfs
        # sizeTolerance = extractor scale factor (reference src/Frame.cc:73)
        self.size_tolerance = float(size_tolerance)
        self.sensor = sensor
        self.th_depth = float(th_depth)
        # recent points: pt_id -> kf count at creation (for culling)
        self.recent: dict[int, int] = {}
        self.n_kf_processed = 0
        # deferred local-BA fold (async-mapping mode)
        self._pending_fold = None

    # ------------------------------------------------------------------
    def fold_pending(self):
        """Land a previously dispatched (still-running) local BA before the
        next map mutation (see run_bundle_adjustment defer)."""
        if self._pending_fold is not None:
            f = self._pending_fold
            self._pending_fold = None
            f()

    def process_keyframe(self, kf: int, defer_ba: bool = False):
        self.fold_pending()
        self.n_kf_processed += 1
        m = self.map.kf_matches[kf]
        self.map.update_point_stats(np.unique(m[m >= 0]))
        self._cull_recent_points()
        if self.map.n_keyframes() >= 2:
            self._create_new_points(kf)
            self._fuse_in_neighbors(kf)
            self._local_ba(kf, defer=defer_ba)
        self._cull_keyframes(kf)

    # ------------------------------------------------------------------
    def _fuse_in_neighbors(self, kf: int):
        """Reference SearchInNeighbors (LocalMapping.cc:475-555): project the
        new KF's points into first/second-order covisible neighbors and vice
        versa; add missing observations, merge duplicate points (keeping the
        better-observed one). This is what grows observation counts beyond
        the triangulation pair — the keyframe decision and culling depend on
        it."""
        m = self.map
        first, _ = m.covisible_keyframes(kf, min_weight=15, max_n=10)
        targets = []
        for n1 in first:
            targets.append(int(n1))
            second, _ = m.covisible_keyframes(int(n1), min_weight=15, max_n=5)
            targets.extend(int(x) for x in second)
        targets = [t for t in dict.fromkeys(targets) if t != kf]

        for kf2 in targets:
            self._fuse_pair(kf, kf2)   # kf's points into kf2
            self._fuse_pair(kf2, kf)   # kf2's points into kf
        mm = m.kf_matches[kf]
        m.update_point_stats(np.unique(mm[mm >= 0]))

    def _fuse_pair(self, src_kf: int, dst_kf: int):
        """Project src's map points into dst; fuse (reference Fuse,
        src/FeatureMatcher.cc:794-942: radius 3*predictedSize, best match
        <= TH_LOW, merge or add observation)."""
        m = self.map
        mm = m.kf_matches[src_kf]
        pt_ids = np.unique(mm[mm >= 0])
        if len(pt_ids) == 0:
            return
        # exclude points already observed in dst
        dst_m = m.kf_matches[dst_kf]
        dst_pts = set(dst_m[dst_m >= 0].tolist())
        pt_ids = np.asarray([p for p in pt_ids if p not in dst_pts], np.int64)
        if len(pt_ids) == 0:
            return
        bucket = 256
        while bucket < len(pt_ids):
            bucket *= 2
        pad = bucket - len(pt_ids)
        idx = np.concatenate([pt_ids, np.zeros(pad, np.int64)])
        pad_valid = np.concatenate([np.ones(len(pt_ids), bool), np.zeros(pad, bool)])

        bounds_lo = jnp.asarray(np.array([0.0, 0.0], np.float32))
        bounds_hi = jnp.asarray(
            np.array([self.cam.width, self.cam.height], np.float32)
        )
        uv, dist, viewcos, pred_size, visible = frame_ops.project_points(
            jnp.asarray(m.pt_pos[idx]), jnp.asarray(m.pt_normal[idx]),
            jnp.asarray(m.pt_min_dist[idx]), jnp.asarray(m.pt_max_dist[idx]),
            jnp.asarray(m.pt_ref_size[idx]), jnp.asarray(m.pt_ref_dist[idx]),
            jnp.asarray(m.kf_pose[dst_kf]),
            float(self.cam.fx), float(self.cam.fy), float(self.cam.cx), float(self.cam.cy),
            bounds_lo, bounds_hi,
        )
        visible = np.asarray(visible) & pad_valid
        if not visible.any():
            return
        res = {
            k: np.asarray(v)
            for k, v in frame_ops.match_by_projection(
                uv, pred_size, viewcos,
                jnp.asarray(m.pt_desc_bits[idx]), jnp.asarray(visible),
                jnp.asarray(m.kf_uv[dst_kf]), jnp.asarray(m.kf_desc_bits[dst_kf]),
                jnp.asarray(m.kf_size[dst_kf]), jnp.asarray(m.kf_feat_valid[dst_kf]),
                3.0, self.match_th, None,
            ).items()
        }
        src = np.nonzero(res["valid"])[0]
        if len(src) == 0:
            return
        counts = m.point_observation_counts()
        merges_keep, merges_drop = [], []
        for s in src:
            pt = int(idx[s])
            slot = int(res["idx"][s])
            existing = int(m.kf_matches[dst_kf][slot])
            if existing >= 0:
                if existing == pt or not m.pt_valid[existing]:
                    continue
                # keep the point with more observations (reference
                # FeatureMatcher.cc:919-931)
                if counts[existing] >= counts[pt]:
                    merges_keep.append(existing)
                    merges_drop.append(pt)
                else:
                    merges_keep.append(pt)
                    merges_drop.append(existing)
            else:
                m.kf_matches[dst_kf][slot] = pt
        if merges_keep:
            m.merge_points(merges_keep, merges_drop)

    # ------------------------------------------------------------------
    def _cull_recent_points(self):
        """Reference MapPointCulling (LocalMapping.cc:194-229): drop points
        with found/visible < 0.25, or <=2 observations two KFs after
        creation; stop tracking after three KFs."""
        to_cull = []
        done = []
        counts = self.map.point_observation_counts()
        for pt, born in self.recent.items():
            if not self.map.pt_valid[pt]:
                done.append(pt)
                continue
            age = self.n_kf_processed - born
            vis = max(int(self.map.pt_visible[pt]), 1)
            ratio = self.map.pt_found[pt] / vis
            if ratio < 0.25:
                to_cull.append(pt)
            elif age >= 2 and counts[pt] <= 2:
                to_cull.append(pt)
            elif age >= 3:
                done.append(pt)
        if to_cull:
            self.map.remove_points(np.asarray(to_cull))
        for pt in to_cull + done:
            self.recent.pop(pt, None)

    # ------------------------------------------------------------------
    def _create_new_points(self, kf: int):
        """Reference CreateNewMapPoints (LocalMapping.cc:231-473)."""
        neighbors, _ = self.map.covisible_keyframes(kf, min_weight=15, max_n=self.max_tri_kfs)
        if len(neighbors) == 0:
            # fall back to most recent other keyframe
            others = [k for k in self.map.keyframe_ids() if k != kf]
            if not others:
                return
            neighbors = [others[-1]]
        t1 = self.map.kf_pose[kf]
        c1 = -t1[:3, :3].T @ t1[:3, 3]
        unmatched1 = (self.map.kf_matches[kf] < 0) & self.map.kf_feat_valid[kf]

        for kf2 in neighbors:
            kf2 = int(kf2)
            t2 = self.map.kf_pose[kf2]
            c2 = -t2[:3, :3].T @ t2[:3, 3]
            baseline = float(np.linalg.norm(c2 - c1))
            med_depth = self._median_depth(kf2)
            if med_depth <= 0 or baseline / med_depth < MIN_BASELINE_DEPTH_RATIO:
                continue
            f12 = _fundamental_from_poses(t1, t2, self.k)
            # epipole in image 2: camera-1 center projected by KF2
            # (reference SearchForTriangulation, src/FeatureMatcher.cc:672-678)
            e_cam = t2[:3, :3] @ c1 + t2[:3, 3]
            e_img = self.k @ e_cam
            epipole2 = (e_img[:2] / e_img[2]
                        if abs(e_img[2]) > 1e-9 else np.full(2, 1e9))
            unmatched2 = (self.map.kf_matches[kf2] < 0) & self.map.kf_feat_valid[kf2]
            res = {
                k: np.asarray(v)
                for k, v in frame_ops.match_for_triangulation(
                    jnp.asarray(self.map.kf_desc_bits[kf]),
                    jnp.asarray(self.map.kf_uv[kf]),
                    jnp.asarray(unmatched1),
                    jnp.asarray(self.map.kf_inv_sigma2[kf]),
                    jnp.asarray(self.map.kf_desc_bits[kf2]),
                    jnp.asarray(self.map.kf_uv[kf2]),
                    jnp.asarray(unmatched2),
                    jnp.asarray(self.map.kf_size[kf2] ** 2),
                    jnp.asarray(f12),
                    jnp.asarray(epipole2.astype(np.float32)),
                    self.match_th, TRI_RATIO,
                ).items()
            }
            sl1 = np.nonzero(res["valid"])[0]
            if len(sl1) == 0:
                continue
            sl2 = res["idx"][sl1]
            uv1 = self.map.kf_uv[kf][sl1]
            uv2 = self.map.kf_uv[kf2][sl2]
            p1 = self.k @ t1[:3]
            p2 = self.k @ t2[:3]
            pts = np.asarray(
                triangulation.triangulate_dlt(
                    jnp.asarray(p1), jnp.asarray(p2),
                    jnp.asarray(uv1), jnp.asarray(uv2),
                )
            )
            good = self._triangulation_gates(
                pts, t1, t2, c1, c2, uv1, uv2,
                self.map.kf_inv_sigma2[kf][sl1], self.map.kf_inv_sigma2[kf2][sl2],
                self.map.kf_size[kf][sl1], self.map.kf_size[kf2][sl2],
            )
            sl1, sl2, pts = sl1[good], sl2[good], pts[good]
            if len(sl1) == 0:
                continue
            ids = self.map.add_points(
                pts.astype(np.float32),
                self.map.kf_desc_bits[kf][sl1],
                kf,
                self.map.kf_size[kf][sl1],
            )
            self.map.kf_matches[kf][sl1] = ids
            self.map.kf_matches[kf2][sl2] = ids
            unmatched1[sl1] = False
            for p in ids:
                self.recent[int(p)] = self.n_kf_processed
            self.map.update_point_stats(ids)

    def _median_depth(self, kf: int) -> float:
        m = self.map.kf_matches[kf]
        ids = m[m >= 0]
        if len(ids) == 0:
            return -1.0
        t = self.map.kf_pose[kf]
        pc = self.map.pt_pos[ids] @ t[:3, :3].T + t[:3, 3]
        return float(np.median(pc[:, 2]))

    def _triangulation_gates(
        self, pts, t1, t2, c1, c2, uv1, uv2, w1, w2, size1, size2
    ):
        finite = np.all(np.isfinite(pts), axis=-1)
        ray1 = pts - c1
        ray2 = pts - c2
        d1 = np.linalg.norm(ray1, axis=-1)
        d2 = np.linalg.norm(ray2, axis=-1)
        cosp = (ray1 * ray2).sum(-1) / np.clip(d1 * d2, 1e-12, None)
        pc1 = pts @ t1[:3, :3].T + t1[:3, 3]
        pc2 = pts @ t2[:3, :3].T + t2[:3, 3]
        fx, fy = self.k[0, 0], self.k[1, 1]
        cx, cy = self.k[0, 2], self.k[1, 2]

        def reproj2(pc, uv):
            with np.errstate(divide="ignore", invalid="ignore"):
                u = fx * pc[:, 0] / pc[:, 2] + cx
                v = fy * pc[:, 1] / pc[:, 2] + cy
            return (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2

        e1 = reproj2(pc1, uv1) * w1
        e2 = reproj2(pc2, uv2) * w2
        ratio_dist = d2 / np.clip(d1, 1e-12, None)
        ratio_size = size1 / np.clip(size2, 1e-12, None)
        scale_ok = (ratio_dist < ratio_size * SCALE_CONSISTENCY_FACTOR) & (
            ratio_dist * SCALE_CONSISTENCY_FACTOR > ratio_size
        )
        return (
            finite
            & (cosp < COS_PARALLAX_MAX)
            & (cosp > 0)
            & (pc1[:, 2] > 0)
            & (pc2[:, 2] > 0)
            & (e1 < TRI_CHI2)
            & (e2 < TRI_CHI2)
            & scale_ok
        )

    # ------------------------------------------------------------------
    def _local_ba(self, kf: int, defer: bool = False):
        """Reference LocalBundleAdjustment structure (Optimizer.cc:450-768):
        current KF + covisible KFs free; KFs observing local points but not
        covisible fixed."""
        cov, _ = self.map.covisible_keyframes(kf, min_weight=1, max_n=self.max_ba_kfs - 1)
        free = [kf] + [int(c) for c in cov]
        pt_ids = set()
        for k in free:
            m = self.map.kf_matches[k]
            pt_ids.update(m[m >= 0].tolist())
        if not pt_ids:
            return
        pt_mask = np.zeros(self.map.max_pt, bool)
        pt_mask[list(pt_ids)] = True
        fixed = []
        for other in self.map.keyframe_ids():
            if other in free:
                continue
            m = self.map.kf_matches[other]
            if pt_mask[m[m >= 0]].any():
                fixed.append(int(other))
        # gauge: if nothing is fixed, fix the oldest free KF
        if not fixed and len(free) > 1:
            oldest = min(free)
            free.remove(oldest)
            fixed = [oldest]
        self._pending_fold = run_bundle_adjustment(
            self.map, self.cam, free, fixed, sorted(pt_ids), mesh=self.mesh,
            defer=defer,
        )

    # ------------------------------------------------------------------
    def _cull_keyframes(self, kf: int):
        """Reference KeyFrameCulling (LocalMapping.cc:651-741): a covisible
        KF is redundant if >90% of its (close, for depth sensors) points
        with >3 weighted observations are seen by >=3 OTHER keyframes at
        finer-or-equal scale — other observation's normalized size <=
        this size * sizeTolerance (= the extractor scale factor,
        reference src/Frame.cc:73, LocalMapping.cc:687-706)."""
        m = self.map
        cov, _ = m.covisible_keyframes(kf, min_weight=15)
        counts = m.point_observation_counts(stereo_weighted=True)
        for cand in cov:
            cand = int(cand)
            if int(m.kf_uid[cand]) == 0:
                continue  # never cull the first keyframe (keyId==0 guard)
            mm = m.kf_matches[cand]
            slots = np.nonzero(mm >= 0)[0]
            if self.sensor != "monocular":
                # only close stereo points count (LocalMapping.cc:678-681)
                d = m.kf_depth[cand][slots]
                slots = slots[(d > 0) & (d <= self.th_depth)]
            if len(slots) < 10:
                continue
            pts = mm[slots]
            cand_sizes = m.kf_size[cand][slots]
            # all observations of these points, excluding cand's own
            okf, oslot, opt = m.observations_of_points(pts)
            other = okf != cand
            size_lut = np.zeros(m.max_pt, np.float32)
            size_lut[pts] = cand_sizes
            finer = other & (
                m.kf_size[okf, oslot] <= size_lut[opt] * self.size_tolerance
            )
            n_finer = np.bincount(opt[finer], minlength=m.max_pt)
            redundant = (counts[pts] > 3) & (n_finer[pts] >= 3)
            if redundant.mean() > 0.9:
                m.remove_keyframe(cand)
