"""Fixed-capacity structure-of-arrays SLAM map.

Replaces the reference's pointer graph (Map / KeyFrame / MapPoint /
Observation, reference include/Map.h, KeyFrame.h, MapPoint.h,
Observation.h) and its mutexes with plain arrays + free-lists, orchestrated
single-threaded on the host. Device solvers (pose opt, BA) consume COO
views of these arrays; the per-frame compute path never touches Python
object graphs.

Capacities are static; slots are recycled through free-lists. Keyframe ->
map-point association is the per-keyframe `kf_matches` array (keypoint slot
-> point id or -1), from which observations, covisibility and BA COO arrays
are derived.
"""

from __future__ import annotations

import numpy as np


class SlamMap:
    def __init__(
        self, max_kf: int = 512, max_pt: int = 60000, n_feat: int = 1024,
        desc_dim: int = 256, desc_dtype=np.uint8,
    ):
        self.max_kf = max_kf
        self.max_pt = max_pt
        self.n_feat = n_feat
        self.desc_dim = desc_dim
        self.desc_dtype = desc_dtype

        k, p, n = max_kf, max_pt, n_feat
        self.kf_valid = np.zeros(k, bool)
        # Slots are recycled, so frames must anchor to a stable keyframe
        # IDENTITY, not a slot: kf_uid is monotonically assigned; culled
        # keyframes retire into `retired_kfs` with their pose relative to a
        # surviving parent (reference KeyFrame::SetBadFlag stores Tcp +
        # parent for exactly this trajectory-replay purpose,
        # src/KeyFrame.cc:492-588, used in SaveTrajectoryTUM).
        self.kf_uid = np.full(k, -1, np.int64)
        self._uid_counter = 0
        self.uid_slot: dict = {}       # live uid -> slot
        self.retired_kfs: dict = {}    # uid -> (t_cp 4x4 f32, parent uid)
        self.kf_pose = np.tile(np.eye(4, dtype=np.float32), (k, 1, 1))  # Tcw
        # covisibility spanning tree: parent slot per keyframe (-1 = root).
        # Parent = max-weight covisible at first connection update
        # (reference KeyFrame::UpdateConnections, src/KeyFrame.cc:410-415);
        # re-parented on cull (SetBadFlag, src/KeyFrame.cc:492-588).
        self.kf_parent = np.full(k, -1, np.int32)
        # accepted loop-closure edges as (uid, uid) pairs — persisted so
        # every later essential-graph solve includes ALL past loop edges
        # (reference Optimizer.cc:914-915 via KeyFrame::GetLoopEdges)
        self.loop_edges: list[tuple[int, int]] = []
        self.kf_ts = np.zeros(k, np.float64)
        self.kf_frame_id = np.full(k, -1, np.int64)
        self.kf_matches = np.full((k, n), -1, np.int32)  # keypoint -> point id
        # per-KF feature snapshots (set at insertion)
        self.kf_uv = np.zeros((k, n, 2), np.float32)  # undistorted coords
        self.kf_desc_bits = np.zeros((k, n, desc_dim), desc_dtype)
        self.kf_octave = np.zeros((k, n), np.int32)
        self.kf_size = np.ones((k, n), np.float32)
        self.kf_angle = np.zeros((k, n), np.float32)
        self.kf_inv_sigma2 = np.ones((k, n), np.float32)
        self.kf_feat_valid = np.zeros((k, n), bool)
        # sensor depth per keypoint (-1 = none); rgbd/stereo keyframes only.
        # A depth-bearing observation counts double in observation tallies
        # (reference MapPoint::GetNumberOfObservations, src/MapPoint.cc:123-140)
        self.kf_depth = np.full((k, n), -1.0, np.float32)

        self.pt_valid = np.zeros(p, bool)
        self.pt_pos = np.zeros((p, 3), np.float32)
        self.pt_desc_bits = np.zeros((p, desc_dim), desc_dtype)
        self.pt_normal = np.zeros((p, 3), np.float32)
        self.pt_min_dist = np.zeros(p, np.float32)
        self.pt_max_dist = np.zeros(p, np.float32)
        self.pt_ref_kf = np.full(p, -1, np.int32)
        self.pt_ref_size = np.ones(p, np.float32)
        self.pt_ref_dist = np.ones(p, np.float32)
        self.pt_first_kf = np.full(p, -1, np.int32)
        self.pt_visible = np.zeros(p, np.int32)
        self.pt_found = np.zeros(p, np.int32)
        # fusion forwarding: dropped point -> surviving point (reference
        # MapPoint::GetReplaced, used by Tracking::CheckReplacedInLastFrame)
        self.pt_replaced = np.full(p, -1, np.int32)
        # rev at which a slot was last freed: freed slots are QUARANTINED
        # for a window of revisions before reuse, so device-resident
        # carries/blocks that still reference the old id cannot silently
        # re-bind to an unrelated new point (the reference's pointer
        # identities can never collide; recycled SoA slot ids can)
        self.pt_freed_rev = np.full(p, -(10 ** 9), np.int64)

        # observer hook: called with the slot of every culled keyframe
        # (System wires the keyframe database's erase — the reference does
        # this from KeyFrame::SetBadFlag -> KeyFrameDatabase::erase; without
        # it culled "ghost" keyframes keep winning loop/reloc retrieval
        # with empty covisibility, starving the consistency chain)
        self.on_kf_removed = None
        self._next_kf = 0
        self._next_pt = 0
        # big-change counter (reference Map::InformNewBigChange / index,
        # consumed by System::MapChanged)
        self.change_idx = 0
        # fine-grained revision: bumped on ANY mutation of point/keyframe
        # geometry or structure; device-side caches key on it
        self.rev = 0
        self._obs_counts_cache = None
        # device-mirror bookkeeping: per-point dirty flags consumed by
        # slam.device_map.DevicePointMirror.sync(); mutators mark AFTER
        # writing so a lock-free sync can never lose an update
        self.pt_dirty = np.zeros(p, bool)
        self._mirror = None

    def mirror(self):
        """The lazily-created device-resident point mirror (see
        slam/device_map.py)."""
        if self._mirror is None:
            from .device_map import DevicePointMirror

            self._mirror = DevicePointMirror(self)
        return self._mirror

    def mark_points_dirty(self, ids):
        """Record that these points' SoA rows changed (call after the
        write)."""
        self.pt_dirty[ids] = True

    # ---------------------------------------------------------- checkpoint
    _SCALARS = (
        "max_kf", "max_pt", "n_feat", "desc_dim",
        "_next_kf", "_next_pt", "_uid_counter",
    )

    def save(self, path: str):
        """Full map checkpoint (the reference's SaveMap/LoadMap is an
        unimplemented TODO, reference include/System.h:122-124; we persist
        the whole SoA state so runs can resume / maps can relocalize)."""
        arrays = {
            k: v for k, v in self.__dict__.items()
            if isinstance(v, np.ndarray)
        }
        # retired-keyframe anchors (dict -> arrays; uid_slot is derivable)
        ruids = sorted(self.retired_kfs)
        arrays["__ret_uid__"] = np.asarray(ruids, np.int64)
        arrays["__ret_parent__"] = np.asarray(
            [self.retired_kfs[u][1] for u in ruids], np.int64
        )
        arrays["__ret_tcp__"] = (
            np.stack([self.retired_kfs[u][0] for u in ruids])
            if ruids else np.zeros((0, 4, 4), np.float32)
        )
        arrays["__loop_edges__"] = np.asarray(
            self.loop_edges, np.int64
        ).reshape(-1, 2)
        meta = {k: getattr(self, k) for k in self._SCALARS}
        meta["desc_dtype"] = np.dtype(self.desc_dtype).name
        np.savez_compressed(path, __meta__=np.asarray([repr(meta)]), **arrays)

    @staticmethod
    def load(path: str) -> "SlamMap":
        z = np.load(path, allow_pickle=False)
        import ast

        meta = ast.literal_eval(str(z["__meta__"][0]))
        m = SlamMap(
            max_kf=meta["max_kf"], max_pt=meta["max_pt"], n_feat=meta["n_feat"],
            desc_dim=meta["desc_dim"], desc_dtype=np.dtype(meta["desc_dtype"]),
        )
        for k in z.files:
            if k == "__meta__" or k.startswith("__ret_") or k == "__loop_edges__":
                continue
            setattr(m, k, z[k])
        if "__loop_edges__" in z.files:
            m.loop_edges = [(int(a), int(b)) for a, b in z["__loop_edges__"]]
        m._next_kf = meta["_next_kf"]
        m._next_pt = meta["_next_pt"]
        m._uid_counter = meta.get("_uid_counter", int(m.kf_uid.max()) + 1)
        m.retired_kfs = {
            int(u): (t.astype(np.float32), int(p))
            for u, p, t in zip(z["__ret_uid__"], z["__ret_parent__"], z["__ret_tcp__"])
        }
        m.uid_slot = {
            int(m.kf_uid[s]): int(s)
            for s in np.nonzero(m.kf_valid)[0]
            if m.kf_uid[s] >= 0
        }
        return m

    # ------------------------------------------------------------------ KFs
    def n_keyframes(self) -> int:
        return int(self.kf_valid.sum())

    def keyframe_ids(self):
        return np.nonzero(self.kf_valid)[0]

    def inform_big_change(self):
        self.change_idx += 1

    def _grow_keyframes(self):
        """Double keyframe capacity in place (pads every kf_* array).
        Slot indices are preserved, so nothing outside this class needs
        remapping; fixed-shape device programs sized by max_kf (pose
        graph) recompile once at the new bucket. The reference grows its
        pointer graph unboundedly (Map.h); we grow in powers of two."""
        old = self.max_kf
        self.max_kf = old * 2
        grow = old
        self.kf_valid = np.pad(self.kf_valid, (0, grow))
        self.kf_uid = np.pad(self.kf_uid, (0, grow), constant_values=-1)
        self.kf_parent = np.pad(self.kf_parent, (0, grow), constant_values=-1)
        self.kf_pose = np.concatenate(
            [self.kf_pose, np.tile(np.eye(4, dtype=np.float32), (grow, 1, 1))]
        )
        self.kf_ts = np.pad(self.kf_ts, (0, grow))
        self.kf_frame_id = np.pad(self.kf_frame_id, (0, grow), constant_values=-1)
        self.kf_matches = np.pad(
            self.kf_matches, ((0, grow), (0, 0)), constant_values=-1
        )
        for name in ("kf_uv", "kf_desc_bits", "kf_octave", "kf_angle"):
            arr = getattr(self, name)
            setattr(self, name, np.pad(
                arr, ((0, grow),) + ((0, 0),) * (arr.ndim - 1)
            ))
        self.kf_size = np.pad(self.kf_size, ((0, grow), (0, 0)),
                              constant_values=1.0)
        self.kf_inv_sigma2 = np.pad(self.kf_inv_sigma2, ((0, grow), (0, 0)),
                                    constant_values=1.0)
        self.kf_feat_valid = np.pad(self.kf_feat_valid, ((0, grow), (0, 0)))
        self.kf_depth = np.pad(self.kf_depth, ((0, grow), (0, 0)),
                               constant_values=-1.0)

    def _grow_points(self, need: int):
        """Double point capacity (repeatedly) until `need` free slots
        exist. Point ids are preserved."""
        while (~self.pt_valid).sum() < need:
            old = self.max_pt
            self.max_pt = old * 2
            grow = old
            self.pt_valid = np.pad(self.pt_valid, (0, grow))
            self.pt_pos = np.pad(self.pt_pos, ((0, grow), (0, 0)))
            self.pt_desc_bits = np.pad(self.pt_desc_bits, ((0, grow), (0, 0)))
            self.pt_normal = np.pad(self.pt_normal, ((0, grow), (0, 0)))
            for name in ("pt_min_dist", "pt_max_dist", "pt_visible", "pt_found"):
                setattr(self, name, np.pad(getattr(self, name), (0, grow)))
            for name, fill in (("pt_ref_kf", -1), ("pt_first_kf", -1),
                               ("pt_replaced", -1),
                               ("pt_freed_rev", -(10 ** 9))):
                setattr(self, name, np.pad(
                    getattr(self, name), (0, grow), constant_values=fill
                ))
            self.pt_ref_size = np.pad(self.pt_ref_size, (0, grow),
                                      constant_values=1.0)
            self.pt_ref_dist = np.pad(self.pt_ref_dist, (0, grow),
                                      constant_values=1.0)
            self.pt_dirty = np.pad(self.pt_dirty, (0, grow))
            self._mirror = None  # capacity changed: full re-upload

    def add_keyframe(self, pose, ts, frame_id, feats, matches) -> int:
        """feats: dict of numpy arrays from the frontend (+ uv_und)."""
        self.rev += 1
        free = np.nonzero(~self.kf_valid)[0]
        if len(free) == 0:
            self._grow_keyframes()
            free = np.nonzero(~self.kf_valid)[0]
        kf = int(free[0])
        self.kf_parent[kf] = -1
        self.kf_pose[kf] = pose
        self.kf_ts[kf] = ts
        self.kf_frame_id[kf] = frame_id
        self.kf_uv[kf] = feats["uv_und"]
        self.kf_desc_bits[kf] = feats["desc_bits"]
        self.kf_octave[kf] = feats["octave"]
        self.kf_size[kf] = feats["size"]
        self.kf_angle[kf] = feats["angle"]
        self.kf_inv_sigma2[kf] = feats["inv_sigma2"]
        self.kf_feat_valid[kf] = feats["valid"]
        self.kf_depth[kf] = feats.get("depth", -1.0)
        self.kf_matches[kf] = matches
        self._next_kf = max(self._next_kf, kf + 1)
        uid = self._uid_counter
        self._uid_counter += 1
        self.kf_uid[kf] = uid
        self.uid_slot[uid] = kf
        # publication point LAST: mutation holds the map lock, but the
        # mapping worker's read-mostly windows are lock-free — a reader
        # must see either no keyframe or a fully-written one
        self.kf_valid[kf] = True
        return kf

    def remove_keyframe(self, kf: int):
        """Cull a keyframe; retire its identity against a surviving anchor
        so recorded frame poses (T_cur_ref) stay replayable after the slot
        is recycled (reference SetBadFlag Tcp, src/KeyFrame.cc:492-588),
        and re-parent its spanning-tree children (same reference): each
        child is greedily attached to the max-covisibility member of the
        growing candidate set seeded with the culled keyframe's parent."""
        self.rev += 1
        # --- spanning-tree re-parenting (reference KeyFrame.cc:504-580)
        old_parent = int(self.kf_parent[kf])
        if not (old_parent >= 0 and self.kf_valid[old_parent]):
            old_parent = -1
        children = {
            int(c)
            for c in np.nonzero((self.kf_parent == kf) & self.kf_valid)[0]
            if int(c) != kf
        }
        if children:
            candidates = [old_parent] if old_parent >= 0 else []
            w_cache = {c: self.covisibility_weights(c) for c in children}
            while children and candidates:
                best = None
                for c in children:
                    w = w_cache[c]
                    for cand in candidates:
                        wt = int(w[cand])
                        if wt > 0 and (best is None or wt > best[2]):
                            best = (c, cand, wt)
                if best is None:
                    break
                c, cand, _ = best
                self.kf_parent[c] = cand
                candidates.append(c)
                children.remove(c)
            for c in children:  # no covisible candidate: attach to grandparent
                self.kf_parent[c] = old_parent

        uid = int(self.kf_uid[kf])
        if uid >= 0:
            parent = old_parent
            if parent < 0:
                cov, _ = self.covisible_keyframes(kf, min_weight=1, max_n=1)
                parent = int(cov[0]) if len(cov) else -1
            if parent >= 0 and parent != kf and self.kf_valid[parent]:
                t_cp = self.kf_pose[kf] @ np.linalg.inv(self.kf_pose[parent])
                self.retired_kfs[uid] = (
                    t_cp.astype(np.float32), int(self.kf_uid[parent])
                )
            self.uid_slot.pop(uid, None)
            self.kf_uid[kf] = -1
        self.kf_valid[kf] = False
        self.kf_parent[kf] = -1
        self.kf_matches[kf] = -1
        if self.on_kf_removed is not None:
            self.on_kf_removed(kf)

    def resolve_anchor(self, t_cr: np.ndarray, uid: int):
        """Walk retired-keyframe parents until a live anchor; returns the
        world pose T_cw = accumulated_T_cr @ T_parent_w, or None if the
        chain dead-ends (anchor evicted without a parent)."""
        t_cr = np.asarray(t_cr, np.float32)
        while uid in self.retired_kfs:
            t_cp, uid = self.retired_kfs[uid]
            t_cr = t_cr @ t_cp
        slot = self.uid_slot.get(int(uid))
        if slot is None or not self.kf_valid[slot]:
            return None
        return t_cr @ self.kf_pose[slot]

    # --------------------------------------------------------------- points
    def n_points(self) -> int:
        return int(self.pt_valid.sum())

    # quarantine window in revisions before a freed slot may be reused
    # (a mapping event bumps rev ~8-10 times; in-flight device carries
    # reference ids at most ~2 events old)
    FREED_QUARANTINE_REVS = 64

    def add_points(self, positions, desc_bits, ref_kf, ref_sizes, first_kf=None):
        """Bulk-add points; returns assigned ids (int32 array)."""
        self.rev += 1
        m = len(positions)

        def eligible():
            return ~self.pt_valid & (
                self.rev - self.pt_freed_rev > self.FREED_QUARANTINE_REVS
            )

        free = np.nonzero(eligible())[0][:m]
        if len(free) < m:
            self._grow_points(m + int((~eligible()).sum()))
            free = np.nonzero(eligible())[0][:m]
        ids = free.astype(np.int32)
        self.pt_valid[ids] = True
        self.pt_replaced[ids] = -1
        # stale forwarding links into recycled slots must not resurrect
        self.pt_replaced[np.isin(self.pt_replaced, ids)] = -1
        self.pt_pos[ids] = positions
        self.pt_desc_bits[ids] = desc_bits
        self.pt_ref_kf[ids] = ref_kf
        self.pt_ref_size[ids] = ref_sizes
        self.pt_first_kf[ids] = ref_kf if first_kf is None else first_kf
        self.pt_visible[ids] = 1
        self.pt_found[ids] = 1
        self.pt_dirty[ids] = True
        return ids

    def remove_points(self, ids):
        self.rev += 1
        ids = np.asarray(ids, np.int32)
        if len(ids) == 0:
            return
        self.pt_valid[ids] = False
        self.pt_freed_rev[ids] = self.rev
        self.pt_dirty[ids] = True
        # erase observations (vectorized over the whole match table)
        drop = np.zeros(self.max_pt, bool)
        drop[ids] = True
        mm = self.kf_matches
        mm[(mm >= 0) & drop[np.maximum(mm, 0)]] = -1

    def merge_points(self, keep_ids, drop_ids):
        """Replace each drop point with its keep point everywhere (reference
        MapPoint::Replace, src/MapPoint.cc:213-252). Deduplicates slots."""
        self.rev += 1
        remap = {}
        for keep, drop in zip(keep_ids, drop_ids):
            keep, drop = int(keep), int(drop)
            if keep == drop or not self.pt_valid[keep] or not self.pt_valid[drop]:
                continue
            remap[drop] = keep
        if not remap:
            return
        drop_arr = np.asarray(list(remap.keys()))
        keep_arr = np.asarray(list(remap.values()))
        lut = np.arange(self.max_pt, dtype=np.int32)
        lut[drop_arr] = keep_arr
        mm = self.kf_matches
        sel = mm >= 0
        mm[sel] = lut[mm[sel]]
        # per-row dedup, first occurrence kept (the reference erases the
        # duplicate observation in Replace, src/MapPoint.cc:224-236):
        # stable row sort groups equal ids; every later member of a run is
        # cleared at its original slot.
        order = np.argsort(mm, axis=1, kind="stable")
        sorted_m = np.take_along_axis(mm, order, axis=1)
        dup = (sorted_m[:, 1:] == sorted_m[:, :-1]) & (sorted_m[:, 1:] >= 0)
        ri, ci = np.nonzero(dup)
        if len(ri):
            mm[ri, order[ri, ci + 1]] = -1
        self.pt_found[keep_arr] += self.pt_found[drop_arr]
        self.pt_visible[keep_arr] += self.pt_visible[drop_arr]
        self.pt_valid[drop_arr] = False
        self.pt_freed_rev[drop_arr] = self.rev
        self.pt_replaced[drop_arr] = keep_arr
        self.pt_dirty[drop_arr] = True

    # ----------------------------------------------------------- structure
    def observations_of_points(self, pt_ids):
        """COO (kf, slot, pt) observation triples for the given points.
        Fully vectorized over the (K, N) match table."""
        pt_ids = np.asarray(pt_ids)
        if len(pt_ids) == 0:
            return (np.zeros(0, np.int32),) * 3
        want = np.zeros(self.max_pt, bool)
        want[pt_ids] = True
        kfs = self.keyframe_ids()
        m = self.kf_matches[kfs]
        sel = (m >= 0) & want[np.maximum(m, 0)]
        ki, slots = np.nonzero(sel)
        return (
            kfs[ki].astype(np.int32),
            slots.astype(np.int32),
            m[ki, slots].astype(np.int32),
        )

    def point_observation_counts(self, stereo_weighted: bool = False):
        """(max_pt,) observation tally per point. Uses the native map-graph
        kernel when available (native/slam_native.cpp). Cached on the map
        revision — the keyframe decision consumes this every frame, but
        the tally only changes when the map mutates.

        stereo_weighted: count a depth-bearing observation as 2 (reference
        MapPoint::GetNumberOfObservations, src/MapPoint.cc:123-140) — the
        keyframe-decision / culling thresholds consume this form."""
        from anyfeature_vslam_tpu import native

        cache = getattr(self, "_obs_counts_cache", None)
        key = (self.rev, stereo_weighted)
        if cache is not None and cache[0] == key:
            return cache[1]

        if not stereo_weighted:
            out = native.point_obs_counts(self.kf_matches, self.kf_valid, self.max_pt)
            if out is not None:
                self._obs_counts_cache = (key, out)
                return out
        counts = np.zeros(self.max_pt, np.int64)
        for kf in self.keyframe_ids():
            m = self.kf_matches[kf]
            sl = np.nonzero(m >= 0)[0]
            if stereo_weighted:
                w = 1 + (self.kf_depth[kf][sl] > 0).astype(np.int64)
                np.add.at(counts, m[sl], w)
            else:
                np.add.at(counts, m[sl], 1)
        self._obs_counts_cache = (key, counts)
        return counts

    def covisibility_weights(self, kf: int):
        """(max_kf,) number of map points shared with `kf` (reference
        KeyFrame::UpdateConnections semantics, weight = shared points).
        Native kernel when available."""
        from anyfeature_vslam_tpu import native

        out = native.covisibility_weights(
            self.kf_matches, self.kf_valid, int(kf), self.max_pt
        )
        if out is not None:
            return out
        my_pts = self.kf_matches[kf]
        my_pts = my_pts[my_pts >= 0]
        w = np.zeros(self.max_kf, np.int64)
        if len(my_pts) == 0:
            return w
        mask = np.zeros(self.max_pt, bool)
        mask[my_pts] = True
        for other in self.keyframe_ids():
            if other == kf:
                continue
            m = self.kf_matches[other]
            ids = m[m >= 0]
            w[other] = mask[ids].sum()
        return w

    def covisible_keyframes(self, kf: int, min_weight: int = 15, max_n: int | None = None):
        w = self.covisibility_weights(kf)
        ids = np.nonzero(w >= min_weight)[0]
        order = np.argsort(-w[ids], kind="stable")
        ids = ids[order]
        if max_n is not None:
            ids = ids[:max_n]
        return ids, w

    def update_point_stats(self, pt_ids=None):
        """Recompute distinctive descriptor, mean normal and scale band for
        points (reference MapPoint::ComputeDistinctiveDescriptors :279-349,
        UpdateNormalAndDepth :372-430)."""
        from anyfeature_vslam_tpu import native

        self.rev += 1
        if pt_ids is None:
            pt_ids = np.nonzero(self.pt_valid)[0]
        pt_ids = np.asarray(pt_ids)
        if len(pt_ids) == 0:
            return
        # camera centers of all valid keyframes (vectorized)
        kf_centers = np.zeros((self.max_kf, 3), np.float32)
        live = self.keyframe_ids()
        if len(live):
            r = self.kf_pose[live, :3, :3]
            t = self.kf_pose[live, :3, 3]
            kf_centers[live] = -np.einsum("kij,ki->kj", r, t)
        if native.update_point_stats(
            self.kf_matches, self.kf_valid, self.kf_desc_bits, self.kf_size,
            kf_centers, pt_ids, self.pt_pos, self.pt_ref_kf,
            self.pt_desc_bits, self.pt_normal, self.pt_ref_size,
            self.pt_ref_dist, self.pt_min_dist, self.pt_max_dist,
        ):
            # mark AFTER the write: a concurrent mirror sync that clears
            # the flag before the write would otherwise leave the mirror
            # permanently stale for these rows
            self.pt_dirty[pt_ids] = True
            return
        # numpy fallback (native toolchain unavailable)
        obs_kf, obs_slot, obs_pt = self.observations_of_points(pt_ids)
        centers = {}
        for kf in np.unique(obs_kf):
            t = self.kf_pose[kf]
            centers[kf] = (-t[:3, :3].T @ t[:3, 3]).astype(np.float32)
        by_pt = {}
        for k, s, p in zip(obs_kf, obs_slot, obs_pt):
            by_pt.setdefault(int(p), []).append((int(k), int(s)))
        for p, obs in by_pt.items():
            descs = np.stack([self.kf_desc_bits[k, s] for k, s in obs])
            if len(obs) > 1:
                if descs.dtype == np.uint8:
                    d = (descs[:, None, :] != descs[None, :, :]).sum(-1)
                else:
                    diff = descs[:, None, :] - descs[None, :, :]
                    d = (diff * diff).sum(-1)
                # reference takes sorted row element (N-1)/2, not the
                # averaged np.median (src/MapPoint.cc:332-341)
                medians = np.sort(d, axis=1)[:, (len(obs) - 1) // 2]
                best = int(np.argmin(medians))
            else:
                best = 0
            self.pt_desc_bits[p] = descs[best]
            pos = self.pt_pos[p]
            normals = np.stack([pos - centers[k] for k, _ in obs])
            norms = np.linalg.norm(normals, axis=1, keepdims=True)
            normals = normals / np.clip(norms, 1e-9, None)
            self.pt_normal[p] = normals.mean(0)
            # scale band from the reference observation
            rk, rs = obs[0]
            ref_kf = int(self.pt_ref_kf[p])
            for k, s in obs:
                if k == ref_kf:
                    rk, rs = k, s
                    break
            dist = float(np.linalg.norm(pos - centers[rk]))
            size = float(self.kf_size[rk, rs])
            self.pt_ref_size[p] = size
            self.pt_ref_dist[p] = dist
            # reference scale-invariance band (MapPoint.cc:402-431):
            # maxDistance = dist * refSize, minDistance = maxDistance /
            # maxKeyPtSize (1.2^7), invariance bounds 0.8*min .. 1.2*max
            max_size = 1.2 ** 7
            self.pt_max_dist[p] = 1.2 * dist * size
            self.pt_min_dist[p] = 0.8 * dist * size / max_size
        self.pt_dirty[pt_ids] = True
