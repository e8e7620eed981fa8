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

import os

import numpy as np
import jax.numpy as jnp

from anyfeature_vslam_tpu.ops import ba as ba_ops
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


def _accel_backend() -> bool:
    """True on an accelerator (TPU) backend. The chunked BA exists to let
    pipelined tracking programs interleave on the single device stream —
    on the CPU backend (tests) the extra per-iteration dispatches are pure
    overhead, so the monolithic program is used there."""
    import jax

    return jax.default_backend() != "cpu"


def _pad_sched(n, schedule):
    """Smallest bucket in `schedule` >= n (last bucket if none). Coarse
    explicit schedules keep the number of distinct compiled shapes small —
    each new shape costs a full XLA compile (seconds on a remote backend)."""
    for c in schedule:
        if n <= c:
            return c
    c = schedule[-1]
    while c < n:
        c *= 4
    return c


def watch_ready(arrays):
    """Background readiness probe: returns a threading.Event set once every
    array's result has LANDED on the host. On the axon (tunneled) backend
    neither Array.is_ready() nor block_until_ready() actually awaits the
    device — the only true completion signal is a fetch — so the waiter
    thread fetches each array (np.asarray), which doubles as pre-landing
    the data: the eventual fold's own np.asarray is then a cached copy.
    The fetch round trips burn a side thread, never the worker or the
    tracker."""
    import threading

    ev = threading.Event()

    def run():
        try:
            for a in arrays:
                np.asarray(a)
        except Exception:  # noqa: BLE001 — readiness only; fold re-raises
            pass
        ev.set()

    threading.Thread(target=run, daemon=True, name="ready-watch").start()
    return ev


def _resolve_merge_chains(pairs):
    """Sequential-equivalent filtering of a batch of (keep, drop) merge
    pairs: the reference applies fusions one at a time and skips any pair
    whose endpoint has already been consumed by an earlier merge
    (MapPoint::Replace checks isBad, src/MapPoint.cc:213-224). A batched
    matcher produces pairs from ONE pre-merge snapshot, so later pairs can
    reference already-dropped points — chaining those (instead of skipping)
    over-merges and destroys live landmarks.

    A point kept by one pair may legitimately be dropped by a LATER pair
    (the reference forwards its observations transitively), so the output
    keep for each drop is the end of its forward chain — merge_points
    applies its id rewrite once, and a drop mapping to another dropped id
    would leave dangling references in kf_matches. Returns (keeps, drops)
    ready for one merge_points call."""
    fwd = {}
    dropped = set()

    def find(x):
        while x in fwd:
            x = fwd[x]
        return x

    for keep, drop in pairs:
        keep, drop = int(keep), int(drop)
        if keep == drop or keep in dropped or drop in dropped:
            continue
        fwd[drop] = keep
        dropped.add(drop)
    drops = list(fwd.keys())
    return [find(d) for d in drops], drops


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

    # deliberately COARSE ladders: every distinct (k,p,o) combination is
    # one XLA program, and tracing+lowering a program costs ~1-2 s of
    # GIL-heavy host work even when the binary is already in the
    # persistent cache. Fine-grained ladders made nearly every run hit a
    # fresh combination mid-run (r5 measured ~19 compiles/run); three
    # steps per axis keeps a steady run at ZERO new programs after warmup
    # while padding waste stays bounded.
    k_cap = _pad_sched(len(kf_list), (4, 64, 1024))
    p_cap = _pad_sched(len(pt_ids), (256, 2048, 8192, 65536))
    o_cap = _pad_sched(n_obs, (1024, 8192, 32768, 262144))

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
    elif (
        defer
        and k_cap <= ba_ops._DENSE_MAX_K
        and k_cap * p_cap <= ba_ops._DENSE_MAX_KP
        and not os.environ.get("AF_NO_CHUNKED_BA")
        and _accel_backend()
    ):
        # async solve: per-iteration dispatches so concurrent pipelined
        # tracking programs interleave on the shared device stream instead
        # of queuing behind one ~100 ms monolithic solver program (the
        # tracker's measured retire-wait tail); identical math
        new_poses, new_pts, chi2, z, valid2 = (
            ba_ops.bundle_adjust_two_stage_chunked(
                *args, n_iters_a=n_iters_a, n_iters_b=n_iters_b
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
        slam_map.mark_points_dirty(pt_ids[still])
        if remove_outliers:
            for i in np.nonzero(outlier)[0]:
                kf = kf_list[obs_kf[i]]
                if same_kf(kf):
                    slam_map.kf_matches[kf][obs_slot[i]] = -1

    if defer:
        # readiness probe: mapping is "busy" (reference
        # LocalMapping::AcceptKeyFrames == false) while the dispatched
        # solve is still executing on device
        fold.ready = watch_ready((new_poses, new_pts, outlier_dev))
        # stream results host-ward as soon as the solve finishes, so the
        # eventual fold pays a local memcpy instead of a tunnel round trip
        for a in (new_poses, new_pts, outlier_dev):
            try:
                a.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
        return fold
    fold()
    return None


class LocalMapper:
    def __init__(self, slam_map: SlamMap, cam, match_th: float = 75.0,
                 max_tri_kfs: int = 10, max_ba_kfs: int = 20, mesh=None,
                 size_tolerance: float = 1.2, sensor: str = "monocular",
                 th_depth: float = 0.0, lock=None):
        import threading

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
        # serializes map MUTATIONS against the tracker (System passes its
        # map_lock in threaded mode). The event holds it only around the
        # actual mutation/dispatch windows — never across a device wait —
        # so keyframe minting and fast-state rebuilds on the tracking
        # thread stall for milliseconds, not a whole mapping event (the
        # reference gets the same property from its interruptible local BA
        # + per-object mutexes, src/LocalMapping.cc:78,125).
        self.lock = lock if lock is not None else threading.RLock()
        # True while the event is between recent-point culling and the
        # triangulation/fusion folds: the map is temporarily SPARSE there,
        # and a tracker snapshot built in that window starves matching
        # for several frames (the tracker's rebuild deadline checks this)
        self.in_sparse_phase = False
        # set after an event's triangulation/fusion folds land: the map
        # just gained its new points, and the tracker should refresh its
        # device snapshot promptly so those points become matchable BEFORE
        # the next keyframe mints — otherwise they never gain a third
        # observation and recent-point culling erases them (measured: the
        # pipelined map thinned to ~40% of the sequential map's points,
        # collapsing the inlier count). Cleared by the tracker's rebuild.
        self.fresh_event = False
        # recent points: pt_id -> kf count at creation (for culling)
        self.recent: dict[int, int] = {}
        self.n_kf_processed = 0
        # deferred local-BA fold (async-mapping mode)
        self._pending_fold = None
        self.debug = False
        # device-resident per-keyframe feature mirrors: keyframe feature
        # snapshots are immutable after insertion, so the batched mapping
        # programs stack these cached device rows instead of re-uploading
        # multi-MB host gathers at every keyframe event. Keyed by slot,
        # guarded by uid against slot recycling. Seeded for free from the
        # tracker's DeviceFeats at keyframe creation.
        self._dev_kf: dict[int, tuple] = {}

    _DEV_FIELDS = ("uv", "bits", "size", "valid", "inv_sigma2", "angle")

    def seed_kf_device(self, kf: int, feats):
        """Adopt a new keyframe's already-on-device feature arrays."""
        try:
            ent = dict(
                uv=feats.dev("uv_und"), bits=feats.dev("desc_bits"),
                size=feats.dev("size"), valid=feats.dev("valid"),
                inv_sigma2=feats.dev("inv_sigma2"), angle=feats.dev("angle"),
            )
        except KeyError:
            return
        self._dev_kf[int(kf)] = (int(self.map.kf_uid[kf]), ent)

    def _kf_dev(self, kf: int) -> dict:
        import jax

        kf = int(kf)
        uid = int(self.map.kf_uid[kf])
        ent = self._dev_kf.get(kf)
        if ent is None or ent[0] != uid:
            m = self.map
            ent = (uid, dict(
                uv=jax.device_put(m.kf_uv[kf]),
                bits=jax.device_put(m.kf_desc_bits[kf]),
                size=jax.device_put(m.kf_size[kf]),
                valid=jax.device_put(m.kf_feat_valid[kf]),
                inv_sigma2=jax.device_put(m.kf_inv_sigma2[kf]),
                angle=jax.device_put(m.kf_angle[kf]),
            ))
            self._dev_kf[kf] = ent
        return ent[1]

    def _kf_dev_stack(self, targets, t_cap):
        """Tuples of the targets' cached device feature rows, zero-padded
        to t_cap (padding rows carry valid=False). The actual stacking
        happens INSIDE the consuming jitted program — every op issued
        outside jit is an eager dispatch, which is pathologically slow on
        a remote backend."""
        import jax

        rows = [self._kf_dev(t) for t in targets]
        zeros = getattr(self, "_dev_zero", None)
        if zeros is None:
            m = self.map
            zeros = {
                "uv": jax.device_put(np.zeros((m.n_feat, 2), np.float32)),
                "bits": jax.device_put(
                    np.zeros((m.n_feat, m.desc_dim), m.desc_dtype)
                ),
                "size": jax.device_put(np.zeros(m.n_feat, np.float32)),
                "valid": jax.device_put(np.zeros(m.n_feat, bool)),
                "inv_sigma2": jax.device_put(np.zeros(m.n_feat, np.float32)),
                "angle": jax.device_put(np.zeros(m.n_feat, np.float32)),
            }
            self._dev_zero = zeros
        out = {}
        for f in self._DEV_FIELDS:
            out[f] = tuple(
                [r[f] for r in rows] + [zeros[f]] * (t_cap - len(rows))
            )
        return out

    # ------------------------------------------------------------------
    def fold_pending(self):
        """Land a previously dispatched (still-running) local BA before the
        next map mutation (see run_bundle_adjustment defer)."""
        if self._pending_fold is not None:
            f = self._pending_fold
            self._pending_fold = None
            f()

    def arm_fold_watcher(self):
        """Land the pending deferred fold from a side thread the moment its
        device results have finished, instead of blocking the mapping event
        on the solve. The fold mutates the map, so it runs under the
        mapper's lock; the identity check makes it a no-op if a
        flush_results already consumed the fold meanwhile. This is the
        worker-thread form of the reference's interruptible local BA
        (mbAbortBA, src/LocalMapping.cc:78,125): the keyframe event ends
        when the solve is DISPATCHED, and the result lands asynchronously."""
        import threading

        f = self._pending_fold
        if f is None:
            return
        ev = getattr(f, "ready", None)

        def run():
            import time as _time

            if ev is not None:
                t_w = _time.perf_counter()
                ev.wait()
                from anyfeature_vslam_tpu import perfcount

                perfcount.event("ba_ready",
                                dur=_time.perf_counter() - t_w)
            with self.lock:
                if self._pending_fold is f:
                    from anyfeature_vslam_tpu import perfcount

                    t0 = _time.perf_counter()
                    self.fold_pending()
                    perfcount.event("ba_fold",
                                    dur=_time.perf_counter() - t0)

        threading.Thread(target=run, daemon=True, name="ba-fold").start()

    def wait_pending_ready(self):
        """Block (lock-free) until the pending deferred solve's device
        results have landed on the host."""
        f = self._pending_fold
        if f is not None:
            ev = getattr(f, "ready", None)
            if ev is not None:
                ev.wait()

    def is_idle(self) -> bool:
        """Reference LocalMapping::AcceptKeyFrames (LocalMapping.cc:576-588):
        the mapper is busy while a dispatched BA solve is still executing on
        device. Gates the keyframe decision's c1b (Tracking.cc:870-876) so a
        long solve throttles keyframe minting instead of every frame passing
        the 'mapping idle' condition."""
        f = self._pending_fold
        if f is None:
            return True
        ev = getattr(f, "ready", None)
        return ev is None or ev.is_set()

    def process_keyframe(self, kf: int, defer_ba: bool = False,
                         overlap_results: bool = False):
        """One keyframe event (reference LocalMapping::Run order,
        src/LocalMapping.cc:48-119).

        overlap_results=False (synchronous / test mode): dispatch + fold
        each device program in place — deterministic.

        overlap_results=True (threaded mode): dispatch triangulation AND
        fusion together (the two programs pipeline on device, their host
        copies land in parallel), then WAIT for the results with the map
        lock RELEASED, then fold both under short lock windows. The
        tracking thread can mint keyframes / rebuild its device snapshot
        during the wait — the event never makes it pay a device round
        trip. Semantics drift vs the reference's strict order: fusion does
        not see THIS event's new points (they fuse next event)."""
        import time

        stages = getattr(self, "stage_times", None)
        if stages is None:
            stages = self.stage_times = {}

        def mark(name, t0):
            t1 = time.perf_counter()
            stages.setdefault(name, []).append(t1 - t0)
            return t1

        from anyfeature_vslam_tpu import perfcount

        t_ev0 = t = time.perf_counter()
        perfcount.event("map_event_start", kf=int(kf))
        # if the previous event's BA solve is still executing, wait for its
        # results to land BEFORE taking the lock — folding an unlanded
        # solve under the lock would stall the tracking thread for the
        # whole remaining solve time
        self.wait_pending_ready()
        with self.lock:
            self.flush_results()
        t = mark("fold", t)
        with self.lock:
            self.n_kf_processed += 1
            m = self.map.kf_matches[kf]
            self.map.update_point_stats(np.unique(m[m >= 0]))
            # first connection update: spanning-tree parent = max-weight
            # covisible (reference KeyFrame::UpdateConnections,
            # src/KeyFrame.cc:410-415; the very first keyframe stays root)
            if self.map.kf_parent[kf] < 0 and int(self.map.kf_uid[kf]) != 0:
                w = self.map.covisibility_weights(kf)
                w[kf] = 0
                best = int(np.argmax(w))
                if w[best] > 0:
                    self.map.kf_parent[kf] = best
            self._cull_recent_points()
            self.in_sparse_phase = True
        t = mark("stats+cullpts", t)
        if self.map.n_keyframes() >= 2:
            if overlap_results:
                # dispatch prep is READ-ONLY on the map and deliberately
                # lock-free: the only concurrent mutators are keyframe
                # minting (safe — kf_valid is published last) and a
                # landing BA fold (pose/point refinements; reading a mix
                # of pre/post values is the same staleness class the
                # reference's per-object mutexes allow). Holding the lock
                # here was the tracker's main stall source.
                rec_t = self._dispatch_new_points(kf)
                rec_f = self._dispatch_fuse(kf)
                t = mark("dispatch", t)
                # the long part (device compute + tunnel readback) also
                # runs with the lock released
                for rec in (rec_t, rec_f):
                    if rec is not None:
                        rec["ready"].wait()
                t = mark("wait", t)
                if rec_t is not None:
                    with self.lock:
                        self._fold_new_points(rec_t)
                t = mark("triangulate", t)
                if rec_f is not None:
                    with self.lock:
                        self._fold_fuse(rec_f)
                self.in_sparse_phase = False
                self.fresh_event = True
                t = mark("fuse", t)
            else:
                with self.lock:
                    rec = self._dispatch_new_points(kf)
                    if rec is not None:
                        self._fold_new_points(rec)
                    t = mark("triangulate", t)
                    rec = self._dispatch_fuse(kf)
                    if rec is not None:
                        self._fold_fuse(rec)
                    self.in_sparse_phase = False
                    t = mark("fuse", t)
            self._local_ba(kf, defer=defer_ba)
            t = mark("ba_dispatch", t)
        self.in_sparse_phase = False
        with self.lock:
            self._cull_keyframes(kf)
        mark("cullkfs", t)
        perfcount.event("map_event_end", kf=int(kf),
                        dur=time.perf_counter() - t_ev0)
        if self.debug:
            mm = self.map.kf_matches[kf]
            print(
                f"    [map] kf={kf} event: map {self.map.n_points()} pts, "
                f"kf matches {int((mm >= 0).sum())}, recent {len(self.recent)}",
                flush=True,
            )

    def flush_results(self):
        """Land the pending deferred local-BA fold into the map."""
        self.fold_pending()

    # ------------------------------------------------------------------
    # tighter ladders than round 3's (8,32,128)/(2,8,32): the padded
    # slack was pure device time (a t_cap=32 triangulation program for 13
    # real neighbors does 2.5x the matching work), and mapping device time
    # directly stalls the pipelined tracker's little per-frame programs on
    # the shared chip. Each step still compiles once (persistent cache).
    # 32 step matters: the steady covisible neighborhood is ~18-25
    # targets, and padding those to 64 tripled both fuse programs' device
    # time — device bursts during events are what the pipelined tracker's
    # retires queue behind (each step still compiles once, persistent)
    FUSE_T_SCHEDULE = (16, 32, 64, 128)

    def _dispatch_fuse(self, kf: int):
        """Reference SearchInNeighbors (LocalMapping.cc:475-555): project the
        new KF's points into first/second-order covisible neighbors and vice
        versa; add missing observations, merge duplicate points (keeping the
        better-observed one). This is what grows observation counts beyond
        the triangulation pair — the keyframe decision and culling depend on
        it.

        Both directions run as ONE batched dispatch each over all target
        keyframes (frame_ops.fuse_points_into_targets /
        fuse_target_points_into_kf) instead of the reference's per-neighbor
        loop; merges collected across the whole batch land in one
        merge_points call at fold time. Neighborhood = nn first-order + 5
        second-order, nn = 20 mono / 10 otherwise (reference
        LocalMapping.cc:477-479). Returns a pending record for _fold_fuse,
        or None."""
        m = self.map
        nn = 20 if self.sensor == "monocular" else 10
        first, _ = m.covisible_keyframes(kf, min_weight=15, max_n=nn)
        targets = []
        for n1 in first:
            targets.append(int(n1))
            second, _ = m.covisible_keyframes(int(n1), min_weight=15, max_n=5)
            targets.extend(int(x) for x in second)
        targets = [
            t for t in dict.fromkeys(targets) if t != kf and m.kf_valid[t]
        ]
        if not targets:
            return None
        t_cap = _pad_sched(len(targets), self.FUSE_T_SCHEDULE)
        targets = targets[:t_cap]
        t_arr = np.asarray(targets, np.int64)
        n_t = len(targets)
        n = m.n_feat

        mm = m.kf_matches[kf]
        pt_ids = np.unique(mm[mm >= 0])
        pt_ids = pt_ids[m.pt_valid[pt_ids]].astype(np.int64)

        bounds_lo = jnp.asarray(np.array([0.0, 0.0], np.float32))
        bounds_hi = jnp.asarray(
            np.array([self.cam.width, self.cam.height], np.float32)
        )
        cam_f = (float(self.cam.fx), float(self.cam.fy),
                 float(self.cam.cx), float(self.cam.cy))

        poses = np.tile(np.eye(4, dtype=np.float32), (t_cap, 1, 1))
        poses[:n_t] = m.kf_pose[t_arr]
        dev = self._kf_dev_stack(targets, t_cap)
        kf_dev = self._kf_dev(kf)

        # membership LUTs: which points each target already observes
        has_t = np.zeros((n_t, m.max_pt), bool)
        for ti in range(n_t):
            dm = m.kf_matches[targets[ti]]
            has_t[ti, dm[dm >= 0]] = True

        # both directions gather their point rows ON DEVICE from the map
        # mirror — only id/mask arrays cross the tunnel (the direction-B
        # descriptor gather alone was ~16 MB of host upload per event
        # before; now it is a ~400 KB id array)
        mirror = m.mirror()
        res_a = None
        idx_a = None
        if len(pt_ids):
            idx_a = np.zeros(n, np.int64)
            idx_a[: len(pt_ids)] = pt_ids
            valid_t = np.zeros((t_cap, n), bool)
            valid_t[:n_t, : len(pt_ids)] = ~has_t[:, pt_ids]
            ga = mirror.gather(idx_a.astype(np.int32))
            ia, va = frame_ops.fuse_points_into_targets(
                *ga[:7], jnp.asarray(valid_t),
                jnp.asarray(poses),
                dev["uv"], dev["bits"], dev["size"], dev["valid"],
                *cam_f, bounds_lo, bounds_hi, 3.0, self.match_th,
            )
            res_a = (ia, va)

        # direction B: each target's points into kf (exclude points kf sees)
        kf_has = np.zeros(m.max_pt, bool)
        kf_has[mm[mm >= 0]] = True
        idx_b = np.zeros((t_cap, n), np.int64)
        valid_b = np.zeros((t_cap, n), bool)
        for ti in range(n_t):
            dm = m.kf_matches[targets[ti]]
            pts = np.unique(dm[dm >= 0])
            pts = pts[m.pt_valid[pts] & ~kf_has[pts]][:n]
            idx_b[ti, : len(pts)] = pts
            valid_b[ti, : len(pts)] = True
        gb = mirror.gather(idx_b.astype(np.int32))
        ib, vb = frame_ops.fuse_target_points_into_kf(
            *gb[:7], jnp.asarray(valid_b),
            jnp.asarray(m.kf_pose[kf]),
            kf_dev["uv"], kf_dev["bits"], kf_dev["size"], kf_dev["valid"],
            *cam_f, bounds_lo, bounds_hi, 3.0, self.match_th,
        )
        arrays = ((res_a[0], res_a[1], ib, vb) if res_a is not None
                  else (ib, vb))
        for a in arrays:
            try:
                a.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
        return dict(
            kf=kf, kf_uid=int(m.kf_uid[kf]), targets=targets,
            target_uids=[int(m.kf_uid[t]) for t in targets],
            idx_a=idx_a, idx_b=idx_b, has_a=res_a is not None,
            arrays=arrays, ready=watch_ready(arrays),
        )

    def _fold_fuse(self, rec):
        """Apply a (possibly one-event-old) fusion result: add missing
        observations, collect merge pairs, merge. Guards: target keyframes
        re-validated by uid; proposed points re-validated (they can be
        culled between dispatch and fold; freed slots are quarantined so
        ids cannot have been recycled)."""
        m = self.map
        kf = rec["kf"]
        if not m.kf_valid[kf] or int(m.kf_uid[kf]) != rec["kf_uid"]:
            return
        from anyfeature_vslam_tpu import perfcount

        with perfcount.timed_fetch():
            fetched = tuple(np.asarray(x) for x in rec["arrays"])
        if rec["has_a"]:
            ia, va, ib, vb = fetched
        else:
            ib, vb = fetched
        targets = rec["targets"]
        n_t = len(targets)
        tgt_ok = [
            m.kf_valid[t] and int(m.kf_uid[t]) == u
            for t, u in zip(targets, rec["target_uids"])
        ]
        idx_a, idx_b = rec["idx_a"], rec["idx_b"]
        counts = m.point_observation_counts()
        merge_pairs = []

        def fuse_one(dst_kf, pt, slot):
            if not m.pt_valid[pt]:
                return
            existing = int(m.kf_matches[dst_kf][slot])
            if existing >= 0:
                if existing == pt or not m.pt_valid[existing]:
                    return
                # keep the point with more observations (reference
                # FeatureMatcher.cc:919-931)
                if counts[existing] >= counts[pt]:
                    merge_pairs.append((existing, pt))
                else:
                    merge_pairs.append((pt, existing))
            else:
                m.kf_matches[dst_kf][slot] = pt

        if rec["has_a"]:
            for ti in range(n_t):
                if not tgt_ok[ti]:
                    continue
                for s in np.nonzero(va[ti])[0]:
                    fuse_one(targets[ti], int(idx_a[s]), int(ia[ti, s]))
        # direction B matches were computed per target from one pre-fuse
        # snapshot, so two targets can propose the SAME point for this kf
        # (the sequential reference excludes a point the kf just gained);
        # without the guard the point lands on two slots at once
        kf_gained = set()
        for ti in range(n_t):
            if not tgt_ok[ti]:
                continue
            for s in np.nonzero(vb[ti])[0]:
                pt = int(idx_b[ti, s])
                if pt in kf_gained:
                    continue
                slot = int(ib[ti, s])
                if int(m.kf_matches[kf][slot]) < 0:
                    kf_gained.add(pt)
                fuse_one(kf, pt, slot)
        if merge_pairs:
            keeps, drops = _resolve_merge_chains(merge_pairs)
            from anyfeature_vslam_tpu import perfcount

            perfcount.bump("fuse_points_merged", len(drops))
            m.merge_points(keeps, drops)
        mm = m.kf_matches[kf]
        m.update_point_stats(np.unique(mm[mm >= 0]))

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
            from anyfeature_vslam_tpu import perfcount

            perfcount.bump("recent_points_culled", len(to_cull))
            self.map.remove_points(np.asarray(to_cull))
        for pt in to_cull + done:
            self.recent.pop(pt, None)

    # ------------------------------------------------------------------
    TRI_T_SCHEDULE = (8, 20, 32)

    def _dispatch_new_points(self, kf: int):
        """Reference CreateNewMapPoints (LocalMapping.cc:231-473), batched:
        epipolar matching + DLT triangulation + acceptance gates against ALL
        nn covisible neighbors run as ONE program
        (frame_ops.triangulate_with_neighbors), nn = 20 mono / 10 otherwise
        (reference LocalMapping.cc:237-239). The reference's sequential
        claim of a keypoint by the first neighbor that successfully creates
        a point becomes: per current-KF slot, take the first (best-covisible)
        neighbor whose match passed every gate. Returns a pending record
        for _fold_new_points, or None."""
        m = self.map
        nn = 20 if self.sensor == "monocular" else self.max_tri_kfs
        neighbors, _ = m.covisible_keyframes(kf, min_weight=15, max_n=nn)
        neighbors = [int(x) for x in neighbors]
        if not neighbors:
            others = [int(k) for k in m.keyframe_ids() if k != kf]
            if not others:
                return None
            neighbors = [others[-1]]
        t1 = m.kf_pose[kf]
        c1 = -t1[:3, :3].T @ t1[:3, 3]

        # baseline / median-depth gate per neighbor (LocalMapping.cc:284-288)
        keep = []
        for kf2 in neighbors:
            t2 = m.kf_pose[kf2]
            c2 = -t2[:3, :3].T @ t2[:3, 3]
            baseline = float(np.linalg.norm(c2 - c1))
            med = self._median_depth(kf2)
            if med > 0 and baseline / med >= MIN_BASELINE_DEPTH_RATIO:
                keep.append(kf2)
        if not keep:
            return None
        t_cap = _pad_sched(len(keep), self.TRI_T_SCHEDULE)
        keep = keep[:t_cap]
        n_t = len(keep)
        t_arr = np.asarray(keep, np.int64)
        n = m.n_feat

        unmatched1 = (m.kf_matches[kf] < 0) & m.kf_feat_valid[kf]
        from anyfeature_vslam_tpu import perfcount

        perfcount.bump("tri_targets", n_t)
        perfcount.bump("tri_unmatched", int(unmatched1.sum()))
        perfcount.bump("tri_events")

        def padded(field, fill=0):
            out = np.full((t_cap,) + field.shape[1:], fill, field.dtype)
            out[:n_t] = field
            return out

        unmatched2 = (m.kf_matches[t_arr] < 0) & m.kf_feat_valid[t_arr]
        poses2 = np.tile(np.eye(4, dtype=np.float32), (t_cap, 1, 1))
        poses2[:n_t] = m.kf_pose[t_arr]
        target_ok = np.zeros(t_cap, bool)
        target_ok[:n_t] = True
        dev = self._kf_dev_stack(keep, t_cap)
        kf_dev = self._kf_dev(kf)

        tri_out = frame_ops.triangulate_with_neighbors(
            kf_dev["bits"], kf_dev["uv"],
            jnp.asarray(unmatched1), kf_dev["inv_sigma2"],
            kf_dev["size"],
            dev["bits"], dev["uv"],
            jnp.asarray(padded(unmatched2)),
            dev["size"], dev["inv_sigma2"],
            jnp.asarray(t1), jnp.asarray(poses2), jnp.asarray(self.k),
            jnp.asarray(target_ok),
            self.match_th, TRI_RATIO,
        )
        for a in tri_out:
            try:
                a.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
        return dict(
            kf=kf, kf_uid=int(m.kf_uid[kf]), targets=keep,
            target_uids=[int(m.kf_uid[t]) for t in keep],
            arrays=tuple(tri_out), ready=watch_ready(tuple(tri_out)),
        )

    def _fold_new_points(self, rec):
        """Apply a (possibly one-event-old) triangulation result: create
        the accepted points and their two observations. Guards: the source
        keyframe and each neighbor re-validated by uid; slots claimed only
        if STILL unmatched on both sides (fusion or a later event may have
        filled them since dispatch)."""
        m = self.map
        kf = rec["kf"]
        if not m.kf_valid[kf] or int(m.kf_uid[kf]) != rec["kf_uid"]:
            return
        from anyfeature_vslam_tpu import perfcount

        with perfcount.timed_fetch():
            idx2, pts, good = (np.asarray(x) for x in rec["arrays"])
        from anyfeature_vslam_tpu import perfcount

        perfcount.bump("tri_good_raw", int(good.any(axis=0).sum()))
        col_ok = np.zeros(good.shape[0], bool)
        for i, (t, u) in enumerate(zip(rec["targets"], rec["target_uids"])):
            col_ok[i] = bool(m.kf_valid[t]) and int(m.kf_uid[t]) == u
        good = good & col_ok[:, None] & (m.kf_matches[kf] < 0)[None, :]
        any_good = good.any(axis=0)
        slots1 = np.nonzero(any_good)[0]
        if len(slots1) == 0:
            return
        first_t = np.argmax(good[:, slots1], axis=0)  # covisibility order
        slots2 = idx2[first_t, slots1]
        t_arr = np.asarray(rec["targets"], np.int64)
        tgt = t_arr[first_t]
        free2 = m.kf_matches[tgt, slots2] < 0
        slots1, slots2, tgt, first_t = (
            slots1[free2], slots2[free2], tgt[free2], first_t[free2]
        )
        if len(slots1) == 0:
            return
        new_pts = pts[first_t, slots1].astype(np.float32)
        ids = m.add_points(
            new_pts, m.kf_desc_bits[kf][slots1], kf, m.kf_size[kf][slots1]
        )
        from anyfeature_vslam_tpu import perfcount

        perfcount.bump("tri_points_added", len(ids))
        m.kf_matches[kf][slots1] = ids
        m.kf_matches[tgt, slots2] = ids
        for p in ids:
            self.recent[int(p)] = self.n_kf_processed
        m.update_point_stats(ids)

    def _median_depth(self, kf: int) -> float:
        m = self.map.kf_matches[kf]
        ids = m[m >= 0]
        if len(ids) == 0:
            return -1.0
        t = self.map.kf_pose[kf]
        pc = self.map.pt_pos[ids] @ t[:3, :3].T + t[:3, 3]
        return float(np.median(pc[:, 2]))

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
