"""Tracking: per-frame state machine (host-orchestrated, jitted compute).

The TPU-native counterpart of the reference Tracking thread (reference
src/Tracking.cc): NOT_INITIALIZED -> OK -> LOST, with monocular two-view
initialization, motion-model tracking, reference-keyframe fallback,
local-map tracking, and the mono keyframe decision (Tracking.cc:838-922:
c1a frames>=maxFrames | c1b mappingIdle, AND c2 inliers < 0.9*refMatches
with inliers > 15).

All per-frame compute (extraction, matching, pose LM, projection) runs as
jitted static-shape programs; this module is glue + bookkeeping on numpy.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from anyfeature_vslam_tpu.frontend.extractor import ExtractorConfig, extract_features
from anyfeature_vslam_tpu.ops import camera as cam_ops
from anyfeature_vslam_tpu.ops import initializer, pose_opt
from anyfeature_vslam_tpu.ops import se3 as se3_ops
from . import fast_track, frame_ops
from .map_state import SlamMap


class TrackState(Enum):
    NOT_INITIALIZED = 0
    OK = 1
    LOST = 2


@dataclass
class TrackingConfig:
    n_features: int = 1000
    sensor: str = "monocular"        # monocular | rgbd | stereo (System.h:54-60)
    bf: float = 0.0                  # baseline(m) * fx (reference mbf, Tracking.cc:1386)
    th_depth: float = 0.0            # close-point depth threshold (reference mThDepth)
    max_frames: int = 30             # maxFrames = fps (keyframe cadence)
    match_th: float = 75.0           # settings/orb32_settings.yaml matchingTh
    init_window: float = 100.0       # reference Tracking.cc:473 (SearchForInitialization)
    init_ratio: float = 0.9
    min_init_matches: int = 100      # reference Tracking.cc:466
    min_init_tracked: int = 100      # reference Tracking.cc:554-559
    motion_radius: float = 15.0      # reference Tracking.cc:744 (th for mono)
    refkf_ratio: float = 0.7         # reference TrackReferenceKeyFrame matcher(0.7)
    local_ratio: float = 0.8         # reference SearchLocalPoints matcher(0.8)
    local_radius: float = 1.0        # reference th=1
    min_motion_matches: int = 20
    min_track_inliers: int = 10
    min_local_inliers: int = 30
    kf_ref_ratio: float = 0.9        # refRatio_high_needNewKey
    kf_min_inliers: int = 15         # minMatchesInliers
    max_local_kfs: int = 80
    local_pt_bucket: int = 4096
    detect_th: float = 20.0
    n_levels: int = 8
    scale_factor: float = 1.2
    detector: str = "fast"
    descriptor: str = "bin256"
    seed: int = 0


class DeviceFeats(dict):
    """Frame features living ON DEVICE, with lazy host mirrors.

    Device->host transfer is the dominant per-frame cost on a remote-TPU
    (tunnel) backend (~23 ms RTT + ~45 MB/s here) and non-trivial even
    locally; descriptors are ~270 KB/frame. So:
      - ``feats.dev(k)`` returns the device array (what every matcher
        consumes) with ZERO transfer;
      - ``feats[k]`` fetches host numpy lazily — all small fields in one
        batched transfer on first access, descriptors only when actually
        touched (keyframe creation, relocalization bookkeeping).
    Host-computed fields (depth, u_right) are plain dict entries; their
    device versions are uploaded on demand and cached.
    """

    _BULKY = ("desc_bits",)

    def __init__(self, devd: dict):
        super().__init__()
        self._dev = dict(devd)
        self._fetched_small = False

    def dev(self, k):
        if k in self._dev:
            return self._dev[k]
        arr = jnp.asarray(super().__getitem__(k))
        self._dev[k] = arr
        return arr

    def _fetch_small(self):
        keys = [k for k in self._dev
                if k not in self._BULKY and not super().__contains__(k)]
        if keys:
            vals = jax.device_get([self._dev[k] for k in keys])
            for k, v in zip(keys, vals):
                super().__setitem__(k, v)
        self._fetched_small = True

    def __getitem__(self, k):
        if not super().__contains__(k):
            if k in self._BULKY and k in self._dev:
                super().__setitem__(k, jax.device_get(self._dev[k]))
            elif not self._fetched_small:
                self._fetch_small()
        return super().__getitem__(k)

    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        self._dev.pop(k, None)  # host write invalidates the device copy

    def __contains__(self, k):
        return super().__contains__(k) or k in self._dev

    def get(self, k, default=None):
        return self[k] if k in self else default

    def materialize(self):
        for k in list(self._dev):
            self[k]
        return self

    def fetch_all(self):
        """Fetch EVERY device-resident field (small + bulky) in ONE
        batched transfer. Keyframe minting touches all of them; two
        separate transfers (small batch + desc_bits) cost two tunnel round
        trips where one suffices."""
        keys = [k for k in self._dev if not super().__contains__(k)]
        if keys:
            from anyfeature_vslam_tpu import perfcount

            with perfcount.timed_fetch():
                vals = jax.device_get([self._dev[k] for k in keys])
            for k, v in zip(keys, vals):
                super().__setitem__(k, v)
        self._fetched_small = True
        return self

    def items(self):
        self.materialize()
        return super().items()

    def keys(self):
        self.materialize()
        return super().keys()

    @classmethod
    def from_numpy(cls, d: dict):
        f = cls({})
        for k, v in d.items():
            dict.__setitem__(f, k, v)
        return f


@dataclass
class FrameData:
    frame_id: int
    ts: float
    feats: dict            # DeviceFeats (or plain numpy dict) incl. uv_und
    pose: np.ndarray | None = None       # Tcw 4x4
    matches: np.ndarray | None = None    # (N,) kp slot -> point id or -1
    # "visual odometry" 3D points (localization mode, rgbd/stereo): per-slot
    # world positions from sensor depth, used by pose opt but never inserted
    # into the map (reference mlpTemporalPoints, Tracking.cc:663-727)
    vo_pts3d: np.ndarray | None = None
    vo_valid: np.ndarray | None = None
    # trajectory entry + tracked-frame stat already recorded (set by the
    # pipelined retire path so process_frame does not double-record)
    finished: bool = False


def _np(d):
    """Fetch a whole device dict in ONE transfer: per-leaf np.asarray pays a
    round-trip each, which dominates on a remote-TPU (tunnel) backend."""
    from anyfeature_vslam_tpu import perfcount

    with perfcount.timed_fetch():
        return dict(zip(d.keys(), jax.device_get(list(d.values()))))


class DevicePointBlock:
    """Device-resident slice of the map's point SoA for projection
    matching, cached on (map.rev, candidate ids). Between keyframes the
    map is immutable (mapping mutates only at keyframe events), so the
    ~0.3 MB of candidate positions/normals/descriptors uploads ONCE per
    local-map change instead of every frame — the host->device analogue
    of the DeviceFeats readback saving."""

    FIELDS = ("pt_pos", "pt_normal", "pt_min_dist", "pt_max_dist",
              "pt_ref_size", "pt_ref_dist", "pt_desc_bits")

    def __init__(self, slam_map: SlamMap):
        self.map = slam_map
        self._key = None
        self._data = None

    def get(self, idx: np.ndarray):
        key = (self.map.rev, idx.shape[0], hash(idx.tobytes()))
        if key != self._key:
            self._key = key
            self._data = tuple(
                jax.device_put(getattr(self.map, f)[idx]) for f in self.FIELDS
            )
        return self._data


def _pad_pow2(n, lo=256):
    """Coarse 4x-step padding: fewer distinct compiled shapes as the
    candidate set grows (each new shape = one full XLA compile)."""
    c = lo
    while c < n:
        c *= 4
    return c


@partial(jax.jit, static_argnames=("cfg", "height", "width"))
def _extract_undistort(img, cam, cfg, height: int, width: int):
    """Extraction + keypoint undistortion fused into one dispatch (the
    reference Frame ctor does both before Track(), src/Frame.cc:171-242).
    The image arrives as uint8 (4x less host->device traffic — PNG sources
    are 8-bit anyway) and is cast to f32 on device."""
    feats = extract_features(img.astype(jnp.float32), cfg, height, width)
    feats["uv_und"] = cam_ops.undistort_points(cam, feats["xy"]).astype(jnp.float32)
    return feats


class Tracker:
    def __init__(self, cfg: TrackingConfig, camera: cam_ops.CameraParams, slam_map: SlamMap):
        self.cfg = cfg
        self.cam = camera
        self.map = slam_map
        self.state = TrackState.NOT_INITIALIZED
        self.ext_cfg = ExtractorConfig(
            n_features=cfg.n_features, n_levels=cfg.n_levels,
            scale_factor=cfg.scale_factor, detect_th=cfg.detect_th,
            detector=cfg.detector, descriptor=cfg.descriptor,
        )
        # init extractor uses 2x features (reference Tracking.h:239)
        self.ext_cfg_init = ExtractorConfig(
            n_features=2 * cfg.n_features, n_levels=cfg.n_levels,
            scale_factor=cfg.scale_factor, detect_th=cfg.detect_th,
            detector=cfg.detector, descriptor=cfg.descriptor,
        )
        b = cam_ops.undistorted_bounds(camera)
        self.bounds_lo = np.array([float(b[0]), float(b[2])], np.float32)
        self.bounds_hi = np.array([float(b[1]), float(b[3])], np.float32)
        self.velocity = None          # T_cur_last
        self._pt_block = DevicePointBlock(slam_map)
        # fused fast path: device-resident carry + local-map block (see
        # slam/fast_track.py). Refreshed whenever the map revision changes.
        self.use_fast_path = True
        self._fast_state = None
        # pipelined tracking (depth > 0): frame i's fused program is
        # DISPATCHED immediately and its results RETIRED `depth` frames
        # later, by which time the async host copies have landed — the
        # ~one-round-trip blocking fetch per frame disappears from the
        # critical path. The device-side carry chains dispatch-to-dispatch
        # (including the constant-velocity prediction, fast_track.
        # predict_pose), so a steady tracked frame costs the host nothing
        # but the dispatch. Trade-off: poses/decisions for frame i land at
        # frame i+depth (the reference's worker threads impose the same
        # latency class on mapping decisions; tracking output latency is
        # new, and bounded by `depth` frames).
        self.pipeline_depth = 0
        self._fs_built_fid = -(10 ** 9)
        self._weak_streak = 0
        self._dev_consts = None
        from collections import deque

        self._inflight: "deque" = deque()
        # device-side dispatch chain: fid, carry (uv/bits/size/angle/
        # match_pt/match_pos of the last DISPATCHED frame), pose + prev
        # pose device arrays
        self._chain = None
        self._draining = False
        self.last: FrameData | None = None
        self.init_ref: FrameData | None = None
        self.ref_kf: int = -1
        self.last_kf_frame_id: int = -1
        self.last_reloc_frame_id: int = -(10**9)
        self.frame_id = 0
        self.n_inliers = 0
        self._n_map_inliers = 0
        # localization-only mode (reference ActivateLocalizationMode,
        # System.h:88, onlyTracking/mbVO in Tracking::Track :184-278)
        self.only_tracking = False
        self.mb_vo = False
        # trajectory: per frame (ts, T_cur_ref, ref_kf, lost)
        self.trajectory: list = []
        self.on_new_keyframe = None   # callback(kf_id) -> local mapping
        # optional hooks into the mapper's device-resident keyframe cache:
        # seed it with the new keyframe's already-on-device features, and
        # read cached rows for the fast path's reference-KF state
        self.on_keyframe_feats = None
        self.kf_dev = None
        # mapping-idle probe for the keyframe decision's c1b (reference
        # LocalMapping::AcceptKeyFrames); System wires LocalMapper.is_idle
        self.mapping_idle = lambda: True
        # True when the map is NOT mid-event in its sparse phase (recent
        # points culled, new ones not yet folded); System wires the
        # LocalMapper flag — gates the snapshot-rebuild deadline
        self.snapshot_safe = lambda: True
        # one-shot "the event's folds just landed" signal (System wires the
        # LocalMapper.fresh_event flag): triggers an EAGER snapshot rebuild
        # so freshly triangulated points become matchable before the next
        # keyframe mints (else culling erases them at age 2 and the map
        # thins). check() reads it; clear() consumes it after a rebuild.
        self.map_fresh_check = lambda: False
        self.map_fresh_clear = lambda: None
        # BA-interrupt hook (reference Tracking.cc:905-918 InterruptBA):
        # when a keyframe is wanted but mapping is busy, land the running
        # solve so the next frame finds mapping idle. System wires
        # LocalMapper.fold_pending.
        self.interrupt_mapping = lambda: None
        # serializes structural map mutations against a threaded mapping
        # worker (System.map_lock when threaded; a private no-contention
        # lock otherwise)
        import threading

        self.map_lock = threading.RLock()
        self.database = None          # KeyFrameDatabase (set once vocab ready)
        self.debug = False
        self.stats = dict(tracked_frames=0, lost_frames=0, resets=0, relocalizations=0)

    def _dbg(self, msg):
        if self.debug:
            print(f"    [track] {msg}", flush=True)

    # ------------------------------------------------------------ frontend
    def _extract(self, img: np.ndarray, init: bool, image_path: str | None = None) -> dict:
        cfg = self.ext_cfg_init if init else self.ext_cfg
        if cfg.detector == "precomputed":
            # r2d2_128-style offline learned features, loaded per frame from
            # sibling bin files (reference src/Feature_r2d2_128.cpp:21-54)
            from anyfeature_vslam_tpu.io.precomputed import load_precomputed_features

            if image_path is None:
                raise ValueError(
                    "precomputed features need the image path (pass it to "
                    "process_frame / track_monocular)"
                )
            feats = DeviceFeats.from_numpy(
                load_precomputed_features(image_path, cfg.capacity, cfg.desc_dim)
            )
            feats["uv_und"] = np.asarray(
                cam_ops.undistort_points(self.cam, feats.dev("xy"))
            ).astype(np.float32)
        else:
            # features stay ON DEVICE; host mirrors are fetched lazily
            # (DeviceFeats) — descriptors only at keyframe creation.
            # `img` may already be an on-device uint8 array (run_sequence
            # prefetches the next frame's upload while the current frame
            # computes).
            if isinstance(img, jax.Array):
                img_dev = img
            else:
                img8 = img if img.dtype == np.uint8 else np.clip(
                    img, 0, 255
                ).astype(np.uint8)
                img_dev = jnp.asarray(img8)
            feats = DeviceFeats(
                _extract_undistort(
                    img_dev, self.cam, cfg, img.shape[0], img.shape[1],
                )
            )
        return feats

    def _attach_depth(self, feats: dict, depth_img: np.ndarray):
        """RGBD: sample the depth map at the (raw) keypoint pixels and derive
        the virtual right coordinate (reference Frame::ComputeStereoFromRGBD,
        src/Frame.cc:648-670: uRight = u - bf/d)."""
        xy = feats["xy"]
        u = np.clip(np.rint(xy[:, 0]).astype(np.int64), 0, depth_img.shape[1] - 1)
        v = np.clip(np.rint(xy[:, 1]).astype(np.int64), 0, depth_img.shape[0] - 1)
        d = depth_img[v, u].astype(np.float32)
        d = np.where(feats["valid"] & (d > 0), d, -1.0).astype(np.float32)
        feats["depth"] = d
        bf = float(self.cfg.bf)
        with np.errstate(divide="ignore", invalid="ignore"):
            ur = feats["uv_und"][:, 0] - bf / d
        feats["u_right"] = np.where(d > 0, ur, -1.0).astype(np.float32)

    def _attach_stereo(self, feats: dict, img_left: np.ndarray, img_right: np.ndarray):
        """Stereo: extract right-image features, row-match them against the
        left keypoints, and refine disparity to sub-pixel with the SAD
        sliding window + parabola fit (reference Frame stereo ctor,
        src/Frame.cc:60-95, ComputeStereoMatches sub-pixel stage
        :566-620) — matching and refinement fused into one dispatch."""
        right = extract_features(
            jnp.asarray(img_right, jnp.float32), self.ext_cfg,
            img_right.shape[0], img_right.shape[1]
        )
        bf = float(self.cfg.bf)
        fx = float(self.cam.fx)
        # rectified input: match on raw pixel rows; disparity in (0, bf/minZ]
        # with minZ = baseline (ORB-SLAM2 convention), i.e. max_disp = fx
        res = _np(
            frame_ops.match_stereo_rows_subpix(
                jnp.asarray(img_left, jnp.float32),
                jnp.asarray(img_right, jnp.float32),
                feats.dev("desc_bits"), feats.dev("xy"),
                feats.dev("size"), feats.dev("valid"),
                right["desc_bits"], right["xy"],
                right["size"], right["valid"],
                self.cfg.match_th, 0.0, fx,
            )
        )
        disp = res["disparity"]
        ok = res["valid"] & (disp > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            d = bf / disp
        feats["depth"] = np.where(ok, d, -1.0).astype(np.float32)
        feats["u_right"] = np.where(
            ok, feats["xy"][:, 0] - disp, -1.0
        ).astype(np.float32)

    def _unproject_depth(self, frame: FrameData, slots: np.ndarray, t_cw: np.ndarray):
        """World positions of keypoints from sensor depth (reference
        Frame::UnprojectStereo, src/Frame.cc:671-687)."""
        z = frame.feats["depth"][slots]
        uv = frame.feats["uv_und"][slots]
        x = (uv[:, 0] - float(self.cam.cx)) * z / float(self.cam.fx)
        y = (uv[:, 1] - float(self.cam.cy)) * z / float(self.cam.fy)
        pc = np.stack([x, y, z], -1).astype(np.float32)
        r = t_cw[:3, :3]
        t = t_cw[:3, 3]
        return pc @ r + (-r.T @ t)  # Rwc = r.T; pc @ Rwc.T = pc @ r

    # ------------------------------------------------------------ main API
    def process_frame(
        self, img: np.ndarray, ts: float, image_path: str | None = None,
        depth: np.ndarray | None = None, img_right: np.ndarray | None = None,
    ):
        fid = self.frame_id
        self.frame_id += 1
        mono = self.cfg.sensor == "monocular"
        init_phase = self.state == TrackState.NOT_INITIALIZED and mono
        # fast-path frames defer extraction INTO the fused per-frame
        # program (fast_track.fused_extract_track) — one device launch
        # instead of two, which matters when each launch costs a fixed
        # remote round trip
        defer_extract = (
            self.use_fast_path and mono and not self.only_tracking
            and self.state == TrackState.OK
            and self.cfg.detector != "precomputed"
            and depth is None and img_right is None
        )
        # pipelined steady state: dispatch this frame's fused program now,
        # retire the frame that fell off the pipeline window
        if (
            self.pipeline_depth > 0 and defer_extract
            and not self._draining
        ):
            frame = FrameData(fid, ts, None)
            rec = self._fast_dispatch(frame, img)
            if rec is not None:
                self._inflight.append(rec)
                while len(self._inflight) > self.pipeline_depth:
                    rec0 = self._inflight.popleft()
                    if not self._fast_retire(rec0, pipelined=True):
                        self._handle_fast_failure(rec0["frame"])
                        break
                return self.state
            # dispatch not possible (no usable chain/snapshot): fall
            # through to the sequential paths below
        self.flush_pipeline()
        feats = None if defer_extract else self._extract(
            img, init=init_phase, image_path=image_path
        )
        frame = FrameData(fid, ts, feats)
        if depth is not None:
            self._attach_depth(feats, depth)
        elif img_right is not None:
            self._attach_stereo(feats, img, img_right)
        self._run_state_machine(frame, img)
        return self.state

    def _run_state_machine(self, frame: FrameData, img=None):
        """Per-frame state transitions (reference Track(), Tracking.cc:154-388).
        Shared by the sequential path and the pipeline drain."""
        mono = self.cfg.sensor == "monocular"
        if self.state == TrackState.NOT_INITIALIZED:
            if mono:
                self._monocular_initialization(frame)
            else:
                self._stereo_initialization(frame)
        elif self.state == TrackState.OK:
            ok = self._track(frame, img)
            if not ok:
                self.state = TrackState.LOST
                self.stats["lost_frames"] += 1
                # reference: reset whole system if lost early (Tracking.cc:355-363)
                if not self.only_tracking and self.map.n_keyframes() <= 5:
                    self._reset()
        else:
            if self._relocalization(frame):
                self.state = TrackState.OK
                self.stats["relocalizations"] += 1
                self.last_reloc_frame_id = frame.frame_id
                self.mb_vo = False
                self.velocity = None
                self.last = frame
            else:
                self.stats["lost_frames"] += 1
        self._finish_frame(frame)

    def _finish_frame(self, frame: FrameData):
        """Record the frame's trajectory entry (once)."""
        if frame.finished or frame.pose is None or self.ref_kf < 0:
            return
        t_ref = self.map.kf_pose[self.ref_kf]
        t_cr = frame.pose @ np.linalg.inv(t_ref)
        # anchor on the keyframe's stable uid: slots are recycled after
        # culling (reference records pKF + Tcr the same way,
        # src/Tracking.cc:371-387)
        self.trajectory.append(
            (frame.ts, t_cr.copy(), int(self.map.kf_uid[self.ref_kf]),
             self.state != TrackState.OK)
        )
        self.stats["tracked_frames"] += 1
        frame.finished = True

    # ---------------------------------------------------------- pipeline
    def flush_pipeline(self):
        """Retire every in-flight frame (oldest first). Entered before any
        sequential processing so frame ordering is preserved; failures
        drain the remaining frames through the normal state machine."""
        while self._inflight:
            rec = self._inflight.popleft()
            if not self._fast_retire(rec, pipelined=True):
                self._handle_fast_failure(rec["frame"])
                break

    def _handle_fast_failure(self, frame: FrameData):
        """A retired frame failed its speculative fused track: replay it —
        and the (now invalid) successor frames — through the sequential
        state machine in order. The replay gives the failed frame a second
        attempt with FRESH state (reseeded carry, staged fallbacks): a
        speculative failure usually means the pipeline's device-side chain
        went stale, not that the frame is untrackable, and a clean retry
        avoids a needless LOST->relocalization excursion. A frame that
        also fails the retry takes the normal LOST path inside
        _run_state_machine."""
        self._chain = None
        self._weak_streak = 0
        if self._fast_state is not None:
            # force a refresh, but THROUGH the gated path (an immediate
            # rebuild here could capture the map mid-event in its sparse
            # phase — the very state that causes these failures)
            self._fast_state["rev"] = -(10 ** 9)
        from anyfeature_vslam_tpu import perfcount

        perfcount.event("fast_failure", fid=frame.frame_id,
                        n_pending=1 + len(self._inflight))
        pending = [frame] + [rec["frame"] for rec in self._inflight]
        self._inflight.clear()
        self._draining = True
        # the replay goes through _track, which retries the fused path
        # with a FRESHLY rebuilt snapshot first (one dispatch) and only
        # falls back to the staged per-stage path if that fails again
        try:
            for f in pending:
                f.pose = None
                f.matches = None
                self._run_state_machine(f, None)
        finally:
            self._draining = False

    def _reset(self):
        self.map.__init__(self.map.max_kf, self.map.max_pt, self.map.n_feat,
                          self.map.desc_dim, self.map.desc_dtype)
        self.state = TrackState.NOT_INITIALIZED
        self.velocity = None
        self.last = None
        self.init_ref = None
        self.ref_kf = -1
        self._fast_state = None
        self._chain = None
        self.stats["resets"] += 1

    # ---------------------------------------------------- initialization
    def _monocular_initialization(self, frame: FrameData):
        cfg = self.cfg
        n_valid = int(frame.feats["valid"].sum())
        if self.init_ref is None:
            if n_valid > 100:  # reference Tracking.cc:446-459
                self.init_ref = frame
            return
        if n_valid <= 100:
            self.init_ref = None
            return
        ref = self.init_ref
        res = _np(
            frame_ops.match_for_initialization(
                ref.feats.dev("uv_und"), ref.feats.dev("desc_bits"),
                ref.feats.dev("octave"), ref.feats.dev("angle"),
                ref.feats.dev("valid"),
                frame.feats.dev("uv_und"), frame.feats.dev("desc_bits"),
                frame.feats.dev("octave"), frame.feats.dev("angle"),
                frame.feats.dev("valid"),
                cfg.init_window, cfg.match_th, cfg.init_ratio,
            )
        )
        n_matches = int(res["valid"].sum())
        self._dbg(f"init: {n_matches} matches vs ref frame {ref.frame_id}")
        if n_matches < cfg.min_init_matches:
            self.init_ref = None  # reference Tracking.cc:469-476
            return
        uv1 = ref.feats["uv_und"]
        uv2 = frame.feats["uv_und"][res["idx"]]
        init = _np(
            initializer.initialize_two_view(
                jnp.asarray(uv1), jnp.asarray(uv2.astype(np.float32)),
                jnp.asarray(res["valid"]), jnp.asarray(np.asarray(self.cam.k_matrix)),
                cfg.seed,
            )
        )
        self._dbg(
            f"init 2-view: success={bool(init['success'])} H={bool(init['used_homography'])} "
            f"rh={float(init['rh']):.2f} n_good={int(init['n_good'])}"
        )
        if not bool(init["success"]):
            return
        self._create_initial_map(ref, frame, res, init)

    def _create_initial_map(self, ref: FrameData, frame: FrameData, match, init):
        """Reference CreateInitialMapMonocular (Tracking.cc:510-599)."""
        cfg = self.cfg
        good = match["valid"] & init["good"]
        n_good = int(good.sum())
        if n_good < cfg.min_init_tracked:
            return
        t1 = np.eye(4, dtype=np.float32)
        t21 = init["t21"].astype(np.float32)

        # map points from triangulation (frame-1/world coords)
        slots1 = np.nonzero(good)[0]
        slots2 = match["idx"][slots1]
        pts3d = init["pts3d"][slots1].astype(np.float32)

        matches1 = np.full(self.map.n_feat, -1, np.int32)
        matches2 = np.full(self.map.n_feat, -1, np.int32)

        # The init extractor runs with 2x feature budget (reference
        # Tracking.h:239) but keyframes store n_feat slots — compact each
        # frame's features so every matched keypoint survives, then fill
        # remaining slots with the strongest unmatched ones.
        def compact(feats, priority_slots):
            n_out = self.map.n_feat
            cap = len(feats["valid"])
            pri = np.zeros(cap, bool)
            pri[priority_slots] = True
            rest = np.nonzero(feats["valid"] & ~pri)[0]
            rest = rest[np.argsort(-feats["resp"][rest], kind="stable")]
            order = np.concatenate([priority_slots, rest])[:n_out]
            out = {k: v[order] for k, v in feats.items()}
            if len(order) < n_out:
                pad = n_out - len(order)
                for k, v in out.items():
                    out[k] = np.concatenate([v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                out["valid"][len(order):] = False
            slot_map = np.full(cap, -1, np.int64)
            slot_map[order] = np.arange(len(order))
            return out, slot_map

        f1, map1 = compact(ref.feats, slots1)
        f2, map2 = compact(frame.feats, slots2)
        slots1 = map1[slots1]
        slots2 = map2[slots2]
        assert (slots1 >= 0).all() and (slots2 >= 0).all()
        kf1 = self.map.add_keyframe(t1, ref.ts, ref.frame_id, f1, matches1)
        kf2 = self.map.add_keyframe(t21, frame.ts, frame.frame_id, f2, matches2)
        ids = self.map.add_points(
            pts3d, f1["desc_bits"][slots1], kf1, f1["size"][slots1]
        )
        self.map.kf_matches[kf1][slots1] = ids
        self.map.kf_matches[kf2][slots2] = ids
        self.map.update_point_stats(ids)

        # global BA on the initial two-KF map (reference: 20 iterations)
        from .local_mapping import run_bundle_adjustment

        run_bundle_adjustment(
            self.map, self.cam, free_kfs=[kf2], fixed_kfs=[kf1],
            pt_ids=ids, n_iters_a=10, n_iters_b=10,
        )

        # scale normalization: median scene depth -> 1 (Tracking.cc:551-575)
        pts = self.map.pt_pos[self.map.kf_matches[kf1][self.map.kf_matches[kf1] >= 0]]
        pc = pts @ self.map.kf_pose[kf1][:3, :3].T + self.map.kf_pose[kf1][:3, 3]
        median_depth = float(np.median(pc[:, 2]))
        n_tracked = int((self.map.kf_matches[kf2] >= 0).sum())
        if median_depth <= 0 or n_tracked < cfg.min_init_tracked:
            self._reset()
            return
        inv_md = 1.0 / median_depth
        for kf in (kf1, kf2):
            self.map.kf_pose[kf][:3, 3] *= inv_md
        # rescale ONLY the points this initialization created: when a map
        # was loaded from a checkpoint (multi-session), rescaling every
        # valid point silently destroys the loaded component's geometry
        # (its keyframe poses keep the old scale) — only the new
        # component's structure belongs to the new gauge
        new_pts = np.asarray(ids)
        new_pts = new_pts[self.map.pt_valid[new_pts]]
        self.map.pt_pos[new_pts] *= inv_md
        self.map.update_point_stats(new_pts)

        frame.pose = self.map.kf_pose[kf2].copy()
        frame.matches = self.map.kf_matches[kf2].copy()
        self.ref_kf = kf2
        self.last_kf_frame_id = frame.frame_id
        self.last = frame
        self.velocity = None
        self.state = TrackState.OK
        self.init_ref = None
        if self.on_new_keyframe:
            self.on_new_keyframe(kf1)
            self.on_new_keyframe(kf2)

    def _stereo_initialization(self, frame: FrameData):
        """Instant map bootstrap from sensor depth (reference
        Tracking::StereoInitialization, src/Tracking.cc:390-437): needs
        > 500 keypoints; pose = identity; one keyframe; a map point per
        keypoint with positive depth."""
        depth = frame.feats.get("depth")
        if depth is None:
            return
        if int(frame.feats["valid"].sum()) <= 500:  # minKeypointsStereo
            return
        pose = np.eye(4, dtype=np.float32)
        frame.pose = pose
        matches = np.full(self.map.n_feat, -1, np.int32)
        kf = self.map.add_keyframe(pose, frame.ts, frame.frame_id, frame.feats, matches)
        slots = np.nonzero(frame.feats["valid"] & (depth > 0))[0]
        if len(slots) < 100:
            self.map.remove_keyframe(kf)
            frame.pose = None
            return
        pts3d = self._unproject_depth(frame, slots, pose)
        ids = self.map.add_points(
            pts3d, frame.feats["desc_bits"][slots], kf, frame.feats["size"][slots]
        )
        self.map.kf_matches[kf][slots] = ids
        self.map.update_point_stats(ids)
        frame.matches = self.map.kf_matches[kf].copy()
        self.ref_kf = kf
        self.last_kf_frame_id = frame.frame_id
        self.last = frame
        self.velocity = None
        self.state = TrackState.OK
        if self.on_new_keyframe:
            self.on_new_keyframe(kf)

    # ------------------------------------------------------------ tracking
    def _check_replaced_in_last_frame(self):
        """Local mapping may have fused map points since the last frame;
        follow replacement links and drop dead ids (reference
        Tracking::CheckReplacedInLastFrame, src/Tracking.cc:601-617)."""
        if self.last is None or self.last.matches is None:
            return
        m = self.last.matches
        sel = np.nonzero(m >= 0)[0]
        if len(sel) == 0:
            return
        ids = m[sel]
        for _ in range(4):  # resolve replacement chains
            rep = self.map.pt_replaced[ids]
            step = rep >= 0
            if not step.any():
                break
            ids = np.where(step, rep, ids)
        ids = np.where(self.map.pt_valid[ids], ids, -1)
        m[sel] = ids

    def _track(self, frame: FrameData, img=None) -> bool:
        cfg = self.cfg
        self._check_replaced_in_last_frame()
        if not self.only_tracking:
            fast = self._try_fast_track(frame, img)
            if fast is not None and not fast and not self._draining \
                    and self.pipeline_depth == 0:
                # sequential mode: a fused-path failure is authoritative
                # (round-4 semantics — the staged retry exists for the
                # pipelined replay, where the failure may be speculative)
                return False
            if fast is None or not fast:
                from anyfeature_vslam_tpu import perfcount
                import time as _time

                _t0 = _time.perf_counter()
                # fast path unavailable OR its speculative snapshot failed:
                # run the staged path — its fresh local-map candidate set
                # and per-stage fallbacks (motion -> ref-KF -> local map,
                # reference Track() :293-316) recover most fused-snapshot
                # failures without a LOST->relocalization excursion
                if frame.feats is None:  # deferred extraction, fast N/A
                    frame.feats = self._extract(img, init=False)
                frame.pose = None
                frame.matches = None
                ok = False
                if self.velocity is not None and frame.frame_id >= self.last_reloc_frame_id + 2:
                    ok = self._track_motion_model(frame)
                if not ok:
                    ok = self._track_reference_kf(frame)
                if ok:
                    ok = self._track_local_map(frame)
                    if (
                        not ok and self.pipeline_depth > 0
                        and frame.pose is not None
                        and self.n_inliers >= max(cfg.kf_min_inliers + 3, 18)
                        and self._weak_streak < 3
                    ):
                        # same hysteresis band as the pipelined retire: a
                        # replayed frame in [weak_floor, 30) keeps tracking
                        # instead of paying a LOST->relocalization excursion
                        # (~0.65 s measured); the map usually re-densifies
                        # at the next fold. Three consecutive weak frames
                        # still fail as the reference would
                        # (src/Tracking.cc:829-836).
                        self._weak_streak += 1
                        perfcount.bump("weak_frames")
                        ok = True
                    elif ok:
                        self._weak_streak = 0
                perfcount.bump("t_staged_s", _time.perf_counter() - _t0)
                perfcount.bump("staged_frames")
                perfcount.event("staged", fid=frame.frame_id,
                                dur=_time.perf_counter() - _t0, ok=ok)
                if not ok:
                    return False
        else:
            # Localization mode (reference Tracking.cc:210-296): mapping is
            # off; when mbVO the map has drifted out of view and tracking
            # rides sensor-depth "visual odometry" points until a
            # relocalization sticks.
            if not self.mb_vo:
                if self.velocity is not None:
                    ok = self._track_motion_model(frame)
                else:
                    ok = self._track_reference_kf(frame)
            else:
                ok_mm = False
                if self.velocity is not None:
                    ok_mm = self._track_motion_model(frame)
                mm_pose = frame.pose.copy() if ok_mm else None
                mm_matches = frame.matches.copy() if ok_mm else None
                ok_reloc = self._relocalization(frame)
                if ok_reloc:
                    self.mb_vo = False
                    self.last_reloc_frame_id = frame.frame_id
                    self.stats["relocalizations"] += 1
                elif ok_mm:
                    frame.pose, frame.matches = mm_pose, mm_matches
                ok = ok_reloc or ok_mm
            if not ok:
                return False
            if not self.mb_vo:
                ok = self._track_local_map(frame)
                if not ok:
                    return False

        # velocity update (reference Tracking.cc:340-350)
        if self.last is not None and self.last.pose is not None:
            self.velocity = frame.pose @ np.linalg.inv(self.last.pose)
        self.last = frame

        if not self.only_tracking and self._need_new_keyframe(frame):
            self._create_new_keyframe(frame)
        return True

    def _pose_optimize(self, frame: FrameData, matches: np.ndarray, init_pose):
        """matches: (N,) kp -> pt id. Returns (pose, inlier_matches, n_inliers).

        Frame-local visual-odometry points (frame.vo_pts3d, localization
        mode) join the solve on slots without a map match; map-point inlier
        count is kept separately for the mbVO decision (reference
        TrackWithMotionModel counts nmatchesMap, Tracking.cc:770-789)."""
        has = matches >= 0
        pt_ids = np.where(has, matches, 0)
        pts = self.map.pt_pos[pt_ids]
        mask = has
        if frame.vo_pts3d is not None:
            use_vo = frame.vo_valid & ~has
            pts = np.where(use_vo[:, None], frame.vo_pts3d, pts).astype(np.float32)
            mask = has | use_vo
        t, inlier, n_in = pose_opt.pose_optimize(
            jnp.asarray(init_pose.astype(np.float32)), jnp.asarray(pts),
            frame.feats.dev("uv_und"),
            frame.feats.dev("inv_sigma2"),
            jnp.asarray(mask & frame.feats["valid"]),
            float(self.cam.fx), float(self.cam.fy), float(self.cam.cx), float(self.cam.cy),
        )
        inlier = np.asarray(inlier)
        out_matches = np.where(inlier, matches, -1).astype(np.int32)
        if frame.vo_pts3d is not None:
            frame.vo_valid = frame.vo_valid & inlier
        self._n_map_inliers = int((inlier & has).sum())
        return np.asarray(t), out_matches, int(n_in)

    def _track_motion_model(self, frame: FrameData) -> bool:
        cfg = self.cfg
        last = self.last
        pred_pose = (self.velocity @ last.pose).astype(np.float32)
        has_pt = last.matches >= 0
        pt_ids = np.where(has_pt, last.matches, 0)
        pts = self.map.pt_pos[pt_ids]
        # localization mode + depth sensor: augment the last frame's map
        # points with sensor-depth VO points (reference UpdateLastFrame
        # temporal points, Tracking.cc:673-727)
        vo_mask = None
        if (
            self.only_tracking and cfg.sensor != "monocular"
            and "depth" in last.feats and last.pose is not None
        ):
            d = last.feats["depth"]
            vo_mask = (~has_pt) & last.feats["valid"] & (d > 0)
            if vo_mask.any():
                slots = np.nonzero(vo_mask)[0]
                pts_vo = np.zeros_like(pts)
                pts_vo[slots] = self._unproject_depth(last, slots, last.pose)
                pts = np.where(vo_mask[:, None], pts_vo, pts)
                has_pt = has_pt | vo_mask
            else:
                vo_mask = None
        # project last frame's points with predicted pose
        pc = pts @ pred_pose[:3, :3].T + pred_pose[:3, 3]
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = float(self.cam.fx) * pc[:, 0] / z + float(self.cam.cx)
            v = float(self.cam.fy) * pc[:, 1] / z + float(self.cam.cy)
        uv_proj = np.stack([u, v], -1).astype(np.float32)
        proj_valid = (
            has_pt & (z > 0)
            & (u >= self.bounds_lo[0]) & (u < self.bounds_hi[0])
            & (v >= self.bounds_lo[1]) & (v < self.bounds_hi[1])
        )
        uv_proj = np.where(np.isfinite(uv_proj), uv_proj, 0.0).astype(np.float32)

        res = _np(
            frame_ops.match_frame_to_frame_2r(
                last.feats.dev("uv_und"), last.feats.dev("desc_bits"),
                last.feats.dev("size"), jnp.asarray(has_pt),
                jnp.asarray(uv_proj), jnp.asarray(proj_valid),
                frame.feats.dev("uv_und"), frame.feats.dev("desc_bits"),
                frame.feats.dev("size"), frame.feats.dev("valid"),
                last.feats.dev("angle"), frame.feats.dev("angle"),
                float(cfg.motion_radius), cfg.match_th, cfg.min_motion_matches,
            )
        )
        if int(res["valid"].sum()) < cfg.min_motion_matches:
            self._dbg(f"motion-model: only {int(res['valid'].sum())} matches")
            return False
        # build frame matches: frame kp slot -> pt id
        matches = np.full(self.map.n_feat, -1, np.int32)
        src = np.nonzero(res["valid"])[0]
        matches[res["idx"][src]] = last.matches[src]
        if vo_mask is not None:
            src_vo = src[vo_mask[src]]
            if len(src_vo):
                frame.vo_pts3d = np.zeros((self.map.n_feat, 3), np.float32)
                frame.vo_valid = np.zeros(self.map.n_feat, bool)
                frame.vo_pts3d[res["idx"][src_vo]] = pts[src_vo]
                frame.vo_valid[res["idx"][src_vo]] = True
        pose, matches, n_in = self._pose_optimize(frame, matches, pred_pose)
        frame.pose = pose
        frame.matches = matches
        self._dbg(f"motion-model: {int(res['valid'].sum())} matches -> {n_in} inliers")
        if self.only_tracking:
            # mbVO: few genuine map matches left (reference Tracking.cc:781-787)
            self.mb_vo = self._n_map_inliers < 10
            return n_in > 20
        return n_in >= cfg.min_track_inliers

    def _track_reference_kf(self, frame: FrameData) -> bool:
        cfg = self.cfg
        if self.ref_kf < 0:
            return False
        kf = self.ref_kf
        kf_has_pt = self.map.kf_matches[kf] >= 0
        res = _np(
            frame_ops.match_descriptors_global(
                frame.feats.dev("desc_bits"), frame.feats.dev("valid"),
                frame.feats.dev("angle"),
                jnp.asarray(self.map.kf_desc_bits[kf]),
                jnp.asarray(kf_has_pt & self.map.kf_feat_valid[kf]),
                jnp.asarray(self.map.kf_angle[kf]),
                cfg.match_th, cfg.refkf_ratio,
            )
        )
        if int(res["valid"].sum()) < 15:  # reference needs >=15 BoW matches
            self._dbg(f"ref-kf: only {int(res['valid'].sum())} matches")
            return False
        matches = np.where(
            res["valid"], self.map.kf_matches[kf][res["idx"]], -1
        ).astype(np.int32)
        init_pose = self.last.pose if self.last and self.last.pose is not None else self.map.kf_pose[kf]
        pose, matches, n_in = self._pose_optimize(frame, matches, init_pose)
        frame.pose = pose
        frame.matches = matches
        self._dbg(f"ref-kf: {int(res['valid'].sum())} matches -> {n_in} inliers")
        return n_in >= cfg.min_track_inliers

    def _local_map_ids(self, frame: FrameData):
        """Local keyframes + points (reference UpdateLocalKeyFrames /
        UpdateLocalPoints, Tracking.cc:1040-1144)."""
        matched = frame.matches[frame.matches >= 0]
        if len(matched) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        # KFs observing current points — one vectorized pass over the
        # (K, N) match table (the per-KF Python loop here was the dominant
        # per-frame host cost at map scale)
        kfs = self.map.keyframe_ids()
        m_all = self.map.kf_matches[kfs]
        pt_mask = np.zeros(self.map.max_pt, bool)
        pt_mask[matched] = True
        counts = ((m_all >= 0) & pt_mask[np.maximum(m_all, 0)]).sum(axis=1)
        seen = counts > 0
        order = np.argsort(-counts[seen], kind="stable")
        k1 = kfs[seen][order][: self.cfg.max_local_kfs]
        local_kfs = k1.tolist()
        if len(k1):
            best = int(k1[0])
            cov, _ = self.map.covisible_keyframes(best, min_weight=15, max_n=10)
            extra = [int(kf) for kf in cov if kf not in set(local_kfs)]
            local_kfs.extend(extra[: max(self.cfg.max_local_kfs - len(local_kfs), 0)])
            self.ref_kf = best
        # local points = union of the local KFs' matched points
        m_local = self.map.kf_matches[np.asarray(local_kfs, np.int64)]
        pts = np.unique(m_local[m_local >= 0])
        return np.asarray(local_kfs, np.int64), pts.astype(np.int64)

    def _track_local_map(self, frame: FrameData) -> bool:
        cfg = self.cfg
        local_kfs, local_pts = self._local_map_ids(frame)
        if len(local_pts) == 0:
            return False
        # candidate block = ALL local points (device-cached across frames
        # while the map revision + id set is unchanged); points already
        # matched this frame are excluded via the per-frame validity mask
        # (a tiny upload) instead of rebuilding the block
        cand = local_pts.astype(np.int64)
        if len(cand) > 0:
            bucket = _pad_pow2(len(cand), lo=min(self.cfg.local_pt_bucket, 256))
            pad = bucket - len(cand)
            idx = np.concatenate([cand, np.zeros(pad, np.int64)])
            already = np.zeros(self.map.max_pt, bool)
            already[frame.matches[frame.matches >= 0]] = True
            pad_valid = np.concatenate(
                [~already[cand], np.zeros(pad, bool)]
            )
            (pos_d, nrm_d, mind_d, maxd_d, rsz_d, rds_d, bits_d) = (
                self._pt_block.get(idx)
            )
            res = _np(
                frame_ops.project_and_match(
                    pos_d, nrm_d, mind_d, maxd_d, rsz_d, rds_d,
                    bits_d, jnp.asarray(pad_valid),
                    jnp.asarray(frame.pose), float(self.cam.fx), float(self.cam.fy),
                    float(self.cam.cx), float(self.cam.cy),
                    jnp.asarray(self.bounds_lo), jnp.asarray(self.bounds_hi),
                    frame.feats.dev("uv_und"), frame.feats.dev("desc_bits"),
                    frame.feats.dev("size"), frame.feats.dev("valid"),
                    cfg.local_radius, cfg.match_th, cfg.local_ratio,
                )
            )
            visible = res["visible"]
            self.map.pt_visible[idx[visible]] += 1
            matches = frame.matches.copy()
            src = np.nonzero(res["valid"])[0]
            # don't overwrite existing matches
            tgt = res["idx"][src]
            free_slot = matches[tgt] < 0
            matches[tgt[free_slot]] = idx[src[free_slot]]
        else:
            matches = frame.matches

        pose, matches, n_in = self._pose_optimize(frame, matches, frame.pose)
        frame.pose = pose
        frame.matches = matches
        self.n_inliers = n_in
        found = matches[matches >= 0]
        self.map.pt_found[found] += 1
        self._dbg(f"local-map: {len(cand)} cands -> {n_in} inliers")
        return n_in >= cfg.min_local_inliers

    # ----------------------------------------------------- fused fast path
    def _try_fast_track(self, frame: FrameData, img=None):
        """One-dispatch tracked frame (dispatch + immediate retire).
        Returns True / False (tracking outcome) or None when the fast path
        does not apply and the staged host-orchestrated path should run
        instead."""
        rec = self._fast_dispatch(frame, img)
        if rec is None:
            return None
        return self._fast_retire(rec, pipelined=False)

    def _fast_dispatch(self, frame: FrameData, img=None):
        """Dispatch the fused tracking program for `frame` and start the
        async host copies of its small outputs. Returns an in-flight
        record (for _fast_retire) or None when the fast path does not
        apply. The device-side chain (carry + last two poses) makes the
        dispatch independent of the previous frame's un-retired results:
        prediction runs on device (fast_track.predict_pose)."""
        from anyfeature_vslam_tpu import perfcount
        import time as _time

        t0 = _time.perf_counter()
        cfg = self.cfg
        if (
            not self.use_fast_path
            or cfg.sensor != "monocular"
            or cfg.detector == "precomputed"
            or self.only_tracking
            or not (isinstance(frame.feats, DeviceFeats)
                    or (frame.feats is None and img is not None))
        ):
            return None
        m = self.map
        fs_rebuilt = False
        chain = self._chain
        if chain is not None and chain["fid"] != frame.frame_id - 1:
            chain = None  # a slow/lost frame broke the chain
        if chain is None:
            # seed from the last retired frame's host truth
            last = self.last
            if (
                last is None or last.pose is None or last.matches is None
                or not isinstance(last.feats, DeviceFeats)
                # the post-init frame carries the 2x-capacity init extraction
                or int(last.feats.dev("uv_und").shape[0]) != m.n_feat
            ):
                return None
            carry = self._build_fast_carry()
            if carry is None:
                return None
            chain = dict(
                fid=last.frame_id, carry=carry,
                pose=jnp.asarray(last.pose.astype(np.float32)), prev=None,
            )
        fs = self._fast_state
        if fs is None or fs["rev"] != m.rev:
            # refresh the device-resident snapshot when the map mutated —
            # preferably at an EVENT BOUNDARY (mapping idle): a mid-event
            # map is in its sparse phase (recent points culled, this
            # event's triangulation/fusion not yet folded), and a block
            # built then starves the tracker for several frames (measured
            # as periodic inlier collapses). The escape hatch rebuilds
            # mid-event anyway when the inlier count shows real decay —
            # a sparse block beats a decayed one.
            age = frame.frame_id - self._fs_built_fid
            if self.pipeline_depth > 0:
                # pipelined: one EAGER rebuild right after each event's
                # folds land (fresh new points must enter the block before
                # the next keyframe mints — see map_fresh_check), plus the
                # rate-limited idle/decay rebuilds
                fresh = self.map_fresh_check() and self.snapshot_safe()
                need = fs is None or (age >= 2 and fresh) or (
                    age >= 3
                    and (self.mapping_idle()
                         or (self.snapshot_safe()
                             and (self.n_inliers < 45 or age >= 10)))
                )
            else:
                # sequential: rebuild exactly when mapping is parked — the
                # event is atomic here, so the snapshot is always built
                # from settled post-event state (round-4 semantics)
                need = fs is None or self.mapping_idle()
            if need:
                t_fs = _time.perf_counter()
                with self.map_lock:
                    fs = self._build_fast_state()
                self._fast_state = fs
                self._fs_built_fid = frame.frame_id
                fs_rebuilt = True
                self.map_fresh_clear()
                perfcount.bump("t_fs_rebuild_s", _time.perf_counter() - t_fs)
                perfcount.bump("fs_rebuilds")
                perfcount.event("fs_rebuild", fid=frame.frame_id,
                                dur=_time.perf_counter() - t_fs)
                if fs is None:
                    return None
        if (
            fs_rebuilt and chain is not None and self.last is not None
            and self.last.frame_id == chain["fid"]
        ):
            # RESEED the device chain from host truth whenever the
            # snapshot refreshes and the last retired frame is current:
            # mapping has refined poses/points since the chain's raw
            # program outputs (BA folds, mint-time sync), and a chain that
            # never re-anchors accumulates that divergence until matching
            # decays (regressed the sustained-drift merge scenario when
            # the chain was first decoupled from the snapshot)
            carry = self._build_fast_carry()
            if carry is not None:
                chain = dict(
                    fid=self.last.frame_id, carry=carry,
                    pose=jnp.asarray(self.last.pose.astype(np.float32)),
                    prev=None,
                )
        carry = chain["carry"]
        reloc_ok = frame.frame_id >= self.last_reloc_frame_id + 2
        if (
            self.pipeline_depth == 0 and self.last is not None
            and self.last.pose is not None
            and self.last.frame_id == chain["fid"]
        ):
            # sequential mode: prediction + LM seed from HOST poses, which
            # incorporate every mapping-side refinement (mint-time sync,
            # BA folds) — exactly the round-4 semantics. Predicting from
            # the raw device-chain outputs instead let tracking drift away
            # from the refined map in sustained-drift segments (regressed
            # the merge scenario).
            use_motion = self.velocity is not None and reloc_ok
            pred = jnp.asarray((
                (self.velocity @ self.last.pose) if use_motion
                else self.last.pose
            ).astype(np.float32))
            last_pose_d = jnp.asarray(self.last.pose.astype(np.float32))
        elif chain["prev"] is not None and reloc_ok:
            # pipelined: velocity from the two previous dispatches, all on
            # device (the host has not seen these poses yet)
            use_motion = True
            pred = fast_track.predict_pose(chain["pose"], chain["prev"])
            last_pose_d = chain["pose"]
        elif self.velocity is not None and reloc_ok and self.last is not None \
                and self.last.frame_id == chain["fid"]:
            use_motion = True
            pred = jnp.asarray(
                (self.velocity @ self.last.pose).astype(np.float32)
            )
            last_pose_d = chain["pose"]
        else:
            use_motion = False
            pred = chain["pose"]
            last_pose_d = chain["pose"]
        dc = self._dev_consts
        if dc is None:
            # per-run device constants, uploaded once (a fresh jnp.asarray
            # per frame costs a host->device transfer each)
            dc = self._dev_consts = dict(
                true=jnp.asarray(True), false=jnp.asarray(False),
                lo=jnp.asarray(self.bounds_lo), hi=jnp.asarray(self.bounds_hi),
            )
        common = (
            carry["uv"], carry["bits"], carry["size"], carry["angle"],
            carry["match_pt"], carry["match_pos"],
            *fs["ref"], *fs["block"],
            pred, last_pose_d,
            dc["true"] if use_motion else dc["false"],
            dc["lo"], dc["hi"],
            float(self.cam.fx), float(self.cam.fy),
            float(self.cam.cx), float(self.cam.cy),
            float(cfg.motion_radius), float(cfg.match_th),
            cfg.min_motion_matches, float(cfg.refkf_ratio),
            float(cfg.local_radius), float(cfg.local_ratio),
            cfg.min_track_inliers,
        )
        if frame.feats is None:
            if isinstance(img, jax.Array):
                img_dev = img
            else:
                img8 = img if img.dtype == np.uint8 else np.clip(
                    img, 0, 255
                ).astype(np.uint8)
                img_dev = jnp.asarray(img8)
            feats_d, out = fast_track.fused_extract_track(
                img_dev, self.cam, self.ext_cfg,
                int(img.shape[0]), int(img.shape[1]), *common,
            )
            frame.feats = DeviceFeats(feats_d)
        else:
            feats = frame.feats
            out = fast_track.fused_track_step(
                feats.dev("uv_und"), feats.dev("desc_bits"),
                feats.dev("size"), feats.dev("angle"), feats.dev("valid"),
                feats.dev("inv_sigma2"), *common,
            )
        feats = frame.feats
        pose_d, pt_d, n_in_d, vis_d, ok1_d, used_mm_d, pos_d = out
        small = (pose_d, pt_d, n_in_d, vis_d, ok1_d)
        for a in small:
            try:
                a.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
        from .local_mapping import watch_ready

        # next dispatch chains off this one — no host involvement
        self._chain = dict(
            fid=frame.frame_id,
            carry=dict(
                uv=feats.dev("uv_und"), bits=feats.dev("desc_bits"),
                size=feats.dev("size"), angle=feats.dev("angle"),
                match_pt=pt_d, match_pos=pos_d,
            ),
            pose=pose_d, prev=chain["pose"],
        )
        perfcount.bump("track_dispatches")
        perfcount.bump("t_dispatch_s", _time.perf_counter() - t0)
        return dict(
            frame=frame, small=small, ready=watch_ready(small),
            blk_ids_np=fs["blk_ids_np"], blk_valid_np=fs["blk_valid_np"],
        )

    def _fast_retire(self, rec, pipelined: bool) -> bool:
        """Consume a dispatched frame's results: host bookkeeping, and (in
        pipelined mode) the velocity/trajectory updates + keyframe
        decision that the sequential path performs in _track."""
        from anyfeature_vslam_tpu import perfcount
        import time as _time

        cfg = self.cfg
        m = self.map
        frame = rec["frame"]
        t0 = _time.perf_counter()
        rec["ready"].wait()
        with perfcount.timed_fetch():
            pose_np, pt_np, n_in, vis_np, ok1 = jax.device_get(rec["small"])
        t1 = _time.perf_counter()
        perfcount.bump("t_retire_wait_s", t1 - t0)
        if t1 - t0 > 0.02:
            perfcount.event("retire_wait", fid=frame.frame_id, dur=t1 - t0)
        n_in = int(n_in)
        if not bool(ok1):
            # both branches failed: tracking lost (reference Track()
            # :293-316). Break the chain so a restart reseeds from host
            # truth.
            self._chain = None
            self._dbg("fast: stage-1 failed")
            perfcount.bump("fast_fail_stage1")
            perfcount.bump("t_retire_s", _time.perf_counter() - t0)
            return False
        # device_get returns read-only buffer-backed arrays; downstream
        # bookkeeping mutates matches in place, so copy
        frame.pose = np.array(pose_np, np.float32)
        matches = np.array(pt_np, np.int32)
        # resolve points merged/culled since dispatch BEFORE the counters:
        # unresolved ids leak found-bumps onto dead slots, starving the
        # survivors' found/visible ratio until MapPointCulling erases live
        # landmarks (reference CheckReplacedInLastFrame runs every frame
        # for the same reason, src/Tracking.cc:601-617)
        self._resolve_stale_matches(matches)
        frame.matches = matches
        self.n_inliers = n_in
        self._n_map_inliers = n_in
        vis_ids = rec["blk_ids_np"][vis_np & rec["blk_valid_np"]]
        m.pt_visible[vis_ids] += 1
        found = matches[matches >= 0]
        m.pt_found[found] += 1
        # the reference-KF refresh is a (K, N) scan; in the pipelined hot
        # loop every other frame is plenty (the anchor only needs SOME
        # live covisible keyframe, and minting overrides it anyway)
        if not pipelined or frame.frame_id % 2 == 0:
            self._update_ref_kf_from_matches(matches)
        self._dbg(f"fast: {len(found)} matches -> {n_in} inliers")
        # hysteresis band: the reference hard-fails TrackLocalMap below 30
        # inliers (src/Tracking.cc:829-836), but on feature-sparse spans
        # the count skates across that line for 1-3 frames and a hard fail
        # costs a LOST->relocalization excursion (~1 s measured). A frame
        # in [weak_floor, 30) keeps tracking — its pose LM is still
        # well-conditioned and the keyframe decision's own >15 gate
        # (reference Tracking.cc:898) stays in charge of densifying the
        # map — but three consecutive weak frames fail as the reference
        # would.
        weak_floor = max(cfg.kf_min_inliers + 3, 18)
        ok = n_in >= cfg.min_local_inliers
        # the hysteresis band applies whenever the tracker RUNS pipelined
        # (including the sequential replay of a speculative failure, which
        # retires with pipelined=False): there a hard fail costs a
        # LOST->relocalization excursion, measured ~0.65 s each
        if (
            not ok and (pipelined or self.pipeline_depth > 0)
            and n_in >= weak_floor and self._weak_streak < 3
        ):
            self._weak_streak += 1
            perfcount.bump("weak_frames")
            ok = True
        elif ok:
            self._weak_streak = 0
        if not ok:
            perfcount.bump("fast_fail_inliers")
            import os as _os

            if _os.environ.get("AF_DEBUG_FAIL"):
                print(f"[fastfail] frame {frame.frame_id} n_in={n_in} "
                      f"kfs={self.map.n_keyframes()} "
                      f"pts={self.map.n_points()} "
                      f"fs_age={frame.frame_id - self._fs_built_fid}",
                      file=__import__('sys').stderr, flush=True)
            self._chain = None
        elif pipelined:
            # the tail of _track, performed at retire time
            if self.last is not None and self.last.pose is not None:
                self.velocity = frame.pose @ np.linalg.inv(self.last.pose)
            self.last = frame
            self._finish_frame(frame)
            if not self.only_tracking and self._need_new_keyframe(frame):
                self._create_new_keyframe(frame)
        perfcount.bump("t_retire_s", _time.perf_counter() - t0)
        return ok

    def _resolve_stale_matches(self, matches):
        """Resolve points merged/culled by mapping since the dispatch, in
        place (reference CheckReplacedInLastFrame, src/Tracking.cc:601-617).
        Applied before a keyframe snapshots the matches; ordinary frames
        skip it (a stale id only nudges a visibility counter)."""
        m = self.map
        sel = np.nonzero(matches >= 0)[0]
        if len(sel) == 0:
            return
        ids = matches[sel]
        for _ in range(4):
            rep = m.pt_replaced[ids]
            step = rep >= 0
            if not step.any():
                break
            ids = np.where(step, rep, ids)
        matches[sel] = np.where(m.pt_valid[ids], ids, -1)

    def _build_fast_state(self):
        """Device-resident local-map block + reference-KF snapshot, valid
        until the next map mutation (map.rev bump)."""
        m = self.map
        if self.last is None or self.last.matches is None or self.ref_kf < 0:
            return None
        local_kfs, local_pts = self._local_map_ids(self.last)
        if len(local_pts) == 0:
            return None
        cap = _pad_pow2(len(local_pts), lo=self.cfg.local_pt_bucket)
        idx = np.full(cap, -1, np.int64)
        idx[: len(local_pts)] = local_pts
        blk_valid = np.zeros(cap, bool)
        blk_valid[: len(local_pts)] = m.pt_valid[local_pts]
        # the block rows are GATHERED ON DEVICE from the map's point
        # mirror (slam/device_map.py): the rebuild uploads only the id
        # array (~16 KB) plus any dirty mirror rows, not the ~1.2 MB of
        # point data round 4 re-uploaded at every refresh
        ids_dev = jnp.asarray(idx.astype(np.int32))
        block = (ids_dev, *m.mirror().gather(ids_dev))
        kf = self.ref_kf
        ref_match = m.kf_matches[kf].astype(np.int32)
        ref_has = (ref_match >= 0) & m.kf_feat_valid[kf]
        if self.kf_dev is not None:
            ent = self.kf_dev(kf)
            ref_bits, ref_angle = ent["bits"], ent["angle"]
        else:
            ref_bits = jax.device_put(m.kf_desc_bits[kf])
            ref_angle = jax.device_put(m.kf_angle[kf])
        ref = (
            ref_bits, ref_angle, jax.device_put(ref_has),
            jax.device_put(np.where(ref_has, ref_match, -1).astype(np.int32)),
            jax.device_put(m.pt_pos[np.maximum(ref_match, 0)]),
        )
        return dict(
            rev=m.rev, ref_kf=kf, block=block, ref=ref,
            blk_ids_np=idx, blk_valid_np=blk_valid,
        )

    def _build_fast_carry(self):
        """Carry for the motion-model branch, rebuilt from host truth after
        a slow-tracked frame or a map mutation (~16 KB upload)."""
        last = self.last
        m = self.map
        mp = last.matches
        ok = (mp >= 0) & m.pt_valid[np.maximum(mp, 0)]
        match_pt = np.where(ok, mp, -1).astype(np.int32)
        return dict(
            uv=last.feats.dev("uv_und"), bits=last.feats.dev("desc_bits"),
            size=last.feats.dev("size"), angle=last.feats.dev("angle"),
            match_pt=jnp.asarray(match_pt),
            match_pos=jnp.asarray(m.pt_pos[np.maximum(mp, 0)]),
        )

    def _update_ref_kf_from_matches(self, matches):
        """Per-frame reference-keyframe update (the ref_kf half of
        UpdateLocalKeyFrames, reference Tracking.cc:1135-1141); the full
        local-map block refresh happens only on map mutation."""
        matched = matches[matches >= 0]
        if len(matched) == 0:
            return
        m = self.map
        kfs = m.keyframe_ids()
        pt_mask = np.zeros(m.max_pt, bool)
        pt_mask[matched] = True
        m_all = m.kf_matches[kfs]
        counts = ((m_all >= 0) & pt_mask[np.maximum(m_all, 0)]).sum(axis=1)
        if counts.max(initial=0) > 0:
            self.ref_kf = int(kfs[np.argmax(counts)])

    # ----------------------------------------------------- relocalization
    def _relocalization(self, frame: FrameData) -> bool:
        """Reference Relocalization (Tracking.cc:1146-1309): BoW candidates
        -> per-candidate descriptor matching (>=15) -> RANSAC-EPnP ->
        pose optimization; success needs >=50 inliers after local-map
        refinement. Runs under the map lock: it reads broad map state and
        is rare enough that blocking on a concurrent mapping event is
        fine."""
        if self.database is None:
            return False
        from anyfeature_vslam_tpu import perfcount
        import time as _time

        _t0 = _time.perf_counter()
        try:
            with self.map_lock:
                return self._relocalization_impl(frame)
        finally:
            perfcount.bump("t_reloc_s", _time.perf_counter() - _t0)
            perfcount.event("reloc", fid=frame.frame_id,
                            dur=_time.perf_counter() - _t0)

    def _relocalization_impl(self, frame: FrameData) -> bool:
        from anyfeature_vslam_tpu.ops import pnp as pnp_ops

        m = self.map
        cands = [
            int(k) for k in self.database.detect_relocalization_candidates(
                frame.feats["desc_bits"], frame.feats["valid"], m
            )
            if m.kf_valid[int(k)]
        ]
        if not cands:
            return False
        # ---- ONE matching dispatch over all candidates, then ONE batched
        # RANSAC-EPnP dispatch (the TPU form of the reference round-robin
        # PnPsolver::iterate(5) across candidates, Tracking.cc:1146-1309).
        # Fixed candidate capacity: one compiled shape for the whole reloc
        # path (a fresh shape mid-run costs a multi-second XLA compile).
        c_cap = 8
        cands = cands[:c_cap]
        bits = np.zeros((c_cap, m.n_feat, m.desc_dim), m.desc_dtype)
        has = np.zeros((c_cap, m.n_feat), bool)
        ang = np.zeros((c_cap, m.n_feat), np.float32)
        for i, kf in enumerate(cands):
            bits[i] = m.kf_desc_bits[kf]
            has[i] = (m.kf_matches[kf] >= 0) & m.kf_feat_valid[kf]
            ang[i] = m.kf_angle[kf]
        res = _np(
            frame_ops.match_descriptors_to_many(
                frame.feats.dev("desc_bits"), frame.feats.dev("valid"),
                frame.feats.dev("angle"),
                jnp.asarray(bits), jnp.asarray(has), jnp.asarray(ang),
                self.cfg.match_th, 0.75,
            )
        )
        nq = len(frame.feats["valid"])
        uv_f = frame.feats["uv_und"].astype(np.float32)
        sigma2_f = (
            1.0 / np.clip(frame.feats["inv_sigma2"], 1e-9, None)
        ).astype(np.float32)
        pts_c = np.zeros((c_cap, nq, 3), np.float32)
        val_c = np.zeros((c_cap, nq), bool)
        match_pt = np.full((c_cap, nq), -1, np.int32)
        enough = np.zeros(c_cap, bool)
        for i, kf in enumerate(cands):
            sl = np.nonzero(res["valid"][i])[0]
            if len(sl) < 15:  # reference needs >=15 BoW matches per cand
                continue
            enough[i] = True
            ids = m.kf_matches[kf][res["idx"][i][sl]]
            pts_c[i, sl] = m.pt_pos[ids]
            val_c[i, sl] = True
            match_pt[i, sl] = ids
        if not enough.any():
            return False
        outs = _np(
            pnp_ops.pnp_ransac_many(
                jnp.asarray(pts_c), jnp.asarray(np.tile(uv_f, (c_cap, 1, 1))),
                jnp.asarray(np.tile(sigma2_f, (c_cap, 1))),
                jnp.asarray(val_c),
                float(self.cam.fx), float(self.cam.fy),
                float(self.cam.cx), float(self.cam.cy), self.cfg.seed,
            )
        )
        for i, kf in enumerate(cands):
            if not enough[i] or int(outs["n_inliers"][i]) < 10:
                continue
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = outs["r"][i]
            pose[:3, 3] = outs["t"][i]
            inl = outs["inliers"][i] & val_c[i]
            matches = np.where(inl, match_pt[i], -1).astype(np.int32)[: m.n_feat]
            if len(matches) < m.n_feat:
                matches = np.concatenate(
                    [matches, np.full(m.n_feat - len(matches), -1, np.int32)]
                )
            pose, matches, n_in = self._pose_optimize(frame, matches, pose)
            if n_in < 10:
                continue
            # coarse/narrow projection add-match rounds (reference
            # Tracking.cc:1256-1288: radius 10 if nGood<50, re-optimize;
            # then radius 3 if 30<nGood<50, re-optimize)
            if n_in < 50:
                matches2, n_add = self._reloc_add_matches(
                    frame, kf, matches, pose, radius=10.0
                )
                if n_add + n_in >= 50:
                    pose, matches, n_in = self._pose_optimize(
                        frame, matches2, pose
                    )
                    if 30 < n_in < 50:
                        matches2, n_add = self._reloc_add_matches(
                            frame, kf, matches, pose, radius=3.0
                        )
                        if n_in + n_add >= 50:
                            pose, matches, n_in = self._pose_optimize(
                                frame, matches2, pose
                            )
            if n_in < 10:
                continue
            frame.pose = pose
            frame.matches = matches
            self.ref_kf = kf
            if self._track_local_map(frame) and self.n_inliers >= 50:
                return True
        return False

    def _reloc_add_matches(self, frame, kf: int, matches, pose, radius: float):
        """Projection search of the candidate keyframe's map points into the
        frame, excluding already-matched points (reference
        SearchByProjection(CurFrame, KF, sFound, r, th),
        src/FeatureMatcher.cc:1406-1506). Returns (merged matches, n_added)."""
        m = self.map
        kf_m = m.kf_matches[kf]
        cand = np.setdiff1d(
            np.unique(kf_m[kf_m >= 0]), matches[matches >= 0]
        ).astype(np.int64)
        cand = cand[m.pt_valid[cand]]
        if len(cand) == 0:
            return matches, 0
        bucket = _pad_pow2(len(cand), lo=256)
        idx = np.concatenate([cand, np.zeros(bucket - len(cand), np.int64)])
        pad_valid = np.concatenate(
            [np.ones(len(cand), bool), np.zeros(bucket - len(cand), bool)]
        )
        res = _np(
            frame_ops.project_and_match(
                jnp.asarray(m.pt_pos[idx]), jnp.asarray(m.pt_normal[idx]),
                jnp.asarray(m.pt_min_dist[idx]), jnp.asarray(m.pt_max_dist[idx]),
                jnp.asarray(m.pt_ref_size[idx]), jnp.asarray(m.pt_ref_dist[idx]),
                jnp.asarray(m.pt_desc_bits[idx]), jnp.asarray(pad_valid),
                jnp.asarray(pose), float(self.cam.fx), float(self.cam.fy),
                float(self.cam.cx), float(self.cam.cy),
                jnp.asarray(self.bounds_lo), jnp.asarray(self.bounds_hi),
                frame.feats.dev("uv_und"),
                frame.feats.dev("desc_bits"),
                frame.feats.dev("size"),
                frame.feats.dev("valid"),
                float(radius), self.cfg.match_th, None,
            )
        )
        merged = matches.copy()
        src = np.nonzero(res["valid"])[0]
        n_added = 0
        for s in src:
            slot = int(res["idx"][s])
            if merged[slot] < 0:
                merged[slot] = int(idx[s])
                n_added += 1
        return merged, n_added

    # --------------------------------------------------------- keyframes
    def _need_new_keyframe(self, frame: FrameData) -> bool:
        """Reference NeedNewKeyFrame (src/Tracking.cc:838-922), including the
        stereo/RGBD close-point conditions and the per-sensor ref-ratio."""
        cfg = self.cfg
        if self.only_tracking:
            return False
        n_kf = self.map.n_keyframes()
        if (
            frame.frame_id < self.last_reloc_frame_id + cfg.max_frames
            and n_kf > cfg.max_frames
        ):
            return False
        mono = cfg.sensor == "monocular"
        min_obs = 3 if n_kf > 2 else 2
        counts = self.map.point_observation_counts(stereo_weighted=not mono)
        ref_m = self.map.kf_matches[self.ref_kf]
        ref_pts = ref_m[ref_m >= 0]
        n_ref = int((counts[ref_pts] >= min_obs).sum())
        if n_ref < 15 and min_obs > 2:
            # degenerate reference keyframe (a FRESH map component booted
            # inside a loaded mature map — multi-session operation the
            # reference never faces): its points have only 2 observations,
            # so the standard min_obs=3 yields n_ref=0 and c2 could never
            # fire — the new component would starve. Fall back to
            # min_obs=2 exactly as the reference does for young maps.
            n_ref = int((counts[ref_pts] >= 2).sum())

        need_close = False
        if not mono and "depth" in frame.feats:
            d = frame.feats["depth"]
            close = frame.feats["valid"] & (d > 0) & (d < cfg.th_depth)
            tracked = close & (frame.matches >= 0)
            n_tracked_close = int(tracked.sum())
            n_nontracked_close = int((close & ~tracked).sum())
            # minTrackedClose=100, minNonTrackedClose=70 (Tracking.h:296-297)
            need_close = (n_tracked_close < 100) and (n_nontracked_close > 70)

        if mono:
            th_ref = cfg.kf_ref_ratio        # 0.9
        elif n_kf < 2:
            th_ref = 0.4                     # refRatio_low_needNewKey
        else:
            th_ref = 0.75                    # refRatio_medium_needNewKey

        frames_since = frame.frame_id - self.last_kf_frame_id
        c1a = frames_since >= cfg.max_frames
        # c1b: minFrames=0 passed AND local mapping idle (reference
        # Tracking.cc:870-876 bLocalMappingIdle) — while the async local-BA
        # of the previous keyframe still runs on device, mapping is busy
        # and only c1a can force a keyframe
        c1b = frames_since >= 0 and self.mapping_idle()
        c1c = (not mono) and (self.n_inliers < n_ref * 0.25 or need_close)
        c2 = ((self.n_inliers < n_ref * th_ref) or need_close) and (
            self.n_inliers > cfg.kf_min_inliers
        )
        need = (c1a or c1b or c1c) and c2
        if not need and c2 and not self.mapping_idle():
            # reference InterruptBA (Tracking.cc:905-918): a keyframe is
            # wanted but mapping is busy — abort/land the running local BA
            # so the keyframe is inserted at the next frame (the reference's
            # mono path also waits for the idle signal after the interrupt)
            self.interrupt_mapping()
        return need

    def _create_depth_points(self, frame: FrameData, kf: int):
        """Stereo/RGBD keyframes mint map points directly from sensor depth:
        every close point (< th_depth), and at least the 100 nearest
        (reference CreateNewKeyFrame, src/Tracking.cc:933-979)."""
        d = frame.feats["depth"]
        cand = frame.feats["valid"] & (d > 0)
        slots = np.nonzero(cand)[0]
        if len(slots) == 0:
            return
        slots = slots[np.argsort(d[slots], kind="stable")]
        dd = d[slots]
        counted = np.arange(1, len(slots) + 1)
        stop = np.nonzero((dd > self.cfg.th_depth) & (counted > 100))[0]
        if len(stop):
            slots = slots[: stop[0]]
        create = slots[self.map.kf_matches[kf][slots] < 0]
        if len(create) == 0:
            return
        free = int((~self.map.pt_valid).sum())
        if free < len(create):
            create = create[:free]
        pts3d = self._unproject_depth(frame, create, frame.pose)
        ids = self.map.add_points(
            pts3d, frame.feats["desc_bits"][create], kf, frame.feats["size"][create]
        )
        self.map.kf_matches[kf][create] = ids
        self.map.update_point_stats(ids)
        frame.matches[create] = ids

    def _create_new_keyframe(self, frame: FrameData):
        from anyfeature_vslam_tpu import perfcount

        perfcount.event("kf_mint", fid=frame.frame_id)
        # break the device prediction chain: the minted keyframe's pose
        # is synced with mapping's refinements below, and the next
        # dispatch should re-anchor on that host truth
        self._chain = None
        if isinstance(frame.feats, DeviceFeats):
            # land every feature field in ONE batched transfer BEFORE
            # taking the lock: add_keyframe's host snapshot would otherwise
            # pay two lazy tunnel round trips while holding it
            frame.feats.fetch_all()
        with self.map_lock:
            kf = self.map.add_keyframe(
                frame.pose, frame.ts, frame.frame_id, frame.feats,
                frame.matches.copy()
            )
            if self.on_keyframe_feats and isinstance(frame.feats, DeviceFeats):
                self.on_keyframe_feats(kf, frame.feats)
            self.ref_kf = kf
            self.last_kf_frame_id = frame.frame_id
            if self.cfg.sensor != "monocular" and "depth" in frame.feats:
                self._create_depth_points(frame, kf)
        if self.on_new_keyframe:
            self.on_new_keyframe(kf)
        # mapping may have refined poses (sync mode); keep frame in sync
        frame.pose = self.map.kf_pose[kf].copy()
        frame.matches = self.map.kf_matches[kf].copy()
