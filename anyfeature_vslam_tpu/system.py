"""System facade: wires tracking + local mapping, runs sequences, saves output.

TPU-native counterpart of the reference `System` class (reference
include/System.h:52, src/System.cc): constructs the map, tracker and local
mapper, routes frames, and saves trajectories + statistics. The reference's
three worker threads become a single-host pipeline in which the local-BA
solve is dispatched asynchronously at keyframe insertion and overlaps with
tracking of the following frames (folding back before the next map
mutation — see slam/local_mapping.run_bundle_adjustment defer); loop
closing is added by the place-recognition module when enabled.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from dataclasses import dataclass

import numpy as np

from .io import dataset, trajectory
from .ops.camera import CameraParams
from .slam.local_mapping import LocalMapper
from .slam.map_state import SlamMap
from .slam.tracking import Tracker, TrackingConfig, TrackState

class _MappingWorker:
    """Host-side mapping thread — the TPU-native counterpart of the
    reference's LocalMapping + LoopClosing worker threads
    (src/System.cc:112-117): keyframes are queued by the tracker and the
    whole mapping event (triangulation, fusion, local BA, culling, place
    recognition, loop closing) runs here, overlapping the tracking of
    subsequent frames in wall-clock.

    Synchronization model (reference: per-object mutexes + a map-update
    mutex): structural map mutations are serialized on the map lock, which
    the EVENT CODE acquires only around its actual mutation/dispatch
    windows (LocalMapper.process_keyframe) — never across a device wait —
    so the tracker's keyframe minting and fast-state rebuilds stall for
    milliseconds, not a whole event (round 4 held the lock for the full
    ~210 ms event and the tracker's p90 frame time showed it; the
    reference avoids the same stall with its interruptible local BA,
    src/LocalMapping.cc:78,125 + src/Tracking.cc:905-918). The tracker's
    per-frame compute path reads device-resident SNAPSHOTS (fast-path
    carry/block), which are immutable by construction; its few host-side
    reads of live map arrays (observation counts, trajectory anchors,
    found/visible counters) are lock-free and tolerate the same transient
    staleness the reference's fine-grained mutexes allow."""

    def __init__(self, event_fn):
        self._event = event_fn
        self._q: queue.Queue = queue.Queue()
        self._pending = 0
        self._pending_lock = threading.Lock()
        self._error = None
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="mapping"
        )
        self._thread.start()

    def idle(self) -> bool:
        return self._pending == 0

    def pending(self) -> int:
        return self._pending

    def submit(self, kf: int):
        if self._error is not None:
            err, self._error = self._error, None
            raise err
        with self._pending_lock:
            self._pending += 1
        self._q.put(kf)

    def flush(self):
        """Block until every queued keyframe has been processed."""
        while self._pending > 0 and self._thread.is_alive():
            time.sleep(0.001)
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def stop(self):
        self.flush()
        self._q.put(None)
        self._thread.join(timeout=5.0)

    def _run(self):
        while True:
            kf = self._q.get()
            if kf is None:
                return
            try:
                self._event(kf)
            except BaseException as e:  # surfaced on next submit/flush
                self._error = e
            finally:
                with self._pending_lock:
                    self._pending -= 1


def _default_vocabulary(feature: str) -> str | None:
    """Shipped vocabulary for a feature family, if present (repo
    `vocabularies/` folder; mirrors the reference's per-feature
    `<Feature>_DBoW2_voc.txt` convention, src/Vocabulary.cpp:54-106)."""
    import glob

    vdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "vocabularies",
    )
    hits = sorted(glob.glob(os.path.join(vdir, f"voc_{feature}_*.npz")))
    return hits[-1] if hits else None


class System:
    def __init__(
        self,
        camera: CameraParams,
        feature: str = "orb32",
        n_features: int | None = None,
        max_kf: int = 512,
        max_pt: int = 60000,
        seed: int = 0,
        fps: float = 30.0,
        vocabulary_path: str | None = None,
        enable_loop_closing: bool = True,
        feature_settings: dict | None = None,
        use_mesh: bool | str = "auto",
        sensor: str = "monocular",
        bf: float = 0.0,
        th_depth: float = 0.0,
        depth_map_factor: float = 1.0,
        async_mapping: bool = True,
        threaded_mapping: bool = False,
        pipeline_depth: int | None = None,
    ):
        from anyfeature_vslam_tpu.frontend.extractor import (
            FEATURE_REGISTRY, ExtractorConfig, descriptor_dim, descriptor_dtype,
        )

        if feature not in FEATURE_REGISTRY:
            raise ValueError(
                f"unknown feature type: {feature} (known: {sorted(FEATURE_REGISTRY)})"
            )
        detector, descriptor, n_oct, scale, detect_th, match_th = FEATURE_REGISTRY[feature]
        if feature_settings:
            # per-feature YAML overrides (reference settings/*_settings.yaml,
            # 4 knobs; read at FeatureExtractor.cpp:26-35)
            n_oct = feature_settings.get("n_levels", n_oct)
            scale = feature_settings.get("scale_factor", scale)
            detect_th = feature_settings.get("detect_th", detect_th)
            match_th = feature_settings.get("match_th", match_th)
        if n_features is None:
            # reference Tracking.cc:1515-1520: 1000 below 310k px, 2000 above
            n_features = 2000 if camera.width * camera.height > 310000 else 1000
        if sensor not in ("monocular", "rgbd", "stereo"):
            raise ValueError(f"unknown sensor: {sensor}")
        if sensor != "monocular" and bf <= 0:
            raise ValueError("rgbd/stereo sensors need bf = baseline * fx > 0")
        if sensor != "monocular" and th_depth <= 0:
            # ORB-SLAM2-style default: 35 * baseline (ThDepth=35, reference
            # Tracking.cc:1460 commented parse; mThDepth = bf * ThDepth / fx)
            th_depth = 35.0 * bf / float(camera.fx)
        cfg = TrackingConfig(
            n_features=n_features,
            sensor=sensor,
            bf=bf,
            th_depth=th_depth,
            max_frames=max(int(round(fps)), 1),
            match_th=match_th,
            detect_th=detect_th,
            n_levels=n_oct,
            scale_factor=scale,
            detector=detector,
            descriptor=descriptor,
            seed=seed,
        )
        capacity = ExtractorConfig(
            n_features=n_features, n_levels=n_oct, scale_factor=scale
        ).capacity
        self.map = SlamMap(
            max_kf=max_kf, max_pt=max_pt, n_feat=capacity,
            desc_dim=descriptor_dim(descriptor),
            desc_dtype=descriptor_dtype(descriptor),
        )
        self.mesh = self._make_mesh(use_mesh)
        # one RLock serializes every structural map mutation: tracker
        # keyframe minting, mapping-event mutation windows, loop
        # correction. Reentrant so nested fold paths work; uncontended in
        # synchronous mode.
        self.map_lock = threading.RLock()
        self.tracker = Tracker(cfg, camera, self.map)
        self.tracker.map_lock = self.map_lock
        self.local_mapper = LocalMapper(
            self.map, camera, match_th=match_th, mesh=self.mesh,
            size_tolerance=scale, sensor=sensor, th_depth=th_depth,
            lock=self.map_lock,
        )
        self.tracker.on_new_keyframe = self._on_new_keyframe
        self.tracker.mapping_idle = self.local_mapper.is_idle
        self.tracker.interrupt_mapping = self.local_mapper.fold_pending
        self.tracker.on_keyframe_feats = self.local_mapper.seed_kf_device
        self.tracker.kf_dev = self.local_mapper._kf_dev
        self.camera = camera
        self.fps = fps
        self.sensor = sensor
        self.depth_map_factor = depth_map_factor
        # overlap the local-BA solve with subsequent tracking (the
        # reference's LocalMapping-thread concurrency, SURVEY 2.7)
        self.async_mapping = async_mapping
        # full worker-thread mapping (the reference's actual architecture):
        # the whole keyframe event overlaps tracking in wall-clock. Off by
        # default so tests stay deterministic; the benchmark enables it.
        self.threaded_mapping = threaded_mapping
        # pipelined tracking: dispatch frame i, retire its results
        # `depth` frames later (slam/tracking.py). Default: depth 2 with a
        # threaded mapper (the throughput configuration), 0 (sequential,
        # deterministic) otherwise.
        if pipeline_depth is None:
            pipeline_depth = 2 if threaded_mapping else 0
            env_d = os.environ.get("AF_PIPELINE_DEPTH")
            if env_d and threaded_mapping:
                pipeline_depth = int(env_d)
        self.tracker.pipeline_depth = int(pipeline_depth)
        self._worker = None
        if threaded_mapping:
            self._worker = _MappingWorker(self._mapping_event)
            # mapping is busy while the worker runs an event OR a deferred
            # BA fold is still outstanding (the reference's
            # AcceptKeyFrames gate covers both states the same way). An
            # idle()-only gate was tried (r5): with no wall-clock camera
            # pacing it floods keyframes during bootstrap (5 in 5 frames),
            # churns the map through cull/fuse cycles and collapses
            # tracking — the fold-landed condition is the throttle that
            # the reference gets from real-time pacing. The chunked async
            # BA (ops/ba.py) lands the fold in ~40-70 ms, so this gate no
            # longer starves keyframe cadence the way round 4's did.
            max_pending = int(os.environ.get("AF_MINT_AHEAD", "0"))
            self.tracker.mapping_idle = (
                lambda: self._worker.pending() <= max_pending
                and self.local_mapper.is_idle()
            )
            self.tracker.snapshot_safe = (
                lambda: not self.local_mapper.in_sparse_phase
            )
            self.tracker.map_fresh_check = (
                lambda: self.local_mapper.fresh_event
            )

            def _fresh_clear():
                self.local_mapper.fresh_event = False

            self.tracker.map_fresh_clear = _fresh_clear
            # a running worker event cannot be aborted mid-flight; the
            # keyframe simply lands when the worker goes idle (the
            # reference's interrupted BA achieves the same one-frame delay)
            self.tracker.interrupt_mapping = lambda: None
        self._reset_requested = False
        self._activate_localization_requested = False
        self._deactivate_localization_requested = False
        self._last_map_change_idx = 0
        self.match_th = match_th
        self.seed = seed
        self.frame_times: list[float] = []
        # per-stage profiling (reference SaveStatistics medians,
        # src/System.cc:556-563)
        self.mapping_times: list[float] = []
        self.loop_times: list[float] = []
        # place recognition: explicit vocabulary, else the shipped default
        # for this feature family (vocabularies/voc_<feature>_*.npz —
        # offline-trained, reference ships per-feature DBoW2 files the same
        # way), else trained lazily from the map as a last resort
        if vocabulary_path is None:
            vocabulary_path = _default_vocabulary(feature)
        self.vocabulary = vocabulary_path and self._load_vocab(vocabulary_path)
        self.database = None
        self.loop_closer = None
        self.loop_closing_enabled = enable_loop_closing
        if self.vocabulary is not None:
            self._enable_place_recognition()

    @staticmethod
    def _make_mesh(use_mesh):
        """Device mesh for the BA solves (local + global BA run
        observation-sharded when more than one device is attached;
        parallel/sharded_ba.py). "auto" = mesh iff multi-device."""
        if use_mesh is False:
            return None
        import jax

        n = len(jax.devices())
        if n < 2 and use_mesh == "auto":
            return None
        from anyfeature_vslam_tpu.parallel import sharded_ba

        return sharded_ba.make_mesh(n)

    def _load_vocab(self, path):
        from .place_recognition.vocab import Vocabulary

        return Vocabulary.load(path)

    def _enable_place_recognition(self):
        from .place_recognition.database import KeyFrameDatabase
        from .slam.loop_closing import LoopCloser

        self.database = KeyFrameDatabase(self.vocabulary, self.map.max_kf)
        self.tracker.database = self.database
        # culled keyframes leave the retrieval database (reference
        # KeyFrame::SetBadFlag -> KeyFrameDatabase::erase)
        self.map.on_kf_removed = self.database.erase
        for kf in self.map.keyframe_ids():
            self.database.add(
                int(kf), self.map.kf_desc_bits[kf], self.map.kf_feat_valid[kf]
            )
        if self.loop_closing_enabled:
            self.loop_closer = LoopCloser(
                self.map, self.camera, self.database,
                match_th=self.match_th, seed=self.seed, mesh=self.mesh,
                lock=self.map_lock,
            )
            # threaded mode: BoW folded one keyframe late so loop-stage
            # events never block on a device round trip
            self.loop_closer.deferred_bow = self._worker is not None
            if self.async_mapping:
                self.loop_closer.defer_ba_sink = self._register_deferred_fold

    def _register_deferred_fold(self, fold):
        """Park a deferred device-side solve (loop-closure GBA) in the local
        mapper's pending slot. In threaded mode a watcher thread lands it
        under the map lock as soon as the solve finishes (reference
        detached-GBA-thread semantics, src/LoopClosing.cc:589-593); in
        synchronous mode it lands deterministically at the next event's
        flush — a watcher landing it MID-FRAME would mutate poses under a
        tracker that does lock-free host reads between its stages."""
        self.local_mapper.fold_pending()
        self.local_mapper._pending_fold = fold
        if self._worker is not None:
            self.local_mapper.arm_fold_watcher()

    def _maybe_train_vocabulary(self):
        """Train a vocabulary from accumulated keyframe descriptors once
        enough data exists (the reference ships offline-trained DBoW2
        vocabularies per feature; ours are framework-native — see
        tools/create_vocabulary.py for the offline path)."""
        if self.vocabulary is not None or self.map.n_keyframes() < 4:
            return
        from .place_recognition.vocab import train_vocabulary

        descs = []
        for kf in self.map.keyframe_ids():
            v = self.map.kf_feat_valid[kf]
            descs.append(self.map.kf_desc_bits[kf][v])
        descs = np.concatenate(descs)
        if len(descs) < 2000:
            return
        self.vocabulary = train_vocabulary(descs, branching=32, depth=2, iters=5, seed=self.seed)
        self._enable_place_recognition()

    def _on_new_keyframe(self, kf):
        if self._worker is not None:
            # threaded mode: queue the whole event to the mapping worker
            # (reference LocalMapping::InsertKeyFrame, LocalMapping.cc:121)
            self._worker.submit(kf)
            return
        self._mapping_event(kf)

    def _mapping_event(self, kf):
        t0 = time.perf_counter()
        # the local-BA solve is dispatched at the end of the event but NOT
        # waited on — it executes on-device while the loop stage and
        # subsequent tracking run, and folds back at the next map mutation
        # (the TPU-native form of the reference's LocalMapping-thread
        # overlap, src/System.cc:112-127 + mbAbortBA). In threaded mode the
        # triangulation/fusion results are deferred the same way: a steady
        # worker event performs NO blocking device round trip at all.
        # tri/fuse results fold WITHIN the event (a single ~1-RTT batched
        # fetch on the worker thread — deferring them a whole event left
        # freshly triangulated points un-bundle-adjusted too long and
        # measurably degraded geometry); only the BA solve and the BoW
        # transform stay deferred, so the event still never blocks on a
        # long solve
        defer = self.async_mapping
        self.local_mapper.process_keyframe(
            kf, defer_ba=defer, overlap_results=self._worker is not None
        )
        if self._worker is not None:
            # the BA fold lands from a watcher thread the moment the solve
            # finishes (under the map lock) — the event neither blocks on
            # the solve nor leaves the results un-folded a whole keyframe
            # (which anchored keyframes to pre-fold trajectories and
            # measurably corrupted ATE). mapping_idle() reports busy until
            # the fold has actually landed, keeping the c1b gate honest.
            self.local_mapper.arm_fold_watcher()
        self.mapping_times.append(time.perf_counter() - t0)
        with self.map_lock:
            self._maybe_train_vocabulary()
        if self.loop_closer is not None:
            t1 = time.perf_counter()
            # detection runs LOCK-FREE (the database is worker-private and
            # map reads tolerate the usual staleness); the LoopCloser takes
            # the map lock itself only around the deferred-fold landing
            # and an actual correction (LoopClosing.cc:424-445)
            self.loop_closer.process_keyframe(
                kf, pre_mutate=self.local_mapper.flush_results
            )
            self.loop_times.append(time.perf_counter() - t1)
        elif self.database is not None:
            self.database.add(
                kf, self.map.kf_desc_bits[kf], self.map.kf_feat_valid[kf]
            )

    def track_monocular(
        self, img: np.ndarray, ts: float, image_path: str | None = None
    ) -> TrackState:
        if self.sensor != "monocular":
            raise RuntimeError("track_monocular called but sensor is " + self.sensor)
        return self._track(img, ts, image_path=image_path)

    def track_rgbd(self, img: np.ndarray, depth: np.ndarray, ts: float) -> TrackState:
        """Reference System::TrackRGBD (src/System.cc:192-241): depth map
        scaled by the depth factor, then the shared Track path."""
        if self.sensor != "rgbd":
            raise RuntimeError("track_rgbd called but sensor is " + self.sensor)
        if self.depth_map_factor != 1.0:
            depth = depth.astype(np.float32) * self.depth_map_factor
        return self._track(img, ts, depth=depth)

    def track_stereo(self, img_left: np.ndarray, img_right: np.ndarray, ts: float) -> TrackState:
        """Reference System::TrackStereo (src/System.cc:141-190)."""
        if self.sensor != "stereo":
            raise RuntimeError("track_stereo called but sensor is " + self.sensor)
        return self._track(img_left, ts, img_right=img_right)

    def _track(self, img, ts, image_path=None, depth=None, img_right=None) -> TrackState:
        # mode-change / reset checks before each frame (reference
        # System::TrackMonocular :253-285)
        if self._activate_localization_requested:
            self.tracker.only_tracking = True
            self._activate_localization_requested = False
        if self._deactivate_localization_requested:
            self.tracker.only_tracking = False
            self.tracker.mb_vo = False
            self._deactivate_localization_requested = False
        if self._reset_requested:
            self.reset()
            self._reset_requested = False
        # bootstrap barrier (threaded mode): while the map is young enough
        # that losing it triggers a full reset (reference Tracking.cc:355-363,
        # <=5 KFs), let mapping keep up with tracking — an unpaced frame
        # loop otherwise outruns the worker and collapses the early map.
        # The reference gets the same effect from real-time camera pacing.
        if self._worker is not None and self.map.n_keyframes() <= 5:
            self._worker.flush()
        t0 = time.perf_counter()
        state = self.tracker.process_frame(
            img, ts, image_path=image_path, depth=depth, img_right=img_right
        )
        self.frame_times.append(time.perf_counter() - t0)
        return state

    # ---------------------------------------------------------- accessors
    def get_tracking_state(self) -> TrackState:
        """Reference System::GetTrackingState (include/System.h:128)."""
        return self.tracker.state

    def get_tracked_map_points(self) -> np.ndarray:
        """Point ids matched in the current frame (reference
        System::GetTrackedMapPoints, include/System.h:129)."""
        f = self.tracker.last
        if f is None or f.matches is None:
            return np.zeros(0, np.int32)
        return f.matches[f.matches >= 0]

    def get_tracked_keypoints_un(self) -> np.ndarray:
        """Undistorted keypoints of the current frame (reference
        System::GetTrackedKeyPointsUn, include/System.h:130)."""
        f = self.tracker.last
        if f is None:
            return np.zeros((0, 2), np.float32)
        return f.feats["uv_und"][f.feats["valid"]]

    def map_changed(self) -> bool:
        """Reference System::MapChanged (include/System.h:94): true once per
        big map change (loop closure / global BA)."""
        idx = self.map.change_idx
        if idx > self._last_map_change_idx:
            self._last_map_change_idx = idx
            return True
        return False

    # -------------------------------------------------------- mode control
    def activate_localization_mode(self):
        """Stop mapping; track against the frozen map (reference
        System::ActivateLocalizationMode, include/System.h:88)."""
        self._activate_localization_requested = True

    def deactivate_localization_mode(self):
        self._deactivate_localization_requested = True

    def request_reset(self):
        self._reset_requested = True

    def reset(self):
        """Clear map, database and tracking state (reference System::Reset ->
        Tracking::Reset, src/Tracking.cc:1311-1356)."""
        self.tracker._inflight.clear()  # stale speculative frames: drop
        if self._worker is not None:
            self._worker.flush()
        with self.map_lock:
            self.local_mapper._pending_fold = None  # stale: drop, not fold
            self.tracker._reset()
        if self.database is not None:
            self.database = None
            self.loop_closer = None
            self.tracker.database = None
            if self.vocabulary is not None:
                self._enable_place_recognition()

    def shutdown(self):
        """Reference System::Shutdown (src/System.cc:332-351): the worker
        threads are synchronous here, so shutdown lands any deferred
        local-BA fold and blocks until device work is drained."""
        import jax

        self.tracker.flush_pipeline()
        if self._worker is not None:
            self._worker.stop()
            self._worker = None
        with self.map_lock:
            self.local_mapper.flush_results()
            if self.loop_closer is not None:
                self.loop_closer.flush_bow()
        (jax.device_put(0.0) + 0).block_until_ready()

    # ------------------------------------------------------------- output
    def save_outputs(self, out_dir: str, exp_id: str = "exp"):
        self.tracker.flush_pipeline()
        if self._worker is not None:
            self._worker.flush()
        with self.map_lock:
            self.local_mapper.flush_results()
            if self.loop_closer is not None:
                self.loop_closer.flush_bow()
        os.makedirs(out_dir, exist_ok=True)
        kf_csv = os.path.join(out_dir, f"{exp_id}_KeyFrameTrajectory.csv")
        trajectory.save_keyframe_trajectory_vslamlab(kf_csv, self.map)
        tum_txt = os.path.join(out_dir, f"{exp_id}_FrameTrajectory_TUM.txt")
        trajectory.save_frame_trajectory_tum(tum_txt, self.tracker.trajectory, self.map)
        kitti_txt = os.path.join(out_dir, f"{exp_id}_FrameTrajectory_KITTI.txt")
        trajectory.save_frame_trajectory_kitti(kitti_txt, self.tracker.trajectory, self.map)
        stats = dict(self.tracker.stats)
        stats["loopClosures"] = self.loop_closer.n_loops_closed if self.loop_closer else 0
        if self.frame_times:
            stats["medianTrackingTime_s"] = round(float(np.median(self.frame_times)), 4)
            stats["meanTrackingTime_s"] = round(float(np.mean(self.frame_times)), 4)
        if self.mapping_times:
            stats["medianLocalMappingTime_s"] = round(float(np.median(self.mapping_times)), 4)
        if self.loop_times:
            stats["medianLoopClosingTime_s"] = round(float(np.median(self.loop_times)), 4)
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith(("VmPeak", "VmRSS")):
                        k, v = line.split(":", 1)
                        stats[k] = v.strip()
        except OSError:
            pass
        trajectory.save_statistics_yaml(
            os.path.join(out_dir, f"{exp_id}_statistics.yaml"), self.map, stats
        )
        from .io import viewer

        viewer.render_map_svg(
            self.map,
            os.path.join(out_dir, f"{exp_id}_map.svg"),
            trajectory=viewer.trajectory_centers(self.tracker.trajectory, self.map),
        )
        return kf_csv

    def render_frame(self, img: np.ndarray, path: str | None = None):
        """Overlay of the most recent frame's keypoints/tracks (reference
        FrameDrawer::DrawFrame); returns an RGB array, optionally saves PNG."""
        from .io import viewer

        f = self.tracker.last
        if f is None:
            return None
        return viewer.render_frame_overlay(
            img, f.feats, f.matches, state_text=self.tracker.state.name, path=path
        )

    def save_checkpoint(self, path: str):
        """Persist the full map state (see SlamMap.save)."""
        self.tracker.flush_pipeline()
        if self._worker is not None:
            self._worker.flush()
        with self.map_lock:
            self.local_mapper.flush_results()
            if self.loop_closer is not None:
                self.loop_closer.flush_bow()
        self.map.save(path)

    def load_checkpoint(self, path: str):
        """Restore map state in place; tracking resumes via relocalization."""
        from .slam.map_state import SlamMap

        loaded = SlamMap.load(path)
        self.map.__dict__.update(loaded.__dict__)
        if self.database is not None:
            for kf in self.map.keyframe_ids():
                self.database.add(
                    int(kf), self.map.kf_desc_bits[kf], self.map.kf_feat_valid[kf]
                )


def run_sequence(
    sequence_path: str,
    feature: str = "orb32",
    out_dir: str | None = None,
    exp_id: str = "exp",
    max_frames: int | None = None,
    verbose: bool = True,
    calibration_yaml: str | None = None,
    rgb_csv: str | None = None,
    feature_yaml: str | None = None,
    vocabulary_folder: str | None = None,
    sensor: str = "monocular",
    bf: float = 0.0,
    n_features: int | None = None,
    pace: bool = False,
    threaded_mapping: bool = False,
):
    """End-to-end: load sequence, run SLAM, save trajectory. Returns System.

    pace=True replays in real time: the loop sleeps to match inter-frame
    timestamps like the reference main loop (reference
    src/vslamlab_anyfeature_mono.cpp:161-169); frames are never dropped,
    only delayed (the reference blocks identically).

    The optional overrides mirror the reference CLI
    (src/vslamlab_anyfeature_mono.cpp:47-109): external calibration/rgb
    listings, a per-feature settings YAML, and a vocabulary folder holding
    DBoW2 text or framework .npz vocabularies. sensor="rgbd" consumes a TUM
    RGB-D layout (rgb.txt + depth.txt) through System::track_rgbd."""
    from . import native

    if sensor == "rgbd":
        seq = dataset.load_sequence_rgbd(
            sequence_path, calibration_yaml=calibration_yaml
        )
    else:
        seq = dataset.load_sequence(
            sequence_path, calibration_yaml=calibration_yaml, rgb_csv=rgb_csv
        )
    feature_settings = (
        dataset.load_feature_settings(feature_yaml) if feature_yaml else None
    )
    vocabulary_path = (
        dataset.find_vocabulary(vocabulary_folder, feature)
        if vocabulary_folder else None
    )
    system = System(
        seq.camera, feature=feature, fps=seq.fps,
        feature_settings=feature_settings, vocabulary_path=vocabulary_path,
        sensor=sensor, bf=bf, n_features=n_features,
        threaded_mapping=threaded_mapping,
    )
    n = len(seq.image_paths) if max_frames is None else min(max_frames, len(seq.image_paths))
    loader = native.FrameLoader(
        seq.image_paths[:n], seq.camera.height, seq.camera.width
    )
    t_start = time.perf_counter()

    def _prefetch(i):
        """Start the host->device upload of frame i's image now; the
        transfer overlaps the current frame's compute (mono live-extractor
        path only — the tracker accepts on-device uint8 images)."""
        import jax

        img = loader.get(i)
        img8 = img if img.dtype == np.uint8 else np.clip(
            img, 0, 255
        ).astype(np.uint8)
        return jax.device_put(img8)

    prefetch_ok = sensor == "monocular" and system.tracker.cfg.detector != "precomputed"
    nxt = None
    for i in range(n):
        if pace and i > 0:
            # sleep until this frame's timestamp offset from the first
            target = seq.timestamps[i] - seq.timestamps[0]
            lag = target - (time.perf_counter() - t_start)
            if lag > 0:
                time.sleep(lag)
        if sensor == "rgbd":
            img = loader.get(i)
            depth = dataset.load_depth(seq.depth_paths[i], seq.depth_factor)
            state = system.track_rgbd(img, depth, seq.timestamps[i])
        else:
            img = nxt if (prefetch_ok and nxt is not None) else loader.get(i)
            if prefetch_ok and i + 1 < n:
                nxt = _prefetch(i + 1)
            state = system.track_monocular(
                img, seq.timestamps[i], image_path=seq.image_paths[i]
            )
        if verbose:
            print(
                f"frame {i}/{n} state={state.name} kfs={system.map.n_keyframes()} "
                f"pts={system.map.n_points()} inliers={system.tracker.n_inliers}",
                flush=True,
            )
    loader.close()
    if out_dir is not None:
        system.save_outputs(out_dir, exp_id)
    return system
