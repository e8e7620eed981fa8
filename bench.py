"""Benchmark: END-TO-END System frames/s on real TPU (the honest number).

Primary metric (the one JSON line on stdout): `system_fps_per_chip` —
steady-state frames/s of the full System loop over a rendered 640x480
sequence, INCLUDING feature extraction, matching, pose optimization,
keyframe insertion, local mapping (triangulation + fusion + async local BA)
and loop-closing detection. This measures what a user gets, host
orchestration and all.

Round-3 changes vs the round-2 bench that timed out before emitting its
metric (BENCH_r02.json rc=124):
  - internal wall-clock budget: the frame loop stops at the deadline and
    the JSON line is emitted from however many frames completed;
  - any exception after >=1 tracked frame still emits the JSON line;
  - steady-state median excludes the first 10 (compile-heavy) frames;
  - the per-frame path is the fused single-dispatch tracker
    (slam/fast_track.py) and mapping uses coarse compile-shape buckets,
    so the mid-run compile storm of round 2 is gone;
  - the secondary kernel-only number (tracking_scan_fps) runs AFTER the
    JSON emission, only if budget remains, and prints on stderr.

Baseline: the reference paces sequences in real time at the camera rate
(30 fps, reference src/vslamlab_anyfeature_mono.cpp:161-169 and
docs/toy_sequence/calibration.yaml:18-19) on a host CPU; it publishes no
faster number (BASELINE.md). vs_baseline = fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Pin string-hash randomization BEFORE jax imports: the persistent
# compilation cache key turns out to depend on it (measured: the same
# program compiles to a differently-hashed cache entry per process unless
# PYTHONHASHSEED is fixed, so every fresh bench process paid 3-12 s
# mid-run XLA recompiles of the Pallas-bearing programs). Re-exec once
# with the seed pinned; afterwards every shape ever compiled on this
# machine is a ~0.7 s cache load instead.
if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 30.0  # real-time camera rate the reference paces against
BENCH_SEQ = "/tmp/anyfeature_bench_seq_150"
N_BENCH_FRAMES = 150
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "400"))
T_START = time.perf_counter()


def _left():
    return BUDGET_S - (time.perf_counter() - T_START)


def _emit(fps):
    print(
        json.dumps(
            {
                "metric": "system_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        ),
        flush=True,
    )


def _ensure_bench_sequence():
    """Render (once, cached) the benchmark sequence."""
    import subprocess

    marker = os.path.join(BENCH_SEQ, "rgb.csv")
    if not os.path.exists(marker):
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "make_synth_sequence.py"),
             f"out_dir:{BENCH_SEQ}", f"n_frames:{N_BENCH_FRAMES}",
             "width:640", "height:480", "revisit:0.2", "seed:3"],
            check=True, capture_output=True, timeout=1200,
        )
    return BENCH_SEQ


def _warm_rare_paths(system, seq):
    """Exercise the rare code paths (relocalization, loop-closing Sim3,
    essential graph) once on the warm system so their XLA programs are in
    the process jit cache: the FIRST relocalization of a process otherwise
    compiles its batched matcher + RANSAC-EPnP mid-run (measured ~20 s),
    and the first loop closure compiles the Sim3/pose-graph solvers."""
    import numpy as np
    from anyfeature_vslam_tpu.io import dataset
    from anyfeature_vslam_tpu.slam.tracking import TrackState

    tr = system.tracker
    tr.flush_pipeline()
    if system._worker is not None:
        system._worker.flush()
    # relocalization on a real frame against the warm map
    if system.map.n_keyframes() >= 2 and system.database is not None:
        img = dataset.load_gray(seq.image_paths[-1])
        img8 = np.clip(img, 0, 255).astype(np.uint8)
        tr.state = TrackState.LOST
        system.track_monocular(img8, seq.timestamps[-1] + 1.0)
    # loop-closing Sim3 chain between two covisible keyframes (RANSAC +
    # SearchBySim3 + LM + projection gate — no correction applied)
    lc = system.loop_closer
    kfs = [int(k) for k in system.map.keyframe_ids()]
    if lc is not None and len(kfs) >= 2:
        lc._compute_sim3(kfs[-1], kfs[-2])
        lc._pending_merge = None
        lc._loop_points = None
    # essential-graph program at its bucketed shapes
    import jax
    import jax.numpy as jnp
    from anyfeature_vslam_tpu.ops import pose_graph

    k_cap = system.map.max_kf
    r_all = np.tile(np.eye(3, dtype=np.float32), (k_cap, 1, 1))
    t_all = np.zeros((k_cap, 3), np.float32)
    s_all = np.ones(k_cap, np.float32)
    valid = np.zeros(k_cap, bool)
    valid[:3] = True
    fixed = np.zeros(k_cap, bool)
    fixed[0] = True
    e_cap = 64
    out = pose_graph.optimize_pose_graph(
        jnp.asarray(r_all), jnp.asarray(t_all), jnp.asarray(s_all),
        jnp.asarray(valid), jnp.asarray(fixed),
        jnp.asarray(np.zeros(e_cap, np.int32)),
        jnp.asarray(np.zeros(e_cap, np.int32)),
        jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (e_cap, 1, 1))),
        jnp.asarray(np.zeros((e_cap, 3), np.float32)),
        jnp.asarray(np.ones(e_cap, np.float32)),
        jnp.asarray(np.zeros(e_cap, np.float32)),
        jnp.asarray(np.zeros(e_cap, bool)),
    )
    jax.block_until_ready(out)
    print("[bench] rare paths warmed (reloc + sim3 + pose graph)",
          file=sys.stderr, flush=True)


def bench_system(measure: bool = True, n_frames: int | None = None):
    """End-to-end System throughput with an internal deadline. Returns
    (fps, n_frames_done).

    measure=False runs a WARM pass: the same loop on a throwaway System,
    so every XLA program the steady state needs is traced + loaded into
    the process-wide jit cache before the measured pass (a program first
    reached mid-run costs a ~0.5-1 s GIL-held stall even with the
    persistent cache; serving systems warm up the same way)."""
    import numpy as np

    from anyfeature_vslam_tpu import native, perfcount
    from anyfeature_vslam_tpu.io import dataset
    from anyfeature_vslam_tpu.system import System

    seq = dataset.load_sequence(_ensure_bench_sequence())
    system = System(seq.camera, feature="orb32", fps=seq.fps, n_features=1000,
                    threaded_mapping=True)
    n = min(N_BENCH_FRAMES, len(seq.image_paths))
    if n_frames is not None:
        n = min(n, n_frames)
    loader = native.FrameLoader(
        seq.image_paths[:n], seq.camera.height, seq.camera.width
    )
    import jax

    def _prefetch(i):
        img = loader.get(i)
        img8 = img if img.dtype == np.uint8 else np.clip(
            img, 0, 255
        ).astype(np.uint8)
        return jax.device_put(img8)

    WARMUP = 15  # excludes compiles + pipeline ramp-up from the metric
    done = 0
    nxt = None
    pc_mark = None
    t_warm = t_end = None
    trace = os.environ.get("AF_TRACE") and measure
    if trace:
        perfcount.trace_enabled = True
        perfcount.clear_events()
    frame_marks = []  # (t_abs_start, dur) per frame
    try:
        for i in range(n):
            if _left() < 15.0:
                print(f"[bench] internal deadline at frame {i}",
                      file=sys.stderr, flush=True)
                break
            img = nxt if nxt is not None else _prefetch(i)
            if i + 1 < n:
                nxt = _prefetch(i + 1)
            t_f0 = time.perf_counter()
            system.track_monocular(img, seq.timestamps[i],
                                   image_path=seq.image_paths[i])
            if trace:
                frame_marks.append((t_f0, time.perf_counter() - t_f0))
            done += 1
            if done == WARMUP:
                pc_mark = perfcount.snapshot()
                t_warm = time.perf_counter()
            t_end = time.perf_counter()
        # honesty: the throughput window ends only after every in-flight
        # pipelined frame has retired AND every queued mapping event and
        # deferred fold has LANDED — the pipeline may not hide work beyond
        # the last tracked frame
        system.tracker.flush_pipeline()
        if system._worker is not None:
            system._worker.flush()
        with system.map_lock:
            system.local_mapper.flush_results()
        t_end = time.perf_counter()
    except Exception as e:  # noqa: BLE001 — partial result still emits
        print(f"[bench] exception at frame {done}: {e!r}",
              file=sys.stderr, flush=True)
    finally:
        loader.close()
    if not measure:
        try:
            _warm_rare_paths(system, seq)
        except Exception as e:  # noqa: BLE001
            print(f"[bench] rare-path warm failed: {e!r}", file=sys.stderr,
                  flush=True)
        try:
            system.shutdown()
        except Exception:  # noqa: BLE001
            pass
        print(f"[bench] warm pass done: {done} frames, "
              f"{system.map.n_keyframes()} KFs", file=sys.stderr, flush=True)
        return 0.0, done, 0, 0.0
    ft = np.asarray(system.frame_times, np.float64)
    if len(ft) == 0:
        return 0.0, 0, 0, 0.0
    steady = ft[WARMUP:] if len(ft) > 2 * WARMUP else ft
    med = float(np.median(steady))
    # honest fps = steady-state THROUGHPUT (frames / wall-clock), not
    # 1/median: the pipelined tracker makes per-frame wall times bimodal
    # (most frames are a cheap dispatch+retire; keyframe-event frames pay
    # the sync cost), and a median would overstate what a user gets
    window = 0.0
    if t_warm is not None and done > WARMUP and t_end > t_warm:
        window = t_end - t_warm
        fps = (done - WARMUP) / window
    else:
        fps = 1.0 / med if med > 0 else 0.0
    med_map = (
        float(np.median(np.asarray(system.mapping_times))) * 1e3
        if system.mapping_times else 0.0
    )
    med_loop = (
        float(np.median(np.asarray(system.loop_times))) * 1e3
        if system.loop_times else 0.0
    )
    print(
        f"[bench] system: {done} frames; median frame {med * 1e3:.1f} ms "
        f"steady-state (mean {float(np.mean(steady)) * 1e3:.1f}, p90 "
        f"{float(np.percentile(steady, 90)) * 1e3:.1f}); median "
        f"mapping-stage {med_map:.1f} ms/KF, median "
        f"loop-stage {med_loop:.1f} ms/KF; {system.map.n_keyframes()} KFs "
        f"{system.map.n_points()} pts, tracked "
        f"{system.tracker.stats['tracked_frames']}, loops "
        f"{system.loop_closer.n_loops_closed if system.loop_closer else 0}; "
        f"lost {system.tracker.stats['lost_frames']}, reloc "
        f"{system.tracker.stats['relocalizations']}, resets "
        f"{system.tracker.stats['resets']}",
        file=sys.stderr, flush=True,
    )
    # dispatch/readback accounting over the steady window (the reference's
    # per-stage medians analogue, src/System.cc:556-563; on a tunneled
    # backend blocking fetches ARE the cost model)
    if pc_mark is not None and done > WARMUP:
        pc = perfcount.snapshot()
        nf = done - WARMUP
        d = {k: pc.get(k, 0.0) - pc_mark.get(k, 0.0) for k in pc}
        print(
            "[bench] accounting (per steady frame): "
            f"{d.get('track_dispatches', 0) / nf:.2f} fused dispatches, "
            f"{d.get('host_fetches', 0) / nf:.2f} blocking fetches, "
            f"{d.get('host_fetch_s', 0.0) / nf * 1e3:.1f} ms blocked in "
            "fetches (all threads); "
            f"dispatch {d.get('t_dispatch_s', 0.0) / nf * 1e3:.1f} ms "
            f"(fs rebuild {d.get('t_fs_rebuild_s', 0.0) / nf * 1e3:.1f} over "
            f"{d.get('fs_rebuilds', 0):.0f}), "
            f"retire {d.get('t_retire_s', 0.0) / nf * 1e3:.1f} ms "
            f"(wait {d.get('t_retire_wait_s', 0.0) / nf * 1e3:.1f}) per "
            f"frame; fast fails: {d.get('fast_fail_stage1', 0):.0f} stage1, "
            f"{d.get('fast_fail_inliers', 0):.0f} inliers; staged "
            f"{d.get('staged_frames', 0):.0f}/"
            f"{d.get('t_staged_s', 0.0):.1f}s, reloc "
            f"{d.get('t_reloc_s', 0.0):.1f}s; points "
            f"+{d.get('tri_points_added', 0):.0f} tri, "
            f"-{d.get('recent_points_culled', 0):.0f} culled, "
            f"-{d.get('fuse_points_merged', 0):.0f} merged",
            file=sys.stderr, flush=True,
        )
        # roll-up: the tracking-thread phase counters must explain the
        # steady window's MEAN frame time (VERDICT r4 item 2 — the
        # instrument built to explain the number must account for it)
        acct = sum(
            d.get(k, 0.0) for k in
            ("t_dispatch_s", "t_retire_s", "t_staged_s", "t_reloc_s")
        )
        tot = float(np.sum(steady))
        print(
            f"[bench] accounted {acct:.1f}s of {tot:.1f}s steady-window "
            f"tracking time ({100.0 * acct / max(tot, 1e-9):.0f}%): "
            f"dispatch {d.get('t_dispatch_s', 0.0):.1f} + retire "
            f"{d.get('t_retire_s', 0.0):.1f} + staged "
            f"{d.get('t_staged_s', 0.0):.1f} + reloc "
            f"{d.get('t_reloc_s', 0.0):.1f}",
            file=sys.stderr, flush=True,
        )
    if trace:
        tp = os.environ.get("AF_TRACE")
        path = tp if tp not in ("1", "true") else "/tmp/af_trace.json"
        # append per-pass: [{"frames": [...], "events": [...]}, ...]
        runs = []
        if os.path.exists(path):
            try:
                with open(path) as f:
                    runs = json.load(f)
            except Exception:  # noqa: BLE001
                runs = []
        runs.append({
            "frames": [(round(t, 4), round(dur, 5)) for t, dur in frame_marks],
            "events": [
                (round(t, 4), name, kw) for t, name, kw in perfcount.events()
            ],
        })
        with open(path, "w") as f:
            json.dump(runs, f)
        print(f"[bench] trace written: {path}", file=sys.stderr, flush=True)
        perfcount.trace_enabled = False
    stages = getattr(system.local_mapper, "stage_times", None)
    if stages:
        parts = ", ".join(
            f"{k} {np.median(v) * 1e3:.0f}" for k, v in stages.items() if v
        )
        print(f"[bench] mapping-stage medians ms/KF: {parts}",
              file=sys.stderr, flush=True)
    try:
        system.shutdown()  # quiesce watcher threads before interpreter exit
    except Exception:  # noqa: BLE001
        pass
    return fps, done, max(done - WARMUP, 0), window


def bench_tracking_scan():
    """Secondary stderr metric: sustained fused on-device tracking kernel
    throughput (no mapping/host) — round 1's headline number."""
    from functools import partial

    import numpy as np
    import jax
    import jax.numpy as jnp

    from anyfeature_vslam_tpu.flagship import tracking_scan, make_example
    from anyfeature_vslam_tpu.frontend.extractor import ExtractorConfig
    from anyfeature_vslam_tpu.io import dataset

    toy = "/root/reference/docs/toy_sequence"
    try:
        seq = dataset.load_sequence(toy)
        imgs = [dataset.load_gray(p) for p in seq.image_paths]
    except Exception:
        rng = np.random.default_rng(0)
        imgs = [rng.uniform(0, 255, (480, 640)).astype(np.float32)
                for _ in range(5)]
    height, width = imgs[0].shape
    cfg = ExtractorConfig(n_features=1000)
    example = make_example(height, width)
    args_rest = example[1:]
    n_frames = 64
    batch = np.stack([imgs[k % len(imgs)] for k in range(n_frames)])
    fn = partial(tracking_scan, cfg=cfg, height=height, width=width)
    batch = jax.device_put(jnp.asarray(batch))
    args_rest = jax.device_put(tuple(jnp.asarray(a) for a in args_rest))
    out = fn(batch, *args_rest)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        poses, n_in = fn(batch, *args_rest)
        np.asarray(poses)
        times.append((time.perf_counter() - t0) / n_frames)
    kernel_fps = 1.0 / min(times)
    print(
        f"[bench] tracking_scan_fps (fused on-device tracking kernel, no "
        f"mapping/host): {kernel_fps:.1f} frames/s",
        file=sys.stderr, flush=True,
    )


def bench_loop():
    """Secondary mode (`python bench.py loop`): throughput of a run in
    which a Sim3 loop closure actually FIRES, so the loop-stage cost
    includes detection + Sim3 RANSAC/LM + SearchAndFuse + essential graph
    + the GBA fold at least once (VERDICT r4 item 6). Scenario = the
    proven two-session merge (tests/test_loop_live.py): session A maps
    circle A and checkpoints; session B loads it, boots a fresh component
    in circle B at arbitrary monocular scale, then re-enters A — only the
    free-scale Sim3 closure chain can merge the components.

    Prints ONE JSON line {"metric": "loop_bench_fps", ..., "loops": L}.
    """
    import subprocess

    import numpy as np

    from anyfeature_vslam_tpu import native
    from anyfeature_vslam_tpu.io import dataset
    from anyfeature_vslam_tpu.system import System

    n = 360
    seq_dir = "/tmp/anyfeature_loop_seq_360"
    if not os.path.exists(os.path.join(seq_dir, "rgb.csv")):
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "make_synth_sequence.py"),
             f"out_dir:{seq_dir}", f"n_frames:{n}", "width:320",
             "height:240", "trajectory:two_circles_revisit", "seed:3",
             "texture:distinct"],
            check=True, capture_output=True, timeout=1200,
        )
    import jax

    seq = dataset.load_sequence(seq_dir)
    na = int(round(0.30 * n))
    nt1 = int(round(0.07 * n))
    loader = native.FrameLoader(
        seq.image_paths, seq.camera.height, seq.camera.width
    )
    sys_a = System(seq.camera, feature="orb32", fps=seq.fps, n_features=600)
    for i in range(na):
        sys_a.track_monocular(loader.get(i), seq.timestamps[i],
                              image_path=seq.image_paths[i])
    ckpt = "/tmp/anyfeature_loop_ckpt.npz"
    sys_a.save_checkpoint(ckpt)
    sys_a.shutdown()

    # synchronous mapping: the merge scenario boots a FRESH monocular
    # component inside a mature loaded map — the proven configuration
    # (tests/test_loop_live.py); the throughput configuration is measured
    # by the primary bench
    sys_b = System(seq.camera, feature="orb32", fps=seq.fps, n_features=600)
    sys_b.load_checkpoint(ckpt)
    start = na + nt1
    t0 = time.perf_counter()
    for i in range(start, n):
        sys_b.track_monocular(
            jax.device_put(loader.get(i)), seq.timestamps[i] + 100.0,
            image_path=seq.image_paths[i],
        )
    sys_b.tracker.flush_pipeline()
    if sys_b._worker is not None:
        sys_b._worker.flush()
    wall = time.perf_counter() - t0
    loader.close()
    loops = sys_b.loop_closer.n_loops_closed if sys_b.loop_closer else 0
    fps = (n - start) / wall
    print(
        f"[bench] loop mode: {n - start} frames in {wall:.1f}s, "
        f"{sys_b.map.n_keyframes()} KFs {sys_b.map.n_points()} pts, "
        f"loops {loops}, stats {sys_b.tracker.stats}",
        file=sys.stderr, flush=True,
    )
    print(
        json.dumps({
            "metric": "loop_bench_fps", "value": round(fps, 2),
            "unit": "frames/s", "vs_baseline": round(fps / BASELINE_FPS, 3),
            "loops": int(loops),
        }),
        flush=True,
    )
    try:
        sys_b.shutdown()
    except Exception:  # noqa: BLE001
        pass


def main():
    import jax

    # persistent compilation cache: repeat runs skip every compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if "loop" in sys.argv[1:]:
        bench_loop()
        return

    fps = 0.0
    try:
        if _left() > 240.0:
            bench_system(measure=False)  # warm pass: fill the jit cache
        # two measured passes, combined as total frames / total wall time:
        # thread-timing luck (keyframe cadence vs mapping bursts on the
        # shared chip) gives single passes a wide spread; two independent
        # systems halve it honestly
        fps, _, n1, w1 = bench_system()
        n2 = w2 = 0
        if _left() > 60.0:
            fps2, _, n2, w2 = bench_system()
            if n1 + n2 > 0 and w1 + w2 > 0:
                fps = (n1 + n2) / (w1 + w2)
                print(f"[bench] combined over 2 passes: {fps:.2f} fps "
                      f"({n1}f/{w1:.1f}s + {n2}f/{w2:.1f}s)",
                      file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[bench] system bench failed: {e!r}", file=sys.stderr,
              flush=True)
    _emit(fps)
    if _left() > 120.0:
        try:
            bench_tracking_scan()
        except Exception as e:  # noqa: BLE001
            print(f"[bench] tracking_scan failed: {e!r}", file=sys.stderr,
                  flush=True)


if __name__ == "__main__":
    main()
