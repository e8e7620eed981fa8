"""Benchmark: END-TO-END System frames/s on real TPU (the honest number).

Primary metric (the one JSON line): `system_fps_per_chip` — frames/s of
`run_sequence` over a 300-frame rendered 640x480 sequence, INCLUDING
feature extraction, matching, pose optimization, keyframe insertion,
local mapping (triangulation + fusion + local BA) and loop-closing
detection. This measures what a user gets, host orchestration and all —
round 1's kernel-scan number (still reported on stderr as
`tracking_scan_fps`) measured only the fused on-device tracking path.

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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TOY = "/root/reference/docs/toy_sequence"
BASELINE_FPS = 30.0  # real-time camera rate the reference paces against
BENCH_SEQ = "/tmp/anyfeature_bench_seq_300"
N_BENCH_FRAMES = 300


def _ensure_bench_sequence():
    """Render (once, cached) the 300-frame 640x480 benchmark sequence."""
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


def bench_system():
    """End-to-end System throughput: frames/s of run_sequence including
    mapping, with a host/device split on stderr."""
    import numpy as np

    from anyfeature_vslam_tpu.system import run_sequence

    seq = _ensure_bench_sequence()
    import time as _t

    t0 = _t.perf_counter()
    system = run_sequence(seq, feature="orb32", out_dir=None, verbose=False,
                          n_features=1000)
    wall = _t.perf_counter() - t0
    n = len(system.frame_times)
    # steady-state fps: drop the first 10 frames (jit compiles)
    steady = np.asarray(system.frame_times[10:])
    fps = 1.0 / float(np.median(steady))
    med_track = float(np.median(steady)) * 1e3
    med_map = (
        float(np.median(np.asarray(system.mapping_times))) * 1e3
        if system.mapping_times else 0.0
    )
    print(
        f"[bench] system: {n} frames in {wall:.1f}s wall; median frame "
        f"{med_track:.1f} ms (incl. inline mapping dispatch), median "
        f"mapping-stage {med_map:.1f} ms/KF, {system.map.n_keyframes()} KFs "
        f"{system.map.n_points()} pts, tracked "
        f"{system.tracker.stats['tracked_frames']}",
        file=sys.stderr, flush=True,
    )
    return fps


def main():
    from functools import partial

    import numpy as np
    import jax

    # persistent compilation cache: the system bench compiles ~20 programs
    # (extraction, matchers, BA buckets); repeat runs skip all of it
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from anyfeature_vslam_tpu.flagship import tracking_step, make_example  # noqa: F401
    from anyfeature_vslam_tpu.frontend.extractor import ExtractorConfig
    from anyfeature_vslam_tpu.io import dataset

    # real images when available, synthetic otherwise
    try:
        seq = dataset.load_sequence(TOY)
        imgs = [dataset.load_gray(p) for p in seq.image_paths]
    except Exception:
        rng = np.random.default_rng(0)
        imgs = [rng.uniform(0, 255, (480, 640)).astype(np.float32) for _ in range(5)]

    height, width = imgs[0].shape
    cfg = ExtractorConfig(n_features=1000)
    example = make_example(height, width)
    args_rest = example[1:]

    # sequential tracking over a stacked batch inside ONE program: a single
    # dispatch per round keeps the (environment-dependent) host<->device
    # round-trip latency out of the per-frame number, measuring sustained
    # on-device tracking throughput
    from anyfeature_vslam_tpu.flagship import tracking_scan

    n_frames = 64
    batch = np.stack([imgs[k % len(imgs)] for k in range(n_frames)])
    fn = partial(tracking_scan, cfg=cfg, height=height, width=width)

    # Stage the frames in HBM once: the metric is sustained on-chip tracking
    # throughput; in this environment the TPU is behind a network tunnel and
    # a per-round 78 MB host->device copy would measure the tunnel instead.
    import jax.numpy as jnp

    batch = jax.device_put(jnp.asarray(batch))
    args_rest = jax.device_put(tuple(jnp.asarray(a) for a in args_rest))

    # warmup / compile
    out = fn(batch, *args_rest)
    jax.block_until_ready(out)

    n_rounds = 3
    times = []
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        poses, n_in = fn(batch, *args_rest)
        np.asarray(poses)  # force full execution + readback
        times.append((time.perf_counter() - t0) / n_frames)
    per_frame = min(times)
    kernel_fps = 1.0 / per_frame
    print(
        f"[bench] tracking_scan_fps (fused on-device tracking kernel, no "
        f"mapping/host): {kernel_fps:.1f} frames/s",
        file=sys.stderr, flush=True,
    )

    system_fps = bench_system()
    print(
        json.dumps(
            {
                "metric": "system_fps_per_chip",
                "value": round(system_fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(system_fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
