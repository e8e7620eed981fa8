"""A Sim3 loop closure firing LIVE from raw frames (VERDICT r3 item 3).

The scenario is a two-session merge, the one situation where the closure
pathway is the ONLY way the map can become consistent:

  - session A maps circle A and saves a checkpoint;
  - session B loads that checkpoint, then initializes a FRESH map
    component in disjoint territory (circle B) — its monocular scale is
    arbitrary, so the loaded component and the new one are off by a
    large relative scale;
  - session B's trajectory then enters circle A's territory. Tracking
    never fails (so relocalization — which would re-attach the map the
    cheap way, exactly as the reference would — never preempts), guided
    matching cannot reconnect across the scale gap, and the only bridge
    is the live chain: BoW candidate retrieval -> covisibility
    consistency (3 consecutive keyframes) -> Sim3 RANSAC + LM with FREE
    scale -> SearchAndFuse -> essential-graph optimization -> global BA
    (reference src/LoopClosing.cc:64-599).

Within-session forced-drift variants were tried first and documented in
RESULTS.md: with an honest (place-distinctive) texture the tracker's
drift stays so low that revisits reconnect through the local map, and
when drift IS forced via image noise the tracker loses the frame first
and relocalization wins the race — behavior the reference shares.

This scenario also flushed out two real multi-session bugs (both fixed):
initialization's scale normalization rescaled ALL map points (destroying
a loaded component's geometry), and the keyframe decision's min_obs=3
reference count starved a fresh component booted inside a mature map.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 360


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("liveloop") / "seq")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synth_sequence.py"),
         f"out_dir:{d}", f"n_frames:{N}", "width:320", "height:240",
         "trajectory:two_circles_revisit", "seed:3", "texture:distinct"],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr
    return d


@pytest.mark.slow
def test_live_sim3_loop_closure_merges_sessions(seq_dir, tmp_path):
    from anyfeature_vslam_tpu import native
    from anyfeature_vslam_tpu.io import dataset, evaluation
    from anyfeature_vslam_tpu.system import System

    seq = dataset.load_sequence(seq_dir)
    na = int(round(0.30 * N))       # circle-A lap (matches the renderer)
    nt1 = int(round(0.07 * N))
    loader = native.FrameLoader(
        seq.image_paths, seq.camera.height, seq.camera.width
    )

    # ---- session A: map circle A, checkpoint
    sys_a = System(seq.camera, feature="orb32", fps=seq.fps, n_features=600)
    for i in range(na):
        sys_a.track_monocular(loader.get(i), seq.timestamps[i],
                              image_path=seq.image_paths[i])
    assert sys_a.tracker.stats["resets"] == 0
    ckpt = str(tmp_path / "a.npz")
    sys_a.save_checkpoint(ckpt)

    # ---- session B: fresh component in circle B, then into A
    sys_b = System(seq.camera, feature="orb32", fps=seq.fps, n_features=600)
    sys_b.load_checkpoint(ckpt)
    n_loaded = sys_b.map.n_keyframes()
    assert n_loaded >= 10
    start = na + nt1
    for i in range(start, N):
        sys_b.track_monocular(loader.get(i), seq.timestamps[i] + 100.0,
                              image_path=seq.image_paths[i])
    loader.close()

    st = sys_b.tracker.stats
    assert st["resets"] == 0, st
    # tracking survived the whole run: the closure was NOT a
    # relocalization re-attachment
    assert st["lost_frames"] <= 5, st
    # THE assertion: at least one live Sim3 loop closure fired
    assert sys_b.loop_closer.n_loops_closed >= 1
    assert len(sys_b.map.loop_edges) >= 1

    # merged map is globally consistent: keyframes of BOTH sessions align
    # to ground truth under ONE Sim3
    out = str(tmp_path / "out")
    sys_b.save_outputs(out, "m")
    kf = evaluation.evaluate(
        os.path.join(out, "m_KeyFrameTrajectory.csv"),
        os.path.join(seq_dir, "groundtruth.csv"),
    )
    assert kf["n_pairs"] >= 8
    assert np.isfinite(kf["ate_rmse"])
    assert kf["ate_rmse"] < 0.08, kf
