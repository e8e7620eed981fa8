"""Worker-thread mapping mode (System threaded_mapping=True): the whole
keyframe event (triangulation, fusion, local BA, culling, loop closing)
overlaps tracking in wall-clock, like the reference's LocalMapping /
LoopClosing threads (reference src/System.cc:112-117).

Thread interleaving makes keyframe cadence timing-dependent, so the
assertions are robustness-level (no resets, tracks through, finite
consistent trajectory), not exact-count."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("thseq") / "seq")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synth_sequence.py"),
         f"out_dir:{d}", "n_frames:40", "width:320", "height:240",
         "revisit:0.0", "seed:9"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    return d


@pytest.mark.slow
def test_threaded_mapping_end_to_end(seq_dir, tmp_path):
    from anyfeature_vslam_tpu.system import run_sequence
    from anyfeature_vslam_tpu.io import evaluation

    out_dir = str(tmp_path / "out")
    system = run_sequence(
        seq_dir, feature="orb32", out_dir=out_dir, exp_id="t",
        verbose=False, n_features=600, threaded_mapping=True,
    )
    assert system.tracker.stats["resets"] == 0
    assert system.tracker.stats["tracked_frames"] >= 30
    assert system.map.n_keyframes() >= 3
    kf = evaluation.evaluate(
        os.path.join(out_dir, "t_KeyFrameTrajectory.csv"),
        os.path.join(seq_dir, "groundtruth.csv"))
    assert kf["n_pairs"] >= 3
    assert np.isfinite(kf["ate_rmse"])
    assert kf["ate_rmse"] < 0.05, kf
    # worker must be drained and stoppable
    system.shutdown()
    assert system._worker is None
