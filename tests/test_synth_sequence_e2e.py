"""Disk-sequence end-to-end: render a synthetic sequence (tools/
make_synth_sequence.py), run the full pipeline through run_sequence (the
CLI path: loader, native PNG decode, tracking, mapping, writers), and score
BOTH trajectories against ground truth with the Sim3-aligned ATE the
reference relies on externally (VSLAM-LAB, reference README.md:19)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_disk_sequence_ate(tmp_path):
    seq_dir = str(tmp_path / "seq")
    out_dir = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synth_sequence.py"),
         f"out_dir:{seq_dir}", "n_frames:48", "width:320", "height:240",
         "revisit:0.0", "seed:3"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr

    from anyfeature_vslam_tpu.system import run_sequence
    from anyfeature_vslam_tpu.io import evaluation

    system = run_sequence(
        seq_dir, feature="orb32", out_dir=out_dir, exp_id="t",
        verbose=False, n_features=600,
    )
    assert system.tracker.stats["resets"] == 0
    assert system.tracker.stats["tracked_frames"] >= 40

    gt = os.path.join(seq_dir, "groundtruth.csv")
    kf = evaluation.evaluate(os.path.join(out_dir, "t_KeyFrameTrajectory.csv"), gt)
    fr = evaluation.evaluate(os.path.join(out_dir, "t_FrameTrajectory_TUM.txt"), gt)
    # circle radius 0.8 m at 2 m height; a healthy run is mm-level after
    # Sim3 alignment. 5 cm catches gross regressions without flaking.
    assert kf["n_pairs"] >= 5
    assert kf["ate_rmse"] < 0.05, kf
    assert fr["n_pairs"] >= 35
    assert fr["ate_rmse"] < 0.05, fr
    # frame and keyframe trajectories must agree on scale (a mismatch means
    # frames are replaying against wrong/stale anchors)
    assert abs(kf["scale"] - fr["scale"]) / kf["scale"] < 0.2, (kf, fr)


@pytest.fixture(scope="module")
def family_seq(tmp_path_factory):
    seq_dir = str(tmp_path_factory.mktemp("famseq") / "seq")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synth_sequence.py"),
         f"out_dir:{seq_dir}", "n_frames:32", "width:320", "height:240",
         "revisit:0.0", "seed:3"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    return seq_dir


# Per-family accuracy regression (VERDICT round 1 item 10): every real
# detector/descriptor construction must carry the FULL pipeline — init,
# tracking, mapping — to a sub-2cm Sim3-aligned ATE on the rendered
# ground-truth circle, not just pass shape checks.
@pytest.mark.slow
@pytest.mark.parametrize("feature", [
    "brisk48", "akaze61", "anyfeat_bin", "kaze64",
    "sift128", "surf64", "anyfeat_nonbin",
])
def test_family_disk_sequence_ate(family_seq, tmp_path, feature):
    from anyfeature_vslam_tpu.system import run_sequence
    from anyfeature_vslam_tpu.io import evaluation

    out_dir = str(tmp_path / "out")
    system = run_sequence(
        family_seq, feature=feature, out_dir=out_dir, exp_id="t",
        verbose=False, n_features=600,
    )
    assert system.tracker.stats["resets"] == 0
    assert system.tracker.stats["tracked_frames"] >= 24
    kf = evaluation.evaluate(
        os.path.join(out_dir, "t_KeyFrameTrajectory.csv"),
        os.path.join(family_seq, "groundtruth.csv"))
    assert kf["n_pairs"] >= 5
    assert kf["ate_rmse"] < 0.02, kf
