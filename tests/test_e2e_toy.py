"""End-to-end integration: toy sequence (5 TUM-fr1 frames) through the full
pipeline — extraction, two-view init, tracking, keyframe insertion,
triangulation, local BA — to a keyframe-trajectory CSV.

Mirrors the reference's de-facto smoke validation (reference README.md:52-64
runs ./bin/mono on docs/toy_sequence)."""

import csv
import os

import numpy as np
import pytest

TOY = "/root/reference/docs/toy_sequence"


@pytest.fixture(scope="module")
def toy_run(tmp_path_factory):
    from anyfeature_vslam_tpu.system import run_sequence

    out = tmp_path_factory.mktemp("toy_out")
    system = run_sequence(TOY, out_dir=str(out), exp_id="toy", verbose=False)
    return system, out


def test_initializes_and_tracks(toy_run):
    system, _ = toy_run
    assert system.map.n_keyframes() >= 2
    assert system.map.n_points() > 100
    assert system.tracker.stats["tracked_frames"] >= 3
    assert system.tracker.stats["lost_frames"] == 0


def test_keyframe_trajectory_csv(toy_run):
    system, out = toy_run
    path = os.path.join(str(out), "toy_KeyFrameTrajectory.csv")
    with open(path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["ts (ns)", "tx (m)", "ty (m)", "tz (m)", "qx", "qy", "qz", "qw"]
    data = np.array([[float(v) for v in r] for r in rows[1:]])
    assert len(data) >= 2
    assert np.all(np.isfinite(data))
    # timestamps monotonically increasing
    assert np.all(np.diff(data[:, 0]) > 0)
    # quaternions normalized
    np.testing.assert_allclose(np.linalg.norm(data[:, 4:8], axis=1), 1.0, atol=1e-5)
    # motion is small but nonzero across the 5-frame sequence
    t = data[:, 1:4]
    assert 1e-4 < np.linalg.norm(t[-1] - t[0]) < 1.0


def test_map_consistency(toy_run):
    """Every observation references a valid point; reprojection errors of
    surviving observations are small."""
    system, _ = toy_run
    m = system.map
    fx, fy = float(m_cam(system).fx), float(m_cam(system).fy)
    cx, cy = float(m_cam(system).cx), float(m_cam(system).cy)
    errs = []
    for kf in m.keyframe_ids():
        matches = m.kf_matches[kf]
        slots = np.nonzero(matches >= 0)[0]
        pts_ids = matches[slots]
        assert m.pt_valid[pts_ids].all()
        t = m.kf_pose[kf]
        pc = m.pt_pos[pts_ids] @ t[:3, :3].T + t[:3, 3]
        assert (pc[:, 2] > 0).all()
        u = fx * pc[:, 0] / pc[:, 2] + cx
        v = fy * pc[:, 1] / pc[:, 2] + cy
        uv = m.kf_uv[kf][slots]
        errs.append(np.hypot(u - uv[:, 0], v - uv[:, 1]))
    errs = np.concatenate(errs)
    assert np.median(errs) < 1.5
    assert (errs < 6.0).mean() > 0.95


def m_cam(system):
    return system.camera


def test_statistics_yaml(toy_run):
    system, out = toy_run
    path = os.path.join(str(out), "toy_statistics.yaml")
    content = open(path).read()
    assert "numKeyframes:" in content and "numPoints:" in content
