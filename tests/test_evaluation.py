"""Sim3 alignment / ATE scoring (io/evaluation.py) + end-to-end accuracy:
SLAM on a synthetic scene with exact ground truth must reach small ATE."""

import numpy as np
import pytest

from anyfeature_vslam_tpu.io import evaluation


def test_umeyama_recovers_sim3():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 3))
    ang = 0.7
    r = np.array([
        [np.cos(ang), -np.sin(ang), 0],
        [np.sin(ang), np.cos(ang), 0],
        [0, 0, 1],
    ])
    s_gt, t_gt = 2.3, np.array([1.0, -2.0, 0.5])
    y = s_gt * x @ r.T + t_gt
    s, r_est, t_est = evaluation.umeyama_alignment(x, y)
    assert abs(s - s_gt) < 1e-9
    np.testing.assert_allclose(r_est, r, atol=1e-9)
    np.testing.assert_allclose(t_est, t_gt, atol=1e-9)
    rmse, _ = evaluation.ate_rmse(x, y)
    assert rmse < 1e-9


def test_associate_nearest():
    ia, ib = evaluation.associate([0.0, 1.0, 2.0], [0.005, 0.99, 5.0], max_diff=0.02)
    np.testing.assert_array_equal(ia, [0, 1])
    np.testing.assert_array_equal(ib, [0, 1])


@pytest.mark.slow
def test_slam_ate_on_synthetic_scene(tmp_path):
    """Run the full pipeline over a known trajectory, save outputs, score
    keyframe ATE via the evaluation CLI path. The monocular-scale-aligned
    RMSE must be a small fraction of the trajectory extent."""
    from synth_scene import PlaneScene, look_down_pose, make_texture
    from anyfeature_vslam_tpu.ops.camera import CameraParams
    from anyfeature_vslam_tpu.system import System

    W, H = 320, 240
    K = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1]])
    scene = PlaneScene(K, W, H, seed=5, tex=make_texture(n_blobs=15000, seed=5))
    cam = CameraParams.create(fx=260, fy=260, cx=160, cy=120, width=W, height=H)
    sys_ = System(cam, n_features=600)

    n = 24
    gt_centers, ts = [], []
    for i in range(n):
        x = 2.0 + 0.05 * i
        y = 2.5 + 0.3 * np.sin(i / 5.0)
        pose = look_down_pose(x, y, -2.0)
        img = scene.render(pose)
        sys_.track_monocular(img, i / 30.0)
        gt_centers.append([x, y, -2.0])
        ts.append(i / 30.0)
    assert sys_.map.n_keyframes() >= 4

    out = sys_.save_outputs(str(tmp_path), "synth")
    ts_e, xyz_e = evaluation.load_vslamlab_csv(out)
    gt = np.asarray(gt_centers)
    ia, ib = evaluation.associate(ts_e, ts, max_diff=0.005)
    assert len(ia) >= 4
    rmse, (s, _, _) = evaluation.ate_rmse(xyz_e[ia], gt[ib])
    extent = np.linalg.norm(gt.max(0) - gt.min(0))
    assert rmse < 0.05 * extent, (rmse, extent)
