"""RGBD + stereo sensor paths and localization-only mode.

Covers the reference's non-monocular surface: System::TrackRGBD /
TrackStereo (reference src/System.cc:141-241), StereoInitialization
(src/Tracking.cc:390-437), depth-minted keyframe points
(src/Tracking.cc:933-979), ActivateLocalizationMode (include/System.h:88)
and the onlyTracking/mbVO logic (src/Tracking.cc:184-296).
"""

import numpy as np
import pytest

from synth_scene import PlaneScene, look_down_pose, make_texture

from anyfeature_vslam_tpu.ops.camera import CameraParams
from anyfeature_vslam_tpu.system import System
from anyfeature_vslam_tpu.slam.tracking import TrackState

W, H = 320, 240
FX = 260.0
K = np.array([[FX, 0, 160.0], [0, FX, 120.0], [0, 0, 1]], np.float64)
BASELINE = 0.1
BF = FX * BASELINE


def make_system(sensor, **kw):
    cam = CameraParams.create(fx=FX, fy=FX, cx=160, cy=120, width=W, height=H)
    return System(cam, n_features=1000, sensor=sensor, bf=BF, **kw)


def line_traj(n, x0=2.0, x1=3.0, y=2.5, z=-2.0):
    return [look_down_pose(x0 + (x1 - x0) * i / (n - 1), y, z) for i in range(n)]


@pytest.fixture(scope="module")
def scene():
    return PlaneScene(K, W, H, seed=5, tex=make_texture(n_blobs=15000, seed=5))


@pytest.fixture(scope="module")
def rgbd_run(scene):
    # > 30 frames so the c1a keyframe-cadence condition fires at least once
    # (reference: a fresh stereo/RGBD map tracks >100 close points, so c2's
    # need_close stays false until tracking decays or maxFrames pass)
    sys_ = make_system("rgbd")
    poses = line_traj(40, x1=3.2)
    for i, p in enumerate(poses):
        img, depth = scene.render_with_depth(p)
        sys_.track_rgbd(img, depth, i / 30.0)
    return sys_, poses


def test_rgbd_instant_initialization(scene):
    """StereoInitialization: one frame with depth bootstraps a full map."""
    sys_ = make_system("rgbd")
    img, depth = scene.render_with_depth(line_traj(2)[0])
    state = sys_.track_rgbd(img, depth, 0.0)
    assert state == TrackState.OK
    assert sys_.map.n_keyframes() == 1
    assert sys_.map.n_points() > 300
    # metric scale: map point depths match the rendered depth (~2 m plane)
    kf = int(sys_.map.keyframe_ids()[0])
    m = sys_.map.kf_matches[kf]
    pts = sys_.map.pt_pos[m[m >= 0]]
    assert 1.5 < np.median(pts[:, 2]) < 2.1


def test_rgbd_tracking_metric_scale(rgbd_run):
    sys_, poses = rgbd_run
    assert sys_.tracker.stats["lost_frames"] == 0, sys_.tracker.stats
    assert sys_.tracker.stats["tracked_frames"] >= len(poses) - 1
    assert sys_.map.n_keyframes() >= 2
    # absolute (metric) trajectory: keyframe camera centers vs ground truth
    # without any scale alignment — RGBD observes true depth
    ids = sys_.map.keyframe_ids()
    est, gt = [], []
    for kf in ids:
        t = sys_.map.kf_pose[kf]
        est.append(-t[:3, :3].T @ t[:3, 3])
        fid = int(sys_.map.kf_frame_id[kf])
        p = poses[fid]
        gt.append(-p[:3, :3].T @ p[:3, 3])
    est, gt = np.asarray(est), np.asarray(gt)
    # first KF is the origin for est; compare relative displacements
    d_est = np.linalg.norm(est[-1] - est[0])
    d_gt = np.linalg.norm(gt[-1] - gt[0])
    assert d_gt > 0.5
    assert abs(d_est - d_gt) / d_gt < 0.12, (d_est, d_gt)


def test_rgbd_close_points_in_new_keyframes(rgbd_run):
    """Stereo/RGBD keyframes mint depth points: later keyframes must carry
    matches beyond what tracking alone provides."""
    sys_, _ = rgbd_run
    ids = sys_.map.keyframe_ids()
    for kf in ids:
        n_matched = int((sys_.map.kf_matches[kf] >= 0).sum())
        assert n_matched > 100, (kf, n_matched)


def _right_image(scene, t_cw):
    """Rectified right view: camera shifted by +baseline along camera x."""
    t_shift = np.eye(4, dtype=np.float64)
    t_shift[0, 3] = -BASELINE
    return scene.render(t_shift @ np.asarray(t_cw, np.float64))


def test_stereo_row_matcher(scene):
    """Disparity from the batched row matcher reproduces rendered depth."""
    import jax.numpy as jnp
    from anyfeature_vslam_tpu.frontend.extractor import ExtractorConfig, extract_features
    from anyfeature_vslam_tpu.slam import frame_ops

    pose = line_traj(2)[0]
    img_l, depth = scene.render_with_depth(pose)
    img_r = _right_image(scene, pose)
    cfg = ExtractorConfig(n_features=1000)
    fl = {k: np.asarray(v) for k, v in extract_features(jnp.asarray(img_l), cfg, H, W).items()}
    fr = {k: np.asarray(v) for k, v in extract_features(jnp.asarray(img_r), cfg, H, W).items()}
    res = {
        k: np.asarray(v)
        for k, v in frame_ops.match_stereo_rows(
            jnp.asarray(fl["desc_bits"]), jnp.asarray(fl["xy"]),
            jnp.asarray(fl["size"]), jnp.asarray(fl["valid"]),
            jnp.asarray(fr["desc_bits"]), jnp.asarray(fr["xy"]),
            jnp.asarray(fr["size"]), jnp.asarray(fr["valid"]),
            75.0, 0.0, FX,
        ).items()
    }
    ok = res["valid"] & (res["disparity"] > 0)
    assert ok.sum() > 150
    z_est = BF / res["disparity"][ok]
    xy = fl["xy"][ok]
    z_gt = depth[
        np.clip(np.rint(xy[:, 1]).astype(int), 0, H - 1),
        np.clip(np.rint(xy[:, 0]).astype(int), 0, W - 1),
    ]
    rel = np.abs(z_est - z_gt) / z_gt
    # discrete pixel disparity at 2m/0.1m baseline quantizes to ~8% steps;
    # the median match should sit well within one step
    assert np.median(rel) < 0.08, np.median(rel)


@pytest.mark.slow
def test_stereo_e2e(scene):
    sys_ = make_system("stereo")
    poses = line_traj(12)
    for i, p in enumerate(poses):
        img_l = scene.render(p)
        img_r = _right_image(scene, p)
        sys_.track_stereo(img_l, img_r, i / 30.0)
    assert sys_.map.n_keyframes() >= 1
    assert sys_.tracker.stats["tracked_frames"] >= len(poses) * 0.7
    assert sys_.tracker.stats["lost_frames"] == 0


def test_localization_mode(rgbd_run, scene):
    """ActivateLocalizationMode freezes the map; tracking continues against
    it; DeactivateLocalizationMode resumes mapping."""
    sys_, poses = rgbd_run
    n_kf_before = sys_.map.n_keyframes()
    n_pt_before = sys_.map.n_points()
    sys_.activate_localization_mode()
    # retrace part of the trajectory backwards
    for j, p in enumerate(reversed(poses[-8:])):
        img, depth = scene.render_with_depth(p)
        state = sys_.track_rgbd(img, depth, 1.0 + j / 30.0)
        assert state == TrackState.OK
    assert sys_.map.n_keyframes() == n_kf_before
    assert sys_.map.n_points() == n_pt_before
    assert sys_.tracker.only_tracking
    sys_.deactivate_localization_mode()
    img, depth = scene.render_with_depth(poses[-1])
    sys_.track_rgbd(img, depth, 2.0)
    assert not sys_.tracker.only_tracking


def test_sensor_argument_validation():
    cam = CameraParams.create(fx=FX, fy=FX, cx=160, cy=120, width=W, height=H)
    with pytest.raises(ValueError):
        System(cam, sensor="rgbd")  # missing bf
    with pytest.raises(ValueError):
        System(cam, sensor="lidar")
    sys_ = System(cam, sensor="monocular")
    with pytest.raises(RuntimeError):
        sys_.track_rgbd(np.zeros((H, W), np.float32), np.ones((H, W), np.float32), 0.0)


def test_reset_request(scene):
    sys_ = make_system("rgbd")
    img, depth = scene.render_with_depth(line_traj(2)[0])
    sys_.track_rgbd(img, depth, 0.0)
    assert sys_.map.n_keyframes() == 1
    sys_.request_reset()
    img, depth = scene.render_with_depth(line_traj(2)[1])
    sys_.track_rgbd(img, depth, 1 / 30.0)
    assert sys_.tracker.stats["resets"] == 1
