"""Integration: loop closing + relocalization on a synthetic planar scene."""

import numpy as np
import pytest

from synth_scene import PlaneScene, look_down_pose

from anyfeature_vslam_tpu.ops.camera import CameraParams
from anyfeature_vslam_tpu.system import System
from anyfeature_vslam_tpu.slam.tracking import TrackState

W, H = 320, 240
K = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1]], np.float64)


def make_system(**kw):
    cam = CameraParams.create(fx=260, fy=260, cx=160, cy=120, width=W, height=H)
    return System(cam, n_features=600, **kw)


def circle_traj(n, radius=0.8, cx=2.5, cy=2.5, z=-2.0):
    poses = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        poses.append(
            look_down_pose(cx + radius * np.cos(ang), cy + radius * np.sin(ang), z)
        )
    return poses


@pytest.mark.slow
def test_tracking_on_circle():
    """Full image pipeline around a circular trajectory with 3D relief:
    initialization, continuous tracking, vocabulary auto-training, map
    consistency. (Deterministic loop-closure *correction* is covered by
    test_loop_closing_unit.py on a constructed map.)"""
    from synth_scene import make_texture

    scene = PlaneScene(K, W, H, seed=3, tex=make_texture(n_blobs=15000, seed=3))
    sys_ = make_system()
    n = 36
    poses = circle_traj(n)
    seq = poses + poses[: n // 4]
    for i, p in enumerate(seq):
        img = scene.render(p)
        sys_.track_monocular(img, i / 30.0)
    assert sys_.map.n_keyframes() >= 5
    assert sys_.tracker.stats["resets"] == 0, sys_.tracker.stats
    assert sys_.tracker.stats["tracked_frames"] >= len(seq) * 0.7
    # vocabulary trained and database active
    assert sys_.database is not None
    # map consistent: reprojection sanity
    m = sys_.map
    errs = []
    for kf in m.keyframe_ids():
        mm = m.kf_matches[kf]
        slots = np.nonzero(mm >= 0)[0]
        if len(slots) == 0:
            continue
        t = m.kf_pose[kf]
        pc = m.pt_pos[mm[slots]] @ t[:3, :3].T + t[:3, 3]
        u = 260 * pc[:, 0] / pc[:, 2] + 160
        v = 260 * pc[:, 1] / pc[:, 2] + 120
        uv = m.kf_uv[kf][slots]
        errs.append(np.hypot(u - uv[:, 0], v - uv[:, 1]))
    errs = np.concatenate(errs)
    assert np.median(errs) < 2.0, np.median(errs)


@pytest.mark.slow
def test_relocalization_after_blackout():
    scene = PlaneScene(K, W, H, seed=4)
    sys_ = make_system(enable_loop_closing=False)
    # line trajectory to build a map
    xs = np.linspace(1.5, 3.5, 25)
    frames = [scene.render(look_down_pose(x, 2.5, -2.0)) for x in xs]
    t = 0
    for img in frames:
        sys_.track_monocular(img, t / 30.0)
        t += 1
    assert sys_.tracker.state == TrackState.OK
    assert sys_.database is not None, "vocabulary should have been trained"
    # blackout: featureless frames -> tracking lost
    black = np.full((H, W), 25.0, np.float32)
    for _ in range(3):
        sys_.track_monocular(black, t / 30.0)
        t += 1
    assert sys_.tracker.state == TrackState.LOST
    # return to a previously mapped view -> relocalize
    recovered = False
    for x in (2.5, 2.4, 2.6):
        st = sys_.track_monocular(scene.render(look_down_pose(x, 2.5, -2.0)), t / 30.0)
        t += 1
        if st == TrackState.OK:
            recovered = True
            break
    assert recovered, "relocalization failed"
    assert sys_.tracker.stats["relocalizations"] >= 1
