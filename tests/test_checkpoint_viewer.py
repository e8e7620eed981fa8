"""Map checkpoint save/load roundtrip + offline viewer rendering."""

import numpy as np

from anyfeature_vslam_tpu.slam.map_state import SlamMap
from anyfeature_vslam_tpu.io import viewer


def small_map(seed=0):
    rng = np.random.default_rng(seed)
    m = SlamMap(max_kf=8, max_pt=200, n_feat=64, desc_dim=128, desc_dtype=np.float32)
    feats = dict(
        uv_und=rng.uniform(0, 640, (64, 2)).astype(np.float32),
        desc_bits=rng.normal(size=(64, 128)).astype(np.float32),
        octave=np.zeros(64, np.int32),
        size=np.ones(64, np.float32),
        angle=np.zeros(64, np.float32),
        inv_sigma2=np.ones(64, np.float32),
        valid=np.ones(64, bool),
    )
    ids = m.add_points(
        rng.normal(size=(40, 3)).astype(np.float32) + [0, 0, 5],
        rng.normal(size=(40, 128)).astype(np.float32),
        ref_kf=0, ref_sizes=np.ones(40, np.float32),
    )
    matches = np.full(64, -1, np.int32)
    matches[:40] = ids
    m.add_keyframe(np.eye(4, dtype=np.float32), 0.0, 0, feats, matches)
    t2 = np.eye(4, dtype=np.float32)
    t2[0, 3] = 0.5
    m.add_keyframe(t2, 1 / 30, 1, feats, matches.copy())
    return m


def test_checkpoint_roundtrip(tmp_path):
    m = small_map()
    p = str(tmp_path / "map.npz")
    m.save(p)
    m2 = SlamMap.load(p)
    assert m2.n_keyframes() == m.n_keyframes()
    assert m2.n_points() == m.n_points()
    assert m2.desc_dim == 128 and m2.desc_dtype == np.float32
    np.testing.assert_array_equal(m2.kf_pose, m.kf_pose)
    np.testing.assert_array_equal(m2.pt_pos, m.pt_pos)
    np.testing.assert_array_equal(m2.kf_matches, m.kf_matches)
    np.testing.assert_array_equal(m2.kf_desc_bits, m.kf_desc_bits)
    # loaded map is fully functional
    w = m2.covisibility_weights(0)
    assert w[1] == 40


def test_checkpoint_binary_map(tmp_path):
    m = SlamMap(max_kf=4, max_pt=50, n_feat=32)  # default uint8/256
    p = str(tmp_path / "map.npz")
    m.save(p)
    m2 = SlamMap.load(p)
    assert m2.desc_dtype == np.uint8 and m2.desc_dim == 256


def test_viewer_svg(tmp_path):
    m = small_map()
    traj = np.cumsum(np.random.default_rng(1).normal(0, 0.1, (30, 3)), axis=0)
    p = viewer.render_map_svg(m, str(tmp_path / "map.svg"), trajectory=traj)
    content = open(p).read()
    assert content.startswith("<svg")
    assert "circle" in content  # points
    assert "path" in content    # trajectory
    assert "rect" in content    # keyframes + background


def test_kitti_trajectory_format(tmp_path):
    """KITTI writer: 12 floats/line, first pose at origin, valid rotations
    (reference SaveTrajectoryKITTI, src/System.cc:461-515)."""
    import numpy as np
    from anyfeature_vslam_tpu.system import run_sequence

    out = tmp_path / "kitti_out"
    run_sequence(
        "/root/reference/docs/toy_sequence", out_dir=str(out), exp_id="k",
        verbose=False,
    )
    lines = (out / "k_FrameTrajectory_KITTI.txt").read_text().strip().splitlines()
    assert len(lines) >= 3
    m = np.array([[float(v) for v in ln.split()] for ln in lines])
    assert m.shape[1] == 12
    assert np.all(np.isfinite(m))
    # rotations orthonormal
    for row in m:
        r = row.reshape(3, 4)[:, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
    # poses are expressed relative to the first keyframe: motion across the
    # 5-frame toy sequence stays small
    assert np.all(np.abs(m[:, [3, 7, 11]]) < 1.0)
    # line count matches the TUM frame trajectory (same non-lost frames)
    tum = (out / "k_FrameTrajectory_TUM.txt").read_text().strip().splitlines()
    assert len(lines) == len(tum)


def test_cli_overrides(tmp_path):
    """Reference-CLI-parity overrides: feature_yaml knobs, external
    calibration_yaml, vocabulary_folder resolution."""
    from anyfeature_vslam_tpu.io import dataset as ds
    from anyfeature_vslam_tpu.system import run_sequence

    fy = tmp_path / "orb32_settings.yaml"
    fy.write_text(
        "%YAML:1.0\nFeatureExtractor.numOctaves: 4\n"
        "FeatureExtractor.scaleFactor: 1.3\nFeatureExtractor.detectionTh: 25.0\n"
        "FeatureMatcher.matchingTh: 60.0\n"
    )
    s = ds.load_feature_settings(str(fy))
    assert s == dict(n_levels=4, scale_factor=1.3, detect_th=25.0, match_th=60.0)

    # vocabulary folder resolution prefers the reference DBoW2 names
    (tmp_path / "ORBvoc.txt").write_text("2 1 0 0\n")
    assert ds.find_vocabulary(str(tmp_path), "orb32").endswith("ORBvoc.txt")
    assert ds.find_vocabulary(str(tmp_path), "brisk48") is None

    system = run_sequence(
        "/root/reference/docs/toy_sequence", feature_yaml=str(fy),
        max_frames=3, verbose=False,
    )
    assert system.tracker.cfg.n_levels == 4
    assert system.tracker.cfg.match_th == 60.0


def test_frame_overlay(tmp_path):
    """FrameDrawer-equivalent overlay: keypoint boxes + PNG output."""
    from anyfeature_vslam_tpu.io import viewer

    img = np.full((120, 160), 50.0, np.float32)
    feats = dict(
        xy=np.array([[20.0, 30.0], [100.0, 60.0], [150.0, 110.0]], np.float32),
        valid=np.array([True, True, False]),
    )
    matches = np.array([5, -1, -1], np.int32)
    out = viewer.render_frame_overlay(
        img, feats, matches, state_text="OK", path=str(tmp_path / "f.png")
    )
    assert out.shape == (120, 160, 3)
    # tracked keypoint drew green, untracked blue, invalid nothing
    assert (out[27, 17] == (90, 230, 90)).all()
    assert (out[57, 97] == (110, 160, 255)).all()
    assert (out[107, 147] == 50).all()
    assert (tmp_path / "f.png").exists()
