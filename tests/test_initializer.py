import numpy as np
import jax.numpy as jnp

from anyfeature_vslam_tpu.ops import initializer, se3

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def make_scene(planar=False, n=300, noise=0.3, outliers=0, seed=0):
    rng = np.random.default_rng(seed)
    if planar:
        # points on z = 5 plane
        xy = rng.uniform(-2.5, 2.5, (n, 2))
        pts = np.concatenate([xy, np.full((n, 1), 5.0)], -1).astype(np.float32)
    else:
        pts = rng.uniform([-2.5, -2, 4], [2.5, 2, 10], (n, 3)).astype(np.float32)
    xi = np.array([0.5, 0.05, 0.02, 0.02, -0.08, 0.01], np.float32)  # strong baseline
    t21 = np.asarray(se3.se3_exp(jnp.asarray(xi)))

    def proj(t, x):
        pc = x @ t[:3, :3].T + t[:3, 3]
        return np.stack(
            [500 * pc[:, 0] / pc[:, 2] + 320, 500 * pc[:, 1] / pc[:, 2] + 240], -1
        )

    uv1 = proj(np.eye(4, dtype=np.float32), pts) + rng.normal(0, noise, (n, 2))
    uv2 = proj(t21, pts) + rng.normal(0, noise, (n, 2))
    if outliers:
        uv2[:outliers] = rng.uniform([0, 0], [640, 480], (outliers, 2))
    valid = np.ones(n, bool)
    return t21, pts, uv1.astype(np.float32), uv2.astype(np.float32), valid


def run(uv1, uv2, valid, seed=0):
    return initializer.initialize_two_view(
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid), jnp.asarray(K), seed
    )


def check_pose(res, t21_true, atol_rot=0.01, atol_dir=0.05):
    t_est = np.asarray(res["t21"])
    # translation is scale-free: compare direction; rotation directly
    r_err = np.asarray(
        se3.so3_log(jnp.asarray(t_est[:3, :3].T @ t21_true[:3, :3]))
    )
    assert np.abs(r_err).max() < atol_rot, r_err
    t_dir_est = t_est[:3, 3] / np.linalg.norm(t_est[:3, 3])
    t_dir_true = t21_true[:3, 3] / np.linalg.norm(t21_true[:3, 3])
    assert np.abs(t_dir_est - t_dir_true).max() < atol_dir, (t_dir_est, t_dir_true)


def test_general_scene_uses_fundamental():
    t21, pts, uv1, uv2, valid = make_scene()
    res = run(uv1, uv2, valid)
    assert bool(res["success"])
    assert not bool(res["used_homography"])
    check_pose(res, t21)
    good = np.asarray(res["good"])
    assert good.sum() > 200
    # reconstructed points match ground truth up to global scale
    est = np.asarray(res["pts3d"])[good]
    gt = pts[good]
    scale = np.median(np.linalg.norm(gt, axis=1) / np.linalg.norm(est, axis=1))
    err = np.linalg.norm(est * scale - gt, axis=1)
    assert np.median(err) < 0.1
    assert (err < 0.4).mean() > 0.98  # far points amplify pixel noise


def test_planar_scene_uses_homography():
    t21, pts, uv1, uv2, valid = make_scene(planar=True, seed=1)
    res = run(uv1, uv2, valid)
    assert bool(res["success"])
    assert bool(res["used_homography"])
    check_pose(res, t21, atol_rot=0.02, atol_dir=0.08)


def test_with_outliers():
    t21, pts, uv1, uv2, valid = make_scene(outliers=60, seed=2)
    res = run(uv1, uv2, valid)
    assert bool(res["success"])
    check_pose(res, t21, atol_rot=0.02, atol_dir=0.08)
    good = np.asarray(res["good"])
    assert good[:60].mean() < 0.15  # outliers rejected


def test_degenerate_no_baseline_fails():
    """Pure rotation (no translation) must not report success."""
    rng = np.random.default_rng(3)
    n = 300
    pts = rng.uniform([-2.5, -2, 4], [2.5, 2, 10], (n, 3)).astype(np.float32)
    rot = np.asarray(se3.so3_exp(jnp.asarray([0.0, -0.05, 0.01])))
    t21 = np.eye(4, dtype=np.float32)
    t21[:3, :3] = rot

    def proj(t, x):
        pc = x @ t[:3, :3].T + t[:3, 3]
        return np.stack(
            [500 * pc[:, 0] / pc[:, 2] + 320, 500 * pc[:, 1] / pc[:, 2] + 240], -1
        ).astype(np.float32)

    uv1 = proj(np.eye(4, dtype=np.float32), pts)
    uv2 = proj(t21, pts)
    res = run(uv1, uv2, np.ones(n, bool))
    assert not bool(res["success"])


def test_too_few_matches_fails():
    t21, pts, uv1, uv2, valid = make_scene()
    valid = valid.copy()
    valid[30:] = False  # 30 matches only -> cannot reach MIN_TRIANGULATED
    res = run(uv1, uv2, valid)
    assert not bool(res["success"])
