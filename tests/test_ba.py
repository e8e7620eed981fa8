import numpy as np
import jax.numpy as jnp

from anyfeature_vslam_tpu.ops import ba, se3

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0


def synth_ba(n_kf=6, n_pt=150, noise=0.25, seed=0, pose_pert=0.02, pt_pert=0.05):
    """Cameras on a line looking at a point cloud; all points seen by all KFs."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 9], (n_pt, 3)).astype(np.float32)
    poses = []
    for k in range(n_kf):
        xi = np.array([0.3 * k, 0.01 * k, 0.0, 0.0, -0.02 * k, 0.0], np.float32)
        poses.append(np.asarray(se3.se3_exp(jnp.asarray(xi))))
    poses = np.stack(poses)

    obs_kf, obs_pt, obs_uv = [], [], []
    for k in range(n_kf):
        pc = pts @ poses[k][:3, :3].T + poses[k][:3, 3]
        uv = np.stack(
            [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1
        )
        uv += rng.normal(0, noise, uv.shape)
        inb = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        for p in np.nonzero(inb)[0]:
            obs_kf.append(k)
            obs_pt.append(p)
            obs_uv.append(uv[p])
    o = len(obs_kf)
    obs = dict(
        obs_kf=np.asarray(obs_kf, np.int32),
        obs_pt=np.asarray(obs_pt, np.int32),
        obs_uv=np.asarray(obs_uv, np.float32),
        obs_w=np.ones(o, np.float32),
        obs_valid=np.ones(o, bool),
    )
    # perturb
    poses_n = poses.copy()
    for k in range(1, n_kf):
        xi = rng.uniform(-pose_pert, pose_pert, 6).astype(np.float32)
        poses_n[k] = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ poses[k]
    pts_n = pts + rng.normal(0, pt_pert, pts.shape).astype(np.float32)
    return poses, pts, poses_n, pts_n, obs


def run_ba(poses, pts, free, obs, **kw):
    return ba.bundle_adjust(
        jnp.asarray(poses), jnp.asarray(pts), jnp.asarray(free),
        jnp.asarray(obs["obs_kf"]), jnp.asarray(obs["obs_pt"]),
        jnp.asarray(obs["obs_uv"]), jnp.asarray(obs["obs_w"]),
        jnp.asarray(obs["obs_valid"]), FX, FY, CX, CY, **kw,
    )


def reproj_rmse(poses, pts, obs):
    poses, pts = np.asarray(poses), np.asarray(pts)
    pc = np.einsum(
        "oij,oj->oi", poses[obs["obs_kf"]][:, :3, :3], pts[obs["obs_pt"]]
    ) + poses[obs["obs_kf"]][:, :3, 3]
    uv = np.stack(
        [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1
    )
    return float(np.sqrt(((uv - obs["obs_uv"]) ** 2).sum(-1).mean()))


def pose_error_scale_aligned(poses_est, poses_gt):
    """Max SE3 tangent error after aligning the free monocular scale gauge
    (only one camera is fixed, so global scale is unobservable)."""
    poses_est, poses_gt = np.asarray(poses_est), np.asarray(poses_gt)
    c_est = -np.einsum("kji,kj->ki", poses_est[:, :3, :3], poses_est[:, :3, 3])
    c_gt = -np.einsum("kji,kj->ki", poses_gt[:, :3, :3], poses_gt[:, :3, 3])
    n_est = np.linalg.norm(c_est[1:], axis=1)
    n_gt = np.linalg.norm(c_gt[1:], axis=1)
    s = np.median(n_gt / np.clip(n_est, 1e-9, None))
    aligned = poses_est.copy()
    aligned[:, :3, 3] = poses_est[:, :3, 3] * s
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(aligned) @ poses_gt)))
    return np.abs(err).max()


def test_ba_reduces_error():
    poses_gt, pts_gt, poses_n, pts_n, obs = synth_ba()
    free = np.ones(len(poses_gt), bool)
    free[0] = False  # gauge
    rmse_before = reproj_rmse(poses_n, pts_n, obs)
    poses_o, pts_o, chi2, z = run_ba(poses_n, pts_n, free, obs, n_iters=15)
    rmse_after = reproj_rmse(poses_o, pts_o, obs)
    assert rmse_before > 2.0
    assert rmse_after < 0.45, (rmse_before, rmse_after)
    # poses close to ground truth (gauge fixed by kf0 + same scale since
    # points perturbation is small)
    err = np.asarray(
        se3.se3_log(jnp.asarray(np.linalg.inv(np.asarray(poses_o)) @ poses_gt))
    )
    assert np.abs(err).max() < 0.01, err


def test_ba_respects_fixed_cameras():
    poses_gt, pts_gt, poses_n, pts_n, obs = synth_ba(seed=1)
    free = np.zeros(len(poses_gt), bool)
    free[3:] = True
    poses_o, pts_o, _, _ = run_ba(poses_n, pts_n, free, obs, n_iters=8)
    poses_o = np.asarray(poses_o)
    np.testing.assert_array_equal(poses_o[:3], poses_n[:3])
    assert not np.allclose(poses_o[3:], poses_n[3:])


def test_ba_two_stage_rejects_outlier_observations():
    """Reference local-BA schedule: Huber stage, cull, refine (Optimizer.cc:649-699)."""
    poses_gt, pts_gt, poses_n, pts_n, obs = synth_ba(seed=2)
    o = len(obs["obs_kf"])
    rng = np.random.default_rng(7)
    out_idx = rng.choice(o, o // 10, replace=False)
    obs["obs_uv"][out_idx] += 40.0
    free = np.ones(len(poses_gt), bool)
    free[0] = False
    poses_o, pts_o, chi2, z, valid2 = ba.bundle_adjust_two_stage(
        jnp.asarray(poses_n), jnp.asarray(pts_n), jnp.asarray(free),
        jnp.asarray(obs["obs_kf"]), jnp.asarray(obs["obs_pt"]),
        jnp.asarray(obs["obs_uv"]), jnp.asarray(obs["obs_w"]),
        jnp.asarray(obs["obs_valid"]), FX, FY, CX, CY,
        n_iters_a=8, n_iters_b=10,
    )
    out_mask = np.asarray(ba.classify_outliers(chi2, z))
    clean = np.ones(o, bool)
    clean[out_idx] = False
    assert out_mask[~clean].mean() > 0.9
    assert out_mask[clean].mean() < 0.05
    assert pose_error_scale_aligned(poses_o, poses_gt) < 0.02


def test_ba_invalid_obs_ignored():
    poses_gt, pts_gt, poses_n, pts_n, obs = synth_ba(seed=3)
    o = len(obs["obs_kf"])
    rng = np.random.default_rng(8)
    # random half invalid (keeps every camera constrained)
    bad = rng.choice(o, o // 2, replace=False)
    obs["obs_uv"][bad] += 1000.0
    obs["obs_valid"][bad] = False
    free = np.ones(len(poses_gt), bool)
    free[0] = False
    poses_o, pts_o, chi2, _ = run_ba(poses_n, pts_n, free, obs, n_iters=10)
    assert pose_error_scale_aligned(poses_o, poses_gt) < 0.02
    assert np.all(np.isinf(np.asarray(chi2)[bad]))


def test_dense_schur_matches_cg_path():
    """The small-problem dense-Schur solver and the matrix-free CG solver
    must converge to the same optimum on the same schedule (the dense solve
    is exact where CG is 25-step-approximate, so compare reprojection cost
    and recovered geometry, not bitwise state)."""
    import jax

    pts, poses, poses_n, pts_n, obs = synth_ba(n_kf=6, n_pt=150)
    free = np.ones(6, bool)
    free[0] = False
    args = (
        jnp.asarray(poses_n), jnp.asarray(pts_n), jnp.asarray(free),
        jnp.asarray(obs["obs_kf"]), jnp.asarray(obs["obs_pt"]),
        jnp.asarray(obs["obs_uv"]), jnp.asarray(obs["obs_w"]),
        jnp.asarray(obs["obs_valid"]), FX, FY, CX, CY,
    )
    dense = ba._bundle_adjust_dense_impl(*args, n_iters=10)
    cg = jax.jit(
        lambda *a: ba._bundle_adjust_impl(*a, n_iters=10, n_cg=50)
    )(*args)
    # both must reach the noise floor
    c_dense = float(jnp.sum(jnp.where(jnp.isfinite(dense[2]), dense[2], 0.0)))
    c_cg = float(jnp.sum(jnp.where(jnp.isfinite(cg[2]), cg[2], 0.0)))
    n_obs = len(obs["obs_kf"])
    assert c_dense / n_obs < 0.5
    assert abs(c_dense - c_cg) / c_cg < 0.02, (c_dense, c_cg)
    # camera centers agree
    cd = np.asarray(dense[0])
    cc = np.asarray(cg[0])
    centers_d = -np.einsum("kij,kj->ki", cd[:, :3, :3].transpose(0, 2, 1), cd[:, :3, 3])
    centers_c = -np.einsum("kij,kj->ki", cc[:, :3, :3].transpose(0, 2, 1), cc[:, :3, 3])
    assert np.abs(centers_d - centers_c).max() < 5e-3
