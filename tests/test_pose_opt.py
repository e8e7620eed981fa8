import numpy as np
import jax.numpy as jnp

from anyfeature_vslam_tpu.ops import pose_opt, se3

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0


def synth_problem(n=200, outlier_frac=0.0, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3)).astype(np.float32)
    xi_true = np.array([0.1, -0.05, 0.08, 0.02, -0.03, 0.01], np.float32)
    t_true = np.asarray(se3.se3_exp(jnp.asarray(xi_true)))
    p = pts @ t_true[:3, :3].T + t_true[:3, 3]
    uv = np.stack([FX * p[:, 0] / p[:, 2] + CX, FY * p[:, 1] / p[:, 2] + CY], -1)
    uv += rng.normal(0, noise, uv.shape)
    n_out = int(n * outlier_frac)
    if n_out:
        uv[:n_out] += rng.uniform(20, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return t_true, pts.astype(np.float32), uv.astype(np.float32), n_out


def run(t0, pts, uv, inv_s2=None, valid=None):
    n = len(pts)
    inv_s2 = np.ones(n, np.float32) if inv_s2 is None else inv_s2
    valid = np.ones(n, bool) if valid is None else valid
    return pose_opt.pose_optimize(
        jnp.asarray(t0), jnp.asarray(pts), jnp.asarray(uv),
        jnp.asarray(inv_s2), jnp.asarray(valid), FX, FY, CX, CY,
    )


def test_converges_from_perturbed_init():
    t_true, pts, uv, _ = synth_problem()
    xi_pert = np.array([0.05, 0.05, -0.04, 0.01, 0.02, -0.015], np.float32)
    t0 = np.asarray(se3.se3_exp(jnp.asarray(xi_pert))) @ t_true
    t_est, inlier, n_in = run(t0, pts, uv)
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(np.asarray(t_est)) @ t_true)))
    assert np.abs(err).max() < 1e-3, err
    assert int(n_in) == len(pts)


def test_rejects_outliers():
    t_true, pts, uv, n_out = synth_problem(outlier_frac=0.25, noise=0.3, seed=1)
    xi_pert = np.array([0.03, -0.02, 0.03, 0.008, -0.01, 0.012], np.float32)
    t0 = np.asarray(se3.se3_exp(jnp.asarray(xi_pert))) @ t_true
    t_est, inlier, n_in = run(t0, pts, uv)
    inlier = np.asarray(inlier)
    # outliers (first n_out) classified out, inliers kept
    assert inlier[:n_out].mean() < 0.1
    assert inlier[n_out:].mean() > 0.95
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(np.asarray(t_est)) @ t_true)))
    assert np.abs(err).max() < 5e-3, err


def test_respects_validity_mask():
    t_true, pts, uv, _ = synth_problem(seed=2)
    # corrupt half the observations but mask them invalid
    uv2 = uv.copy()
    uv2[:100] += 500.0
    valid = np.ones(len(pts), bool)
    valid[:100] = False
    t_est, inlier, n_in = run(t_true, pts, uv2, valid=valid)
    assert not np.asarray(inlier)[:100].any()
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(np.asarray(t_est)) @ t_true)))
    assert np.abs(err).max() < 1e-3


def test_weighted_by_information():
    """High-sigma (low-information) noisy observations shouldn't drag the pose."""
    t_true, pts, uv, _ = synth_problem(noise=0.0, seed=3)
    uv2 = uv.copy()
    uv2[:50] += np.random.default_rng(4).normal(0, 3.0, (50, 2))
    inv_s2 = np.ones(len(pts), np.float32)
    inv_s2[:50] = 1.0 / 9.0  # sigma = 3px
    t_est, inlier, n_in = run(t_true, pts, uv2, inv_s2=inv_s2)
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(np.asarray(t_est)) @ t_true)))
    assert np.abs(err).max() < 2e-3
