"""Distributed BA on the virtual 8-device CPU mesh: results must match the
single-chip solver (same math, psum-reduced)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anyfeature_vslam_tpu.ops import ba
from anyfeature_vslam_tpu.parallel import sharded_ba

from test_ba import synth_ba, FX, FY, CX, CY, reproj_rmse, pose_error_scale_aligned


def _pad_obs(obs, mult):
    o = len(obs["obs_kf"])
    pad = (-o) % mult
    out = {}
    out["obs_kf"] = np.concatenate([obs["obs_kf"], np.zeros(pad, np.int32)])
    out["obs_pt"] = np.concatenate([obs["obs_pt"], np.zeros(pad, np.int32)])
    out["obs_uv"] = np.concatenate([obs["obs_uv"], np.zeros((pad, 2), np.float32)])
    out["obs_w"] = np.concatenate([obs["obs_w"], np.zeros(pad, np.float32)])
    out["obs_valid"] = np.concatenate([obs["obs_valid"], np.zeros(pad, bool)])
    return out


def test_sharded_matches_single_chip():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    poses_gt, pts_gt, poses_n, pts_n, obs = synth_ba(seed=5)
    orig_o = len(obs["obs_kf"])
    obs = _pad_obs(obs, 8)
    free = np.ones(len(poses_gt), bool)
    free[0] = False

    args = (
        jnp.asarray(poses_n), jnp.asarray(pts_n), jnp.asarray(free),
        jnp.asarray(obs["obs_kf"]), jnp.asarray(obs["obs_pt"]),
        jnp.asarray(obs["obs_uv"]), jnp.asarray(obs["obs_w"]),
        jnp.asarray(obs["obs_valid"]), FX, FY, CX, CY,
    )
    p1, x1, c1, z1 = ba.bundle_adjust(*args, n_iters=8)

    mesh = sharded_ba.make_mesh(8)
    p2, x2, c2, z2 = sharded_ba.sharded_bundle_adjust(mesh, *args, n_iters=8)

    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=5e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=5e-3)
    # distributed run converges to the same quality (exclude padding)
    assert reproj_rmse(p2, x2, {k: v[:orig_o] for k, v in obs.items()}) < 0.6


def test_sharded_improves_solution():
    poses_gt, pts_gt, poses_n, pts_n, obs = synth_ba(seed=6)
    obs = _pad_obs(obs, 8)
    free = np.ones(len(poses_gt), bool)
    free[0] = False
    mesh = sharded_ba.make_mesh(8)
    p2, x2, c2, z2 = sharded_ba.sharded_bundle_adjust(
        mesh,
        jnp.asarray(poses_n), jnp.asarray(pts_n), jnp.asarray(free),
        jnp.asarray(obs["obs_kf"]), jnp.asarray(obs["obs_pt"]),
        jnp.asarray(obs["obs_uv"]), jnp.asarray(obs["obs_w"]),
        jnp.asarray(obs["obs_valid"]), FX, FY, CX, CY, n_iters=15,
    )
    assert pose_error_scale_aligned(p2, poses_gt) < 0.01
