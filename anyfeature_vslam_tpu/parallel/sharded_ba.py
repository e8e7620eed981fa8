"""Distributed bundle adjustment over a device mesh (shard_map + psum).

The reference has no distributed backend (SURVEY 2.7): its global BA is one
g2o solve on one CPU thread. Here the factor graph's OBSERVATIONS are
sharded across the mesh's "obs" axis; poses and points stay replicated.
Each device computes its shard's contributions to the camera blocks, point
blocks and matrix-free Schur products; `psum` over ICI reduces them
(ops/ba._bundle_adjust_impl takes an axis_name and inserts the collectives).

This is the data-parallel decomposition of BA: per-iteration communication
is O(K*36 + P*9) floats (camera + point blocks), independent of the
observation count, so it scales with the dominant cost (residual/Jacobian
evaluation and their reductions) spread across devices. Point-sharded
reduce_scatter layouts (for maps too large to replicate) build on the same
impl and land next.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from anyfeature_vslam_tpu.ops import ba


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), ("obs",))


def sharded_bundle_adjust(
    mesh: Mesh,
    poses, pts, kf_free,
    obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
    fx, fy, cx, cy,
    n_iters: int = 10, n_cg: int = 25, use_huber: bool = True,
):
    """BA with observations sharded over mesh axis "obs".

    Observation arrays must have leading dim divisible by the mesh size
    (pad with obs_valid=False). Returns the same outputs as
    ops.ba.bundle_adjust with per-observation outputs sharded.
    """
    n_dev = mesh.shape["obs"]
    o = obs_kf.shape[0]
    if o % n_dev != 0:
        raise ValueError(f"obs count {o} not divisible by mesh size {n_dev}")

    impl = partial(
        ba._bundle_adjust_impl,
        n_iters=n_iters, n_cg=n_cg, use_huber=use_huber, axis_name="obs",
    )

    fn = shard_map(
        lambda poses, pts, kf_free, okf, opt, ouv, ow, ovalid, fx, fy, cx, cy: impl(
            poses, pts, kf_free, okf, opt, ouv, ow, ovalid, fx, fy, cx, cy
        ),
        mesh=mesh,
        in_specs=(
            P(), P(), P(),            # poses, pts, free: replicated
            P("obs"), P("obs"), P("obs"), P("obs"), P("obs"),  # obs arrays
            P(), P(), P(), P(),       # intrinsics
        ),
        out_specs=(P(), P(), P("obs"), P("obs")),
        check_rep=False,
    )
    return jax.jit(fn)(
        poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
        jnp.asarray(fx, jnp.float32), jnp.asarray(fy, jnp.float32),
        jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
    )


def sharded_bundle_adjust_two_stage(
    mesh: Mesh,
    poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
    fx, fy, cx, cy,
    n_iters_a: int = 5, n_iters_b: int = 10, n_cg: int = 25,
):
    """Distributed version of ops.ba.bundle_adjust_two_stage: the
    reference's local-BA schedule (5 Huber its, outlier pass at
    chi2 > 5.991 / negative depth, 10 more its; src/Optimizer.cc:649-699)
    with each stage psum-reduced over the mesh."""
    poses, pts, chi2, z = sharded_bundle_adjust(
        mesh, poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
        fx, fy, cx, cy, n_iters=n_iters_a, n_cg=n_cg, use_huber=True,
    )
    obs_valid2 = obs_valid & ~ba.classify_outliers(chi2, z)
    poses, pts, chi2, z = sharded_bundle_adjust(
        mesh, poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid2,
        fx, fy, cx, cy, n_iters=n_iters_b, n_cg=n_cg, use_huber=False,
    )
    chi2_all = jnp.where(obs_valid, jnp.where(jnp.isinf(chi2), 1e9, chi2), jnp.inf)
    return poses, pts, chi2_all, z, obs_valid2
