"""Point-sharded distributed BA: maps too large to replicate per device.

The observation-sharded layout (parallel/sharded_ba.py) replicates the
whole point array on every device — fine for local BA, wasteful for a
city-scale global map. Here the POINT blocks are partitioned over the mesh
("pt" axis) and every observation is placed on the device that owns its
point, so:

  - point Hessian blocks (Hpp), gradients (bp) and Y^T products are
    complete locally — zero communication;
  - only the camera-side reductions (Hcc, bc, Y products: O(K*36) floats)
    cross the mesh via psum over ICI — independent of both observation
    count AND map size.

This is the Schur-complement analogue of tensor-parallel sharding: the
big state (points) is partitioned, the small state (cameras) is
replicated-and-reduced. The reference has no counterpart (its global BA is
one g2o solve on one thread, reference src/Optimizer.cc:61-243; SURVEY 2.7).

Host-side `partition_by_point` reorders the COO observation arrays into
per-device blocks (contiguous point ranges), remapping point ids to local
indices; `unpartition` maps per-observation outputs back.
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
    return Mesh(np.asarray(devices), ("pt",))


def partition_by_point(pts, obs_kf, obs_pt, obs_uv, obs_w, obs_valid, n_dev: int):
    """Reorder observations into per-device blocks by point ownership.

    Points are block-partitioned: device d owns global points
    [d*chunk, (d+1)*chunk). Returns (pts_padded, obs dict with per-device
    blocks of equal length, perm) where obs_pt holds LOCAL point indices
    and `perm` maps packed order -> original order (for unpartition).
    """
    p = len(pts)
    chunk = -(-p // n_dev)
    pts_pad = np.zeros((chunk * n_dev, 3), np.float32)
    pts_pad[:p] = pts

    owner = np.asarray(obs_pt) // chunk
    order = np.argsort(owner, kind="stable")
    counts = np.bincount(owner, minlength=n_dev)
    per_dev = int(counts.max()) if len(counts) else 1
    # round up so every device block has identical length
    o_kf = np.zeros(per_dev * n_dev, np.int32)
    o_pt = np.zeros(per_dev * n_dev, np.int32)
    o_uv = np.zeros((per_dev * n_dev, 2), np.float32)
    o_w = np.zeros(per_dev * n_dev, np.float32)
    o_val = np.zeros(per_dev * n_dev, bool)
    perm = np.full(per_dev * n_dev, -1, np.int64)
    start = 0
    for d in range(n_dev):
        idx = order[start : start + counts[d]]
        start += counts[d]
        base = d * per_dev
        n = len(idx)
        o_kf[base : base + n] = obs_kf[idx]
        o_pt[base : base + n] = obs_pt[idx] - d * chunk  # local index
        o_uv[base : base + n] = obs_uv[idx]
        o_w[base : base + n] = obs_w[idx]
        o_val[base : base + n] = obs_valid[idx]
        perm[base : base + n] = idx
    return pts_pad, dict(
        obs_kf=o_kf, obs_pt=o_pt, obs_uv=o_uv, obs_w=o_w, obs_valid=o_val
    ), perm


def unpartition(values, perm, n_orig: int, fill=np.inf):
    """Map packed per-device outputs back to original observation order."""
    out = np.full((n_orig,) + values.shape[1:], fill, values.dtype)
    ok = perm >= 0
    out[perm[ok]] = values[ok]
    return out


def point_sharded_bundle_adjust(
    mesh: Mesh,
    poses, pts_pad, kf_free, obs,
    fx, fy, cx, cy,
    n_iters: int = 10, n_cg: int = 25, use_huber: bool = True,
):
    """BA with points + observations sharded over mesh axis "pt".

    `pts_pad` and `obs` must come from partition_by_point with
    n_dev == mesh size. Returns (poses, pts_pad, chi2_packed, z_packed) with
    point/observation outputs in the sharded layout.
    """
    n_dev = mesh.shape["pt"]
    assert pts_pad.shape[0] % n_dev == 0
    assert obs["obs_kf"].shape[0] % n_dev == 0

    impl = partial(
        ba._bundle_adjust_impl,
        n_iters=n_iters, n_cg=n_cg, use_huber=use_huber,
        axis_name="pt", points_sharded=True,
    )

    in_specs = (
        P(),        # poses replicated
        P("pt"),    # points sharded
        P(),        # kf_free replicated
        P("pt"), P("pt"), P("pt"), P("pt"), P("pt"),  # obs arrays
        P(), P(), P(), P(),
    )
    fn = shard_map(
        impl,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P("pt"), P("pt"), P("pt")),
        check_rep=False,
    )
    args = (
        np.asarray(poses, np.float32), np.asarray(pts_pad, np.float32),
        np.asarray(kf_free), np.asarray(obs["obs_kf"]),
        np.asarray(obs["obs_pt"]), np.asarray(obs["obs_uv"], np.float32),
        np.asarray(obs["obs_w"], np.float32), np.asarray(obs["obs_valid"]),
        np.asarray(fx, np.float32), np.asarray(fy, np.float32),
        np.asarray(cx, np.float32), np.asarray(cy, np.float32),
    )
    # Build GLOBAL arrays explicitly (make_array_from_callback slices each
    # process's full host copy): required for multi-process (multi-host)
    # meshes, where jit cannot implicitly reshard process-local arrays;
    # identical behavior on a single process.
    global_args = tuple(
        _put_global(mesh, spec, a) for spec, a in zip(in_specs, args)
    )
    return jax.jit(fn)(*global_args)


def _put_global(mesh: Mesh, spec, x: np.ndarray):
    """Host numpy (full copy on every process) -> global jax.Array with
    NamedSharding(mesh, spec)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def global_ba_point_sharded(
    poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
    fx, fy, cx, cy, mesh: Mesh | None = None, n_iters: int = 10, n_cg: int = 25,
):
    """Convenience wrapper: partition, solve, unpartition. Global-map BA
    entry point for multi-device runs."""
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.shape["pt"]
    pts_pad, obs, perm = partition_by_point(
        np.asarray(pts), np.asarray(obs_kf), np.asarray(obs_pt),
        np.asarray(obs_uv), np.asarray(obs_w), np.asarray(obs_valid), n_dev,
    )
    poses2, pts2, chi2, z = point_sharded_bundle_adjust(
        mesh, poses, pts_pad, kf_free, obs, fx, fy, cx, cy,
        n_iters=n_iters, n_cg=n_cg,
    )
    n_orig = len(np.asarray(obs_kf))
    chi2_out = unpartition(np.asarray(chi2), perm, n_orig, fill=np.inf)
    z_out = unpartition(np.asarray(z), perm, n_orig, fill=0.0)
    return np.asarray(poses2), np.asarray(pts2)[: len(np.asarray(pts))], chi2_out, z_out
