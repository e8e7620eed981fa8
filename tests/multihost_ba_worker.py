"""Worker process for the multi-host (multi-process) point-sharded BA test.

Run as: python multihost_ba_worker.py <port> <process_id> <num_processes>

Each process owns 4 virtual CPU devices; jax.distributed stitches them into
one 8-device global mesh over DCN — the SURVEY 2.7 multi-host tier of the
distributed-BA north star, exercised exactly as jax.distributed would be
across real hosts. The worker solves the same synthetic BA problem (a)
single-device and (b) point-sharded over the GLOBAL multi-process mesh,
and asserts the optima agree.
"""

import os
import sys

port, proc_id, n_proc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=n_proc,
    process_id=proc_id,
)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_ba import synth_ba, FX, FY, CX, CY  # noqa: E402
from anyfeature_vslam_tpu.ops import ba  # noqa: E402
from anyfeature_vslam_tpu.parallel import point_sharded_ba  # noqa: E402


def main():
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 4 * n_proc, (n_global, n_proc)
    assert n_local == 4

    poses_gt, pts_gt, poses_n, pts_n, obs = synth_ba(seed=7)
    free = np.ones(len(poses_gt), bool)
    free[0] = False

    # single-device reference (identical on every process)
    p1, _, _, _ = ba.bundle_adjust(
        jnp.asarray(poses_n), jnp.asarray(pts_n), jnp.asarray(free),
        jnp.asarray(obs["obs_kf"]), jnp.asarray(obs["obs_pt"]),
        jnp.asarray(obs["obs_uv"]), jnp.asarray(obs["obs_w"]),
        jnp.asarray(obs["obs_valid"]), FX, FY, CX, CY, n_iters=8,
    )
    p1 = np.asarray(p1)

    # global mesh across both processes
    mesh = point_sharded_ba.make_mesh(devices=np.asarray(jax.devices()))
    pts_pad, obs_p, perm = point_sharded_ba.partition_by_point(
        np.asarray(pts_n), np.asarray(obs["obs_kf"]),
        np.asarray(obs["obs_pt"]), np.asarray(obs["obs_uv"]),
        np.asarray(obs["obs_w"]), np.asarray(obs["obs_valid"]), n_global,
    )
    poses2, pts2, chi2, z = point_sharded_ba.point_sharded_bundle_adjust(
        mesh, poses_n, pts_pad, free, obs_p, FX, FY, CX, CY, n_iters=8,
    )
    # poses are replicated: every process can read its local shard
    p2 = np.asarray(poses2.addressable_data(0))
    np.testing.assert_allclose(p1, p2, atol=5e-4)

    # sharded point output: check this process's local blocks against the
    # single-device optimum
    x1 = np.asarray(
        ba.bundle_adjust(
            jnp.asarray(poses_n), jnp.asarray(pts_n), jnp.asarray(free),
            jnp.asarray(obs["obs_kf"]), jnp.asarray(obs["obs_pt"]),
            jnp.asarray(obs["obs_uv"]), jnp.asarray(obs["obs_w"]),
            jnp.asarray(obs["obs_valid"]), FX, FY, CX, CY, n_iters=8,
        )[1]
    )
    x1_pad = np.zeros_like(pts_pad)
    x1_pad[: len(x1)] = x1
    for shard in pts2.addressable_shards:
        sl = shard.index[0]
        np.testing.assert_allclose(np.asarray(shard.data), x1_pad[sl], atol=5e-3)

    print(f"MULTIHOST_OK process={proc_id} devices={n_global}", flush=True)


if __name__ == "__main__":
    main()
