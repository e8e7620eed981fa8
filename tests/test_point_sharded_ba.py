"""Point-sharded distributed BA on the virtual 8-device CPU mesh: identical
math to single-chip (point blocks local, camera blocks psum-reduced)."""

import numpy as np
import jax
import jax.numpy as jnp

from anyfeature_vslam_tpu.ops import ba
from anyfeature_vslam_tpu.parallel import point_sharded_ba

from test_ba import synth_ba, FX, FY, CX, CY, reproj_rmse, pose_error_scale_aligned


def test_partition_roundtrip():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(37, 3)).astype(np.float32)
    o = 100
    obs_pt = rng.integers(0, 37, o).astype(np.int32)
    obs_kf = rng.integers(0, 5, o).astype(np.int32)
    obs_uv = rng.normal(size=(o, 2)).astype(np.float32)
    obs_w = np.ones(o, np.float32)
    obs_valid = np.ones(o, bool)
    pts_pad, obs, perm = point_sharded_ba.partition_by_point(
        pts, obs_kf, obs_pt, obs_uv, obs_w, obs_valid, 8
    )
    assert pts_pad.shape[0] % 8 == 0
    chunk = pts_pad.shape[0] // 8
    per_dev = len(obs["obs_kf"]) // 8
    # every valid packed obs references a local point of its device
    for d in range(8):
        blk = slice(d * per_dev, (d + 1) * per_dev)
        v = obs["obs_valid"][blk]
        local = obs["obs_pt"][blk][v]
        assert np.all((local >= 0) & (local < chunk))
        # global identity preserved through perm
        orig = perm[blk][v]
        np.testing.assert_array_equal(obs_pt[orig] - d * chunk, local)
    # unpartition restores original order
    vals = np.arange(len(obs["obs_kf"]), dtype=np.float32)
    back = point_sharded_ba.unpartition(vals, perm, o, fill=-1.0)
    assert np.all(back >= 0)


def test_point_sharded_matches_single_chip():
    assert len(jax.devices()) >= 8
    poses_gt, pts_gt, poses_n, pts_n, obs = synth_ba(seed=7)
    free = np.ones(len(poses_gt), bool)
    free[0] = False
    args = (
        jnp.asarray(poses_n), jnp.asarray(pts_n), jnp.asarray(free),
        jnp.asarray(obs["obs_kf"]), jnp.asarray(obs["obs_pt"]),
        jnp.asarray(obs["obs_uv"]), jnp.asarray(obs["obs_w"]),
        jnp.asarray(obs["obs_valid"]), FX, FY, CX, CY,
    )
    p1, x1, c1, z1 = ba.bundle_adjust(*args, n_iters=8)

    mesh = point_sharded_ba.make_mesh(8)
    p2, x2, c2, z2 = point_sharded_ba.global_ba_point_sharded(
        poses_n, pts_n, free,
        obs["obs_kf"], obs["obs_pt"], obs["obs_uv"], obs["obs_w"],
        obs["obs_valid"], FX, FY, CX, CY, mesh=mesh, n_iters=8,
    )
    np.testing.assert_allclose(np.asarray(p1), p2, atol=5e-4)
    np.testing.assert_allclose(np.asarray(x1), x2, atol=5e-3)
    valid = obs["obs_valid"]
    np.testing.assert_allclose(
        np.asarray(c1)[valid], c2[valid], rtol=2e-2, atol=5e-2
    )
    assert pose_error_scale_aligned(jnp.asarray(p2), poses_gt) < 0.05


def test_multiprocess_point_sharded_ba():
    """Multi-HOST tier (SURVEY 2.7): two OS processes, 4 virtual CPU
    devices each, stitched by jax.distributed into one 8-device global
    mesh; the point-sharded layout must reproduce the single-process
    optimum across the process boundary. This is the exact code path a
    multi-host TPU pod slice uses (ICI within a process's devices, DCN
    between processes)."""
    import socket
    import subprocess
    import sys as _sys
    import os as _os

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    here = _os.path.dirname(_os.path.abspath(__file__))
    worker = _os.path.join(here, "multihost_ba_worker.py")
    env = dict(_os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [_sys.executable, worker, str(port), str(i), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-2000:]
