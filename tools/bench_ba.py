"""Bundle-adjustment throughput benchmark on the current JAX backend.

Builds synthetic BA problems at local-BA and global-BA scale (noisy poses /
points / observations with a known ground truth), runs the single-chip LM
Schur solver (`ops/ba.py:bundle_adjust`), and reports wall time, time per LM
iteration, and observation throughput. With --mesh N it also times the
point-sharded distributed layout on an N-device mesh.

Usage:
  PYTHONPATH=. python tools/bench_ba.py                # real TPU chip
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/bench_ba.py --cpu --mesh 8            # virtual CPU mesh
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def make_problem(k: int, p: int, o: int, seed: int = 0):
    """Synthetic forward-motion scene with reprojection-consistent obs."""
    rng = np.random.default_rng(seed)
    poses = np.tile(np.eye(4, dtype=np.float32), (k, 1, 1))
    for i in range(k):
        poses[i, 0, 3] = 0.05 * i
        poses[i, 1, 3] = 0.02 * np.sin(0.3 * i)
    pts = rng.uniform([-2, -2, 4], [2, 2, 12], (p, 3)).astype(np.float32)
    obs_kf = rng.integers(0, k, o).astype(np.int32)
    obs_pt = rng.integers(0, p, o).astype(np.int32)
    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    pc = (
        np.einsum("oij,oj->oi", poses[obs_kf][:, :3, :3], pts[obs_pt])
        + poses[obs_kf][:, :3, 3]
    )
    uv = np.stack([fx * pc[:, 0] / pc[:, 2] + cx, fy * pc[:, 1] / pc[:, 2] + cy], -1)
    uv += rng.normal(0, 0.5, uv.shape)  # 0.5 px noise
    # perturb the state the solver starts from
    poses_n = poses.copy()
    poses_n[1:, :3, 3] += rng.normal(0, 0.02, (k - 1, 3))
    pts_n = pts + rng.normal(0, 0.05, pts.shape)
    free = np.ones(k, bool)
    free[0] = False
    w = np.ones(o, np.float32)
    valid = np.ones(o, bool)
    return (
        poses_n.astype(np.float32), pts_n.astype(np.float32), free,
        obs_kf, obs_pt, uv.astype(np.float32), w, valid, fx, fy, cx, cy,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mesh", type=int, default=0)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from anyfeature_vslam_tpu.ops import ba

    print(f"backend: {jax.default_backend()}  devices: {len(jax.devices())}", flush=True)

    # (label, K cams, P points, O observations) — local-BA and global-BA scale
    sizes = [
        ("local_ba", 16, 4096, 16384),
        ("global_ba", 128, 32768, 262144),
    ]
    for label, k, p, o in sizes:
        prob = make_problem(k, p, o)
        prob_j = [jnp.asarray(x) if isinstance(x, np.ndarray) else x for x in prob]
        fn = jax.jit(lambda *a: ba.bundle_adjust(*a, n_iters=args.iters, n_cg=25))
        out = jax.block_until_ready(fn(*prob_j))  # compile
        t0 = time.perf_counter()
        n_rounds = 3
        for _ in range(n_rounds):
            out = jax.block_until_ready(fn(*prob_j))
        dt = (time.perf_counter() - t0) / n_rounds
        chi2 = np.asarray(out[2])
        mean_chi2 = float(np.nanmean(np.where(np.isfinite(chi2), chi2, np.nan)))
        print(
            f"{label}: K={k} P={p} O={o}  {dt*1e3:.1f} ms "
            f"({dt/args.iters*1e3:.2f} ms/LM-iter, "
            f"{o*args.iters/dt/1e6:.1f} M obs-iters/s)  mean chi2={mean_chi2:.3f}",
            flush=True,
        )

    if args.mesh:
        from anyfeature_vslam_tpu.parallel import point_sharded_ba

        label, k, p, o = sizes[-1]
        prob = make_problem(k, p, o)
        for n_dev in [d for d in (1, 2, 4, 8) if d <= args.mesh]:
            mesh = point_sharded_ba.make_mesh(devices=jax.devices()[:n_dev])
            t0 = time.perf_counter()
            out = point_sharded_ba.global_ba_point_sharded(
                *prob[:8], *prob[8:], mesh=mesh, n_iters=args.iters, n_cg=25
            )
            np.asarray(out[0])
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = point_sharded_ba.global_ba_point_sharded(
                *prob[:8], *prob[8:], mesh=mesh, n_iters=args.iters, n_cg=25
            )
            np.asarray(out[0])
            dt = time.perf_counter() - t0
            print(
                f"point_sharded global_ba on {n_dev} devices: {dt*1e3:.1f} ms "
                f"(first call incl. partition+compile {warm*1e3:.0f} ms)",
                flush=True,
            )


if __name__ == "__main__":
    main()
