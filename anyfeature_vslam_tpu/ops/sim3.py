"""Batched Sim3 RANSAC via Horn's closed-form method (loop closing).

Replaces the reference Sim3Solver (reference src/Sim3Solver.cc:38-325):
3-point RANSAC over matched map-point pairs between two keyframes, the
absolute orientation solved in closed form (Horn 1987: quaternion from the
largest eigenvector of the 4x4 N matrix built from the cross-covariance),
scale free for monocular (reference :284-303), inliers checked by MUTUAL
reprojection error < 9.21 * sigma^2 (chi2 2dof 99%, reference :84-86).

All RANSAC hypotheses are one batched eigh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

CHI2_INLIER = 9.21
MIN_SET = 3


def horn_sim3(a, b, w, fix_scale: bool = False):
    """Closed-form similarity: b ~= s R a + t.

    a, b: (..., N, 3); w: (..., N) weights.
    Returns (r (..., 3, 3), t (..., 3), s (...,)).
    """
    wsum = jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-9, None)
    ca = jnp.sum(a * w[..., None], axis=-2) / wsum
    cb = jnp.sum(b * w[..., None], axis=-2) / wsum
    a0 = a - ca[..., None, :]
    b0 = b - cb[..., None, :]
    m = jnp.einsum("...ni,...nj->...ij", a0 * w[..., None], b0)  # sum a0 b0^T

    sxx, sxy, sxz = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    syx, syy, syz = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    szx, szy, szz = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    n11 = sxx + syy + szz
    n_mat = jnp.stack(
        [
            jnp.stack([n11, syz - szy, szx - sxz, sxy - syx], axis=-1),
            jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], axis=-1),
            jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], axis=-1),
            jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], axis=-1),
        ],
        axis=-2,
    )
    _, evecs = jnp.linalg.eigh(n_mat)
    q = evecs[..., :, -1]  # largest eigenvalue -> (w, x, y, z)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)], axis=-1),
            jnp.stack([2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)], axis=-1),
            jnp.stack([2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)], axis=-1),
        ],
        axis=-2,
    )
    # scale (Horn's symmetric-free version, reference Sim3Solver.cc:284-303):
    # s = sum(b0 . R a0) / sum(|a0|^2)
    ra = jnp.einsum("...ij,...nj->...ni", r, a0)
    num = jnp.sum(jnp.sum(b0 * ra, axis=-1) * w, axis=-1)
    den = jnp.clip(jnp.sum(jnp.sum(a0 * a0, axis=-1) * w, axis=-1), 1e-12, None)
    s = jnp.where(fix_scale, jnp.ones_like(num), num / den)
    t = cb - s[..., None] * jnp.einsum("...ij,...j->...i", r, ca)
    return r, t, s


def _project(pc, fx, fy, cx, cy):
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return jnp.stack(
        [fx * pc[..., 0] / zs + cx, fy * pc[..., 1] / zs + cy], axis=-1
    ), z


@partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def sim3_ransac(
    pc1, pc2, uv1, uv2, sigma2_1, sigma2_2, valid,
    fx, fy, cx, cy, seed, n_hyp: int = 200, fix_scale: bool = False,
):
    """Sim3 between two keyframes from matched map points.

    Args:
      pc1, pc2: (N, 3) matched points in CAMERA coordinates of KF1 / KF2
        (the reference transforms map points into each camera frame,
        src/Sim3Solver.cc:60-75).
      uv1, uv2: (N, 2) their observed keypoints in each image.
      sigma2_*: (N,) keypoint sigma^2 for the chi2 gates.
      valid: (N,) bool.

    Returns dict(r, t, s, inliers, n_inliers): Sim3 S12 mapping KF2-camera
    coords into KF1-camera coords (pc1 ~= s R pc2 + t).
    """
    n = pc1.shape[0]
    key = jax.random.PRNGKey(seed)
    u_rand = jax.random.uniform(key, (n_hyp, n))
    u_rand = jnp.where(valid[None, :], u_rand, -1.0)
    _, sets = jax.lax.top_k(u_rand, MIN_SET)

    w3 = jnp.ones(sets.shape, jnp.float32)
    r_h, t_h, s_h = horn_sim3(pc2[sets], pc1[sets], w3, fix_scale=fix_scale)

    # mutual reprojection: project transformed pc2 into image 1 and the
    # inverse-transformed pc1 into image 2
    p2in1 = s_h[:, None, None] * jnp.einsum("hij,nj->hni", r_h, pc2) + t_h[:, None, :]
    uv_2in1, z1 = _project(p2in1, fx, fy, cx, cy)
    r_inv = jnp.swapaxes(r_h, -1, -2)
    s_inv = 1.0 / jnp.clip(s_h, 1e-12, None)
    t_inv = -s_inv[:, None] * jnp.einsum("hij,hj->hi", r_inv, t_h)
    p1in2 = s_inv[:, None, None] * jnp.einsum("hij,nj->hni", r_inv, pc1) + t_inv[:, None, :]
    uv_1in2, z2 = _project(p1in2, fx, fy, cx, cy)

    e1 = jnp.sum((uv_2in1 - uv1[None]) ** 2, axis=-1)
    e2 = jnp.sum((uv_1in2 - uv2[None]) ** 2, axis=-1)
    inl = (
        (e1 < CHI2_INLIER * sigma2_1[None])
        & (e2 < CHI2_INLIER * sigma2_2[None])
        & (z1 > 0) & (z2 > 0)
        & valid[None]
    )
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)

    # refit on all inliers of the winner
    w_all = inl[best].astype(jnp.float32)
    r_f, t_f, s_f = horn_sim3(pc2, pc1, w_all, fix_scale=fix_scale)
    p2in1 = s_f * (pc2 @ r_f.T) + t_f
    uv_a, z1f = _project(p2in1, fx, fy, cx, cy)
    p1in2 = (1.0 / jnp.clip(s_f, 1e-12, None)) * ((pc1 - t_f) @ r_f)
    uv_b, z2f = _project(p1in2, fx, fy, cx, cy)
    e1f = jnp.sum((uv_a - uv1) ** 2, axis=-1)
    e2f = jnp.sum((uv_b - uv2) ** 2, axis=-1)
    inl_f = (
        (e1f < CHI2_INLIER * sigma2_1)
        & (e2f < CHI2_INLIER * sigma2_2)
        & (z1f > 0) & (z2f > 0) & valid
    )
    better = jnp.sum(inl_f.astype(jnp.int32)) >= counts[best]
    return dict(
        r=jnp.where(better, r_f, r_h[best]),
        t=jnp.where(better, t_f, t_h[best]),
        s=jnp.where(better, s_f, s_h[best]),
        inliers=jnp.where(better, inl_f, inl[best]),
        n_inliers=jnp.maximum(counts[best], jnp.sum(inl_f.astype(jnp.int32))),
    )


@partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def sim3_optimize(
    r, t, s, pc1, pc2, uv1, uv2, inv_s2_1, inv_s2_2, valid,
    fx, fy, cx, cy, th2: float = 10.0, n_iters: int = 10,
    fix_scale: bool = False,
):
    """LM refinement of a Sim3 over matched point pairs (the reference's
    Optimizer::OptimizeSim3, src/Optimizer.cc:1033-1226): one Sim3 vertex,
    forward edges project(S12 pc2) - uv1 and inverse edges
    project(S12^-1 pc1) - uv2, Huber delta = sqrt(th2) (th2 = 10 at the
    loop-closing call site, LoopClosing.cc:352), both-direction chi2
    inlier classification.

    Returns dict(r, t, s, inliers, n_inliers).
    """
    from . import se3

    r = jnp.asarray(r, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    log_s0 = jnp.log(jnp.clip(jnp.asarray(s, jnp.float32), 1e-12, None))
    w1_full = jnp.where(valid, inv_s2_1, 0.0)
    w2_full = jnp.where(valid, inv_s2_2, 0.0)
    w1, w2 = w1_full, w2_full
    delta_h = jnp.sqrt(th2)

    def residuals(xi, r0, t0, ls0):
        dr, dt, ds = se3.sim3_exp7(xi)
        rr = dr @ r0
        tt = ds * (dr @ t0) + dt
        ss = ds * jnp.exp(ls0)
        if fix_scale:
            ss = jnp.exp(ls0)
        p1h, z1 = _project(ss * pc2 @ rr.T + tt, fx, fy, cx, cy)
        inv = (pc1 - tt) @ rr / ss
        p2h, z2 = _project(inv, fx, fy, cx, cy)
        e1 = p1h - uv1
        e2 = p2h - uv2
        return e1, e2

    def chi2_of(e1, e2):
        return jnp.sum(e1 * e1, -1) * w1, jnp.sum(e2 * e2, -1) * w2

    def huber_w(chi2):
        nrm = jnp.sqrt(jnp.clip(chi2, 1e-12, None))
        return jnp.where(nrm <= delta_h, 1.0, delta_h / nrm)

    def lm_step(carry, _):
        r0, t0, ls0, lam, cost = carry
        zero = jnp.zeros(7, jnp.float32)
        e1, e2 = residuals(zero, r0, t0, ls0)
        j1, j2 = jax.jacfwd(residuals)(zero, r0, t0, ls0)  # (N,2,7) each
        c1, c2 = chi2_of(e1, e2)
        rw1 = w1 * huber_w(c1)
        rw2 = w2 * huber_w(c2)
        h = (
            jnp.einsum("nij,n,nik->jk", j1, rw1, j1)
            + jnp.einsum("nij,n,nik->jk", j2, rw2, j2)
        )
        g = -(
            jnp.einsum("nij,n,ni->j", j1, rw1, e1)
            + jnp.einsum("nij,n,ni->j", j2, rw2, e2)
        )
        h = h + (lam + 1e-8) * jnp.eye(7) * (1.0 + jnp.diag(h).mean())
        dx = jnp.linalg.solve(h, g)
        dr, dt, ds = se3.sim3_exp7(dx)
        r1 = dr @ r0
        t1 = ds * (dr @ t0) + dt
        ls1 = ls0 + jnp.where(fix_scale, 0.0, jnp.log(ds))
        if fix_scale:
            t1 = dr @ t0 + dt
        e1n, e2n = residuals(jnp.zeros(7), r1, t1, ls1)
        c1n, c2n = chi2_of(e1n, e2n)
        new_cost = jnp.sum(jnp.minimum(c1n, th2 * 4) + jnp.minimum(c2n, th2 * 4))
        ok = jnp.isfinite(new_cost) & (new_cost < cost) & jnp.all(jnp.isfinite(dx))
        r0 = jnp.where(ok, r1, r0)
        t0 = jnp.where(ok, t1, t0)
        ls0 = jnp.where(ok, ls1, ls0)
        cost = jnp.where(ok, new_cost, cost)
        lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 5.0), 1e-10, 1e6)
        return (r0, t0, ls0, lam, cost), None

    e1, e2 = residuals(jnp.zeros(7), r, t, log_s0)
    c1, c2 = chi2_of(e1, e2)
    cost0 = jnp.sum(jnp.minimum(c1, th2 * 4) + jnp.minimum(c2, th2 * 4))
    (r, t, log_s, _, _), _ = jax.lax.scan(
        lm_step, (r, t, log_s0, jnp.float32(1e-4), cost0), None, length=n_iters
    )
    # outlier pass + re-optimization on survivors (reference removes bad
    # edges after the first 5 iterations and optimizes again,
    # src/Optimizer.cc:1170-1202)
    e1, e2 = residuals(jnp.zeros(7), r, t, log_s)
    c1, c2 = chi2_of(e1, e2)
    keep = valid & (c1 <= th2) & (c2 <= th2)
    w1 = jnp.where(keep, w1, 0.0)
    w2 = jnp.where(keep, w2, 0.0)
    c1, c2 = chi2_of(e1, e2)
    cost1 = jnp.sum(jnp.minimum(c1, th2 * 4) + jnp.minimum(c2, th2 * 4))
    del e1, e2
    (r, t, log_s, _, _), _ = jax.lax.scan(
        lm_step, (r, t, log_s, jnp.float32(1e-4), cost1), None, length=n_iters
    )
    e1, e2 = residuals(jnp.zeros(7), r, t, log_s)
    # classify against the ORIGINAL weights (w1/w2 were zeroed for the
    # second pass, which would score removed edges as chi2 = 0)
    c1 = jnp.sum(e1 * e1, -1) * w1_full
    c2 = jnp.sum(e2 * e2, -1) * w2_full
    inl = valid & (c1 <= th2) & (c2 <= th2)
    return dict(
        r=r, t=t, s=jnp.exp(log_s), inliers=inl,
        n_inliers=jnp.sum(inl.astype(jnp.int32)),
    )
