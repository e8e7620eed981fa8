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
