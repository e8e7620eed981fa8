"""Batched RANSAC-EPnP: camera pose from 3D-2D matches (relocalization).

Replaces the reference PnPsolver (reference src/PnPsolver.cc:165-290, EPnP
after Lepetit et al. 2009 wrapped in RANSAC; minimal set 4, per-point error
threshold th2 * sigma^2, max 300 iterations). The reference iterates RANSAC
in 5-iteration slices round-robin across candidate keyframes; here ALL
hypotheses run as one batch:

  - control points: centroid + PCA axes of the subset
  - barycentric coordinates via a 4x4 solve
  - 12-dim nullspace of M^T M (batched eigh)
  - betas: N=1 closed form + Gauss-Newton refinement over beta in R^4 on the
    6 pairwise control-point distance residuals (the paper's relinearization)
  - R, t by Procrustes (Horn/SVD) between world and camera control frames
  - winner by inlier count, then a least-squares re-solve on all inliers

Pose refinement on inliers is delegated to ops.pose_opt (as the reference
follows PnP with PoseOptimization, src/Tracking.cc:1247).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

RANSAC_TH2 = 5.991  # reference Tracking.h:322-328 (th2), scaled by sigma^2
MIN_SET = 4


def _control_points(pts, w):
    """Weighted centroid + PCA control points. pts (..., N, 3), w (..., N)."""
    wsum = jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-9, None)
    c0 = jnp.sum(pts * w[..., None], axis=-2) / wsum
    a = (pts - c0[..., None, :]) * jnp.sqrt(w)[..., None]
    cov = jnp.einsum("...ni,...nj->...ij", a, a) / wsum[..., None]
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    s = jnp.sqrt(jnp.clip(evals, 1e-12, None))
    cpts = c0[..., None, :] + s[..., :, None] * jnp.swapaxes(evecs, -1, -2)
    return jnp.concatenate([c0[..., None, :], cpts], axis=-2)  # (..., 4, 3)


def _barycentric(pts, cw):
    """alphas (..., N, 4) s.t. pts = alphas @ cw, sum(alphas) = 1."""
    ones_c = jnp.ones(cw.shape[:-2] + (4, 1), cw.dtype)
    m = jnp.concatenate([jnp.swapaxes(cw, -1, -2), jnp.swapaxes(ones_c, -1, -2)], axis=-2)
    # m (..., 4, 4): rows = [x; y; z; 1] of control points as columns
    ones_p = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    rhs = jnp.concatenate([pts, ones_p], axis=-1)  # (..., N, 4)
    m_inv = jnp.linalg.inv(m)
    return jnp.einsum("...ij,...nj->...ni", m_inv, rhs)


def _build_mtm(alphas, uv, w, fx, fy, cx, cy):
    """M^T M (..., 12, 12) from the 2N x 12 EPnP system, weighted by w."""
    u = uv[..., 0]
    v = uv[..., 1]
    # row_u for control j: [a_j fx, 0, a_j (cx - u)]
    # row_v for control j: [0, a_j fy, a_j (cy - v)]
    zeros = jnp.zeros_like(alphas)
    ru = jnp.stack(
        [alphas * fx, zeros, alphas * (cx - u)[..., None]], axis=-1
    )  # (..., N, 4, 3)
    rv = jnp.stack(
        [zeros, alphas * fy, alphas * (cy - v)[..., None]], axis=-1
    )
    ru = ru.reshape(ru.shape[:-2] + (12,))
    rv = rv.reshape(rv.shape[:-2] + (12,))
    wn = w[..., None]
    return jnp.einsum("...ni,...nj->...ij", ru * wn, ru) + jnp.einsum(
        "...ni,...nj->...ij", rv * wn, rv
    )


_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _pair_dists(c):
    """(..., 4, 3) -> (..., 6) pairwise distances squared... returns diffs."""
    return jnp.stack([c[..., i, :] - c[..., j, :] for i, j in _PAIRS], axis=-2)


def _betas_gauss_newton(v_kernel, dw2, n_gn: int = 10):
    """Refine betas in R^4: sum_k beta_k v_k should reproduce the world
    control-point geometry. v_kernel (..., 4, 4, 3) [kernel vec, ctrl pt,
    xyz], dw2 (..., 6) squared world pairwise distances."""
    vdiff = jnp.stack(
        [v_kernel[..., :, i, :] - v_kernel[..., :, j, :] for i, j in _PAIRS], axis=-3
    )  # (..., 6, 4, 3)

    # init: N=1 closed form on the last (smallest-eigenvalue) kernel vector
    v1 = vdiff[..., 0, :]  # (..., 6, 3) kernel index 0
    dc2 = jnp.sum(v1 * v1, axis=-1)
    num = jnp.sum(jnp.sqrt(jnp.clip(dc2, 1e-12, None)) * jnp.sqrt(jnp.clip(dw2, 1e-12, None)), axis=-1)
    den = jnp.clip(jnp.sum(dc2, axis=-1), 1e-12, None)
    b0 = num / den
    betas = jnp.stack(
        [b0, jnp.zeros_like(b0), jnp.zeros_like(b0), jnp.zeros_like(b0)], axis=-1
    )

    def gn_step(betas, _):
        # cc_diff (..., 6, 3) = sum_k beta_k vdiff[..., k, :]
        cc_diff = jnp.einsum("...k,...pkx->...px", betas, vdiff)
        f = jnp.sum(cc_diff * cc_diff, axis=-1) - dw2  # (..., 6)
        jac = 2.0 * jnp.einsum("...px,...pkx->...pk", cc_diff, vdiff)  # (..., 6, 4)
        jtj = jnp.einsum("...pk,...pl->...kl", jac, jac)
        jtf = jnp.einsum("...pk,...p->...k", jac, f)
        jtj = jtj + 1e-8 * jnp.eye(4)
        delta = jnp.linalg.solve(jtj, jtf[..., None])[..., 0]
        return betas - delta, None

    betas, _ = jax.lax.scan(gn_step, betas, None, length=n_gn)
    return betas


def _procrustes(a, b, w):
    """Rigid transform b ~= R a + t. a, b (..., N, 3), w (..., N) weights."""
    wsum = jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-9, None)
    ca = jnp.sum(a * w[..., None], axis=-2) / wsum
    cb = jnp.sum(b * w[..., None], axis=-2) / wsum
    a0 = a - ca[..., None, :]
    b0 = b - cb[..., None, :]
    h = jnp.einsum("...ni,...nj->...ij", a0 * w[..., None], b0)
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.linalg.det(jnp.swapaxes(vt, -1, -2) @ jnp.swapaxes(u, -1, -2))
    s = jnp.ones(d.shape + (3,), h.dtype).at[..., 2].set(d)
    r = jnp.einsum("...ji,...j,...kj->...ik", vt, s, u)  # V diag(s) U^T
    t = cb - jnp.einsum("...ij,...j->...i", r, ca)
    return r, t


def _epnp_solve(pts, uv, w, fx, fy, cx, cy):
    """Weighted EPnP: returns (r, t) with leading batch dims."""
    cw = _control_points(pts, w)
    alphas = _barycentric(pts, cw)
    mtm = _build_mtm(alphas, uv, w, fx, fy, cx, cy)
    _, evecs = jnp.linalg.eigh(mtm)
    # 4 smallest eigenvectors -> candidate kernel; reshape to control points
    vk = jnp.swapaxes(evecs[..., :, :4], -1, -2)  # (..., 4, 12)
    v_ctrl = vk.reshape(vk.shape[:-1] + (4, 3))  # (..., kernel, ctrl, xyz)

    dw = _pair_dists(cw)
    dw2 = jnp.sum(dw * dw, axis=-1)
    betas = _betas_gauss_newton(v_ctrl, dw2)
    cc = jnp.einsum("...k,...kcx->...cx", betas, v_ctrl)  # (..., 4, 3)

    # camera points from barycentric combo
    pc = jnp.einsum("...nc,...cx->...nx", alphas, cc)
    # depth sign: majority of weighted z must be positive
    zsign = jnp.sign(jnp.sum(pc[..., 2] * w, axis=-1, keepdims=True))
    zsign = jnp.where(zsign == 0, 1.0, zsign)
    pc = pc * zsign[..., None]
    return _procrustes(pts, pc, w)


def _reproj_err2(r, t, pts, uv, fx, fy, cx, cy):
    pc = jnp.einsum("...ij,...nj->...ni", r, pts) + t[..., None, :]
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * pc[..., 0] / zs + cx
    v = fy * pc[..., 1] / zs + cy
    e2 = (u - uv[..., 0]) ** 2 + (v - uv[..., 1]) ** 2
    return jnp.where(z > 0, e2, jnp.inf)


@partial(jax.jit, static_argnames=("n_hyp",))
def pnp_ransac(pts, uv, sigma2, valid, fx, fy, cx, cy, seed, n_hyp: int = 300):
    """RANSAC-EPnP over all hypotheses at once.

    Args:
      pts: (N, 3) world positions of candidate matches.
      uv: (N, 2) undistorted observations.
      sigma2: (N,) keypoint sigma^2 (error gate is RANSAC_TH2 * sigma2).
      valid: (N,) bool.
      seed: int32.

    Returns dict(r (3,3), t (3,), inliers (N,), n_inliers, best_hyp_inliers).
    """
    n = pts.shape[0]
    key = jax.random.PRNGKey(seed)
    u_rand = jax.random.uniform(key, (n_hyp, n))
    u_rand = jnp.where(valid[None, :], u_rand, -1.0)
    _, sets = jax.lax.top_k(u_rand, MIN_SET)  # (H, 4)

    spts = pts[sets]  # (H, 4, 3)
    suv = uv[sets]
    w4 = jnp.ones(sets.shape, jnp.float32)
    r_h, t_h = _epnp_solve(spts, suv, w4, fx, fy, cx, cy)

    e2 = _reproj_err2(r_h, t_h, pts[None], uv[None], fx, fy, cx, cy)  # (H, N)
    inl = (e2 < RANSAC_TH2 * sigma2[None, :]) & valid[None, :]
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)

    # refine: EPnP on ALL inliers of the best hypothesis (reference Refine,
    # src/PnPsolver.cc:260-290)
    w_all = inl[best].astype(jnp.float32)
    r_f, t_f = _epnp_solve(pts, uv, w_all, fx, fy, cx, cy)
    e2_f = _reproj_err2(r_f, t_f, pts, uv, fx, fy, cx, cy)
    inl_f = (e2_f < RANSAC_TH2 * sigma2) & valid
    # keep refinement only if it does not lose inliers
    better = jnp.sum(inl_f.astype(jnp.int32)) >= counts[best]
    r_out = jnp.where(better, r_f, r_h[best])
    t_out = jnp.where(better, t_f, t_h[best])
    inl_out = jnp.where(better, inl_f, inl[best])
    return dict(
        r=r_out,
        t=t_out,
        inliers=inl_out,
        n_inliers=jnp.sum(inl_out.astype(jnp.int32)),
    )


# Batched relocalization: one program solves RANSAC-EPnP for ALL candidate
# keyframes at once (the reference interleaves PnPsolver::iterate(5) across
# candidates round-robin, src/Tracking.cc:1146-1309 + PnPsolver.cc:165-258;
# on TPU the whole interleaving collapses into a leading vmap axis).
pnp_ransac_many = jax.jit(
    jax.vmap(pnp_ransac, in_axes=(0, 0, 0, 0, None, None, None, None, None))
)
