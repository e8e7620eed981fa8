"""Monocular two-view initialization: batched H/F RANSAC + reconstruction.

Reference behavior (src/Initializer.cc:40-910): 200 RANSAC sets of 8
correspondences; homography (DLT, symmetric transfer chi2 score) and
fundamental (8-point, epipolar chi2 score) fitted and scored — the reference
races two std::threads, here BOTH models for ALL 200 hypotheses are one
batched eigh; model choice RH = SH/(SH+SF) > 0.40 picks H (reference
src/Initializer.cc:104-113); reconstruction tries 4 motions from E
(src/Initializer.cc DecomposeE) or the planar-homography motions (Faugeras
1988 — implemented here via the textbook SVD decomposition of Ma, Soatto,
Kosecka & Sastry, "An Invitation to 3-D Vision", Alg. 5.2, NOT a code port),
and CheckRT gates: cheirality, reprojection < 4 sigma^2, parallax
(src/Initializer.cc CheckRT).

Everything runs as one jitted static-shape program over fixed capacity N
matches; RANSAC uses jax.random with an explicit seed (the reference seeds
its RNG once for determinism, src/System.cc:79).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import triangulation

N_HYP = 200  # reference Tracking.cc:459 (Initializer(..., 200))
SET_SIZE = 8
CHI2_H = 5.991
CHI2_F = 3.841
SCORE_TH = 5.991
REPROJ_TH2 = 4.0  # * sigma^2 (sigma = 1 at init, reference Tracking.cc:459)
MIN_PARALLAX_DEG = 1.0
MIN_TRIANGULATED = 50
COS_PARALLAX_TH = 0.99998


def _normalize(uv, valid):
    """Mean / mean-abs-dev normalization (reference Initializer::Normalize)."""
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid[:, None], uv, 0.0), axis=0) / n
    dev = jnp.sum(jnp.where(valid[:, None], jnp.abs(uv - mean), 0.0), axis=0) / n
    s = 1.0 / jnp.clip(dev, 1e-6, None)
    uvn = (uv - mean) * s
    t = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    t = t.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    t = t.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return uvn, t


def _sample_sets(key, valid):
    """(N_HYP, SET_SIZE) indices of valid matches, sampled w/o replacement
    per hypothesis via random-key top-k."""
    n = valid.shape[0]
    u = jax.random.uniform(key, (N_HYP, n))
    u = jnp.where(valid[None, :], u, -1.0)
    _, idx = jax.lax.top_k(u, SET_SIZE)
    return idx


def _smallest_eigvec(a):
    """Batched smallest-eigenvalue eigenvector of symmetric (..., 9, 9)."""
    _, vecs = jnp.linalg.eigh(a)
    return vecs[..., :, 0]


def _fit_fundamental(x1, y1, x2, y2):
    """8-point rows -> F per hypothesis. Inputs (H, 8)."""
    ones = jnp.ones_like(x1)
    a = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (H, 8, 9)
    ata = jnp.einsum("hni,hnj->hij", a, a)
    f = _smallest_eigvec(ata).reshape(-1, 3, 3)
    # rank-2 enforcement
    u, s, vt = jnp.linalg.svd(f)
    s = s.at[:, 2].set(0.0)
    return u @ (s[..., None] * vt)


def _fit_homography(x1, y1, x2, y2):
    ones = jnp.ones_like(x1)
    zeros = jnp.zeros_like(x1)
    r1 = jnp.stack(
        [zeros, zeros, zeros, -x1, -y1, -ones, y2 * x1, y2 * y1, y2], axis=-1
    )
    r2 = jnp.stack(
        [x1, y1, ones, zeros, zeros, zeros, -x2 * x1, -x2 * y1, -x2], axis=-1
    )
    a = jnp.concatenate([r1, r2], axis=1)  # (H, 16, 9)
    ata = jnp.einsum("hni,hnj->hij", a, a)
    return _smallest_eigvec(ata).reshape(-1, 3, 3)


def _score_homography(h, h_inv, uv1, uv2, valid):
    """Symmetric transfer chi2 score (reference CheckHomography)."""
    ones = jnp.ones((uv1.shape[0], 1), jnp.float32)
    p1 = jnp.concatenate([uv1, ones], axis=-1)  # (N, 3)
    p2 = jnp.concatenate([uv2, ones], axis=-1)

    def transfer(mat, src, dst):
        q = src @ jnp.swapaxes(mat, -1, -2)  # (H, N, 3)
        w = q[..., 2]
        w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
        d = q[..., :2] / w[..., None] - dst[None, :, :2]
        return jnp.sum(d * d, axis=-1)

    chi2_21 = transfer(h, p1, p2)  # 1 -> 2
    chi2_12 = transfer(h_inv, p2, p1)
    in1 = chi2_21 < CHI2_H
    in2 = chi2_12 < CHI2_H
    score = jnp.where(in1, CHI2_H - chi2_21, 0.0) + jnp.where(in2, CHI2_H - chi2_12, 0.0)
    score = jnp.where(valid[None, :], score, 0.0)
    inlier = in1 & in2 & valid[None, :]
    return jnp.sum(score, axis=-1), inlier


def _score_fundamental(f, uv1, uv2, valid):
    """Epipolar-distance chi2 score (reference CheckFundamental)."""
    ones = jnp.ones((uv1.shape[0], 1), jnp.float32)
    p1 = jnp.concatenate([uv1, ones], axis=-1)
    p2 = jnp.concatenate([uv2, ones], axis=-1)

    l2 = p1 @ jnp.swapaxes(f, -1, -2)  # line in image 2: F p1  -> (H, N, 3)
    num2 = jnp.sum(l2 * p2[None], axis=-1)
    den2 = l2[..., 0] ** 2 + l2[..., 1] ** 2
    chi2_2 = num2 * num2 / jnp.clip(den2, 1e-12, None)

    l1 = p2 @ f  # line in image 1: F^T p2
    num1 = jnp.sum(l1 * p1[None], axis=-1)
    den1 = l1[..., 0] ** 2 + l1[..., 1] ** 2
    chi2_1 = num1 * num1 / jnp.clip(den1, 1e-12, None)

    in2 = chi2_2 < CHI2_F
    in1 = chi2_1 < CHI2_F
    score = jnp.where(in2, SCORE_TH - chi2_2, 0.0) + jnp.where(in1, SCORE_TH - chi2_1, 0.0)
    score = jnp.where(valid[None, :], score, 0.0)
    inlier = in1 & in2 & valid[None, :]
    return jnp.sum(score, axis=-1), inlier


def _motions_from_e(e):
    """4 candidate (R, t) from an essential matrix (reference DecomposeE)."""
    u, _, vt = jnp.linalg.svd(e)
    # ensure rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    w = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
    r1 = u @ w @ vt
    r2 = u @ w.T @ vt
    t = u[:, 2]
    t = t / jnp.clip(jnp.linalg.norm(t), 1e-12, None)
    rs = jnp.stack([r1, r1, r2, r2])
    ts = jnp.stack([t, -t, t, -t])
    return rs, ts


def _motions_from_h(h_pix, k, k_inv):
    """8 candidate (R, t) from a homography via SVD decomposition.

    Ma-Soatto-Kosecka-Sastry Alg 5.2 on H' = K^-1 H K, for both signs of H'.
    """
    hn = k_inv @ h_pix @ k
    # normalize so middle singular value is 1
    _, sv, _ = jnp.linalg.svd(hn)
    hn = hn / jnp.clip(sv[1], 1e-12, None)

    def decompose(hmat):
        # eigendecomposition of H^T H = V diag(s1^2, 1, s3^2) V^T
        hth = hmat.T @ hmat
        evals, v = jnp.linalg.eigh(hth)  # ascending
        s3sq, _, s1sq = evals[0], evals[1], evals[2]
        v1 = v[:, 2]
        v2 = v[:, 1]
        v3 = v[:, 0]
        denom = jnp.clip(s1sq - s3sq, 1e-12, None)
        a = jnp.sqrt(jnp.clip(1.0 - s3sq, 0.0, None) / denom)
        b = jnp.sqrt(jnp.clip(s1sq - 1.0, 0.0, None) / denom)
        u1 = a * v1 + b * v3
        u2 = a * v1 - b * v3

        def solution(u):
            big_u = jnp.stack([v2, u, jnp.cross(v2, u)], axis=1)  # columns
            hv2 = hmat @ v2
            hu = hmat @ u
            big_w = jnp.stack([hv2, hu, jnp.cross(hv2, hu)], axis=1)
            r = big_w @ big_u.T
            n = jnp.cross(v2, u)
            t = (hmat - r) @ n
            return r, t

        r1, t1 = solution(u1)
        r2, t2 = solution(u2)
        return jnp.stack([r1, r2, r1, r2]), jnp.stack([t1, t2, -t1, -t2])

    ra, ta = decompose(hn)
    rb, tb = decompose(-hn)
    rs = jnp.concatenate([ra, rb])
    ts = jnp.concatenate([ta, tb])
    norm = jnp.clip(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12, None)
    return rs, ts / norm


def _check_rt(r, t, uv1, uv2, inlier, k):
    """Count well-triangulated points for a motion hypothesis.

    Returns (n_good, parallax_deg, pts3d (N,3), good (N,)).
    Mirrors reference CheckRT: cheirality in both views, reprojection
    < 4 sigma^2, parallax-gated depth test.
    """
    p1 = k @ jnp.eye(4, dtype=jnp.float32)[:3]
    rt = jnp.concatenate([r, t[:, None]], axis=1)
    p2 = k @ rt
    pts = triangulation.triangulate_dlt(p1, p2, uv1, uv2)
    finite = jnp.all(jnp.isfinite(pts), axis=-1)
    pts = jnp.where(finite[:, None], pts, 0.0)

    o1 = jnp.zeros((3,), jnp.float32)
    o2 = -r.T @ t
    cosp = triangulation.parallax_cos(pts, o1, o2)

    z1 = pts[:, 2]
    pc2 = pts @ r.T + t
    z2 = pc2[:, 2]

    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    e1, _ = triangulation.reprojection_error_sq(
        fx, fy, cx, cy, jnp.eye(4, dtype=jnp.float32), pts, uv1
    )
    t2m = jnp.concatenate([rt, jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)], axis=0)
    e2, _ = triangulation.reprojection_error_sq(fx, fy, cx, cy, t2m, pts, uv2)

    low_parallax = cosp > COS_PARALLAX_TH
    good = (
        inlier
        & finite
        & (z1 > 0)
        & (z2 > 0)
        & ~low_parallax
        & (e1 < REPROJ_TH2)
        & (e2 < REPROJ_TH2)
    )
    n_good = jnp.sum(good.astype(jnp.int32))
    # robust parallax: 50th largest angle among good points (reference sorts
    # cosines ascending and takes index min(50, n-1))
    cos_sorted = jnp.sort(jnp.where(good, cosp, 1.0))
    idx = jnp.minimum(50, jnp.maximum(n_good - 1, 0))
    par_cos = cos_sorted[idx]
    parallax_deg = jnp.degrees(jnp.arccos(jnp.clip(par_cos, -1.0, 1.0)))
    return n_good, parallax_deg, pts, good


@partial(jax.jit, static_argnames=())
def initialize_two_view(uv1, uv2, valid, k_mat, seed):
    """Full two-view bootstrap.

    Args:
      uv1, uv2: (N, 2) undistorted pixel coords of matched keypoints
        (reference frame / current frame).
      valid: (N,) bool match mask.
      k_mat: (3, 3) intrinsics.
      seed: int32 RANSAC seed.

    Returns dict with:
      success: () bool
      t21: (4, 4) pose of frame 2 w.r.t. frame 1 (world = frame 1)
      pts3d: (N, 3) triangulated points (frame-1 coords)
      good: (N,) bool triangulation validity
      used_homography: () bool, rh: () float32 score ratio
    """
    key = jax.random.PRNGKey(seed)
    n = uv1.shape[0]

    uv1n, t1 = _normalize(uv1, valid)
    uv2n, t2 = _normalize(uv2, valid)
    t2_inv = jnp.linalg.inv(t2)

    sets = _sample_sets(key, valid)  # (H, 8)
    sx1 = uv1n[sets][:, :, 0]
    sy1 = uv1n[sets][:, :, 1]
    sx2 = uv2n[sets][:, :, 0]
    sy2 = uv2n[sets][:, :, 1]

    f_n = _fit_fundamental(sx1, sy1, sx2, sy2)
    h_n = _fit_homography(sx1, sy1, sx2, sy2)
    f_pix = jnp.swapaxes(t2, 0, 1)[None] @ f_n @ t1[None]
    h_pix = t2_inv[None] @ h_n @ t1[None]
    h_pix_inv = jnp.linalg.inv(h_pix)

    sh, h_inliers = _score_homography(h_pix, h_pix_inv, uv1, uv2, valid)
    sf, f_inliers = _score_fundamental(f_pix, uv1, uv2, valid)

    best_h = jnp.argmax(sh)
    best_f = jnp.argmax(sf)

    # All-inlier refit of the best hypotheses (guided final fit; the
    # reference keeps the raw minimal-set estimate, but a least-squares
    # refit on the consensus set is strictly more accurate and costs one
    # extra 9x9 eigh).
    def _refit_f(inl):
        w = inl.astype(jnp.float32)
        x1, y1 = uv1n[:, 0], uv1n[:, 1]
        x2, y2 = uv2n[:, 0], uv2n[:, 1]
        ones = jnp.ones_like(x1)
        a = jnp.stack(
            [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
        )
        ata = jnp.einsum("ni,nj->ij", a * w[:, None], a)
        f = _smallest_eigvec(ata).reshape(3, 3)
        u, s, vt = jnp.linalg.svd(f)
        f = u @ (s.at[2].set(0.0)[:, None] * vt)
        return (jnp.swapaxes(t2, 0, 1) @ f @ t1)[None]

    def _refit_h(inl):
        w = inl.astype(jnp.float32)
        x1, y1 = uv1n[:, 0], uv1n[:, 1]
        x2, y2 = uv2n[:, 0], uv2n[:, 1]
        ones = jnp.ones_like(x1)
        zeros = jnp.zeros_like(x1)
        r1 = jnp.stack(
            [zeros, zeros, zeros, -x1, -y1, -ones, y2 * x1, y2 * y1, y2], axis=-1
        )
        r2 = jnp.stack(
            [x1, y1, ones, zeros, zeros, zeros, -x2 * x1, -x2 * y1, -x2], axis=-1
        )
        a = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
        ata = jnp.einsum("ni,nj->ij", a, a)
        h = _smallest_eigvec(ata).reshape(3, 3)
        return (t2_inv @ h @ t1)[None]

    f_refit = _refit_f(f_inliers[best_f])
    h_refit = _refit_h(h_inliers[best_h])
    sf_r, f_inl_r = _score_fundamental(f_refit, uv1, uv2, valid)
    sh_r, h_inl_r = _score_homography(
        h_refit, jnp.linalg.inv(h_refit), uv1, uv2, valid
    )
    f_better = sf_r[0] > sf[best_f]
    h_better = sh_r[0] > sh[best_h]
    f_best_mat = jnp.where(f_better, f_refit[0], f_pix[best_f])
    h_best_mat = jnp.where(h_better, h_refit[0], h_pix[best_h])
    f_best_inl = jnp.where(f_better, f_inl_r[0], f_inliers[best_f])
    h_best_inl = jnp.where(h_better, h_inl_r[0], h_inliers[best_h])
    sh_best = jnp.maximum(sh[best_h], sh_r[0])
    sf_best = jnp.maximum(sf[best_f], sf_r[0])
    rh = sh_best / jnp.clip(sh_best + sf_best, 1e-9, None)
    use_h = rh > 0.40

    # --- reconstruct from F (4 motions) ---
    e_mat = jnp.swapaxes(k_mat, 0, 1) @ f_best_mat @ k_mat
    rs_f, ts_f = _motions_from_e(e_mat)
    # --- reconstruct from H (8 motions) ---
    rs_h, ts_h = _motions_from_h(h_best_mat, k_mat, jnp.linalg.inv(k_mat))

    rs = jnp.concatenate([rs_f, rs_h])  # (12, 3, 3)
    ts = jnp.concatenate([ts_f, ts_h])
    model_mask = jnp.concatenate(
        [jnp.full((4,), True), jnp.full((8,), False)]
    )  # True = F-motion
    inlier_sel = jnp.where(use_h, h_best_inl, f_best_inl)
    cand_active = jnp.where(use_h, ~model_mask, model_mask)

    n_good, par, pts, good = jax.vmap(
        lambda r, t: _check_rt(r, t, uv1, uv2, inlier_sel, k_mat)
    )(rs, ts)
    n_good = jnp.where(cand_active, n_good, -1)

    best_cand = jnp.argmax(n_good)
    best_good = n_good[best_cand]
    second = jnp.max(jnp.where(jnp.arange(12) == best_cand, -1, n_good))

    n_inliers = jnp.sum(inlier_sel.astype(jnp.int32))
    min_good = jnp.maximum(jnp.int32(MIN_TRIANGULATED), (0.9 * n_inliers).astype(jnp.int32))
    success = (
        (best_good >= min_good)
        & (second < 0.75 * best_good)
        & (par[best_cand] > MIN_PARALLAX_DEG)
    )

    r_best = rs[best_cand]
    t_best = ts[best_cand]
    t21 = jnp.concatenate(
        [
            jnp.concatenate([r_best, t_best[:, None]], axis=1),
            jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32),
        ],
        axis=0,
    )
    return dict(
        success=success,
        t21=t21,
        pts3d=pts[best_cand],
        good=good[best_cand] & success,
        used_homography=use_h,
        rh=rh,
        n_good=best_good,
        # diagnostics (which gate failed, for debug logging)
        n_inliers=n_inliers,
        second_good=second,
        parallax_deg=par[best_cand],
    )
