"""Bundle adjustment: Levenberg-Marquardt with Schur complement, TPU-native.

Replaces the reference's g2o-based Optimizer::BundleAdjustment /
LocalBundleAdjustment / GlobalBundleAdjustemnt (reference src/Optimizer.cc:
61-243, 450-768): SE3 keyframe blocks + marginalized XYZ point blocks,
2-dof reprojection edges with per-keypoint information 1/sigma^2, Huber
delta = sqrt(5.991).

Design (TPU-first, also the distributed formulation):
  - Fixed-capacity COO observation arrays (kf_idx, pt_idx, uv, w, valid).
  - Per LM iteration, residuals + Jacobians for ALL observations in parallel.
  - Point blocks are marginalized analytically (3x3 closed-form inverses).
  - The reduced camera system S dx = b is solved MATRIX-FREE with
    block-Jacobi preconditioned CG: S*v needs only segment-sums and gathers
    over the COO arrays, never forming S. The same products distribute over
    a device mesh with psum (see parallel/sharded_ba.py).
  - Fixed trip counts everywhere (the reference's abortable BA becomes a
    bounded-iteration schedule, SURVEY 2.7).

Poses use the same left-multiplicative tangent update exp(xi) T as
ops/pose_opt.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import se3

CHI2_MONO = 5.991
HUBER_DELTA = jnp.sqrt(CHI2_MONO)
# Early-exit tolerances (see ops/pose_opt.py for the argument: steps below
# float32 resolution can never be meaningfully accepted again, so exiting is
# numerically identical to running the fixed schedule out).
DX_TOL = 1e-7
CG_RTOL2 = 1e-12  # relative (squared, M-norm) CG residual

# Dense-Schur dispatch: when the (keyframe x point) block grid is small
# enough, forming the reduced camera system EXPLICITLY and solving it with
# one dense solve beats 25 sequential CG applications per LM step (each CG
# step is a chain of scatter/gather segment ops, all launch-latency-bound —
# profiled at ~300 ms per local-BA solve on the real chip vs ~10s of ms
# dense). The cap trades transient HBM for latency: K*P = 2M packs a
# ~580 MB (K*P, 72) accumulation buffer, well within a single chip's HBM.
# Global BA on big maps falls back to the matrix-free CG path.
_DENSE_MAX_KP = 2_097_152  # K*P block-grid cells
_DENSE_MAX_K = 128         # dense reduced system <= 768 x 768


def _inv3x3(m):
    """Batched closed-form 3x3 inverse via adjugate."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    ei_fh = e * i - f * h
    fg_di = f * g - d * i
    dh_eg = d * h - e * g
    det = a * ei_fh + b * fg_di + c * dh_eg
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([ei_fh, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([fg_di, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([dh_eg, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def _two_sum(a, b):
    """Knuth TwoSum: s + err == a + b exactly in the reals (err captures the
    f32 rounding of s = a + b)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def segment_sum_compensated(vals, ids, num_segments: int, n_chunks: int = 64):
    """Compensated (two-float) segment sum for the BA normal equations.

    TPU has no fast f64, so plain f32 `segment_sum` accumulates O(sqrt(O))
    ulp error over large observation counts — enough to stall LM on
    ill-conditioned systems (huge information-weight dynamic range, deep
    low-parallax points; SURVEY section 7 numerics note). This splits the
    observation axis into `n_chunks` independent f32 partial segment-sums
    and combines the partials with a Kahan/TwoSum running-error scan, so
    cross-chunk cancellation and dynamic range are captured at roughly
    double-f32 precision. Intra-chunk error shrinks with chunk length
    (O / n_chunks additions); raise n_chunks for harder problems.
    """
    o = vals.shape[0]
    pad = (-o) % n_chunks
    if pad:
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad,) + vals.shape[1:], vals.dtype)]
        )
        # out-of-range ids are dropped by segment_sum
        ids = jnp.concatenate(
            [ids, jnp.full((pad,), num_segments, ids.dtype)]
        )
    vals_c = vals.reshape((n_chunks, -1) + vals.shape[1:])
    ids_c = ids.reshape(n_chunks, -1)
    partials = jax.vmap(
        lambda v, i: jax.ops.segment_sum(v, i, num_segments=num_segments)
    )(vals_c, ids_c)

    def body(carry, x):
        s, e = carry
        s2, err = _two_sum(s, x)
        return (s2, e + err), None

    zero = jnp.zeros_like(partials[0])
    (s, e), _ = jax.lax.scan(body, (zero, zero), partials)
    return s + e


def _residuals(poses, pts, obs_kf, obs_pt, obs_uv, fx, fy, cx, cy):
    """Per-observation residuals + Jacobians.

    Returns e (O, 2), jc (O, 2, 6) [camera tangent], jp (O, 2, 3) [point],
    z (O,) depths.
    """
    t = poses[obs_kf]  # (O, 4, 4)
    x_w = pts[obs_pt]  # (O, 3)
    r = t[:, :3, :3]
    p = jnp.einsum("oij,oj->oi", r, x_w) + t[:, :3, 3]
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    e = jnp.stack([u - obs_uv[:, 0], v - obs_uv[:, 1]], axis=-1)
    zero = jnp.zeros_like(x)
    j_p3 = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], axis=-1),
            jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # (O, 2, 3) d e / d p_cam
    jc = jnp.concatenate([j_p3, j_p3 @ (-se3.hat(p))], axis=-1)  # (O, 2, 6)
    jp = j_p3 @ r  # d p_cam / d x_w = R
    return e, jc, jp, z


def _robust_cost(chi2, use_huber):
    lin = 2.0 * HUBER_DELTA * jnp.sqrt(jnp.clip(chi2, 1e-12, None)) - HUBER_DELTA**2
    return jnp.where(use_huber & (chi2 > CHI2_MONO), lin, chi2)


def _huber_weight(chi2, use_huber):
    n = jnp.sqrt(jnp.clip(chi2, 1e-12, None))
    w = jnp.where(n <= HUBER_DELTA, 1.0, HUBER_DELTA / n)
    return jnp.where(use_huber, w, 1.0)


def _bundle_adjust_impl(
    poses,
    pts,
    kf_free,
    obs_kf,
    obs_pt,
    obs_uv,
    obs_w,
    obs_valid,
    fx,
    fy,
    cx,
    cy,
    n_iters: int = 10,
    n_cg: int = 25,
    use_huber: bool = True,
    axis_name: str | None = None,
    points_sharded: bool = False,
    compensated: bool = False,
):
    """Joint camera/point LM with Schur-marginalized points.

    Args:
      poses: (K, 4, 4) float32 Tcw.
      pts: (P, 3) float32 world points.
      kf_free: (K,) bool — False cameras are held fixed (gauge / local BA
        boundary, reference src/Optimizer.cc:485-501).
      obs_kf, obs_pt: (O,) int32 COO indices.
      obs_uv: (O, 2) undistorted observations.
      obs_w: (O,) information scale (1/sigma^2).
      obs_valid: (O,) bool.
      n_iters / n_cg: LM iterations / CG iterations per solve.

    Returns (poses, pts, final_chi2_per_obs).
    """
    k_cams = poses.shape[0]
    n_pts = pts.shape[0]
    fx = jnp.asarray(fx, jnp.float32)
    fy = jnp.asarray(fy, jnp.float32)
    cx = jnp.asarray(cx, jnp.float32)
    cy = jnp.asarray(cy, jnp.float32)
    free_f = kf_free.astype(jnp.float32)[:, None]

    def allr(x):
        """Cross-device reduction when observations are sharded over a mesh
        axis (parallel/sharded_ba.py); identity single-chip."""
        return jax.lax.psum(x, axis_name) if axis_name else x

    def seg_sum(v, ids, num):
        """Normal-equation accumulation: compensated two-float form on
        request (SURVEY section 7 numerics note; see
        segment_sum_compensated)."""
        if compensated:
            return segment_sum_compensated(v, ids, num)
        return jax.ops.segment_sum(v, ids, num_segments=num)

    def allr_pt(x):
        """Point-side reduction. Under the point-sharded layout
        (parallel/point_sharded_ba.py) every observation of a point lives on
        the device that owns the point, so point-block sums are complete
        locally and need NO collective — only camera-side quantities cross
        the mesh. Identity there; psum when points are replicated."""
        return x if points_sharded else allr(x)

    def total_cost(poses, pts):
        e, _, _, z = _residuals(poses, pts, obs_kf, obs_pt, obs_uv, fx, fy, cx, cy)
        chi2 = jnp.sum(e * e, axis=-1) * obs_w
        c = _robust_cost(chi2, use_huber)
        return allr(jnp.sum(jnp.where(obs_valid, c, 0.0)))

    def lm_cond(carry):
        i, poses, pts, lam, cost, done = carry
        return (i < n_iters) & ~done

    def lm_step(carry):
        i, poses, pts, lam, cost, _ = carry
        e, jc, jp, z = _residuals(poses, pts, obs_kf, obs_pt, obs_uv, fx, fy, cx, cy)
        chi2 = jnp.sum(e * e, axis=-1) * obs_w
        w = jnp.where(obs_valid, _huber_weight(chi2, use_huber) * obs_w, 0.0)

        jcw = jc * w[:, None, None]
        jpw = jp * w[:, None, None]
        # Per-camera 6x6 blocks, per-point 3x3 blocks, gradients.
        hcc = allr(seg_sum(
            jnp.einsum("oij,oik->ojk", jcw, jc), obs_kf, k_cams
        ))
        hpp = allr_pt(seg_sum(
            jnp.einsum("oij,oik->ojk", jpw, jp), obs_pt, n_pts
        ))
        bc = -allr(seg_sum(
            jnp.einsum("oij,oi->oj", jcw, e), obs_kf, k_cams
        ))
        bp = -allr_pt(seg_sum(
            jnp.einsum("oij,oi->oj", jpw, e), obs_pt, n_pts
        ))
        # damping
        eye6 = jnp.eye(6, dtype=jnp.float32)
        eye3 = jnp.eye(3, dtype=jnp.float32)
        hcc_d = hcc + (lam + 1e-6) * eye6[None] * (
            1.0 + jnp.diagonal(hcc, axis1=-2, axis2=-1).mean(-1)[:, None, None]
        )
        hpp_d = hpp + (lam + 1e-6) * eye3[None] * (
            1.0 + jnp.diagonal(hpp, axis1=-2, axis2=-1).mean(-1)[:, None, None]
        )
        hpp_inv = _inv3x3(hpp_d)

        def y_mul(v_p):
            """v_p (P, 3) -> (K, 6): Y v = sum_o Jc^T w Jp v[pt]."""
            t = jnp.einsum("oij,oj->oi", jp, v_p[obs_pt])  # (O, 2)
            return allr(jax.ops.segment_sum(
                jnp.einsum("oij,oi->oj", jcw, t), obs_kf, num_segments=k_cams
            ))

        def yt_mul(v_c):
            """v_c (K, 6) -> (P, 3): Y^T v = sum_o Jp^T w Jc v[cam]."""
            t = jnp.einsum("oij,oj->oi", jc, v_c[obs_kf])  # (O, 2)
            return allr_pt(jax.ops.segment_sum(
                jnp.einsum("oij,oi->oj", jpw, t), obs_pt, num_segments=n_pts
            ))

        def s_mul(x):
            """Reduced camera system product, restricted to free cameras."""
            x = x * free_f
            hx = jnp.einsum("kij,kj->ki", hcc_d, x)
            corr = y_mul(jnp.einsum("pij,pj->pi", hpp_inv, yt_mul(x)))
            return (hx - corr) * free_f

        b_red = (bc - y_mul(jnp.einsum("pij,pj->pi", hpp_inv, bp))) * free_f

        # Block-Jacobi preconditioner from damped camera blocks.
        # (Pad fixed cameras with identity to keep the inverse benign.)
        hcc_pre = jnp.where(
            kf_free[:, None, None], hcc_d, jnp.eye(6, dtype=jnp.float32)[None]
        )
        m_inv = jnp.linalg.inv(hcc_pre)

        def precond(r):
            return jnp.einsum("kij,kj->ki", m_inv, r) * free_f

        def cg_cond(carry):
            i, x, r, zv, p, rz0 = carry
            # r, zv are camera-side (replicated under both shardings after
            # the collectives inside s_mul/precond), so the exit decision is
            # uniform across the mesh
            return (i < n_cg) & (jnp.sum(r * zv) > CG_RTOL2 * rz0)

        def cg_body(carry):
            i, x, r, zv, p, rz0 = carry
            sp = s_mul(p)
            denom = jnp.sum(p * sp)
            alpha = jnp.where(jnp.abs(denom) > 1e-12, jnp.sum(r * zv) / denom, 0.0)
            x2 = x + alpha * p
            r2 = r - alpha * sp
            z2 = precond(r2)
            beta_d = jnp.sum(r * zv)
            beta = jnp.where(jnp.abs(beta_d) > 1e-12, jnp.sum(r2 * z2) / beta_d, 0.0)
            p2 = z2 + beta * p
            return (i + 1, x2, r2, z2, p2, rz0)

        x0 = jnp.zeros_like(bc)
        r0 = b_red
        z0 = precond(r0)
        rz0 = jnp.sum(r0 * z0)
        _, dxc, _, _, _, _ = jax.lax.while_loop(
            cg_cond, cg_body, (jnp.int32(0), x0, r0, z0, z0, rz0)
        )
        dxc = dxc * free_f

        dxp = jnp.einsum("pij,pj->pi", hpp_inv, bp - yt_mul(dxc))

        new_poses = jnp.where(
            kf_free[:, None, None], jax.vmap(se3.se3_exp)(dxc) @ poses, poses
        )
        new_pts = pts + dxp
        new_cost = total_cost(new_poses, new_pts)
        finite = jnp.isfinite(new_cost) & jnp.all(jnp.isfinite(dxc)) & jnp.all(
            jnp.isfinite(dxp)
        )
        accept = (new_cost < cost) & finite
        poses = jnp.where(accept, new_poses, poses)
        pts = jnp.where(accept, new_pts, pts)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e4)
        # early exit once BOTH block updates are below float32 resolution on
        # every device: dxc is replicated; dxp is shard-local under the
        # point-sharded layout, so AND-reduce the local verdicts via psum
        local_done = (
            (jnp.max(jnp.abs(dxc)) < DX_TOL) & (jnp.max(jnp.abs(dxp)) < DX_TOL)
        ).astype(jnp.float32)
        done = allr(local_done) >= allr(jnp.float32(1.0))
        return (i + 1, poses, pts, lam, cost, done)

    init_cost = total_cost(poses, pts)
    _, poses, pts, _, _, _ = jax.lax.while_loop(
        lm_cond,
        lm_step,
        (jnp.int32(0), poses, pts, jnp.float32(1e-4), init_cost, jnp.bool_(False)),
    )
    e, _, _, z = _residuals(poses, pts, obs_kf, obs_pt, obs_uv, fx, fy, cx, cy)
    chi2 = jnp.sum(e * e, axis=-1) * obs_w
    chi2 = jnp.where(obs_valid, chi2, jnp.inf)
    return poses, pts, chi2, z


def _make_dense_lm(kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
                   fx, fy, cx, cy, use_huber, n_pts):
    """Shared builders for the dense-Schur LM: returns (total_cost,
    lm_step) closures over the observation arrays. Used by the monolithic
    while_loop impl AND the chunked per-iteration dispatch path."""
    k_cams = kf_free.shape[0]
    fx = jnp.asarray(fx, jnp.float32)
    fy = jnp.asarray(fy, jnp.float32)
    cx = jnp.asarray(cx, jnp.float32)
    cy = jnp.asarray(cy, jnp.float32)
    free_f = kf_free.astype(jnp.float32)[:, None]
    free6 = jnp.repeat(kf_free, 6).astype(jnp.float32)
    comb = obs_kf.astype(jnp.int32) * n_pts + obs_pt.astype(jnp.int32)

    def total_cost(poses, pts):
        e, _, _, z = _residuals(poses, pts, obs_kf, obs_pt, obs_uv, fx, fy, cx, cy)
        chi2 = jnp.sum(e * e, axis=-1) * obs_w
        return jnp.sum(jnp.where(obs_valid, _robust_cost(chi2, use_huber), 0.0))

    def lm_step(carry):
        i, poses, pts, lam, cost, _ = carry
        e, jc, jp, z = _residuals(poses, pts, obs_kf, obs_pt, obs_uv, fx, fy, cx, cy)
        chi2 = jnp.sum(e * e, axis=-1) * obs_w
        w = jnp.where(obs_valid, _huber_weight(chi2, use_huber) * obs_w, 0.0)
        jcw = jc * w[:, None, None]
        jpw = jp * w[:, None, None]
        # per-obs blocks packed into one row: Y(18) Hcc(36) Hpp(9) bc(6) bp(3)
        packed = jnp.concatenate(
            [
                jnp.einsum("oia,oib->oab", jcw, jp).reshape(-1, 18),
                jnp.einsum("oia,oib->oab", jcw, jc).reshape(-1, 36),
                jnp.einsum("oia,oib->oab", jpw, jp).reshape(-1, 9),
                jnp.einsum("oia,oi->oa", jcw, e),
                jnp.einsum("oia,oi->oa", jpw, e),
            ],
            axis=1,
        )  # (O, 72)
        seg = jax.ops.segment_sum(packed, comb, num_segments=k_cams * n_pts)
        seg = seg.reshape(k_cams, n_pts, 72)
        y = seg[..., :18].reshape(k_cams, n_pts, 6, 3)
        hcc = seg[..., 18:54].sum(1).reshape(k_cams, 6, 6)
        hpp = seg[..., 54:63].sum(0).reshape(n_pts, 3, 3)
        bc = -seg[..., 63:69].sum(1)
        bp = -seg[..., 69:72].sum(0)

        eye6 = jnp.eye(6, dtype=jnp.float32)
        hcc_d = hcc + (lam + 1e-6) * eye6[None] * (
            1.0 + jnp.diagonal(hcc, axis1=-2, axis2=-1).mean(-1)[:, None, None]
        )
        hpp_d = hpp + (lam + 1e-6) * jnp.eye(3, dtype=jnp.float32)[None] * (
            1.0 + jnp.diagonal(hpp, axis1=-2, axis2=-1).mean(-1)[:, None, None]
        )
        hpp_inv = _inv3x3(hpp_d)

        yhi = jnp.einsum("kpab,pbc->kpac", y, hpp_inv)       # (K,P,6,3)
        s_cross = jnp.einsum("kpac,qpdc->kqad", yhi, y)      # (K,K,6,6)
        s = (
            jnp.zeros((k_cams, k_cams, 6, 6), jnp.float32)
            .at[jnp.arange(k_cams), jnp.arange(k_cams)]
            .set(hcc_d)
            - s_cross
        )
        b_red = bc - jnp.einsum("kpac,pc->ka", yhi, bp)
        s_flat = s.transpose(0, 2, 1, 3).reshape(6 * k_cams, 6 * k_cams)
        # fixed cameras: identity rows/cols + zero rhs keep the solve benign
        mask2 = free6[:, None] * free6[None, :]
        s_flat = jnp.where(mask2 > 0, s_flat, jnp.eye(6 * k_cams, dtype=jnp.float32))
        b_flat = b_red.reshape(-1) * free6
        dxc = jnp.linalg.solve(s_flat, b_flat).reshape(k_cams, 6) * free_f
        dxp = jnp.einsum(
            "pab,pb->pa", hpp_inv, bp - jnp.einsum("kpab,ka->pb", y, dxc)
        )

        new_poses = jnp.where(
            kf_free[:, None, None], jax.vmap(se3.se3_exp)(dxc) @ poses, poses
        )
        new_pts = pts + dxp
        new_cost = total_cost(new_poses, new_pts)
        finite = jnp.isfinite(new_cost) & jnp.all(jnp.isfinite(dxc)) & jnp.all(
            jnp.isfinite(dxp)
        )
        accept = (new_cost < cost) & finite
        poses = jnp.where(accept, new_poses, poses)
        pts = jnp.where(accept, new_pts, pts)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e4)
        done = (jnp.max(jnp.abs(dxc)) < DX_TOL) & (jnp.max(jnp.abs(dxp)) < DX_TOL)
        return (i + 1, poses, pts, lam, cost, done)

    return total_cost, lm_step


def _bundle_adjust_dense_impl(
    poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
    fx, fy, cx, cy,
    n_iters: int = 10, use_huber: bool = True,
):
    """Small-problem LM: explicit Schur complement + one dense solve.

    Same LM schedule/acceptance as _bundle_adjust_impl, but instead of 25
    matrix-free CG applications per step (each a sequential chain of
    scatter/gather segment ops — launch-latency-bound on TPU) it builds all
    camera/point/cross blocks with ONE combined segment-sum keyed by
    (kf * P + pt), forms the reduced camera system S = Hcc - Y Hpp^-1 Y^T
    densely ((6K, 6K), K <= _DENSE_MAX_K), and solves it exactly. Measured
    ~2.6x faster than the CG path at local-BA size (K=20, P=3k, O=12k) with
    identical convergence; the exact solve is if anything tighter than
    25-step CG. Single-chip only — the sharded paths keep CG.
    """
    n_pts = pts.shape[0]
    total_cost, lm_step = _make_dense_lm(
        kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
        fx, fy, cx, cy, use_huber, n_pts,
    )
    fx = jnp.asarray(fx, jnp.float32)
    fy = jnp.asarray(fy, jnp.float32)
    cx = jnp.asarray(cx, jnp.float32)
    cy = jnp.asarray(cy, jnp.float32)

    def lm_cond(carry):
        i, poses, pts, lam, cost, done = carry
        return (i < n_iters) & ~done

    init_cost = total_cost(poses, pts)
    _, poses, pts, _, _, _ = jax.lax.while_loop(
        lm_cond,
        lm_step,
        (jnp.int32(0), poses, pts, jnp.float32(1e-4), init_cost, jnp.bool_(False)),
    )
    e, _, _, z = _residuals(poses, pts, obs_kf, obs_pt, obs_uv, fx, fy, cx, cy)
    chi2 = jnp.sum(e * e, axis=-1) * obs_w
    chi2 = jnp.where(obs_valid, chi2, jnp.inf)
    return poses, pts, chi2, z


@partial(jax.jit, static_argnames=("n_iters", "n_cg", "use_huber", "compensated"))
def bundle_adjust(
    poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
    fx, fy, cx, cy,
    n_iters: int = 10, n_cg: int = 25, use_huber: bool = True,
    compensated: bool = False,
):
    """Single-chip entry point: dense Schur solve for small problems,
    matrix-free preconditioned CG at scale (see the two impls).

    compensated=True accumulates the normal equations with the two-float
    segment sum (ill-conditioned / global-BA-scale problems; the dense
    small-problem path is skipped because its per-(kf,pt) packed
    accumulation has at most a handful of addends per segment and its
    reduced solve is exact)."""
    k_cams, n_pts = poses.shape[0], pts.shape[0]
    if (
        not compensated
        and k_cams * n_pts <= _DENSE_MAX_KP and k_cams <= _DENSE_MAX_K
    ):
        return _bundle_adjust_dense_impl(
            poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
            fx, fy, cx, cy, n_iters=n_iters, use_huber=use_huber,
        )
    return _bundle_adjust_impl(
        poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
        fx, fy, cx, cy, n_iters=n_iters, n_cg=n_cg, use_huber=use_huber,
        compensated=compensated,
    )


def classify_outliers(chi2, z, th: float = CHI2_MONO):
    """Observation outlier mask after a BA stage (reference re-checks
    chi2 > 5.991 or negative depth, src/Optimizer.cc:661-676)."""
    return (chi2 > th) | (z <= 0)


# ---------------------------------------------------------------- chunked
# Per-iteration dispatch form of the dense solve, for the ASYNC local BA:
# the monolithic two-stage program occupies the (single, FIFO) device
# stream for the whole solve, so every pipelined tracking program
# dispatched during it queues behind ~100 ms of solver — measured as the
# tracker's retire-wait tail. Dispatching ONE LM iteration per program
# (all async, chained through device-resident carry; zero host syncs)
# bounds any tracking program's queue delay to one iteration (~5 ms). The
# solve's math is IDENTICAL — same step, same acceptance, same early-exit
# `done` flag (a converged chunk costs ~0 device time).


@partial(jax.jit, static_argnames=("use_huber",))
def _dense_cost(poses, pts, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
                fx, fy, cx, cy, use_huber: bool):
    total_cost, _ = _make_dense_lm(
        jnp.zeros(poses.shape[0], bool), obs_kf, obs_pt, obs_uv, obs_w,
        obs_valid, fx, fy, cx, cy, use_huber, pts.shape[0],
    )
    return total_cost(poses, pts)


@partial(jax.jit, static_argnames=("use_huber",))
def _dense_lm_chunk(poses, pts, lam, cost, done, kf_free,
                    obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
                    fx, fy, cx, cy, use_huber: bool):
    """One LM iteration of the dense-Schur solve (no-op once `done`)."""
    _, lm_step = _make_dense_lm(
        kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
        fx, fy, cx, cy, use_huber, pts.shape[0],
    )

    def step(_):
        _, p2, x2, l2, c2, d2 = lm_step(
            (jnp.int32(0), poses, pts, lam, cost, done)
        )
        return p2, x2, l2, c2, d2

    def skip(_):
        return poses, pts, lam, cost, done

    return jax.lax.cond(~done, step, skip, None)


@jax.jit
def _dense_chi2(poses, pts, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
                fx, fy, cx, cy):
    e, _, _, z = _residuals(poses, pts, obs_kf, obs_pt, obs_uv,
                            jnp.asarray(fx, jnp.float32),
                            jnp.asarray(fy, jnp.float32),
                            jnp.asarray(cx, jnp.float32),
                            jnp.asarray(cy, jnp.float32))
    chi2 = jnp.sum(e * e, axis=-1) * obs_w
    return jnp.where(obs_valid, chi2, jnp.inf), z


def bundle_adjust_two_stage_chunked(
    poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
    fx, fy, cx, cy,
    n_iters_a: int = 5, n_iters_b: int = 10,
):
    """Dense two-stage schedule as ~n_iters_a + n_iters_b + 4 SMALL async
    dispatches instead of 2 monolithic programs. Host never blocks; the
    returned arrays are plain futures like the monolithic path's. Only
    valid where the dense path is (K <= _DENSE_MAX_K, K*P <= _DENSE_MAX_KP
    — caller checks)."""
    args_obs = (obs_kf, obs_pt, obs_uv, obs_w, obs_valid)
    cost = _dense_cost(poses, pts, *args_obs, fx, fy, cx, cy, True)
    lam = jnp.float32(1e-4)
    done = jnp.bool_(False)
    for _ in range(n_iters_a):
        poses, pts, lam, cost, done = _dense_lm_chunk(
            poses, pts, lam, cost, done, kf_free, *args_obs,
            fx, fy, cx, cy, True,
        )
    chi2, z = _dense_chi2(poses, pts, *args_obs, fx, fy, cx, cy)
    obs_valid2 = obs_valid & ~classify_outliers(chi2, z)
    args_obs2 = (obs_kf, obs_pt, obs_uv, obs_w, obs_valid2)
    cost = _dense_cost(poses, pts, *args_obs2, fx, fy, cx, cy, False)
    lam = jnp.float32(1e-4)
    done = jnp.bool_(False)
    for _ in range(n_iters_b):
        poses, pts, lam, cost, done = _dense_lm_chunk(
            poses, pts, lam, cost, done, kf_free, *args_obs2,
            fx, fy, cx, cy, False,
        )
    chi2, z = _dense_chi2(poses, pts, *args_obs2, fx, fy, cx, cy)
    chi2_all = jnp.where(
        obs_valid, jnp.where(jnp.isinf(chi2), 1e9, chi2), jnp.inf
    )
    return poses, pts, chi2_all, z, obs_valid2


def bundle_adjust_two_stage(
    poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
    fx, fy, cx, cy,
    n_iters_a: int = 5, n_iters_b: int = 10, n_cg: int = 25,
    compensated: bool = False,
):
    """The reference's local-BA schedule (src/Optimizer.cc:649-699):
    5 Huber iterations, drop chi2>5.991 / negative-depth edges, then 10 more
    iterations on the survivors. Escapes robust-cost local minima where a
    point latches onto an outlying observation.

    Returns (poses, pts, chi2, z, obs_valid_final).
    """
    poses, pts, chi2, z = bundle_adjust(
        poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
        fx, fy, cx, cy, n_iters=n_iters_a, n_cg=n_cg, use_huber=True,
        compensated=compensated,
    )
    obs_valid2 = obs_valid & ~classify_outliers(chi2, z)
    poses, pts, chi2, z = bundle_adjust(
        poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid2,
        fx, fy, cx, cy, n_iters=n_iters_b, n_cg=n_cg, use_huber=False,
        compensated=compensated,
    )
    # final classification against the ORIGINAL validity so culled edges are
    # reported as outliers (reference erases those observations from the map)
    chi2_all = jnp.where(obs_valid, jnp.where(jnp.isinf(chi2), 1e9, chi2), jnp.inf)
    return poses, pts, chi2_all, z, obs_valid2
