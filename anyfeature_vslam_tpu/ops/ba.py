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

    def lm_step(carry, _):
        poses, pts, lam, cost = carry
        e, jc, jp, z = _residuals(poses, pts, obs_kf, obs_pt, obs_uv, fx, fy, cx, cy)
        chi2 = jnp.sum(e * e, axis=-1) * obs_w
        w = jnp.where(obs_valid, _huber_weight(chi2, use_huber) * obs_w, 0.0)

        jcw = jc * w[:, None, None]
        jpw = jp * w[:, None, None]
        # Per-camera 6x6 blocks, per-point 3x3 blocks, gradients.
        hcc = allr(jax.ops.segment_sum(
            jnp.einsum("oij,oik->ojk", jcw, jc), obs_kf, num_segments=k_cams
        ))
        hpp = allr_pt(jax.ops.segment_sum(
            jnp.einsum("oij,oik->ojk", jpw, jp), obs_pt, num_segments=n_pts
        ))
        bc = -allr(jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", jcw, e), obs_kf, num_segments=k_cams
        ))
        bp = -allr_pt(jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", jpw, e), obs_pt, num_segments=n_pts
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

        def cg_body(carry, _):
            x, r, zv, p = carry
            sp = s_mul(p)
            denom = jnp.sum(p * sp)
            alpha = jnp.where(jnp.abs(denom) > 1e-12, jnp.sum(r * zv) / denom, 0.0)
            x2 = x + alpha * p
            r2 = r - alpha * sp
            z2 = precond(r2)
            beta_d = jnp.sum(r * zv)
            beta = jnp.where(jnp.abs(beta_d) > 1e-12, jnp.sum(r2 * z2) / beta_d, 0.0)
            p2 = z2 + beta * p
            return (x2, r2, z2, p2), None

        x0 = jnp.zeros_like(bc)
        r0 = b_red
        z0 = precond(r0)
        (dxc, _, _, _), _ = jax.lax.scan(cg_body, (x0, r0, z0, z0), None, length=n_cg)
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
        return (poses, pts, lam, cost), cost

    init_cost = total_cost(poses, pts)
    (poses, pts, _, _), _ = jax.lax.scan(
        lm_step, (poses, pts, jnp.float32(1e-4), init_cost), None, length=n_iters
    )
    e, _, _, z = _residuals(poses, pts, obs_kf, obs_pt, obs_uv, fx, fy, cx, cy)
    chi2 = jnp.sum(e * e, axis=-1) * obs_w
    chi2 = jnp.where(obs_valid, chi2, jnp.inf)
    return poses, pts, chi2, z


@partial(jax.jit, static_argnames=("n_iters", "n_cg", "use_huber"))
def bundle_adjust(
    poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
    fx, fy, cx, cy,
    n_iters: int = 10, n_cg: int = 25, use_huber: bool = True,
):
    """Single-chip entry point; see _bundle_adjust_impl for the math."""
    return _bundle_adjust_impl(
        poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
        fx, fy, cx, cy, n_iters=n_iters, n_cg=n_cg, use_huber=use_huber,
    )


def classify_outliers(chi2, z, th: float = CHI2_MONO):
    """Observation outlier mask after a BA stage (reference re-checks
    chi2 > 5.991 or negative depth, src/Optimizer.cc:661-676)."""
    return (chi2 > th) | (z <= 0)


def bundle_adjust_two_stage(
    poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid,
    fx, fy, cx, cy,
    n_iters_a: int = 5, n_iters_b: int = 10, n_cg: int = 25,
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
    )
    obs_valid2 = obs_valid & ~classify_outliers(chi2, z)
    poses, pts, chi2, z = bundle_adjust(
        poses, pts, kf_free, obs_kf, obs_pt, obs_uv, obs_w, obs_valid2,
        fx, fy, cx, cy, n_iters=n_iters_b, n_cg=n_cg, use_huber=False,
    )
    # final classification against the ORIGINAL validity so culled edges are
    # reported as outliers (reference erases those observations from the map)
    chi2_all = jnp.where(obs_valid, jnp.where(jnp.isinf(chi2), 1e9, chi2), jnp.inf)
    return poses, pts, chi2_all, z, obs_valid2
