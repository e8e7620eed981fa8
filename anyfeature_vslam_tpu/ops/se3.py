"""SE3 / SO3 / Sim3 operations, batched, float32, TPU-friendly.

The reference stores poses as float32 4x4 ``Tcw`` (world->camera) matrices
(reference include/Types.h: Eigen float matrix typedefs) and optimizes on
SE3/Sim3 manifolds inside g2o (reference src/Optimizer.cc). Here every op is
a pure jax.numpy function that broadcasts over leading batch dimensions so
whole keyframe sets / hypothesis sets are transformed in one fused XLA
program.

Conventions:
  - Poses are (..., 4, 4) float32 matrices ``T = [[R, t], [0, 1]]``.
  - Tangent vectors are (..., 6): ``xi = (rho, phi)`` with translation part
    ``rho`` first and rotation part ``phi`` second.
  - ``exp`` uses the full closed-form SE3 exponential (V-matrix); updates in
    the optimizers are LEFT-multiplicative: ``T <- exp(xi) @ T``.
  - Small-angle branches are handled with Taylor series + jnp.where so the
    functions are jit/grad-safe everywhere (no NaN at theta=0).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(v):
    """Skew-symmetric matrix of (..., 3) vectors -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _sin_cos_coeffs_sq(t2):
    """Return (A, B, C) = (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3) given t^2.

    Taking the SQUARED angle keeps everything finite and differentiable at
    theta == 0 (sqrt is only applied to a guarded value on the generic
    branch; the Taylor branch is a polynomial in t^2).
    """
    small = t2 < 1e-8
    safe_t = jnp.sqrt(jnp.where(small, jnp.ones_like(t2), t2))
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(safe_t) / safe_t)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(safe_t)) / (safe_t * safe_t))
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (safe_t - jnp.sin(safe_t)) / (safe_t ** 3))
    return a, b, c


def so3_exp(phi):
    """Rodrigues: (..., 3) rotation vector -> (..., 3, 3) rotation matrix."""
    t2 = jnp.sum(phi * phi, axis=-1)
    a, b, _ = _sin_cos_coeffs_sq(t2)
    k = hat(phi)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * k2


def so3_log(r):
    """(..., 3, 3) rotation matrix -> (..., 3) rotation vector.

    Gradient-safe at the identity (theta from atan2 of the antisymmetric
    part, not arccos, whose derivative blows up at trace=3 — pose-graph
    Jacobians autodiff through this at near-zero edge errors). Stable up to
    theta close to pi via the symmetric-part fallback.
    """
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Antisymmetric part: |w| = 2 sin(theta).
    w = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    wn2 = jnp.sum(w * w, axis=-1)
    small = wn2 < 1e-12
    safe_wn = jnp.sqrt(jnp.where(small, jnp.ones_like(wn2), wn2))
    sin_theta = 0.5 * safe_wn
    theta = jnp.arctan2(sin_theta, cos_theta)
    near_pi = cos_theta < -0.999
    safe_sin = jnp.where(small | near_pi, jnp.ones_like(sin_theta), sin_theta)
    generic = w * (theta / (2.0 * safe_sin))[..., None]
    # near identity phi = w/2 exactly to first order (grads flow through w)
    taylor = w * 0.5
    # Near pi: axis from the diagonal of R + I (outer product 2*(1+cos) a a^T).
    diag = jnp.stack([r[..., 0, 0], r[..., 1, 1], r[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag - cos_theta[..., None]) / jnp.clip(1.0 - cos_theta[..., None], 1e-8, None), 0.0, None)
    axis = jnp.sqrt(axis2)
    # Fix signs using the antisymmetric part (w has sign 2 sin(theta) * axis,
    # tiny near pi but its sign is still informative; fall back to +).
    sign = jnp.where(w >= 0, 1.0, -1.0)
    axis = axis * sign
    axis = axis / jnp.clip(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-8, None)
    near_pi_val = axis * theta[..., None]
    return jnp.where(small[..., None], taylor, jnp.where(near_pi[..., None], near_pi_val, generic))


def _left_jacobian(phi):
    """SO3 left Jacobian V(phi): integrates translation in the SE3 exp."""
    t2 = jnp.sum(phi * phi, axis=-1)
    _, b, c = _sin_cos_coeffs_sq(t2)
    k = hat(phi)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + b[..., None, None] * k + c[..., None, None] * k2


def _left_jacobian_inv(phi):
    t2 = jnp.sum(phi * phi, axis=-1)
    small = t2 < 1e-8
    safe_t = jnp.sqrt(jnp.where(small, jnp.ones_like(t2), t2))
    half = safe_t * 0.5
    cot_coeff = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / (safe_t * safe_t),
    )
    k = hat(phi)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye - 0.5 * k + cot_coeff[..., None, None] * k2


def se3_exp(xi):
    """(..., 6) tangent (rho, phi) -> (..., 4, 4) transform."""
    rho, phi = xi[..., :3], xi[..., 3:]
    r = so3_exp(phi)
    t = (_left_jacobian(phi) @ rho[..., None])[..., 0]
    return rt_to_mat(r, t)


def se3_log(t_mat):
    """(..., 4, 4) transform -> (..., 6) tangent (rho, phi)."""
    r = t_mat[..., :3, :3]
    t = t_mat[..., :3, 3]
    phi = so3_log(r)
    rho = (_left_jacobian_inv(phi) @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def rt_to_mat(r, t):
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(r.shape[:-2], t.shape[:-1])
    r = jnp.broadcast_to(r, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([r, t[..., None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=r.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(t_mat):
    r = t_mat[..., :3, :3]
    t = t_mat[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    return rt_to_mat(rt, -(rt @ t[..., None])[..., 0])


def transform_points(t_mat, pts):
    """Apply (..., 4, 4) to points (..., N, 3) -> (..., N, 3)."""
    r = t_mat[..., :3, :3]
    t = t_mat[..., :3, 3]
    return pts @ jnp.swapaxes(r, -1, -2) + t[..., None, :]


def quat_to_rot(q):
    """(..., 4) quaternion (x, y, z, w) -> (..., 3, 3). Normalizes q."""
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(r):
    """(..., 3, 3) -> (..., 4) quaternion (x, y, z, w), w >= 0.

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the one keyed by the largest diagonal combination.
    """
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    def build(tw, tx, ty, tz):
        return jnp.stack([tx, ty, tz, tw], axis=-1)

    # candidate 0: w largest
    s0 = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12, None)) * 2.0
    q0 = build(0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0)
    # candidate 1: x largest
    s1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12, None)) * 2.0
    q1 = build((m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1)
    # candidate 2: y largest
    s2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12, None)) * 2.0
    q2 = build((m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2)
    # candidate 3: z largest
    s3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12, None)) * 2.0
    q3 = build((m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3)

    cond0 = tr > 0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    # canonical sign: w >= 0
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)


# ---------------------------------------------------------------------------
# Sim3 (for loop closing; reference src/Sim3Solver.cc, Optimizer.cc Sim3 graph)
# ---------------------------------------------------------------------------


def sim3_to_mat(r, t, s):
    """(..., 3, 3), (..., 3), (...,) -> (..., 4, 4) with sR in the top block."""
    return rt_to_mat(r * s[..., None, None], t)


def sim3_inverse(r, t, s):
    rt = jnp.swapaxes(r, -1, -2)
    s_inv = 1.0 / s
    return rt, -(s_inv[..., None] * (rt @ t[..., None])[..., 0]), s_inv


def sim3_transform(r, t, s, pts):
    """Apply Sim3 (sR x + t) to (..., N, 3)."""
    return s[..., None, None] * (pts @ jnp.swapaxes(r, -1, -2)) + t[..., None, :]


def sim3_compose(a, b):
    """Compose Sim3 triples (r, t, s): a o b (apply b first)."""
    ra, ta, sa = a
    rb, tb, sb = b
    r = ra @ rb
    t = sa[..., None] * (ra @ tb[..., None])[..., 0] + ta
    return r, t, sa * sb


def sim3_inv(a):
    r, t, s = a
    return sim3_inverse(r, t, s)


def _sim3_w(phi, sigma):
    """The Sim3 'W' matrix: t = W rho in sim3_exp7 (closed form as in
    Strasdat's thesis / Sophus Sim3, handled smoothly near zero)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.clip(theta2, 1e-24, None))
    s = jnp.exp(sigma)
    om = hat(phi)
    om2 = om @ om
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), om.shape)

    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta2 < 1e-10
    safe_sigma = jnp.where(small_sigma, jnp.ones_like(sigma), sigma)
    safe_theta = jnp.where(small_theta, jnp.ones_like(theta), theta)

    # sigma ~ 0 branch
    a_s0 = jnp.where(small_theta, 0.5 * jnp.ones_like(theta), (1.0 - jnp.cos(safe_theta)) / (safe_theta * safe_theta))
    b_s0 = jnp.where(small_theta, jnp.ones_like(theta) / 6.0, (safe_theta - jnp.sin(safe_theta)) / (safe_theta ** 3))
    c_s0 = jnp.ones_like(sigma)

    # general sigma branch
    c_g = (s - 1.0) / safe_sigma
    # theta ~ 0 sub-branch
    a_g_t0 = ((safe_sigma - 1.0) * s + 1.0) / (safe_sigma * safe_sigma)
    b_g_t0 = ((0.5 * safe_sigma * safe_sigma - safe_sigma + 1.0) * s - 1.0) / (safe_sigma ** 3)
    aa = s * jnp.sin(safe_theta)
    bb = s * jnp.cos(safe_theta)
    cc = theta2 + sigma * sigma
    cc = jnp.where(cc < 1e-24, 1.0, cc)
    a_g = (aa * safe_sigma + (1.0 - bb) * safe_theta) / (safe_theta * cc)
    b_g = (c_g - ((bb - 1.0) * safe_sigma + aa * safe_theta) / cc) / (safe_theta * safe_theta)
    a_gen = jnp.where(small_theta, a_g_t0, a_g)
    b_gen = jnp.where(small_theta, b_g_t0, b_g)

    a_coef = jnp.where(small_sigma, a_s0, a_gen)
    b_coef = jnp.where(small_sigma, b_s0, b_gen)
    c_coef = jnp.where(small_sigma, c_s0, c_g)
    return (
        c_coef[..., None, None] * eye
        + a_coef[..., None, None] * om
        + b_coef[..., None, None] * om2
    )


def sim3_exp7(xi):
    """(..., 7) tangent (rho, phi, sigma) -> Sim3 triple (r, t, s)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    r = so3_exp(phi)
    w = _sim3_w(phi, sigma)
    t = (w @ rho[..., None])[..., 0]
    return r, t, jnp.exp(sigma)


def sim3_log7(r, t, s):
    """Sim3 triple -> (..., 7) tangent (rho, phi, sigma)."""
    sigma = jnp.log(jnp.clip(s, 1e-12, None))
    phi = so3_log(r)
    w = _sim3_w(phi, sigma)
    rho = jnp.linalg.solve(w, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
