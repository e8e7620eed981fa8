"""Batched two-view linear triangulation + acceptance gates.

The reference triangulates one candidate match at a time with an SVD of the
4x4 DLT system and then applies cheirality / parallax / reprojection /
scale-consistency gates (reference src/LocalMapping.cc:231-473 and
src/Initializer.cc Triangulate + CheckRT). Here the whole match set is
triangulated as one batched computation; gates return masks.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_dlt(p1, p2, uv1, uv2):
    """Batched DLT triangulation.

    Args:
      p1, p2: (3, 4) projection matrices (K @ [R|t]) shared across the batch,
        or (..., 3, 4) batched.
      uv1, uv2: (..., 2) pixel observations in each view.

    Returns:
      (..., 3) triangulated points in world/reference coordinates. Solved via
      the eigenvector of A^T A with smallest eigenvalue (A is the 4x4 DLT
      matrix), which batches cleanly on TPU (self-adjoint eigendecomposition
      of (..., 4, 4)).
    """
    p1 = jnp.broadcast_to(p1, uv1.shape[:-1] + (3, 4))
    p2 = jnp.broadcast_to(p2, uv2.shape[:-1] + (3, 4))
    rows = [
        uv1[..., 0, None] * p1[..., 2, :] - p1[..., 0, :],
        uv1[..., 1, None] * p1[..., 2, :] - p1[..., 1, :],
        uv2[..., 0, None] * p2[..., 2, :] - p2[..., 0, :],
        uv2[..., 1, None] * p2[..., 2, :] - p2[..., 1, :],
    ]
    a = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    ata = jnp.swapaxes(a, -1, -2) @ a
    # Smallest-eigenvalue eigenvector of the symmetric 4x4 system.
    _, vecs = jnp.linalg.eigh(ata)
    x = vecs[..., :, 0]  # eigenvalues ascending -> first column
    w = x[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return x[..., :3] / w[..., None]


def triangulate_linear3(p1, p2, uv1, uv2):
    """Inhomogeneous DLT: solve the 4x3 least-squares system A x = b with
    w fixed to 1, via closed-form 3x3 normal equations.

    Algebraically the same linear system as `triangulate_dlt` for finite
    points; avoids the batched 4x4 eigendecomposition (iterative on TPU,
    ~4x the cost of the whole rest of the triangulation program). Points
    near infinity (w -> 0) come out with huge coordinates and are rejected
    by the standard cheirality/reprojection gates, exactly like the
    reference rejects them after its SVD (src/LocalMapping.cc:352-366).
    """
    p1 = jnp.broadcast_to(p1, uv1.shape[:-1] + (3, 4))
    p2 = jnp.broadcast_to(p2, uv2.shape[:-1] + (3, 4))
    rows = [
        uv1[..., 0, None] * p1[..., 2, :] - p1[..., 0, :],
        uv1[..., 1, None] * p1[..., 2, :] - p1[..., 1, :],
        uv2[..., 0, None] * p2[..., 2, :] - p2[..., 0, :],
        uv2[..., 1, None] * p2[..., 2, :] - p2[..., 1, :],
    ]
    a_full = jnp.stack(rows, axis=-2)          # (..., 4, 4)
    a = a_full[..., :3]
    b = -a_full[..., 3]
    ata = jnp.swapaxes(a, -1, -2) @ a          # (..., 3, 3)
    atb = jnp.einsum("...ij,...i->...j", a, b)
    # closed-form 3x3 inverse via adjugate
    m = ata
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
    c02 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c10 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
    c12 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
    c20 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    c21 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
    c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    det = (m[..., 0, 0] * c00 + m[..., 0, 1] * c10 + m[..., 0, 2] * c20)
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    inv = jnp.stack([
        jnp.stack([c00, c01, c02], -1),
        jnp.stack([c10, c11, c12], -1),
        jnp.stack([c20, c21, c22], -1),
    ], -2) / det[..., None, None]
    return jnp.einsum("...ij,...j->...i", inv, atb)


def parallax_cos(pts, c1, c2):
    """Cosine of the parallax angle at each point between camera centers."""
    n1 = pts - c1
    n2 = pts - c2
    d1 = jnp.linalg.norm(n1, axis=-1)
    d2 = jnp.linalg.norm(n2, axis=-1)
    return jnp.sum(n1 * n2, axis=-1) / jnp.clip(d1 * d2, 1e-12, None)


def reprojection_error_sq(cam_fx, cam_fy, cam_cx, cam_cy, t_cw, pts_w, uv):
    """Squared pixel reprojection error of world points under pose Tcw."""
    r = t_cw[..., :3, :3]
    t = t_cw[..., :3, 3]
    pc = pts_w @ jnp.swapaxes(r, -1, -2) + t[..., None, :] if pts_w.ndim > t_cw.ndim - 1 else (r @ pts_w[..., None])[..., 0] + t
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam_fx * pc[..., 0] * inv_z + cam_cx
    v = cam_fy * pc[..., 1] * inv_z + cam_cy
    du = u - uv[..., 0]
    dv = v - uv[..., 1]
    return du * du + dv * dv, z
