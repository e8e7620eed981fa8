"""Gradient-histogram float descriptors (the non-binary descriptor family).

Covers the reference's float descriptors under one parameterized
construction: sift128 (4x4 spatial cells x 8 orientation bins = 128-d,
L2-normalized — the classic SIFT layout, Lowe 2004), surf64 / kaze64 (4x4
cells x 4 components = 64-d, SURF-style |dx|,|dy| sums, Bay 2006), and
anyFeatNonBin's VGG-48 (4x4 x 3 = 48-d). Distances are NORM_L2SQR exactly
as the reference dispatches them (src/FeatureMatcher.cc:1508-1531), and the
unit normalization keeps the reference yaml matchingTh values (0.5 / 0.04 /
0.1) in-range.

One fused program: gather a rotated PATCH x PATCH grid of bilinear samples
per keypoint, finite-difference gradients, rotate gradient vectors into the
keypoint frame, soft-assign into spatial cells, reduce.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

PATCH = 20          # samples per side (covering a 20x20 rotated window)
CELLS = 4           # 4x4 spatial cells
_SPACING = 1.0      # sample spacing in pixels at the keypoint's level


def _grid():
    half = (PATCH - 1) / 2.0
    ys, xs = np.mgrid[0:PATCH, 0:PATCH].astype(np.float32)
    return (xs - half) * _SPACING, (ys - half) * _SPACING


_GX, _GY = _grid()
_CELL_OF = np.clip(
    (np.mgrid[0:PATCH, 0:PATCH][0] * CELLS // PATCH), 0, CELLS - 1
)  # row cell index per sample row


def _bilinear(img, x, y):
    h, w = img.shape
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    flat = img.reshape(-1)

    def at(yy, xx):
        return flat[yy * w + xx]

    return (
        at(y0, x0) * (1 - fx) * (1 - fy)
        + at(y0, x0 + 1) * fx * (1 - fy)
        + at(y0 + 1, x0) * (1 - fx) * fy
        + at(y0 + 1, x0 + 1) * fx * fy
    )


def describe_grad(img, xy, angle, valid, dim: int = 128):
    """Float descriptors (N, dim), unit L2 norm. dim in {48, 64, 128}."""
    n_comp = {128: 8, 64: 4, 48: 3}[dim]
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    gx = jnp.asarray(_GX).reshape(-1)
    gy = jnp.asarray(_GY).reshape(-1)
    # rotate sample grid into image coords
    sx = xy[:, 0:1] + gx[None, :] * ca[:, None] - gy[None, :] * sa[:, None]
    sy = xy[:, 1:2] + gx[None, :] * sa[:, None] + gy[None, :] * ca[:, None]
    # sample gradients by central differences along the ROTATED axes
    eps = 0.5
    dxp = _bilinear(img, sx + eps * ca[:, None], sy + eps * sa[:, None])
    dxm = _bilinear(img, sx - eps * ca[:, None], sy - eps * sa[:, None])
    dyp = _bilinear(img, sx - eps * sa[:, None], sy + eps * ca[:, None])
    dym = _bilinear(img, sx + eps * sa[:, None], sy - eps * ca[:, None])
    dx = dxp - dxm  # gradient along keypoint x-axis
    dy = dyp - dym  # gradient along keypoint y-axis

    # spatial cell assignment (static per sample)
    cell_row = jnp.asarray(_CELL_OF.reshape(-1))
    cell_col = jnp.asarray(_CELL_OF.T.reshape(-1))
    cell_id = cell_row * CELLS + cell_col  # (P*P,)

    if n_comp == 8:
        # SIFT: 8-bin orientation histogram weighted by magnitude
        mag = jnp.sqrt(dx * dx + dy * dy + 1e-12)
        ori = jnp.arctan2(dy, dx)  # [-pi, pi]
        binf = (ori + jnp.pi) * (8 / (2 * jnp.pi))
        b0 = jnp.clip(binf.astype(jnp.int32) % 8, 0, 7)
        feat_idx = cell_id[None, :] * 8 + b0
        desc = jax.vmap(
            lambda fi, mg: jnp.zeros((CELLS * CELLS * 8,), jnp.float32).at[fi].add(mg)
        )(feat_idx, mag)
    elif n_comp == 4:
        # SURF: per cell [sum dx, sum |dx|, sum dy, sum |dy|]
        comps = jnp.stack([dx, jnp.abs(dx), dy, jnp.abs(dy)], axis=-1)  # (N, P2, 4)
        desc = jax.vmap(
            lambda c: jnp.zeros((CELLS * CELLS, 4), jnp.float32).at[cell_id].add(c)
        )(comps).reshape(-1, CELLS * CELLS * 4)
    else:
        # VGG-ish 3 components: [sum |dx|, sum |dy|, sum mag]
        mag = jnp.sqrt(dx * dx + dy * dy + 1e-12)
        comps = jnp.stack([jnp.abs(dx), jnp.abs(dy), mag], axis=-1)
        desc = jax.vmap(
            lambda c: jnp.zeros((CELLS * CELLS, 3), jnp.float32).at[cell_id].add(c)
        )(comps).reshape(-1, CELLS * CELLS * 3)

    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.clip(norm, 1e-8, None)
    # SIFT-style clamp + renormalize (illumination robustness)
    desc = jnp.minimum(desc, 0.25)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.clip(norm, 1e-8, None)
    return jnp.where(valid[:, None], desc, 0.0)
