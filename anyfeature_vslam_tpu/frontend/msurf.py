"""M-SURF 64-d descriptor (kaze64 / surf64 families).

The reference's kaze64 is cv::KAZE's M-SURF on nonlinear-scale-space
derivatives (reference src/Feature_kaze64.cpp:21-33, NORM_L2SQR at
:63-65); surf64 is cv::xfeatures2d::SURF's descriptor on image Haar
responses (src/Feature_surf64.cpp:30-36). Construction (Bay et al. 2006,
Alcantarilla 2012): a 20s x 20s window oriented along the keypoint angle,
4x4 subregions, per subregion Gaussian-weighted sums of the rotated
gradient responses [sum dx, sum |dx|, sum dy, sum |dy|] -> 64 dims,
L2-normalized.

TPU-native construction — different from frontend/graddesc.py and cheaper
for scale-covariant spacing: gradients are sampled on a FIXED axis-aligned
lattice (one rotation-independent constant bilinear matrix per static
sample spacing), gradient VECTORS are rotated into the keypoint frame with
the continuous angle, and only the cell-assignment weights — Gaussian
soft-assignment of each rotated lattice point to the 4x4 subregions — are
rotation-quantized ((N_ROT, S*S, 16) tiny constants). This keeps one
(patch_px, lattice) matmul per channel regardless of rotation resolution.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .orientation import gather_patches

CELLS = 4                   # 4x4 subregions
HALF_CELLS = CELLS / 2.0
CELL_SIZE = 5.0             # subregion width in spacing units (20/4)
LATTICE = 26                # 26x26 axis-aligned sample lattice (extent
                            # +/-12.5 spacing units; the rotated window's
                            # far corners beyond that carry Gaussian weight
                            # < 0.1 and are dropped)
_N_SAMP = LATTICE * LATTICE
N_ROT = 16                  # cell-assignment rotation quantization
WEIGHT_SIGMA = 3.3          # per-cell Gaussian, spacing units (SURF ~3.3s)

_BIT = None  # placeholder to mirror module style


def patch_radius(spacing: float) -> int:
    """Static patch half-size covering the lattice extent."""
    half = (LATTICE - 1) / 2.0 * spacing
    return int(math.ceil(half)) + 2


def _lattice_coords():
    half = (LATTICE - 1) / 2.0
    ys, xs = np.mgrid[0:LATTICE, 0:LATTICE].astype(np.float32)
    return xs - half, ys - half   # spacing units


_LX, _LY = _lattice_coords()

_SAMPLE_CACHE: dict = {}


def _sample_matrix(spacing: float, radius: int):
    """(P*P, LATTICE^2) bilinear sampling matrix at `spacing` px/step."""
    key = (round(spacing, 4), radius)
    got = _SAMPLE_CACHE.get(key)
    if got is not None:
        return got
    P = 2 * radius + 1
    gx = (_LX * spacing).reshape(-1)
    gy = (_LY * spacing).reshape(-1)
    x = np.clip(gx + radius, 0.0, P - 1.001)
    y = np.clip(gy + radius, 0.0, P - 1.001)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = x - x0
    fy = y - y0
    m = np.zeros((P * P, _N_SAMP), np.float32)
    cols = np.arange(_N_SAMP)
    for dy, dx, w in (
        (0, 0, (1 - fx) * (1 - fy)),
        (0, 1, fx * (1 - fy)),
        (1, 0, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        np.add.at(m, ((y0 + dy) * P + (x0 + dx), cols), w)
    _SAMPLE_CACHE[key] = m
    return m


_CELLW = None


def _cell_weights():
    """(N_ROT, LATTICE^2, 16) Gaussian soft assignment of each lattice
    point (rotated into the keypoint frame) to the 4x4 subregion centers
    at (-7.5, -2.5, 2.5, 7.5) spacing units."""
    global _CELLW
    if _CELLW is not None:
        return _CELLW
    centers = (np.arange(CELLS, dtype=np.float32) - (CELLS - 1) / 2.0) * CELL_SIZE
    out = np.zeros((N_ROT, _N_SAMP, CELLS * CELLS), np.float32)
    gx = _LX.reshape(-1)
    gy = _LY.reshape(-1)
    inv2s2 = 1.0 / (2.0 * WEIGHT_SIGMA * WEIGHT_SIGMA)
    for r in range(N_ROT):
        th = 2.0 * math.pi * r / N_ROT
        ca, sa = math.cos(th), math.sin(th)
        # inverse-rotate lattice points into the keypoint frame
        u = gx * ca + gy * sa
        v = -gx * sa + gy * ca
        for cy in range(CELLS):
            for cx in range(CELLS):
                du = u - centers[cx]
                dv = v - centers[cy]
                w = np.exp(-(du * du + dv * dv) * inv2s2)
                # hard cutoff: a sample only feeds cells it falls within
                # (half-cell overlap, as M-SURF's overlapping subregions)
                w = np.where(
                    (np.abs(du) < CELL_SIZE) & (np.abs(dv) < CELL_SIZE), w, 0.0
                )
                out[r, :, cy * CELLS + cx] = w
    _CELLW = out
    return out


def describe_msurf(gx_map, gy_map, xy, angle, valid, spacing: float):
    """M-SURF descriptors from gradient maps.

    Args:
      gx_map, gy_map: (h, w) gradient channels (image Haar/central-diff for
        surf64; evolution Lx/Ly for kaze64).
      xy: (N, 2) float keypoint coords in the maps' pixel units.
      angle: (N,) keypoint orientation radians.
      valid: (N,) bool.
      spacing: static sample step in pixels (the keypoint scale s).

    Returns: (N, 64) float32, unit L2 norm.
    """
    radius = patch_radius(spacing)
    n = xy.shape[0]
    P = 2 * radius + 1
    pgx = gather_patches(gx_map, xy, radius).reshape(n, P * P)
    pgy = gather_patches(gy_map, xy, radius).reshape(n, P * P)
    return describe_from_flat(pgx, pgy, angle, valid, spacing, radius)


def describe_kaze(gx_map, gy_map, xy, valid, spacing: float):
    """KAZE-style: one patch gather shared between the SURF sliding-window
    main orientation and the M-SURF descriptor.

    Returns: (angle (N,), desc (N, 64))."""
    from .mldb import main_orientation

    radius = patch_radius(spacing)
    n = xy.shape[0]
    P = 2 * radius + 1
    pgx = gather_patches(gx_map, xy, radius).reshape(n, P * P)
    pgy = gather_patches(gy_map, xy, radius).reshape(n, P * P)
    angle = main_orientation(pgx, pgy, spacing, radius)
    return angle, describe_from_flat(pgx, pgy, angle, valid, spacing, radius)


def describe_from_flat(pgx, pgy, angle, valid, spacing: float, radius: int):
    """M-SURF from pre-gathered flat gradient patches (N, P*P)."""
    n = pgx.shape[0]
    s = jnp.asarray(_sample_matrix(spacing, radius), jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    sgx = jnp.dot(pgx.astype(jnp.bfloat16), s, **kw)  # (N, 900)
    sgy = jnp.dot(pgy.astype(jnp.bfloat16), s, **kw)

    # rotate gradient vectors into the keypoint frame (continuous angle)
    ca, sa = jnp.cos(angle)[:, None], jnp.sin(angle)[:, None]
    dx = ca * sgx + sa * sgy
    dy = -sa * sgx + ca * sgy

    step = jnp.round(angle * (N_ROT / (2.0 * jnp.pi))).astype(jnp.int32) % N_ROT
    w_all = jnp.asarray(_cell_weights(), jnp.bfloat16)   # (R, S, 16)
    onehot = jax.nn.one_hot(step, N_ROT, dtype=w_all.dtype)
    w_sel = jnp.einsum("nr,rsc->nsc", onehot, w_all)      # (N, 900, 16)

    comps = jnp.stack([dx, jnp.abs(dx), dy, jnp.abs(dy)], axis=-1)  # (N,900,4)
    desc = jnp.einsum(
        "nsk,nsc->nck", comps.astype(jnp.bfloat16), w_sel, **kw
    ).reshape(n, CELLS * CELLS * 4)

    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.clip(norm, 1e-8, None)
    return jnp.where(valid[:, None], desc, 0.0)
