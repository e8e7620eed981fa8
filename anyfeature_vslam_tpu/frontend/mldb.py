"""M-LDB descriptor + main orientation for the AKAZE family (akaze61).

The reference's akaze61 descriptor is libAKAZE's Modified Local Difference
Binary (reference src/Feature_akaze61.cpp:35-77 runs Compute_Descriptors on
the nonlinear scale space; 61-byte NORM_HAMMING at :75-77): around each
keypoint a square window of half-width ``10 * sigma`` (in the evolution
level's pixel units) is rotated into the keypoint frame and subdivided into
2x2, 3x3 and 4x4 grids; per cell the MEANS of three channels — diffused
intensity L and the scale-space derivatives Lx, Ly rotated into the
keypoint frame — are compared pairwise within each grid:

  (C(4,2) + C(9,2) + C(16,2)) * 3 channels = (6 + 36 + 120) * 3 = 486 bits,

packed into 61 bytes (486 -> 488 with 2 zero pad bits).

Main orientation is AKAZE's (inherited from SURF): gradient samples
(Lx, Ly) on a disc lattice of radius 6*sigma with Gaussian(2.5*sigma)
weights; a pi/3-wide window slides over sample angles and the orientation
is the direction of the largest accumulated vector.

TPU-native construction (same design as frontend/brief.py): nothing is
gathered per sample point. One patch per keypoint per channel is pulled
with the shared MXU one-hot gather; "rotate the grid, average each cell"
is a constant (patch_px, N_ROT * 29) matrix per evolution sigma (sigma is
static per level, so the matrices are trace-time literals); the keypoint
angle is quantized to N_ROT steps and selected by one-hot. Cell means of
Lx/Ly are rotated into the keypoint frame after sampling (means are
linear, so sample-then-rotate is exact).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .orientation import gather_patches

GRIDS = (2, 3, 4)
N_CELLS = sum(d * d for d in GRIDS)          # 29
N_PAIRS = sum(d * d * (d * d - 1) // 2 for d in GRIDS)  # 162
N_BITS = 3 * N_PAIRS                          # 486
N_BITS_PADDED = 488                           # 61 bytes
PATTERN_SIZE = 10.0                           # libAKAZE pattern_size
N_ROT = 16                                    # 22.5 deg rotation quantization

# orientation: disc lattice |i|,|j| <= 6, i^2+j^2 < 36, step = sigma
_ORI_IJ = np.array(
    [(i, j) for i in range(-6, 7) for j in range(-6, 7) if i * i + j * j < 36],
    np.float32,
)  # (109, 2) (x, y) lattice units
N_ORI_BINS = 42                               # ~0.15 rad slide steps
ORI_WINDOW = 7                                # ceil((pi/3) / (2pi/42)) = 7 bins

_BIT_WEIGHTS = (1 << np.arange(8)).astype(np.uint8)


def patch_radius(sigma_rel: float) -> int:
    """Static per-level patch half-size: covers the rotated MLDB window
    (10*sigma*sqrt(2)) and the orientation disc (6*sigma + stamp)."""
    return int(math.ceil(PATTERN_SIZE * sigma_rel * math.sqrt(2.0))) + 2


def _bilinear_stamp(m, px, py, cols, w, P):
    """Accumulate bilinear weights w at float patch coords (px, py) into
    matrix m[:, cols] (numpy, build time)."""
    x = np.clip(px + (P - 1) / 2.0, 0.0, P - 1.001)
    y = np.clip(py + (P - 1) / 2.0, 0.0, P - 1.001)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = x - x0
    fy = y - y0
    for dy, dx, ww in (
        (0, 0, (1 - fx) * (1 - fy)),
        (0, 1, fx * (1 - fy)),
        (1, 0, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        np.add.at(m, ((y0 + dy) * P + (x0 + dx), cols), w * ww)


_CELL_CACHE: dict = {}


def _cell_matrix(sigma_rel: float, radius: int):
    """(P*P, N_ROT * 29) constant: column (r * 29 + c) is the mean over
    cell c's sample lattice rotated by angle r * 2pi / N_ROT."""
    key = (round(sigma_rel, 4), radius)
    got = _CELL_CACHE.get(key)
    if got is not None:
        return got
    P = 2 * radius + 1
    half = PATTERN_SIZE * sigma_rel  # window half-width, pixels
    m = np.zeros((P * P, N_ROT * N_CELLS), np.float32)
    # per-grid sample density: ~16x16 stamps across the full window
    ns_of = {2: 8, 3: 6, 4: 4}
    for r in range(N_ROT):
        th = 2.0 * math.pi * r / N_ROT
        ca, sa = math.cos(th), math.sin(th)
        cell0 = 0
        for d in GRIDS:
            ns = ns_of[d]
            cw = 2.0 * half / d  # cell width
            for cy in range(d):
                for cx in range(d):
                    # sample lattice inside cell (cx, cy), window coords
                    u = -half + (cx + (np.arange(ns) + 0.5) / ns) * cw
                    v = -half + (cy + (np.arange(ns) + 0.5) / ns) * cw
                    uu, vv = np.meshgrid(u, v)
                    uu = uu.reshape(-1).astype(np.float32)
                    vv = vv.reshape(-1).astype(np.float32)
                    px = uu * ca - vv * sa
                    py = uu * sa + vv * ca
                    col = r * N_CELLS + cell0 + cy * d + cx
                    w = np.full(uu.shape, 1.0 / (ns * ns), np.float32)
                    _bilinear_stamp(m, px, py, np.full_like(uu, col, np.int64).astype(np.int64), w, P)
            cell0 += d * d
    _CELL_CACHE[key] = m
    return m


_ORI_CACHE: dict = {}


def _orientation_matrix(sigma_rel: float, radius: int):
    """(P*P, K) constant: column k bilinearly samples the patch at disc
    lattice point k (scaled by sigma), pre-multiplied by the Gaussian
    weight exp(-r^2 / (2 * 2.5^2)) in lattice units (libAKAZE gauss25)."""
    key = (round(sigma_rel, 4), radius)
    got = _ORI_CACHE.get(key)
    if got is not None:
        return got
    P = 2 * radius + 1
    K = _ORI_IJ.shape[0]
    m = np.zeros((P * P, K), np.float32)
    g = np.exp(-(_ORI_IJ[:, 0] ** 2 + _ORI_IJ[:, 1] ** 2) / (2.0 * 2.5 * 2.5))
    px = _ORI_IJ[:, 0] * sigma_rel
    py = _ORI_IJ[:, 1] * sigma_rel
    _bilinear_stamp(m, px, py, np.arange(K, dtype=np.int64), g.astype(np.float32), P)
    _ORI_CACHE[key] = m
    return m


_PAIR_CACHE: dict = {}


def _pair_matrices():
    """Two (29, 162) 0/1 selectors: bits = cell_means @ A  >  cell_means @ B
    where columns enumerate within-grid pairs (i < j) grid-major."""
    got = _PAIR_CACHE.get("p")
    if got is not None:
        return got
    a = np.zeros((N_CELLS, N_PAIRS), np.float32)
    b = np.zeros((N_CELLS, N_PAIRS), np.float32)
    col = 0
    cell0 = 0
    for d in GRIDS:
        n = d * d
        for i in range(n):
            for j in range(i + 1, n):
                a[cell0 + i, col] = 1.0
                b[cell0 + j, col] = 1.0
                col += 1
        cell0 += n
    _PAIR_CACHE["p"] = (a, b)
    return a, b


def main_orientation(lx_flat, ly_flat, sigma_rel: float, radius: int):
    """AKAZE/SURF sliding-window dominant orientation.

    Args:
      lx_flat, ly_flat: (N, P*P) flattened gradient patches.
      sigma_rel: level scale in its own pixel units (static).
      radius: the patch radius used for the gather (static).

    Returns: (N,) angle radians in [-pi, pi].
    """
    m = jnp.asarray(_orientation_matrix(sigma_rel, radius), jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    sx = jnp.dot(lx_flat.astype(jnp.bfloat16), m, **kw)  # (N, K)
    sy = jnp.dot(ly_flat.astype(jnp.bfloat16), m, **kw)
    ang = jnp.arctan2(sy, sx)  # per-sample gradient angle
    b = jnp.floor((ang + jnp.pi) * (N_ORI_BINS / (2.0 * jnp.pi))).astype(jnp.int32)
    b = jnp.clip(b, 0, N_ORI_BINS - 1)
    onehot = jax.nn.one_hot(b, N_ORI_BINS, dtype=sx.dtype)  # (N, K, B)
    bx = jnp.einsum("nk,nkb->nb", sx, onehot)
    by = jnp.einsum("nk,nkb->nb", sy, onehot)
    # circular pi/3 windowed sums over bins
    bx2 = jnp.concatenate([bx, bx[:, : ORI_WINDOW - 1]], axis=1)
    by2 = jnp.concatenate([by, by[:, : ORI_WINDOW - 1]], axis=1)
    wx = bx2[:, :N_ORI_BINS]
    wy = by2[:, :N_ORI_BINS]
    for k in range(1, ORI_WINDOW):
        wx = wx + bx2[:, k : k + N_ORI_BINS]
        wy = wy + by2[:, k : k + N_ORI_BINS]
    best = jnp.argmax(wx * wx + wy * wy, axis=1)
    oh = jax.nn.one_hot(best, N_ORI_BINS, dtype=wx.dtype)
    vx = jnp.sum(wx * oh, axis=1)
    vy = jnp.sum(wy * oh, axis=1)
    return jnp.arctan2(vy, vx)


def describe_mldb(L, Lx, Ly, xy, valid, sigma_rel: float):
    """M-LDB descriptors for one evolution level.

    Args:
      L, Lx, Ly: (h, w) evolution-level channels (level pixel units).
      xy: (N, 2) float keypoint coords in LEVEL pixels.
      valid: (N,) bool.
      sigma_rel: static level scale in level pixels.

    Returns:
      angle: (N,) float32 main orientation.
      bits: (N, 488) uint8 in {0,1} (486 MLDB bits + 2 zero pads).
    """
    radius = patch_radius(sigma_rel)
    n = xy.shape[0]
    P = 2 * radius + 1
    pl = gather_patches(L, xy, radius).reshape(n, P * P)
    px = gather_patches(Lx, xy, radius).reshape(n, P * P)
    py = gather_patches(Ly, xy, radius).reshape(n, P * P)

    angle = main_orientation(px, py, sigma_rel, radius)

    cm = jnp.asarray(_cell_matrix(sigma_rel, radius), jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    mL = jnp.dot(pl.astype(jnp.bfloat16), cm, **kw).reshape(n, N_ROT, N_CELLS)
    mX = jnp.dot(px.astype(jnp.bfloat16), cm, **kw).reshape(n, N_ROT, N_CELLS)
    mY = jnp.dot(py.astype(jnp.bfloat16), cm, **kw).reshape(n, N_ROT, N_CELLS)

    step = jnp.round(angle * (N_ROT / (2.0 * jnp.pi))).astype(jnp.int32) % N_ROT
    onehot = jax.nn.one_hot(step, N_ROT, dtype=mL.dtype)
    cL = jnp.einsum("nrc,nr->nc", mL, onehot)
    cX = jnp.einsum("nrc,nr->nc", mX, onehot)
    cY = jnp.einsum("nrc,nr->nc", mY, onehot)

    # rotate gradient means into the keypoint frame (quantized angle)
    th = step.astype(jnp.float32) * (2.0 * jnp.pi / N_ROT)
    ca, sa = jnp.cos(th)[:, None], jnp.sin(th)[:, None]
    dX = ca * cX + sa * cY
    dY = -sa * cX + ca * cY

    a, b = _pair_matrices()
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    bits_parts = []
    for ch in (cL, dX, dY):
        diff = jnp.dot(ch, a, **kw) - jnp.dot(ch, b, **kw)  # (N, 162)
        bits_parts.append((diff > 0).astype(jnp.uint8))
    bits = jnp.concatenate(bits_parts, axis=1)  # (N, 486)
    bits = jnp.pad(bits, ((0, 0), (0, N_BITS_PADDED - N_BITS)))
    bits = jnp.where(valid[:, None], bits, 0)
    return angle, bits
