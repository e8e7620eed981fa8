"""Concentric-ring binary descriptors: BRISK (brisk48) and FREAK
(anyfeat_bin's descriptor).

The reference's brisk48 uses the external brisk library's
BriskDescriptorExtractor v2 (reference src/Feature_brisk48.cpp:44-47,
48-byte NORM_HAMMING at :63-65); anyfeat_bin uses cv::FREAK
(src/Feature_anyFeatBin.cpp:44-51, 64-byte NORM_HAMMING at :65-67).
Both are ring-sampling constructions, implemented here from their papers:

BRISK (Leutenegger et al., ICCV 2011): 60 sample points on 4 concentric
rings + center; each point smoothed by a Gaussian whose sigma is
proportional to the point spacing on its ring; descriptor bits compare
smoothed intensities of the SHORT-distance pairs; orientation is the
length-weighted average gradient over the LONG-distance pairs
g = sum (I(pi)-I(pj)) * (pi-pj)/|pi-pj|^2. brisk48 = 384 bits: the 384
shortest pairs (deterministic; the brisk library's own limit is distance
< 9.75, which yields ~390 pairs at this geometry).

FREAK (Alahi et al., CVPR 2012): 43 retinal receptive fields — 1 foveal
center + 6 fields on each of 7 rings — with field size (smoothing sigma)
growing exponentially with eccentricity and overlapping fields;
orientation from 45 symmetric opposing pairs, BRISK-style. The published
selection of 512 descriptor pairs is LEARNED from data; we do not copy
it — pairs here are ordered coarse-to-fine by combined field size and
subsampled deterministically to 512 (documented stand-in; internal
consistency is what the downstream pipeline needs).

TPU-native sampling, same design as frontend/brief.py: one patch gather
per keypoint; "smooth at point p with sigma_p, rotated by theta_r" is a
constant Gaussian-stamp matrix column; descriptor bits for all rotation
steps come from ONE (N, P^2) x (P^2, N_ROT * n_bits) MXU matmul and a
one-hot rotation selection. The ring orientation is two more columns of
the same patch matmul (computed in the unrotated frame).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .orientation import gather_patches

N_ROT = 16

# ---------------------------------------------------------------- patterns


def brisk_pattern():
    """BRISK sampling geometry at pattern scale 1 (≈ level pixels).

    Returns (points (60,2) float32, sigmas (60,), short_pairs (384,2) int,
    long_pairs (L,2) int)."""
    radii = (0.0, 2.9, 4.9, 7.4, 10.8)
    counts = (1, 10, 14, 15, 20)
    pts, sigmas = [], []
    for r, n in zip(radii, counts):
        for k in range(n):
            th = 2.0 * math.pi * k / n + (0.5 * math.pi / n if r > 0 else 0.0)
            pts.append((r * math.cos(th), r * math.sin(th)))
            # sigma proportional to in-ring point spacing (paper Sec 4.2)
            sigmas.append(max(0.55, 0.85 * r * math.sin(math.pi / n)) if r > 0 else 0.55)
    pts = np.asarray(pts, np.float32)
    sigmas = np.asarray(sigmas, np.float32)

    n = len(pts)
    ii, jj = np.triu_indices(n, k=1)
    d = np.linalg.norm(pts[ii] - pts[jj], axis=1)
    order = np.argsort(d, kind="stable")
    short = np.stack([ii[order[:384]], jj[order[:384]]], axis=1)
    long_mask = d > 13.67
    long_pairs = np.stack([ii[long_mask], jj[long_mask]], axis=1)
    return pts, sigmas, short.astype(np.int64), long_pairs.astype(np.int64)


def freak_pattern():
    """FREAK retinal geometry: 1 fovea + 7 rings x 6 fields.

    Returns (points (43,2), sigmas (43,), pairs (512,2), ori_pairs (45,2)).
    """
    n_rings = 7
    pts = [(0.0, 0.0)]
    sigmas = [0.6]
    for k in range(n_rings):            # k=0 innermost .. 6 outermost
        r = 1.4 * (1.35 ** k) * 1.6     # exponential eccentricity, ~2.2..14
        # overlapping fields growing with eccentricity, capped so the
        # 3-sigma stamp stays inside the patch (uncapped 0.55*r reaches
        # sigma 7.5 at the outer ring: the stamp clips at the patch edge
        # and the over-smoothed field kills discrimination + orientation
        # repeatability)
        s = max(0.6, min(0.45 * r, 2.5))
        for m in range(6):
            th = 2.0 * math.pi * m / 6 + (math.pi / 6 if k % 2 else 0.0)
            pts.append((r * math.cos(th), r * math.sin(th)))
            sigmas.append(s)
    pts = np.asarray(pts, np.float32)
    sigmas = np.asarray(sigmas, np.float32)

    n = len(pts)                         # 43
    ii, jj = np.triu_indices(n, k=1)     # 903 pairs
    size = sigmas[ii] + sigmas[jj]
    # coarse-to-fine ordering, deterministic subsample to 512
    order = np.argsort(-size, kind="stable")
    keep = order[np.linspace(0, len(order) - 1, 512).round().astype(int)]
    pairs = np.stack([ii[keep], jj[keep]], axis=1)

    # orientation: LONG-baseline pairs only (distance > 20, i.e. opposing
    # fields on the outer rings). Short-baseline opposing pairs on inner
    # rings (4 px apart) make the gradient estimate unstable — measured
    # ~8 deg median frame-to-frame angle noise vs ~3 deg with long pairs,
    # which scatters the rotation-quantized descriptor across steps and
    # halves matching precision. (FREAK's published 45 pairs are likewise
    # dominated by long symmetric baselines.)
    dist = np.linalg.norm(pts[ii] - pts[jj], axis=1)
    long_mask = dist > 20.0
    opairs = np.stack([ii[long_mask], jj[long_mask]], axis=1).astype(np.int64)
    return pts, sigmas, pairs, opairs


# ------------------------------------------------------- matrix construction


def _stamp(m, col, px: float, py: float, sigma: float, P: int, sign: float):
    """Accumulate a unit-mass Gaussian stamp centered at patch coords
    (px, py) (origin at patch center) into column `col` of (P*P, C) m."""
    r = max(1, int(math.ceil(3.0 * sigma)))
    c = (P - 1) / 2.0
    x, y = px + c, py + c
    x0, y0 = int(math.floor(x - r)), int(math.floor(y - r))
    xs = np.arange(max(x0, 0), min(x0 + 2 * r + 2, P))
    ys = np.arange(max(y0, 0), min(y0 + 2 * r + 2, P))
    if len(xs) == 0 or len(ys) == 0:
        return
    wx = np.exp(-((xs - x) ** 2) / (2 * sigma * sigma))
    wy = np.exp(-((ys - y) ** 2) / (2 * sigma * sigma))
    w = np.outer(wy, wx)
    w /= max(w.sum(), 1e-12)
    rows = (ys[:, None] * P + xs[None, :]).reshape(-1)
    m[rows, col] += sign * w.reshape(-1)


_MAT_CACHE: dict = {}


def _ring_matrices(kind: str, radius: int):
    """Build (desc (P*P, N_ROT*n_bits), ori (P*P, 2)) constants."""
    key = (kind, radius)
    got = _MAT_CACHE.get(key)
    if got is not None:
        return got
    if kind == "brisk":
        pts, sigmas, pairs, opairs = brisk_pattern()
    else:
        pts, sigmas, pairs, opairs = freak_pattern()
    P = 2 * radius + 1
    n_bits = pairs.shape[0]
    desc = np.zeros((P * P, N_ROT * n_bits), np.float32)
    for r in range(N_ROT):
        th = 2.0 * math.pi * r / N_ROT
        ca, sa = math.cos(th), math.sin(th)
        rx = pts[:, 0] * ca - pts[:, 1] * sa
        ry = pts[:, 0] * sa + pts[:, 1] * ca
        for b, (i, j) in enumerate(pairs):
            col = r * n_bits + b
            # bit = I(p_i) < I(p_j)  ->  stamp(+p_j) + stamp(-p_i) > 0
            _stamp(desc, col, rx[j], ry[j], sigmas[j], P, +1.0)
            _stamp(desc, col, rx[i], ry[i], sigmas[i], P, -1.0)

    # orientation g = sum_pairs (I(p_i) - I(p_j)) (p_i - p_j) / |p_i - p_j|^2
    ori = np.zeros((P * P, 2), np.float32)
    for (i, j) in opairs:
        dvec = pts[i] - pts[j]
        d2 = float(dvec @ dvec)
        if d2 < 1e-9:
            continue
        for col in (0, 1):
            comp = float(dvec[col]) / d2
            _stamp(ori, col, pts[i, 0], pts[i, 1], sigmas[i], P, comp)
            _stamp(ori, col, pts[j, 0], pts[j, 1], sigmas[j], P, -comp)
    _MAT_CACHE[key] = (desc, ori)
    return desc, ori


PATCH_RADIUS = {"brisk": 16, "freak": 22}  # cover ring extent + 3-sigma stamps
N_BITS = {"brisk": 384, "freak": 512}


def describe_ring(img, xy, valid, kind: str):
    """BRISK/FREAK descriptors from the RAW level image (per-point Gaussian
    smoothing lives in the constant stamps).

    Returns (angle (N,), bits (N, n_bits) uint8)."""
    radius = PATCH_RADIUS[kind]
    n_bits = N_BITS[kind]
    n = xy.shape[0]
    P = 2 * radius + 1
    flat = gather_patches(img, xy, radius).reshape(n, P * P)

    desc_m, ori_m = _ring_matrices(kind, radius)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    g = jnp.dot(flat, jnp.asarray(ori_m), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (N, 2)
    angle = jnp.arctan2(g[:, 1], g[:, 0])

    diffs = jnp.dot(flat.astype(jnp.bfloat16), jnp.asarray(desc_m, jnp.bfloat16),
                    **kw).reshape(n, N_ROT, n_bits)
    step = jnp.round(angle * (N_ROT / (2.0 * jnp.pi))).astype(jnp.int32) % N_ROT
    onehot = jax.nn.one_hot(step, N_ROT, dtype=diffs.dtype)
    picked = jnp.einsum("nrk,nr->nk", diffs, onehot)
    bits = (picked > 0).astype(jnp.uint8)
    bits = jnp.where(valid[:, None], bits, 0)
    return angle, bits
