"""Dense masked descriptor matching — the TPU replacement for FeatureMatcher.

The reference's nine guided searches (reference src/FeatureMatcher.cc, e.g.
SearchByProjection :73-154, SearchForInitialization :399-557, SearchByBoW
:186-283) are all nearest-neighbor loops over grid buckets with per-feature
thresholds, best/second-best ratio tests and a 30-bin rotation-consistency
histogram. Here each becomes: one dense [N_query, N_cand] distance matrix
(XOR-free Hamming via {0,1} int8 matmul on the MXU, or L2 via GEMM), a
boolean constraint mask (window / scale band / BoW node), and vectorized
best+second reductions. Capacity is static; invalid slots carry +inf.

Hamming trick: popcount(a XOR b) = pa + pb - 2 a.b for bit vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.float32(3.0e8)

HISTO_LENGTH = 30  # reference src/FeatureMatcher.cc:64
RADIUS_SCALE = 1.15  # reference src/FeatureMatcher.cc:65


def hamming_matrix(bits_a, bits_b):
    """(N, 256) x (M, 256) {0,1} uint8 -> (N, M) float32 Hamming distances.

    One int8 matmul rides the MXU; the rank-1 popcount corrections are fused
    adds. Matches the reference popcount distance exactly
    (src/Feature_orb32.cpp:67-84).
    """
    a = bits_a.astype(jnp.int8)
    b = bits_b.astype(jnp.int8)
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    pa = jnp.sum(bits_a.astype(jnp.int32), axis=-1)
    pb = jnp.sum(bits_b.astype(jnp.int32), axis=-1)
    return (pa[:, None] + pb[None, :] - 2 * dot).astype(jnp.float32)


def l2sq_matrix(a, b):
    """(N, D) x (M, D) float32 -> (N, M) squared L2 distances (GEMM path).

    Matches cv::NORM_L2SQR used by surf64/kaze64/sift128/r2d2
    (reference src/FeatureMatcher.cc:1508-1531).
    """
    dot = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    na = jnp.sum(a * a, axis=-1)
    nb = jnp.sum(b * b, axis=-1)
    return jnp.maximum(na[:, None] + nb[None, :] - 2.0 * dot, 0.0)


def descriptor_distance_matrix(a, b):
    """Distance dispatch by descriptor dtype (reference
    FeatureMatcher::DescriptorDistance, src/FeatureMatcher.cc:1508-1531):
    uint8 bit-planes -> Hamming, float -> squared L2. Dispatch happens at
    trace time (dtype is static)."""
    if a.dtype == jnp.uint8:
        return hamming_matrix(a, b)
    return l2sq_matrix(a, b)


def best_two(dist, mask):
    """Per-row best and second-best over masked candidates.

    Returns (best, best_idx, second) with best == INF where no candidate.
    """
    d = jnp.where(mask, dist, INF)
    best_idx = jnp.argmin(d, axis=-1)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=-1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(INF)
    second = jnp.min(d2, axis=-1)
    return best, best_idx, second


def resolve_unique(match_idx, match_dist, match_valid, n_cand: int):
    """Enforce one-query-per-candidate: among queries claiming the same
    candidate keep the smallest distance (the reference's duplicate handling
    in SearchForInitialization erases the previous claimant,
    src/FeatureMatcher.cc:463-481; keeping the better row is the
    order-independent equivalent). Returns updated validity."""
    # scatter-min distances per candidate
    big = jnp.full((n_cand,), INF)
    d = jnp.where(match_valid, match_dist, INF)
    best_per_cand = big.at[match_idx].min(d)
    keep = match_valid & (d <= best_per_cand[match_idx] + 1e-6)
    # ties (identical distance) could keep two rows; break by lowest row index
    row_ids = jnp.arange(match_idx.shape[0], dtype=jnp.int32)
    best_row = jnp.full((n_cand,), jnp.int32(2**31 - 1)).at[match_idx].min(
        jnp.where(keep, row_ids, 2**31 - 1)
    )
    return keep & (best_row[match_idx] == row_ids)


def rotation_consistency(angle_q, angle_c, match_idx, match_valid, keep_bins: int = 3):
    """30-bin rotation histogram filter (reference FeatureMatcher.cc:1579-1668).

    Computes per-match rotation angle_q - angle_c[match], histograms it into
    HISTO_LENGTH bins, and keeps matches falling in the top `keep_bins` bins.
    """
    rot = angle_q - angle_c[match_idx]
    rot = jnp.where(rot < 0, rot + 2.0 * jnp.pi, rot)
    rot = jnp.mod(rot, 2.0 * jnp.pi)
    binf = rot * (HISTO_LENGTH / (2.0 * jnp.pi))
    bins = jnp.clip(jnp.round(binf).astype(jnp.int32) % HISTO_LENGTH, 0, HISTO_LENGTH - 1)
    counts = jnp.zeros((HISTO_LENGTH,), jnp.int32).at[bins].add(match_valid.astype(jnp.int32))
    _, top = jax.lax.top_k(counts, keep_bins)
    in_top = jnp.any(bins[:, None] == top[None, :], axis=-1)
    return match_valid & in_top


def window_mask(xy_q, xy_c, radius):
    """(N,2),(M,2),(N,) or scalar -> (N,M) mask of candidates within a square
    search window (reference searches use square windows via the grid)."""
    dx = jnp.abs(xy_q[:, None, 0] - xy_c[None, :, 0])
    dy = jnp.abs(xy_q[:, None, 1] - xy_c[None, :, 1])
    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (xy_q.shape[0],))
    return (dx <= r[:, None]) & (dy <= r[:, None])


def octave_band_mask(oct_q, oct_c, min_delta: int, max_delta: int):
    """Candidate octave within [oct_q + min_delta, oct_q + max_delta]."""
    d = oct_c[None, :] - oct_q[:, None]
    return (d >= min_delta) & (d <= max_delta)


def size_band_mask(size_pred, size_c, lo: float = 1.0 / 1.5, hi: float = 1.5):
    """Candidate normalized size within a multiplicative band of the
    prediction (reference gates candidates by predicted size)."""
    ratio = size_c[None, :] / jnp.clip(size_pred[:, None], 1e-6, None)
    return (ratio >= lo) & (ratio <= hi)


def finish_match(
    best,
    best_idx,
    second,
    n_cand: int,
    match_th,
    ratio=None,
    angle_q=None,
    angle_c=None,
    unique: bool = True,
    ratio_mask=None,
):
    """Acceptance tests on precomputed best/second-best results (shared by
    the jnp `match` path and the fused Pallas kernel): distance threshold,
    best/second ratio, rotation-consistency histogram, unique-candidate
    resolution. Returns dict(idx, dist, valid)."""
    valid = (best < match_th) & (best_idx >= 0)
    if ratio is not None:
        ratio_ok = best < ratio * second
        if ratio_mask is not None:
            ratio_ok = ratio_ok | ~ratio_mask
        valid = valid & ratio_ok
    idx = jnp.maximum(best_idx, 0)  # keep gather indices in range
    if unique:
        valid = resolve_unique(idx, best, valid, n_cand)
    if angle_q is not None:
        # reference order: duplicates are resolved at claim time, the
        # rotation histogram prunes accepted matches last
        # (src/FeatureMatcher.cc:463-481, :1579-1668)
        valid = rotation_consistency(angle_q, angle_c, idx, valid)
    return dict(idx=idx, dist=best, valid=valid)


def guided_best_two(
    q_feat, c_feat, q_uv, c_uv, q_rad, q_slo, q_shi, c_size, c_valid
):
    """Masked best/second-best search: fused Pallas kernel on TPU, dense
    jnp path elsewhere. Gates: per-query square window of radius q_rad
    (negative radius disables the query row), candidate size in
    [q_slo, q_shi], candidate validity."""
    from . import pallas_match

    return pallas_match.best_two_auto(
        q_feat, c_feat, q_uv, c_uv, q_rad, q_slo, q_shi, c_size, c_valid
    )


def match(
    dist,
    mask,
    match_th,
    ratio=None,
    angle_q=None,
    angle_c=None,
    unique: bool = True,
    ratio_mask=None,
):
    """Generic guided matcher.

    Args:
      dist: (N, M) distances.
      mask: (N, M) candidate validity.
      match_th: scalar distance threshold (TH_LOW/TH_HIGH from settings).
      ratio: optional best/second ratio (e.g. 0.9); applied where ratio_mask.
      angle_q/angle_c: if given, apply rotation-consistency filter.
      unique: enforce one query per candidate.
      ratio_mask: (N,) bool — rows where the ratio test applies (reference
        applies it only when best & second share the octave in some searches).

    Returns dict(idx, dist, valid).
    """
    best, best_idx, second = best_two(dist, mask)
    valid = best < match_th
    if ratio is not None:
        ratio_ok = best < ratio * second
        if ratio_mask is not None:
            ratio_ok = ratio_ok | ~ratio_mask
        valid = valid & ratio_ok
    if angle_q is not None:
        valid = rotation_consistency(angle_q, angle_c, best_idx, valid)
    if unique:
        valid = resolve_unique(best_idx, best, valid, dist.shape[1])
    return dict(idx=best_idx, dist=best, valid=valid)
