"""Spatially-spread top-K keypoint selection (octree-NMS replacement).

The reference spreads keypoints with ``DistributeOctTree`` (reference
src/ORBextractor.cc:239-458): subdivide until #nodes >= budget, keep the
best keypoint per node. That is a pointer-chasing recursion; the TPU-native
equivalent is grid-bucketed ranked selection with identical intent: divide
the level into ~budget cells, rank candidates within each cell, and take the
globally-best `budget` candidates ordered by (cell_rank, -score) so every
cell's winner is preferred before any cell's runner-up.

Everything is static-shape: output is exactly (budget,) slots + validity.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

K_CELL = 4  # candidates retained per cell before global ranking


def grid_dims(h: int, w: int, budget: int):
    """Pick a cell grid with roughly `budget` cells matching the aspect."""
    gy = max(int(round(math.sqrt(budget * h / max(w, 1)))), 1)
    gx = max((budget + gy - 1) // gy, 1)
    return gy, gx


def select_spread_topk(score, budget: int, border: int = 16):
    """Select up to `budget` spread keypoints from an NMS'd score map.

    Args:
      score: (H, W) float32, zero at non-corners.
      budget: static int, number of output slots.
      border: exclusion margin in pixels (descriptor patch safety).

    Returns:
      xy: (budget, 2) float32 (x, y) level coordinates.
      resp: (budget,) float32 scores.
      valid: (budget,) bool.
    """
    h, w = score.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ok = (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)
    score = jnp.where(ok, score, 0.0)

    gy, gx = grid_dims(h, w, budget)
    ch = -(-h // gy)  # cell height (ceil)
    cw = -(-w // gx)
    ph, pw = gy * ch, gx * cw
    padded = jnp.pad(score, ((0, ph - h), (0, pw - w)))
    cells = padded.reshape(gy, ch, gx, cw).transpose(0, 2, 1, 3).reshape(gy * gx, ch * cw)

    k = min(K_CELL, ch * cw)
    # top-k via k rounds of (max, argmax, mask-out): for k=4 this is pure
    # VPU reduction work and beats lax.top_k's sort-based lowering on TPU
    col = jax.lax.broadcasted_iota(jnp.int32, cells.shape, 1)
    cur = cells
    scores_l, args_l = [], []
    for _ in range(k):
        am = jnp.argmax(cur, axis=1)
        scores_l.append(jnp.max(cur, axis=1))
        args_l.append(am)
        cur = jnp.where(col == am[:, None], -jnp.inf, cur)
    cell_scores = jnp.stack(scores_l, axis=1)  # (G, k)
    cell_arg = jnp.stack(args_l, axis=1)
    # flat pixel coords of each candidate
    cy = cell_arg // cw
    cx = cell_arg % cw
    gyi = jax.lax.broadcasted_iota(jnp.int32, (gy * gx, k), 0) // gx
    gxi = jax.lax.broadcasted_iota(jnp.int32, (gy * gx, k), 0) % gx
    abs_y = gyi * ch + cy
    abs_x = gxi * cw + cx

    flat_scores = cell_scores.reshape(-1)
    flat_rank = jax.lax.broadcasted_iota(jnp.int32, (gy * gx, k), 1).reshape(-1)
    flat_y = abs_y.reshape(-1)
    flat_x = abs_x.reshape(-1)
    pos = flat_scores > 0.0

    # Order by (rank asc, score desc): all cell winners first, then runners-up.
    # Invalid slots get -inf keys.
    key = jnp.where(pos, -flat_rank.astype(jnp.float32) * 1e6 + jnp.minimum(flat_scores, 1e5), -jnp.inf)
    take = min(budget, key.shape[0])
    top_key, top_idx = jax.lax.top_k(key, take)
    sel_y = flat_y[top_idx]
    sel_x = flat_x[top_idx]
    sel_s = flat_scores[top_idx]
    sel_valid = top_key > -jnp.inf

    pad = budget - take
    if pad > 0:
        sel_y = jnp.pad(sel_y, (0, pad))
        sel_x = jnp.pad(sel_x, (0, pad))
        sel_s = jnp.pad(sel_s, (0, pad))
        sel_valid = jnp.pad(sel_valid, (0, pad))

    xy = jnp.stack([sel_x.astype(jnp.float32), sel_y.astype(jnp.float32)], axis=-1)
    return xy, sel_s, sel_valid
