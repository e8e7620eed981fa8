"""Vectorized FAST-9/16 corner detection over whole images.

The reference detects with cv::ORB's FAST (threshold ``detectTh``, reference
src/Feature_orb32.cpp:29-31) / the vanilla ORB-SLAM2 grid FAST (reference
src/ORBextractor.cc:460-556). A pointer-chasing per-pixel test is the wrong
shape for TPU; here the segment test runs as a dense stencil over the full
image: 16 shifted copies of the image, circular-arc window sums via cumsum,
and the FAST "V" score as a windowed min — all fused by XLA on the VPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (dy, dx), the standard FAST-16 ring in
# clockwise order starting from (-3, 0) (12 o'clock).
CIRCLE_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

ARC_LEN = 9  # FAST-9: at least 9 contiguous ring pixels brighter/darker


def _shift2d(img, dy: int, dx: int):
    """Shift image so out[y, x] = img[y + dy, x + dx], edge-padded."""
    h, w = img.shape
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    padded = jnp.pad(img, ((py1, py0), (px1, px0)), mode="edge")
    return jax.lax.dynamic_slice(padded, (py1 + dy, px1 + dx), (h, w))


@partial(jax.jit, static_argnames=())
def fast_score_map(img, threshold):
    """FAST-9/16 segment test + corner strength over a full image.

    Args:
      img: (H, W) float32 grayscale.
      threshold: scalar float detection threshold.

    Returns:
      score: (H, W) float32 corner strength (0 where not a corner). The
        strength is the FAST "V" measure: max over valid 9-arcs of the
        minimum absolute center difference within the arc — the largest
        threshold at which the pixel would still fire.
    """
    ring = jnp.stack([_shift2d(img, dy, dx) for dy, dx in CIRCLE_OFFSETS])  # (16, H, W)
    diff = ring - img[None]

    bright = diff > threshold  # ring pixel brighter than center + t
    dark = diff < -threshold

    def arc_any_and_strength(flags, signed_excess):
        """any-9-contiguous (circular) + max over arcs of min excess."""
        # circular extension to cover wrap-around arcs
        flags_ext = jnp.concatenate([flags, flags[: ARC_LEN - 1]], axis=0)  # (24, H, W)
        counts = jnp.cumsum(flags_ext.astype(jnp.int32), axis=0)
        zero = jnp.zeros_like(counts[:1])
        counts = jnp.concatenate([zero, counts], axis=0)  # (25, H, W)
        window = counts[ARC_LEN:] - counts[:-ARC_LEN]  # (16, H, W): arc sums
        is_arc = window == ARC_LEN  # arc starting at each ring index is all-true

        # windowed min of the signed excess over each 9-arc (for the score)
        exc_ext = jnp.concatenate([signed_excess, signed_excess[: ARC_LEN - 1]], axis=0)
        wmin = exc_ext[:16]
        for k in range(1, ARC_LEN):
            wmin = jnp.minimum(wmin, exc_ext[k : k + 16])
        strength = jnp.max(jnp.where(is_arc, wmin, -jnp.inf), axis=0)
        return jnp.any(is_arc, axis=0), strength

    is_b, s_b = arc_any_and_strength(bright, diff)
    is_d, s_d = arc_any_and_strength(dark, -diff)

    score = jnp.maximum(jnp.where(is_b, s_b, 0.0), jnp.where(is_d, s_d, 0.0))
    # Kill the 3px border: ring reads are edge-padded garbage there.
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(interior, score, 0.0)


def nms3x3(score):
    """3x3 non-maximum suppression: keep strict local maxima."""
    neigh = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((score >= neigh) & (score > 0.0), score, 0.0)
