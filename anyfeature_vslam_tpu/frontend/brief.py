"""Steered 256-bit binary descriptor (orb32-equivalent).

The reference's orb32 descriptors are OpenCV rBRIEF: 256 learned point
pairs in a 31x31 patch, rotated by the keypoint orientation, each bit
I(p1) < I(p2) on a blurred image (reference include/FeatureExtractor.h:
219-477 pattern table + src/ORBextractor.cc computeOrbDescriptor). We do
NOT copy that learned table; descriptors here only need to be internally
consistent (matcher, vocabulary and thresholds are ours too), so the pair
pattern is generated once from a fixed-seed isotropic Gaussian, the
classic BRIEF construction (Calonder et al. 2010).

The sampling step is a single fused gather: rotate all 256*2 pattern points
by each keypoint's angle, add the keypoint position, nearest-sample the
blurred level image, compare, and pack bits.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

N_BITS = 256
PATCH_SIGMA = 31.0 / 5.0  # classic BRIEF Gaussian spread
_COORD_CLIP = 13.0  # keep pattern inside the 31x31 patch pre-rotation

def _make_pattern(n_bits: int, seed: int = 20240607):
    rng = np.random.default_rng(seed + n_bits)
    pts = rng.normal(0.0, PATCH_SIGMA, size=(n_bits, 2, 2))
    return np.clip(pts, -_COORD_CLIP, _COORD_CLIP).astype(np.float32)


# plain numpy constants (lazily created jnp arrays would leak tracers when
# the first call happens under a jit trace). Widths cover the reference's
# binary families: 256=orb32, 384=brisk48, 488=akaze61, 512=anyFeatBin
# (FREAK-length).
_PATTERNS = {n: _make_pattern(n) for n in (256, 384, 488, 512)}


def pattern(n_bits: int = N_BITS):
    return _PATTERNS[n_bits]


_BIT_WEIGHTS = (1 << np.arange(8)).astype(np.uint8)


def describe(img_blur, xy, angle, valid, n_bits: int = N_BITS):
    """Compute packed descriptors.

    Args:
      img_blur: (H, W) float32 Gaussian-blurred level image.
      xy: (N, 2) float32 keypoint (x, y) level coordinates.
      angle: (N,) float32 orientation radians.
      valid: (N,) bool.
      n_bits: descriptor width (256/384/488/512 for the binary families).

    Returns:
      desc_packed: (N, n_bits // 8) uint8.
      desc_bits: (N, n_bits) uint8 in {0, 1} (for matmul Hamming matching).
    """
    h, w = img_blur.shape
    pat = pattern(n_bits)  # (n_bits, 2, 2)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    # rotate: [x', y'] = [x ca - y sa, x sa + y ca]
    px, py = pat[..., 0], pat[..., 1]  # (256, 2)
    rx = px[None] * ca[:, None, None] - py[None] * sa[:, None, None]  # (N, 256, 2)
    ry = px[None] * sa[:, None, None] + py[None] * ca[:, None, None]
    ax = jnp.clip(jnp.round(rx + xy[:, None, None, 0]).astype(jnp.int32), 0, w - 1)
    ay = jnp.clip(jnp.round(ry + xy[:, None, None, 1]).astype(jnp.int32), 0, h - 1)
    flat = img_blur.reshape(-1)
    vals = flat[ay * w + ax]  # (N, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)  # (N, n_bits)
    bits = jnp.where(valid[:, None], bits, 0)
    packed = jnp.sum(
        bits.reshape(-1, n_bits // 8, 8) * _BIT_WEIGHTS[None, None, :],
        axis=-1, dtype=jnp.uint8,
    )
    return packed, bits


def unpack_bits(desc_packed):
    """(N, 32) uint8 -> (N, 256) uint8 bits, inverse of the packing above."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (desc_packed[..., None] >> shifts[None, None, :]) & jnp.uint8(1)
    return bits.reshape(desc_packed.shape[0], -1)
