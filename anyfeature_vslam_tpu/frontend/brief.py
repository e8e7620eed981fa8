"""Steered binary descriptor family (orb32/brisk48/akaze61/anyFeatBin widths).

The reference's orb32 descriptors are OpenCV rBRIEF: 256 learned point
pairs in a 31x31 patch, rotated by the keypoint orientation, each bit
I(p1) < I(p2) on a blurred image (reference include/FeatureExtractor.h:
219-477 pattern table + src/ORBextractor.cc computeOrbDescriptor). We do
NOT copy that learned table; descriptors here only need to be internally
consistent (matcher, vocabulary and thresholds are ours too), so the pair
pattern is generated once from a fixed-seed isotropic Gaussian, the
classic BRIEF construction (Calonder et al. 2010).

TPU-native sampling: per-keypoint random image gathers are the slowest op
class on TPU, so the kernel never gathers scalars. Instead each keypoint's
31x31 patch is pulled with one vmapped dynamic-slice (contiguous DMA-able
reads), the orientation is quantized into ``N_ROT`` steps (OpenCV's rBRIEF
quantizes to 12 degrees the same way), and for every rotation step the
whole "sample two points and compare" is one constant +/-1 matrix: the
bit values are sign(patch @ M_rot), a single (N, 961) x (961, N_ROT*bits)
MXU matmul followed by a one-hot rotation-step selection.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .orientation import gather_patches

N_BITS = 256
N_ROT = 30                     # rotation quantization steps (12 deg, as rBRIEF)
PATCH_RADIUS = 15              # sampling patch half-size
_P = 2 * PATCH_RADIUS + 1      # 31
PATTERN_RADIUS = 13.0          # pattern norm clip: rotations stay in-patch
PATCH_SIGMA = 31.0 / 5.0       # classic BRIEF Gaussian spread


def _make_pattern(n_bits: int, seed: int = 20240607):
    rng = np.random.default_rng(seed + n_bits)
    pts = rng.normal(0.0, PATCH_SIGMA, size=(n_bits, 2, 2))
    # clip by NORM (not per-axis) so every rotated sample stays inside the
    # patch: |p| <= 13 -> rounded rotated coords within +/-14 < PATCH_RADIUS.
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    scale = np.minimum(1.0, PATTERN_RADIUS / np.maximum(norm, 1e-9))
    return (pts * scale).astype(np.float32)


_PATTERNS = {n: _make_pattern(n) for n in (256, 384, 488, 512)}


def pattern(n_bits: int = N_BITS):
    return _PATTERNS[n_bits]


def _rotation_matrices(n_bits: int):
    """Constant (961, N_ROT * n_bits) {-1,0,+1} sampling matrix.

    Column (r * n_bits + k) computes I(p2_k) - I(p1_k) with both points
    rotated by angle r * 2pi / N_ROT and rounded to the integer patch grid
    (nearest sampling, like the reference's cvRound pattern lookups).
    """
    pat = _PATTERNS[n_bits]  # (n_bits, 2, 2) [(x, y) of p1, p2]
    m = np.zeros((_P * _P, N_ROT * n_bits), np.float32)
    for r in range(N_ROT):
        th = 2.0 * np.pi * r / N_ROT
        ca, sa = np.cos(th), np.sin(th)
        rx = np.round(pat[..., 0] * ca - pat[..., 1] * sa).astype(np.int64)
        ry = np.round(pat[..., 0] * sa + pat[..., 1] * ca).astype(np.int64)
        flat = (ry + PATCH_RADIUS) * _P + (rx + PATCH_RADIUS)  # (n_bits, 2)
        cols = r * n_bits + np.arange(n_bits)
        np.subtract.at(m, (flat[:, 0], cols), 1.0)  # -I(p1)
        np.add.at(m, (flat[:, 1], cols), 1.0)       # +I(p2)
    return m


_ROT_MATS = {}


def _rot_mat(n_bits: int):
    if n_bits not in _ROT_MATS:
        _ROT_MATS[n_bits] = _rotation_matrices(n_bits)
    return _ROT_MATS[n_bits]


_BIT_WEIGHTS = (1 << np.arange(8)).astype(np.uint8)


@partial(jax.jit, static_argnames=("n_bits",))
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
    patches = gather_patches(img_blur, xy, PATCH_RADIUS)  # (N, 31, 31)
    flat = patches.reshape(patches.shape[0], _P * _P)

    # I(p2) - I(p1) for every (rotation step, bit) in one MXU matmul.
    # bf16 operands (f32 accumulator): the +/-1 matrix is exact and the
    # ~0.5-gray rounding of blurred pixels only perturbs near-tie bits;
    # halves the constant's HBM traffic and runs the MXU at full rate.
    m = jnp.asarray(_rot_mat(n_bits), jnp.bfloat16)  # (961, N_ROT * n_bits)
    diffs = jnp.dot(
        flat.astype(jnp.bfloat16), m,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    diffs = diffs.reshape(-1, N_ROT, n_bits)

    # quantize the angle to its rotation step and select via one-hot
    step = jnp.round(angle * (N_ROT / (2.0 * jnp.pi))).astype(jnp.int32) % N_ROT
    onehot = jax.nn.one_hot(step, N_ROT, dtype=diffs.dtype)  # (N, N_ROT)
    picked = jnp.einsum("nrk,nr->nk", diffs, onehot)

    bits = (picked > 0).astype(jnp.uint8)
    bits = jnp.where(valid[:, None], bits, 0)
    packed = jnp.sum(
        bits.reshape(-1, n_bits // 8, 8) * _BIT_WEIGHTS[None, None, :],
        axis=-1, dtype=jnp.uint8,
    )
    return packed, bits


def describe_from_flat(flat, angle, valid, n_bits: int = N_BITS):
    """Descriptors from pre-gathered flat blurred patches (N, 31*31).

    Same construction as describe() without the patch gather — the
    extractor shares one gather between orientation and sampling.
    Returns (desc_packed, desc_bits) like describe().
    """
    m = jnp.asarray(_rot_mat(n_bits), jnp.bfloat16)
    diffs = jnp.dot(
        flat.astype(jnp.bfloat16), m,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    diffs = diffs.reshape(-1, N_ROT, n_bits)
    step = jnp.round(angle * (N_ROT / (2.0 * jnp.pi))).astype(jnp.int32) % N_ROT
    onehot = jax.nn.one_hot(step, N_ROT, dtype=diffs.dtype)
    picked = jnp.einsum("nrk,nr->nk", diffs, onehot)
    bits = (picked > 0).astype(jnp.uint8)
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
