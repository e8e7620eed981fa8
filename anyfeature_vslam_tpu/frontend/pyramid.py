"""Image pyramid + separable Gaussian smoothing.

The reference builds an nOctaves-level pyramid with per-level scale
``scaleFactor^level`` (reference src/FeatureExtractor.cpp:75-93,
src/ORBextractor.cc:652). Level shapes are computed at trace time (Python
ints), so every level is a static-shape XLA computation.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def level_shapes(height: int, width: int, n_levels: int, scale_factor: float):
    """Static (h, w) per level, rounded like cv::resize."""
    shapes = []
    for lvl in range(n_levels):
        inv = 1.0 / (scale_factor ** lvl)
        shapes.append((max(int(round(height * inv)), 16), max(int(round(width * inv)), 16)))
    return shapes


def _resize_weights(n_in: int, n_out: int):
    """(n_out, n_in) bilinear (anti-aliased) resize matrix along one axis.

    Computed in numpy at trace time (lru-cached) and embedded as a literal
    constant: building it by resizing an identity with jax.image.resize
    left a per-frame gather program in the graph whenever XLA declined to
    fold it. Matches jax.image.resize's triangle-kernel sampling to ~2e-5
    (same half-pixel centers, antialias stretch, edge renormalization).
    """
    return jnp.asarray(_resize_weights_np(n_in, n_out))


def _resize_weights_np(n_in: int, n_out: int):
    key = (n_in, n_out)
    cached = _RESIZE_CACHE.get(key)
    if cached is not None:
        return cached
    scale = n_out / n_in
    inv = 1.0 / scale
    radius = max(1.0, inv)
    out = _np.zeros((n_out, n_in), _np.float32)
    for i in range(n_out):
        x = (i + 0.5) * inv - 0.5
        lo = int(_np.floor(x - radius))
        hi = int(_np.ceil(x + radius)) + 1
        js = _np.arange(max(lo, 0), min(hi, n_in))
        t = (js - x) * min(scale, 1.0)
        w = _np.maximum(0.0, 1.0 - _np.abs(t))
        s = w.sum()
        if s > 0:
            out[i, js] = w / s
    _RESIZE_CACHE[key] = out
    return out


_RESIZE_CACHE: dict = {}


def build_pyramid(image, n_levels: int, scale_factor: float):
    """image (H, W) float32 in [0, 255] -> list of per-level images.

    Bilinear downsampling (matches cv::resize INTER_LINEAR closely enough
    for detection statistics), cascaded level-to-level like the reference
    (src/ORBextractor.cc:652 resizes from the previous level). Each level
    is two MXU matmuls against literal-constant interpolation matrices at
    bf16x3 (pixels accurate to ~1e-4 gray levels). A pre-composed
    all-levels-in-one-matmul variant was measured SLOWER on v5e (the
    block-diagonal waste exceeds the saved launches) — per-level matmuls
    with numpy-literal weights are the fast form.
    """
    h, w = image.shape
    if n_levels == 1:
        return [image]
    shapes = level_shapes(h, w, n_levels, scale_factor)
    x3 = jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3

    levels = [image]
    for lvl in range(1, n_levels):
        # Resize from the previous level (cascade, like the reference) to
        # keep each resize cheap and progressively low-passed.
        (h1, w1), (h2, w2) = shapes[lvl - 1], shapes[lvl]
        wr = _resize_weights(h1, h2)   # (h2, h1)
        wc = _resize_weights(w1, w2)   # (w2, w1)
        prev = levels[-1]
        rows = jnp.dot(wr, prev, preferred_element_type=jnp.float32,
                       precision=x3)
        levels.append(
            jnp.dot(rows, wc.T, preferred_element_type=jnp.float32,
                    precision=x3)
        )
    return levels


import numpy as _np


def gaussian_kernel1d(sigma: float, radius: int):
    x = _np.arange(-radius, radius + 1, dtype=_np.float32)
    k = _np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


@partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(image, sigma: float = 2.0, radius: int = 3):
    """Separable Gaussian blur, SAME padding by edge replication.

    Used before descriptor sampling (cv::ORB applies GaussianBlur(7x7, s=2)
    before computing BRIEF bits).

    Implemented as shift-and-add on the VPU: a single-channel
    conv_general_dilated wastes the MXU (1/128 lanes) and measured
    ~2.5 ms/level on real TPU; 2*(2r+1) fused shifted adds are ~100x
    cheaper for a 7-tap kernel.
    """
    k = gaussian_kernel1d(sigma, radius)
    h, w = image.shape
    img = jnp.pad(image, ((radius, radius), (0, 0)), mode="edge")
    out = k[0] * jax.lax.dynamic_slice(img, (0, 0), (h, w))
    for i in range(1, 2 * radius + 1):
        out = out + k[i] * jax.lax.dynamic_slice(img, (i, 0), (h, w))
    img = jnp.pad(out, ((0, 0), (radius, radius)), mode="edge")
    out = k[0] * jax.lax.dynamic_slice(img, (0, 0), (h, w))
    for i in range(1, 2 * radius + 1):
        out = out + k[i] * jax.lax.dynamic_slice(img, (0, i), (h, w))
    return out
