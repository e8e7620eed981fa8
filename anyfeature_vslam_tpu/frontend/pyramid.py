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


def build_pyramid(image, n_levels: int, scale_factor: float):
    """image (H, W) float32 in [0, 255] -> list of per-level images.

    Bilinear downsampling (matches cv::resize INTER_LINEAR closely enough
    for detection statistics).
    """
    h, w = image.shape
    shapes = level_shapes(h, w, n_levels, scale_factor)
    levels = [image]
    for lvl in range(1, n_levels):
        # Resize from the previous level (cascade, like the reference) to
        # keep each resize cheap and progressively low-passed.
        levels.append(
            jax.image.resize(levels[-1], shapes[lvl], method="bilinear")
        )
    return levels


def gaussian_kernel1d(sigma: float, radius: int):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


@partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(image, sigma: float = 2.0, radius: int = 3):
    """Separable Gaussian blur, SAME padding by edge replication.

    Used before descriptor sampling (cv::ORB applies GaussianBlur(7x7, s=2)
    before computing BRIEF bits).
    """
    k = gaussian_kernel1d(sigma, radius)
    img = jnp.pad(image, ((radius, radius), (0, 0)), mode="edge")
    # Convolve rows then cols via conv_general_dilated on NCHW 1x1.
    img = jax.lax.conv_general_dilated(
        img[None, None, :, :],
        k[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    img = jnp.pad(img, ((0, 0), (radius, radius)), mode="edge")
    img = jax.lax.conv_general_dilated(
        img[None, None, :, :],
        k[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    return img
