"""Difference-of-Gaussians blob detection (the scale-space detector family).

Stands in for the reference's blob-ish detectors: SIFT's DoG (reference
src/Feature_sift128.cpp, SiftGPU), SURF's Hessian (src/Feature_surf64.cpp),
and KAZE/AKAZE's nonlinear-scale-space extrema (src/Feature_kaze64.cpp,
src/Feature_akaze61.cpp). Per pyramid level we compute a DoG response
between two in-level Gaussian scales and keep 3x3 local extrema; the
pyramid's own geometric downsampling supplies the octave axis (the
reference stores the per-keypoint octave the same way,
Feature_akaze61.cpp:64-66).

Round-2 status: akaze61/kaze64 now use the real FED nonlinear scale space
(frontend/nonlinear.py), sift128 uses real 3D DoG extrema with subpixel
refinement (frontend/scalespace.py), and "hessian" below is the real
scale-normalized determinant-of-Hessian response (scalespace.det_hessian_map).
This module keeps the simple in-level DoG ("dog"/"dog_norm") as a cheap
generic blob detector and hosts the per-level SURF response.

Response domains:
  - "dog"     : |g(s1) - g(s2)| on raw 0..255 intensity (th=10)
  - "dog_norm": same on 0..1-normalized intensity (th=5e-4)
  - "hessian" : sigma^4 * det(Hessian of g(sigma)) on raw intensity
                (surf64, th=100; reference src/Feature_surf64.cpp:30-36)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import pyramid
from .fast import nms3x3

SIGMA_A = 1.2
SIGMA_B = 2.0


def dog_score_map(img, threshold, mode: str = "dog"):
    """(H, W) image -> (H, W) blob response, zero below threshold /
    non-extrema. `mode` selects the response domain (see module doc)."""
    if mode == "hessian":
        from . import scalespace
        resp = scalespace.det_hessian_map(img, sigma=SIGMA_B)
    else:
        if mode == "dog_norm":
            img = img * (1.0 / 255.0)
        ga = pyramid.gaussian_blur(img, SIGMA_A, radius=3)
        gb = pyramid.gaussian_blur(img, SIGMA_B, radius=5)
        resp = jnp.abs(ga - gb)
    score = jnp.where(resp > threshold, resp, 0.0)
    return nms3x3(score)
