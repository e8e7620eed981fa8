"""Nonlinear (conduction-limited) diffusion scale space with FED stepping.

This is the real AKAZE/KAZE scale space the reference plugs in through
libAKAZE / cv::KAZE (reference src/Feature_akaze61.cpp:24-33 builds
``evolution->Create_Nonlinear_Scale_Space``; src/Feature_kaze64.cpp:21-33
uses cv::KAZE with nOctaves/4 octaves and nOctaves/2 sublevels), replacing
the round-1 Gaussian-DoG stand-in (frontend/dog.py).

Construction (Alcantarilla et al., AKAZE 2013 / KAZE 2012):
  - evolution levels i = (octave o, sublevel j), sigma_i = s0 * 2^(o + j/S),
    diffusion time t_i = sigma_i^2 / 2;
  - Perona-Malik g2 conductivity g = 1 / (1 + |grad(G1 * L)|^2 / k^2), with
    the contrast factor k the 70th percentile of smoothed-image gradient
    magnitudes (histogram estimate, as libAKAZE);
  - between levels, Fast Explicit Diffusion cycles (Grewenig et al. 2010):
    n explicit steps tau_j = tau_max / (2 cos^2(pi (2j+1) / (4n+2))),
    rescaled so they sum to the exact time difference, each step
    L += tau * div(g grad L) on the 4-neighborhood stencil.

Everything is static-shape XLA: step counts and per-level shapes are Python
ints derived from sigmas at trace time; each FED step is a fused
shift-and-add VPU stencil. AKAZE halves resolution per octave
(downsample=True); KAZE stays at full resolution (downsample=False).

Detection is the scale-normalized determinant of the Hessian
(sigma^2-scaled dilated-Scharr derivatives, so det(H) carries sigma^4),
with 3x3 spatial NMS plus point-to-point scale non-max against the
adjacent evolution levels — the same extremum rule libAKAZE applies.

Deviations (documented, not silent): diffusion time differences across a
downsampled octave are computed in the octave's own pixel units
(Delta t / 4^o) so sigma keeps its full-resolution meaning; libAKAZE
re-uses full-resolution times on the halved image, which over-smooths
coarse octaves. The per-octave contrast factor is kept constant.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import pyramid

TAU_MAX = 0.25          # 2D explicit-diffusion stability limit
SIGMA0 = 1.6            # base scale (libAKAZE soffset)
K_PERCENTILE = 0.7      # contrast factor percentile (libAKAZE kpercentile)
K_NBINS = 300           # histogram bins for the percentile estimate


def fed_tau_steps(total_time: float, tau_max: float = TAU_MAX):
    """FED step sizes covering `total_time` (Python floats, trace-time).

    n is the smallest step count whose FED cycle time tau_max*n*(n+1)/3
    reaches total_time; the raw cosine schedule is then rescaled to sum to
    total_time exactly (scaling down preserves stability).
    """
    if total_time <= 0.0:
        return []
    n = max(1, int(math.ceil(0.5 * (math.sqrt(1.0 + 12.0 * total_time / tau_max) - 1.0))))
    taus = [
        tau_max / (2.0 * math.cos(math.pi * (2 * j + 1) / (4 * n + 2)) ** 2)
        for j in range(n)
    ]
    s = sum(taus)
    return [t * total_time / s for t in taus]


def _shift(img, dy: int, dx: int):
    """out[y, x] = img[y + dy, x + dx], edge replicated."""
    h, w = img.shape
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    padded = jnp.pad(img, ((py1, py0), (px1, px0)), mode="edge")
    return jax.lax.dynamic_slice(padded, (py1 + dy, px1 + dx), (h, w))


def contrast_factor(img01):
    """Contrast factor k: the K_PERCENTILE quantile of gradient magnitude
    of the sigma=1 smoothed image, by 300-bin histogram (libAKAZE
    Compute_K_Percentile semantics)."""
    smooth = pyramid.gaussian_blur(img01, 1.0, radius=2)
    gx = 0.5 * (_shift(smooth, 0, 1) - _shift(smooth, 0, -1))
    gy = 0.5 * (_shift(smooth, 1, 0) - _shift(smooth, -1, 0))
    mag = jnp.sqrt(gx * gx + gy * gy)
    # interior only (edge-replicated borders have zero gradient bias)
    mag = mag[1:-1, 1:-1].reshape(-1)
    hmax = jnp.max(mag) + 1e-12
    idx = jnp.clip((mag / hmax * K_NBINS).astype(jnp.int32), 0, K_NBINS - 1)
    hist = jnp.zeros((K_NBINS,), jnp.float32).at[idx].add(jnp.where(mag > 0, 1.0, 0.0))
    csum = jnp.cumsum(hist)
    total = csum[-1]
    bin_i = jnp.argmax(csum >= K_PERCENTILE * total)
    k = hmax * (bin_i.astype(jnp.float32) + 0.5) / K_NBINS
    return jnp.maximum(k, 1e-3)


def _conductivity(L, k2):
    """Perona-Malik g2 on the sigma=1 smoothed current level."""
    smooth = pyramid.gaussian_blur(L, 1.0, radius=2)
    gx = 0.5 * (_shift(smooth, 0, 1) - _shift(smooth, 0, -1))
    gy = 0.5 * (_shift(smooth, 1, 0) - _shift(smooth, -1, 0))
    return 1.0 / (1.0 + (gx * gx + gy * gy) / k2)


def _fed_cycle(L, g, taus):
    """Explicit diffusion steps L += tau * div(g grad L) (4-neighborhood,
    conductivity held fixed over the cycle, AKAZE-style semi-implicit
    alternative omitted). Each step is a fused shift-and-add stencil."""
    g_e = g + _shift(g, 0, 1)    # x+1 half-point conductivity (x2)
    g_w = g + _shift(g, 0, -1)
    g_s = g + _shift(g, 1, 0)
    g_n = g + _shift(g, -1, 0)
    for tau in taus:
        flux = (
            g_e * (_shift(L, 0, 1) - L)
            + g_w * (_shift(L, 0, -1) - L)
            + g_s * (_shift(L, 1, 0) - L)
            + g_n * (_shift(L, -1, 0) - L)
        )
        L = L + (0.5 * tau) * flux
    return L


# Scharr 3x3 first-derivative kernel weights: d/dx = [[-3,0,3],[-10,0,10],
# [-3,0,3]] / 32 (normalized). Applied with a dilation step for scale.
_SCHARR_EDGE = 3.0 / 32.0
_SCHARR_MID = 10.0 / 32.0


def scharr_x(img, step: int = 1):
    t = _shift(img, -step, 0)
    m = img
    b = _shift(img, step, 0)
    return (
        _SCHARR_EDGE * (_shift(t, 0, step) - _shift(t, 0, -step))
        + _SCHARR_MID * (_shift(m, 0, step) - _shift(m, 0, -step))
        + _SCHARR_EDGE * (_shift(b, 0, step) - _shift(b, 0, -step))
    )


def scharr_y(img, step: int = 1):
    l = _shift(img, 0, -step)
    m = img
    r = _shift(img, 0, step)
    return (
        _SCHARR_EDGE * (_shift(l, step, 0) - _shift(l, -step, 0))
        + _SCHARR_MID * (_shift(m, step, 0) - _shift(m, -step, 0))
        + _SCHARR_EDGE * (_shift(r, step, 0) - _shift(r, -step, 0))
    )


@dataclass(frozen=True)
class EvolutionLevel:
    """One nonlinear-scale-space slice (static metadata + arrays)."""
    octave: int
    sublevel: int
    index: int
    sigma: float          # full-resolution scale
    sigma_rel: float      # scale in this level's own pixel units
    L: jnp.ndarray        # diffused image (h, w)
    Lx: jnp.ndarray       # sigma-scaled first derivatives
    Ly: jnp.ndarray
    response: jnp.ndarray  # scale-normalized det(Hessian)


def build_evolution(img01, n_levels: int = 8, downsample: bool = True,
                    sigma0: float = SIGMA0):
    """Build the nonlinear scale space.

    Args:
      img01: (H, W) float32 intensity in [0, 1].
      n_levels: total evolution levels; split into omax = n_levels/4
        octaves x S = n_levels/2 sublevels when downsampling is on
        (reference src/Feature_akaze61.cpp:10-11 sets omax = nOctaves/4,
        nsublevels = nOctaves/2), else a single-resolution ladder.
      downsample: halve resolution per octave (AKAZE) or not (KAZE).

    Returns:
      list of EvolutionLevel, length n_levels.
    """
    S = max(n_levels // 2, 1)            # sublevels per octave
    omax = max(n_levels // S, 1)         # octaves
    assert omax * S == n_levels, (omax, S, n_levels)

    k = contrast_factor(img01)
    k2 = k * k

    levels = []
    L = pyramid.gaussian_blur(img01, sigma0, radius=max(2, int(3 * sigma0)))
    t_prev = 0.5 * sigma0 * sigma0
    idx = 0
    for o in range(omax):
        scale_div = float(2 ** o)
        if o > 0 and downsample:
            h, w = L.shape
            h2, w2 = max(h // 2, 16), max(w // 2, 16)
            wr = pyramid._resize_weights(h, h2)
            wc = pyramid._resize_weights(w, w2)
            L = jnp.dot(wr, jnp.dot(L, wc.T))
        for j in range(S):
            sigma = sigma0 * (2.0 ** (o + j / S))
            t = 0.5 * sigma * sigma
            if idx > 0:
                # time difference in this octave's pixel units
                div = scale_div ** 2 if downsample else 1.0
                taus = fed_tau_steps((t - t_prev) / div)
                g = _conductivity(L, k2)
                L = _fed_cycle(L, g, taus)
            sigma_rel = sigma / scale_div if downsample else sigma
            step = max(1, int(round(sigma_rel)))
            lx = scharr_x(L, step) * sigma_rel
            ly = scharr_y(L, step) * sigma_rel
            lxx = scharr_x(lx, step) * sigma_rel
            lyy = scharr_y(ly, step) * sigma_rel
            lxy = scharr_y(lx, step) * sigma_rel
            resp = lxx * lyy - lxy * lxy
            levels.append(EvolutionLevel(
                octave=o, sublevel=j, index=idx, sigma=sigma,
                sigma_rel=sigma_rel, L=L, Lx=lx, Ly=ly, response=resp,
            ))
            t_prev = t
            idx += 1
    return levels


def _resize_to(arr, h2: int, w2: int):
    h, w = arr.shape
    if (h, w) == (h2, w2):
        return arr
    wr = pyramid._resize_weights(h, h2)
    wc = pyramid._resize_weights(w, w2)
    return jnp.dot(wr, jnp.dot(arr, wc.T))


def detect_scores(levels):
    """Per-level detection score maps: det(H) thresholded upstream, 3x3
    spatial NMS, and scale non-max vs the adjacent evolution levels
    (resampled when resolutions differ). Returns list of (h, w) maps."""
    from .fast import nms3x3

    out = []
    n = len(levels)
    for i, lv in enumerate(levels):
        h, w = lv.response.shape
        score = nms3x3(lv.response)
        for nb in (i - 1, i + 1):
            if 0 <= nb < n:
                neighbor = _resize_to(levels[nb].response, h, w)
                score = jnp.where(score >= neighbor, score, 0.0)
        out.append(score)
    return out
