"""Feature-extraction orchestration: the TPU-native FeatureExtractor.

Mirrors the reference template pipeline (detect -> spread/filter -> orient ->
describe -> merge levels -> normalized size/sigma; reference
src/Feature_orb32.cpp:11-18 and src/FeatureExtractor.cpp:111-172) as ONE
jitted program per image resolution. All outputs are fixed-capacity arrays
with validity masks.

Per-level feature budgets follow the reference's geometric split
(src/FeatureExtractor.cpp:97-108): N_l proportional to (1/scaleFactor)^l.

Size / sigma normalization (the paper's feature-agnostic trick, reference
src/FeatureExtractor.cpp:132-172): keypoint size is mapped into ORB's range
[1, 1.2^7]; sigma = normalized size, sigma^2 = size^2, information = 1/sigma^2.
For the native orb32-style extractor size == scaleFactor^octave, so the map
is the identity.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import brief, fast, orientation, pyramid, select


@dataclass(frozen=True)
class ExtractorConfig:
    n_features: int = 1000
    n_levels: int = 8
    scale_factor: float = 1.2
    detect_th: float = 20.0
    border: int = 16
    blur_sigma: float = 2.0

    @property
    def capacity(self) -> int:
        return sum(self.level_budgets)

    @property
    def level_budgets(self):
        # reference src/FeatureExtractor.cpp:97-108
        factor = 1.0 / self.scale_factor
        desired = self.n_features * (1 - factor) / (1 - factor ** self.n_levels)
        budgets = []
        total = 0
        for _ in range(self.n_levels - 1):
            b = int(round(desired))
            budgets.append(b)
            total += b
            desired *= factor
        budgets.append(max(self.n_features - total, 0))
        return tuple(budgets)

    @property
    def level_scales(self):
        return tuple(self.scale_factor ** l for l in range(self.n_levels))


class Features:
    """Fixed-capacity structure-of-arrays feature set for one frame.

    Fields (all leading dim = capacity):
      xy:      (N, 2) float32, full-resolution pixel coords
      uv_und:  (N, 2) float32, undistorted coords (filled by the Frame step)
      resp:    (N,) float32 detector response
      octave:  (N,) int32
      angle:   (N,) float32 radians
      size:    (N,) float32 normalized size (sigma)
      sigma2:  (N,) float32
      inv_sigma2: (N,) float32
      desc:    (N, 32) uint8 packed descriptor
      desc_bits: (N, 256) uint8 {0,1}
      valid:   (N,) bool
    """

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def as_dict(self):
        return dict(self.__dict__)


@partial(jax.jit, static_argnames=("cfg", "height", "width"))
def extract_orb(image, cfg: ExtractorConfig, height: int, width: int):
    """Detect + describe orb32-style features. image: (H, W) float32 0..255."""
    image = image.reshape(height, width)
    levels = pyramid.build_pyramid(image, cfg.n_levels, cfg.scale_factor)
    budgets = cfg.level_budgets
    scales = cfg.level_scales

    outs = {k: [] for k in ("xy", "resp", "octave", "angle", "desc", "desc_bits", "valid")}
    for lvl in range(cfg.n_levels):
        img_l = levels[lvl]
        score = fast.nms3x3(fast.fast_score_map(img_l, cfg.detect_th))
        xy, resp, valid = select.select_spread_topk(score, budgets[lvl], cfg.border)
        ang = orientation.ic_angle(img_l, xy)
        img_blur = pyramid.gaussian_blur(img_l, cfg.blur_sigma)
        desc, bits = brief.describe(img_blur, xy, ang, valid)
        outs["xy"].append(xy * scales[lvl])
        outs["resp"].append(resp)
        outs["octave"].append(jnp.full((budgets[lvl],), lvl, dtype=jnp.int32))
        outs["angle"].append(ang)
        outs["desc"].append(desc)
        outs["desc_bits"].append(bits)
        outs["valid"].append(valid)

    xy = jnp.concatenate(outs["xy"])
    octave = jnp.concatenate(outs["octave"])
    size = jnp.asarray(cfg.scale_factor, jnp.float32) ** octave.astype(jnp.float32)
    sigma2 = size * size
    valid = jnp.concatenate(outs["valid"])
    return dict(
        xy=xy,
        resp=jnp.concatenate(outs["resp"]),
        octave=octave,
        angle=jnp.concatenate(outs["angle"]),
        size=size,
        sigma2=sigma2,
        inv_sigma2=jnp.where(valid, 1.0 / sigma2, 0.0),
        desc=jnp.concatenate(outs["desc"]),
        desc_bits=jnp.concatenate(outs["desc_bits"]),
        valid=valid,
    )
