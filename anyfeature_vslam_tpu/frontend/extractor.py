"""Feature-extraction orchestration: the TPU-native FeatureExtractor family.

Mirrors the reference template pipeline (detect -> spread/filter -> orient ->
describe -> merge levels -> normalized size/sigma; reference
src/Feature_orb32.cpp:11-18 and src/FeatureExtractor.cpp:111-172) as ONE
jitted program per image resolution, for EVERY feature type (the paper's
point: the pipeline is feature-agnostic; reference include/Types.h:11-124
enumerates the 9 types). All outputs are fixed-capacity arrays with
validity masks.

Feature registry (detector family x descriptor family):

  name            detector                 descriptor            dist     reference
  orb32           FAST-9/16 pyramid        steered BRIEF-256     Hamming  src/Feature_orb32.cpp
  brisk48         FAST-9/16 pyramid (*)    BRISK rings 384       Hamming  src/Feature_brisk48.cpp
  akaze61         FED nonlinear det(H)     M-LDB 486(->488)      Hamming  src/Feature_akaze61.cpp
  anyfeat_bin     FAST-9/16 pyramid (*)    FREAK retina 512      Hamming  src/Feature_anyFeatBin.cpp
  sift128         SIFT 3D DoG extrema      SIFT 4x4x8 = 128      L2SQR    src/Feature_sift128.cpp
  surf64          det(Hessian)             SURF-style 64         L2SQR    src/Feature_surf64.cpp
  kaze64          FED nonlinear det(H)     M-SURF 64             L2SQR    src/Feature_kaze64.cpp
  anyfeat_nonbin  FAST-9/16 pyramid (*)    grad48 (VGG stand-in) L2SQR    src/Feature_anyFeatNonBin.cpp
  r2d2_128        precomputed              float128              L2SQR    src/Feature_r2d2_128.cpp

(*) The reference detects brisk48/anyfeat_* with AGAST (src/Feature_
anyFeatBin.cpp:28-34). AGAST-9/16 evaluates the SAME accelerated-segment-
test corner criterion as FAST-9/16 — its contribution is a faster DECISION
TREE for sparse CPU evaluation (Mair et al. 2010). Our detector is a dense
VPU stencil that evaluates every pixel's segment test exactly (frontend/
fast.py), so the AGAST tree would change nothing about which pixels fire;
per-family thresholds come from the registry. sift128 detection is the
real 3D scale-space extremum search with subpixel refinement (frontend/
scalespace.py); surf64 is a true scale-normalized det(Hessian). The one
remaining stand-in is anyfeat_nonbin's grad48 descriptor approximating
learned VGG-48 (documented in frontend/graddesc.py).

Per-level feature budgets follow the reference's geometric split
(src/FeatureExtractor.cpp:97-108). Size/sigma normalization maps the raw
per-feature size range into ORB's [1, 1.2^7]
(src/FeatureExtractor.cpp:132-172): sigma = normalized size,
information = 1/sigma^2.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import (
    brief, dog, fast, graddesc, mldb, msurf, nonlinear, orientation,
    pallas_fast, pyramid, ringdesc, select,
)

ORB_MAX_SIZE = 1.2 ** 7

# name -> (detector, descriptor, n_octaves, scale_factor, detect_th, match_th)
FEATURE_REGISTRY = {
    "orb32": ("fast", "bin256", 8, 1.2, 20.0, 75.0),
    "brisk48": ("fast", "bin384", 8, 1.5, 34.0, 120.0),
    "akaze61": ("akaze", "bin488", 8, 1.1892, 1e-5, 128.0),
    "anyfeat_bin": ("fast", "bin512", 8, 1.2, 20.0, 128.0),
    # 2.55 = SiftGPU's default DoG threshold 0.02/levels on 0..255 intensity
    "sift128": ("sift", "grad128", 8, 2.0, 2.55, 0.5),
    # surf64 matchingTh: the reference yaml's 0.04 is calibrated to
    # cv::SURF's Haar-wavelet descriptor; our grad64 construction
    # (graddesc.py) has a wider true-match distance mode (~0.02..0.1 on
    # unit-norm L2SQR), measured on rendered sequences — 0.12 keeps the
    # same inlier/outlier separation point
    "surf64": ("hessian", "grad64", 8, 1.2, 100.0, 0.12),
    "kaze64": ("kaze", "grad64", 8, 1.1892, 1e-5, 0.1),
    # learned48: trained MLP descriptor over rotation-canonicalized
    # patches (frontend/learned48.py) standing in for cv::VGG_48's learned
    # weights; matchingTh from the training tool's held-out calibration
    "anyfeat_nonbin": ("fast", "learned48", 8, 1.2, 20.0, 0.62),
    "r2d2_128": ("precomputed", "float128", 1, 2.0, 1.0, 0.38),
}


def descriptor_dim(descriptor: str) -> int:
    if descriptor.startswith("bin"):
        return int(descriptor[3:])
    if descriptor.startswith("grad"):
        return int(descriptor[4:])
    if descriptor.startswith("learned"):
        return int(descriptor[7:])
    return int(descriptor.replace("float", ""))


def descriptor_dtype(descriptor: str):
    return np.uint8 if descriptor.startswith("bin") else np.float32


@dataclass(frozen=True)
class ExtractorConfig:
    n_features: int = 1000
    n_levels: int = 8
    scale_factor: float = 1.2
    detect_th: float = 20.0
    border: int = 16
    blur_sigma: float = 2.0
    detector: str = "fast"       # fast | dog | dog_norm | hessian
    descriptor: str = "bin256"   # bin256/384/488/512 | grad48/64/128

    @staticmethod
    def for_feature(name: str, n_features: int = 1000) -> "ExtractorConfig":
        det, desc, n_oct, scale, dth, _ = FEATURE_REGISTRY[name]
        if det == "precomputed":
            raise ValueError("r2d2_128 uses the precomputed-feature loader")
        return ExtractorConfig(
            n_features=n_features, n_levels=n_oct, scale_factor=scale,
            detect_th=dth, detector=det, descriptor=desc,
        )

    @property
    def desc_dim(self) -> int:
        return descriptor_dim(self.descriptor)

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


def _normalized_size(cfg: ExtractorConfig, octave_f):
    """Map raw size scale_factor^octave from [1, sf^(n-1)] into ORB's
    [1, 1.2^7] (reference computeSize, src/FeatureExtractor.cpp:132-142)."""
    raw = jnp.asarray(cfg.scale_factor, jnp.float32) ** octave_f
    max_raw = cfg.scale_factor ** (cfg.n_levels - 1)
    if max_raw <= 1.0 + 1e-6:
        return jnp.full_like(raw, ORB_MAX_SIZE)
    return 1.0 + (raw - 1.0) * (ORB_MAX_SIZE - 1.0) / (max_raw - 1.0)


@partial(jax.jit, static_argnames=("cfg", "height", "width"))
def extract_features(image, cfg: ExtractorConfig, height: int, width: int):
    """Detect + describe. image: (H, W) float32 0..255. Returns the SoA
    feature dict (see Frame layout in slam/map_state.py)."""
    image = image.reshape(height, width)
    if cfg.detector in ("akaze", "kaze"):
        return _extract_nonlinear(image, cfg)
    if cfg.detector == "sift":
        return _extract_sift(image, cfg)
    levels = pyramid.build_pyramid(image, cfg.n_levels, cfg.scale_factor)
    budgets = cfg.level_budgets
    scales = cfg.level_scales

    outs = {k: [] for k in ("xy", "resp", "octave", "angle", "desc_bits", "valid")}
    for lvl in range(cfg.n_levels):
        img_l = levels[lvl]
        if cfg.detector == "fast":
            if jax.default_backend() == "tpu":
                # fused Pallas stencil: FAST score + NMS without the
                # (16, H, W) HBM intermediates (bit-exact vs the jnp path)
                score = pallas_fast.fast_nms_pallas(img_l, cfg.detect_th)
            else:
                score = fast.nms3x3(fast.fast_score_map(img_l, cfg.detect_th))
        else:
            score = dog.dog_score_map(img_l, cfg.detect_th, mode=cfg.detector)
        xy, resp, valid = select.select_spread_topk(score, budgets[lvl], cfg.border)
        if cfg.descriptor == "bin384":
            # BRISK rings sample the RAW level image: per-point Gaussian
            # smoothing lives inside the constant stamp matrix
            ang, desc = ringdesc.describe_ring(img_l, xy, valid, "brisk")
        elif cfg.descriptor == "bin512":
            ang, desc = ringdesc.describe_ring(img_l, xy, valid, "freak")
        elif cfg.descriptor.startswith("bin"):
            # one patch gather from the blurred level serves BOTH the
            # IC-angle moments and the BRIEF sampling (per-keypoint patch
            # gathers are the slowest op class on TPU; halving them is
            # worth computing the orientation on the blurred image — the
            # intensity centroid is low-frequency, so the 7x7 sigma=2 blur
            # barely moves it, and descriptors stay internally consistent)
            img_blur = pyramid.gaussian_blur(img_l, cfg.blur_sigma)
            flat = orientation.gather_patches(
                img_blur, xy, orientation.PATCH_RADIUS
            ).reshape(budgets[lvl], -1)
            ang = orientation.ic_angle_from_patches(flat)
            _, desc = brief.describe_from_flat(flat, ang, valid, n_bits=cfg.desc_dim)
        elif cfg.descriptor == "learned48":
            from . import learned48

            ang = orientation.ic_angle(img_l, xy)
            desc = learned48.describe_learned48(img_l, xy, ang, valid)
        else:
            ang = orientation.ic_angle(img_l, xy)
            desc = graddesc.describe_grad(img_l, xy, ang, valid, dim=cfg.desc_dim)
        outs["xy"].append(xy * scales[lvl])
        outs["resp"].append(resp)
        outs["octave"].append(jnp.full((budgets[lvl],), lvl, dtype=jnp.int32))
        outs["angle"].append(ang)
        outs["desc_bits"].append(desc)
        outs["valid"].append(valid)

    xy = jnp.concatenate(outs["xy"])
    octave = jnp.concatenate(outs["octave"])
    size = _normalized_size(cfg, octave.astype(jnp.float32))
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
        desc_bits=jnp.concatenate(outs["desc_bits"]),
        valid=valid,
    )


def _extract_nonlinear(image, cfg: ExtractorConfig):
    """AKAZE/KAZE path: FED nonlinear-diffusion scale space (real, replacing
    the round-1 Gaussian-DoG stand-in), det(Hessian) extrema across
    evolution levels, M-LDB (akaze61) / M-SURF (kaze64) descriptors.
    Reference semantics: src/Feature_akaze61.cpp:24-77 (omax = nOctaves/4,
    nsublevels = nOctaves/2), src/Feature_kaze64.cpp:21-33 (cv::KAZE, no
    octave downsampling). Per the reference, SIZE normalization runs on the
    EVOLUTION INDEX (GetKeypointOctave = class_id = evolution level,
    src/Feature_akaze61.cpp:63-69) while the stored keypoint `octave` —
    which matching-level gates such as SearchForInitialization's
    level-0-only filter consume — is libAKAZE's TRUE octave (0..omax-1),
    so all sublevels of octave 0 participate in two-view init."""
    img01 = image * jnp.float32(1.0 / 255.0)
    downsample = cfg.detector == "akaze"
    levels = nonlinear.build_evolution(img01, cfg.n_levels, downsample=downsample)
    score_maps = nonlinear.detect_scores(levels)
    budgets = cfg.level_budgets

    outs = {k: [] for k in ("xy", "resp", "octave", "angle", "desc_bits", "valid")}
    evo_idx = []  # evolution index per slot (drives size normalization)
    for lvl, (ev, smap) in enumerate(zip(levels, score_maps)):
        smap = jnp.where(smap > cfg.detect_th, smap, 0.0)
        # border scales with the level's own resolution
        border = max(cfg.border // (2 ** ev.octave if downsample else 1), 6)
        xy, resp, valid = select.select_spread_topk(smap, budgets[lvl], border)
        if cfg.descriptor.startswith("bin"):
            ang, desc = mldb.describe_mldb(ev.L, ev.Lx, ev.Ly, xy, valid, ev.sigma_rel)
        else:
            if downsample or ev.octave == 0:
                gx, gy, dxy, spacing = ev.Lx, ev.Ly, xy, ev.sigma_rel
            else:
                # KAZE keeps full resolution; decimate the (already
                # sigma>=2^o-smoothed) derivative maps so the descriptor
                # sample matrices stay bounded
                f = 2 ** ev.octave
                h, w = ev.Lx.shape
                h2, w2 = max(h // f, 16), max(w // f, 16)
                wr = jnp.asarray(pyramid._resize_weights_np(h, h2))
                wc = jnp.asarray(pyramid._resize_weights_np(w, w2))
                gx = jnp.dot(wr, jnp.dot(ev.Lx, wc.T))
                gy = jnp.dot(wr, jnp.dot(ev.Ly, wc.T))
                dxy = xy / f
                spacing = ev.sigma / f
            ang, desc = msurf.describe_kaze(gx, gy, dxy, valid, spacing)
        # map level coords to image coords
        up = float(2 ** ev.octave) if downsample else 1.0
        outs["xy"].append(xy * up)
        outs["resp"].append(resp)
        outs["octave"].append(jnp.full((budgets[lvl],), ev.octave, dtype=jnp.int32))
        evo_idx.append(jnp.full((budgets[lvl],), lvl, dtype=jnp.int32))
        outs["angle"].append(ang)
        outs["desc_bits"].append(desc)
        outs["valid"].append(valid)

    xy = jnp.concatenate(outs["xy"])
    octave = jnp.concatenate(outs["octave"])
    size = _normalized_size(cfg, jnp.concatenate(evo_idx).astype(jnp.float32))
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
        desc_bits=jnp.concatenate(outs["desc_bits"]),
        valid=valid,
    )




def _sift_unit_budgets(total: int, n_units: int, nspo: int):
    """Geometric per-(octave, slice) budgets summing EXACTLY to `total`
    (the frame SoA capacity), finer scales first — same shape as the
    reference per-level split (src/FeatureExtractor.cpp:97-108) over the
    continuous-scale units."""
    factor = 0.5 ** (1.0 / nspo)
    desired = total * (1 - factor) / (1 - factor ** n_units)
    budgets = []
    acc = 0
    for u in range(n_units - 1):
        b = max(min(int(round(desired)), total - acc - (n_units - 1 - u)), 1)
        budgets.append(b)
        acc += b
        desired *= factor
    budgets.append(total - acc)
    return budgets


def _extract_sift(image, cfg: ExtractorConfig):
    """sift128 path: real SIFT detection (frontend/scalespace.py) — per
    octave, nspo+3 Gaussian slices, 3D DoG extrema with closed-form
    subpixel/subscale refinement, contrast + edge gates — and the 4x4x8
    gradient-histogram descriptor with dominant-gradient orientation
    (graddesc.describe_grad_auto). Reference semantics:
    src/Feature_sift128.cpp:9-92 (SiftGPU -d 3 -no 8 -e 10; octave
    recovered from continuous scale at :92, stored in keypoint octave)."""
    from . import scalespace

    h, w = image.shape
    nspo = max(cfg.n_levels // 4, 1)          # 8 levels -> 2 slices/octave
    n_oct = scalespace.n_octaves(h, w, max_octaves=max(cfg.n_levels // nspo, 1))
    n_units = n_oct * nspo
    budgets = _sift_unit_budgets(cfg.capacity, n_units, nspo)
    sig = scalespace.slice_sigmas(nspo)

    inc0 = float(np.sqrt(scalespace.SIGMA0 ** 2 - scalespace.ASSUMED_BLUR ** 2))
    base = pyramid.gaussian_blur(image, inc0, radius=max(int(np.ceil(3 * inc0)), 1))

    outs = {k: [] for k in ("xy", "resp", "octave", "angle", "desc_bits", "valid")}
    raw_size = []
    unit = 0
    for o in range(n_oct):
        slices = scalespace.build_octave(base, nspo)
        dogs = [slices[i + 1] - slices[i] for i in range(nspo + 2)]
        lh, lw = slices[0].shape
        border = max(min(cfg.border, min(lh, lw) // 4), 4)
        for i in range(1, nspo + 1):
            score, ox, oy, osc = scalespace.dog_extrema_maps(
                dogs[i - 1], dogs[i], dogs[i + 1], cfg.detect_th
            )
            xy, resp, valid = select.select_spread_topk(score, budgets[unit], border)
            xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, lw - 1)
            yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, lh - 1)
            xy_ref = xy + jnp.stack([ox[yi, xi], oy[yi, xi]], axis=-1)
            ang, desc = graddesc.describe_grad_auto(
                slices[i], xy_ref, valid, dim=cfg.desc_dim
            )
            up = float(2 ** o)
            outs["xy"].append(xy_ref * up)
            outs["resp"].append(resp)
            outs["octave"].append(
                jnp.full((budgets[unit],), o, dtype=jnp.int32)
            )
            outs["angle"].append(ang)
            outs["desc_bits"].append(desc)
            outs["valid"].append(valid)
            # refined continuous scale sigma0 * 2^(o + (i + ds)/nspo),
            # expressed relative to sigma0 for size normalization
            raw_size.append(
                (sig[i] / scalespace.SIGMA0)
                * (2.0 ** (o + osc[yi, xi] / nspo))
            )
            unit += 1
        base = scalespace.downsample2(slices[nspo])

    xy = jnp.concatenate(outs["xy"])
    octave = jnp.concatenate(outs["octave"])
    valid = jnp.concatenate(outs["valid"])
    raw = jnp.concatenate(raw_size)
    # map continuous raw size onto ORB's [1, 1.2^7] band (computeSize
    # semantics, src/FeatureExtractor.cpp:132-142)
    max_raw = (sig[nspo] / scalespace.SIGMA0) * (2.0 ** (n_oct - 1)) * 2.0 ** 0.6
    raw = jnp.clip(raw, 1.0, max_raw)
    size = 1.0 + (raw - 1.0) * (ORB_MAX_SIZE - 1.0) / (max_raw - 1.0)
    sigma2 = size * size
    return dict(
        xy=xy,
        resp=jnp.concatenate(outs["resp"]),
        octave=octave,
        angle=jnp.concatenate(outs["angle"]),
        size=size,
        sigma2=sigma2,
        inv_sigma2=jnp.where(valid, 1.0 / sigma2, 0.0),
        desc_bits=jnp.concatenate(outs["desc_bits"]),
        valid=valid,
    )
