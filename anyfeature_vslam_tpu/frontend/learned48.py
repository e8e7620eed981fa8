"""Learned 48-d float descriptor — the anyfeat_nonbin descriptor.

The reference's anyFeatNonBin template pairs AGAST detection with
cv::xfeatures2d::VGG (VGG_48), a LEARNED 48-d float descriptor
(reference src/Feature_anyFeatNonBin.cpp:29-50; Simonyan et al., "Learning
Local Feature Descriptors Using Convex Optimisation"). Rounds 1-2 shipped a
hand-crafted gradient-statistics stand-in (graddesc grad48); this module
replaces it with a genuinely learned descriptor (VERDICT r2 item 8):

  - a 20x20 intensity patch is sampled on the keypoint's rotated grid
    using graddesc's quantized-rotation bilinear sampling matrix (one MXU
    matmul, no per-sample gathers);
  - the patch is mean/std normalized (photometric invariance);
  - a small MLP (400 -> 256 -> relu -> 128 -> relu -> 48, ~142k params)
    maps it to a unit-L2 48-d descriptor. Pure constant matmuls at
    runtime — MXU-native, no conv plumbing needed at this patch size.

Weights are trained offline by tools/train_patch_descriptor.py with a
HardNet-style hardest-in-batch contrastive loss (Mishchuk et al. 2017) on
rendered-image patch correspondences under random rotation, scale jitter,
shift, brightness/contrast and noise. The trained weights ship in
frontend/weights/learned48.npz. If the weights file is missing the module
falls back to the grad48 construction so the family stays functional.

Distances are NORM_L2SQR on unit vectors, exactly like the reference's
float-descriptor dispatch (src/FeatureMatcher.cc:1508-1531).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import graddesc
from .orientation import gather_patches

WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "weights", "learned48.npz"
)

_WEIGHTS = None
_WEIGHTS_LOADED = False


def load_weights():
    global _WEIGHTS, _WEIGHTS_LOADED
    if not _WEIGHTS_LOADED:
        _WEIGHTS_LOADED = True
        if os.path.exists(WEIGHTS_PATH):
            z = np.load(WEIGHTS_PATH)
            # keep HOST arrays: load_weights may first run inside a jit
            # trace (extract_features), where jnp conversion would cache
            # tracers; numpy constants fold into each consuming program
            _WEIGHTS = {k: np.asarray(z[k]) for k in z.files}
    return _WEIGHTS


def sample_canonical_patches(img, xy, angle):
    """(N, 400) rotation-canonicalized, mean/std-normalized 20x20 intensity
    patches (shares graddesc's constant bilinear sampling matrix)."""
    n = xy.shape[0]
    patch = gather_patches(img, xy, graddesc.PATCH_RADIUS).reshape(
        n, graddesc._P * graddesc._P
    )
    s = jnp.asarray(graddesc._sample_mat(), jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    samp = jnp.dot(patch.astype(jnp.bfloat16), s, **kw)
    step = jnp.round(
        angle * (graddesc.N_ROT / (2.0 * jnp.pi))
    ).astype(jnp.int32) % graddesc.N_ROT
    onehot = jax.nn.one_hot(step, graddesc.N_ROT, dtype=samp.dtype)
    samp = jnp.einsum(
        "nrs,nr->ns",
        samp.reshape(n, graddesc.N_ROT, graddesc._N_SAMP), onehot,
    )
    mu = samp.mean(axis=-1, keepdims=True)
    sd = samp.std(axis=-1, keepdims=True)
    return (samp - mu) / jnp.clip(sd, 1e-3, None)


def mlp_forward(params, x):
    """400 -> 256 -> 128 -> 48, unit L2 output. x: (N, 400)."""
    h = jax.nn.relu(x @ params["w1"] + params["b1"])
    h = jax.nn.relu(h @ params["w2"] + params["b2"])
    d = h @ params["w3"] + params["b3"]
    return d / jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8, None)


@jax.jit
def _describe_jit(params, img, xy, angle, valid):
    x = sample_canonical_patches(img, xy, angle)
    d = mlp_forward(params, x)
    return jnp.where(valid[:, None], d, 0.0)


def describe_learned48(img, xy, angle, valid):
    """(N, 48) float32 descriptors; grad48 fallback without weights."""
    params = load_weights()
    if params is None:
        return graddesc.describe_grad(img, xy, angle, valid, dim=48)
    return _describe_jit(params, img, xy, angle, valid)


def init_params(seed: int = 0):
    """He-initialized MLP parameters (training tool)."""
    rng = np.random.default_rng(seed)

    def lin(n_in, n_out):
        w = rng.normal(0, np.sqrt(2.0 / n_in), (n_in, n_out)).astype(np.float32)
        return w, np.zeros(n_out, np.float32)

    w1, b1 = lin(400, 256)
    w2, b2 = lin(256, 128)
    w3, b3 = lin(128, 48)
    return dict(w1=w1, b1=b1, w2=w2, b2=b2, w3=w3, b3=b3)
