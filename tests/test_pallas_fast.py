"""The fused Pallas FAST+NMS kernel must be bit-exact vs the jnp path.

On real TPU the kernel replaces fast.fast_score_map + fast.nms3x3 in the
extractor (frontend/extractor.py); here it runs in interpret mode on the
CPU mesh against the jnp oracle.
"""

import numpy as np
import jax.numpy as jnp

from anyfeature_vslam_tpu.frontend import fast
from anyfeature_vslam_tpu.frontend.pallas_fast import fast_nms_pallas


def test_pallas_fast_matches_jnp_oracle():
    rng = np.random.default_rng(7)
    for (h, w) in [(64, 96), (48, 179)]:
        img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
        ref = np.asarray(fast.nms3x3(fast.fast_score_map(img, 20.0)))
        out = np.asarray(fast_nms_pallas(img, 20.0, interpret=True))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-4)
        assert np.count_nonzero(ref) > 0  # the case is non-trivial


def test_pallas_fast_flat_image_silent():
    img = jnp.full((64, 128), 100.0, jnp.float32)
    out = np.asarray(fast_nms_pallas(img, 20.0, interpret=True))
    assert np.count_nonzero(out) == 0
