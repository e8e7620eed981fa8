"""Fused Pallas matcher vs the jnp oracle (ops/pallas_match.py).

Runs the kernel in interpreter mode on CPU (conftest pins JAX_PLATFORMS=cpu);
the real-TPU compile is exercised by bench.py / the verify flow.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from anyfeature_vslam_tpu.ops import pallas_match


def _case(rng, nq, nc, binary):
    if binary:
        q = rng.integers(0, 2, (nq, 256)).astype(np.uint8)
        c = rng.integers(0, 2, (nc, 256)).astype(np.uint8)
    else:
        q = rng.normal(size=(nq, 128)).astype(np.float32)
        c = rng.normal(size=(nc, 128)).astype(np.float32)
    q_uv = rng.uniform(0, 640, (nq, 2)).astype(np.float32)
    c_uv = rng.uniform(0, 640, (nc, 2)).astype(np.float32)
    q_rad = rng.uniform(30, 200, nq).astype(np.float32)
    q_slo = np.full(nq, 0.0, np.float32)
    q_shi = np.full(nq, 1e9, np.float32)
    c_size = rng.uniform(1, 3, nc).astype(np.float32)
    c_valid = rng.random(nc) < 0.9
    return q, c, q_uv, c_uv, q_rad, q_slo, q_shi, c_size, c_valid


@pytest.mark.parametrize("binary", [True, False])
@pytest.mark.parametrize("nq,nc", [(100, 300), (256, 512), (300, 700)])
def test_fused_matches_oracle(binary, nq, nc):
    rng = np.random.default_rng(0 if binary else 1)
    args = _case(rng, nq, nc, binary)
    b_ref, i_ref, s_ref = pallas_match.reference_best_two(*map(jnp.asarray, args))
    b, i, s = pallas_match.fused_best_two(
        *map(jnp.asarray, args), tile_q=128, tile_c=256, interpret=True
    )
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref), rtol=1e-4, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-4, atol=1e-2)


def test_size_band_gate():
    rng = np.random.default_rng(2)
    q, c, q_uv, c_uv, q_rad, _, _, c_size, c_valid = _case(rng, 64, 128, True)
    q_slo = np.full(64, 1.5, np.float32)
    q_shi = np.full(64, 2.0, np.float32)
    q_rad[:] = 1e9
    b, i, s = pallas_match.fused_best_two(
        jnp.asarray(q), jnp.asarray(c), jnp.asarray(q_uv), jnp.asarray(c_uv),
        jnp.asarray(q_rad), jnp.asarray(q_slo), jnp.asarray(q_shi),
        jnp.asarray(c_size), jnp.asarray(c_valid),
        tile_q=128, tile_c=128, interpret=True,
    )
    i = np.asarray(i)
    ok = i >= 0
    assert ok.any()
    assert ((c_size[i[ok]] >= 1.5) & (c_size[i[ok]] <= 2.0)).all()


def test_no_candidates_yields_invalid():
    rng = np.random.default_rng(3)
    args = list(_case(rng, 32, 64, True))
    args[8] = np.zeros(64, bool)  # all candidates invalid
    b, i, s = pallas_match.fused_best_two(
        *map(jnp.asarray, args), tile_q=128, tile_c=128, interpret=True
    )
    assert (np.asarray(i) == -1).all()
    assert (np.asarray(b) >= float(pallas_match.INF)).all()
