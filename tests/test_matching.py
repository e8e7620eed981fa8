import numpy as np
import jax.numpy as jnp

from anyfeature_vslam_tpu.ops import matching


def test_hamming_matrix_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, (64, 256)).astype(np.uint8)
    b = rng.integers(0, 2, (48, 256)).astype(np.uint8)
    got = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    want = (a[:, None, :] != b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_l2sq_matrix_matches_numpy():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(32, 128)).astype(np.float32)
    b = rng.normal(size=(40, 128)).astype(np.float32)
    got = np.asarray(matching.l2sq_matrix(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_best_two_with_mask():
    dist = jnp.asarray([[1.0, 5.0, 3.0], [7.0, 2.0, 9.0]])
    mask = jnp.asarray([[True, True, True], [False, True, True]])
    best, idx, second = matching.best_two(dist, mask)
    assert np.asarray(idx).tolist() == [0, 1]
    np.testing.assert_allclose(np.asarray(best), [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(second), [3.0, 9.0])


def test_best_two_all_masked():
    dist = jnp.ones((2, 3))
    mask = jnp.zeros((2, 3), bool)
    best, idx, second = matching.best_two(dist, mask)
    assert np.all(np.asarray(best) >= matching.INF)


def test_resolve_unique():
    idx = jnp.asarray([0, 0, 1, 1])
    dist = jnp.asarray([3.0, 1.0, 2.0, 2.0])
    valid = jnp.ones((4,), bool)
    keep = np.asarray(matching.resolve_unique(idx, dist, valid, 2))
    # candidate 0 -> row 1 (dist 1 < 3); candidate 1 -> tie, lowest row (2)
    assert keep.tolist() == [False, True, True, False]


def test_rotation_consistency():
    rng = np.random.default_rng(2)
    n = 200
    # 180 matches rotated by ~0.5 rad, 20 outliers random rotation
    aq = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    ac = np.concatenate([aq[:180] - 0.5, rng.uniform(0, 2 * np.pi, 20)]).astype(np.float32)
    idx = jnp.arange(n)
    valid = jnp.ones((n,), bool)
    keep = np.asarray(
        matching.rotation_consistency(jnp.asarray(aq), jnp.asarray(ac), idx, valid)
    )
    assert keep[:180].mean() > 0.95
    assert keep[180:].mean() < 0.4


def test_window_and_octave_masks():
    xy_q = jnp.asarray([[0.0, 0.0], [100.0, 100.0]])
    xy_c = jnp.asarray([[5.0, 5.0], [100.0, 90.0], [0.0, 30.0]])
    m = np.asarray(matching.window_mask(xy_q, xy_c, 10.0))
    assert m.tolist() == [[True, False, False], [False, True, False]]
    oq = jnp.asarray([0, 2])
    oc = jnp.asarray([0, 1, 3])
    m2 = np.asarray(matching.octave_band_mask(oq, oc, 0, 1))
    assert m2.tolist() == [[True, True, False], [False, False, True]]


def test_match_end_to_end_synthetic():
    """Permuted noisy copies of descriptors should match back exactly."""
    rng = np.random.default_rng(3)
    n = 128
    bits = rng.integers(0, 2, (n, 256)).astype(np.uint8)
    perm = rng.permutation(n)
    noisy = bits[perm].copy()
    flips = rng.integers(0, 256, (n, 10))
    for i in range(n):
        noisy[i, flips[i]] ^= 1
    dist = matching.hamming_matrix(jnp.asarray(bits), jnp.asarray(noisy))
    res = matching.match(dist, jnp.ones((n, n), bool), match_th=75.0, ratio=0.9)
    idx = np.asarray(res["idx"])
    valid = np.asarray(res["valid"])
    assert valid.mean() > 0.9
    # each valid match maps i -> position of i in perm
    inv = np.argsort(perm)
    assert (idx[valid] == inv[valid.nonzero()[0]]).mean() > 0.99
