"""Tests for the native runtime library (native/slam_native.cpp via
anyfeature_vslam_tpu/native.py).

The native pieces replace host-side hot loops of the orchestrator:
PNG decoding + prefetching loader (reference src/Image.cpp,
src/vslamlab_anyfeature_mono.cpp:144-170) and covisibility bookkeeping
(reference src/KeyFrame.cc:369 UpdateConnections). Each test checks the
native result against the pure-Python fallback semantics.
"""

import numpy as np
import pytest

from anyfeature_vslam_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _random_map(rng, K=7, N=40, max_pt=100, valid_frac=0.8):
    kf_matches = np.where(
        rng.random((K, N)) < 0.6, rng.integers(0, max_pt, (K, N)), -1
    ).astype(np.int32)
    kf_valid = (rng.random(K) < valid_frac).astype(np.uint8)
    kf_valid[0] = 1
    return kf_matches, kf_valid, max_pt


def _ref_covis_weights(kf_matches, kf_valid, target, max_pt):
    mine = set(p for p in kf_matches[target] if p >= 0)
    K = kf_matches.shape[0]
    w = np.zeros(K, np.int64)
    for k in range(K):
        if not kf_valid[k] or k == target:
            continue
        w[k] = sum(1 for p in kf_matches[k] if p >= 0 and p in mine)
    return w


def test_covisibility_weights_matches_python():
    rng = np.random.default_rng(0)
    for _ in range(5):
        km, kv, mp = _random_map(rng)
        out = native.covisibility_weights(km, kv, 0, mp)
        np.testing.assert_array_equal(out, _ref_covis_weights(km, kv, 0, mp))


def test_point_obs_counts_matches_python():
    rng = np.random.default_rng(1)
    km, kv, mp = _random_map(rng)
    out = native.point_obs_counts(km, kv, mp)
    ref = np.zeros(mp, np.int64)
    for k in range(km.shape[0]):
        if not kv[k]:
            continue
        for p in km[k]:
            if p >= 0:
                ref[p] += 1
    np.testing.assert_array_equal(out, ref)


def test_covisibility_matrix_symmetric_and_consistent():
    rng = np.random.default_rng(2)
    km, kv, mp = _random_map(rng)
    W = native.covisibility_matrix(km, kv, mp)
    assert W.shape == (km.shape[0],) * 2
    np.testing.assert_array_equal(W, W.T)
    # note: matrix counts multiplicity if a kf repeats a point id; rows for
    # kfs without repeated ids must match the per-target kernel
    for t in range(km.shape[0]):
        if not kv[t]:
            assert (W[t] == 0).all()
            continue
        ids = km[t][km[t] >= 0]
        if len(ids) != len(set(ids.tolist())):
            continue
        row_ok = True
        for k in range(km.shape[0]):
            ids_k = km[k][km[k] >= 0]
            if len(ids_k) != len(set(ids_k.tolist())):
                row_ok = False
        if row_ok:
            np.testing.assert_array_equal(
                W[t].astype(np.int64), _ref_covis_weights(km, kv, t, mp)
            )


def test_png_decode_matches_pil(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 48), np.uint8)
    p = tmp_path / "f.png"
    Image.fromarray(img).save(p)
    out = native.decode_png_gray(str(p))
    assert out is not None and out.shape == (32, 48)
    np.testing.assert_allclose(out, img.astype(np.float32))


def test_frame_loader_sequential_and_skip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, (16, 16), np.uint8) for _ in range(8)]
    paths = []
    for i, im in enumerate(imgs):
        p = tmp_path / f"{i}.png"
        Image.fromarray(im).save(p)
        paths.append(str(p))
    loader = native.FrameLoader(paths, 16, 16, ahead=2)
    try:
        for i in range(4):
            np.testing.assert_allclose(loader.get(i), imgs[i].astype(np.float32))
        # skip ahead past the prefetch window (regression: deadlocked before
        # stale frames were dropped on entry)
        np.testing.assert_allclose(loader.get(7), imgs[7].astype(np.float32))
    finally:
        loader.close()
