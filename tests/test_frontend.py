import numpy as np
import jax.numpy as jnp
import pytest

from anyfeature_vslam_tpu.frontend import fast, select, orientation, brief, pyramid
from anyfeature_vslam_tpu.frontend.extractor import ExtractorConfig, extract_features

TOY = "/root/reference/docs/toy_sequence"


def blob_image(h=120, w=160, n=30, seed=0):
    """Random bright square blobs on dark background -> strong FAST corners."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 30.0, np.float32)
    centers = []
    for _ in range(n):
        y, x = rng.integers(12, h - 12), rng.integers(12, w - 12)
        img[y - 3 : y + 4, x - 3 : x + 4] = 200.0
        centers.append((y, x))
    return img, centers


def test_fast_detects_blob_corners():
    img, centers = blob_image()
    score = np.asarray(fast.fast_score_map(jnp.asarray(img), 20.0))
    assert (score > 0).sum() > 0
    # corners of a 7x7 blob should fire; blob centers (flat) should not
    for y, x in centers[:10]:
        assert score[y, x] == 0.0, "flat blob center fired"
    # some pixel near each blob corner fires
    hits = 0
    for y, x in centers:
        if (score[y - 5 : y + 6, x - 5 : x + 6] > 0).any():
            hits += 1
    assert hits >= len(centers) * 0.9


def test_fast_no_corners_on_flat():
    img = jnp.full((64, 64), 100.0)
    score = np.asarray(fast.fast_score_map(img, 20.0))
    assert (score == 0).all()


def test_nms_keeps_local_maxima():
    img, _ = blob_image(seed=1)
    score = fast.fast_score_map(jnp.asarray(img), 20.0)
    nms = np.asarray(fast.nms3x3(score))
    s = np.asarray(score)
    ys, xs = np.nonzero(nms > 0)
    for y, x in zip(ys[:50], xs[:50]):
        patch = s[max(y - 1, 0) : y + 2, max(x - 1, 0) : x + 2]
        assert nms[y, x] >= patch.max() - 1e-5


def test_select_spread_topk():
    img, _ = blob_image(h=128, w=128, n=40, seed=2)
    score = fast.nms3x3(fast.fast_score_map(jnp.asarray(img), 20.0))
    xy, resp, valid = select.select_spread_topk(score, 64, border=8)
    xy, resp, valid = map(np.asarray, (xy, resp, valid))
    assert valid.sum() > 10
    # all selected are actual nms survivors with matching response
    s = np.asarray(score)
    for i in np.nonzero(valid)[0][:30]:
        x, y = int(xy[i, 0]), int(xy[i, 1])
        assert s[y, x] == pytest.approx(resp[i], abs=1e-4)
        assert 8 <= x < 120 and 8 <= y < 120


def test_ic_angle_gradient_direction():
    # intensity ramp along +x -> centroid to the right -> angle ~ 0
    img = jnp.asarray(np.tile(np.arange(64, dtype=np.float32), (64, 1)))
    ang = np.asarray(orientation.ic_angle(img, jnp.asarray([[32.0, 32.0]])))
    assert abs(ang[0]) < 0.05
    # ramp along +y -> angle ~ pi/2
    img_t = jnp.asarray(np.asarray(img).T)
    ang2 = np.asarray(orientation.ic_angle(img_t, jnp.asarray([[32.0, 32.0]])))
    assert abs(ang2[0] - np.pi / 2) < 0.05


def test_brief_descriptor_stability_and_discrimination():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (128, 128)).astype(np.float32)
    blur = pyramid.gaussian_blur(jnp.asarray(img))
    xy = jnp.asarray(rng.uniform(30, 98, (32, 2)).astype(np.float32))
    ang = jnp.zeros((32,))
    valid = jnp.ones((32,), bool)
    d1, b1 = brief.describe(blur, xy, ang, valid)
    d2, b2 = brief.describe(blur, xy, ang, valid)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    # same point same descriptor; different points differ by ~128 bits
    ham = (np.asarray(b1)[:, None, :] != np.asarray(b1)[None, :, :]).sum(-1)
    assert np.all(np.diag(ham) == 0)
    off = ham[~np.eye(32, dtype=bool)]
    assert 80 < off.mean() < 176
    # unpack_bits inverts packing
    assert np.array_equal(np.asarray(brief.unpack_bits(d1)), np.asarray(b1))


def test_extract_orb_on_real_image():
    import os

    from anyfeature_vslam_tpu.io import dataset

    seq = dataset.load_sequence(TOY)
    img = dataset.load_gray(seq.image_paths[0])
    cfg = ExtractorConfig(n_features=500)
    feats = extract_features(jnp.asarray(img), cfg, img.shape[0], img.shape[1])
    valid = np.asarray(feats["valid"])
    assert valid.sum() > 300, f"only {valid.sum()} keypoints on real image"
    xy = np.asarray(feats["xy"])[valid]
    assert xy[:, 0].max() <= img.shape[1] and xy[:, 1].max() <= img.shape[0]
    # multiple octaves populated
    assert len(np.unique(np.asarray(feats["octave"])[valid])) >= 3
    # sizes follow 1.2^octave
    np.testing.assert_allclose(
        np.asarray(feats["size"])[valid],
        1.2 ** np.asarray(feats["octave"])[valid].astype(np.float32),
        rtol=1e-5,
    )


def test_descriptor_matches_across_shift():
    """Descriptors of the same scene shifted by 8px should match at low
    Hamming distance for most keypoints (translation invariance)."""
    from anyfeature_vslam_tpu.io import dataset

    seq = dataset.load_sequence(TOY)
    img = dataset.load_gray(seq.image_paths[0])
    sh = np.roll(img, 8, axis=1)
    cfg = ExtractorConfig(n_features=300)
    f1 = extract_features(jnp.asarray(img), cfg, *img.shape)
    f2 = extract_features(jnp.asarray(sh), cfg, *img.shape)
    b1, v1 = np.asarray(f1["desc_bits"]), np.asarray(f1["valid"])
    b2, v2 = np.asarray(f2["desc_bits"]), np.asarray(f2["valid"])
    xy1, xy2 = np.asarray(f1["xy"]), np.asarray(f2["xy"])
    oc1, oc2 = np.asarray(f1["octave"]), np.asarray(f2["octave"])
    matched, good = 0, 0
    for i in np.nonzero(v1 & (oc1 == 0))[0]:
        tgt = xy1[i] + [8, 0]
        cand = np.nonzero(v2 & (oc2 == 0) & (np.abs(xy2 - tgt).max(1) < 2.5))[0]
        if len(cand) == 0:
            continue
        matched += 1
        dists = (b1[i][None] != b2[cand]).sum(-1)
        if dists.min() < 60:
            good += 1
    assert matched > 30
    assert good / matched > 0.75, f"{good}/{matched} shifted descriptors matched"


def test_mxu_patch_gather_matches_dynamic_slice():
    """The one-hot matmul gather (TPU path) must agree with the exact
    dynamic-slice gather to well below image noise (bf16x3 product with a
    0/1 selector; see orientation._gather_patches_mxu)."""
    import jax
    import jax.numpy as jnp

    from anyfeature_vslam_tpu.frontend import orientation

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(0, 255, (100, 120)).astype(np.float32))
    xy = jnp.asarray(rng.uniform([0, 0], [119, 99], (64, 2)).astype(np.float32))
    r = orientation.PATCH_RADIUS
    ref = orientation.gather_patches(img, xy, r)  # cpu backend -> dslice
    padded = jnp.pad(img, r, mode="edge")
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, 119)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, 99)
    mxu = jax.jit(orientation._gather_patches_mxu, static_argnums=3)(
        padded, yi, xi, 2 * r + 1
    )
    assert float(jnp.abs(ref - mxu).max()) < 0.01
