"""All feature families: extraction on a real image, matching semantics,
precomputed (r2d2) loading."""

import numpy as np
import jax.numpy as jnp
import pytest

from anyfeature_vslam_tpu.frontend.extractor import (
    FEATURE_REGISTRY, ExtractorConfig, extract_features,
)
from anyfeature_vslam_tpu.ops import matching
from anyfeature_vslam_tpu.io import dataset, precomputed

TOY = "/root/reference/docs/toy_sequence"

LIVE_FEATURES = [n for n, v in FEATURE_REGISTRY.items() if v[0] != "precomputed"]


@pytest.fixture(scope="module")
def toy_image():
    seq = dataset.load_sequence(TOY)
    return dataset.load_gray(seq.image_paths[0])


@pytest.mark.parametrize("name", LIVE_FEATURES)
def test_extract_each_family(toy_image, name):
    cfg = ExtractorConfig.for_feature(name, n_features=400)
    feats = {
        k: np.asarray(v)
        for k, v in extract_features(
            jnp.asarray(toy_image), cfg, *toy_image.shape
        ).items()
    }
    n_valid = int(feats["valid"].sum())
    assert n_valid > 150, f"{name}: only {n_valid} keypoints"
    v = feats["valid"]
    assert np.all(np.isfinite(feats["xy"][v]))
    # normalized sizes within ORB band
    assert feats["size"][v].min() >= 1.0 - 1e-5
    assert feats["size"][v].max() <= 1.2 ** 7 + 1e-4
    # descriptor dtype/shape per family
    det, desc, *_ = FEATURE_REGISTRY[name]
    d = feats["desc_bits"]
    if desc.startswith("bin"):
        assert d.dtype == np.uint8 and d.shape[1] == int(desc[3:])
        assert set(np.unique(d[v])) <= {0, 1}
    else:
        assert d.dtype == np.float32
        # unit norm
        norms = np.linalg.norm(d[v], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)


@pytest.mark.parametrize("name", ["sift128", "brisk48"])
def test_descriptors_match_across_shift(toy_image, name):
    """Same scene shifted 6px: descriptors must re-match under the family's
    distance + reference matching threshold."""
    cfg = ExtractorConfig.for_feature(name, n_features=300)
    match_th = FEATURE_REGISTRY[name][5]
    sh = np.roll(toy_image, 6, axis=1)
    f1 = {k: np.asarray(v) for k, v in extract_features(jnp.asarray(toy_image), cfg, *toy_image.shape).items()}
    f2 = {k: np.asarray(v) for k, v in extract_features(jnp.asarray(sh), cfg, *toy_image.shape).items()}
    dist = np.asarray(
        matching.descriptor_distance_matrix(
            jnp.asarray(f1["desc_bits"]), jnp.asarray(f2["desc_bits"])
        )
    )
    good, total = 0, 0
    for i in np.nonzero(f1["valid"] & (f1["octave"] == 0))[0]:
        tgt = f1["xy"][i] + [6, 0]
        cand = np.nonzero(
            f2["valid"] & (f2["octave"] == 0)
            & (np.abs(f2["xy"] - tgt).max(1) < 2.5)
        )[0]
        if len(cand) == 0:
            continue
        total += 1
        if dist[i, cand].min() < match_th:
            good += 1
    assert total > 20, f"{name}: only {total} repeatable keypoints"
    assert good / total > 0.6, f"{name}: {good}/{total} matched under th={match_th}"


def test_precomputed_r2d2_loader(tmp_path):
    rng = np.random.default_rng(0)
    seq = tmp_path / "seq"
    (seq / "rgb").mkdir(parents=True)
    for sub in ("keypoints", "scores", "descriptors"):
        (seq / "r2d2" / sub).mkdir(parents=True)
    img_path = str(seq / "rgb" / "0001.png")
    n = 500
    kps = np.concatenate(
        [rng.uniform(0, 640, (n, 2)), rng.uniform(1, 8, (n, 1))], axis=1
    )
    scores = rng.uniform(0, 1, (n, 1))
    descs = rng.normal(size=(n, 128))
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)
    kps.astype(np.float64).tofile(seq / "r2d2" / "keypoints" / "0001.bin")
    scores.astype(np.float64).tofile(seq / "r2d2" / "scores" / "0001.bin")
    descs.astype(np.float64).tofile(seq / "r2d2" / "descriptors" / "0001.bin")

    out = precomputed.load_precomputed_features(img_path, capacity=300)
    assert out["valid"].sum() == 300
    # highest-score keypoints kept
    kept = np.sort(out["resp"][:300])
    expect = np.sort(scores[:, 0])[-300:]
    np.testing.assert_allclose(kept, expect, atol=1e-6)
    # sizes normalized into the ORB band
    assert out["size"][:300].min() >= 1.0 - 1e-5
    assert out["size"][:300].max() <= 1.2 ** 7 + 1e-4
    assert out["desc_bits"].shape == (300, 128)
    assert out["desc_bits"].dtype == np.float32


def test_capacity_and_dtype_helpers():
    from anyfeature_vslam_tpu.frontend.extractor import descriptor_dim, descriptor_dtype

    assert descriptor_dim("bin256") == 256
    assert descriptor_dim("bin488") == 488
    assert descriptor_dim("grad64") == 64
    assert descriptor_dim("float128") == 128
    assert descriptor_dtype("bin384") == np.uint8
    assert descriptor_dtype("grad128") == np.float32


# ---------------------------------------------------------------------------
# Per-family behavioral differentiation (round 2): the families are real
# constructions, not relabels — they must behave differently and each must
# deliver its own invariances.

ROT_FAMILIES = ["orb32", "brisk48", "anyfeat_bin", "akaze61", "kaze64"]


@pytest.mark.parametrize("name", ROT_FAMILIES)
def test_rotation_invariance(toy_image, name):
    """Descriptors re-match their 90deg-rotated counterparts under the
    family's own matching threshold (steered BRIEF / BRISK rings / FREAK
    retina / M-LDB / M-SURF are all oriented constructions)."""
    cfg = ExtractorConfig.for_feature(name, n_features=400)
    match_th = FEATURE_REGISTRY[name][5]
    rot = np.ascontiguousarray(np.rot90(toy_image))  # (x, y) -> (y, W-1-x)
    H, W = toy_image.shape
    f1 = {k: np.asarray(v) for k, v in extract_features(
        jnp.asarray(toy_image), cfg, *toy_image.shape).items()}
    f2 = {k: np.asarray(v) for k, v in extract_features(
        jnp.asarray(rot), cfg, *rot.shape).items()}
    dist = np.asarray(matching.descriptor_distance_matrix(
        jnp.asarray(f1["desc_bits"]), jnp.asarray(f2["desc_bits"])))
    good = tot = 0
    for i in np.nonzero(f1["valid"] & (f1["octave"] == 0))[0]:
        x, y = f1["xy"][i]
        tgt = np.array([y, W - 1 - x])
        cand = np.nonzero(
            f2["valid"] & (f2["octave"] == 0)
            & (np.abs(f2["xy"] - tgt).max(1) < 2.5))[0]
        if len(cand) == 0:
            continue
        tot += 1
        if dist[i, cand].min() < match_th:
            good += 1
    assert tot > 30, f"{name}: only {tot} repeatable keypoints under rotation"
    assert good / tot > 0.8, f"{name}: {good}/{tot} rematched under rotation"


def test_fed_scale_space_preserves_edges():
    """The AKAZE evolution is conduction-limited diffusion, not Gaussian
    blur: at equal diffusion time a strong step edge must stay sharper in
    the nonlinear scale space (this is the property the round-1 DoG
    stand-in lacked)."""
    from anyfeature_vslam_tpu.frontend import nonlinear, pyramid

    rng = np.random.default_rng(3)
    img = np.full((96, 96), 0.25, np.float32)
    img[:, 48:] = 0.75                      # strong vertical step
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)

    levels = nonlinear.build_evolution(jnp.asarray(img), 4, downsample=False)
    lv = levels[-1]
    sigma_eq = lv.sigma                      # same total diffusion time
    gauss = pyramid.gaussian_blur(
        jnp.asarray(img), float(sigma_eq), radius=int(3 * sigma_eq))
    def edge_strength(a):
        a = np.asarray(a)
        mid = a[20:-20, :]
        return np.abs(np.diff(mid, axis=1))[:, 40:56].max()
    e_nl = edge_strength(lv.L)
    e_g = edge_strength(gauss)
    assert e_nl > 1.3 * e_g, (e_nl, e_g)
    # and smooth regions ARE diffused (not a no-op): noise variance drops
    flat_patch = np.asarray(lv.L)[8:40, 8:40]
    assert flat_patch.std() < 0.5 * img[8:40, 8:40].std()


def test_akaze_scale_selection():
    """The nonlinear det(Hessian) detector performs true characteristic-
    scale selection: a larger blob's strongest detection lands at a coarser
    evolution level. (The FAST pyramid has no such property — it fires at
    whatever levels the segment test passes.)"""
    ys, xs = np.mgrid[0:240, 0:320].astype(np.float32)
    img = np.zeros((240, 320), np.float32)
    rng = np.random.default_rng(7)
    blobs = [(80, 60, 2.0), (220, 160, 5.0)]
    for cx, cy, s in blobs:
        img += 180.0 * np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * s * s))
    img += rng.normal(0, 1.0, img.shape).astype(np.float32)
    img = np.clip(img, 0, 255)

    cfg = ExtractorConfig.for_feature("akaze61", n_features=200)
    f = {k: np.asarray(v) for k, v in extract_features(
        jnp.asarray(img), cfg, *img.shape).items()}
    v = f["valid"] & (f["resp"] > 0)
    levels = {}
    for cx, cy, s in blobs:
        d = np.abs(f["xy"][v] - [cx, cy]).max(1)
        near = d < 6
        assert near.any(), f"no detection at blob sigma={s}"
        resp = np.where(near, f["resp"][v], -1.0)
        levels[s] = int(f["octave"][v][np.argmax(resp)])
    assert levels[5.0] > levels[2.0], levels


def test_binary_families_bit_balance(toy_image):
    """Each binary construction produces near-balanced, non-degenerate
    bits on real imagery."""
    for name in ("orb32", "brisk48", "anyfeat_bin", "akaze61"):
        cfg = ExtractorConfig.for_feature(name, n_features=300)
        f = {k: np.asarray(v) for k, v in extract_features(
            jnp.asarray(toy_image), cfg, *toy_image.shape).items()}
        v = f["valid"]
        nbits = {"orb32": 256, "brisk48": 384, "anyfeat_bin": 512, "akaze61": 486}[name]
        d = f["desc_bits"][v][:, :nbits].astype(np.float32)
        assert 0.3 < d.mean() < 0.7, (name, d.mean())
        # no stuck bits: per-bit variance nonzero for the vast majority
        per_bit = d.mean(0)
        frac_stuck = np.mean((per_bit < 0.02) | (per_bit > 0.98))
        assert frac_stuck < 0.1, (name, frac_stuck)


def _blob_image(blobs, h=240, w=320, bg=128.0):
    """blobs: list of (cx, cy, sigma, amplitude)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.full((h, w), bg, np.float32)
    for cx, cy, s, a in blobs:
        img += a * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
    return np.clip(img, 0, 255).astype(np.float32)


def test_sift_scale_selection():
    """3D DoG extrema must select sizes that grow with blob scale
    (frontend/scalespace.py; reference SiftGPU semantics,
    src/Feature_sift128.cpp:9-92)."""
    # sigma=3 sits in octave 0's inner DoG band, sigma=9 in octave 1's
    # (no initial 2x upsampling — "first octave 0" mode, see
    # scalespace.py module doc — so sub-sigma0 blobs are out of band)
    small = [(60.0 + 50 * i, 60.0 + 40 * j, 3.0, 120.0)
             for i in range(5) for j in range(4)]
    big = [(35.0 + 60 * i, 35.0 + 60 * j, 9.0, 120.0)
           for i in range(5) for j in range(3)]
    img = _blob_image(small + big)
    cfg = ExtractorConfig.for_feature("sift128", n_features=400)
    f = {k: np.asarray(v) for k, v in
         extract_features(jnp.asarray(img), cfg, 240, 320).items()}
    v = f["valid"]
    xy, size = f["xy"][v], f["size"][v]

    def nearest_size(cx, cy):
        d = np.linalg.norm(xy - [cx, cy], axis=1)
        i = np.argmin(d)
        return size[i] if d[i] < 4.0 else None

    small_sizes = [s for b in small if (s := nearest_size(b[0], b[1])) is not None]
    big_sizes = [s for b in big if (s := nearest_size(b[0], b[1])) is not None]
    assert len(small_sizes) >= 10 and len(big_sizes) >= 8
    # big blobs must be detected at clearly larger continuous scale
    assert np.median(big_sizes) > 1.5 * np.median(small_sizes)


def test_sift_subpixel_refinement():
    """Blobs centered off-grid must localize to <0.5 px via the quadratic
    fit (scalespace.dog_extrema_maps)."""
    centers = [(60.37, 60.61), (160.73, 100.28), (240.17, 180.84), (80.52, 170.33)]
    img = _blob_image([(cx, cy, 3.0, 150.0) for cx, cy in centers])
    cfg = ExtractorConfig.for_feature("sift128", n_features=200)
    f = {k: np.asarray(v) for k, v in
         extract_features(jnp.asarray(img), cfg, 240, 320).items()}
    xy = f["xy"][f["valid"]]
    hits = 0
    for cx, cy in centers:
        d = np.linalg.norm(xy - [cx, cy], axis=1)
        if d.min() < 0.5:
            hits += 1
    assert hits >= 3, f"only {hits}/4 blobs localized to <0.5 px"


def test_surf_det_hessian_rejects_edges():
    """det(Hessian) must fire on blobs but not on a straight step edge
    (the determinant criterion kills 1D structure; scalespace.det_hessian_map)."""
    img = _blob_image([(80.0, 60.0, 4.0, 150.0), (240.0, 180.0, 4.0, 150.0)])
    img[:, 160:] += 60.0  # vertical step edge at x=160
    img = np.clip(img, 0, 255).astype(np.float32)
    cfg = ExtractorConfig.for_feature("surf64", n_features=200)
    f = {k: np.asarray(v) for k, v in
         extract_features(jnp.asarray(img), cfg, 240, 320).items()}
    xy = f["xy"][f["valid"]]
    assert len(xy) >= 2
    # every detection near the edge line but away from the blobs is a failure
    near_edge = (np.abs(xy[:, 0] - 160) < 3)
    for cx, cy in ((80, 60), (240, 180)):
        near_edge &= np.linalg.norm(xy - [cx, cy], axis=1) > 10
    assert near_edge.sum() == 0, f"{near_edge.sum()} spurious edge detections"
    # and the blobs themselves are found
    for cx, cy in ((80, 60), (240, 180)):
        assert np.linalg.norm(xy - [cx, cy], axis=1).min() < 3.0
