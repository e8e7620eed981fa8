"""Offline training for the learned48 descriptor (frontend/learned48.py).

Self-supervised patch correspondence training, HardNet-style (Mishchuk et
al. 2017, "Working hard to know your neighbor's margins"): anchors are
textured patches from rendered sequence images; positives are the same
scene points re-sampled after a random similarity warp (rotation, scale,
sub-pixel shift) plus photometric jitter and noise — exactly the
perturbations the live pipeline sees between neighboring frames; negatives
are the hardest other patches in the batch. Loss: margin triplet against
the hardest in-batch negative.

Usage:
    PYTHONPATH=/root/repo python tools/train_patch_descriptor.py \
        sequence_path:/tmp/seq_a,/tmp/seq_b steps:2000 batch:512 \
        out:anyfeature_vslam_tpu/frontend/weights/learned48.npz

Also prints a suggested NORM_L2SQR matching threshold (the midpoint of the
positive / hardest-negative squared-distance modes on held-out pairs).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv=None):
    args = {}
    for a in (argv if argv is not None else sys.argv[1:]):
        if ":" in a:
            k, v = a.split(":", 1)
            args[k] = v
    seq_path = args.get("sequence_path")
    if not seq_path:
        print(__doc__)
        return 1

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from anyfeature_vslam_tpu.frontend import graddesc, learned48
    from anyfeature_vslam_tpu.io import dataset

    steps = int(args.get("steps", 2000))
    batch = int(args.get("batch", 512))
    margin = float(args.get("margin", 1.0))
    out = args.get("out", learned48.WEIGHTS_PATH)
    seed = int(args.get("seed", 0))
    rng = np.random.default_rng(seed)

    # ---- corpus: grayscale images. `sequence_path:synthetic` generates a
    # diverse procedural corpus (multi-scale filtered noise + random
    # oriented structures) — the rendered sequences' blob texture is too
    # self-similar for metric learning (hardest in-batch negatives are
    # true near-duplicates, which collapses the embedding).
    imgs = []
    if seq_path == "synthetic":
        from scipy.ndimage import gaussian_filter, rotate

        h, w = 480, 640
        for i in range(int(args.get("n_corpus", 160))):
            base = rng.normal(0, 1, (h, w))
            im = np.zeros((h, w))
            for sigma, amp in ((1.5, 1.0), (4.0, 1.5), (12.0, 2.0)):
                im += amp * gaussian_filter(rng.normal(0, 1, (h, w)), sigma)
            # oriented structures: rotated rectangles and lines
            for _ in range(40):
                y0 = rng.integers(0, h - 40)
                x0 = rng.integers(0, w - 40)
                hh = rng.integers(4, 40)
                ww = rng.integers(4, 40)
                im[y0:y0 + hh, x0:x0 + ww] += rng.uniform(-3, 3)
            im = rotate(im, float(rng.uniform(0, 180)), reshape=False,
                        order=1, mode="reflect")
            im = im - im.min()
            im = im / max(im.max(), 1e-6) * 255.0
            imgs.append(im.astype(np.float32))
    else:
        for sp in seq_path.split(","):
            seq = dataset.load_sequence(sp)
            for p in seq.image_paths[::3][:120]:
                imgs.append(dataset.load_gray(p).astype(np.float32))
    print(f"corpus: {len(imgs)} images", flush=True)
    h, w = imgs[0].shape
    imgs = np.stack([im for im in imgs if im.shape == (h, w)])

    margin_px = graddesc.PATCH_RADIUS + 6

    def textured_points(im, n):
        """Random positions with local contrast (flat patches are useless
        training signal)."""
        xs = rng.uniform(margin_px, w - margin_px, 4 * n)
        ys = rng.uniform(margin_px, h - margin_px, 4 * n)
        g = np.abs(np.diff(im, axis=1))
        score = g[np.clip(ys.astype(int), 0, h - 1),
                  np.clip(xs.astype(int), 0, w - 2)]
        order = np.argsort(-score)[:n]
        return np.stack([xs[order], ys[order]], -1).astype(np.float32)

    @jax.jit
    def sample_batch(img_a, img_b, xy_a, xy_b, ang_a, ang_b):
        pa = learned48.sample_canonical_patches(img_a, xy_a, ang_a)
        pb = learned48.sample_canonical_patches(img_b, xy_b, ang_b)
        return pa, pb

    def make_pairs(n):
        """(anchor patches, positive patches) as (n, 400) arrays."""
        i = rng.integers(0, len(imgs))
        im = imgs[i]
        xy = textured_points(im, n)
        ang = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        # similarity warp of the image: rotation r, scale s about center
        r = rng.uniform(-0.35, 0.35)
        s = float(np.exp(rng.uniform(-0.15, 0.15)))
        ca, sa = np.cos(r) / s, np.sin(r) / s
        cx, cy = w / 2.0, h / 2.0
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        # source coords of each warped pixel (inverse map)
        sx = ca * (xx - cx) - sa * (yy - cy) + cx
        sy = sa * (xx - cx) + ca * (yy - cy) + cy
        from scipy.ndimage import map_coordinates

        warped = map_coordinates(im, [sy, sx], order=1, mode="nearest")
        # photometric jitter + noise
        gain = float(np.exp(rng.uniform(-0.25, 0.25)))
        bias = float(rng.uniform(-16, 16))
        warped = np.clip(warped * gain + bias, 0, 255)
        warped = warped + rng.normal(0, 3.0, warped.shape)
        # forward-map the anchor points into the warped image
        fx = (ca * s * s) * (xy[:, 0] - cx) + (sa * s * s) * (xy[:, 1] - cy) + cx
        fy = (-sa * s * s) * (xy[:, 0] - cx) + (ca * s * s) * (xy[:, 1] - cy) + cy
        xy_b = np.stack([fx, fy], -1).astype(np.float32)
        xy_b += rng.normal(0, 0.6, xy_b.shape)  # sub-pixel localization noise
        ok = (
            (xy_b[:, 0] > margin_px) & (xy_b[:, 0] < w - margin_px)
            & (xy_b[:, 1] > margin_px) & (xy_b[:, 1] < h - margin_px)
        )
        # orientation estimate follows the warp rotation, with estimator noise
        sign = float(args.get("rot_sign", "1"))
        ang_b = (ang + sign * r + rng.normal(0, 0.06, n)).astype(np.float32)
        pa, pb = sample_batch(
            jnp.asarray(im), jnp.asarray(warped.astype(np.float32)),
            jnp.asarray(xy), jnp.asarray(xy_b),
            jnp.asarray(ang), jnp.asarray(ang_b),
        )
        return np.asarray(pa)[ok], np.asarray(pb)[ok]

    params = {k: jnp.asarray(v) for k, v in learned48.init_params(seed).items()}
    opt = optax.adam(float(args.get("lr", 1e-3)))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, pa, pb):
        def loss_fn(p):
            da = learned48.mlp_forward(p, pa)
            db = learned48.mlp_forward(p, pb)
            # squared L2 distance matrix on unit vectors
            d2 = jnp.clip(2.0 - 2.0 * da @ db.T, 0.0, None)
            d = jnp.sqrt(d2 + 1e-9)
            pos = jnp.diagonal(d)
            big = 10.0 * jnp.eye(d.shape[0])
            neg_row = jnp.min(d + big, axis=1)   # hardest neg for anchor
            neg_col = jnp.min(d + big, axis=0)   # hardest neg for positive
            neg = jnp.minimum(neg_row, neg_col)
            loss = jnp.mean(jax.nn.relu(margin + pos - neg))
            return loss, (jnp.mean(pos), jnp.mean(neg))

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    for step in range(steps):
        pa, pb = make_pairs(batch)
        if len(pa) < 32:
            continue
        params, opt_state, loss, (mp, mn) = train_step(
            params, opt_state, jnp.asarray(pa), jnp.asarray(pb)
        )
        if step % 100 == 0:
            print(f"step {step}: loss {float(loss):.4f} "
                  f"pos {float(mp):.3f} neg {float(mn):.3f}", flush=True)

    # ---- threshold calibration on held-out pairs
    pos_d2, neg_d2 = [], []
    for _ in range(8):
        pa, pb = make_pairs(batch)
        da = np.asarray(learned48.mlp_forward(params, jnp.asarray(pa)))
        db = np.asarray(learned48.mlp_forward(params, jnp.asarray(pb)))
        d2 = np.clip(2.0 - 2.0 * da @ db.T, 0, None)
        pos_d2.append(np.diagonal(d2))
        big = 10.0 * np.eye(d2.shape[0])
        neg_d2.append((d2 + big).min(axis=1))
    pos_d2 = np.concatenate(pos_d2)
    neg_d2 = np.concatenate(neg_d2)
    p90 = float(np.percentile(pos_d2, 90))
    n10 = float(np.percentile(neg_d2, 10))
    print(f"pos d2 median {np.median(pos_d2):.3f} p90 {p90:.3f}; "
          f"hardest-neg d2 median {np.median(neg_d2):.3f} p10 {n10:.3f}")
    print(f"suggested matchingTh (L2SQR): {0.5 * (p90 + n10):.3f}")

    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, **{k: np.asarray(v) for k, v in params.items()})
    print(f"saved {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
