"""Offline vocabulary training — counterpart of the reference's
createVocabulary.py + src/createVocabulary.cpp (samples a sequence's frames,
extracts descriptors per feature type, trains a k-means tree with tf-idf
weights, and writes the vocabulary file).

Usage:
    PYTHONPATH=/root/repo python tools/create_vocabulary.py \
        sequence_path:/path/to/seq feature:orb32 out:/path/voc_orb32.npz \
        sample_every:6 branching:32 depth:2 max_frames:200

Defaults mirror the reference tool's sampling (every 6th frame,
createVocabulary.py:37-42); branching/depth default to the dense-scoring
shape discussed in place_recognition/vocab.py.
"""

from __future__ import annotations

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
    import jax.numpy as jnp

    from anyfeature_vslam_tpu.frontend.extractor import (
        ExtractorConfig, extract_features,
    )
    from anyfeature_vslam_tpu.io import dataset
    from anyfeature_vslam_tpu.place_recognition import vocab as vocab_mod

    feature = args.get("feature", "orb32")
    every = int(args.get("sample_every", 6))
    branching = int(args.get("branching", 32))
    depth = int(args.get("depth", 2))
    max_frames = int(args.get("max_frames", 200))
    out = args.get("out", f"voc_{feature}.npz")

    # `sequence_path` accepts a comma-separated list (the reference trains
    # on BOVISA; here multiple rendered sequences diversify the corpus)
    cfg = ExtractorConfig.for_feature(feature, n_features=int(args.get("n_features", 1000)))
    descs = []
    for sp in seq_path.split(","):
        seq = dataset.load_sequence(sp)
        paths = seq.image_paths[::every][:max_frames]
        for i, p in enumerate(paths):
            img = dataset.load_gray(p)
            feats = extract_features(jnp.asarray(img), cfg, *img.shape)
            v = np.asarray(feats["valid"])
            descs.append(np.asarray(feats["desc_bits"])[v])
            print(f"[{i + 1}/{len(paths)}] {p}: {int(v.sum())} descriptors", flush=True)
    descs = np.concatenate(descs)
    print(f"training vocabulary on {len(descs)} descriptors "
          f"(branching={branching}, depth={depth})", flush=True)
    voc = vocab_mod.train_vocabulary(
        descs, branching=branching, depth=depth,
        iters=int(args.get("iters", 8)),
        max_train=int(args.get("max_train", 50000)),
    )
    voc.save(out)
    print(f"saved {out} ({voc.n_words} words)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
