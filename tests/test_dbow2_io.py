"""DBoW2 text vocabulary import/export (place_recognition/dbow2_io.py).

Round-trips a framework-trained vocabulary through the reference's DBoW2
text format (reference src/Vocabulary.cpp:54-106 loaders) and checks the
imported tree descends to equivalent words; also parses a hand-written
unbalanced DBoW2 file.
"""

import numpy as np
import jax.numpy as jnp

from anyfeature_vslam_tpu.place_recognition import dbow2_io, vocab as vocab_mod


def _train_small(seed=0):
    rng = np.random.default_rng(seed)
    descs = rng.integers(0, 2, (3000, 256)).astype(np.uint8)
    return vocab_mod.train_vocabulary(descs, branching=4, depth=2, iters=4, seed=seed), descs


def test_roundtrip_binary(tmp_path):
    vocab, descs = _train_small()
    path = str(tmp_path / "voc.txt")
    dbow2_io.save_dbow2_text(vocab, path)
    loaded = vocab_mod.Vocabulary.load(path)
    assert isinstance(loaded, dbow2_io.Dbow2Vocabulary)
    assert loaded.branching == 4 and loaded.depth == 2
    assert len(loaded.word_weight) == vocab.n_words

    q = jnp.asarray(descs[:200])
    valid = jnp.ones(200, bool)
    w_native = np.asarray(vocab_mod.transform_words(vocab, q, valid))
    w_loaded = np.asarray(vocab_mod.transform_words(loaded, q, valid))
    # same tree, same descent -> identical word assignment
    np.testing.assert_array_equal(w_native, w_loaded)


def test_bow_vector_through_imported(tmp_path):
    vocab, descs = _train_small(1)
    path = str(tmp_path / "voc.txt")
    dbow2_io.save_dbow2_text(vocab, path)
    loaded = vocab_mod.Vocabulary.load(path)
    v1 = np.asarray(vocab_mod.bow_vector(loaded, jnp.asarray(descs[:300]), jnp.ones(300, bool)))
    v2 = np.asarray(vocab_mod.bow_vector(loaded, jnp.asarray(descs[300:600]), jnp.ones(300, bool)))
    assert abs(v1.sum() - 1.0) < 1e-4  # L1 normalized
    s_self = float(np.asarray(vocab_mod.l1_score(jnp.asarray(v1), jnp.asarray(v1[None]))))
    s_other = float(np.asarray(vocab_mod.l1_score(jnp.asarray(v1), jnp.asarray(v2[None]))))
    assert s_self > s_other  # self-similarity dominates


def test_unbalanced_tree_parse(tmp_path):
    """Hand-written file: root with 2 children, one child is a leaf at
    depth 1 (unbalanced), the other has 2 leaf children at depth 2."""
    d = lambda fill: " ".join(str(fill) for _ in range(32))
    lines = [
        "2 2 0 0",
        f"0 1 {d(0)} 0.5",    # node 1: leaf word 0 (depth 1)
        f"0 0 {d(255)} 0",    # node 2: internal
        f"2 1 {d(254)} 0.7",  # node 3: leaf word 1
        f"2 1 {d(1)} 0.9",    # node 4: leaf word 2
    ]
    path = tmp_path / "voc.txt"
    path.write_text("\n".join(lines) + "\n")
    v = dbow2_io.load_dbow2_text(str(path))
    assert len(v.word_weight) == 3
    # all-zero descriptor -> node 1 (leaf word 0); all-ones -> node 2 -> word 1
    zeros = jnp.zeros((1, 256), jnp.uint8)
    ones = jnp.ones((1, 256), jnp.uint8)
    w0 = int(np.asarray(dbow2_io.transform_words_dbow2(v, zeros, jnp.ones(1, bool)))[0])
    w1 = int(np.asarray(dbow2_io.transform_words_dbow2(v, ones, jnp.ones(1, bool)))[0])
    assert w0 == 0
    assert w1 == 1  # 255-bytes pattern: node 3 (254 bytes) is closer than node 4
