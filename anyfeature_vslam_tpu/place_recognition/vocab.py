"""Bag-of-words vocabulary: hierarchical k-means tree, TPU-native transform.

Replaces DBoW2's TemplatedVocabulary (reference include/Vocabulary.h:22-30,
src/Vocabulary.cpp:54-206 — k-means++ tree with branching kf=10, depth L=6,
TF_IDF weights, L1 scoring; trained offline by createVocabulary.py /
src/createVocabulary.cpp). Differences by design:

  - Our descriptors are this framework's own 256-bit steered BRIEF, so DBoW2
    text vocabularies do not apply; tools/create_vocabulary.py trains ours.
  - Transform is a BATCHED TREE DESCENT: all N descriptors walk the tree
    level by level, each step one masked Hamming argmin against the node's
    children — gather + matmul, no pointer chasing (SURVEY 2.6).
  - The word histogram is a DENSE fixed-size vector (n_words float32), so
    database scoring is one vectorized L1 over all keyframes instead of an
    inverted file.

Default shape: branching 32, depth 2 -> 1024 words (appropriate for the
~1k-descriptor frames; the reference's 1M-word vocabulary targets CPU
inverted-file sparsity, which dense TPU scoring does not need).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class Vocabulary:
    branching: int
    depth: int
    # nodes per level l: branching^(l+1) centroid bit arrays
    centroids: list  # [level] -> (branching^(l+1), 256) uint8 {0,1}
    idf: np.ndarray  # (n_words,) float32

    @property
    def n_words(self) -> int:
        return self.branching ** self.depth

    def save(self, path: str):
        np.savez_compressed(
            path,
            branching=self.branching,
            depth=self.depth,
            idf=self.idf,
            **{f"level_{l}": c for l, c in enumerate(self.centroids)},
        )

    @staticmethod
    def load(path: str):
        if path.endswith(".txt"):
            # reference DBoW2 text vocabulary (ORBvoc.txt et al.)
            from . import dbow2_io

            return dbow2_io.load_dbow2_text(path)
        z = np.load(path)
        depth = int(z["depth"])
        return Vocabulary(
            branching=int(z["branching"]),
            depth=depth,
            centroids=[z[f"level_{l}"] for l in range(depth)],
            idf=z["idf"].astype(np.float32),
        )


def _dist(a, b, chunk: int = 16384):
    """Pairwise distances, Hamming for uint8 bit-planes, sq-L2 for float.
    Chunked over `a` so large training corpora don't materialize an
    (N, K, D) intermediate."""
    if len(a) <= chunk:
        if a.dtype == np.uint8:
            return (a[:, None, :] != b[None, :, :]).sum(-1)
        diff = a[:, None, :].astype(np.float32) - b[None, :, :].astype(np.float32)
        return (diff * diff).sum(-1)
    out = np.empty((len(a), len(b)),
                   np.int64 if a.dtype == np.uint8 else np.float32)
    for i in range(0, len(a), chunk):
        out[i:i + chunk] = _dist(a[i:i + chunk], b)
    return out


def _kmeans(descs: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """K-means with descriptor-family-appropriate centroids: majority-vote
    for binary (DBoW2's binary clustering), mean for float."""
    binary = descs.dtype == np.uint8
    n = len(descs)
    if n <= k:
        cents = np.zeros((k, descs.shape[1]), descs.dtype)
        cents[:n] = descs
        return cents
    cents = descs[rng.choice(n, k, replace=False)].copy()
    for _ in range(iters):
        assign = _dist(descs, cents).argmin(1)
        for j in range(k):
            members = descs[assign == j]
            if len(members) == 0:
                cents[j] = descs[rng.integers(n)]
            elif binary:
                cents[j] = (members.mean(0) > 0.5).astype(np.uint8)
            else:
                cents[j] = members.mean(0).astype(descs.dtype)
    return cents


def train_vocabulary(
    desc_bits: np.ndarray, branching: int = 32, depth: int = 2,
    iters: int = 8, seed: int = 0, max_train: int = 50000,
) -> Vocabulary:
    """Hierarchical k-means (host numpy; offline tool path). Accepts uint8
    bit-plane descriptors (Hamming) or float descriptors (L2)."""
    rng = np.random.default_rng(seed)
    descs = np.asarray(desc_bits)
    if len(descs) > max_train:
        descs = descs[rng.choice(len(descs), max_train, replace=False)]

    centroids = []
    # level 0
    c0 = _kmeans(descs, branching, iters, rng)
    centroids.append(c0)
    for level in range(1, depth):
        # assign all descriptors down the tree built so far to find their node
        node_ids = np.zeros(len(descs), np.int64)
        for l in range(level):
            c = centroids[l]
            k = branching
            child = np.zeros(len(descs), np.int64)
            for gi in np.unique(node_ids):
                sel = node_ids == gi
                cands = c[gi * k : (gi + 1) * k]
                child[sel] = gi * k + _dist(descs[sel], cands).argmin(1)
            node_ids = child
        k = branching
        c_lvl = np.zeros((branching ** (level + 1), descs.shape[1]), descs.dtype)
        for gi in range(branching ** level):
            members = descs[node_ids == gi]
            c_lvl[gi * k : (gi + 1) * k] = _kmeans(members, k, iters, rng)
        centroids.append(c_lvl)

    vocab = Vocabulary(branching, depth, centroids, np.ones(branching ** depth, np.float32))
    # idf from training corpus ("documents" = chunks of ~500 descriptors);
    # transform in bounded chunks (the descent materializes (N, B, D))
    words = np.concatenate([
        np.asarray(transform_words(
            vocab, jnp.asarray(descs[i:i + 16384]),
            jnp.ones(len(descs[i:i + 16384]), bool),
        ))
        for i in range(0, len(descs), 16384)
    ])
    n_docs = max(len(descs) // 500, 1)
    df = np.zeros(vocab.n_words, np.float64)
    for c in range(n_docs):
        chunk = words[c * 500 : (c + 1) * 500]
        df[np.unique(chunk)] += 1
    vocab.idf = np.log(n_docs / np.clip(df, 1.0, None)).astype(np.float32) + 1e-3
    return vocab


@partial(jax.jit, static_argnames=("branching", "depth"))
def _transform_impl(desc_bits, valid, centroids_flat, branching: int, depth: int):
    n = desc_bits.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    binary = desc_bits.dtype == jnp.uint8
    d = desc_bits.astype(jnp.int8) if binary else desc_bits
    for level in range(depth):
        c = centroids_flat[level]
        c = c.astype(jnp.int8) if binary else c
        # children of `node` are rows node*branching .. node*branching+b-1
        child_base = node * branching
        cand_idx = child_base[:, None] + jnp.arange(branching)[None, :]  # (N, B)
        cands = c[cand_idx]  # (N, B, D)
        diff = d[:, None, :] - cands
        dist = jnp.sum(jnp.abs(diff), axis=-1) if binary else jnp.sum(diff * diff, axis=-1)
        node = child_base + jnp.argmin(dist, axis=-1).astype(jnp.int32)
    return jnp.where(valid, node, -1)


def transform_words(vocab, desc_bits, valid):
    """Descriptors -> word ids (-1 for invalid slots). Dispatches between
    the framework-native balanced tree and imported DBoW2 vocabularies."""
    from . import dbow2_io

    if isinstance(vocab, dbow2_io.Dbow2Vocabulary):
        return dbow2_io.transform_words_dbow2(vocab, desc_bits, valid)
    cents = [jnp.asarray(c) for c in vocab.centroids]
    return _transform_impl(desc_bits, valid, cents, vocab.branching, vocab.depth)


def bow_vector(vocab: Vocabulary, desc_bits, valid):
    """L1-normalized tf-idf histogram (n_words,) float32."""
    words = transform_words(vocab, desc_bits, valid)
    return bow_from_words(words, jnp.asarray(vocab.idf))


@jax.jit
def bow_from_words(words, idf):
    n_words = idf.shape[0]
    w = jnp.clip(words, 0, n_words - 1)
    counts = jnp.zeros((n_words,), jnp.float32).at[w].add(
        jnp.where(words >= 0, 1.0, 0.0)
    )
    v = counts * idf
    norm = jnp.sum(jnp.abs(v))
    return v / jnp.where(norm > 0, norm, 1.0)


@jax.jit
def l1_score(bow_a, bow_b):
    """DBoW2 L1 score: 1 - 0.5 * |va - vb|_1 for L1-normalized vectors
    (reference src/Vocabulary.cpp:132-154). Supports batched bow_b (K, W)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(bow_a[None, :] - bow_b), axis=-1)
