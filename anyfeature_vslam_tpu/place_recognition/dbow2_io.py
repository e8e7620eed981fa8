"""DBoW2 text-vocabulary import: drop-in use of reference vocabularies.

The reference loads per-feature DBoW2 vocabularies from text files
(`ORBvoc.txt`, `<Feature>_DBoW2_voc.txt`; reference src/Vocabulary.cpp:54-106,
DBoW2 TemplatedVocabulary text format):

    line 1:  <k> <L> <scoring> <weighting>
    line i:  <parent_id> <is_leaf 0|1> <descriptor values...> <weight>

Node ids are implicit (root = 0, file lines create nodes 1..N in order);
leaves get word ids in reading order. Binary descriptors are byte rows
(e.g. 32 bytes for ORB) — expanded here to the framework's {0,1} bit-plane
convention; float descriptors are kept as float32.

Transform runs as a batched masked tree descent (gather + distance argmin
per level, all N descriptors in lockstep — the TPU-shaped equivalent of
DBoW2's per-descriptor recursion). The keyframe database stores SPARSE
per-keyframe word lists (place_recognition/database.py), so ~1e6-word
reference vocabularies are used UNFOLDED by default — word ids and tf-idf
weights match DBoW2's exactly. Pass `fold` to bucket words (word % fold)
only if memory for the per-query dense vector (n_words float32) is a
concern.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class Dbow2Vocabulary:
    branching: int
    depth: int
    children: np.ndarray     # (n_nodes, k) int32 child node ids, -1 pad
    node_desc: np.ndarray    # (n_nodes, D) uint8 bit planes or float32
    leaf_word: np.ndarray    # (n_nodes,) int32 word id or -1
    word_weight: np.ndarray  # (n_raw_words,) float32 (file weights)
    fold: int                # dense-histogram bucket count

    @property
    def n_words(self) -> int:
        return self.fold

    @property
    def idf(self) -> np.ndarray:
        """Per-word weight; folded (max over bucket) only when fold <
        the raw word count."""
        cached = self.__dict__.get("_idf_folded")
        if cached is None:
            if self.fold >= len(self.word_weight):
                cached = np.where(
                    self.word_weight > 0, self.word_weight, 1e-3
                ).astype(np.float32)
            else:
                w = np.zeros(self.fold, np.float32)
                np.maximum.at(w, np.arange(len(self.word_weight)) % self.fold,
                              self.word_weight.astype(np.float32))
                cached = np.where(w > 0, w, 1e-3)
            self.__dict__["_idf_folded"] = cached
        return cached


def _bytes_to_bitplanes(rows: np.ndarray) -> np.ndarray:
    """(N, B) uint8 bytes -> (N, 8B) uint8 {0,1}, LSB-first per byte
    (cv::Mat byte order; matches the popcount distance either way since
    the expansion is applied consistently to tree and queries)."""
    return np.unpackbits(rows.astype(np.uint8), axis=1, bitorder="little")


def load_dbow2_text(path: str, binary: bool | None = None, fold: int | None = None) -> Dbow2Vocabulary:
    """Parse a DBoW2 text vocabulary (reference vocabulary folder files)."""
    with open(path) as f:
        header = f.readline().split()
        k, depth = int(header[0]), int(header[1])
        parents, leaf_flags, descs, weights = [], [], [], []
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            parents.append(int(parts[0]))
            leaf_flags.append(int(parts[1]))
            vals = [float(v) for v in parts[2:-1]]
            descs.append(vals)
            weights.append(float(parts[-1]))

    n_lines = len(parents)
    d_raw = np.asarray(descs)
    if binary is None:
        # heuristic: integer-valued 0..255 rows of byte-ish width => binary
        binary = bool(
            np.all(d_raw == np.round(d_raw)) and d_raw.min() >= 0 and d_raw.max() <= 255
            and d_raw.shape[1] in (16, 32, 48, 61, 64)
        )
    if binary:
        node_desc_rows = _bytes_to_bitplanes(d_raw)
    else:
        node_desc_rows = d_raw.astype(np.float32)

    n_nodes = n_lines + 1  # + root
    dim = node_desc_rows.shape[1]
    node_desc = np.zeros((n_nodes, dim), node_desc_rows.dtype)
    node_desc[1:] = node_desc_rows
    children = np.full((n_nodes, k), -1, np.int32)
    child_count = np.zeros(n_nodes, np.int32)
    leaf_word = np.full(n_nodes, -1, np.int32)
    next_word = 0
    for i in range(n_lines):
        node = i + 1
        p = parents[i]
        if child_count[p] < k:
            children[p, child_count[p]] = node
            child_count[p] += 1
        if leaf_flags[i]:
            leaf_word[node] = next_word
            next_word += 1
    word_weight = np.zeros(next_word, np.float32)
    for i in range(n_lines):
        node = i + 1
        if leaf_word[node] >= 0:
            word_weight[leaf_word[node]] = weights[i]
    return Dbow2Vocabulary(
        branching=k, depth=depth, children=children, node_desc=node_desc,
        leaf_word=leaf_word, word_weight=word_weight,
        fold=(max(next_word, 1) if fold is None
              else min(fold, max(next_word, 1))),
    )


@partial(jax.jit, static_argnames=("depth", "k"))
def _descend(desc, valid, children, node_desc, leaf_word, depth: int, k: int):
    n = desc.shape[0]
    binary = desc.dtype == jnp.uint8
    d = desc.astype(jnp.int8) if binary else desc
    nd = node_desc.astype(jnp.int8) if binary else node_desc
    node = jnp.zeros((n,), jnp.int32)
    for _ in range(depth + 1):  # +1: unbalanced trees may run deep
        ch = children[node]                      # (N, k)
        has_child = ch >= 0
        ch_safe = jnp.maximum(ch, 0)
        cands = nd[ch_safe]                      # (N, k, D)
        diff = d[:, None, :] - cands
        dist = (
            jnp.sum(jnp.abs(diff), axis=-1) if binary
            else jnp.sum(diff * diff, axis=-1)
        ).astype(jnp.float32)
        dist = jnp.where(has_child, dist, jnp.inf)
        best = jnp.argmin(dist, axis=-1).astype(jnp.int32)
        nxt = jnp.take_along_axis(ch, best[:, None], axis=1)[:, 0]
        node = jnp.where(jnp.any(has_child, axis=-1), nxt, node)  # stay at leaf
    word = leaf_word[node]
    return jnp.where(valid & (word >= 0), word, -1)


def transform_words_dbow2(vocab: Dbow2Vocabulary, desc_bits, valid):
    """Descriptors -> FOLDED word ids (-1 invalid)."""
    w = _descend(
        desc_bits, valid,
        jnp.asarray(vocab.children), jnp.asarray(vocab.node_desc),
        jnp.asarray(vocab.leaf_word), vocab.depth, vocab.branching,
    )
    return jnp.where(w >= 0, w % vocab.fold, -1)


def save_dbow2_text(vocab, path: str):
    """Export a framework-native balanced Vocabulary (place_recognition.vocab)
    to the DBoW2 text format, so vocabularies trained here
    (tools/create_vocabulary.py) can round-trip through reference tooling."""
    k, depth = vocab.branching, vocab.depth
    lines = [f"{k} {depth} 0 0"]
    binary = vocab.centroids[0].dtype == np.uint8
    # breadth-first: nodes of level l are centroids[l] rows; parents are the
    # previous level's nodes (root = 0). node ids follow file order.
    node_id_of = {}
    next_id = 1
    for level in range(depth):
        cents = vocab.centroids[level]
        for row in range(len(cents)):
            parent = 0 if level == 0 else node_id_of[(level - 1, row // k)]
            is_leaf = 1 if level == depth - 1 else 0
            word = row if is_leaf else -1
            weight = float(vocab.idf[word]) if is_leaf else 0.0
            if binary:
                bits = np.packbits(cents[row].astype(np.uint8), bitorder="little")
                desc_str = " ".join(str(int(b)) for b in bits)
            else:
                desc_str = " ".join(f"{float(v):.6f}" for v in cents[row])
            lines.append(f"{parent} {is_leaf} {desc_str} {weight}")
            node_id_of[(level, row)] = next_id
            next_id += 1
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
