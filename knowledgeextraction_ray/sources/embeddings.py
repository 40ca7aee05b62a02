"""GloVe-format word-embedding source (reference S9).

Clean-room restatement of ``utils/chinese_CONLL.py:146-187`` (``load_glove``
+ ``construct_init_word_vecs``):

- text lines ``<word> <v1> <v2> ...``; blank lines skipped; digits in the
  word normalized to ``0`` (``DIGIT_RE``) before insertion, so later
  duplicates overwrite earlier ones exactly like the reference dict;
- a line whose vector length differs from ``emb_dim`` raises ValueError
  with the reference's message;
- vocab init fills a row when the word is found directly, else lowercased.

Ray shape: the file parses ONCE (driver or a task), ships via ``ray.put``
and deserializes once per worker through a module cache (the broadcast
pattern, never re-read per batch), or becomes a ``Dataset`` for the knn /
embedding operators.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

DIGIT_RE = re.compile(r"\d")


def load_glove(filename: str, emb_dim: int,
               normalize_digits: bool = True) -> dict[str, np.ndarray]:
    glove: dict[str, np.ndarray] = {}
    with open(filename, encoding="utf-8") as fin:
        for line in fin:
            parts = line.strip().split()
            if not parts:
                continue
            word, vec = parts[0], parts[1:]
            if len(vec) != emb_dim:
                raise ValueError("Inconsistent word vector sizes: %d vs %d"
                                 % (len(vec), emb_dim))
            if normalize_digits:
                word = DIGIT_RE.sub("0", word)
            glove[word] = np.array([float(v) for v in vec])
    return glove


def construct_init_word_vecs(vocab: dict[str, int], word_vecs: np.ndarray,
                             glove_dict: dict[str, np.ndarray]) -> np.ndarray:
    """Fill embedding rows for vocab words present in the glove dict
    (direct hit first, then lowercase — reference fallback order)."""
    for word, index in vocab.items():
        embedding = glove_dict.get(word)
        if embedding is None:
            embedding = glove_dict.get(word.lower())
        if embedding is not None:
            word_vecs[index] = embedding
    return word_vecs


def glove_dataset(filename: str, emb_dim: int,
                  normalize_digits: bool = True):
    """GloVe file → ``Dataset(word: string, embedding: list<double>)`` —
    the adapter that lets the ANN / embedding-dedup operators run over a
    word-vector file instead of the parquet embeddings table."""
    import ray.data as rd
    g = load_glove(filename, emb_dim, normalize_digits)
    words = list(g.keys())
    return rd.from_arrow(pa.Table.from_pydict({
        "word": pa.array(words, pa.string()),
        "embedding": pa.array([g[w].tolist() for w in words],
                              pa.list_(pa.float64())),
    }))


_GLOVE_CACHE: dict[str, dict] = {}


def broadcast_glove(filename: str, emb_dim: int,
                    normalize_digits: bool = True):
    """Parse once, ``ray.put`` the dict; read back via :func:`cached_glove`
    inside actors/tasks (one deserialize per worker process)."""
    import ray
    return ray.put(load_glove(filename, emb_dim, normalize_digits))


def cached_glove(ref) -> dict[str, np.ndarray]:
    if isinstance(ref, dict):
        return ref
    key = ref.hex()
    g = _GLOVE_CACHE.get(key)
    if g is None:
        import ray
        g = _GLOVE_CACHE.setdefault(key, ray.get(ref))
    return g


class GloveEmbedder:
    """Actor-state ``map_batches`` body: adds an ``embedding`` column by
    word lookup (direct, then lowercase; zeros when absent). State loads in
    ``__init__`` once per actor — the S9 per-worker embedding table."""

    def __init__(self, glove_ref, emb_dim: int, word_col: str = "word"):
        self.glove = cached_glove(glove_ref)
        self.dim = emb_dim
        self.word_col = word_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = batch[self.word_col].to_pylist()
        out = np.zeros((len(words), self.dim), dtype=np.float64)
        for i, w in enumerate(words):
            v = self.glove.get(w)
            if v is None:
                v = self.glove.get(w.lower())
            if v is not None:
                out[i] = v
        return batch.append_column(
            "embedding", pa.array(out.tolist(), pa.list_(pa.float64())))
