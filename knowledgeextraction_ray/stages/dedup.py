"""Deduplication suite over the ``documents`` table.

Exact + near-dup family a 100 TB training-data pipeline needs:

- **exact**: content-hash groupby, min-doc_id representative (SQL-checked).
- **char-Jaccard pairs**: pairwise char-set Jaccard within a partition key
  (SQL-checked against DuckDB's ``jaccard()``).
- **MinHash + LSH**: shingle → minhash signature → banded LSH buckets →
  candidate pairs → exact shingle-Jaccard verify. The shuffle is the
  ``groupby(band_id, band_hash)`` over signature FRAGMENTS (bands), never
  over document text; signatures are fixed-size, so the exchange is tiny
  relative to the corpus.
- **SimHash**: 64-bit token-hash majority signature per doc.
- **embedding near-dup**: random-hyperplane LSH buckets over an embedding
  column → verified cosine within buckets.

All sketch computation is per-batch vectorized numpy inside ``map_batches``;
hyperplanes / permutation seeds are deterministic (seeded) and built once per
actor. No near-dedup exists in the reference (SURVEY.md §2.7) — the exact
dedup generalizes its answer-text dedup D1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Min  # noqa: F401  (exact_dedup option)

from ..functions.hashing import sha256_column

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (text_sha, rep_doc_id, n_dups): hash-partitioned exact dedup, keep
    min id per content hash (deterministic representative)."""
    def add_sha(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "text_sha": sha256_column(batch[text_col]),
            id_col: batch[id_col],
        })
    from .groupagg import bucketed_agg
    return bucketed_agg(ds.map_batches(add_sha, batch_format="pyarrow"),
                        ["text_sha"],
                        {"rep_doc_id": (id_col, "min")},
                        count_alias="n_dups")


# ---------------------------------------------------------------------------
# char-set Jaccard pairs within a partition key (SQL-checkable)
# ---------------------------------------------------------------------------


def char_jaccard(a: str, b: str) -> float:
    """DuckDB ``jaccard()`` semantics: character-set Jaccard."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def jaccard_pairs(ds, key_col: str = "source", threshold: float = 0.5):
    """All (a, b) doc pairs with char-set Jaccard ≥ threshold, restricted to
    the same ``key_col`` group (blocking key). Pair order: doc_id_a <
    doc_id_b. The groupby is the blocking exchange; pairwise comparison only
    within blocks."""
    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        texts = g["text"].tolist()
        sets = [set(t) for t in texts]
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                jac = inter / union if union else 1.0
                if jac >= threshold:
                    rows.append((g[key_col].iloc[0], ids[i], ids[j], jac))
        return pd.DataFrame(rows, columns=[key_col, "doc_id_a", "doc_id_b",
                                           "jaccard"])
    return (ds.select_columns([key_col, "doc_id", "text"])
            .groupby(key_col)
            .map_groups(per_group, batch_format="pandas"))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-char-gram rolling hashes (uint64)."""
    data = np.frombuffer(text.encode("utf-8", "replace"), dtype=np.uint8)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)))
    grams = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    powers = np.empty(k, dtype=np.uint64)
    powers[0] = 1
    base = np.uint64(1_000_003)
    with np.errstate(over="ignore"):              # mod-2^64 wraparound is
        for i in range(1, k):                     # the intended semantics
            powers[i] = powers[i - 1] * base
        h = (grams * powers[::-1]).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


class MinHasher:
    """Actor-state sketcher: seeded (a, b) permutation params built once."""

    def __init__(self, num_hashes: int = 128, shingle_k: int = 5,
                 seed: int = 7):
        rs = np.random.RandomState(seed)
        self.a = rs.randint(1, 1 << 61, size=num_hashes).astype(np.uint64)
        self.b = rs.randint(0, 1 << 61, size=num_hashes).astype(np.uint64)
        self.k = shingle_k
        self.num_hashes = num_hashes

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (n_shingles, num_hashes) universal hash, min per column
        v = (sh[:, None] * self.a[None, :] + self.b[None, :]) & _MERSENNE
        return v.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]).astype(np.int64)
        return pa.Table.from_pydict({
            "doc_id": batch["doc_id"],
            "signature": pa.array(sigs.tolist(),
                                  pa.list_(pa.int64(), self.num_hashes)),
        })


def _band_rows(batch: pa.Table, num_bands: int) -> pa.Table:
    """signature rows → (band_id, band_hash, doc_id) exploded rows."""
    sigs = np.array(batch["signature"].to_pylist(), dtype=np.int64)
    n, H = sigs.shape
    r = H // num_bands
    ids = batch["doc_id"].to_numpy()
    band_ids, band_hashes, doc_ids = [], [], []
    for b in range(num_bands):
        frag = sigs[:, b * r:(b + 1) * r]
        # stable fragment hash
        h = frag.astype(np.uint64)
        acc = np.zeros(n, dtype=np.uint64)
        for c in range(r):
            acc = acc * np.uint64(1_000_003) + h[:, c]
        band_ids.append(np.full(n, b, dtype=np.int32))
        band_hashes.append(acc.astype(np.int64))
        doc_ids.append(ids)
    return pa.Table.from_pydict({
        "band_id": np.concatenate(band_ids),
        "band_hash": np.concatenate(band_hashes),
        "doc_id": np.concatenate(doc_ids),
    })


def minhash_lsh_candidates(ds, num_hashes: int = 128, num_bands: int = 32,
                           shingle_k: int = 5):
    """documents → candidate near-dup pairs (doc_id_a < doc_id_b, deduped).

    explode to band rows → ``groupby(band_id, band_hash)`` → pairs within
    bucket → global pair dedup."""
    from ..runtime import pool_size
    sigs = ds.map_batches(MinHasher,
                          fn_constructor_kwargs={"num_hashes": num_hashes,
                                                 "shingle_k": shingle_k},
                          batch_format="pyarrow",
                          concurrency=(1, pool_size(1.0)))
    bands = sigs.map_batches(lambda b: _band_rows(b, num_bands),
                             batch_format="pyarrow")

    # group on a COARSE key (band_hash % 256): most true LSH buckets are
    # singletons, and a map_groups fn per tiny bucket is a Python-loop
    # bottleneck; inside a coarse group, numpy emits each >1-doc bucket's
    # pairs via triu indices and pre-dedups them — NO Python pair loops
    # (word-salad-ish corpora produce mega-buckets whose quadratic pair
    # sets must be emitted at C speed or not at all).
    max_bucket = 1000   # degenerate buckets (near-identical corpus slices)

    def add_coarse(batch: pa.Table) -> pa.Table:
        coarse = (batch["band_hash"].to_numpy() % 256).astype(np.int32)
        return batch.append_column("coarse", pa.array(coarse, pa.int32()))

    def coarse_pairs(g: pd.DataFrame) -> pd.DataFrame:
        chunks = []
        for _, sub in g.groupby(["band_id", "band_hash"], sort=False):
            n = len(sub)
            if n < 2 or n > max_bucket:
                continue
            ids = np.sort(sub["doc_id"].to_numpy())
            i, j = np.triu_indices(n, k=1)
            # encode the pair as one int64 (doc ids are < 2^31 here)
            chunks.append(ids[i].astype(np.int64) * (1 << 31) + ids[j])
        if not chunks:
            return pd.DataFrame({"pair_key": pd.Series([], dtype="int64"),
                                 "n_bands": pd.Series([], dtype="int64")})
        keys, counts = np.unique(np.concatenate(chunks), return_counts=True)
        return pd.DataFrame({"pair_key": keys,
                             "n_bands": counts.astype(np.int64)})

    pairs = (bands.map_batches(add_coarse, batch_format="pyarrow")
             .groupby("coarse")
             .map_groups(coarse_pairs, batch_format="pandas"))

    # a pair can surface from several coarse groups → merge on the int key.
    # Pair-key rows scale with near-dup density, not corpus size, so the
    # driver merge (one np.unique) beats a distributed groupby's fixed
    # shuffle cost by a wide margin; for extreme pair volumes use
    # ``groupagg.bucketed_agg(pairs, ["pair_key"], ...)`` instead.
    import ray.data as rd
    pdf = pairs.to_pandas()
    keys, inverse = np.unique(pdf["pair_key"].to_numpy(),
                              return_inverse=True)
    n_bands = np.zeros(len(keys), dtype=np.int64)
    np.add.at(n_bands, inverse, pdf["n_bands"].to_numpy())
    return rd.from_arrow(pa.Table.from_pydict({
        "doc_id_a": pa.array(keys >> 31, pa.int64()),
        "doc_id_b": pa.array(keys & ((1 << 31) - 1), pa.int64()),
        "n_bands": pa.array(n_bands, pa.int64()),
    }))


def shingle_jaccard(a: str, b: str, k: int = 5) -> float:
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class VerifyPairs:
    """Actor: verify candidate pairs with exact shingle Jaccard. Holds a
    broadcast doc_id → text map (``ray.put`` once; at larger scale this
    becomes a hash join of the pair list against the docs table)."""

    def __init__(self, docs_ref, shingle_k: int = 5):
        import ray
        self.docs = ray.get(docs_ref) if not isinstance(docs_ref, dict) \
            else docs_ref
        self.k = shingle_k
        # shingle sets computed ONCE per doc per actor: candidate sets are
        # often quadratic in bucket size while docs are few — recomputing
        # shingles per pair was the dominant cost of the verify stage
        self._sets: dict[int, frozenset] = {}

    def _shingles(self, doc_id: int) -> frozenset:
        s = self._sets.get(doc_id)
        if s is None:
            s = frozenset(_shingle_hashes(self.docs[doc_id], self.k).tolist())
            self._sets[doc_id] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["doc_id_a"].to_pylist()
        b = batch["doc_id_b"].to_pylist()
        jac = []
        for x, y in zip(a, b):
            sa, sb = self._shingles(x), self._shingles(y)
            union = len(sa | sb)
            jac.append(len(sa & sb) / union if union else 1.0)
        return batch.append_column("jaccard", pa.array(jac, pa.float64()))


def dedup_components(pairs_pdf, all_ids=None):
    """Near-dup pairs → connected components → keep/drop decision.

    Union-find on the DRIVER over the verified pair list (pairs are sparse —
    bounded by near-dup density, not corpus size; the ray_guide pattern. For
    pair sets too large for one machine, iterate min-label propagation with
    the bucketed groupby instead). Returns a DataFrame
    ``(doc_id, component_id, keep)`` with ``component_id = min doc_id`` in
    the component and ``keep`` true only for that representative."""
    import pandas as pd
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for a, b in zip(pairs_pdf["doc_id_a"], pairs_pdf["doc_id_b"]):
        union(int(a), int(b))
    members = set(map(int, pairs_pdf["doc_id_a"])) | \
        set(map(int, pairs_pdf["doc_id_b"]))
    if all_ids is not None:
        members |= set(map(int, all_ids))
    rows = []
    for d in sorted(members):
        comp = find(d)
        rows.append((d, comp, d == comp))
    return pd.DataFrame(rows, columns=["doc_id", "component_id", "keep"])


def minhash_dedup_keep(ds, docs_map: dict, threshold: float = 0.7, **kw):
    """End-to-end near-dedup: LSH candidates → verify → components →
    per-doc keep/drop table (min-id representative per duplicate cluster)."""
    pairs = minhash_dedup_pairs(ds, docs_map, threshold, **kw).to_pandas()
    return dedup_components(pairs, all_ids=list(docs_map.keys()))


def minhash_dedup_pairs(ds, docs_map: dict, threshold: float = 0.7, **kw):
    """Full MinHash-LSH near-dup: candidates → exact-verify → threshold."""
    import pyarrow.compute as pc
    import ray
    ref = ray.put(docs_map)
    cands = minhash_lsh_candidates(ds, **kw)
    from ..runtime import pool_size
    verified = cands.map_batches(
        VerifyPairs, fn_constructor_kwargs={"docs_ref": ref},
        batch_format="pyarrow", concurrency=(1, pool_size(0.5)))
    return verified.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], threshold)),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over token hashes (per-batch vectorized)."""

    def __init__(self, seed: int = 11):
        import re
        self.token_re = re.compile(r"[A-Za-z0-9_]+")
        rs = np.random.RandomState(seed)
        self.salt = np.uint64(rs.randint(1, 1 << 61))

    def simhash(self, text: str) -> int:
        toks = self.token_re.findall(text)
        if not toks:
            return 0
        hs = np.array([hash_token(t, self.salt) for t in toks],
                      dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(hs)
        out = np.uint64(0)
        for i in range(64):
            if votes[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out.astype(np.int64))  # two's complement into int64

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.Table.from_pydict({
            "doc_id": batch["doc_id"],
            "simhash": pa.array([self.simhash(t) for t in texts],
                                pa.int64()),
        })


def hash_token(tok: str, salt: np.uint64) -> np.uint64:
    h = np.uint64(14695981039346656037)          # FNV-1a 64
    with np.errstate(over="ignore"):             # mod-2^64 is the FNV spec
        for byte in tok.encode("utf-8"):
            h = (h ^ np.uint64(byte)) * np.uint64(1099511628211)
    return h ^ salt


def simhash_dataset(ds):
    from ..runtime import pool_size
    return ds.map_batches(SimHasher, batch_format="pyarrow",
                          concurrency=(1, pool_size(1.0)))


# ---------------------------------------------------------------------------
# embedding near-dup (random hyperplane LSH + cosine verify)
# ---------------------------------------------------------------------------


class HyperplaneBucketer:
    def __init__(self, dim: int = 64, bits: int = 12, seed: int = 5):
        rs = np.random.RandomState(seed)
        self.planes = rs.standard_normal((dim, bits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        signs = (vecs @ self.planes) > 0
        bucket = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)
        return pa.Table.from_pydict({
            "vec_id": batch["vec_id"],
            "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            "embedding": batch["embedding"],
        })


def embedding_neardup_pairs(ds, threshold: float = 0.9, bits: int = 12,
                            dim: int = 64):
    """Near-identical embedding pairs: LSH bucket (one shuffle on the bucket
    key) → exact pairwise cosine within bucket → threshold."""
    from ..runtime import pool_size
    bucketed = ds.map_batches(
        HyperplaneBucketer, fn_constructor_kwargs={"dim": dim, "bits": bits},
        batch_format="pyarrow", concurrency=(1, pool_size(0.5)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].tolist()
        vecs = np.array(g["embedding"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        sims = unit @ unit.T
        ra, rb, rc = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    ra.append(a)
                    rb.append(b)
                    rc.append(float(sims[i, j]))
        return pd.DataFrame({"vec_id_a": pd.Series(ra, dtype="int64"),
                             "vec_id_b": pd.Series(rb, dtype="int64"),
                             "cosine": pd.Series(rc, dtype="float64")})
    return bucketed.groupby("bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
