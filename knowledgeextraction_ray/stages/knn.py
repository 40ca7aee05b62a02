"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute``: exact top-k cosine per query — per-batch float64 matmul
  against a BROADCAST query matrix (``ray.put`` once, read in actor
  ``__init__``), local top-k per batch, tiny global merge. The scale path:
  the big side streams, the query side never reships per batch, and the
  exchange is only (num_queries × k × num_blocks) candidate rows.
- ``knn_lsh``: the approximate variant — restrict the scan to documents in
  the query's hyperplane-LSH bucket (probing all buckets within Hamming
  distance ``probe_hamming``), then exact cosine inside the candidate set.
"""

from __future__ import annotations

from ..functions.tables import from_pandas_clean

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


class BruteKnnScorer:
    """Actor: per-batch cosine vs broadcast queries → local top-k rows."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) \
            else queries_ref
        self.q_ids, qm = q
        norms = np.linalg.norm(qm, axis=1)
        norms[norms == 0] = 1.0
        self.q_unit = qm / norms[:, None]        # (Q, D) float64
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        sims = self.q_unit @ unit.T              # (Q, N)
        rows_q, rows_n, rows_s = [], [], []
        k = min(self.k, sims.shape[1])
        for qi, qid in enumerate(self.q_ids):
            s = sims[qi]
            mask = ids != qid                    # exclude self-match
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            sc = s[cand_idx]
            top = cand_idx[np.argsort(-sc, kind="stable")[:k]]
            rows_q.extend([qid] * len(top))
            rows_n.extend(ids[top].tolist())
            rows_s.extend(s[top].tolist())
        return pa.Table.from_pydict({
            "q_id": pa.array(rows_q, pa.int64()),
            "neighbor_id": pa.array(rows_n, pa.int64()),
            "sim": pa.array(rows_s, pa.float64()),
        })


def _brute_score_batch(batch: pa.Table, *, queries_ref, k: int) -> pa.Table:
    """Task form of :class:`BruteKnnScorer` — the query matrix derefs once
    per worker process (``runtime.worker_state``), so the broadcast
    semantics (one object-store copy per node) survive without paying a
    per-execution actor-pool creation."""
    from ..runtime import worker_state
    key = (queries_ref.hex() if hasattr(queries_ref, "hex")
           else id(queries_ref), k)
    scorer = worker_state(
        ("knn_brute", key),
        lambda: BruteKnnScorer(queries_ref=queries_ref, k=k))
    return scorer(batch)


def _global_topk(candidates, k: int) -> pd.DataFrame:
    """Merge per-batch candidates → final top-k per query (tiny: Q×k×blocks
    rows). Deterministic order: sim desc, neighbor_id asc."""
    pdf = candidates.to_pandas()
    pdf = pdf.sort_values(["q_id", "sim", "neighbor_id"],
                          ascending=[True, False, True], kind="mergesort")
    pdf = pdf.groupby("q_id", sort=True).head(k).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("q_id").cumcount() + 1
    pdf["sim"] = pdf["sim"].round(6)
    return pdf[["q_id", "neighbor_id", "rank", "sim"]]


def _query_side(ds, query_ids: list[int]) -> pd.DataFrame:
    """Extract the (small) query rows with a vectorized mask — the query set
    is tiny, the scan is pruned to two columns."""
    qset = pa.array(query_ids, pa.int64())

    def mask(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_in(batch["vec_id"], value_set=qset))
    return (ds.select_columns(["vec_id", "embedding"])
            .map_batches(mask, batch_format="pyarrow")
            .to_pandas())


def knn_brute(ds, query_ids: list[int], k: int = 10) -> pd.DataFrame:
    """Exact top-k cosine neighbors for each query vec_id (queries are rows
    of the same table; self-match excluded)."""
    q_tab = _query_side(ds, query_ids).sort_values("vec_id")
    q_ids = q_tab["vec_id"].tolist()
    qm = np.array(q_tab["embedding"].tolist(), dtype=np.float64)
    ref = ray.put((q_ids, qm))
    cands = ds.map_batches(
        _brute_score_batch, fn_kwargs={"queries_ref": ref, "k": k},
        batch_format="pyarrow", batch_size=4096)
    return _global_topk(cands, k)


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 15,
            seed: int = 13) -> np.ndarray:
    """Plain seeded Lloyd's k-means on a driver-side sample (numpy only)."""
    rs = np.random.RandomState(seed)
    centroids = sample[rs.choice(len(sample), n_clusters, replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_clusters):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_sample_matrix(rows: pd.DataFrame, sample_size: int) -> np.ndarray:
    """Deterministic k-means training sample: the rows whose splitmix64
    (vec_id) key is smallest, in vec_id order — a pure function of the
    table, so the DuckDB oracle's builder retrains the IDENTICAL quantizer
    from the raw parquet (``Dataset.random_sample`` depends on block
    layout and Ray internals; this does not)."""
    from ..functions.hashing import splitmix64
    rows = rows.copy()
    rows["__key"] = splitmix64(rows["vec_id"].to_numpy())
    rows = (rows.sort_values("__key", kind="mergesort").head(sample_size)
            .sort_values("vec_id", kind="mergesort"))
    return np.array(rows["embedding"].tolist(), dtype=np.float64)


def ivf_quantizer(rows: pd.DataFrame, n_clusters: int, sample_size: int,
                  seed: int) -> np.ndarray:
    """Sample + train — shared verbatim by the Ray stage and the oracle
    builder so the centroid literals match bit-exactly."""
    sm = ivf_sample_matrix(rows, sample_size)
    return _kmeans(sm, min(n_clusters, len(sm)), seed=seed)


def knn_ivf(ds, query_ids: list[int], k: int = 10, n_clusters: int = 16,
            n_probe: int = 4, sample_size: int = 2000,
            seed: int = 13) -> pd.DataFrame:
    """IVF-style approximate top-k: a k-means coarse quantizer (trained on a
    deterministic driver-side SAMPLE — the classic IVF recipe) partitions
    the corpus; each query scans only its ``n_probe`` nearest cells.

    One pass assigns cells (centroids broadcast in the task closure — a few
    KB); the scan is the same broadcast-query brute kernel restricted to the
    probed cells. Recall grows with n_probe; exactness is knn_brute. The
    deterministic sample makes the whole operator a pure function of the
    table — SQL-gated via centroid literals."""
    if sample_size >= ds.count():
        sample_rows = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    else:
        from ..functions.hashing import splitmix64

        def over_sample(batch: pa.Table) -> pa.Table:
            # keep a superset cheaply: per-batch smallest keys; the exact
            # global head(sample_size) cut happens on the driver
            import pandas as pd_
            df = pd_.DataFrame({
                "vec_id": batch["vec_id"].to_numpy(),
                "embedding": batch["embedding"].to_pylist()})
            key = splitmix64(df["vec_id"].to_numpy())
            order = np.argsort(key, kind="stable")[:sample_size]
            return from_pandas_clean(df.iloc[order],
                                        preserve_index=False)
        sample_rows = (ds.select_columns(["vec_id", "embedding"])
                       .map_batches(over_sample, batch_format="pyarrow")
                       .to_pandas())
    centroids = ivf_quantizer(sample_rows, n_clusters, sample_size, seed)

    q_tab = _query_side(ds, query_ids).sort_values("vec_id")
    qm = np.array(q_tab["embedding"].tolist(), dtype=np.float64)
    qd = ((qm[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe = set(np.argsort(qd, axis=1)[:, :n_probe].ravel().tolist())
    q_ids = q_tab["vec_id"].tolist()
    ref = ray.put((q_ids, qm))

    def in_probed_cells(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        d = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        cells = d.argmin(axis=1)
        mask = np.isin(cells, list(probe))
        return batch.filter(pa.array(mask))

    filtered = ds.map_batches(in_probed_cells, batch_format="pyarrow")
    cands = filtered.map_batches(
        _brute_score_batch, fn_kwargs={"queries_ref": ref, "k": k},
        batch_format="pyarrow", batch_size=4096)
    return _global_topk(cands, k)


def lsh_planes(dim: int = 64, bits: int = 8, seed: int = 5) -> np.ndarray:
    """Seeded hyperplane matrix (dim, bits) — shared by the Ray stage and
    the DuckDB oracle (which embeds the same planes as SQL literals), so the
    bucket assignment is bit-identical on both sides."""
    rs = np.random.RandomState(seed)
    return rs.standard_normal((dim, bits))


def knn_lsh(ds, query_ids: list[int], k: int = 10, bits: int = 8,
            dim: int = 64, seed: int = 5) -> pd.DataFrame:
    """Approximate top-k: hyperplane-LSH bucket the corpus once (one pass),
    scan only the queries' buckets. SQL-gated: the oracle reproduces the
    bucket filter exactly via the literal plane matrix."""
    planes = lsh_planes(dim, bits, seed)

    def bucket_of(vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ planes) > 0
        return (signs * (1 << np.arange(bits))).sum(axis=1).astype(np.int64)

    q_tab = _query_side(ds, query_ids).sort_values("vec_id")
    qm = np.array(q_tab["embedding"].tolist(), dtype=np.float64)
    q_buckets = set(bucket_of(qm).tolist())
    q_ids = q_tab["vec_id"].tolist()
    ref = ray.put((q_ids, qm))

    def in_query_buckets(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        b = bucket_of(vecs)
        mask = np.isin(b, list(q_buckets))
        return batch.filter(pa.array(mask))

    filtered = ds.map_batches(in_query_buckets, batch_format="pyarrow")
    cands = filtered.map_batches(
        _brute_score_batch, fn_kwargs={"queries_ref": ref, "k": k},
        batch_format="pyarrow", batch_size=4096)
    return _global_topk(cands, k)
