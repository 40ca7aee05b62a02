"""Vector aggregation over the ``embeddings`` table.

Per-label centroids as an EXACT distributed aggregate: each element is
scaled to an integer first (``round(v·10⁶)``, half-away — matching DuckDB),
then per-batch numpy partial sums collapse the stream before one bucketed
merge. Emitting the integer sums (plus the derived 6dp centroid) keeps the
result order-independent and hash-exact against the SQL oracle — the same
scheme every float aggregate in this repo uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.rounding import scaled_int64_np


def _round6(x: np.ndarray) -> np.ndarray:
    """Sign-aware half-away 6dp round (DuckDB ``round(x, 6)``)."""
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def label_centroids(ds, num_buckets: int = 16):
    """→ (label, dim, n_vecs, sum_e6, centroid): per-(label, dimension)
    count, exact scaled-int element sum, and the 6dp mean."""
    def partial(batch: pa.Table) -> pa.Table:
        labels = batch["label"].to_numpy(zero_copy_only=False)
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        e6 = scaled_int64_np(vecs, 1e6)              # (N, D) exact ints
        uniq, inv = np.unique(labels, return_inverse=True)
        d = e6.shape[1]
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, e6)
        counts = np.bincount(inv, minlength=len(uniq))
        out_label = np.repeat(uniq, d)
        out_dim = np.tile(np.arange(d, dtype=np.int64), len(uniq))
        return pa.Table.from_pydict({
            "label": pa.array(out_label.tolist()),
            "dim": pa.array(out_dim, pa.int64()),
            "n_vecs": pa.array(np.repeat(counts, d).astype(np.int64),
                               pa.int64()),
            "sum_e6": pa.array(sums.ravel(), pa.int64()),
        })

    from .groupagg import bucketed_agg
    merged = bucketed_agg(
        ds.select_columns(["label", "embedding"]).map_batches(
            partial, batch_format="pyarrow", batch_size=None),
        ["label", "dim"],
        {"n_vecs": ("n_vecs", "sum"), "sum_e6": ("sum_e6", "sum")},
        num_buckets=num_buckets)

    def finalize(df: pd.DataFrame):
        from ..functions.tables import from_pandas_clean
        df = df.copy()
        df["centroid"] = _round6(df["sum_e6"].to_numpy(dtype=np.float64)
                                 / df["n_vecs"].to_numpy(dtype=np.float64)
                                 / 1e6)
        return from_pandas_clean(df)
    return merged.map_batches(finalize, batch_format="pandas")


# ---------------------------------------------------------------------------
# seeded integer-exact k-means (SemDeDup-style embedding clustering)
# ---------------------------------------------------------------------------


def _quantized_matrix(batch: pa.Table, scale: float) -> tuple:
    from .knn import embedding_matrix
    ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = scaled_int64_np(embedding_matrix(batch["embedding"]), scale)
    return ids, x


def _assign(x: np.ndarray, cent: np.ndarray) -> tuple:
    """(N, D) int64 × (K, D) int64 → (assign idx into cent rows, dist²).

    Exact integer distances; ``argmin`` takes the FIRST minimum, which is
    the lowest cluster id because centroid rows are kept cluster-sorted —
    the same tie-break the SQL oracle's ``order by dist, cluster`` makes."""
    d = x[:, None, :] - cent[None, :, :]
    dist = np.einsum("nkd,nkd->nk", d, d)
    a = dist.argmin(axis=1)
    return a, dist[np.arange(len(x)), a]


def kmeans_assign(ds, k: int = 8, iters: int = 3, scale: float = 1e3):
    """Distributed k-means over the embedding column, integer-exact.

    The clustering stage of a SemDeDup-style curation pipeline (cluster →
    dedup within clusters) / data-mixing bucketer. Everything is EXACT
    integer arithmetic so the result is parallel-order-independent and
    value-hash gateable:

    - elements quantize half-away to ``round(e·scale)`` int64 once per
      batch (zero-copy Arrow → numpy matrix);
    - init: the quantized vectors of the ``k`` smallest ``vec_id``s
      (deterministic; per-block k-smallest partials, driver merge of
      k×blocks rows);
    - each iteration broadcasts the (K, D) centroid matrix via
      ``ray.put`` and streams ONE pass over the dataset emitting (K, D)
      int64 partial sums + counts per block — the driver reduces k·D
      integers, never rows. New centroid = ``floor(sum / count)``
      (provably exact in float64 for these magnitudes — quotient gaps
      ≥ 1/count ≫ ulp); clusters that lose all members drop out;
    - final pass assigns each vector under the converged centroids →
      (vec_id, cluster, dist_sq).

    ``iters + 2`` streamed passes total, nothing materialized: the
    100-TB shape for Lloyd's algorithm. Ties (equal distance) break to
    the lowest cluster id on both sides."""
    import ray

    clusters, cent = _kmeans_centroids(ds, k, iters, scale)
    final_ref = ray.put((clusters, cent))

    def finalize(batch: pa.Table, *, final_ref=final_ref) -> pa.Table:
        cl, c = ray.get(final_ref)
        ids, x = _quantized_matrix(batch, scale)
        a, dist = _assign(x, c)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(cl[a], pa.int64()),
            "dist_sq": pa.array(dist, pa.int64()),
        })

    return ds.map_batches(finalize, batch_format="pyarrow")


def _kmeans_centroids(ds, k: int, iters: int, scale: float) -> tuple:
    """Seed + Lloyd iterations → (cluster ids, (K, D) int64 centroids).
    See :func:`kmeans_assign` for the exactness argument."""
    import ray

    def topk_partial(batch: pa.Table) -> pa.Table:
        ids, x = _quantized_matrix(batch, scale)
        order = np.argsort(ids, kind="stable")[:k]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "q": pa.array(x[order].tolist(), pa.list_(pa.int64())),
        })

    seeds = (ds.map_batches(topk_partial, batch_format="pyarrow",
                            batch_size=None)
             .to_pandas())                       # ≤ k rows per block
    seeds = seeds.sort_values("vec_id", kind="stable").head(k)
    cent = np.stack(seeds["q"].to_numpy()).astype(np.int64)
    clusters = np.arange(len(cent), dtype=np.int64)   # row → cluster id

    for _ in range(iters):
        cent_ref = ray.put((clusters, cent))

        def sums_partial(batch: pa.Table, *, cent_ref=cent_ref) -> pa.Table:
            cl, c = ray.get(cent_ref)
            _ids, x = _quantized_matrix(batch, scale)
            a, _ = _assign(x, c)
            sums = np.zeros_like(c)
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=len(c)).astype(np.int64)
            kd = c.shape[1]
            return pa.table({
                "cluster": pa.array(np.repeat(cl, kd), pa.int64()),
                "dim": pa.array(np.tile(np.arange(kd, dtype=np.int64),
                                        len(c)), pa.int64()),
                "s": pa.array(sums.ravel(), pa.int64()),
                "n": pa.array(np.repeat(cnt, kd), pa.int64()),
            })

        p = (ds.map_batches(sums_partial, batch_format="pyarrow",
                            batch_size=None)
             .to_pandas())                        # k·D rows per block
        g = p.groupby(["cluster", "dim"], sort=True)[["s", "n"]].sum()
        g = g[g["n"] > 0]                         # empty clusters drop out
        new = np.floor(g["s"].to_numpy(np.float64)
                       / g["n"].to_numpy(np.float64)).astype(np.int64)
        clusters = g.index.get_level_values("cluster").unique().to_numpy()
        cent = new.reshape(len(clusters), -1)
    return clusters, cent


def semdedup(ds, k: int = 8, iters: int = 3, scale: float = 1e3,
             threshold_pct: int = 40, max_cluster: int = 20_000,
             num_buckets: int = 16):
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, then
    drop near-duplicates WITHIN each cluster, keeping the member closest
    to its centroid. → (vec_id, cluster, dist_sq, keep).

    The near-dup criterion is EXACT integers (hash-gateable, no float
    boundary): ``cos(a, b) ≥ T`` ⟺ ``dot > 0 AND 10⁴·dot² ≥
    (100·T)²·‖a‖²·‖b‖²`` over the quantized vectors. A member is dropped
    iff some same-cluster member that sorts strictly earlier by
    (dist_sq, vec_id) is a near-dup of it — the canonical "keep the most
    central representative" rule, deterministic under ties.

    Scale shape: centroids come from the streamed :func:`kmeans_assign`
    passes; ONE bucketed exchange co-locates each cluster's quantized
    vectors (fixed-size sketches, never raw embeddings' source rows);
    the in-cluster comparison is one int64 matmul. Clusters larger than
    ``max_cluster`` degrade LOUDLY to a star comparison against the
    single most-central member (linear, components preserved) — real
    SemDeDup uses k large enough that clusters stay small."""
    import ray

    from ..functions.tables import from_pandas_clean
    t2 = threshold_pct * threshold_pct

    clusters, cent = _kmeans_centroids(ds, k, iters, scale)
    final_ref = ray.put((clusters, cent))

    def assign_q(batch: pa.Table, *, final_ref=final_ref) -> pa.Table:
        cl, c = ray.get(final_ref)
        ids, x = _quantized_matrix(batch, scale)
        a, dist = _assign(x, c)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(cl[a], pa.int64()),
            "dist_sq": pa.array(dist, pa.int64()),
            "q": pa.array(x.tolist(), pa.list_(pa.int64())),
        })

    def per_cluster(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["dist_sq", "vec_id"], kind="stable")
        Q = np.stack(g["q"].to_numpy()).astype(np.int64)
        n = len(Q)
        star = n > max_cluster
        if star:                     # loud linear degradation (house rule)
            import logging
            logging.getLogger(__name__).warning(
                "semdedup: cluster of %d exceeds max_cluster=%d — "
                "degrading to star comparison vs the most-central member",
                n, max_cluster)
            dots = Q @ Q[0]                       # (n,) vs center only
            nn = np.einsum("nd,nd->n", Q, Q)
            if int(nn.max()) > 960_000_000:       # int64 headroom guard
                Qo = Q.astype(object)
                dots = Qo @ Qo[0]
                nn = np.einsum("nd,nd->n", Qo, Qo)
            drop = (dots > 0) & (10_000 * dots * dots >= t2 * nn * nn[0])
            drop[0] = False
        else:
            nn_max = int(np.einsum("nd,nd->n", Q, Q).max()) if Q.size else 0
            if nn_max <= 960_000_000:
                # float64 BLAS matmul is EXACT here: |dot| ≤ nn_max ≤
                # 9.6e8 ≪ 2⁵³ and every partial sum is an integer (int64
                # matmul has no BLAS — this is the fast path; the same
                # bound keeps the 10⁴·dot² comparison inside int64)
                dot = np.rint(Q.astype(np.float64)
                              @ Q.astype(np.float64).T).astype(np.int64)
            else:
                Q = Q.astype(object)              # exact Python-int path
                dot = Q @ Q.T
            nn = np.diagonal(dot).copy()
            M = (dot > 0) & (10_000 * dot * dot >= t2 * np.outer(nn, nn))
            drop = (M & np.tri(n, k=-1, dtype=bool)).any(axis=1)
        out = g[["vec_id", "cluster", "dist_sq"]].copy()
        out["keep"] = np.asarray(~drop, dtype=np.int64)
        return from_pandas_clean(out)

    _out_schema = pa.schema([("vec_id", pa.int64()), ("cluster", pa.int64()),
                             ("dist_sq", pa.int64()), ("keep", pa.int64())])

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if not len(g):               # keep empty blocks TYPED (house rule)
            return _out_schema.empty_table()
        return pa.concat_tables(
            [per_cluster(cg) for _, cg in g.groupby("cluster", sort=False)])

    from .groupagg import add_bucket_column
    return (ds.map_batches(assign_q, batch_format="pyarrow")
            .map_batches(lambda b: add_bucket_column(b, ["cluster"],
                                                     num_buckets),
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(per_bucket, batch_format="pandas"))
