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
