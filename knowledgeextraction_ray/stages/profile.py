"""Key-distribution profiling — the shuffle-planning diagnostic.

Skew is the thing that kills wide operations at 100 TB (the north-star names
``main``/``utils`` as the hot canonicalization keys); this operator measures
it so salting factors (``config.CanonicalizeConfig.num_salts``) and bucket
counts are set from data, not guesses.

Shape: per-batch ``value_counts`` partials (the combiner — the exchange is
distinct-keys-per-batch, not rows), merged on the driver (partial stream ≤
blocks × batch-distinct rows; flip the merge to ``groupagg.bucketed_agg``
past ~10k distinct keys, same rationale as ``partial_combine_agg``). The
top-N cut, share and rank are computed once over the merged count table.
"""

from __future__ import annotations

from ..functions.tables import from_pandas_clean

import numpy as np
import pandas as pd
import pyarrow as pa


def key_skew_profile(ds, key_col: str, top_n: int = 20) -> pd.DataFrame:
    """Top-``top_n`` hottest values of ``key_col``: count, dense rank by
    (count desc, key asc), integer ppm share of ALL rows, and the total.

    Returns (key_col, n, rank, share_e6, n_total) — all integer, so the
    DuckDB window-function oracle matches exactly."""
    def partial(batch: pa.Table) -> pa.Table:
        vc = (batch[key_col].to_pandas().value_counts(sort=False)
              .rename_axis("key").to_frame("n").reset_index())
        return from_pandas_clean(vc, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    counts = partials.groupby("key", sort=False)["n"].sum()
    total = int(counts.sum())
    top = (counts.rename_axis("key").to_frame("n").reset_index()
           .sort_values(["n", "key"], ascending=[False, True],
                        kind="mergesort").head(top_n)
           .reset_index(drop=True))
    n = top["n"].to_numpy().astype(np.int64)
    return pd.DataFrame({
        key_col: top["key"],
        "n": n,
        "rank": np.arange(1, len(top) + 1, dtype=np.int64),
        "share_e6": n * 1_000_000 // max(total, 1),
        "n_total": np.int64(total),
    })
