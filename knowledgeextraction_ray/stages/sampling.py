"""Deterministic sampling operators (training-data curation).

A 100-TB curation pipeline needs reproducible subsetting: downsample a
source to a rate, or rebalance strata to exactly-k rows each, such that the
same input always yields the same sample on any engine — no RNG state, no
shuffle. Both operators key on ``splitmix64(id)`` (``functions/hashing``):
a uint64 bijection, so the induced order is uniform-pseudo-random and
tie-free, and the DuckDB oracles reproduce it EXACTLY in hugeint limb
arithmetic (``oracle_tables._mulmod64``/``_xorshift64``).

- ``sample_by_rate``: keep rows with key < rate·2^64 — embarrassingly
  parallel filter, zero exchange; the expected per-stratum proportions are
  preserved globally without coordination.
- ``stratified_sample``: exactly-k-per-stratum — per-batch partial top-k
  (vectorized argsort + grouped head inside ``map_batches``), then a merge
  of the tiny partial stream (≤ blocks × strata × k key rows). The merge is
  a driver pandas combine, measured-right for small strata×k
  (``groupagg.partial_combine_agg`` rationale); past ~10k strata flip the
  merge to ``bucketed_agg`` over the partials.

The reference's eval sampling (SURVEY §2.6 T5/T6) is seeded-shuffle based —
fine in one process, irreproducible across engines; these are the
scale-native replacement.
"""

from __future__ import annotations

from ..functions.tables import from_pandas_clean

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import splitmix64

RATE_SCALE = 1 << 64


def _keys_of(ids: np.ndarray) -> np.ndarray:
    return splitmix64(ids)


def sample_by_rate(ds, id_col: str, rate: float):
    """Keep rows whose splitmix64(id) falls below rate·2^64 (deterministic
    Bernoulli-style sample; exact same row set on every run/engine)."""
    threshold = np.uint64(min(int(rate * RATE_SCALE), RATE_SCALE - 1))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        mask = _keys_of(ids) < threshold
        return batch.filter(pa.array(mask))
    return ds.map_batches(keep, batch_format="pyarrow")


def _partial_topk(batch: pa.Table, stratum_col: str, id_col: str,
                  k: int) -> pa.Table:
    """Per-batch partial: ≤ k smallest-key rows per stratum in this batch."""
    ids = batch[id_col].to_numpy()
    keys = _keys_of(ids)
    df = pd.DataFrame({
        "stratum": batch[stratum_col].to_pandas(),
        "id": ids,
        "key": keys,
    })
    df = df.sort_values("key", kind="mergesort")
    return from_pandas_clean(df.groupby("stratum", sort=False).head(k),
                                preserve_index=False)


def stratified_sample(ds, stratum_col: str, id_col: str,
                      k: int) -> pd.DataFrame:
    """Exactly the k rows with smallest splitmix64(id) per stratum.

    Returns (stratum, id, sample_key, rank) with rank 1..k in key order —
    sample_key is the two's-complement int64 view of the uint64 key (what
    the SQL oracle emits)."""
    partials = ds.map_batches(
        _partial_topk, fn_kwargs={"stratum_col": stratum_col,
                                  "id_col": id_col, "k": k},
        batch_format="pyarrow", batch_size=None).to_pandas()
    # uint64 order == unsigned order; pandas keeps the uint64 dtype
    final = (partials.sort_values("key", kind="mergesort")
             .groupby("stratum", sort=False).head(k))
    final = final.sort_values(["stratum", "key"],
                              kind="mergesort").reset_index(drop=True)
    final["rank"] = final.groupby("stratum", sort=False).cumcount() + 1
    return pd.DataFrame({
        stratum_col: final["stratum"],
        id_col: final["id"],
        "sample_key": final["key"].to_numpy().astype(np.int64),
        "rank": final["rank"].astype(np.int64),
    })
