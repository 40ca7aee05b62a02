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


# ---------------------------------------------------------------------------
# Seeded shuffle (SURVEY T7/T8)
# ---------------------------------------------------------------------------

def shuffle_key64(ids: np.ndarray, seed: int = 12345,
                  epoch: int = 0) -> np.ndarray:
    """The seeded-shuffle permutation key: ``splitmix64(id + C(seed,
    epoch))`` with ``C = (seed·1_000_003 + epoch) mod 2^64``. A bijection
    per (seed, epoch), so ranking by it is a uniform tie-free permutation;
    DuckDB restates it exactly in hugeint limb arithmetic."""
    c = np.uint64((seed * 1_000_003 + epoch) % (1 << 64))
    with np.errstate(over="ignore"):
        return splitmix64(ids.astype(np.uint64) + c)


def with_shuffle_key(ds, id_col: str, seed: int = 12345, epoch: int = 0,
                     out_col: str = "shuffle_key"):
    """Row-local stage: append the signed-int64 view of the shuffle key
    (zero exchange — the key IS the permutation, rank deferred to the
    consumer)."""
    def add(batch: pa.Table) -> pa.Table:
        keys = shuffle_key64(batch[id_col].to_numpy(zero_copy_only=False),
                             seed, epoch)
        return batch.append_column(out_col,
                                   pa.array(keys.astype(np.int64),
                                            pa.int64()))
    return ds.map_batches(add, batch_format="pyarrow")


def seeded_shuffle(ds, id_col: str, seed: int = 12345, epoch: int = 0):
    """Deterministic cluster-stable shuffle — the Ray-Data-first
    restatement of the reference's train shufflers (SURVEY T7
    ``d.shuffle(buffer_size=100)``, ``crf_utils.py:267-269`` and T8
    ``random.Random(12345).shuffle(train_examples)``,
    ``run_mrc_albert.py:200-201``).

    Both reference forms are single-process RNG-state shuffles —
    irreproducible across engines and order-dependent, which a distributed
    corpus cannot honor. The scale-native semantics they actually need is
    "a seeded uniform permutation, fresh per epoch, identical on any
    cluster layout": rank by the content-keyed bijection
    :func:`shuffle_key64` (epoch folded into the seed — ``.repeat()``'s
    per-epoch reshuffle). The ranking sort is Ray's distributed sort (the
    one documented all-to-all this operator inherently requires);
    consumers that only need batch-local mixing can skip it and use
    ``iter_batches(local_shuffle_buffer_size=...)`` — the buffer-100
    analog. The PERMUTATION itself (the key column) is row-local and
    zero-exchange, and is what the SQL gate hashes."""
    return with_shuffle_key(ds, id_col, seed, epoch).sort("shuffle_key")
