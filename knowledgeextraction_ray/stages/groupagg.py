"""High-cardinality groupby-aggregate: coarse-bucket + in-bucket pandas.

Measured on this Ray version (2.49, local sort-shuffle): the built-in
``groupby(key).aggregate(...)`` spends ~0.3 ms per DISTINCT KEY in the
finalize path — 313k distinct keys took 115 s while the same aggregation in
one pandas call takes < 1 s. For high-cardinality keys, shuffle on a coarse
``hash(key) % B`` int bucket instead and run ONE vectorized pandas
groupby-agg inside each bucket:

- the exchange sorts a single int32 column (cheap),
- per-key work is C-side pandas (fast),
- B bounds reduce fan-in; results are exact because bucketing is a
  partition of the key space.

Use the built-in aggregate only for LOW-cardinality keys (≤ ~1k groups)
or whole-dataset reductions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import fast_hash64


def add_bucket_column(batch: pa.Table, keys: list[str],
                      num_buckets: int) -> pa.Table:
    if len(keys) == 1:
        col = batch[keys[0]]
        if pa.types.is_integer(col.type):
            b = (col.to_numpy(zero_copy_only=False).astype(np.int64)
                 % num_buckets).astype(np.int32)
            return batch.append_column("__bucket", pa.array(b))
        key_arr = col.combine_chunks() if isinstance(
            col, pa.ChunkedArray) else col
    else:
        import pyarrow.compute as pc
        parts = [pc.cast(batch[k], pa.string()) for k in keys]
        key_arr = pc.binary_join_element_wise(*parts, "\x1f")
    # bucket ids are exchange-internal: the vectorized fold hash, no
    # per-row Python (see functions.hashing.fast_hash64)
    b = (fast_hash64(key_arr) % num_buckets).astype(np.int32)
    return batch.append_column("__bucket", pa.array(b))


def bucketed_agg(ds, keys: list[str], agg_spec: dict[str, tuple[str, str]],
                 num_buckets: int = 64, count_alias: str | None = None):
    """groupby(keys) with named pandas aggregations, bucket-parallel.

    ``agg_spec``: out_col → (in_col, fn) with fn one of min/max/sum/mean/
    first; ``count_alias`` adds a group-size column. Exact for associative
    fns (pre-aggregate per batch upstream if input rows per key are huge).
    """
    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.drop(columns=["__bucket"])
        gb = g.groupby(keys, sort=False)
        if agg_spec:
            out = gb.agg(**{o: (c, f) for o, (c, f) in agg_spec.items()})
        else:
            out = gb.size().to_frame("__n").drop(columns=["__n"])
        if count_alias:
            out[count_alias] = gb.size()
        from ..functions.tables import from_pandas_clean
        return from_pandas_clean(out.reset_index())

    return (ds.map_batches(lambda b: add_bucket_column(b, keys, num_buckets),
                           batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def partial_combine_agg(ds, keys: list[str],
                        agg_spec: dict[str, tuple[str, str]]) -> pd.DataFrame:
    """groupby(keys) for LOW-cardinality keys with NO distributed shuffle:
    each batch pre-aggregates to ≤ |groups| partial rows inside
    ``map_batches`` (the combiner pattern), and the tiny partial stream —
    blocks × groups rows of plain numbers — merges in one driver pandas
    call. The built-in distributed ``groupby().aggregate`` pays a ~7-10 s
    fixed sort-shuffle cost per execution (measured, see module docstring);
    for a 6-group TPC-H Q1-shaped aggregate that fixed cost IS the query.

    ``agg_spec``: out_col → (in_col, fn), ordered; fn ∈ sum/min/max/count
    (associative, so partial-then-merge is exact; ``count`` re-merges as
    ``sum``). At cluster scale the driver combine stays O(blocks × groups)
    — flip to ``bucketed_agg`` past ~10k groups, where per-batch partials
    stop compressing."""
    merge = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}
    for out_col, (_, fn) in agg_spec.items():
        if fn not in merge:
            raise ValueError(f"non-associative agg {fn!r} for {out_col!r}")

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(keys, sort=False)
        out = pd.DataFrame(index=gb.size().index)
        for out_col, (in_col, fn) in agg_spec.items():
            out[out_col] = gb.size() if fn == "count" else gb[in_col].agg(fn)
        return out.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=None).to_pandas()
    gb = partials.groupby(keys, sort=False)
    final = pd.DataFrame(index=gb.size().index)
    for out_col, (_, fn) in agg_spec.items():
        final[out_col] = gb[out_col].agg(merge[fn])
    return final.reset_index()


def file_local_count(ds, keys: list[str],
                     file_cols: tuple[str, ...] = ("repo", "path"),
                     count_alias: str = "n",
                     edge_driver_limit: int = 2_000_000,
                     num_buckets: int = 64):
    """SHUFFLE-FREE groupby-count for keys that contain the file identity
    (``file_cols`` ⊆ ``keys``) over a file-contiguous block layout (each
    block is one fused-task output, so a key's rows never span blocks and a
    per-block pandas count IS the global count). Ray's dynamic block
    splitting can cut a block mid-file, so the invariant is repaired, not
    assumed (the scheme of ``stages/triples`` block-scope dedup): a
    2-rows-per-block boundary scan finds straddler files; only their rows
    merge globally — driver pandas when few (the common case), a
    ``bucketed_agg`` of the partial counts past ``edge_driver_limit``.
    Bulk rows never shuffle. Equality with ``bucketed_agg`` is test-pinned,
    including under a forced mid-file split.

    ``ds`` is consumed 2-3×(boundary scan, bulk, edge) — pass it
    materialized/checkpointed when it is the product of a pipeline."""
    import ray.data as rd
    assert set(file_cols) <= set(keys)
    keys = list(keys)

    def _bounds(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {"__file": pa.array([], pa.string())})
        lo = "\x1f".join(str(batch[c][0].as_py()) for c in file_cols)
        hi = "\x1f".join(str(batch[c][-1].as_py()) for c in file_cols)
        return pa.Table.from_pydict({"__file": pa.array(sorted({lo, hi}))})

    pdf = ds.map_batches(_bounds, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    vc = pdf["__file"].value_counts()
    suspects = frozenset(vc[vc >= 2].index)

    def _count_batch(g: pd.DataFrame, keep_suspects: bool) -> pa.Table:
        if suspects:
            fk = g[file_cols[0]].astype(str)
            for c in file_cols[1:]:
                fk = fk + "\x1f" + g[c].astype(str)
            m = fk.isin(suspects)
            g = g[m] if keep_suspects else g[~m]
        from ..functions.tables import from_pandas_clean
        return from_pandas_clean(g.groupby(keys, sort=False).size()
                                 .to_frame(count_alias).reset_index())

    bulk = ds.map_batches(lambda g: _count_batch(g, False),
                          batch_format="pandas", batch_size=None)
    if not suspects:
        return bulk
    edge = ds.map_batches(lambda g: _count_batch(g, True),
                          batch_format="pandas", batch_size=None)
    try:
        edge_pdf = edge.to_pandas(limit=edge_driver_limit)
    except ValueError:
        fixed = bucketed_agg(edge, keys,
                             {count_alias: (count_alias, "sum")},
                             num_buckets=num_buckets)
        return bulk.union(fixed)
    merged = (edge_pdf.groupby(keys, sort=False)[count_alias]
              .sum().reset_index())
    from ..functions.tables import from_pandas_clean
    return bulk.union(rd.from_arrow(from_pandas_clean(merged)))
