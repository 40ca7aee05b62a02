"""Keyed joins (reference J4/J5 restated).

The reference joins by POSITION (``zip(predict_examples, result)``,
``run_crf_albert.py:333-334``) — its biggest fragility (dropped HTTP batches
silently misalign the zip, ``eval_estimator.py:78-85``). Here every row
carries a key and joins are explicit:

- ``hash_join``: Ray's native hash-partitioned ``Dataset.join`` when both
  sides are large.
- ``bucketed_join``: the portable pattern — add ``bucket = hash(key) % B``
  to both sides, union with a side tag, group by bucket, pandas-merge inside
  each bucket. One shuffle, vectorized merge, B controls reduce fan-in.
- ``broadcast_semi_join`` / ``broadcast_anti_join``: key-set broadcast +
  vectorized membership filter (no shuffle) for small right sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc



def hash_join(left, right, on: str, num_partitions: int = 16,
              join_type: str = "inner"):
    """Native Ray hash join (both sides shuffle on the key)."""
    return left.join(right, join_type=join_type,
                     num_partitions=num_partitions, on=(on,))


def bucketed_join(left, right, on: str, num_buckets: int = 32,
                  how: str = "inner"):
    """Explicit partitioned hash join via one groupby over bucketed union.

    Scales: each side is hashed on the key once; a bucket holds ~1/B of each
    side and the in-bucket merge is a vectorized pandas hash join."""
    def _pa_types(ds) -> dict:
        sch = ds.schema()
        base = getattr(sch, "base_schema", None)
        if isinstance(base, pa.Schema):
            return {f.name: f.type for f in base}
        # pandas-block schema: types are numpy dtypes (or object → string)
        out = {}
        for n, t in zip(sch.names, sch.types):
            if isinstance(t, pa.DataType):
                out[n] = t
            else:
                try:
                    out[n] = pa.from_numpy_dtype(t)
                except (pa.ArrowNotImplementedError, TypeError):
                    out[n] = pa.string()
        return out

    l_cols = [n for n in left.schema().names]
    r_cols = [n for n in right.schema().names]
    l_only = [c for c in l_cols if c != on and c not in r_cols]
    r_only = [c for c in r_cols if c != on and c not in l_cols]
    l_schema = _pa_types(left)
    r_schema = _pa_types(right)

    def tag(side: str, pad_cols, pad_types, order):
        def fn(batch: pa.Table) -> pa.Table:
            col = batch[on]
            if pa.types.is_integer(col.type):
                # vectorized mix — the bucket id is join-internal, so any
                # deterministic hash works; splitmix64 avoids the per-row
                # str()+sha256 loop (measured dominant at 1M-row joins)
                from ..functions.hashing import splitmix64
                b = (splitmix64(col.to_numpy(zero_copy_only=False))
                     % np.uint64(num_buckets)).astype(np.int64)
            else:
                from ..functions.hashing import fast_hash64
                b = (fast_hash64(col) % num_buckets)
            batch = batch.append_column("__bucket",
                                        pa.array(b.astype(np.int32)))
            batch = batch.append_column("__side",
                                       pa.array([side] * len(batch)))
            for c in pad_cols:                    # null-pad to common schema
                batch = batch.append_column(
                    c, pa.nulls(len(batch), type=pad_types[c]))
            return batch.select(order)
        return fn

    order = [on] + sorted(set(l_cols + r_cols) - {on}) + ["__bucket",
                                                          "__side"]
    unioned = (
        left.map_batches(tag("L", r_only, r_schema, order),
                         batch_format="pyarrow")
        .union(right.map_batches(tag("R", l_only, l_schema, order),
                                 batch_format="pyarrow")))

    def _restore_ints(df: pd.DataFrame, schema) -> pd.DataFrame:
        # null-padding the union upcast int columns to float64; once a side
        # is filtered back out, its columns are null-free → cast back
        for c in df.columns:
            if c in schema and pa.types.is_integer(schema[c]) and \
                    df[c].dtype == np.float64:
                df[c] = df[c].astype("int64")
        return df

    def merge(g: pd.DataFrame):
        lg = _restore_ints(
            g[g["__side"] == "L"][[on] + [c for c in l_cols if c != on]],
            l_schema)
        rg = _restore_ints(
            g[g["__side"] == "R"][[on] + [c for c in r_cols if c != on]],
            r_schema)
        # emit Arrow ourselves (same from_pandas conversion Ray would do
        # internally) so the block schema carries no pandas-metadata blob
        # and Ray's schema dedup stays enabled (r2 hygiene item)
        from ..functions.tables import from_pandas_clean
        return from_pandas_clean(lg.merge(rg, on=on, how=how))

    return unioned.groupby("__bucket").map_groups(merge,
                                                  batch_format="pandas")


def asof_join(left, right, by: str, on: str, num_buckets: int = 32,
              direction: str = "backward"):
    """Event-time AS-OF join (DuckDB ``ASOF LEFT JOIN`` semantics): each
    left row matches the single right row with the greatest ``on`` value
    ≤ its own (``direction="backward"``) sharing the ``by`` key.

    Ray Data has no as-of join; the partitioning assumption is the usual
    one — co-locate by ``hash(by) % B`` (one shuffle per side), then the
    in-bucket match is pandas ``merge_asof`` (a vectorized sorted merge).
    Right-side ``on`` ties must be pre-deduplicated by the caller for a
    deterministic match (mirror any dedup in the oracle). Unmatched left
    rows keep nulls in the right columns (left-join semantics). Column
    collisions other than ``by``/``on`` are the caller's to rename."""
    l_cols = list(left.schema().names)
    r_cols = list(right.schema().names)
    r_only = [c for c in r_cols if c not in (by, on)]

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch[by].to_numpy(zero_copy_only=False)
            if np.issubdtype(keys.dtype, np.integer):
                b = (keys.astype(np.int64) % num_buckets).astype(np.int32)
            else:
                from ..functions.hashing import fast_hash64
                b = (fast_hash64(batch[by]) % num_buckets).astype(np.int32)
            batch = batch.append_column("__bucket", pa.array(b))
            return batch.append_column("__side",
                                       pa.array([side] * len(batch)))
        return fn

    def _restore_ints(df: pd.DataFrame, types) -> pd.DataFrame:
        # null-padding across the union upcast int columns to float64;
        # once a side is filtered back out its columns are null-free
        for c in df.columns:
            if c in types and pa.types.is_integer(types[c]) and \
                    df[c].dtype == np.float64:
                df[c] = df[c].astype("int64")
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = _restore_ints(g[g["__side"] == "L"][l_cols].copy(), l_types) \
            .sort_values(on, kind="mergesort")
        rg = _restore_ints(g[g["__side"] == "R"][r_cols].copy(), r_types) \
            .sort_values(on, kind="mergesort")
        if len(rg) == 0:
            out = lg.copy()
            for c in r_only:
                out[c] = None
            return out
        return pd.merge_asof(lg, rg, on=on, by=by, direction=direction)

    # union needs a common schema: null-pad each side with the other's
    # columns AT THEIR REAL TYPES (a typeless null column breaks the union)
    def _types(ds) -> dict:
        sch = ds.schema()
        return {n: (t if isinstance(t, pa.DataType) else
                    pa.from_numpy_dtype(t))
                for n, t in zip(sch.names, sch.types)}

    l_types, r_types = _types(left), _types(right)

    def pad(cols, types, order):
        def fn(batch: pa.Table) -> pa.Table:
            for c in cols:
                batch = batch.append_column(
                    c, pa.nulls(len(batch), type=types[c]))
            return batch.select(order)
        return fn

    order = sorted(set(l_cols + r_cols)) + ["__bucket", "__side"]
    l_tagged = left.map_batches(tag("L"), batch_format="pyarrow") \
        .map_batches(pad([c for c in r_cols if c not in l_cols], r_types,
                         order), batch_format="pyarrow")
    r_tagged = right.map_batches(tag("R"), batch_format="pyarrow") \
        .map_batches(pad([c for c in l_cols if c not in r_cols], l_types,
                         order), batch_format="pyarrow")
    return (l_tagged.union(r_tagged)
            .groupby("__bucket")
            .map_groups(merge, batch_format="pandas"))


_KEYSET_CACHE: dict[str, pa.Array] = {}


def _cached_value_set(ref) -> pa.Array:
    key = ref.hex()
    vs = _KEYSET_CACHE.get(key)
    if vs is None:
        import ray
        vs = _KEYSET_CACHE.setdefault(key, pa.array(sorted(ray.get(ref))))
    return vs


def broadcast_semi_join(ds, key_col: str, keys_ref, anti: bool = False):
    """Filter ``ds`` to rows whose key is (not) in the broadcast key set.

    Stateless tasks (no actor-pool ramp — the filter is pure C-side
    ``pc.is_in``); the key set ships once via ``ray.put`` and deserializes
    once per worker process through a module cache."""
    import ray

    ref = keys_ref if isinstance(keys_ref, ray.ObjectRef) \
        else ray.put(sorted(keys_ref))

    def filt(batch: pa.Table, _ref=ref) -> pa.Table:
        mask = pc.is_in(batch[key_col], value_set=_cached_value_set(_ref))
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow", batch_size=None)
