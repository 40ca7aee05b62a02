"""Arrow-table hygiene helpers.

``pyarrow.Schema`` objects carrying ANY key-value metadata are unhashable
(``hash(schema)`` raises ``unhashable type: 'dict'``), and Ray Data hashes
block schemas to deduplicate them across the plan — every block whose schema
carries metadata defeats that dedup and spams
``Failed to hash the schemas (for deduplication)`` warnings (r2 VERDICT
hygiene item). Two sources of such metadata in this repo:

- ``pa.Table.from_pandas`` attaches a ``b'pandas'`` metadata blob (and Ray's
  own pandas→Arrow block conversion does the same for UDFs that return raw
  DataFrames) → :func:`from_pandas_clean` strips it, and group/batch UDFs
  return Arrow through it instead of raw pandas;
- the provided ``/root/testdata`` parquet files were written with pandas
  metadata → :func:`read_parquet_clean` passes an explicitly
  metadata-stripped schema to ``ray.data.read_parquet``.
"""

from __future__ import annotations

import pyarrow as pa


def from_pandas_clean(df, schema: pa.Schema | None = None,
                      preserve_index: bool = False) -> pa.Table:
    """``pa.Table.from_pandas`` without the schema-metadata blob (drop-in
    signature so call sites swap 1:1)."""
    return pa.Table.from_pandas(
        df, schema=schema,
        preserve_index=preserve_index).replace_schema_metadata(None)


def read_parquet_clean(path: str, columns: list[str] | None = None, **kw):
    """``ray.data.read_parquet`` with a metadata-free schema so downstream
    blocks hash (→ Ray's schema dedup stays enabled). Column pruning still
    happens at the read (the stripped schema is restricted to ``columns``)."""
    import pyarrow.dataset as pads
    import ray.data as rd
    schema = pads.dataset(path).schema.remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=schema, **kw)


def dict_encode_strings(batch: pa.Table) -> pa.Table:
    """Dictionary-encode every string column of ``batch`` (r5).

    The flagship's pinned linked-mention intermediate is ~300 B/row of
    strings whose values repeat ~10× within a block (one row per mention,
    ~10 mentions per file share repo/path/commit/sha/guid; labels and
    surfaces draw from small pools) — per-block dictionary encoding cuts
    the block to ~27% (measured), which is object-store footprint AND
    memory-bandwidth relief on every downstream pass over the pin. Encode
    cost ~8 ms per 33k-row block. Applied as a ``map_batches`` step that
    Ray Data fuses into the producing task stage; consumers call
    :func:`dict_decode_strings` at entry (decode ~6 ms/block) so their
    kernels keep operating on plain string arrays."""
    import pyarrow.compute as pc
    cols, changed = {}, False
    for name in batch.schema.names:
        col = batch[name]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            cols[name] = pc.dictionary_encode(col.combine_chunks())
            changed = True
        else:
            cols[name] = col
    return pa.table(cols) if changed else batch


def dict_decode_strings(batch: pa.Table) -> pa.Table:
    """Inverse of :func:`dict_encode_strings` — a no-op on plain batches,
    so consumers can call it unconditionally."""
    import pyarrow.compute as pc
    if not any(pa.types.is_dictionary(f.type) for f in batch.schema):
        return batch
    return pa.table({
        name: (pc.cast(batch[name], batch[name].type.value_type)
               if pa.types.is_dictionary(batch[name].type) else batch[name])
        for name in batch.schema.names})
