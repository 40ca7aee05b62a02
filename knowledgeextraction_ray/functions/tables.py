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
