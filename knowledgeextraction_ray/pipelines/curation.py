"""End-to-end corpus CURATION flagship — the pipeline a training-data team
actually runs before a token reaches a model, composed from this engine's
gated operators:

    documents
      → row-local gate stage (quality signals + secret scan, ONE fused
        map_batches — both are per-row, so they share the scan)
      → exact dedup (sha bucketed min-agg → representative flag)
      → MinHash-LSH near-dedup → connected components → keep flag
      → verdict: kept ⇔ quality_ok ∧ ¬has_secret ∧ exact-rep ∧ near-keep,
        with a first-failing-gate ``reason`` column for curation reporting.

Shape notes: the two row-local gates never leave their batch; the two
dedup verdicts are corpus-global and join back on ``doc_id`` via
``bucketed_join`` (doc-count-sized tables — never broadcast). Every
component is individually SQL-gated; the composed pipeline is gated END TO
END by one DuckDB oracle assembled from the same SQL pieces
(``oracle_tables.SQL_DOC_CURATION``), so a wiring mistake between stages —
not just a kernel bug — fails the hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _gates_batch(batch: pa.Table) -> pa.Table:
    """Fused row-local gates: quality flag + secret flag in one scan.
    Flags travel as int8 through the joins (bool columns don't survive
    bucketed_join's cross-format schema padding) and become bool in the
    final verdict."""
    from ..stages.text_analysis import quality_batch, secret_scan_batch
    q = quality_batch(batch)
    s = secret_scan_batch(batch)
    return pa.Table.from_pydict({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "quality_ok": pc.cast(q["quality_ok"], pa.int8()),
        "has_secret": pc.cast(s["has_secret"], pa.int8()),
    })


def curation_pipeline(ds, neardup_threshold: float = 0.7,
                      num_buckets: int = 32):
    """documents (doc_id, text) → per-doc curation verdict table
    (doc_id, quality_ok, has_secret, is_exact_rep, near_keep, kept,
    reason)."""
    from ..functions.hashing import sha256_column
    from ..stages.dedup import minhash_dedup_keep
    from ..stages.groupagg import add_bucket_column
    from ..stages.joins import bucketed_join

    ds = ds.materialize()          # three consumers: gates + both dedups
    gates = ds.map_batches(_gates_batch, batch_format="pyarrow")

    # exact-dedup flag with FULL per-doc coverage (flag assigned inside the
    # sha-bucket groupby, so the downstream joins stay inner/NaN-free —
    # bool columns survive Arrow schema unification)
    def sha_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "text_sha": sha256_column(batch["text"]),
        })

    def rep_flags(g):
        from ..functions.tables import from_pandas_clean
        g = g.drop(columns=["__bucket"])
        g["is_exact_rep"] = (g["doc_id"] ==
                             g.groupby("text_sha")["doc_id"]
                             .transform("min")).astype("int8")
        return from_pandas_clean(g[["doc_id", "is_exact_rep"]])

    reps = (ds.map_batches(sha_rows, batch_format="pyarrow")
            .map_batches(lambda b: add_bucket_column(b, ["text_sha"],
                                                     num_buckets),
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(rep_flags, batch_format="pandas"))

    near = minhash_dedup_keep(ds, threshold=neardup_threshold).map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()),
             "near_keep": pc.cast(t["keep"], pa.int8())}),
        batch_format="pyarrow")

    j = bucketed_join(gates, reps, on="doc_id", num_buckets=num_buckets)
    j = bucketed_join(j, near, on="doc_id", num_buckets=num_buckets)

    def verdict(batch: pa.Table) -> pa.Table:
        def as_bool(col):
            return batch[col].to_numpy(zero_copy_only=False).astype(bool)
        q, s = as_bool("quality_ok"), as_bool("has_secret")
        e, n = as_bool("is_exact_rep"), as_bool("near_keep")
        kept = q & ~s & e & n
        # first-failing gate, in pipeline order
        reason = np.where(~q, "low_quality",
                  np.where(s, "secret",
                   np.where(~e, "exact_dup",
                    np.where(~n, "near_dup", "kept"))))
        return pa.Table.from_pydict({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "quality_ok": pa.array(q, pa.bool_()),
            "has_secret": pa.array(s, pa.bool_()),
            "is_exact_rep": pa.array(e, pa.bool_()),
            "near_keep": pa.array(n, pa.bool_()),
            "kept": pa.array(kept, pa.bool_()),
            "reason": pa.array(reason.tolist(), pa.string()),
        })
    return j.map_batches(verdict, batch_format="pyarrow")
