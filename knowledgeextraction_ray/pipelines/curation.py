"""End-to-end corpus CURATION flagship — the pipeline a training-data team
actually runs before a token reaches a model, composed from this engine's
gated operators:

    documents
      → exact dedup (sha bucketed groupby → non-representative drop ids)
      → MinHash-LSH near-dedup → connected components → drop ids
      → ONE verdict scan: quality signals + secret scan computed in-batch,
        the two dedup verdicts applied from BROADCAST drop-id sets
        (sorted int64 arrays, ``ray.put`` once, searchsorted per batch) —
        kept ⇔ quality_ok ∧ ¬has_secret ∧ exact-rep ∧ near-keep, with a
        first-failing-gate ``reason`` column for curation reporting.

Shape notes: drop-id sets are bounded by DUPLICATE density, not corpus
size — the same boundedness class as near-dedup's own pair list — and the
broadcast path is size-GATED: past ``broadcast_limit`` ids either set
triggers the join shape (``mode="join"``), where the two dedup verdicts
join back on ``doc_id`` via ``bucketed_join`` exactly as before (r4
layout). Mode equality is test-pinned. Every component is individually
SQL-gated; the composed pipeline is gated END TO END by one DuckDB oracle
assembled from the same SQL pieces (``oracle_tables.SQL_DOC_CURATION``),
so a wiring mistake between stages — not just a kernel bug — fails the
hash.
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


def _sha_rows(batch: pa.Table) -> pa.Table:
    from ..functions.hashing import sha256_column
    return pa.Table.from_pydict({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "text_sha": sha256_column(batch["text"]),
    })


def _exact_drop_ids(ds, num_buckets: int, limit: int,
                    sha_ds=None) -> np.ndarray:
    """doc_ids that are exact duplicates of an earlier (min-id) doc —
    the sha-bucket groupby emits ONLY the non-representatives, so the
    driver pull is bounded by exact-dup count, not corpus size. Raises
    ValueError past ``limit`` rows (callers fall back to the join shape).
    ``sha_ds``: precomputed ``(doc_id, text_sha)`` rows (the resumable
    path's wave checkpoints) — skips the sha scan."""
    from ..stages.groupagg import add_bucket_column

    def drops(g):
        from ..functions.tables import from_pandas_clean
        m = g.groupby("text_sha")["doc_id"].transform("min")
        return from_pandas_clean(
            g.loc[g["doc_id"] != m, ["doc_id"]].astype({"doc_id": "int64"}))

    src = (sha_ds.select_columns(["doc_id", "text_sha"])
           if sha_ds is not None
           else ds.map_batches(_sha_rows, batch_format="pyarrow"))
    drops_ds = (src
                .map_batches(lambda b: add_bucket_column(b, ["text_sha"],
                                                         num_buckets),
                             batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(drops, batch_format="pandas"))
    pdf = drops_ds.to_pandas(limit=limit)
    if "doc_id" not in pdf.columns:      # all-empty map_groups drops schema
        return np.empty(0, dtype=np.int64)
    return np.sort(pdf["doc_id"].to_numpy().astype(np.int64))


def _near_drop_ids(ds, threshold: float, limit: int,
                   sigs=None) -> np.ndarray:
    """doc_ids dropped by near-dedup (component members that are not their
    component's min-id representative). Bounded by near-dup pair volume;
    raises ValueError past ``limit`` pairs. ``sigs``: precomputed
    signatures (wave checkpoints) — skips the sketch scan."""
    from ..stages.dedup import dedup_components, minhash_dedup_pairs
    pairs = minhash_dedup_pairs(ds, threshold=threshold,
                                sigs=sigs).to_pandas(limit=limit)
    if "doc_id_a" not in pairs.columns:  # all-empty map_groups drops schema
        return np.empty(0, dtype=np.int64)
    comp = dedup_components(pairs)
    drops = comp.loc[~comp["keep"], "doc_id"].to_numpy().astype(np.int64)
    return np.sort(drops)


def _in_sorted(ids: np.ndarray, arr: np.ndarray) -> np.ndarray:
    """Membership of ``ids`` in the SORTED array ``arr`` (vectorized)."""
    out = np.zeros(len(ids), dtype=bool)
    if len(arr) == 0:
        return out
    pos = np.searchsorted(arr, ids)
    valid = pos < len(arr)
    out[valid] = arr[pos[valid]] == ids[valid]
    return out


_DROPSET_CACHE: dict[str, dict] = {}


def _cached_dropsets(ref) -> dict:
    if isinstance(ref, dict):
        return ref
    key = ref.hex()
    m = _DROPSET_CACHE.get(key)
    if m is None:
        import ray
        m = _DROPSET_CACHE.setdefault(key, ray.get(ref))
    return m


def _verdict_table(ids: np.ndarray, q: np.ndarray, s: np.ndarray,
                   drops: dict) -> pa.Table:
    """Assemble the verdict columns from gate flags + broadcast drop sets
    (shared by the text scan and the checkpointed-flags scan)."""
    e = ~_in_sorted(ids, drops["exact"])
    n = ~_in_sorted(ids, drops["near"])
    kept = q & ~s & e & n
    reason = np.where(~q, "low_quality",
              np.where(s, "secret",
               np.where(~e, "exact_dup",
                np.where(~n, "near_dup", "kept"))))
    return pa.Table.from_pydict({
        "doc_id": pa.array(ids, pa.int64()),
        "quality_ok": pa.array(q, pa.bool_()),
        "has_secret": pa.array(s, pa.bool_()),
        "is_exact_rep": pa.array(e, pa.bool_()),
        "near_keep": pa.array(n, pa.bool_()),
        "kept": pa.array(kept, pa.bool_()),
        "reason": pa.array(reason.tolist(), pa.string()),
    })


def _verdict_scan(batch: pa.Table, *, drops_ref) -> pa.Table:
    from ..stages.text_analysis import quality_batch, secret_scan_batch
    drops = _cached_dropsets(drops_ref)
    q = quality_batch(batch)["quality_ok"].to_numpy(
        zero_copy_only=False).astype(bool)
    s = secret_scan_batch(batch)["has_secret"].to_numpy(
        zero_copy_only=False).astype(bool)
    ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
        zero_copy_only=False)
    return _verdict_table(ids, q, s, drops)


def _verdict_flags_scan(batch: pa.Table, *, drops_ref) -> pa.Table:
    """Verdict from CHECKPOINTED gate flags (the resumable path — text is
    never re-read for the verdict)."""
    drops = _cached_dropsets(drops_ref)
    ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
        zero_copy_only=False)
    q = batch["quality_ok"].to_numpy(zero_copy_only=False).astype(bool)
    s = batch["has_secret"].to_numpy(zero_copy_only=False).astype(bool)
    return _verdict_table(ids, q, s, drops)


def curation_doc_stats(batch: pa.Table, *, num_hashes: int = 128,
                       shingle_k: int = 5) -> pa.Table:
    """ONE fused per-wave scan emitting everything the global curation
    steps need per doc — gate flags, exact-dedup sha, MinHash signature —
    so the resumable path reads each input byte once (candidate-pair
    verification later re-reads only the candidate docs)."""
    from ..functions.hashing import sha256_column
    from ..stages.dedup import MinHasher
    g = _gates_batch(batch)
    sig = MinHasher(num_hashes=num_hashes, shingle_k=shingle_k)(batch)
    return pa.Table.from_pydict({
        "doc_id": g["doc_id"],
        "quality_ok": g["quality_ok"],
        "has_secret": g["has_secret"],
        "text_sha": sha256_column(batch["text"]),
        "signature": sig["signature"],
    })


def _input_bytes(ds) -> int | None:
    """On-disk bytes of a read-based Dataset's input files (O(1) metadata;
    None when the plan doesn't expose files — e.g. transformed or
    in-memory inputs)."""
    import os
    try:
        files = ds.input_files()
    except Exception:
        return None
    if not files:
        return None
    try:
        return sum(os.path.getsize(f) for f in files)
    except OSError:
        return None


def curation_pipeline(ds, neardup_threshold: float = 0.7,
                      num_buckets: int = 32, mode: str = "auto",
                      broadcast_limit: int = 5_000_000,
                      max_inmemory_bytes: int = 8 << 30):
    """documents (doc_id, text) → per-doc curation verdict table
    (doc_id, quality_ok, has_secret, is_exact_rep, near_keep, kept,
    reason).

    ``mode="auto"``: single-verdict-scan shape with broadcast drop-id sets
    (see module docstring), falling back to ``"join"`` when either drop
    set exceeds ``broadcast_limit``. ``mode="join"`` forces the
    bucketed-join shape (the fallback's own contract).

    The multi-consumer input pin is SIZE-GATED (r4 verdict item): above
    ``max_inmemory_bytes`` of on-disk input the corpus streams and each
    consumer re-scans the source instead of pinning it in the object
    store; the resumable production entry at that scale is
    ``state.lineage.run_resumable_curation`` (wave-checkpointed doc
    stats, kill-resume test-pinned byte-identical)."""
    import ray
    sz = _input_bytes(ds)
    if sz is None or sz <= max_inmemory_bytes:
        ds = ds.materialize()      # dedups + verdict scan consume it
    if mode == "auto":
        try:
            exact = _exact_drop_ids(ds, num_buckets, broadcast_limit)
            near = _near_drop_ids(ds, neardup_threshold, broadcast_limit)
        except ValueError:
            mode = "join"
        else:
            ref = ray.put({"exact": exact, "near": near})
            return ds.map_batches(_verdict_scan,
                                  fn_kwargs={"drops_ref": ref},
                                  batch_format="pyarrow")
    return _curation_join_shape(ds, neardup_threshold, num_buckets)


def _curation_join_shape(ds, neardup_threshold: float, num_buckets: int):
    """The r4 join layout — gates scan + per-doc dedup flag tables joined
    back on ``doc_id`` via two ``bucketed_join``s. The 100-TB shape when
    duplicate density is too high to broadcast drop ids."""
    from ..stages.dedup import minhash_dedup_keep
    from ..stages.groupagg import add_bucket_column
    from ..stages.joins import bucketed_join

    gates = ds.map_batches(_gates_batch, batch_format="pyarrow")

    # exact-dedup flag with FULL per-doc coverage (flag assigned inside the
    # sha-bucket groupby, so the downstream joins stay inner/NaN-free)
    def rep_flags(g):
        from ..functions.tables import from_pandas_clean
        g = g.drop(columns=["__bucket"])
        g["is_exact_rep"] = (g["doc_id"] ==
                             g.groupby("text_sha")["doc_id"]
                             .transform("min")).astype("int8")
        return from_pandas_clean(g[["doc_id", "is_exact_rep"]])

    reps = (ds.map_batches(_sha_rows, batch_format="pyarrow")
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


def curation_semantic_pipeline(docs, emb, neardup_threshold: float = 0.7,
                               semantic_threshold_pct: int = 40,
                               k: int = 8, iters: int = 3,
                               broadcast_limit: int = 5_000_000,
                               num_buckets: int = 32):
    """The COMPLETE modern curation stack in one verdict table: quality +
    secret gates, exact dedup, MinHash near-dedup (``curation_pipeline``)
    PLUS the SemDeDup semantic layer (``stages/vectorops.semdedup`` over
    the 1:1 ``vec_id = doc_id`` embedding table). → (doc_id, quality_ok,
    has_secret, is_exact_rep, near_keep, sem_keep, kept, reason).

    Reason precedence: the surface-level pipeline's first-failing gate
    wins; a doc it KEPT that the semantic layer drops becomes
    ``semantic_dup``. The semantic drop-id set is the SMALL side by
    construction (only near-duplicate members drop), so it broadcasts via
    ``ray.put`` under ``broadcast_limit`` and the verdict stays a single
    scan; past the limit it flips to a bucketed join on doc_id."""
    import ray

    from ..stages.joins import bucketed_join
    from ..stages.vectorops import semdedup

    cur = curation_pipeline(docs, neardup_threshold=neardup_threshold,
                            num_buckets=num_buckets,
                            broadcast_limit=broadcast_limit)
    sem = semdedup(emb, k=k, iters=iters,
                   threshold_pct=semantic_threshold_pct)

    def only_drops(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["keep"], 0)
        return pa.table({"doc_id": pc.filter(batch["vec_id"], m)})

    drops = sem.map_batches(only_drops, batch_format="pyarrow")

    def apply(batch: pa.Table, *, ref) -> pa.Table:
        from ..runtime import worker_state
        key = ref.hex() if hasattr(ref, "hex") else id(ref)
        drop = worker_state(("sem_drops", key), lambda: ray.get(ref))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sem_keep = ~_in_sorted(ids, drop)
        kept = batch["kept"].to_numpy(zero_copy_only=False).astype(bool)
        reason = np.asarray(batch["reason"].to_pylist(), dtype=object)
        sem_dup = kept & ~sem_keep
        reason[sem_dup] = "semantic_dup"
        out = batch.drop_columns(["kept", "reason"])
        out = out.append_column("sem_keep", pa.array(sem_keep, pa.bool_()))
        out = out.append_column("kept",
                                pa.array(kept & sem_keep, pa.bool_()))
        return out.append_column("reason",
                                 pa.array(reason.tolist(), pa.string()))

    try:
        dpdf = drops.to_pandas(limit=broadcast_limit)
    except ValueError:
        flags = sem.map_batches(
            lambda b: pa.table({"doc_id": pc.cast(b["vec_id"], pa.int64()),
                                "sem_keep": pc.cast(b["keep"], pa.int8())}),
            batch_format="pyarrow")
        j = bucketed_join(cur, flags, on="doc_id", num_buckets=num_buckets)

        def verdict(batch: pa.Table) -> pa.Table:
            sem_keep = batch["sem_keep"].to_numpy(
                zero_copy_only=False).astype(bool)
            kept = batch["kept"].to_numpy(zero_copy_only=False).astype(bool)
            reason = np.asarray(batch["reason"].to_pylist(), dtype=object)
            reason[kept & ~sem_keep] = "semantic_dup"
            out = batch.drop_columns(["kept", "reason", "sem_keep"])
            out = out.append_column("sem_keep",
                                    pa.array(sem_keep, pa.bool_()))
            out = out.append_column("kept",
                                    pa.array(kept & sem_keep, pa.bool_()))
            return out.append_column(
                "reason", pa.array(reason.tolist(), pa.string()))
        return j.map_batches(verdict, batch_format="pyarrow")
    ref = ray.put(np.sort(dpdf["doc_id"].to_numpy(dtype=np.int64)))
    return cur.map_batches(apply, fn_kwargs={"ref": ref},
                           batch_format="pyarrow")
