"""Triple emission + exact dedup + partitioning (reference D1 analog, F8).

Graph materialization per the north rule: mentions become
``(subj, pred, obj)`` triples with full provenance, where

- ``subj``  = ``"<repo>:<path>"`` (the defining file's qualified name),
- ``pred``  = mention label → predicate (``corpus.PREDICATES``),
- ``obj``   = the CANONICAL entity for the mention's normalized surface
  (output of the canonicalization groupby, broadcast back via ``ray.put`` —
  one object-store copy, read once per task; at 10^12-file scale with a very
  large entity table this becomes a hash-partitioned join on ``surface_norm``
  instead),

then EXACT dedup on the triple key: within-batch pre-dedup (a dict — the
combiner) followed by ``groupby(subj, pred, obj)`` over the already-shrunk
stream, keeping min provenance + summed mention counts. Deterministic under
retries: representatives are chosen by key order, never arrival order
(SURVEY.md §7.4). The dedup mirrors the reference's first-seen-wins answer
dedup (``mrc_utils.py:397-415``) restated as a keyed aggregation.
"""

from __future__ import annotations

from ..functions.tables import from_pandas_clean

import numpy as np
import pyarrow as pa
import ray

from ..corpus import PREDICATES
from ..functions.hashing import partition_id_for

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
    ("content_sha256", pa.string()), ("n_mentions", pa.int64()),
])


# worker-level cache of the broadcast canonical map: ray.get on a local
# ObjectRef is zero-copy from the plasma store, but the dict deserializes
# per call — cache it per worker process so emit runs as stateless tasks
# (shared worker pool; a dedicated actor pool measured slower end-to-end).
_CANON_CACHE: dict[str, dict] = {}


def _cached_canonical(canonical_ref) -> dict[str, str]:
    if isinstance(canonical_ref, dict):
        return canonical_ref
    key = canonical_ref.hex()
    canon = _CANON_CACHE.get(key)
    if canon is None:
        canon = _CANON_CACHE.setdefault(key, ray.get(canonical_ref))
    return canon


class EmitTriples:
    """map_batches body: linked mentions + broadcast canonical map → triples
    (pre-deduped within the batch).

    ``skip_subjects`` (tiny set) drops rows for subjects the block-scope
    plan routes through the straddler repair path instead (see
    triples_dataset); ``only_subjects`` inverts it for that repair pass.

    ``obj_col`` names a PRECOMPUTED canonical-entity column (the hash-join
    resolution path, ``triples_dataset_joined``) — when set, no broadcast
    map is consulted; null entries fall back to the mention's own
    ``entity_id``."""

    def __init__(self, canonical_ref=None,
                 skip_subjects: frozenset | None = None,
                 only_subjects: frozenset | None = None,
                 obj_col: str | None = None):
        self.canonical = _cached_canonical(canonical_ref) \
            if canonical_ref is not None else {}
        self.skip = skip_subjects
        self.only = only_subjects
        self.obj_col = obj_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Fully vectorized emit+combine: string concat / set membership /
        label map are Arrow or factorized-numpy kernels; the in-batch
        pre-dedup is one pandas hash groupby. Per-column min provenance is
        exact because a triple key's provenance is constant within its subj
        (the subj ENCODES the file — same argument as ``_dedup_pdf``). The
        per-row Python loop this replaces was the dominant stage at the 2M-
        file scale (~32 s of the flagship)."""
        import pandas as pd
        import pyarrow.compute as pc

        from ..functions.tables import dict_decode_strings
        batch = dict_decode_strings(batch)      # pin may be dict-encoded
        subj = pc.binary_join_element_wise(batch["repo"], batch["path"],
                                           ":")
        if self.skip is not None:
            mask = pc.invert(pc.is_in(
                subj, value_set=pa.array(sorted(self.skip))))
            batch = batch.filter(mask)
            subj = subj.filter(mask)
        if self.only is not None:
            mask = pc.is_in(subj, value_set=pa.array(sorted(self.only)))
            batch = batch.filter(mask)
            subj = subj.filter(mask)
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {n: [] for n in TRIPLE_SCHEMA.names}, schema=TRIPLE_SCHEMA)
        labels = batch["label"].to_numpy(zero_copy_only=False)
        lab_u, lab_codes = np.unique(labels, return_inverse=True)
        pred = np.array([PREDICATES[l] for l in lab_u],
                        dtype=object)[lab_codes]
        ents = batch["entity_id"].to_numpy(zero_copy_only=False)
        if self.obj_col:
            cobs = batch[self.obj_col].to_numpy(zero_copy_only=False)
            obj = np.where(pd.isna(cobs), ents, cobs)
        else:
            norms = batch["surface_norm"].to_numpy(zero_copy_only=False)
            norm_u, norm_codes = np.unique(norms, return_inverse=True)
            mapped = np.array([self.canonical.get(u) for u in norm_u],
                              dtype=object)[norm_codes]
            obj = np.where(pd.isna(mapped), ents, mapped)
        df = pd.DataFrame({
            "subj": subj.to_numpy(zero_copy_only=False), "pred": pred,
            "obj": obj,
            "repo": batch["repo"].to_numpy(zero_copy_only=False),
            "path": batch["path"].to_numpy(zero_copy_only=False),
            "commit": batch["commit"].to_numpy(zero_copy_only=False),
            "content_sha256":
                batch["content_sha256"].to_numpy(zero_copy_only=False),
        })
        # "first" not "min": provenance is CONSTANT within a subj, so they
        # agree — and pandas string "min" per group drops into a pure-Python
        # series loop (measured 9 s/84k mentions) while "first" is cython
        out = (df.groupby(["subj", "pred", "obj"], sort=False)
               .agg(repo=("repo", "first"), path=("path", "first"),
                    commit=("commit", "first"),
                    content_sha256=("content_sha256", "first"),
                    n_mentions=("repo", "size"))
               .reset_index())
        return from_pandas_clean(out, schema=TRIPLE_SCHEMA,
                                    preserve_index=False)


def _add_dedup_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    import pyarrow.compute as pc

    from ..functions.hashing import fast_hash64
    keys = pc.binary_join_element_wise(
        pc.cast(batch["subj"], pa.string()),
        pc.cast(batch["pred"], pa.string()),
        pc.cast(batch["obj"], pa.string()), "|")
    buck = (fast_hash64(keys) % num_buckets).astype("int32")
    return batch.append_column("bucket", pa.array(buck))


def _dedup_pdf(pdf):
    """Vectorized pandas merge of pre-deduped triple fragments: per-column
    min provenance + summed counts (identical to EmitTriples' combiner when
    each triple key carries a single (commit, sha) — true by construction,
    subj encodes the file)."""
    return (pdf.groupby(["subj", "pred", "obj"], sort=False)
            .agg(repo=("repo", "min"), path=("path", "min"),
                 commit=("commit", "min"),
                 content_sha256=("content_sha256", "min"),
                 n_mentions=("n_mentions", "sum"))
            .reset_index())


def _dedup_bucket(g):
    from ..functions.tables import from_pandas_clean
    return from_pandas_clean(_dedup_pdf(g.drop(columns=["bucket"])))


def triples_dataset(linked_ds, canonical_map: dict[str, str],
                    concurrency: int | None = None, num_buckets: int = 64,
                    scope: str = "global",
                    edge_driver_limit: int = 2_000_000):
    """linked mentions → deduplicated triple Dataset.

    The canonical map is ``ray.put`` ONCE; emit tasks read it zero-copy from
    the object store through a per-worker cache — never re-shipped per batch.

    Dedup scope:

    - ``"global"`` (default, layout-independent): batch-level pre-dedup (the
      EmitTriples combiner) → ONE shuffle on a coarse int bucket of the
      triple key → vectorized pandas groupby-agg per bucket. 3× faster than
      a 3-string-key ``groupby().aggregate`` sort-shuffle (the bucket
      shuffle sorts one int32; the per-key work is C-side pandas).
    - ``"block"``: no triple-stream shuffle for the BULK. Duplicate triple
      keys are intra-file by construction (``subj = repo:path``), so
      EmitTriples' in-batch combiner (whole blocks, ``batch_size=None``)
      completes the dedup for every file fully contained in one block. Ray
      Data's dynamic block splitting CAN split a stage output mid-file
      (``target_max_block_size``), so the invariant is repaired rather than
      assumed: rows whose subj is a block's first/last file (the only
      possible straddlers) are routed through a global merge — driver-side
      pandas when tiny (the common case: ≤ 2 files per block), the bucketed
      shuffle above ``edge_driver_limit`` rows. Bulk rows never shuffle.
      The equality of both scopes is oracle- and test-checked, including
      under a forced mid-file split (tests/test_dedup_scope.py).

    Deterministic representative either way: per-column min over provenance;
    counts sum the combiner counts."""
    ref = ray.put(canonical_map)
    if scope == "block":
        return _block_scope_triples(linked_ds, ref, num_buckets,
                                    edge_driver_limit)
    emitted = linked_ds.map_batches(
        lambda b, _ref=ref: EmitTriples(_ref)(b),
        batch_format="pyarrow", batch_size=None)
    return (emitted
            .map_batches(lambda b: _add_dedup_bucket(b, num_buckets),
                         batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_dedup_bucket, batch_format="pandas"))


def triples_dataset_joined(linked_ds, canon_ds, num_buckets: int = 64,
                           join_buckets: int = 64):
    """Scale path for entity vocabularies too large to broadcast: ``obj`` is
    resolved by a ``surface_norm`` hash join of the linked-mention stream
    against the canonical table (both sides shuffle once on the key — no
    driver materialization, no whole-vocab object anywhere). This is the
    join promised in the module docstring for the 10^12-file regime.

    The join redistributes mention rows by surface bucket, which destroys
    the intra-file contiguity block-scope dedup relies on, so dedup here is
    always the global bucketed shuffle (equality with the broadcast path is
    test-checked)."""
    from .joins import bucketed_join

    def rn(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "surface_norm": batch["surface_norm"],
            "canon_entity": batch["entity_id"],
        })

    canon = canon_ds.select_columns(["surface_norm", "entity_id"]) \
        .map_batches(rn, batch_format="pyarrow")
    joined = bucketed_join(linked_ds, canon, on="surface_norm",
                           num_buckets=join_buckets, how="left")
    emitted = joined.map_batches(
        lambda b: EmitTriples(obj_col="canon_entity")(b),
        batch_format="pyarrow", batch_size=None)
    return (emitted
            .map_batches(lambda b: _add_dedup_bucket(b, num_buckets),
                         batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_dedup_bucket, batch_format="pandas"))


def _block_boundaries(batch: pa.Table) -> pa.Table:
    """First/last subj of a block — the only files a dynamic block split can
    cut. Touches 2 rows regardless of block size."""
    if len(batch) == 0:
        return pa.Table.from_pydict({"subj": pa.array([], type=pa.string())})
    first = f"{batch['repo'][0].as_py()}:{batch['path'][0].as_py()}"
    last = f"{batch['repo'][-1].as_py()}:{batch['path'][-1].as_py()}"
    return pa.Table.from_pydict({"subj": sorted({first, last})})


def straddler_subjects(linked_ds) -> frozenset:
    """Exact detection of files split across blocks: a file's mention rows
    are contiguous (one fused-task output) so a subj appearing at the
    boundary of ≥2 blocks has been split by dynamic block splitting — no
    other layout produces it. One cheap scan (2 rows per block) + a driver
    pull of #blocks tiny rows."""
    pdf = linked_ds.map_batches(_block_boundaries, batch_format="pyarrow",
                                batch_size=None).to_pandas()
    counts = pdf["subj"].value_counts()
    return frozenset(counts[counts >= 2].index)


def _block_scope_triples(linked_ds, ref, num_buckets: int,
                         edge_driver_limit: int):
    """Shuffle-free block-local dedup, exact under dynamic block splitting:
    detect straddler files first (boundary scan above); in the common
    no-split case this IS the single-pass plan. Otherwise the handful of
    straddlers are excluded from the bulk emission and merged globally —
    driver pandas for few, bucketed shuffle past ``edge_driver_limit``
    (the 100-TB wave path uses scope="global" instead)."""
    import ray.data as rd
    suspects = straddler_subjects(linked_ds)
    bulk = linked_ds.map_batches(
        lambda b, _ref=ref, _s=suspects or None: EmitTriples(
            _ref, skip_subjects=_s)(b),
        batch_format="pyarrow", batch_size=None)
    if not suspects:
        return bulk
    edge = linked_ds.map_batches(
        lambda b, _ref=ref, _s=suspects: EmitTriples(
            _ref, only_subjects=_s)(b),
        batch_format="pyarrow", batch_size=None)
    try:
        edge_pdf = edge.to_pandas(limit=edge_driver_limit)
    except ValueError:
        fixed = (edge
                 .map_batches(lambda b: _add_dedup_bucket(b, num_buckets),
                              batch_format="pyarrow")
                 .groupby("bucket")
                 .map_groups(_dedup_bucket, batch_format="pandas"))
        return bulk.union(fixed)
    fixed = rd.from_arrow(
        from_pandas_clean(_dedup_pdf(edge_pdf), schema=TRIPLE_SCHEMA,
                             preserve_index=False))
    return bulk.union(fixed)


def add_partition_id(batch: pa.Table, num_partitions: int) -> pa.Table:
    pid = partition_id_for(batch["subj"].to_pylist(), num_partitions)
    return batch.append_column("partition_id",
                               pa.array(pid, type=pa.int32()))
