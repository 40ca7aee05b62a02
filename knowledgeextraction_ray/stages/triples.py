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
    (pre-deduped within the batch)."""

    def __init__(self, canonical_ref):
        self.canonical = _cached_canonical(canonical_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        commits = batch["commit"].to_pylist()
        shas = batch["content_sha256"].to_pylist()
        labels = batch["label"].to_pylist()
        norms = batch["surface_norm"].to_pylist()
        ents = batch["entity_id"].to_pylist()
        acc: dict[tuple, list] = {}
        for repo, path, commit, sha, label, norm, ent in zip(
                repos, paths, commits, shas, labels, norms, ents):
            subj = f"{repo}:{path}"
            pred = PREDICATES[label]
            obj = self.canonical.get(norm, ent)
            key = (subj, pred, obj)
            cur = acc.get(key)
            if cur is None:
                acc[key] = [repo, path, commit, sha, 1]
            else:
                # deterministic representative: min (commit, sha)
                if (commit, sha) < (cur[2], cur[3]):
                    cur[0], cur[1], cur[2], cur[3] = repo, path, commit, sha
                cur[4] += 1
        keys = list(acc.keys())
        return pa.Table.from_pydict({
            "subj": [k[0] for k in keys],
            "pred": [k[1] for k in keys],
            "obj": [k[2] for k in keys],
            "repo": [acc[k][0] for k in keys],
            "path": [acc[k][1] for k in keys],
            "commit": [acc[k][2] for k in keys],
            "content_sha256": [acc[k][3] for k in keys],
            "n_mentions": [acc[k][4] for k in keys],
        }, schema=TRIPLE_SCHEMA)


def _add_dedup_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    from ..functions.hashing import stable_hash64
    keys = [f"{s}|{p}|{o}" for s, p, o in zip(batch["subj"].to_pylist(),
                                              batch["pred"].to_pylist(),
                                              batch["obj"].to_pylist())]
    buck = (stable_hash64(keys) % num_buckets).astype("int32")
    return batch.append_column("bucket", pa.array(buck))


def _dedup_bucket(g):
    return (g.drop(columns=["bucket"])
            .groupby(["subj", "pred", "obj"], sort=False)
            .agg(repo=("repo", "min"), path=("path", "min"),
                 commit=("commit", "min"),
                 content_sha256=("content_sha256", "min"),
                 n_mentions=("n_mentions", "sum"))
            .reset_index())


def triples_dataset(linked_ds, canonical_map: dict[str, str],
                    concurrency: int | None = None, num_buckets: int = 64,
                    scope: str = "global"):
    """linked mentions → deduplicated triple Dataset.

    The canonical map is ``ray.put`` ONCE; emit tasks read it zero-copy from
    the object store through a per-worker cache — never re-shipped per batch.

    Dedup scope:

    - ``"global"`` (default, layout-independent): batch-level pre-dedup (the
      EmitTriples combiner) → ONE shuffle on a coarse int bucket of the
      triple key → vectorized pandas groupby-agg per bucket. 3× faster than
      a 3-string-key ``groupby().aggregate`` sort-shuffle (the bucket
      shuffle sorts one int32; the per-key work is C-side pandas).
    - ``"block"``: NO shuffle. Valid under the partitioning invariant that
      every occurrence of a triple key lands in one input block — true for
      file-derived subjects (``subj = repo:path``, one file = one row, and
      blocks are never split mid-row), which is exactly the flagship
      corpus. At 10^12-file scale this is the right plan: duplicate triples
      are intra-file, so an all-to-all exchange of the triple stream buys
      nothing. EmitTriples consumes WHOLE blocks (``batch_size=None``) so
      its in-batch combiner completes the dedup. The equality of both
      scopes is oracle- and test-checked.

    Deterministic representative either way: per-column min over provenance;
    counts sum the combiner counts."""
    ref = ray.put(canonical_map)
    emitted = linked_ds.map_batches(
        lambda b, _ref=ref: EmitTriples(_ref)(b),
        batch_format="pyarrow", batch_size=None)
    if scope == "block":
        return emitted
    return (emitted
            .map_batches(lambda b: _add_dedup_bucket(b, num_buckets),
                         batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_dedup_bucket, batch_format="pandas"))


def add_partition_id(batch: pa.Table, num_partitions: int) -> pa.Table:
    pid = partition_id_for(batch["subj"].to_pylist(), num_partitions)
    return batch.append_column("partition_id",
                               pa.array(pid, type=pa.int32()))
