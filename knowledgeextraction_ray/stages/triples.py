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
from ray.data.aggregate import Min, Sum

from ..corpus import PREDICATES
from ..functions.hashing import partition_id_for

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
    ("content_sha256", pa.string()), ("n_mentions", pa.int64()),
])


class EmitTriples:
    """map_batches body: linked mentions + broadcast canonical map → triples
    (pre-deduped within the batch)."""

    def __init__(self, canonical_ref):
        # ray.put ObjectRef of {surface_norm: entity_id}; zero-copy shared
        # read from the local object store in every task on the node.
        self.canonical = ray.get(canonical_ref) if \
            isinstance(canonical_ref, ray.ObjectRef) else canonical_ref

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


def triples_dataset(linked_ds, canonical_map: dict[str, str],
                    concurrency: int = 4):
    """linked mentions → deduplicated triple Dataset.

    The canonical map is ``ray.put`` ONCE; the emit stage is an actor pool
    whose constructor ``ray.get``s it once per actor (zero-copy from the
    local object store) — never re-shipped per batch.

    Dedup = groupby(triple key) with built-in vectorized aggregates (no
    per-group Python fn): the deterministic representative is per-column
    ``Min`` over provenance (provenance is constant within a key for
    file-subject triples, so column-wise min is the row min) and the mention
    count is ``Sum`` over the batch-level pre-dedup counts."""
    ref = ray.put(canonical_map)
    emitted = linked_ds.map_batches(
        EmitTriples, fn_constructor_kwargs={"canonical_ref": ref},
        batch_format="pyarrow", concurrency=(1, concurrency))
    return emitted.groupby(["subj", "pred", "obj"]).aggregate(
        Min("repo", alias_name="repo"),
        Min("path", alias_name="path"),
        Min("commit", alias_name="commit"),
        Min("content_sha256", alias_name="content_sha256"),
        Sum("n_mentions", alias_name="n_mentions"),
    )


def add_partition_id(batch: pa.Table, num_partitions: int) -> pa.Table:
    pid = partition_id_for(batch["subj"].to_pylist(), num_partitions)
    return batch.append_column("partition_id",
                               pa.array(pid, type=pa.int32()))
