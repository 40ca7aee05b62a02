"""Entity linking against a broadcast alias dictionary (reference J2
generalized; north-star stage).

The reference's analogs are its label-map / vocab lookups with defaults
(``utils/crf_processor.py:78-79``, ``utils/chinese_CONLL.py:30-34``). Here the
small side (alias → candidate entities with priors, FIXTURES.md F7) is a
BROADCAST join: each actor loads the alias Parquet ONCE in ``__init__`` and
resolves per batch with a plain dict — no shuffle touches the mention stream.
At cluster scale the alias file lives on shared storage; loading it per actor
(not per batch, not per task) is the ``ray.put``-equivalent pattern for
actor pools.

Resolution rule (deterministic, SQL-replicable): among alias rows with
``alias == surface`` pick max ``prior``, tie-break min ``entity_id``; if the
surface is unknown, fall back to ``ent::<lower(surface)>`` with prior 0.0.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

LINKED_FIELDS = [("surface_norm", pa.string()), ("entity_id", pa.string()),
                 ("prior", pa.float64())]


def load_alias_map(alias_parquet: str) -> dict[str, tuple[str, float]]:
    t = pq.read_table(alias_parquet)
    best: dict[str, tuple[str, float]] = {}
    for alias, ent, prior in zip(t["alias"].to_pylist(),
                                 t["entity_id"].to_pylist(),
                                 t["prior"].to_pylist()):
        cur = best.get(alias)
        # max prior wins; tie-break min entity_id
        if cur is None or (prior, ) > (cur[1], ) or \
           (prior == cur[1] and ent < cur[0]):
            best[alias] = (ent, prior)
    return best


class LinkMentions:
    """Actor-pool callable: mention batch → + (surface_norm, entity_id, prior)."""

    def __init__(self, alias_parquet: str):
        self.alias = load_alias_map(alias_parquet)

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch["surface"].to_pylist()
        norms, ents, priors = [], [], []
        alias = self.alias
        for s in surfaces:
            norms.append(s.lower())
            hit = alias.get(s)
            if hit is None:
                ents.append(f"ent::{s.lower()}")
                priors.append(0.0)
            else:
                ents.append(hit[0])
                priors.append(hit[1])
        batch = batch.append_column("surface_norm", pa.array(norms, pa.string()))
        batch = batch.append_column("entity_id", pa.array(ents, pa.string()))
        batch = batch.append_column("prior", pa.array(priors, pa.float64()))
        return batch


def link_dataset(ds, alias_parquet: str, concurrency: int = 4,
                 batch_size: int = 4096):
    # autoscaling (1, N) + fractional CPU: linking is a dict lookup, far
    # cheaper than the scorer — don't let its pool starve other stages.
    return ds.map_batches(
        LinkMentions,
        fn_constructor_kwargs={"alias_parquet": alias_parquet},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=0.5,
    )
