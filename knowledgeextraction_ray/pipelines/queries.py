"""Named query callables — the driver-facing operator surface.

Each entry takes ``sf_dir`` and returns a Dataset / DataFrame / pyarrow
Table; names and column names line up 1:1 with the oracle SQL in
``knowledgeextraction_ray.oracle`` (the driver hash-compares values after
sorting columns by name).
"""

from __future__ import annotations

import pyarrow as pa
from ray.data.aggregate import Count

from ..config import PipelineConfig
from ..functions.hashing import sha256_column
from .kg import kg_pipeline, linked_mentions, read_corpus
from ..stages.canonicalize import canonicalize_dataset
from ..stages.mentions import mentions_dataset
from ..stages.ner_scorer import score_dataset
from ..stages.segmenter import segment_dataset


def q_corpus_sha(sf_dir: str):
    """Per-row content sha256 + length (the pipeline invariant, M8-style
    normalize analog)."""
    def add(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("content_sha256",
                                    sha256_column(batch["content"]))
        import pyarrow.compute as pc
        return batch.append_column(
            "n_chars", pc.cast(pc.utf8_length(batch["content"]), pa.int64()))
    return (read_corpus(sf_dir)
            .map_batches(add, batch_format="pyarrow")
            .select_columns(["repo", "path", "commit", "lang",
                             "content_sha256", "n_chars"]))


def _mentions(sf_dir: str):
    cfg = PipelineConfig()
    segs = segment_dataset(read_corpus(sf_dir), cfg.segment)
    scored = score_dataset(segs, cfg.scorer, cfg.segment)
    return mentions_dataset(scored)


def q_mentions(sf_dir: str):
    """Mention counts per (file, label, surface) — NER output aggregate."""
    return (_mentions(sf_dir)
            .groupby(["repo", "path", "label", "surface"])
            .aggregate(Count(alias_name="n")))


def q_label_hist(sf_dir: str):
    """Label histogram (reference G4 Counter dumps, distributed)."""
    from ray.data.aggregate import AggregateFn  # noqa: F401
    ds = _mentions(sf_dir)
    # count + approximate-free distinct via two-level aggregate:
    per_surface = ds.groupby(["label", "surface"]).aggregate(
        Count(alias_name="n_sub"))
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "label": batch["label"],
            "n": batch["n_sub"],
            "one": pa.array([1] * len(batch), pa.int64()),
        })
    from ray.data.aggregate import Sum
    return (per_surface.map_batches(partial, batch_format="pyarrow")
            .groupby("label")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("one", alias_name="n_distinct_surfaces")))


def q_canonical(sf_dir: str):
    linked = linked_mentions(sf_dir)
    return canonicalize_dataset(linked)


def q_triples(sf_dir: str):
    return kg_pipeline(sf_dir)


KG_QUERIES = {
    "kg_corpus_sha": q_corpus_sha,
    "kg_mentions": q_mentions,
    "kg_label_hist": q_label_hist,
    "kg_canonical": q_canonical,
    "kg_triples": q_triples,
}


def build_queries() -> dict:
    """Full driver-facing query registry (grows as operators land)."""
    return dict(KG_QUERIES)


def build_oracles(sf_dir: str) -> dict:
    """Oracle SQL per query name, bound to ``sf_dir``'s corpus cache."""
    from ..oracle import KG_ORACLES
    return {name: builder(sf_dir) for name, builder in KG_ORACLES.items()}
