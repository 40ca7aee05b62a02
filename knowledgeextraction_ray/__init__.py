"""knowledgeextraction_ray — a Ray-Data-native knowledge-graph construction engine.

Built from scratch with the query/data-processing capabilities of the reference
``zhangzhenyu13/KnowledgeExtraction`` toolkit (NER → entity linking → relation
extraction → knowledge-graph materialization), re-expressed Ray-Data-first:

- every per-record transform is a vectorized ``Dataset.map_batches`` over
  zero-copy Arrow batches,
- every stateful stage (model weights, vocabularies, alias dictionaries) is an
  actor pool (``map_batches(Cls, concurrency=N)``) with state loaded once in
  ``__init__``,
- every wide operation (canonicalization, dedup) is an explicit, skew-aware
  groupby with salting and partial aggregation,
- output is subject-hash-partitioned Parquet with per-partition lineage
  manifests so any partition resumes without recompute.

The package never calls ``ray.init``/``ray.shutdown`` — session ownership
belongs to the caller (CLI scripts, bench.py, the test fixture).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (keep import light — stages pull in Ray)."""
    api = {
        "kg_pipeline": ("knowledgeextraction_ray.pipelines.kg",
                        "kg_pipeline"),
        "linked_mentions": ("knowledgeextraction_ray.pipelines.kg",
                            "linked_mentions"),
        "ner_eval": ("knowledgeextraction_ray.pipelines.evaluate",
                     "ner_eval"),
        "run_resumable_kg": ("knowledgeextraction_ray.state.lineage",
                             "run_resumable_kg"),
        "PipelineConfig": ("knowledgeextraction_ray.config",
                           "PipelineConfig"),
        "build_queries": ("knowledgeextraction_ray.pipelines.queries",
                          "build_queries"),
        "build_oracles": ("knowledgeextraction_ray.pipelines.queries",
                          "build_oracles"),
    }
    if name in api:
        import importlib
        mod, attr = api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
