"""Fused extraction stage: corpus → linked mentions in ONE actor pool.

Every transform between the corpus read and the first aggregate is row-local
(segment M1-M3 → featurize M9 → score A1/A2 → recover mentions M10 → link
J2), so they fuse into a single ``map_batches`` actor stage:

- one pool can use (cluster - reserve) CPUs instead of splitting the node
  between an actor pool and task stages that starve each other (an actor
  pool RESERVES its CPUs; tasks of downstream stages then contend for the
  remainder — measured 1.5× end-to-end on a 32-CPU node),
- intermediate segment/feature/mention blocks never hit the object store.

The individual stage classes stay exported for composition and tests; this
is the flagship's hot path.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from .linking import link_batch
from .mentions import recover_mentions
from .ner_scorer import NerScorer
from .segmenter import SegmentCorpus


class FusedExtract:
    """Actor: corpus batch → linked mention batch (all row-local stages)."""

    def __init__(self, cfg: PipelineConfig, alias_parquet: str):
        self.segment = SegmentCorpus(cfg.segment)
        self.score = NerScorer(cfg.scorer, cfg.segment)
        self.alias_parquet = alias_parquet
        from .linking import _cached_alias
        _cached_alias(alias_parquet)          # load once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        segs = self.segment(batch)
        scored = self.score(segs)
        mentions = recover_mentions(scored)
        return link_batch(mentions, self.alias_parquet)


def _extract_batch(batch: pa.Table, *, cfg: PipelineConfig,
                   alias_parquet: str) -> pa.Table:
    from ..runtime import worker_state
    fe = worker_state(("fused_extract", repr(cfg), alias_parquet),
                      lambda: FusedExtract(cfg, alias_parquet))
    return fe(batch)


def fused_linked_mentions(corpus_ds, cfg: PipelineConfig,
                          alias_parquet: str, share: float = 1.0,
                          dispatch: str = "tasks"):
    """corpus → linked mentions, one fused stage.

    ``dispatch`` (measured on this Ray version, sf0.1 warm session):

    - ``"tasks"`` (default, ``share == 1``): plain ``map_batches`` function
      with the ``FusedExtract`` state built once per WORKER PROCESS and
      cached — the stand-in models and the alias table are cheap to build,
      and a per-execution actor pool costs ~2-3.5 s of creation that warm-
      worker tasks don't pay (3.3 s → 1.4 s for the whole stage). A real
      multi-GB encoder (or ``num_gpus`` pinning) needs the ACTOR form —
      that is what ``dispatch="pool"`` keeps.
    - ``"pool"``: fixed-size actor pool (no autoscale ramp — safe because
      this is the only pool in the plan and it leaves a quarter of the node
      to the read tasks). Forced automatically when ``share < 1``
      (concurrent wave jobs): each wave gets an AUTOSCALING pool capped at
      its fraction — N fixed pools would book every CPU and deadlock the
      reads, and unbounded task stages would not respect the share at all.

    batch_size=None → whole input blocks: output block count mirrors the
    input layout instead of fragmenting into thousands of small blocks
    (every downstream per-block task pays fixed overhead; a fragmented
    mention stream measured 5× slower through the aggregates)."""
    from ..runtime import fixed_pool_size, pool_size
    if dispatch == "tasks" and share >= 1.0:
        return corpus_ds.map_batches(
            _extract_batch,
            fn_kwargs={"cfg": cfg, "alias_parquet": alias_parquet},
            batch_format="pyarrow",
            batch_size=None,
        )
    if share >= 1.0:
        concurrency = fixed_pool_size()
    else:
        concurrency = (1, pool_size(share))
    return corpus_ds.map_batches(
        FusedExtract,
        fn_constructor_kwargs={"cfg": cfg, "alias_parquet": alias_parquet},
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )
