"""Batch NER evaluation pipeline (reference §3.3 restated).

The reference's eval harness round-trips 100 sampled queries over HTTP,
positionally zips predictions to gold, writes a conlleval file and shells out
to Perl (``test/albertNER/eval_estimator.py:102-120``, ``utils/scores.py``).
Here it is one keyed, streaming pipeline:

    gold tags  ─┐
                ├─ hash join on guid ─ per-batch chunk-count partials ─ sum
    pred tags  ─┘

- gold = the regex-derivable tag sequence per segment (the corpus grammar
  makes gold computable without a model),
- pred = the NER scorer pipeline's tags (optionally corrupted at a
  deterministic per-guid rate, to exercise metrics < 1 in tests),
- the conlleval chunk P/R/F1 counting runs as associative per-batch partials
  (``functions/conlleval.ChunkCounts``) summed by a tiny aggregate —
  the distributed form of the P/R ≥ 0.95 gate.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.bio import spans_to_bio
from ..functions.conlleval import ChunkCounts
from ..functions.hashing import stable_hash64
from ..stages.ner_scorer import LABEL_LIST, RuleCharTagModel, score_dataset
from ..stages.segmenter import segment_dataset
from .kg import read_corpus


class GoldTagger:
    """Gold per-char tags from the mention grammar (no model)."""

    def __init__(self):
        self.model = RuleCharTagModel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        tags = []
        for text in texts:
            spans = []
            for lab, pat in self.model.patterns:
                for m in pat.finditer(text):
                    s, e = m.span(1)
                    spans.append((lab, s, e))
            tags.append(spans_to_bio(len(text), spans))
        # tags serialized to one delimited string: Arrow's hash join
        # (acero) rejects list<> payload columns
        return pa.Table.from_pydict({
            "guid": batch["guid"],
            "gold_tags": pa.array(["\x1f".join(t) for t in tags],
                                  pa.string()),
        })


def _pred_tags(batch: pa.Table, corrupt_frac: float) -> pa.Table:
    guids = batch["guid"].to_pylist()
    tag_ids = batch["tag_ids"].to_pylist()
    out = []
    for guid, ids in zip(guids, tag_ids):
        labels = [LABEL_LIST[t] for t in ids]
        if corrupt_frac > 0:
            # deterministic per-guid corruption: blank out all tags of some
            # segments (simulates the reference's silently-dropped batches)
            if (stable_hash64([guid])[0] % 1000) < corrupt_frac * 1000:
                labels = ["O"] * len(labels)
        out.append(labels)
    return pa.Table.from_pydict({
        "guid": guids,
        "pred_tags": pa.array(["\x1f".join(t) for t in out], pa.string()),
    })


def _count_partials(batch: pa.Table) -> pa.Table:
    cc = ChunkCounts()
    for gold, pred in zip(batch["gold_tags"].to_pylist(),
                          batch["pred_tags"].to_pylist()):
        cc.update(gold.split("\x1f") if gold else [],
                  pred.split("\x1f") if pred else [])
    return pa.Table.from_pydict({k: [v] for k, v in cc.as_row().items()})


class _FusedEvalCount:
    """Actor: corpus batch → one chunk-count partial row (segment M1-M3 →
    score A1/A2 → gold grammar tags → conlleval chunk counting, fused).

    Everything stays in tag-ID space: pred ids come zero-copy from the
    scorer's arrow list column, gold ids are written straight into a flat
    array in ``spans_to_bio`` order (I over the span then B at start, later
    patterns overwrite), and the counting is the vectorized
    ``chunk_counts_ids`` — no label strings, no per-tag Python (the
    string join/split/walk formulation measured 4× slower end-to-end)."""

    def __init__(self, cfg: PipelineConfig, corrupt_frac: float):
        import numpy as np  # noqa: F401  (hot path)
        from ..stages.ner_scorer import LABEL2ID, NerScorer, RuleCharTagModel
        from ..stages.segmenter import SegmentCorpus
        self.segment = SegmentCorpus(cfg.segment)
        self.score = NerScorer(cfg.scorer, cfg.segment)
        self.patterns = RuleCharTagModel().patterns
        self.ids = {lab: (LABEL2ID[f"{lab}-B"], LABEL2ID[f"{lab}-I"])
                    for lab, _ in self.patterns}
        self.corrupt = corrupt_frac

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.conlleval import chunk_counts_ids
        scored = self.score(self.segment(batch))
        texts = scored["text"].to_pylist()
        col = scored["tag_ids"].combine_chunks()
        pred = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(col.offsets.to_numpy().astype(np.int64))
        if self.corrupt > 0:
            # deterministic per-guid corruption (see _pred_tags)
            guids = scored["guid"].to_pylist()
            mask = (stable_hash64(guids) % 1000) < self.corrupt * 1000
            pred = np.where(np.repeat(mask, lens), 0, pred)
        gold = np.zeros(len(pred), np.int64)
        base = np.r_[0, np.cumsum(lens)[:-1]]
        for r, text in enumerate(texts):
            o = int(base[r])
            for lab, pat in self.patterns:
                b_id, i_id = self.ids[lab]
                for m in pat.finditer(text):
                    s, e = m.span(1)
                    gold[o + s:o + e] = i_id
                    gold[o + s] = b_id
        cc = chunk_counts_ids(gold, pred, lens, LABEL_LIST)
        return pa.Table.from_pydict({k: [v] for k, v in cc.as_row().items()})


def _fused_eval_batch(batch: pa.Table, *, cfg: PipelineConfig,
                      corrupt_frac: float) -> pa.Table:
    from ..runtime import worker_state
    fe = worker_state(("fused_eval", repr(cfg), corrupt_frac),
                      lambda: _FusedEvalCount(cfg, corrupt_frac))
    return fe(batch)


def ner_eval(sf_dir: str, cfg: PipelineConfig | None = None,
             corrupt_frac: float = 0.0, mode: str = "fused") -> pd.DataFrame:
    """→ one-row DataFrame: chunk counts + accuracy/precision/recall/f1.

    ``mode="fused"`` (default): gold and pred tags both derive from the
    SAME scored-segment row, so the chunk counting happens inside one
    ``map_batches`` pass — zero joins, zero extra pools, one tiny final
    aggregate. ``mode="join"`` keeps the two-branch keyed-join formulation
    (the reference §3.3 parity demo — its positional zip restated as an
    explicit guid join); both modes are equality-tested."""
    import dataclasses

    from ray.data.aggregate import Sum
    cfg = cfg or PipelineConfig()
    if mode == "fused":
        # corpus → segment → score → gold-tag → chunk-count partials, ALL
        # inside one row-local stage; emitting one partial-count row per
        # block means nothing but ~5 ints per block ever leaves the stage.
        # TASK-based (not an actor pool): the fused state is compiled
        # regexes (~ms to build, cached per worker process), and per-
        # execution actor-pool creation costs ~3 s that tasks on warm
        # workers don't pay.
        partials = read_corpus(sf_dir).map_batches(
            _fused_eval_batch,
            fn_kwargs={"cfg": cfg, "corrupt_frac": corrupt_frac},
            batch_format="pyarrow", batch_size=None)
        agg = partials.aggregate(
            Sum("correct_chunks", alias_name="correct_chunks"),
            Sum("gold_chunks", alias_name="gold_chunks"),
            Sum("pred_chunks", alias_name="pred_chunks"),
            Sum("correct_tags", alias_name="correct_tags"),
            Sum("total_tags", alias_name="total_tags"))
        cc = ChunkCounts(**{k: int(agg[k]) for k in agg})
        m = cc.metrics()
        return pd.DataFrame([{**cc.as_row(),
                              "accuracy": m["accuracy"],
                              "precision": m["precision"],
                              "recall": m["recall"], "f1": m["f1"]}])
    # fractional-CPU pools: this pipeline runs TWO actor pools plus the
    # join's aggregator actors concurrently — full-CPU reservations starve
    # the read stages in small sessions (4-CPU test fixture) and deadlock.
    light_scorer = dataclasses.replace(cfg.scorer, num_cpus=0.5)
    # one read+segment pass, materialized, feeds BOTH branches (gold and
    # pred) — re-deriving segments per branch doubled the extraction work
    segs = segment_dataset(read_corpus(sf_dir), cfg.segment).materialize()
    from ..runtime import pool_size
    gold = segs.map_batches(GoldTagger, batch_format="pyarrow",
                            concurrency=(1, pool_size(0.5)), num_cpus=0.5)
    scored = score_dataset(segs, light_scorer, cfg.segment)
    pred = scored.map_batches(lambda b: _pred_tags(b, corrupt_frac),
                              batch_format="pyarrow")
    joined = pred.join(gold, join_type="inner", num_partitions=8,
                       on=("guid",),
                       aggregator_ray_remote_args={"num_cpus": 0.25})
    partials = joined.map_batches(_count_partials, batch_format="pyarrow")
    agg = partials.aggregate(
        Sum("correct_chunks", alias_name="correct_chunks"),
        Sum("gold_chunks", alias_name="gold_chunks"),
        Sum("pred_chunks", alias_name="pred_chunks"),
        Sum("correct_tags", alias_name="correct_tags"),
        Sum("total_tags", alias_name="total_tags"))
    cc = ChunkCounts(**{k: int(agg[k]) for k in agg})
    m = cc.metrics()
    return pd.DataFrame([{**cc.as_row(),
                          "accuracy": m["accuracy"],
                          "precision": m["precision"],
                          "recall": m["recall"], "f1": m["f1"]}])
