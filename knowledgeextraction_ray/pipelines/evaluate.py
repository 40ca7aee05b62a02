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
        scored = score_dataset(
            segment_dataset(read_corpus(sf_dir), cfg.segment),
            cfg.scorer, cfg.segment)
        gold_tagger = GoldTagger()

        def count_batch(batch: pa.Table) -> pa.Table:
            gold = gold_tagger(batch)["gold_tags"].to_pylist()
            pred = _pred_tags(batch, corrupt_frac)["pred_tags"].to_pylist()
            cc = ChunkCounts()
            for g, p in zip(gold, pred):
                cc.update(g.split("\x1f") if g else [],
                          p.split("\x1f") if p else [])
            return pa.Table.from_pydict({k: [v]
                                         for k, v in cc.as_row().items()})

        partials = scored.map_batches(count_batch, batch_format="pyarrow",
                                      batch_size=None)
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
