"""conlleval-equivalent chunk P/R/F1 as a mergeable reduce (reference G6).

The reference shells out to the Perl ``knowledgeextractor/utils/conlleval``
script (wrapper ``utils/scores.py:4-14``) to score chunk-level precision /
recall / FB1 plus token accuracy. This module reimplements the counting as a
pure-Python PARTIAL state that is associative/commutative, so it can run as a
per-batch partial inside ``map_batches`` followed by a tiny driver-side merge —
the distributed form of the eval harness (SURVEY.md §3.3).
"""

from __future__ import annotations

from dataclasses import dataclass

from .bio import bio_to_spans


@dataclass
class ChunkCounts:
    correct_chunks: int = 0
    gold_chunks: int = 0
    pred_chunks: int = 0
    correct_tags: int = 0
    total_tags: int = 0

    def update(self, gold_tags, pred_tags) -> None:
        """Accumulate one (gold, pred) tag-sequence pair (same length)."""
        g = bio_to_spans(gold_tags)
        p = bio_to_spans(pred_tags)
        self.correct_chunks += len(set(g) & set(p))
        self.gold_chunks += len(g)
        self.pred_chunks += len(p)
        self.total_tags += len(gold_tags)
        self.correct_tags += sum(1 for a, b in zip(gold_tags, pred_tags) if a == b)

    def merge(self, other: "ChunkCounts") -> "ChunkCounts":
        return ChunkCounts(
            self.correct_chunks + other.correct_chunks,
            self.gold_chunks + other.gold_chunks,
            self.pred_chunks + other.pred_chunks,
            self.correct_tags + other.correct_tags,
            self.total_tags + other.total_tags,
        )

    def metrics(self) -> dict:
        """conlleval-style final metrics (accuracy, precision, recall, FB1)."""
        prec = self.correct_chunks / self.pred_chunks if self.pred_chunks else 0.0
        rec = self.correct_chunks / self.gold_chunks if self.gold_chunks else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        acc = self.correct_tags / self.total_tags if self.total_tags else 0.0
        return {"accuracy": acc, "precision": prec, "recall": rec, "f1": f1,
                "correct_chunks": self.correct_chunks,
                "gold_chunks": self.gold_chunks,
                "pred_chunks": self.pred_chunks}

    def as_row(self) -> dict:
        return {"correct_chunks": self.correct_chunks,
                "gold_chunks": self.gold_chunks,
                "pred_chunks": self.pred_chunks,
                "correct_tags": self.correct_tags,
                "total_tags": self.total_tags}
