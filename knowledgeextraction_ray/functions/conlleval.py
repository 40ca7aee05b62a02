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


def _bio_luts(label_list):
    """label id → (type index, is-B) lookup arrays (0 = O / no type)."""
    import numpy as np
    typ = np.zeros(len(label_list), np.int64)
    isb = np.zeros(len(label_list), bool)
    types: dict[str, int] = {}
    for i, lab in enumerate(label_list):
        if lab == "O" or len(lab) < 2 or lab[-2] != "-":
            continue
        t = types.setdefault(lab[:-2], len(types) + 1)
        typ[i] = t
        isb[i] = lab.endswith("-B")
    return typ, isb


def chunk_counts_ids(gold, pred, lens, label_list) -> ChunkCounts:
    """Vectorized :class:`ChunkCounts` over FLAT tag-ID arrays (rows
    delimited by ``lens``) — the numpy restatement of ``update()`` for the
    fused eval hot path (a per-tag Python walk over 100M chars dominated
    the whole eval pipeline). Parity with the per-row ``update()`` is
    test-pinned, including malformed sequences (I-after-O, type switches).

    Chunk rule (``bio_to_spans``): a chunk starts at ``B`` or at a type
    change into a non-O tag; it ends before the first position that is not
    a same-type continuation. A chunk is correct iff gold and pred start
    the same type at the same position and end together."""
    import numpy as np
    gold = np.asarray(gold)
    pred = np.asarray(pred)
    lens = np.asarray(lens, np.int64)
    n_rows = len(lens)
    total = int(lens.sum())
    # scatter rows into a separator-padded flat space (one O between rows,
    # so no chunk or continuation can cross a row boundary)
    pos = np.arange(total, dtype=np.int64) + \
        np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    N = total + n_rows
    g = np.zeros(N, np.int64)
    p = np.zeros(N, np.int64)
    g[pos] = gold
    p[pos] = pred
    typ_lut, isb_lut = _bio_luts(label_list)
    tg, tp = typ_lut[g], typ_lut[p]
    sg = (tg > 0) & (isb_lut[g] | (tg != np.r_[0, tg[:-1]]))
    sp = (tp > 0) & (isb_lut[p] | (tp != np.r_[0, tp[:-1]]))
    brk_g = np.r_[np.flatnonzero(sg | (tg == 0)), N]
    brk_p = np.r_[np.flatnonzero(sp | (tp == 0)), N]
    common = np.flatnonzero(sg & sp & (tg == tp))
    eg = brk_g[np.searchsorted(brk_g, common, side="right")]
    ep = brk_p[np.searchsorted(brk_p, common, side="right")]
    return ChunkCounts(
        correct_chunks=int((eg == ep).sum()),
        gold_chunks=int(sg.sum()),
        pred_chunks=int(sp.sum()),
        correct_tags=int((gold == pred).sum()),
        total_tags=total,
    )
