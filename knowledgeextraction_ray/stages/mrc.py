"""MRC (question-prompted span extraction) — the reference's only true
fan-out/fan-in computation, restated (SURVEY.md §3.4).

Reference flow (``nermodels/mrc_albert.py:82-150``, ``utils/mrc_utils.py``):
one example fans out to k sliding-window doc-span FEATURES (M11), the model
scores top start/end candidates per feature, and ``get_predictions_v2`` fans
back in per example (G1): average start/end log-probs per (start, end) cell,
sort desc, dedup by answer text (first-wins in score order — kept
deterministic here by a total (score, start, end) order), softmax over the
kept scores, averaged cls logit as the no-answer odds.

Here: explode → actor-pool score → bucketed group merge. The merge groups on
``hash(example_id) % B`` and runs a vectorized pandas groupby inside each
bucket, so the per-example Python work never becomes a per-group task.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..corpus import MENTION_PATTERNS
from ..functions.hashing import stable_hash64

# entity-type prompts (reference builds the question from the entity type,
# ``nermodels/mrc_albert.py:181-185``)
QUESTIONS = {
    "FUNC": "Which functions are defined?",
    "CLASS": "Which classes are defined?",
    "IMPORT": "Which modules are imported?",
    "CALL": "Which functions are called?",
}
QTYPE_OF = {q: t for t, q in QUESTIONS.items()}


def build_examples(batch: pa.Table) -> pa.Table:
    """corpus batch → MRC examples: one (file × question) per type."""
    out = {"example_id": [], "question": [], "context": []}
    from ..functions.hashing import sha256_hex
    for content in batch["content"].to_pylist():
        sha = sha256_hex(content)
        for qtype, q in QUESTIONS.items():
            out["example_id"].append(f"{sha}:{qtype}")
            out["question"].append(q)
            out["context"].append(content)
    return pa.Table.from_pydict(out)


def window_starts(ctx_len: int, max_span: int, stride: int) -> list[int]:
    return list(range(0, max(1, ctx_len - max_span + stride), stride))


def explode_features(batch: pa.Table, max_span: int = 200,
                     stride: int = 100) -> pa.Table:
    """example → sliding-window doc-span features (M11 analog).

    Char-level, so the reference's tok↔orig index maps are identity; the
    window bookkeeping (span_start, doc_span_index, ctx_len for the
    max-context check) is kept exactly."""
    out = {"example_id": [], "question": [], "doc_span_index": [],
           "span_start": [], "span_text": [], "ctx_len": []}
    for ex, q, ctx in zip(batch["example_id"].to_pylist(),
                          batch["question"].to_pylist(),
                          batch["context"].to_pylist()):
        for i, s in enumerate(window_starts(len(ctx), max_span, stride)):
            out["example_id"].append(ex)
            out["question"].append(q)
            out["doc_span_index"].append(i)
            out["span_start"].append(s)
            out["span_text"].append(ctx[s:s + max_span])
            out["ctx_len"].append(len(ctx))
    return pa.Table.from_pydict(out)


def char_is_max_context(starts: list[int], lengths: list[int],
                        cur_index: int, pos: int) -> bool:
    """Char-level restatement of the reference ``_check_is_max_context``
    (``utils/mrc_utils.py:80-114``): of all sliding windows containing
    ``pos``, the one maximizing ``min(left_ctx, right_ctx) + 0.01·len``
    owns the position; a candidate is scored only in its owning window."""
    best = None
    best_i = None
    for i, (st, ln) in enumerate(zip(starts, lengths)):
        end = st + ln - 1
        if pos < st or pos > end:
            continue
        score = min(pos - st, end - pos) + 0.01 * ln
        if best is None or score > best:
            best, best_i = score, i
    return cur_index == best_i


class MrcSpanScorer:
    """Actor: per-feature candidate spans with deterministic log-probs.

    Stand-in for the ALBERT squad-v2 head (start_n_top × end_n_top beam,
    ``mrc_albert.py:63-65``): candidates are grammar matches inside the span;
    start/end log-probs decay with intra-span rank.

    Reference-parity details:

    - every feature emits exactly ONE cls row (``cand_start = -1``) whether
      or not it has candidates — ``accumulate_predictions_v2`` records
      ``cls_logits`` per feature independently of candidate filtering, so
      the example's no-answer odds are a mean over FEATURES, not candidates;
    - a candidate survives only if this window is the max-context owner of
      its START position (``char_is_max_context``), the reference's
      ``token_is_max_context`` guard — overlapping windows no longer emit
      the same span twice with asymmetric context."""

    def __init__(self, start_n_top: int = 5, max_span: int = 200,
                 stride: int = 100):
        self.patterns = {t: re.compile(p)
                         for t, p in MENTION_PATTERNS.items()}
        self.n_top = start_n_top
        self.max_span = max_span
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"example_id": [], "doc_span_index": [], "span_start": [],
               "cand_start": [], "cand_end": [], "start_log_prob": [],
               "end_log_prob": [], "cls_logit": [], "answer_text": []}

        def emit(ex, dsi, s0, cs, ce, slp, elp, cls, text):
            out["example_id"].append(ex)
            out["doc_span_index"].append(dsi)
            out["span_start"].append(s0)
            out["cand_start"].append(cs)
            out["cand_end"].append(ce)
            out["start_log_prob"].append(slp)
            out["end_log_prob"].append(elp)
            out["cls_logit"].append(cls)
            out["answer_text"].append(text)

        for ex, q, dsi, s0, text, ctx_len in zip(
                batch["example_id"].to_pylist(),
                batch["question"].to_pylist(),
                batch["doc_span_index"].to_pylist(),
                batch["span_start"].to_pylist(),
                batch["span_text"].to_pylist(),
                batch["ctx_len"].to_pylist()):
            qtype = QTYPE_OF[q]
            pat = self.patterns[qtype]
            cands = [(m.span(1)) for m in pat.finditer(text)][: self.n_top]
            # per-FEATURE cls row, always (reference: cls_dict per feature)
            emit(ex, dsi, s0, -1, -1, -1e4, -1e4,
                 5.0 if not cands else -5.0, "")
            if not cands:
                continue
            starts = window_starts(ctx_len, self.max_span, self.stride)
            lengths = [min(self.max_span, ctx_len - s) for s in starts]
            for rank, (cs, ce) in enumerate(cands):
                if not char_is_max_context(starts, lengths, dsi, s0 + cs):
                    continue
                emit(ex, dsi, s0, s0 + cs, s0 + ce,    # GLOBAL char offsets
                     -0.1 * rank, -0.05 * rank, 0.0, text[cs:ce])
        return pa.Table.from_pydict(out)


def _softmax(scores: np.ndarray) -> np.ndarray:
    """Numerically-stable softmax (``mrc_utils.py:19-39``)."""
    if len(scores) == 0:
        return scores
    z = scores - scores.max()
    e = np.exp(z)
    return e / e.sum()


def _final_answer(entities: list, na_prob: float,
                  threshold: float | None) -> str:
    """``get_predictions_v2`` null-odds rule (``mrc_utils.py:455-459``):
    best non-null text unless a threshold is given and the example's
    no-answer odds reach it."""
    if not entities:
        return ""
    if threshold is not None and na_prob >= threshold:
        return ""
    return entities[0]


def _merge_example(g: pd.DataFrame, n_best: int,
                   null_threshold: float | None = 0.0) -> dict:
    """Fan-in for ONE example (G1): mean log-probs per (start, end) cell →
    sort desc (total, then (start,end) asc for a TOTAL order) → text dedup
    first-wins → softmax → na_prob = mean PER-FEATURE cls logit (the cls
    rows, ``cand_start == -1``) → thresholded final answer."""
    cls_rows = g[g["cand_start"] == -1]
    na_prob = float(cls_rows["cls_logit"].mean()) if len(cls_rows) \
        else float(g["cls_logit"].mean())
    real = g[g["cand_start"] >= 0]
    if len(real) == 0:
        return {"entities": [], "probabilities": [], "na_prob": na_prob,
                "final_answer": ""}
    cell = (real.groupby(["cand_start", "cand_end"])
            .agg(s=("start_log_prob", "mean"), e=("end_log_prob", "mean"),
                 text=("answer_text", "first"))
            .reset_index())
    cell["total"] = cell["s"] + cell["e"]
    cell = cell.sort_values(["total", "cand_start", "cand_end"],
                            ascending=[False, True, True], kind="mergesort")
    seen: set[str] = set()
    kept = []
    for _, row in cell.iterrows():
        if row["text"] in seen:
            continue
        seen.add(row["text"])
        kept.append(row)
        if len(kept) >= n_best:
            break
    totals = np.array([r["total"] for r in kept])
    probs = _softmax(totals)
    ents = [r["text"] for r in kept]
    return {"entities": ents,
            "probabilities": [float(p) for p in probs],
            "na_prob": na_prob,
            "final_answer": _final_answer(ents, na_prob, null_threshold)}


def _merge_bucket(g: pd.DataFrame, n_best: int,
                  null_threshold: float | None = 0.0) -> pd.DataFrame:
    """Vectorized fan-in for ALL examples in a bucket — same semantics as
    :func:`_merge_example` (parity-tested) but one pandas pipeline instead
    of per-example Python (a per-example loop measured ~1 ms/example →
    dominated the whole MRC pipeline)."""
    cls_rows = g[g["cand_start"] == -1]
    if len(cls_rows):
        na = cls_rows.groupby("example_id", sort=True)["cls_logit"].mean()
        # examples with no cls row at all (hand-built inputs) fall back
        missing = g.loc[~g["example_id"].isin(na.index)]
        if len(missing):
            na = pd.concat([na, missing.groupby("example_id",
                                                sort=True)["cls_logit"]
                            .mean()]).sort_index()
    else:
        na = g.groupby("example_id", sort=True)["cls_logit"].mean()
    real = g[g["cand_start"] >= 0]
    cell = (real.groupby(["example_id", "cand_start", "cand_end"],
                         sort=False)
            .agg(s=("start_log_prob", "mean"), e=("end_log_prob", "mean"),
                 text=("answer_text", "first"))
            .reset_index())
    cell["total"] = cell["s"] + cell["e"]
    cell = cell.sort_values(["example_id", "total", "cand_start",
                             "cand_end"],
                            ascending=[True, False, True, True],
                            kind="mergesort")
    cell = cell.drop_duplicates(["example_id", "text"], keep="first")
    cell = cell.groupby("example_id", sort=False).head(n_best)
    mx = cell.groupby("example_id", sort=False)["total"].transform("max")
    cell["p"] = np.exp(cell["total"] - mx)
    cell["p"] /= cell.groupby("example_id",
                              sort=False)["p"].transform("sum")
    lists = (cell.groupby("example_id", sort=True)
             .agg(entities=("text", list), probabilities=("p", list)))
    out = pd.DataFrame({"na_prob": na}).join(lists, how="left")
    out["entities"] = out["entities"].apply(
        lambda v: v if isinstance(v, list) else [])
    out["probabilities"] = out["probabilities"].apply(
        lambda v: v if isinstance(v, list) else [])
    out["final_answer"] = [
        _final_answer(e, p, null_threshold)
        for e, p in zip(out["entities"], out["na_prob"])]
    out = out.reset_index()
    return out[["example_id", "entities", "probabilities", "na_prob",
                "final_answer"]]


def nbest_merge(scored, n_best: int = 20, num_buckets: int = 32,
                null_threshold: float | None = 0.0):
    """feature-level predictions → per-example n-best rows (+ the
    null-odds-thresholded ``final_answer``)."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        b = stable_hash64(batch["example_id"].to_pylist()) % num_buckets
        return batch.append_column("bucket",
                                   pa.array(b.astype(np.int32)))

    return (scored.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: _merge_bucket(g, n_best, null_threshold),
                        batch_format="pandas"))


def mrc_answer_f1(nbest_pdf, gold_map: dict[str, set[str]]) -> dict:
    """Answer-set EM / precision / recall / F1 per SQuAD-style eval
    (``run_mrc_albert.py`` squad F1 analog, computed over entity SETS since
    the prompt asks for all answers, not one span).

    ``gold_map``: example_id → set of gold answer strings."""
    tp = fp = fn = 0
    exact = 0
    n = 0
    for ex, ents in zip(nbest_pdf["example_id"], nbest_pdf["entities"]):
        gold = gold_map.get(ex, set())
        pred = set(ents)
        tp += len(pred & gold)
        fp += len(pred - gold)
        fn += len(gold - pred)
        exact += int(pred == gold)
        n += 1
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"exact_match": exact / n if n else 0.0, "precision": prec,
            "recall": rec, "f1": f1, "n_examples": n}


def mrc_pipeline(corpus_ds, max_span: int = 200, stride: int = 100,
                 n_best: int = 20, null_threshold: float | None = 0.0):
    """corpus → per-(file × question) n-best entity lists + thresholded
    final answer."""
    examples = corpus_ds.map_batches(build_examples, batch_format="pyarrow")
    feats = examples.map_batches(
        lambda b: explode_features(b, max_span, stride),
        batch_format="pyarrow")
    from ..runtime import pool_size
    scored = feats.map_batches(
        MrcSpanScorer,
        fn_constructor_kwargs={"max_span": max_span, "stride": stride},
        batch_format="pyarrow", concurrency=(1, pool_size(1.0)))
    return nbest_merge(scored, n_best, null_threshold=null_threshold)
