"""MRC (question-prompted span extraction) — the reference's only true
fan-out/fan-in computation, restated (SURVEY.md §3.4).

Reference flow (``nermodels/mrc_albert.py:82-150``, ``utils/mrc_utils.py``):
one example fans out to k sliding-window doc-span FEATURES (M11), the model
scores top start/end candidates per feature, and ``get_predictions_v2`` fans
back in per example (G1): average start/end log-probs per (start, end) cell,
sort desc, dedup by answer text (first-wins in score order — kept
deterministic here by a total (score, start, end) order), softmax over the
kept scores, averaged cls logit as the no-answer odds.

Candidate semantics mirror the reference's GLOBAL tokenization: the doc is
tokenized once and every sliding window is a view over that one token
sequence (``mrc_utils.py:232-270``), so stand-in candidates are grammar
matches over the FULL context, each scored only inside the windows that
fully contain it and emitted only by the window that owns its start
position (``_check_is_max_context``, ``mrc_utils.py:80-114``).

Two execution shapes over one shared kernel (``_feature_rows``):

- **staged** (``build_examples`` → ``MrcWindowScorer`` → ``nbest_merge``):
  feature-level prediction rows cross the cluster and fan back in through a
  bucketed group merge — the shape a giant-context corpus needs, and the
  J4/G1 demo.
- **fused** (``MrcFusedScorer``): when one example's windows fit in a
  worker (any bounded-document corpus), the fan-out is generated locally,
  so the fan-in is local too — the whole pipeline is ONE actor-pool
  map_batches with zero shuffle. This is the default; the test suite pins
  fused ≡ staged row-for-row.
"""

from __future__ import annotations

from ..functions.tables import from_pandas_clean

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

FEATURE_SCHEMA = pa.schema([
    ("example_id", pa.string()),
    ("doc_span_index", pa.int64()),
    ("span_start", pa.int64()),
    ("cand_start", pa.int64()),
    ("cand_end", pa.int64()),
    ("start_log_prob", pa.float64()),
    ("end_log_prob", pa.float64()),
    ("cls_logit", pa.float64()),
    ("answer_text", pa.string()),
])

NBEST_SCHEMA = pa.schema([
    ("example_id", pa.string()),
    ("entities", pa.list_(pa.string())),
    ("probabilities", pa.list_(pa.float64())),
    ("na_prob", pa.float64()),
    ("final_answer", pa.string()),
])


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


def _feature_rows(example_ids: list[str], qtypes: list[str],
                  contexts: list[str], patterns: dict[str, re.Pattern],
                  n_top: int, max_span: int, stride: int) -> pd.DataFrame:
    """Vectorized feature-level prediction rows for a batch of examples.

    Per example: one grammar ``finditer`` over the full context (the only
    per-row Python — regex is C); every window/ownership/rank decision is
    numpy over the batch's flat match list:

    - a window *contains* a match iff the full match span fits inside it
      (global-tokenization semantics — a window never sees a truncated
      candidate);
    - per-window rank = position order among contained matches, beam-capped
      at ``n_top`` (T2, ``mrc_albert.py:63-65``), log-probs decay with rank;
    - a candidate row is emitted only by the max-context owner of its start
      (tie → lowest window index, as ``_check_is_max_context``);
    - every (example, window) emits exactly ONE cls row (``cand_start=-1``)
      whether or not it has candidates — ``accumulate_predictions_v2``
      records cls_logits per feature independently of candidate filtering,
      so na_prob is a mean over FEATURES, not candidates.
    """
    E = len(example_ids)
    S, T = max_span, stride
    if E == 0:
        return pd.DataFrame({f.name: pd.Series([], dtype=object)
                             for f in FEATURE_SCHEMA})
    L = np.fromiter((len(c) for c in contexts), np.int64, E)
    n_win = (np.maximum(1, L - S + T) + T - 1) // T

    m_ex: list[int] = []
    m_span: list[tuple[int, int, int, int]] = []
    m_text: list[str] = []
    for e in range(E):
        pat = patterns[qtypes[e]]
        for m in pat.finditer(contexts[e]):
            m_ex.append(e)
            m_span.append((m.start(), m.end(), m.start(1), m.end(1)))
            m_text.append(m.group(1))

    M = len(m_ex)
    me = np.asarray(m_ex, np.int64)
    if M:
        spans = np.asarray(m_span, np.int64)
        f_s, f_e = spans[:, 0], spans[:, 1]
        g_s, g_e = spans[:, 2], spans[:, 3]
    else:
        f_s = f_e = g_s = g_e = np.empty(0, np.int64)

    # (match, window) containment pairs: window i holds the match iff
    # i*T <= f_s and f_e <= i*T + min(S, L - i*T)  ⇔  ceil((f_e-S)/T) <= i
    # <= floor(f_s/T), clipped to the example's window count.
    i_hi = np.minimum(f_s // T, n_win[me] - 1) if M else f_s
    i_lo = np.maximum(0, -((S - f_e) // T)) if M else f_s
    K = int((i_hi - i_lo).max()) + 1 if M and (i_lo <= i_hi).any() else 0
    pm_parts, pw_parts = [], []
    for k in range(K):
        w = i_hi - k
        ok = w >= i_lo
        idx = np.flatnonzero(ok)
        pm_parts.append(idx)
        pw_parts.append(w[idx])
    pm = np.concatenate(pm_parts) if pm_parts else np.empty(0, np.int64)
    pw = np.concatenate(pw_parts) if pw_parts else np.empty(0, np.int64)

    W_MAX = int(n_win.max())
    combo = me[pm] * W_MAX + pw

    if len(pm):
        # max-context owner of each match's start among containing windows
        st = pw * T
        ln = np.minimum(S, L[me[pm]] - st)
        p = g_s[pm]
        score = np.minimum(p - st, st + ln - 1 - p) + 0.01 * ln
        srt = np.lexsort((pw, -score, pm))
        pm_s = pm[srt]
        first = np.r_[True, pm_s[1:] != pm_s[:-1]]
        owner = np.full(M, -1, np.int64)
        owner[pm_s[first]] = pw[srt][first]

        # per-window rank by position (finditer order), then beam cap
        order = np.lexsort((p, combo))
        sc = combo[order]
        run_start = np.r_[0, np.flatnonzero(sc[1:] != sc[:-1]) + 1]
        counts = np.diff(np.r_[run_start, len(sc)])
        rank = np.empty(len(sc), np.int64)
        rank[order] = np.arange(len(sc)) - np.repeat(run_start, counts)

        emitted = (pw == owner[pm]) & (rank < n_top)
    else:
        emitted = np.empty(0, bool)
        rank = np.empty(0, np.int64)

    # cls rows: one per (example, window)
    W_total = int(n_win.sum())
    e_rep = np.repeat(np.arange(E, dtype=np.int64), n_win)
    w_rep = np.arange(W_total, dtype=np.int64) - np.repeat(
        np.cumsum(n_win) - n_win, n_win)
    has_cand = np.isin(e_rep * W_MAX + w_rep, combo)

    ex_arr = np.asarray(example_ids, dtype=object)
    pe = pm[emitted]
    er = rank[emitted]
    ew = pw[emitted]
    texts = np.asarray(m_text, dtype=object)[pe] if len(pe) else \
        np.empty(0, dtype=object)
    return pd.DataFrame({
        "example_id": np.concatenate([ex_arr[e_rep], ex_arr[me[pe]]]),
        "doc_span_index": np.concatenate([w_rep, ew]),
        "span_start": np.concatenate([w_rep, ew]) * T,
        "cand_start": np.concatenate([np.full(W_total, -1, np.int64),
                                      g_s[pe]]),
        "cand_end": np.concatenate([np.full(W_total, -1, np.int64),
                                    g_e[pe]]),
        "start_log_prob": np.concatenate([np.full(W_total, -1e4),
                                          -0.1 * er]),
        "end_log_prob": np.concatenate([np.full(W_total, -1e4),
                                        -0.05 * er]),
        "cls_logit": np.concatenate([np.where(has_cand, -5.0, 5.0),
                                     np.zeros(len(pe))]),
        "answer_text": np.concatenate([np.full(W_total, "", dtype=object),
                                       texts]),
    })


class MrcWindowScorer:
    """Actor (staged shape): examples → per-feature candidate/cls rows.

    Stand-in for the ALBERT squad-v2 head (start_n_top × end_n_top beam,
    ``mrc_albert.py:63-65``) over M11's sliding windows; all bookkeeping in
    :func:`_feature_rows`."""

    def __init__(self, start_n_top: int = 5, max_span: int = 200,
                 stride: int = 100):
        self.patterns = {t: re.compile(p)
                         for t, p in MENTION_PATTERNS.items()}
        self.n_top = start_n_top
        self.max_span = max_span
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        qtypes = [QTYPE_OF[q] for q in batch["question"].to_pylist()]
        df = _feature_rows(batch["example_id"].to_pylist(), qtypes,
                           batch["context"].to_pylist(), self.patterns,
                           self.n_top, self.max_span, self.stride)
        return from_pandas_clean(df, schema=FEATURE_SCHEMA,
                                    preserve_index=False)


class MrcFusedScorer:
    """Actor (fused shape): corpus rows → final per-example n-best rows.

    The fan-out (4 questions × k windows per file) is generated inside the
    actor, so the G1 fan-in runs locally on the batch via the SAME merge
    kernel the distributed path uses (``_merge_bucket``) — zero shuffle,
    no feature rows in the object store. Valid whenever one example's
    windows fit in a worker; the staged path covers the rest."""

    def __init__(self, start_n_top: int = 5, max_span: int = 200,
                 stride: int = 100, n_best: int = 20,
                 null_threshold: float | None = 0.0):
        self.patterns = {t: re.compile(p)
                         for t, p in MENTION_PATTERNS.items()}
        self.n_top = start_n_top
        self.max_span = max_span
        self.stride = stride
        self.n_best = n_best
        self.null_threshold = null_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import sha256_hex
        example_ids: list[str] = []
        qtypes: list[str] = []
        contexts: list[str] = []
        for content in batch["content"].to_pylist():
            sha = sha256_hex(content)
            for qtype in QUESTIONS:
                example_ids.append(f"{sha}:{qtype}")
                qtypes.append(qtype)
                contexts.append(content)
        df = _feature_rows(example_ids, qtypes, contexts, self.patterns,
                           self.n_top, self.max_span, self.stride)
        merged = _merge_bucket(df, self.n_best, self.null_threshold)
        return from_pandas_clean(merged, schema=NBEST_SCHEMA,
                                    preserve_index=False)


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
        from ..functions.hashing import fast_hash64
        b = fast_hash64(batch["example_id"]) % num_buckets
        return batch.append_column("bucket",
                                   pa.array(b.astype(np.int32)))

    return (scored.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: from_pandas_clean(
                            _merge_bucket(g, n_best, null_threshold),
                            schema=NBEST_SCHEMA),
                        batch_format="pandas"))


# ---------------------------------------------------------------------------
# token-level (real-tokenizer) MRC shape — M11 with alignment in the loop
# ---------------------------------------------------------------------------

# reference config/mrc_processor.json: the token-window knobs
TOKEN_MAX_SEQ_LENGTH = 384
TOKEN_DOC_STRIDE = 64
TOKEN_MAX_QUERY_LENGTH = 64
# reference LCS buffer cap (mrc_utils.py:121,156-161): examples whose text
# or token text exceeds it emit ZERO features (the example is dropped)
TOKEN_LCS_CAP = 1024


def sp_tokenize(text: str) -> list[str]:
    """Deterministic SentencePiece-style stand-in tokenizer: whitespace
    words, each carrying the ▁ marker. Its concatenated token text
    normalizes every whitespace RUN to one space — a real normalizing
    tokenizer's distortion, so the char↔token alignment is non-trivial
    (indent/newline chars have no aligned token char and resolve through
    ``convert_index`` interpolation). A real sentencepiece model drops in
    here unchanged."""
    from ..functions.alignment import SPIECE_UNDERLINE
    return [SPIECE_UNDERLINE + w for w in text.split()]


def tokenizer_fn(tokenizer: str):
    """Resolve a tokenizer NAME (cheaply serializable into fused-stage
    kwargs) to a callable: ``standin`` = the whitespace SP stand-in above;
    ``sp`` = the real SentencePiece-style unigram model over the committed
    vocab fixture (``functions/sptokenizer.py`` — lazy singleton, one vocab
    load per worker). The ``sp`` callable tokenizes the RAW context; its
    internal ``preprocess_text(lower=True)`` + whitespace normalization is
    the same composition as the reference's ``tokenizer.tokenize(
    preprocess_text(text, remove_space=True, lower=False))``
    (``mrc_utils.py:130-131``) with an uncased model, since NFKD and
    whitespace collapse are idempotent."""
    if tokenizer == "standin":
        return sp_tokenize
    if tokenizer == "sp":
        from ..functions.sptokenizer import sp_tokenize_real
        return sp_tokenize_real
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def _context_token_maps(context: str, tokenize=None):
    """context → (starts, ends) per-token ORIGINAL char spans via the
    banded-LCS alignment, or None on either reference failure mode (LCS
    buffer cap, <80% match). (``mrc_utils.py:140-244``)."""
    from ..functions.alignment import token_to_orig_maps
    toks = _cap_tokens(context, tokenize)
    if toks is None:
        return None
    maps = token_to_orig_maps(toks, context)
    if maps is None:
        return None
    starts, ends = maps
    return (np.asarray(starts, np.int64), np.asarray(ends, np.int64),
            len(toks))


def _cap_tokens(context: str, tokenize=None):
    """Tokens, or None on the pre-LCS drop conditions (empty / either LCS
    buffer side over the cap — ``mrc_utils.py:121,156-161``)."""
    toks = (tokenize or sp_tokenize)(context)
    if not toks:
        return None
    tok_cat_len = sum(len(t) for t in toks)
    if len(context) > TOKEN_LCS_CAP or tok_cat_len > TOKEN_LCS_CAP:
        return None
    return toks


def standin_token_maps(content: str):
    """PROVEN closed form of the banded-LCS alignment result for the
    STAND-IN tokenizer (the r3 oracle's derivation, now also the pipeline's
    fast path): per word, ``end`` = its last char; ``start`` = the first
    literal space of the preceding whitespace gap if it has one (the DP's
    earliest-match precedence), else ``convert_index`` front-interpolation
    (= the char after the previous word), else 0 for a leading no-space
    gap. Drop modes mirror the DP exactly: empty, either LCS buffer side
    over the cap, or matched chars (word chars + one per space-bearing
    gap) STRICTLY below 0.8·len (the reference bails on ``<`` — exact
    equality is kept; ``mrc_utils.py:216-230``). Equivalence to the DP is
    pinned by ``tests/test_token_mrc.py`` over the corpus grammar and the
    edge layouts. KNOWN LIMIT (disclosed, deliberate): on
    whitespace-pathological layouts where multiple maximum matchings TIE
    — a word short enough that skipping it unlocks surplus gap spaces for
    a later space-less gap's token (needs a ≤2-char word next to a
    multi-space gap followed by a no-space gap; the corpus grammar cannot
    produce it) — the DP's backtrace picks a different optimal matching.
    The closed form DEFINES the stand-in query's semantics (the stand-in
    tokenizer is this repo's construct, not reference behavior); real
    tokenizers always run the DP, which stays load-bearing in the SP
    queries and the reference differential tests."""
    spans = [(m.start(), m.end()) for m in _WORD_RE.finditer(content)]
    if not spans:
        return None
    L = len(content)
    nonws = sum(e - s for s, e in spans)
    K = len(spans)
    if L > TOKEN_LCS_CAP or nonws + K > TOKEN_LCS_CAP:
        return None
    starts = np.empty(K, np.int64)
    ends = np.empty(K, np.int64)
    prev_e = 0
    matched = nonws
    for i, (s, e) in enumerate(spans):
        sp = content.find(" ", prev_e, s)
        if sp >= 0:
            matched += 1
            starts[i] = sp
        elif i > 0:
            starts[i] = prev_e
        else:
            starts[i] = 0
        ends[i] = e - 1
        prev_e = e
    if matched < 0.8 * L:
        return None
    return starts, ends, K


_WORD_RE = re.compile(r"\S+")


def _context_token_maps_batch(contexts: list[str], tokenize=None) -> list:
    """Batched :func:`_context_token_maps`. Stand-in tokenizer inputs
    dispatch to the proven closed form (:func:`standin_token_maps`, ~30×
    the DP's throughput); real tokenizers run one
    :func:`~..functions.alignment.lcs_alignment_fast_batch` call for all
    eligible contexts (the LCS DP is that pipeline's dominant cost;
    batching amortizes its per-diagonal Python overhead across files)."""
    from ..functions.alignment import token_to_orig_maps_batch
    if tokenize is None or tokenize is sp_tokenize:
        return [standin_token_maps(c) for c in contexts]
    results: list = [None] * len(contexts)
    toks_of = [_cap_tokens(c, tokenize) for c in contexts]
    keep = [i for i, t in enumerate(toks_of) if t is not None]
    maps = token_to_orig_maps_batch(
        [(toks_of[i], contexts[i]) for i in keep])
    for i, m in zip(keep, maps):
        if m is not None:
            starts, ends = m
            results[i] = (np.asarray(starts, np.int64),
                          np.asarray(ends, np.int64), len(toks_of[i]))
    return results


def _token_doc_spans(n_tokens: int, max_tokens_for_doc: int,
                     doc_stride: int) -> list[tuple[int, int]]:
    """Reference sliding-window construction (``mrc_utils.py:252-264``)."""
    spans = []
    start = 0
    while start < n_tokens:
        length = min(n_tokens - start, max_tokens_for_doc)
        spans.append((start, length))
        if start + length == n_tokens:
            break
        start += min(length, doc_stride)
    return spans


def _token_feature_rows(example_ids, qtypes, contexts, patterns,
                        n_top: int, max_seq_length: int, doc_stride: int,
                        max_query_length: int,
                        tokenize=None) -> pd.DataFrame:
    """Token-space feature rows: grammar matches stand in for the model's
    span candidates, mapped char→token through the LCS maps; window
    containment, per-window beam rank and max-context ownership all run in
    TOKEN indices (``_check_is_max_context`` over the token position,
    ``mrc_utils.py:80-114``); ``answer_text`` maps token span → original
    chars through the alignment (``context[starts[ts] : ends[te]+1]``) —
    the output that a wrong alignment corrupts."""
    cols = {f.name: [] for f in FEATURE_SCHEMA}
    # one BATCHED LCS pass over the distinct contexts (shared across the 4
    # questions): the DP dominates this featurizer, and the batched kernel
    # amortizes its per-diagonal Python overhead across files
    uniq = list(dict.fromkeys(contexts))
    map_cache: dict[str, object] = dict(
        zip(uniq, _context_token_maps_batch(uniq, tokenize)))
    # the 4 questions are CONSTANT: tokenize each once per batch, not once
    # per example (the per-example call was ~20% of the SP batch cost)
    q_len_of = {qt: len((tokenize or sp_tokenize)(
        QUESTIONS[qt])[:max_query_length]) for qt in QUESTIONS}
    for ex_id, qtype, context in zip(example_ids, qtypes, contexts):
        m = map_cache[context]
        if m is None:
            continue                      # zero features (reference mode)
        starts, ends, n_toks = m
        max_tokens_for_doc = max_seq_length - q_len_of[qtype] - 3
        spans = _token_doc_spans(n_toks, max_tokens_for_doc, doc_stride)

        cands = []                        # (ts, te, text)
        for mt in patterns[qtype].finditer(context):
            g_s, g_e = mt.start(1), mt.end(1)
            ts = int(np.searchsorted(ends, g_s, "left"))
            te = int(np.searchsorted(starts, g_e - 1, "right")) - 1
            if ts > te or ts >= n_toks or te < 0:
                continue
            # the reference STRIPS the recovered span before text dedup
            # (``final_text = paragraph_text[...].strip()``,
            # mrc_utils.py:410) — without it a start token whose aligned
            # char is the preceding gap's space leaks whitespace into the
            # answer
            cands.append((ts, te,
                          context[int(starts[ts]):int(ends[te]) + 1]
                          .strip()))

        def owner_of(pos: int) -> int:
            best, best_w = None, -1
            for w, (s, ln) in enumerate(spans):
                e = s + ln - 1
                if pos < s or pos > e:
                    continue
                score = min(pos - s, e - pos) + 0.01 * ln
                if best is None or score > best:
                    best, best_w = score, w
            return best_w

        for w, (s, ln) in enumerate(spans):
            e = s + ln - 1
            contained = [(ts, te, txt) for (ts, te, txt) in cands
                         if ts >= s and te <= e]
            contained.sort(key=lambda c: (c[0], c[1]))
            cols["example_id"].append(ex_id)
            cols["doc_span_index"].append(w)
            cols["span_start"].append(s)
            cols["cand_start"].append(-1)
            cols["cand_end"].append(-1)
            cols["start_log_prob"].append(-1e4)
            cols["end_log_prob"].append(-1e4)
            cols["cls_logit"].append(-5.0 if contained else 5.0)
            cols["answer_text"].append("")
            for rank, (ts, te, txt) in enumerate(contained[:n_top]):
                if owner_of(ts) != w:
                    continue
                cols["example_id"].append(ex_id)
                cols["doc_span_index"].append(w)
                cols["span_start"].append(s)
                cols["cand_start"].append(ts)
                cols["cand_end"].append(te)
                cols["start_log_prob"].append(-0.1 * rank)
                cols["end_log_prob"].append(-0.05 * rank)
                cols["cls_logit"].append(0.0)
                cols["answer_text"].append(txt)
    return pd.DataFrame(cols)


class MrcTokenScorer:
    """Actor (staged shape): examples → token-space feature rows."""

    def __init__(self, start_n_top: int = 5,
                 max_seq_length: int = TOKEN_MAX_SEQ_LENGTH,
                 doc_stride: int = TOKEN_DOC_STRIDE,
                 max_query_length: int = TOKEN_MAX_QUERY_LENGTH,
                 tokenizer: str = "standin"):
        self.patterns = {t: re.compile(p)
                         for t, p in MENTION_PATTERNS.items()}
        self.n_top = start_n_top
        self.max_seq_length = max_seq_length
        self.doc_stride = doc_stride
        self.max_query_length = max_query_length
        self.tokenize = tokenizer_fn(tokenizer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qtypes = [QTYPE_OF[q] for q in batch["question"].to_pylist()]
        df = _token_feature_rows(batch["example_id"].to_pylist(), qtypes,
                                 batch["context"].to_pylist(),
                                 self.patterns, self.n_top,
                                 self.max_seq_length, self.doc_stride,
                                 self.max_query_length,
                                 tokenize=self.tokenize)
        return from_pandas_clean(df, schema=FEATURE_SCHEMA,
                                 preserve_index=False)


def _token_fused_batch(batch: pa.Table, *, n_top: int, max_seq_length: int,
                       doc_stride: int, max_query_length: int,
                       n_best: int, null_threshold: float | None,
                       tokenizer: str = "standin") -> pa.Table:
    from ..functions.hashing import sha256_hex
    from ..runtime import worker_state
    patterns = worker_state(("mrc_token_pats",),
                            lambda: {t: re.compile(p)
                                     for t, p in MENTION_PATTERNS.items()})
    tokenize = tokenizer_fn(tokenizer)
    ex_ids, qts, ctxs = [], [], []
    for content in batch["content"].to_pylist():
        sha = sha256_hex(content)
        for qtype in QUESTIONS:
            ex_ids.append(f"{sha}:{qtype}")
            qts.append(qtype)
            ctxs.append(content)
    df = _token_feature_rows(ex_ids, qts, ctxs, patterns, n_top,
                             max_seq_length, doc_stride, max_query_length,
                             tokenize=tokenize)
    merged = _merge_bucket(df, n_best, null_threshold) if len(df) else \
        pd.DataFrame({f.name: pd.Series([], dtype=object)
                      for f in NBEST_SCHEMA})
    return from_pandas_clean(merged, schema=NBEST_SCHEMA,
                             preserve_index=False)


def token_mrc_pipeline(corpus_ds, n_top: int = 5,
                       max_seq_length: int = TOKEN_MAX_SEQ_LENGTH,
                       doc_stride: int = TOKEN_DOC_STRIDE,
                       max_query_length: int = TOKEN_MAX_QUERY_LENGTH,
                       n_best: int = 20,
                       null_threshold: float | None = 0.0,
                       mode: str = "fused", tokenizer: str = "standin"):
    """corpus → per-(file × question) n-best rows through the TOKEN-level
    featurizer: real-tokenizer windowing (doc_stride / max_query_length per
    the reference's ``config/mrc_processor.json``), banded-LCS char↔token
    alignment, ``convert_index`` span mapping, and the reference's
    zero-features failure modes (LCS cap, <80% match → example dropped).
    Same fused/staged duality as :func:`mrc_pipeline`, same merge kernel."""
    from ..runtime import pool_size
    kw = {"n_top": n_top, "max_seq_length": max_seq_length,
          "doc_stride": doc_stride, "max_query_length": max_query_length}
    if mode == "fused":
        return corpus_ds.map_batches(
            _token_fused_batch,
            fn_kwargs={**kw, "n_best": n_best,
                       "null_threshold": null_threshold,
                       "tokenizer": tokenizer},
            batch_format="pyarrow")
    examples = corpus_ds.map_batches(build_examples, batch_format="pyarrow")
    scored = examples.map_batches(
        MrcTokenScorer,
        fn_constructor_kwargs={"start_n_top": n_top,
                               "max_seq_length": max_seq_length,
                               "doc_stride": doc_stride,
                               "max_query_length": max_query_length,
                               "tokenizer": tokenizer},
        batch_format="pyarrow", concurrency=(1, pool_size(1.0)))
    return nbest_merge(scored, n_best, null_threshold=null_threshold)


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


def _fused_score_batch(batch: pa.Table, *, max_span: int, stride: int,
                       n_best: int, null_threshold: float | None) -> pa.Table:
    from ..runtime import worker_state
    sc = worker_state(
        ("mrc_fused", max_span, stride, n_best, null_threshold),
        lambda: MrcFusedScorer(max_span=max_span, stride=stride,
                               n_best=n_best, null_threshold=null_threshold))
    return sc(batch)


def mrc_pipeline(corpus_ds, max_span: int = 200, stride: int = 100,
                 n_best: int = 20, null_threshold: float | None = 0.0,
                 mode: str = "fused"):
    """corpus → per-(file × question) n-best entity lists + thresholded
    final answer. ``mode="fused"`` (default) is the single-stage zero-
    shuffle shape; ``mode="staged"`` is the distributed explode → score →
    bucketed-merge shape (identical rows, test-pinned)."""
    from ..runtime import pool_size
    if mode == "fused":
        # warm-worker TASKS, scorer cached once per worker process: the
        # fused state is compiled regexes, and a per-execution actor pool
        # costs ~2-3 s of creation that tasks don't pay (the same
        # measurement behind stages/fused.py dispatch="tasks"). An actor
        # pool is only warranted here for a real heavy encoder.
        return corpus_ds.map_batches(
            _fused_score_batch,
            fn_kwargs={"max_span": max_span, "stride": stride,
                       "n_best": n_best, "null_threshold": null_threshold},
            batch_format="pyarrow")
    examples = corpus_ds.map_batches(build_examples, batch_format="pyarrow")
    scored = examples.map_batches(
        MrcWindowScorer,
        fn_constructor_kwargs={"max_span": max_span, "stride": stride},
        batch_format="pyarrow", concurrency=(1, pool_size(1.0)))
    return nbest_merge(scored, n_best, null_threshold=null_threshold)
