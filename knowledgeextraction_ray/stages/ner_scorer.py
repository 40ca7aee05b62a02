"""Stateful NER scorer actor pool (reference A1/A2 restated on Ray Data).

The reference serves a CRF-ALBERT NER model from a single Tornado process
(``nermodels/crf_albert.py:173-226``): featurize → estimator.predict (ALBERT
encoder → per-token projection → softmax → ARGMAX, ``crf_albert.py:144-145``)
→ recover tags. Here the same flow is an actor-pool ``map_batches`` stage:

- ``__init__`` (once per actor) loads the model — for this sandbox a
  deterministic rule-based char-tagger (no TF/torch in the container); the
  interface (``CharTagModel.logits(ids, mask) → (N, L, K) float32``) is the
  drop-in point for a real ALBERT encoder replica (``num_gpus=1`` per actor).
- ``__call__`` (per batch) featurizes (reference M9 semantics), runs the
  model on the ID TENSORS ONLY, then decodes:
  ``decode="argmax"`` = per-char argmax — the reference's inference decode
  (parity mode); ``decode="viterbi"`` = BIO-constrained Viterbi over the same
  emission scores with the transition structure the reference only uses at
  train time (``crf_albert.py:147-168``) — the north-star decode.

Output column ``tag_ids`` is a per-char ``list<int8>`` trimmed to the payload
length (CLS/SEP/pad stripped, ``crf_processor.py:86-103`` semantics).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..config import ScorerConfig, SegmentConfig
from ..corpus import LABELS, MENTION_PATTERNS
from ..functions.bio import label_vocab
from ..functions.featurize import ID2CHAR, featurize_batch

LABEL_LIST = label_vocab(LABELS)          # ["O", "IMPORT-B", "IMPORT-I", ...]
LABEL2ID = {l: i for i, l in enumerate(LABEL_LIST)}
NUM_LABELS = len(LABEL_LIST)

_CHAR_LUT = np.array([ID2CHAR.get(i, "\x00") for i in range(max(ID2CHAR) + 1)],
                     dtype="<U1")


def ids_to_texts(ids: np.ndarray, seq_len: np.ndarray) -> list[str]:
    """(N, L) id matrix → payload strings (strip CLS, stop at SEP)."""
    chars = _CHAR_LUT[np.clip(ids, 0, len(_CHAR_LUT) - 1)]
    return ["".join(chars[i, 1:1 + seq_len[i]].tolist())
            for i in range(ids.shape[0])]


class RuleCharTagModel:
    """Deterministic stand-in for the ALBERT+projection encoder.

    Emits per-char logits: background score on ``O`` everywhere, confident
    scores on ``TYPE-B``/``TYPE-I`` over every span matched by the compiled
    mention grammar. Consumes only the id tensors the featurizer produced, so
    the scorer stage is shaped exactly like a real model stage.
    """

    def __init__(self):
        self.patterns = [(lab, re.compile(pat))
                         for lab, pat in MENTION_PATTERNS.items()]

    def logits(self, ids: np.ndarray, seq_len: np.ndarray) -> np.ndarray:
        n, L = ids.shape
        out = np.zeros((n, L, NUM_LABELS), dtype=np.float32)
        out[:, :, LABEL2ID["O"]] = 5.0
        texts = ids_to_texts(ids, seq_len)
        for i, text in enumerate(texts):
            for lab, pat in self.patterns:
                b_id = LABEL2ID[f"{lab}-B"]
                i_id = LABEL2ID[f"{lab}-I"]
                for m in pat.finditer(text):
                    s, e = m.span(1)
                    # +1: position 0 is [CLS]
                    out[i, s + 1, b_id] = 10.0
                    if e > s + 1:
                        out[i, s + 2:e + 1, i_id] = 10.0
        return out

    def predict_tags(self, ids: np.ndarray, seq_len: np.ndarray) -> np.ndarray:
        """Fast inference path: per-char argmax tags WITHOUT materializing
        the (N, L, K) logits tensor — exactly ``logits().argmax(axis=2)``
        for this model (parity asserted in tests). A real encoder has no
        such shortcut; the scorer only uses it in ``decode="argmax"``."""
        n, L = ids.shape
        out = np.zeros((n, L), dtype=np.int8)        # 0 == LABEL2ID["O"]
        texts = ids_to_texts(ids, seq_len)
        # descending label order: on (grammar-impossible) overlaps the last
        # write is the LOWEST label id — argmax's tie-break over equal logits
        ordered = sorted(self.patterns, key=lambda lp: LABEL2ID[f"{lp[0]}-B"],
                         reverse=True)
        for i, text in enumerate(texts):
            row = out[i]
            for lab, pat in ordered:
                b_id = LABEL2ID[f"{lab}-B"]
                i_id = LABEL2ID[f"{lab}-I"]
                for m in pat.finditer(text):
                    s, e = m.span(1)
                    row[s + 1] = b_id
                    if e > s + 1:
                        row[s + 2:e + 1] = i_id
        return out


class DenseCharTagModel:
    """Numpy mini-encoder with REAL tensor math behind the same interface —
    the memory/batch-sizing stand-in for the reference's ALBERT encoder
    slot (``nermodels/crf_albert.py:108-170``).

    Per batch: char embedding gather → context window concat → two dense
    tanh layers → per-char logit projection, all fixed-seed random weights
    (≈ ``(2·window+1)·emb·hidden + hidden² + hidden·K`` parameters loaded
    ONCE per actor). Because random weights know no grammar, the bounded
    dense output (|logit| ≤ ``dense_scale`` after tanh) is ADDED to the
    rule model's emissions, whose inter-class margins are ≥ 5 — so argmax
    and Viterbi decode are provably unchanged while every batch pays the
    full (N·L, window·emb)·(window·emb, hidden) matmul cost. Set
    ``rule_bias=False`` for a pure random encoder (load-shape experiments
    only; output is then meaningless by design)."""

    def __init__(self, seed: int = 1234, emb_dim: int = 64,
                 hidden: int = 256, window: int = 2,
                 dense_scale: float = 0.5, rule_bias: bool = True):
        from ..functions.featurize import VOCAB_SIZE
        rs = np.random.RandomState(seed)
        self.window = window
        self.scale = dense_scale
        ctx = 2 * window + 1
        self.emb = rs.standard_normal(
            (VOCAB_SIZE + 4, emb_dim)).astype(np.float32) * 0.1
        self.w1 = rs.standard_normal(
            (ctx * emb_dim, hidden)).astype(np.float32) * 0.05
        self.b1 = np.zeros(hidden, dtype=np.float32)
        self.w2 = rs.standard_normal((hidden, hidden)).astype(np.float32) \
            * 0.05
        self.b2 = np.zeros(hidden, dtype=np.float32)
        self.w3 = rs.standard_normal(
            (hidden, NUM_LABELS)).astype(np.float32) * 0.05
        self.rule = RuleCharTagModel() if rule_bias else None
        # layer-1 folded into the embedding: for each context offset s,
        # x @ W1[s-block] == (E @ W1[s-block])[shifted ids] — gather and a
        # per-position linear map commute exactly, so the (N·L, ctx·D)
        # concat and its matmul collapse into ctx vocab-sized projections
        # computed ONCE here. Halves the per-char flops and removes the
        # gigabyte-class concat temporary the naive form allocates.
        self.proj = [np.ascontiguousarray(
            self.emb @ self.w1[k * emb_dim:(k + 1) * emb_dim])
            for k in range(ctx)]

    def logits(self, ids: np.ndarray, seq_len: np.ndarray) -> np.ndarray:
        n, L = ids.shape
        hidden = self.b1.shape[0]
        clipped = np.clip(ids, 0, len(self.emb) - 1)
        # shifted-id views per context offset (np.roll semantics of the
        # unfolded form: row-internal wrap at the edges)
        shifts = [np.roll(clipped, s, axis=1) for s in
                  range(self.window, -self.window - 1, -1)]
        out = np.empty((n, L, NUM_LABELS), dtype=np.float32)
        # row-chunked forward: bounds peak temporaries to ~chunk·L·hidden
        # floats regardless of block size (a whole-block batch at the naive
        # layout allocated >1 GB and thrashed cache)
        chunk = max(1, (1 << 25) // (L * hidden))      # ~128 MB of float32
        for lo in range(0, n, chunk):
            hi = min(n, lo + chunk)
            m = (hi - lo) * L
            h = self.b1 + self.proj[0][shifts[0][lo:hi]].reshape(m, hidden)
            for s in range(1, len(shifts)):
                h += self.proj[s][shifts[s][lo:hi]].reshape(m, hidden)
            np.tanh(h, out=h)
            h = h @ self.w2
            h += self.b2
            np.tanh(h, out=h)
            z = np.tanh(h @ self.w3) * self.scale
            out[lo:hi] = z.reshape(hi - lo, L, NUM_LABELS)
        if self.rule is not None:
            out += self.rule.logits(ids, seq_len)
        return out


def build_model(cfg: "ScorerConfig"):
    if cfg.model == "dense":
        return DenseCharTagModel()
    return RuleCharTagModel()


def bio_transitions() -> np.ndarray:
    """(K, K) transition scores: 0 for BIO-legal moves, -1e4 otherwise.

    ``TYPE-I`` may only follow ``TYPE-B`` or ``TYPE-I`` of the same type —
    the constraint a trained CRF transitions matrix encodes
    (``crf_albert.py:147-168``)."""
    t = np.zeros((NUM_LABELS, NUM_LABELS), dtype=np.float32)
    for j, lab in enumerate(LABEL_LIST):
        if lab.endswith("-I"):
            typ = lab[:-2]
            for i, prev in enumerate(LABEL_LIST):
                if prev[:-2] != typ or prev == "O":
                    t[i, j] = -1e4
    return t


def viterbi_decode_ref(logits: np.ndarray, seq_len: np.ndarray,
                       transitions: np.ndarray) -> np.ndarray:
    """Per-row reference Viterbi (the readable scalar DP). Kept as the
    parity pin for the batch-vectorized :func:`viterbi_decode`."""
    n, L, K = logits.shape
    tags = np.zeros((n, L), dtype=np.int8)
    for i in range(n):
        Lr = int(seq_len[i]) + 2
        s = logits[i, 0, :].copy()
        bk = np.zeros((Lr, K), dtype=np.int8)
        for t in range(1, Lr):
            cand = s[:, None] + transitions
            bk[t] = cand.argmax(axis=0)
            s = cand.max(axis=0) + logits[i, t, :]
        cur = int(s.argmax())
        seq = [cur]
        for t in range(Lr - 1, 0, -1):
            cur = int(bk[t, cur])
            seq.append(cur)
        tags[i, :Lr] = seq[::-1]
    return tags


def viterbi_decode(logits: np.ndarray, seq_len: np.ndarray,
                   transitions: np.ndarray) -> np.ndarray:
    """First-order Viterbi over (N, L, K) emissions → (N, L) tags,
    vectorized over the BATCH: the DP walks time once (≤ L Python steps),
    each step an (N, K, K) broadcast max, instead of a Python loop per row
    (N·L scalar steps — the dominant cost of ``decode="viterbi"`` on large
    blocks). Rows stop updating at their own real length (payload +
    CLS/SEP), so padding never influences a path; ≡ ``viterbi_decode_ref``
    (test-pinned), which itself is ≡ argmax for margin-dominated emissions
    (the flagship invariant)."""
    n, L, K = logits.shape
    if n == 0:
        return np.zeros((n, L), dtype=np.int8)
    lens = np.minimum(seq_len.astype(np.int64) + 2, L)
    Lmax = int(lens.max())
    s = logits[:, 0, :].astype(np.float32).copy()      # (N, K) path scores
    bk = np.zeros((n, Lmax, K), dtype=np.int8)         # back-pointers
    trans = transitions[None, :, :]                    # (1, K, K)
    for t in range(1, Lmax):
        cand = s[:, :, None] + trans                   # (N, K, K)
        bk[:, t] = cand.argmax(axis=1)
        ns = cand.max(axis=1) + logits[:, t, :]
        active = (t < lens)[:, None]
        s = np.where(active, ns, s)
    tags = np.zeros((n, L), dtype=np.int8)
    cur = s.argmax(axis=1)                             # (N,) final states
    rows = np.arange(n)
    for t in range(Lmax - 1, -1, -1):
        at_end = lens - 1 == t
        inside = t < lens - 1
        if at_end.any():
            tags[at_end, t] = cur[at_end]
        if inside.any():
            prev = bk[rows, t + 1, cur]
            cur = np.where(inside, prev, cur)
            tags[inside, t] = cur[inside]
    return tags


class NerScorer:
    """Actor-pool callable: segment batch → segment batch + ``tag_ids``.

    Use as ``ds.map_batches(NerScorer, concurrency=N, batch_size=B,
    batch_format="pyarrow")`` — construction cost (model load, regex compile,
    transition build) is paid once per actor (SURVEY.md A1).
    """

    def __init__(self, scorer_cfg: ScorerConfig | None = None,
                 segment_cfg: SegmentConfig | None = None,
                 transitions=None):
        self.cfg = scorer_cfg or ScorerConfig()
        self.seg = segment_cfg or SegmentConfig()
        self.model = build_model(self.cfg)
        # transitions override: deploy a LEARNED matrix (stages/crf_train)
        # instead of the hand-coded BIO constraints — the reference's
        # train → serve cycle (trained transition_params feed
        # crf_decode at inference, crf_albert.py:147-168)
        self.transitions = np.asarray(transitions, dtype=np.float32) \
            if transitions is not None else bio_transitions()

    def _decode(self, logits: np.ndarray, seq_len: np.ndarray) -> np.ndarray:
        if self.cfg.decode == "viterbi":
            return viterbi_decode(logits, seq_len, self.transitions)
        return logits.argmax(axis=2).astype(np.int8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids, mask, seq_len = featurize_batch(texts, self.seg.max_seq_length)
        if self.cfg.decode == "argmax" and \
                hasattr(self.model, "predict_tags"):
            # fast path: tags without the dense logits tensor (≡ argmax)
            tags = self.model.predict_tags(ids, seq_len)
        else:
            logits = self.model.logits(ids, seq_len)
            tags = self._decode(logits, seq_len)
        # strip CLS / cut at payload end (M10 semantics) → ragged list column
        trimmed = [tags[i, 1:1 + seq_len[i]] for i in range(len(texts))]
        col = pa.array([t.tolist() for t in trimmed], type=pa.list_(pa.int8()))
        return batch.append_column("tag_ids", col)


def featurize_dataset(ds, segment_cfg: SegmentConfig | None = None):
    """Explicit featurizer stage (reference M9 as a Dataset transform):
    segment rows → + ``input_ids``/``input_mask`` ``list<int32>`` columns.

    The flagship fuses featurization into the scorer actor (the feature
    tensors never hit the object store); this staged form exists for
    pipelines that checkpoint features (the reference's TFRecord cache
    S6/S16 analog) or feed an external trainer."""
    seg = segment_cfg or SegmentConfig()

    def feat(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids, mask, seq_len = featurize_batch(texts, seg.max_seq_length)
        batch = batch.append_column(
            "input_ids", pa.array(ids.tolist(),
                                  pa.list_(pa.int32(), seg.max_seq_length)))
        batch = batch.append_column(
            "input_mask", pa.array(mask.tolist(),
                                   pa.list_(pa.int32(), seg.max_seq_length)))
        return batch.append_column("seq_len",
                                   pa.array(seq_len, pa.int32()))
    return ds.map_batches(feat, batch_format="pyarrow")


def score_dataset(ds, scorer_cfg: ScorerConfig | None = None,
                  segment_cfg: SegmentConfig | None = None,
                  transitions=None):
    cfg = scorer_cfg or ScorerConfig()
    # autoscaling pool (1, N): never pre-reserves every CPU — a fixed-size
    # pool that exactly matches the session CPUs starves the read/write
    # stages and deadlocks the streaming executor. N sized from the live
    # cluster unless the config pins it.
    from ..runtime import pool_size
    n = cfg.concurrency if cfg.concurrency else pool_size(1.0)
    kwargs = {"scorer_cfg": cfg, "segment_cfg": segment_cfg}
    if transitions is not None:
        # learned matrix (tiny, ships in the ctor args to every actor)
        kwargs["transitions"] = np.asarray(transitions,
                                           dtype=np.float32).tolist()
    return ds.map_batches(
        NerScorer,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=(1, n),
        num_cpus=cfg.num_cpus,
    )
