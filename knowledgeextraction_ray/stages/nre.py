"""NRE — relation extraction over mention pairs (reference A4/M12).

Reference flow (``nremodels/albert_encoder.py:49-119``, ``models.py:20-81``):
a record carries a sentence plus head/tail entity char spans; the tokenizer
wraps the entities in reserved marker tokens ``[unused0..3]`` recording the
marker positions, and a SoftmaxNN head scores relation labels.

Here:

- **pair generation** is a per-segment transform: each CALL mention is paired
  with the nearest preceding FUNC mention in the same segment (the enclosing
  ``def``) — deterministic, row-local.
- **entity-marker featurization** (M12 parity): char ids with marker ids
  spliced around head/tail spans, pos1/pos2 marker indices, pad/truncate to
  ``max_length``, attention mask.
- **scoring** is an actor pool consuming the marked id tensors; the
  deterministic stand-in head emits (relation, score) with score derived
  from a stable hash of the marked sequence — the drop-in point for a real
  OpenNRE-style encoder head.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.bio import bio_to_spans
from ..functions.featurize import CHAR2ID, PAD_ID, UNK_ID, VOCAB_SIZE
from .ner_scorer import LABEL_LIST

# reserved marker ids appended after the char vocab ([unused0..3] analog)
HEAD_OPEN, HEAD_CLOSE, TAIL_OPEN, TAIL_CLOSE = (
    VOCAB_SIZE, VOCAB_SIZE + 1, VOCAB_SIZE + 2, VOCAB_SIZE + 3)

PAIR_SCHEMA = pa.schema([
    ("guid", pa.string()), ("repo", pa.string()), ("path", pa.string()),
    ("text", pa.string()),
    ("head_surface", pa.string()), ("tail_surface", pa.string()),
    ("h_start", pa.int32()), ("h_end", pa.int32()),
    ("t_start", pa.int32()), ("t_end", pa.int32()),
])


def build_pairs(batch: pa.Table) -> pa.Table:
    """scored segments (text + tag_ids) → (head=def, tail=call) pair rows."""
    out = {name: [] for name in PAIR_SCHEMA.names}
    for guid, repo, path, text, tag_ids in zip(
            batch["guid"].to_pylist(), batch["repo"].to_pylist(),
            batch["path"].to_pylist(), batch["text"].to_pylist(),
            batch["tag_ids"].to_pylist()):
        labels = [LABEL_LIST[t] for t in tag_ids]
        spans = bio_to_spans(labels)
        cur_head = None
        for (typ, s, e) in spans:
            if typ == "FUNC":
                cur_head = (s, e)
            elif typ == "CALL" and cur_head is not None:
                out["guid"].append(guid)
                out["repo"].append(repo)
                out["path"].append(path)
                out["text"].append(text)
                out["head_surface"].append(text[cur_head[0]:cur_head[1]])
                out["tail_surface"].append(text[s:e])
                out["h_start"].append(cur_head[0])
                out["h_end"].append(cur_head[1])
                out["t_start"].append(s)
                out["t_end"].append(e)
    return pa.Table.from_pydict(out, schema=PAIR_SCHEMA)


def marker_featurize(text: str, h: tuple[int, int], t: tuple[int, int],
                     max_length: int = 128):
    """M12 parity: splice [unusedN] markers around head/tail spans.

    Returns (ids, mask, pos1, pos2); pos1/pos2 are the positions of the
    head-open / tail-open markers (or the last index when truncated away,
    mirroring the reference's clamp)."""
    events = sorted([(h[0], HEAD_OPEN), (h[1], HEAD_CLOSE),
                     (t[0], TAIL_OPEN), (t[1], TAIL_CLOSE)],
                    key=lambda x: (x[0], x[1]))
    ids: list[int] = []
    pos1 = pos2 = None
    cursor = 0
    for offset, marker in events:
        for ch in text[cursor:offset]:
            ids.append(CHAR2ID.get(ch, UNK_ID))
        if marker == HEAD_OPEN:
            pos1 = len(ids)
        if marker == TAIL_OPEN:
            pos2 = len(ids)
        ids.append(marker)
        cursor = offset
    for ch in text[cursor:]:
        ids.append(CHAR2ID.get(ch, UNK_ID))
    ids = ids[:max_length]
    mask = [1] * len(ids) + [0] * (max_length - len(ids))
    ids = ids + [PAD_ID] * (max_length - len(ids))
    clamp = max_length - 1
    return (np.array(ids, dtype=np.int32), np.array(mask, dtype=np.int32),
            min(pos1 if pos1 is not None else clamp, clamp),
            min(pos2 if pos2 is not None else clamp, clamp))


class NreScorer:
    """Actor: marked-id tensors → (relation, score).

    Deterministic head: relation 'calls' for (FUNC→CALL) pairs; the
    stand-in instance score is md5-derived from the INSTANCE IDENTITY
    (guid | head | tail | h_start | t_start) — the same scheme as the bag
    pipeline's ``file_pair_scores``, so the whole query is exactly
    reproducible by the DuckDB oracle. ``score_e4`` is the scaled-int form
    (the oracle-gate column); ``score = score_e4 / 1e4`` ∈ [0.5, 1.0).
    The marker featurization still runs per instance (pos1/pos2 are real
    outputs and the id/mask tensors are the drop-in seam for a real
    encoder+SoftmaxNN head; ``nremodels/models.py:20-81``)."""

    def __init__(self, max_length: int = 128):
        self.max_length = max_length

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        guids = batch["guid"].to_pylist() if "guid" in batch.schema.names \
            else [""] * len(batch)
        rels, e4s, p1s, p2s = [], [], [], []
        for guid, text, head, tail, hs, he, ts, te in zip(
                guids, batch["text"].to_pylist(),
                batch["head_surface"].to_pylist(),
                batch["tail_surface"].to_pylist(),
                batch["h_start"].to_pylist(), batch["h_end"].to_pylist(),
                batch["t_start"].to_pylist(), batch["t_end"].to_pylist()):
            ids, mask, pos1, pos2 = marker_featurize(
                text, (hs, he), (ts, te), self.max_length)
            key = f"{guid}|{head}|{tail}|{hs}|{ts}"
            h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
            rels.append("calls")
            e4s.append(5000 + h % 5000)
            p1s.append(pos1)
            p2s.append(pos2)
        e4 = np.array(e4s, dtype=np.int64)
        batch = batch.drop_columns(["text", "h_start", "h_end", "t_start",
                                    "t_end"])
        batch = batch.append_column("relation", pa.array(rels, pa.string()))
        batch = batch.append_column("score_e4", pa.array(e4, pa.int64()))
        batch = batch.append_column("score",
                                    pa.array(e4 / 1e4, pa.float64()))
        batch = batch.append_column("pos1", pa.array(p1s, pa.int32()))
        batch = batch.append_column("pos2", pa.array(p2s, pa.int32()))
        return batch


def nre_pipeline(scored_segments):
    """scored NER segments → relation-scored (head, tail) pairs."""
    pairs = scored_segments.map_batches(build_pairs, batch_format="pyarrow")
    from ..runtime import pool_size
    return pairs.map_batches(NreScorer, batch_format="pyarrow",
                             concurrency=(1, pool_size(0.5)))


# ---------------------------------------------------------------------------
# bag-level aggregation (reference BagAttention, nremodels/models.py:40-81)
# ---------------------------------------------------------------------------

# one scan, matches in document order: group 1 = a def (new head),
# group 2 = a call paired with the current head
_PAIR_SCAN_RE = re.compile(
    r"def ([A-Za-z_][A-Za-z0-9_]*)\(|= ([A-Za-z_][A-Za-z0-9_]*)\(")


def file_pair_scores(batch: pa.Table) -> pa.Table:
    """corpus batch → FILE-scope (head, tail) pair instances with a
    deterministic stand-in instance score.

    The reference's bag model scores every sentence INSTANCE of an entity
    pair, then aggregates per bag; here the instance score is md5-derived
    from the instance identity (file, pair, within-file ordinal) so the
    whole bag pipeline is exactly reproducible by the DuckDB oracle — the
    drop-in point for a real per-instance encoder score. Pairing is the
    nearest preceding ``def`` in the file (one compiled-regex scan)."""
    import hashlib
    out_r, out_p, out_h, out_t, out_e4 = [], [], [], [], []
    for repo, path, content in zip(batch["repo"].to_pylist(),
                                   batch["path"].to_pylist(),
                                   batch["content"].to_pylist()):
        head = None
        ordinals: dict[tuple, int] = {}
        for m in _PAIR_SCAN_RE.finditer(content):
            d = m.group(1)
            if d is not None:
                head = d
                continue
            if head is None:
                continue
            tail = m.group(2)
            k = (head, tail)
            n = ordinals.get(k, 0) + 1
            ordinals[k] = n
            key = f"{repo}|{path}|{head}|{tail}|{n}"
            h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
            out_r.append(repo)
            out_p.append(path)
            out_h.append(head)
            out_t.append(tail)
            out_e4.append(5000 + h % 5000)       # score in [0.5, 1.0), e4
    subj = [f"{r}:{p}" for r, p in zip(out_r, out_p)]
    e4 = np.array(out_e4, dtype=np.int64)
    return pa.Table.from_pydict({
        "head_surface": pa.array(out_h, pa.string()),
        "tail_surface": pa.array(out_t, pa.string()),
        "subj": pa.array(subj, pa.string()),
        "score_e4": pa.array(e4, pa.int64()),
        "score_sq_e8": pa.array(e4 * e4, pa.int64()),
    })


def nre_bag_pipeline(corpus_ds, num_buckets: int = 64):
    """corpus → per-(head, tail) BAG table: instance/file counts, summed
    scaled-int instance scores, and the attention-weighted analog bag score
    (score-weighted mean of instance scores, the stand-in for the
    reference's attention-softmax over instance logits,
    ``nremodels/models.py:40-81``).

    The bag groupby is the distributed aggregate the reference's in-process
    BagAttention becomes at corpus scale: per-batch instance extraction (no
    shuffle) → one bucketed exchange on the (head, tail) bag key."""
    from .groupagg import bucketed_agg
    pairs = corpus_ds.map_batches(file_pair_scores, batch_format="pyarrow",
                                  batch_size=None)
    agg = bucketed_agg(pairs, ["head_surface", "tail_surface"],
                       {"n_files": ("subj", "nunique"),
                        "sum_score_e4": ("score_e4", "sum"),
                        "sum_score_sq_e8": ("score_sq_e8", "sum")},
                       num_buckets=num_buckets, count_alias="n_instances")

    def finalize(batch: pa.Table) -> pa.Table:
        s1 = batch["sum_score_e4"].to_numpy().astype(np.float64)
        s2 = batch["sum_score_sq_e8"].to_numpy().astype(np.float64)
        # half-away 6dp round, matching DuckDB round() (scores positive)
        bag = np.floor(s2 / s1 / 1e4 * 1e6 + 0.5) / 1e6
        return pa.Table.from_pydict({
            "head_surface": batch["head_surface"],
            "tail_surface": batch["tail_surface"],
            "relation": pa.array(["calls"] * len(batch), pa.string()),
            "n_instances": pc.cast(batch["n_instances"], pa.int64()),
            "n_files": pc.cast(batch["n_files"], pa.int64()),
            "sum_score_e4": batch["sum_score_e4"],
            "bag_score": pa.array(bag, pa.float64()),
        })
    return agg.map_batches(finalize, batch_format="pyarrow")
