"""Training-data prep pipeline (reference §3.2, ``crf_gen_taggers.py`` flow).

raw gold docs {guid, originalText, entities[(label,start,end)]} →

1. **label mapping** (M5/J3): rewrite ``label_type`` through a broadcast
   canonicalization dict (``config/label_map.json`` analog),
2. **segmentation with offset rebase** (M3): pack units ≤ max_payload,
   rebase spans, DROP boundary-straddling spans (``crf_gen_taggers.py:36-41``
   guard, reproduced exactly),
3. **span→BIO labeling** (M4): per-char ``TYPE-B/I`` labels, invariant
   ``len(token_labels) == len(text)`` (``crf_gen_taggers.py:272``),
4. **min-length filter** (M7),
5. **deterministic 90/3/7 split** (T5, ``split_files.py:16-27`` — restated
   as a content-keyed hash split; see :func:`prep_pipeline`).

Each step is a stateless vectorized ``map_batches``; the whole prep is one
streaming pass.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import SegmentConfig
from ..functions.bio import spans_to_bio
from ..functions.textseg import (pack_segments, rebase_entities,
                                 split_lines)

TAGGER_SCHEMA = pa.schema([
    ("guid", pa.string()), ("text", pa.string()),
    ("token_labels", pa.list_(pa.string())),
])


def map_labels(batch: pa.Table, label_map: dict[str, str]) -> pa.Table:
    """M5: entities.label_type ← label_map (identity for unmapped)."""
    ents = batch["entities"].to_pylist()
    mapped = [[{**e, "label_type": label_map.get(e["label_type"],
                                                 e["label_type"])}
               for e in row] for row in ents]
    i = batch.schema.get_field_index("entities")
    return batch.set_column(i, batch.schema.field(i),
                            pa.array(mapped, batch.schema.field(i).type))


def docs_to_tagger_records(batch: pa.Table,
                           cfg: SegmentConfig | None = None,
                           mode: str = "lines") -> pa.Table:
    """M3 + M4 + M7: gold docs → char-BIO tagger records."""
    cfg = cfg or SegmentConfig()
    out = {"guid": [], "text": [], "token_labels": []}
    for guid, text, ents in zip(batch["guid"].to_pylist(),
                                batch["text"].to_pylist()
                                if "text" in batch.schema.names
                                else batch["originalText"].to_pylist(),
                                batch["entities"].to_pylist()):
        spans = [(e["label_type"], e["start_pos"], e["end_pos"])
                 for e in ents]
        units = split_lines(text) if mode == "lines" else [text]
        for si, (chunk, off) in enumerate(
                pack_segments(units, cfg.max_payload)):
            if len(chunk) < cfg.min_sequence_length:
                continue
            inside = rebase_entities(spans, off, len(chunk))
            labels = spans_to_bio(len(chunk), inside)
            assert len(labels) == len(chunk)
            out["guid"].append(f"{guid}:{si}")
            out["text"].append(chunk)
            out["token_labels"].append(labels)
    return pa.Table.from_pydict(out, schema=TAGGER_SCHEMA)


def split_bucket(guid: str) -> int:
    """Deterministic per-record split key in [0, 100): the first 8 hex chars
    of ``md5(guid)`` mod 100. Content-keyed, so the assignment is identical
    no matter how the dataset is sharded or which node evaluates it — and
    exactly restatable in the DuckDB oracle
    (``('0x' || substr(md5(guid), 1, 8))::bigint % 100``)."""
    import hashlib
    return int(hashlib.md5(guid.encode()).hexdigest()[:8], 16) % 100


def _split_filter(lo: int, hi: int):
    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = pa.array([split_bucket(g) for g in batch["guid"].to_pylist()])
        mask = pc.and_(pc.greater_equal(b, lo), pc.less(b, hi))
        return batch.filter(mask)
    return keep


def prep_pipeline(docs_ds, label_map: dict[str, str] | None = None,
                  cfg: SegmentConfig | None = None):
    """gold docs Dataset → (train, dev, test) tagger-record Datasets.

    Split is the reference's 90/3/7 (``split_files.py:16-27``), restated
    Ray-idiomatically: instead of a seeded global ``random_shuffle`` (an
    all-to-all exchange whose permutation depends on block layout — neither
    cluster-stable nor resumable), each record lands in a split by a
    deterministic hash of its guid (:func:`split_bucket` < 90 / < 93 /
    else). Zero shuffle, stable under repartitioning and retries, and the
    expected proportions are the same 90/3/7; training-order shuffling is a
    separate train-time concern (T7/T8, n/a per SURVEY §2.5)."""
    label_map = label_map or {}
    ds = docs_ds.map_batches(lambda b: map_labels(b, label_map),
                             batch_format="pyarrow")
    ds = ds.map_batches(lambda b: docs_to_tagger_records(b, cfg),
                        batch_format="pyarrow")
    train = ds.map_batches(_split_filter(0, 90), batch_format="pyarrow")
    dev = ds.map_batches(_split_filter(90, 93), batch_format="pyarrow")
    test = ds.map_batches(_split_filter(93, 100), batch_format="pyarrow")
    return train, dev, test
