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
5. **seeded shuffle + 90/3/7 split** (T5, ``split_files.py:16-27``).

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


def prep_pipeline(docs_ds, label_map: dict[str, str] | None = None,
                  cfg: SegmentConfig | None = None, seed: int = 12345):
    """gold docs Dataset → (train, dev, test) tagger-record Datasets.

    Split is the reference's 90/3/7 after a seeded shuffle
    (``split_files.py:16-27``)."""
    label_map = label_map or {}
    ds = docs_ds.map_batches(lambda b: map_labels(b, label_map),
                             batch_format="pyarrow")
    ds = ds.map_batches(lambda b: docs_to_tagger_records(b, cfg),
                        batch_format="pyarrow")
    shuffled = ds.random_shuffle(seed=seed)
    try:
        train, dev, test = shuffled.split_proportionately([0.90, 0.03])
    except ValueError:
        # dataset too small for non-empty 90/3/7 splits → everything train
        train, dev, test = shuffled, shuffled.limit(0), shuffled.limit(0)
    return train, dev, test
