"""JSONL readers (reference S1/S5) with the reference's robustness quirks.

- ``scrub_json_line`` (M6): slice from the first ``{`` to the last ``}``
  before parsing (``crf_gen_taggers.py:141-144``) — tolerates trailing
  commas / BOM junk.
- ``read_examples``: JSONL → {guid, text, entities?} rows; guid from
  ``(set_type, row_index)`` as in ``crf_processor.py:54`` when absent.
- ``read_squad_style``: one line = context + nested ``qas[]`` → FLATTENED
  (example per qa) rows (``mrc_utils.py:467-526``) — a flat_map-shaped
  explode expressed in ``map_batches``.
"""

from __future__ import annotations

import json

import pyarrow as pa


def scrub_json_line(line: str) -> str | None:
    lo = line.find("{")
    hi = line.rfind("}")
    if lo < 0 or hi < lo:
        return None
    return line[lo:hi + 1]


def parse_example_lines(lines, set_type: str = "test"):
    """→ rows {guid, text, entities:[(label,start,end)]}; skips unparsable
    lines (the reference's try/except swallow)."""
    rows = []
    for i, line in enumerate(lines):
        s = scrub_json_line(line)
        if s is None:
            continue
        try:
            obj = json.loads(s)
        except json.JSONDecodeError:
            continue
        text = obj.get("originalText") or obj.get("text") or ""
        ents = [(e["label_type"], int(e["start_pos"]), int(e["end_pos"]))
                for e in obj.get("entities", [])]
        rows.append({"guid": obj.get("guid", f"{set_type}-{i}"),
                     "text": text, "entities": ents})
    return rows


_ENT_TYPE = pa.list_(pa.struct([("label_type", pa.string()),
                                ("start_pos", pa.int32()),
                                ("end_pos", pa.int32())]))


def examples_to_table(rows) -> pa.Table:
    return pa.Table.from_pydict({
        "guid": pa.array([r["guid"] for r in rows], pa.string()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "entities": pa.array(
            [[{"label_type": t, "start_pos": s, "end_pos": e}
              for (t, s, e) in r["entities"]] for r in rows], _ENT_TYPE),
    })


def read_examples_dataset(path: str, set_type: str = "test"):
    """JSONL file(s) → Dataset of example rows."""
    import ray.data as rd
    ds = rd.read_text(path)
    return ds.map_batches(
        lambda b: examples_to_table(parse_example_lines(b["text"], set_type)),
        batch_format="numpy")


def parse_squad_lines(lines):
    """SQuAD-style JSONL → flattened qa rows (S5 explode)."""
    rows = []
    for line in lines:
        s = scrub_json_line(line)
        if s is None:
            continue
        try:
            obj = json.loads(s)
        except json.JSONDecodeError:
            continue
        context = obj.get("context", "")
        for qa in obj.get("qas", []):
            answers = qa.get("answers", [])
            rows.append({
                "qas_id": qa.get("id", ""),
                "question": qa.get("question", ""),
                "context": context,
                "is_impossible": bool(qa.get("is_impossible", False)),
                "answer_text": answers[0]["text"] if answers else "",
                "answer_start": int(answers[0]["answer_start"])
                if answers else -1,
            })
    return rows


def read_squad_dataset(path: str):
    import ray.data as rd
    ds = rd.read_text(path)
    return ds.map_batches(
        lambda b: pa.Table.from_pylist(parse_squad_lines(b["text"])),
        batch_format="numpy")
