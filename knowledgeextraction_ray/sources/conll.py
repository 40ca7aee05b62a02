"""CoNLL token-tag file reader/writer (reference S3/S12).

Reference: ``knowledgeextractor/utils/chinese_CONLL.py:202-239`` reads
token-per-line files with blank-line sentence delimiters;
``chinese_CONLL.py:298-318`` and ``eval_estimator.py:31-47`` write the
conlleval 6-field format ``index word _ _ gold pred`` with a blank line
between sequences. Kept for conlleval-parity fixtures; the digit
normalization (``re.sub(r"\\d","0")``, ``chinese_CONLL.py:18``) is applied on
read as in the reference.
"""

from __future__ import annotations

import re

_DIGITS = re.compile(r"\d")


def read_conll_text(text: str, normalize_digits: bool = True):
    """CoNLL text → list of sentences, each a list of (token, tag)."""
    sentences = []
    cur: list[tuple[str, str]] = []
    for line in text.split("\n"):
        line = line.strip()
        if not line:
            if cur:
                sentences.append(cur)
                cur = []
            continue
        parts = line.split()
        tok = parts[0]
        tag = parts[-1] if len(parts) > 1 else "O"
        if normalize_digits:
            tok = _DIGITS.sub("0", tok)
        cur.append((tok, tag))
    if cur:
        sentences.append(cur)
    return sentences


def read_conll_dataset(path: str, normalize_digits: bool = True):
    """file(s) → Dataset of {sent_id, tokens: list, tags: list}.

    Stateful sentence splitting is confined to one file (= one read task),
    so the stage is a pure per-row transform over ``read_text``-style whole
    files — no cross-block carry-over state (reference S4 made row-local)."""
    import ray.data as rd

    def split(batch):
        import pyarrow as pa
        out = {"sent_id": [], "tokens": [], "tags": []}
        for pi, text in enumerate(batch["text"].to_pylist()):
            for si, sent in enumerate(read_conll_text(text,
                                                      normalize_digits)):
                out["sent_id"].append(f"{pi}:{si}")
                out["tokens"].append([t for t, _ in sent])
                out["tags"].append([g for _, g in sent])
        return pa.Table.from_pydict({
            "sent_id": pa.array(out["sent_id"], pa.string()),
            "tokens": pa.array(out["tokens"], pa.list_(pa.string())),
            "tags": pa.array(out["tags"], pa.list_(pa.string())),
        })

    # one row per FILE (each file's sentence structure is self-contained)
    ds = rd.read_binary_files(path)
    ds = ds.map_batches(
        lambda b: {"text": [x.decode("utf-8") for x in b["bytes"]]},
        batch_format="numpy")
    return ds.map_batches(split, batch_format="pyarrow")


def format_conlleval(tokens, gold_tags, pred_tags) -> str:
    """One sequence → conlleval lines ``index word _ _ gold pred``."""
    lines = [f"{i + 1} {tok} _ _ {g} {p}"
             for i, (tok, g, p) in enumerate(zip(tokens, gold_tags,
                                                 pred_tags))]
    return "\n".join(lines) + "\n"


def write_conlleval_file(rows, path: str) -> None:
    """rows of (tokens, gold_tags, pred_tags) → one conlleval file (blank
    line between sequences, ``chinese_CONLL.py:310-318``)."""
    with open(path, "w", encoding="utf-8") as f:
        for (tokens, gold, pred) in rows:
            f.write(format_conlleval(tokens, gold, pred))
            f.write("\n")
