"""BIO tagging primitives (reference M4 + the conlleval chunk rules).

Label style is the reference's SUFFIX convention ``TYPE-B`` / ``TYPE-I`` plus
``O`` (``/root/reference/config/labels``), one label per CHARACTER
(``crf_gen_taggers.py:123-126``; invariant ``len(token_labels)==len(text)``).
"""

from __future__ import annotations


def label_vocab(types) -> list[str]:
    """Deterministic label list: O first, then TYPE-B, TYPE-I per type (the
    reference reads its label file in fixed order, ``crf_utils.py:64-70``)."""
    out = ["O"]
    for t in types:
        out.append(f"{t}-B")
        out.append(f"{t}-I")
    return out


def spans_to_bio(text_len: int, entities) -> list[str]:
    """Char spans → per-char BIO labels (``crf_gen_taggers.py:102-128``).

    The reference initializes all-``O``, then for each entity writes ``TYPE-I``
    over [start, end) and ``TYPE-B`` at start — later entities overwrite
    earlier ones on overlap (nesting collisions are counted but not resolved).
    """
    labels = ["O"] * text_len
    for (label, s, e) in entities:
        s = max(0, s)
        e = min(text_len, e)
        for i in range(s, e):
            labels[i] = f"{label}-I"
        if s < e:
            labels[s] = f"{label}-B"
    return labels


def bio_to_spans(labels) -> list[tuple[str, int, int]]:
    """Per-char BIO labels → half-open char spans, conlleval chunk semantics.

    A chunk starts at ``TYPE-B``, or at ``TYPE-I`` when the previous label is
    not a continuation of the same type (conlleval's begin-of-chunk rule for
    IOB data); it ends before the first label that is not ``TYPE-I`` of the
    same type. This is the inverse of :func:`spans_to_bio` for non-overlapping
    entities, and the chunk extractor used by the conlleval-parity scorer
    (``knowledgeextractor/utils/conlleval`` reimplementation).
    """
    spans: list[tuple[str, int, int]] = []
    cur_type: str | None = None
    cur_start = 0
    for i, lab in enumerate(labels):
        if lab == "O" or lab is None:
            typ, pos = None, None
        elif lab.endswith("-B"):
            typ, pos = lab[:-2], "B"
        elif lab.endswith("-I"):
            typ, pos = lab[:-2], "I"
        else:  # malformed label → treat as O (conlleval tolerates)
            typ, pos = None, None
        if cur_type is not None and (typ != cur_type or pos == "B"):
            spans.append((cur_type, cur_start, i))
            cur_type = None
        if typ is not None and cur_type is None:
            cur_type = typ
            cur_start = i
    if cur_type is not None:
        spans.append((cur_type, cur_start, len(labels)))
    return spans
