"""Differential test of the prep pipeline against the reference's OWN
segmenter + BIO labeler (``test/files_ner_test/crf_gen_taggers.py``, pure
Python, imported by path).

Scope: WELL-FORMED records — entities inside single sentences, text without
strippable whitespace. On such inputs both implementations must agree on
chunk texts and per-char BIO labels. On boundary-straddling entities the
implementations intentionally DIVERGE: the reference's ``_get_record``
(``crf_gen_taggers.py:62-77``) carries the entity into the NEXT record and
rebases by the new offset, producing negative ``start_pos`` (offset
corruption); our ``rebase_entities`` drops the straddler deterministically —
documented in ``functions/textseg.py``.
"""

import importlib.util
import sys

import numpy as np
import pytest

from knowledgeextraction_ray.functions.bio import spans_to_bio
from knowledgeextraction_ray.functions.textseg import (pack_segments,
                                                       rebase_entities,
                                                       to_sentences)

GEN = "/root/reference/test/files_ner_test/crf_gen_taggers.py"


@pytest.fixture(scope="module")
def ref_segmenter():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location("ref_gen_taggers", GEN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_record(rs, max_len):
    """Random CJK record with entities fully inside sentences."""
    words = ["北京", "上海", "天气", "下雨", "晴天", "数据", "模型"]
    sents = []
    ents = []
    pos = 0
    for _ in range(rs.randint(2, 8)):
        n = rs.randint(2, 6)
        sent = "".join(words[rs.randint(len(words))] for _ in range(n))
        sent += ["。", "，", "！"][rs.randint(3)]
        if rs.rand() < 0.7 and len(sent) > 4:
            s = rs.randint(0, len(sent) - 3)
            e = s + rs.randint(1, min(4, len(sent) - s))
            ents.append({"label_type": ["LOC", "W"][rs.randint(2)],
                         "start_pos": pos + s, "end_pos": pos + e})
        pos += len(sent)
        sents.append(sent)
    return {"originalText": "".join(sents), "entities": ents}


def _ours(record, max_len):
    """Our prep path restated on SENTENCE units (the reference's unit)."""
    text = record["originalText"]
    spans = [(e["label_type"], e["start_pos"], e["end_pos"])
             for e in record["entities"]]
    units = to_sentences(text)
    out = []
    for chunk, off in pack_segments(units, max_len):
        inside = rebase_entities(spans, off, len(chunk))
        out.append((chunk, spans_to_bio(len(chunk), inside)))
    return out


def _theirs(mod, record, max_len):
    mod.max_seq_length = max_len          # module global the method reads
    seg = mod.ExampleSementer(max_len)
    recs = seg.seg_single_exmple(
        {"originalText": record["originalText"],
         "entities": [dict(e) for e in record["entities"]]})
    out = []
    for r in recs:
        labeled = seg.label_single_example(r)
        out.append((labeled["text"], labeled["token_labels"]))
    return out


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_prep_matches_reference_segmenter(ref_segmenter, seed):
    rs = np.random.RandomState(seed)
    for _ in range(40):
        max_len = int(rs.choice([16, 24, 40, 64]))
        rec = _make_record(rs, max_len)
        # skip records where an entity straddles a chunk boundary in either
        # implementation (documented divergence)
        ours = _ours(rec, max_len)
        n_in_chunks = sum(
            len(rebase_entities(
                [(e["label_type"], e["start_pos"], e["end_pos"])
                 for e in rec["entities"]], off, len(c)))
            for c, off in pack_segments(to_sentences(rec["originalText"]),
                                        max_len))
        if n_in_chunks != len(rec["entities"]):
            continue
        theirs = _theirs(ref_segmenter, rec, max_len)
        assert [c for c, _ in ours] == [c for c, _ in theirs]
        assert [l for _, l in ours] == [l for _, l in theirs]
