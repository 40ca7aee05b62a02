"""Property-based tests (hypothesis) for the core pure functions."""

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgeextraction_ray.functions.bio import bio_to_spans, spans_to_bio
from knowledgeextraction_ray.functions.featurize import (featurize_text,
                                                         recover_text)
from knowledgeextraction_ray.functions.textseg import (pack_segments,
                                                       split_lines)


@st.composite
def non_overlapping_spans(draw):
    """Sorted, non-adjacent, non-overlapping labeled spans in [0, n)."""
    n = draw(st.integers(min_value=1, max_value=60))
    spans = []
    pos = 0
    while pos < n - 1:
        start = draw(st.integers(min_value=pos, max_value=n - 1))
        end = draw(st.integers(min_value=start + 1, max_value=n))
        label = draw(st.sampled_from(["A", "B", "C"]))
        spans.append((label, start, end))
        pos = end + 1          # gap ≥1 so chunks never merge/abut ambiguously
        if draw(st.booleans()):
            break
    return n, spans


@settings(max_examples=200, deadline=None, derandomize=True)
@given(non_overlapping_spans())
def test_bio_roundtrip_property(case):
    n, spans = case
    labels = spans_to_bio(n, spans)
    assert len(labels) == n
    assert bio_to_spans(labels) == spans


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=500),
       st.integers(min_value=8, max_value=64))
def test_featurize_roundtrip_property(text, max_len):
    ids, mask = featurize_text(text, max_len)
    assert recover_text(ids) == text[:max_len - 2]
    assert mask.sum() == min(len(text), max_len - 2) + 2


@settings(max_examples=100, deadline=None, derandomize=True)
@given(st.text(alphabet=st.sampled_from("ab\n x"), max_size=300),
       st.integers(min_value=4, max_value=50))
def test_segmentation_covers_text_property(text, max_payload):
    units = split_lines(text)
    assert "".join(units) == text
    chunks = pack_segments(units, max_payload)
    # chunks tile the text exactly: concatenation reproduces it and offsets
    # are consistent
    rebuilt = "".join(c for c, _ in chunks)
    assert rebuilt == text
    for c, off in chunks:
        assert text[off:off + len(c)] == c
        assert len(c) <= max_payload or len(c.rstrip("\n")) <= max_payload
