"""Unit tests for the pure-function layer (segmentation, BIO, featurizer,
conlleval) against hand-computed goldens — the rebuild analog of the
reference's inline __main__ smoke tests (SURVEY.md §5)."""

import numpy as np

from knowledgeextraction_ray.functions.bio import (bio_to_spans, label_vocab,
                                                   spans_to_bio)
from knowledgeextraction_ray.functions.conlleval import ChunkCounts
from knowledgeextraction_ray.functions.featurize import (CLS_ID, SEP_ID,
                                                         featurize_batch,
                                                         featurize_text,
                                                         recover_text)
from knowledgeextraction_ray.functions.hashing import (partition_id_for,
                                                       sha256_hex,
                                                       stable_hash64)
from knowledgeextraction_ray.functions.textseg import (merge_quoted,
                                                       pack_segments,
                                                       rebase_entities,
                                                       segment_text,
                                                       split_lines,
                                                       split_sentences)


def test_split_lines_roundtrip():
    text = "import a\ndef f():\n    pass\n"
    units = split_lines(text)
    assert "".join(units) == text
    assert units == ["import a\n", "def f():\n", "    pass\n"]


def test_split_lines_no_trailing_newline():
    text = "a\nb"
    assert "".join(split_lines(text)) == text


def test_split_sentences_reattaches_delimiter():
    # reference semantics: delimiter stays with the preceding fragment
    units = split_sentences("今天天气好。明天下雨，记得带伞！")
    assert units == ["今天天气好。", "明天下雨，", "记得带伞！"]
    assert "".join(units) == "今天天气好。明天下雨，记得带伞！"


def test_merge_quoted():
    units = ["他说：“你好，", "世界”。", "再见。"]
    merged = merge_quoted(units)
    assert merged == ["他说：“你好，世界”。", "再见。"]


def test_pack_segments_greedy_and_offsets():
    units = ["aaaa", "bbbb", "cccc", "dd"]
    chunks = pack_segments(units, max_payload=8)
    assert chunks == [("aaaabbbb", 0), ("ccccdd", 8)]


def test_pack_segments_long_unit_hard_split():
    chunks = pack_segments(["x" * 10], max_payload=4)
    assert chunks == [("xxxx", 0), ("xxxx", 4), ("xx", 8)]


def test_rebase_entities_drops_straddlers():
    # entity [3, 6) straddles a chunk boundary at 4 → dropped (the
    # reference's crf_gen_taggers.py:36-41 guard)
    ents = [("T", 0, 2), ("T", 3, 6), ("T", 5, 7)]
    inside = rebase_entities(ents, offset=4, chunk_len=4)
    assert inside == [("T", 1, 3)]
    first = rebase_entities(ents, offset=0, chunk_len=4)
    assert first == [("T", 0, 2)]


def test_segment_text_min_length_filter():
    segs = segment_text("ab\nlonger line here\n", max_payload=100, min_len=4)
    assert segs == [("ab\nlonger line here\n", 0)]
    segs2 = segment_text("ab\n", max_payload=100, min_len=4)
    assert segs2 == []


def test_spans_to_bio_and_inverse():
    text_len = 10
    ents = [("FUNC", 2, 5), ("CALL", 7, 9)]
    labels = spans_to_bio(text_len, ents)
    assert labels == ["O", "O", "FUNC-B", "FUNC-I", "FUNC-I", "O", "O",
                      "CALL-B", "CALL-I", "O"]
    assert bio_to_spans(labels) == ents


def test_spans_to_bio_overlap_last_wins():
    labels = spans_to_bio(6, [("A", 0, 4), ("B", 2, 5)])
    assert labels == ["A-B", "A-I", "B-B", "B-I", "B-I", "O"]


def test_bio_to_spans_orphan_I_starts_chunk():
    # conlleval rule: I after O (or after a different type) begins a chunk
    assert bio_to_spans(["O", "A-I", "A-I", "B-I"]) == [("A", 1, 3),
                                                        ("B", 3, 4)]


def test_bio_to_spans_adjacent_B():
    assert bio_to_spans(["A-B", "A-B", "A-I"]) == [("A", 0, 1), ("A", 1, 3)]


def test_label_vocab_deterministic():
    v = label_vocab(("X", "Y"))
    assert v == ["O", "X-B", "X-I", "Y-B", "Y-I"]


def test_featurize_roundtrip():
    text = "def foo(a):"
    ids, mask = featurize_text(text, 32)
    assert ids[0] == CLS_ID
    assert ids[len(text) + 1] == SEP_ID
    assert mask.sum() == len(text) + 2
    assert recover_text(ids) == text


def test_featurize_truncation():
    text = "x" * 100
    ids, mask = featurize_text(text, 16)
    assert recover_text(ids) == "x" * 14  # max_seq_length - 2
    assert mask.sum() == 16


def test_featurize_batch_shapes():
    ids, mask, seq_len = featurize_batch(["ab", "cdef"], 8)
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    assert list(seq_len) == [2, 4]


def test_featurize_oov_is_unk():
    from knowledgeextraction_ray.functions.featurize import SEP_ID, UNK_ID
    ids, _ = featurize_text("中", 8)
    # one char -> exactly one UNK id (per code point, never per utf-8 byte)
    assert ids[1] == UNK_ID and ids[2] == SEP_ID


def test_featurize_non_ascii_char_alignment():
    """ids index == char index for mixed CJK/ASCII text (upstream domain is
    Chinese NER); byte-level tokenization would shift every position after a
    multibyte char and crash on long CJK payloads."""
    from knowledgeextraction_ray.functions.featurize import UNK_ID
    text = "名a称b"
    ids, mask = featurize_text(text, 16)
    assert mask.sum() == len(text) + 2
    assert ids[1] == UNK_ID          # 名
    assert recover_text(ids)[1] == "a"
    assert ids[3] == UNK_ID          # 称
    assert recover_text(ids)[3] == "b"
    # long CJK payload must truncate by chars, not overflow the buffer
    long_cjk = "中" * 480
    ids2, mask2 = featurize_text(long_cjk, 384)
    assert mask2.sum() == 384
    ids3, mask3, seq_len = featurize_batch([long_cjk, text], 384)
    assert seq_len[0] == 382 and seq_len[1] == len(text)
    # non-BMP (surrogate-pair in utf-16) still one position per code point
    ids4, mask4 = featurize_text("a😀b", 8)
    assert mask4.sum() == 5


def test_sha256_and_partition_stability():
    assert sha256_hex("abc") == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    h = stable_hash64(["abc", "abc", "xyz"])
    assert h[0] == h[1] != h[2]
    p = partition_id_for(["a", "b", "c"], 4)
    assert ((p >= 0) & (p < 4)).all()


def test_conlleval_counts_and_merge():
    gold = ["O", "A-B", "A-I", "O", "B-B"]
    pred_perfect = list(gold)
    pred_boundary_off = ["O", "A-B", "O", "O", "B-B"]   # A chunk too short
    c1 = ChunkCounts()
    c1.update(gold, pred_perfect)
    assert c1.metrics()["f1"] == 1.0
    c2 = ChunkCounts()
    c2.update(gold, pred_boundary_off)
    m = c2.metrics()
    assert m["correct_chunks"] == 1 and m["gold_chunks"] == 2
    merged = c1.merge(c2)
    assert merged.gold_chunks == 4 and merged.correct_chunks == 3


def test_conlleval_type_off_and_split_chunk():
    gold = ["A-B", "A-I", "A-I", "O"]
    c = ChunkCounts()
    c.update(gold, ["B-B", "B-I", "B-I", "O"])       # type-off: no credit
    assert c.metrics()["correct_chunks"] == 0
    c2 = ChunkCounts()
    c2.update(gold, ["A-B", "A-B", "A-I", "O"])      # split chunk: no credit
    assert c2.metrics()["correct_chunks"] == 0
    assert c2.pred_chunks == 2


def test_spans_from_tag_ids_matches_string_path():
    """Vectorized id-based span recovery ≡ bio_to_spans on label strings
    (randomized, including orphan-I and adjacent-B shapes)."""
    import numpy as np

    from knowledgeextraction_ray.stages.mentions import (_TYPE_NAME,
                                                         spans_from_tag_ids)
    from knowledgeextraction_ray.stages.ner_scorer import (LABEL_LIST,
                                                           NUM_LABELS)
    rs = np.random.RandomState(11)
    for _ in range(300):
        n = rs.randint(0, 40)
        ids = rs.randint(0, NUM_LABELS, size=n).astype(np.int8)
        labels = [LABEL_LIST[t] for t in ids]
        want = bio_to_spans(labels)
        got = [(_TYPE_NAME[ti], s, e)
               for (ti, s, e) in spans_from_tag_ids(ids)]
        assert got == want, (labels, got, want)


def test_scaled_int64_half_away_from_zero_matches_duckdb():
    """DuckDB round() is half away from zero; Arrow/numpy default to
    half-to-even — the helpers must pin the DuckDB mode (ADVICE r1)."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from knowledgeextraction_ray.functions.rounding import (scaled_int64,
                                                            scaled_int64_np)
    vals = [0.00005, 0.00015, 0.00025, -0.00005, -0.00025, 1.5, 2.5, -2.5,
            0.125, -0.375]
    got_pa = scaled_int64(pa.array(vals, pa.float64()), 10_000.0).to_pylist()
    got_np = scaled_int64_np(np.array(vals), 10_000.0).tolist()
    want = [r[0] for r in duckdb.sql(
        "select cast(round(v * 10000) as bigint) from (select unnest($v) v)",
        params={"v": vals}).fetchall()]
    assert got_pa == want
    assert got_np == want


def test_lcs_alignment_sentencepiece_roundtrip():
    """Token→orig maps through the banded LCS (mrc_utils.py:116-244
    restatement): a SentencePiece-style tokenization (underline markers,
    accent-stripped chars) maps every token back to its exact original
    span, so text[start:end+1] recovers the surface."""
    from knowledgeextraction_ray.functions.alignment import (
        token_to_orig_maps)
    text = "Héllo wörld of tokens"
    # what an accent-stripping sentencepiece model would emit
    tokens = ["▁He", "llo", "▁wor", "ld", "▁of", "▁to", "kens"]
    starts, ends = token_to_orig_maps(tokens, text)
    # the span of a full word reassembles exactly
    assert text[starts[0]:ends[1] + 1] == "Héllo"
    assert text[starts[2]:ends[3] + 1].strip() == "wörld"
    assert text[starts[5]:ends[6] + 1].strip() == "tokens"


def test_lcs_alignment_mismatch_returns_none():
    """The reference's MISMATCH bail-out: unrelated texts (LCS < 0.8 n)
    yield no alignment → caller emits zero features."""
    from knowledgeextraction_ray.functions.alignment import (
        lcs_alignment, token_to_orig_maps)
    assert lcs_alignment("abcdefghij", "zzzzzzzzzz") is None
    assert token_to_orig_maps(["▁totally", "▁different"],
                              "0123456789012345678") is None
    assert lcs_alignment("", "x") is None


def test_convert_index_reference_semantics():
    """_convert_index parity (mrc_utils.py:43-76): unaligned positions
    resolve to nearest aligned neighbors with start/end asymmetry."""
    from knowledgeextraction_ray.functions.alignment import convert_index
    idx = [None, 3, None, None, 7, None]
    assert convert_index(idx, 1) == 3
    assert convert_index(idx, 0, is_start=True) == 0      # front missing
    assert convert_index(idx, 0, is_start=False) == 2     # rear-1
    assert convert_index(idx, 2, is_start=True) == 4      # gap: front+1
    assert convert_index(idx, 2, is_start=False) == 6     # gap: rear-1
    assert convert_index(idx, 5, m=10, is_start=True) == 8
    assert convert_index(idx, 5, m=10, is_start=False) == 9


def test_chunk_counts_ids_matches_per_row_update():
    """Vectorized ID-space counting ≡ the per-row string ChunkCounts walk,
    over random noisy sequences including malformed BIO (I-after-O, type
    switches, B-runs)."""
    import numpy as np

    from knowledgeextraction_ray.functions.conlleval import chunk_counts_ids
    from knowledgeextraction_ray.stages.ner_scorer import LABEL_LIST

    rs = np.random.RandomState(42)
    K = len(LABEL_LIST)
    for trial in range(20):
        lens = rs.randint(0, 40, size=rs.randint(1, 12))
        # skew toward O but include every malformed pattern
        gold_rows = [rs.choice(K, size=n, p=[0.5] + [0.5 / (K - 1)] * (K - 1))
                     for n in lens]
        pred_rows = [np.where(rs.rand(n) < 0.3, rs.randint(0, K, size=n), g)
                     for n, g in zip(lens, gold_rows)]
        ref = ChunkCounts()
        for g, p in zip(gold_rows, pred_rows):
            ref.update([LABEL_LIST[i] for i in g], [LABEL_LIST[i] for i in p])
        flat_g = np.concatenate(gold_rows) if len(gold_rows) else np.array([])
        flat_p = np.concatenate(pred_rows) if len(pred_rows) else np.array([])
        got = chunk_counts_ids(flat_g, flat_p, lens, LABEL_LIST)
        assert got == ref, (trial, got, ref)
