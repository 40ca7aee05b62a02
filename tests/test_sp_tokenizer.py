"""Real SentencePiece-style tokenizer (``functions/sptokenizer.py``) and its
integration into token-MRC: unit pins for the unigram Viterbi /
``encode_pieces`` / ``preprocess_text`` semantics, and DIFFERENTIAL tests
executing the reference's own banded-LCS DP (AST-extracted from
``/root/reference/.../mrc_utils.py``) on REAL-tokenizer output — including
the unicode-decorated corpus where the tokenizer's NFKD / quote
normalization changes text length and the alignment has no closed form."""

import ast

import numpy as np
import pytest

MRC_UTILS = "/root/reference/knowledgeextractor/utils/mrc_utils.py"


# ---------------------------------------------------------------------------
# tokenizer unit semantics
# ---------------------------------------------------------------------------

def test_preprocess_text_albert_parity():
    from knowledgeextraction_ray.functions.sptokenizer import preprocess_text
    assert preprocess_text("  a \n b  ") == "a b"
    assert preprocess_text("``x''", remove_space=False) == '"x"'
    assert preprocess_text("Café", remove_space=False) == "Cafe"
    assert preprocess_text("ﬁx", remove_space=False) == "fix"  # ligature
    assert preprocess_text("AbC", remove_space=False, lower=True) == "abc"


def test_tok_cat_reconstructs_normalized_text():
    """SentencePiece invariant: pieces concatenate back to the normalized
    text (▁ → space, dummy prefix) — the LCS right-hand side's definition."""
    from knowledgeextraction_ray.corpus import decorate_unicode, generate_file
    from knowledgeextraction_ray.functions.alignment import tok_cat_of
    from knowledgeextraction_ray.functions.sptokenizer import (
        preprocess_text, sp_tokenize_real)
    for j in range(20):
        t = generate_file(j)["content"]
        for c in (t, decorate_unicode(t)):
            want = " " + " ".join(
                preprocess_text(c, remove_space=True, lower=True).split())
            assert tok_cat_of(sp_tokenize_real(c)) == want


def test_unigram_viterbi_prefers_higher_score_path():
    from knowledgeextraction_ray.functions.sptokenizer import SpUnigramModel
    m = SpUnigramModel({"▁": -2.0, "a": -3.0, "b": -3.0, "ab": -4.0,
                        "▁ab": -3.5, "▁a": -2.5})
    # "▁ab": single piece -3.5 beats ▁+ab (-6.0), ▁a+b (-5.5)? no: -5.5 <
    # -3.5 is false — scores are logs, HIGHER wins: -3.5 > -5.5 > -6.0
    assert m.encode_as_pieces("ab") == ["▁ab"]
    # unknown char surfaces as its own piece at the unk penalty
    assert m.encode_as_pieces("az") == ["▁a", "z"]


def test_interior_underline_rejected():
    from knowledgeextraction_ray.functions.sptokenizer import SpUnigramModel
    with pytest.raises(ValueError):
        SpUnigramModel({"a▁b": -1.0, "a": -2.0})


def test_encode_pieces_digit_comma_hack():
    """The XLNet/ALBERT trailing-``digit,`` re-split — dormant on the code
    corpus (``,`` is its own piece there), pinned via a vocab that forms
    such a piece."""
    from knowledgeextraction_ray.functions.sptokenizer import (
        SpUnigramModel, encode_pieces)
    m = SpUnigramModel({"▁": -2.0, "▁9,": -1.0, "9": -3.0, ",": -3.0,
                        "▁9": -2.5})
    assert m.encode_as_pieces("9,") == ["▁9,"]
    # hack splits it: re-encode "9" (→ ▁9, leading ▁ KEPT because the
    # original piece started with ▁) then append ","
    assert encode_pieces(m, "9,") == ["▁9", ","]
    # piece NOT starting with ▁: the dummy-prefix ▁ of the re-encode is
    # stripped
    m2 = SpUnigramModel({"▁": -2.0, "x": -3.0, "9,": -1.0, "9": -3.0,
                         ",": -3.0, "▁9": -2.5, "▁x": -2.5})
    assert m2.encode_as_pieces("x9,") == ["▁x", "9,"]
    assert encode_pieces(m2, "x9,") == ["▁x", "9", ","]


def test_fixture_vocab_loads_and_is_deterministic():
    from knowledgeextraction_ray.functions.sptokenizer import (
        FullSpTokenizer, SpUnigramModel)
    m = SpUnigramModel.from_vocab_file()
    assert len(m.scores) > 300
    tk = FullSpTokenizer(m)
    a = tk.tokenize("import main\ndef setup(arg0):")
    assert a == tk.tokenize("import main\ndef setup(arg0):")
    assert any(len(p) > 2 for p in a)          # genuine subword pieces


# ---------------------------------------------------------------------------
# differential: reference _lcs_match on REAL-tokenizer output
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_lcs_match():
    """Reference banded-LCS DP runner (same AST extraction as
    ``test_token_mrc.ref_lcs_match`` — mrc_utils imports tensorflow at top
    level, so the TF-free inner function is compiled out of its AST)."""
    with open(MRC_UTILS) as f:
        tree = ast.parse(f.read())
    outer = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
                 and n.name == "convert_single_example_to_features")
    inner = next(n for n in ast.walk(outer)
                 if isinstance(n, ast.FunctionDef) and n.name == "_lcs_match")

    class _Tok:
        @staticmethod
        def preprocess_text(s, remove_space=False, lower=False):
            import unicodedata
            return "".join(c for c in unicodedata.normalize("NFKD", s)
                           if not unicodedata.combining(c))

    def run(orig: str, tok_cat: str):
        n, m = len(orig), len(tok_cat)
        ns = {"np": np, "tokenization": _Tok, "n": n, "m": m,
              "paragraph_text": orig, "tok_cat_text": tok_cat,
              "f": np.zeros((max(n, 8), max(m, 8)), dtype=np.float32),
              "g": {}}
        mod = ast.Module(body=[inner], type_ignores=[])
        exec(compile(mod, MRC_UTILS, "exec"), ns)
        max_dist = abs(n - m) + 5
        for _ in range(2):
            ns["_lcs_match"](max_dist)
            if ns["f"][n - 1, m - 1] > 0.8 * n:
                break
            max_dist *= 2
        return ns["f"][:n, :m], dict(ns["g"])

    return run


def _sp_pairs(n_files: int, decorated: bool):
    from knowledgeextraction_ray.corpus import decorate_unicode, generate_file
    from knowledgeextraction_ray.functions.alignment import tok_cat_of
    from knowledgeextraction_ray.functions.sptokenizer import sp_tokenize_real
    pairs = []
    for j in range(n_files):
        c = generate_file(j)["content"]
        if decorated:
            c = decorate_unicode(c)
        pairs.append((c, tok_cat_of(sp_tokenize_real(c))))
    return pairs


@pytest.mark.parametrize("decorated", [False, True])
def test_lcs_dp_matches_reference_on_sp_output(ref_lcs_match, decorated):
    """Cell-for-cell f/g parity of OUR DP against the reference's own
    ``_lcs_match`` on real-tokenizer (plain + unicode-decorated) inputs."""
    from knowledgeextraction_ray.functions.alignment import lcs_alignment
    for orig, tok_cat in _sp_pairs(8, decorated):
        f_ref, g_ref = ref_lcs_match(orig, tok_cat)
        ours = lcs_alignment(orig, tok_cat, _return_tables=True)
        assert ours is not None
        f_ours, g_ours = ours
        assert np.array_equal(f_ref, f_ours)
        assert g_ref == g_ours


@pytest.mark.parametrize("decorated", [False, True])
def test_batch_fast_scalar_equal_on_sp_output(decorated):
    from knowledgeextraction_ray.functions.alignment import (
        lcs_alignment, lcs_alignment_fast, lcs_alignment_fast_batch)
    pairs = _sp_pairs(20, decorated)
    scal = [lcs_alignment(o, t) for o, t in pairs]
    fast = [lcs_alignment_fast(o, t) for o, t in pairs]
    bat = lcs_alignment_fast_batch(pairs)
    assert scal == fast == bat


def test_sp_alignment_exercises_convert_index():
    """The point of the real tokenizer: lowercasing leaves every original
    uppercase char unaligned, so ``convert_index`` interpolation is
    genuinely load-bearing (the stand-in's alignment had no mismatches)."""
    from knowledgeextraction_ray.functions.alignment import lcs_alignment
    n_unaligned = 0
    for orig, tok_cat in _sp_pairs(10, False):
        al = lcs_alignment(orig, tok_cat)
        assert al is not None
        n_unaligned += sum(v is None for v in al[0])
    assert n_unaligned > 50


def test_sp_ligature_changes_token_length():
    """Decoration sanity: ﬁ/ﬀ ligatures ADD token chars, ``\\x60\\x60``
    quote pairs REMOVE them — the band offsets the DP must absorb."""
    from knowledgeextraction_ray.functions.alignment import tok_cat_of
    from knowledgeextraction_ray.functions.sptokenizer import sp_tokenize_real
    lig = "# fixme shuffle"
    dec = "# ﬁxme shuﬀle"
    assert len(tok_cat_of(sp_tokenize_real(dec))) == \
        len(tok_cat_of(sp_tokenize_real(lig)))          # NFKD re-expands
    assert len(dec) == len(lig) - 2                     # orig side shrank
    q = "# ``sort''"
    assert len(tok_cat_of(sp_tokenize_real(q))) == len(" # \"sort\"")


# ---------------------------------------------------------------------------
# pipeline-level
# ---------------------------------------------------------------------------

def test_sp_token_mrc_fused_equals_staged(ray_session):
    import ray.data as rd

    from knowledgeextraction_ray.corpus import generate_files
    from knowledgeextraction_ray.stages.mrc import token_mrc_pipeline
    tbl = generate_files(range(12)).select(["content"])
    key = ["example_id"]
    a = (token_mrc_pipeline(rd.from_arrow(tbl), tokenizer="sp",
                            mode="fused")
         .to_pandas().sort_values(key).reset_index(drop=True))
    b = (token_mrc_pipeline(rd.from_arrow(tbl), tokenizer="sp",
                            mode="staged")
         .to_pandas().sort_values(key).reset_index(drop=True))
    assert a.equals(b)


def test_sp_oracle_parity_edge_corpus(tmp_path, ray_session):
    """The SP gate's closed-form-with-case-mismatches restatement holds
    beyond the generated corpus: every closed-form branch is exercised —
    capitalized words after space-bearing / no-space / leading gaps,
    cap word as the FIRST word (no front neighbor), pieces that are
    ``▁`` alone or end exactly at the cap char (forced via rare chars the
    vocab only covers as singles), unknown chars, multi-space gaps, and
    the zero-features exclusions including the uppercase-aware 0.8·n bar
    — pipeline ≡ oracle on a hand-built parquet, value-compared the
    driver way."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from knowledgeextraction_ray.compare import compare
    from knowledgeextraction_ray.oracle import sql_mrc_token_answers_sp
    from knowledgeextraction_ray.pipelines.queries import token_answers_shape
    from knowledgeextraction_ray.stages.mrc import token_mrc_pipeline

    texts = [
        "import Alpha\nclass Base:\n pass",          # caps after \n gaps
        " import Beta",                              # leading space gap
        "\n\nimport Gamma\ndef Run(arg0):",          # leading no-space gap
        "Class_001:\nimport x",                      # cap word FIRST, no front
        "import main  \t Handler",                   # multi-space gap + cap
        "import Alef Bet Gimel Handler",             # many caps, eligible
        "a\nB\nc\nd\ne\nf\ng\nh",                    # cap + ≤0.8 bar → drop
        "import " + "z" * 1100,                      # LCS cap → drop
        "def f(x):\n    y = Main()\n    z = f()\n",  # cap mid-line call
    ]
    tbl = pa.table({"content": texts})
    pq.write_table(tbl, tmp_path / "edge_sp.parquet")
    got = token_answers_shape(
        token_mrc_pipeline(rd.from_arrow(tbl), tokenizer="sp"))
    sql = sql_mrc_token_answers_sp(
        "unused", corpus=str(tmp_path / "edge_sp.parquet"))
    ok, msg = compare(got, sql)
    assert ok, msg
    assert got.count() == 6 * 4           # 3 exclusions really excluded


def test_sp_oracle_guard_fails_loudly(tmp_path):
    """Inputs outside the closed form (uppercase past word offset 0, or a
    single-char uppercase word whose convert_index rear is the NEXT word)
    raise an explicit DuckDB error() naming the word — never an opaque
    value-hash mismatch (ADVICE r3 pattern)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from knowledgeextraction_ray.oracle import sql_mrc_token_answers_sp

    for bad in ("import Q", "import aX"):
        p = tmp_path / f"bad_{bad[-1]}.parquet"
        pq.write_table(pa.table({"content": [bad]}), p)
        sql = sql_mrc_token_answers_sp("unused", corpus=str(p))
        with pytest.raises(duckdb.InvalidInputException,
                           match="sp oracle assumption violated"):
            duckdb.sql(sql).df()


def test_oracle_nonascii_whitespace_guard(tmp_path):
    """Content containing whitespace Python splits on but RE2's ASCII
    ``\\s`` does not (NBSP, \\v, U+2028, …) raises a loud error in BOTH
    token oracles instead of a silent tokenization divergence (r4, per
    ADVICE)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from knowledgeextraction_ray.oracle import (sql_mrc_token_answers,
                                                sql_mrc_token_answers_sp)

    for i, ws in enumerate(("\xa0", "\x0b", "\u2028", "\x85")):
        p = tmp_path / f"ws{i}.parquet"
        pq.write_table(pa.table({"content": [f"import a{ws}b"]}), p)
        for fn in (sql_mrc_token_answers, sql_mrc_token_answers_sp):
            with pytest.raises(duckdb.InvalidInputException,
                               match="whitespace outside RE2"):
                duckdb.sql(fn("unused", corpus=str(p))).df()


def test_sp_token_mrc_answers_snap_to_piece_boundaries(ray_session):
    """A candidate span grows to its covering piece span — e.g. the piece
    ``▁setup(a`` makes the FUNC answer ``setup(a`` — exactly the reference's
    token-boundary snapping (``mrc_utils.py:404-410``)."""
    import ray.data as rd

    from knowledgeextraction_ray.corpus import generate_files
    from knowledgeextraction_ray.functions.sptokenizer import sp_tokenize_real
    from knowledgeextraction_ray.stages.mrc import token_mrc_pipeline
    tbl = generate_files(range(6)).select(["content"])
    pdf = token_mrc_pipeline(rd.from_arrow(tbl), tokenizer="sp").to_pandas()
    assert len(pdf)
    ents = [e for row in pdf["entities"] for e in row]
    assert ents
    # at least one answer extends past the bare identifier (piece snapping)
    if any("(" in p for c in tbl["content"].to_pylist()
           for p in sp_tokenize_real(c)):
        assert any("(" in e for e in ents)
