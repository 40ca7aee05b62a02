"""Tests for eval harness (P/R gate), MRC fan-out/fan-in, NRE, joins,
sources, prep pipeline."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


# --------------------------------------------------------------------------
# eval harness — the north-rule P/R ≥ 0.95 gate
# --------------------------------------------------------------------------

def test_ner_eval_perfect_parity(corpus_ready):
    from knowledgeextraction_ray.pipelines.evaluate import ner_eval
    m = ner_eval(corpus_ready).iloc[0]
    assert m["precision"] >= 0.95 and m["recall"] >= 0.95   # the gate
    assert m["precision"] == 1.0 and m["recall"] == 1.0     # exact parity
    assert m["gold_chunks"] > 0


def test_ner_eval_detects_corruption(corpus_ready):
    from knowledgeextraction_ray.pipelines.evaluate import ner_eval
    m = ner_eval(corpus_ready, corrupt_frac=0.3).iloc[0]
    assert m["recall"] < 0.95                 # dropped segments hurt recall
    assert m["precision"] == 1.0              # surviving tags still correct


# --------------------------------------------------------------------------
# MRC
# --------------------------------------------------------------------------

def _mrc_run(rows):
    from knowledgeextraction_ray.stages.mrc import mrc_pipeline
    return mrc_pipeline(rd.from_items(rows)).to_pandas()


def test_mrc_nbest_merges_overlapping_windows():
    # context long enough to fan out to several overlapping windows; the
    # same def appears in 2 windows → its logprobs are averaged, text
    # deduped, still one entity. Filler comments (not calls) pad the length
    # so the alpha call stays inside the per-feature top-5 beam.
    body = "\n".join(f"    v{i} = run(arg0)  # pad pad pad pad pad"
                     for i in range(3))
    pad = "\n".join(f"# filler line {i} with words" for i in range(6))
    content = (f"def alpha(arg0):\n{body}\n{pad}\n"
               f"def beta(arg0):\n    v0 = alpha(arg0)")
    out = _mrc_run([{"repo": "r", "path": "p", "commit": "c",
                     "lang": "python", "content": content}])
    assert len(out) == 4                      # one row per question type
    by_q = {ex.split(":")[1]: row for ex, row in
            zip(out["example_id"], out.to_dict("records"))}
    assert set(by_q["FUNC"]["entities"]) == {"alpha", "beta"}
    assert sorted(by_q["CALL"]["entities"]) == ["alpha", "run"]
    assert list(by_q["IMPORT"]["entities"]) == []   # no imports → n/a
    assert by_q["IMPORT"]["na_prob"] > 0      # confident no-answer
    assert by_q["FUNC"]["na_prob"] < 0
    # probabilities are a softmax: sum to 1 over kept entities
    probs = by_q["FUNC"]["probabilities"]
    assert abs(sum(probs) - 1.0) < 1e-9


def test_mrc_dedup_first_wins_deterministic():
    from knowledgeextraction_ray.stages.mrc import _merge_example
    g = pd.DataFrame({
        "cls_logit": [-5.0, -5.0],
        "cand_start": [0, 10],
        "cand_end": [5, 15],
        "start_log_prob": [-0.1, -0.2],
        "end_log_prob": [-0.1, -0.2],
        "answer_text": ["foo", "foo"],       # same text, different cells
    })
    m = _merge_example(g, n_best=20)
    assert m["entities"] == ["foo"]          # deduped, best-scoring kept
    assert len(m["probabilities"]) == 1


def test_mrc_fused_equals_staged():
    """The zero-shuffle fused pipeline and the distributed staged
    (explode → score → bucketed merge) pipeline produce identical rows —
    shared feature kernel, shared merge kernel."""
    import numpy as np

    from knowledgeextraction_ray.corpus import generate_files
    from knowledgeextraction_ray.stages.mrc import mrc_pipeline
    corpus = generate_files(range(30))
    a = (mrc_pipeline(rd.from_arrow(corpus), mode="fused").to_pandas()
         .sort_values("example_id").reset_index(drop=True))
    b = (mrc_pipeline(rd.from_arrow(corpus), mode="staged").to_pandas()
         .sort_values("example_id").reset_index(drop=True))
    assert len(a) == len(b) == 120
    assert list(a["example_id"]) == list(b["example_id"])
    assert list(a["na_prob"]) == list(b["na_prob"])
    assert list(a["final_answer"]) == list(b["final_answer"])
    for ea, eb in zip(a["entities"], b["entities"]):
        assert list(ea) == list(eb)
    for pra, prb in zip(a["probabilities"], b["probabilities"]):
        assert len(pra) == len(prb)
        assert np.allclose(pra, prb, atol=1e-12)


# --------------------------------------------------------------------------
# NRE
# --------------------------------------------------------------------------

def test_marker_featurize_positions():
    from knowledgeextraction_ray.functions.featurize import CHAR2ID
    from knowledgeextraction_ray.stages.nre import (HEAD_CLOSE, HEAD_OPEN,
                                                    TAIL_CLOSE, TAIL_OPEN,
                                                    marker_featurize)
    text = "def f(x): y = g(x)"
    h = (4, 5)   # f
    t = (14, 15)  # g
    ids, mask, pos1, pos2 = marker_featurize(text, h, t, max_length=32)
    assert ids[pos1] == HEAD_OPEN
    assert ids[pos2] == TAIL_OPEN
    assert list(ids[pos1 + 1:pos1 + 2]) == [CHAR2ID["f"]]
    assert ids[pos1 + 2] == HEAD_CLOSE
    assert mask.sum() == len(text) + 4       # 4 markers inserted
    # truncation clamps positions
    ids2, _, p1, p2 = marker_featurize(text, h, t, max_length=10)
    assert p1 < 10 and p2 < 10


def test_nre_pipeline_pairs(corpus_ready):
    from knowledgeextraction_ray.config import PipelineConfig
    from knowledgeextraction_ray.pipelines.kg import read_corpus
    from knowledgeextraction_ray.stages.ner_scorer import score_dataset
    from knowledgeextraction_ray.stages.nre import nre_pipeline
    from knowledgeextraction_ray.stages.segmenter import segment_dataset
    cfg = PipelineConfig()
    scored = score_dataset(
        segment_dataset(read_corpus(corpus_ready), cfg.segment),
        cfg.scorer, cfg.segment)
    out = nre_pipeline(scored.limit(50)).to_pandas()
    assert len(out) > 0
    assert (out["relation"] == "calls").all()
    assert ((out["score"] >= 0.5) & (out["score"] < 1.0)).all()
    # deterministic: same input → same scores
    out2 = nre_pipeline(scored.limit(50)).to_pandas()
    a = out.sort_values(["guid", "head_surface", "tail_surface"]).reset_index(drop=True)
    b = out2.sort_values(["guid", "head_surface", "tail_surface"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------

def test_bucketed_join_matches_pandas():
    from knowledgeextraction_ray.stages.joins import bucketed_join
    left = rd.from_items([{"k": f"k{i % 7}", "a": i} for i in range(50)])
    right = rd.from_items([{"k": f"k{i}", "b": i * 10} for i in range(5)])
    got = (bucketed_join(left, right, on="k", num_buckets=4)
           .to_pandas().sort_values(["k", "a"]).reset_index(drop=True))
    lp = pd.DataFrame([{"k": f"k{i % 7}", "a": i} for i in range(50)])
    rp = pd.DataFrame([{"k": f"k{i}", "b": i * 10} for i in range(5)])
    want = lp.merge(rp, on="k").sort_values(["k", "a"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "a", "b"]], want)


def test_broadcast_semi_and_anti_join():
    from knowledgeextraction_ray.stages.joins import broadcast_semi_join
    ds = rd.from_items([{"k": f"k{i}", "v": i} for i in range(10)])
    keys = {"k1", "k3"}
    semi = broadcast_semi_join(ds, "k", keys).to_pandas()
    assert sorted(semi["k"]) == ["k1", "k3"]
    anti = broadcast_semi_join(ds, "k", keys, anti=True).to_pandas()
    assert len(anti) == 8 and "k1" not in set(anti["k"])


# --------------------------------------------------------------------------
# sources
# --------------------------------------------------------------------------

def test_conll_roundtrip(tmp_path):
    from knowledgeextraction_ray.sources.conll import (format_conlleval,
                                                       read_conll_text)
    text = "John B-PER\nSmith I-PER\nworks O\n\nBerlin B-LOC\n"
    sents = read_conll_text(text, normalize_digits=False)
    assert len(sents) == 2
    assert sents[0] == [("John", "B-PER"), ("Smith", "I-PER"),
                        ("works", "O")]
    line = format_conlleval(["John"], ["B-PER"], ["B-PER"])
    assert line == "1 John _ _ B-PER B-PER\n"


def test_conll_digit_normalization():
    from knowledgeextraction_ray.sources.conll import read_conll_text
    sents = read_conll_text("room42 O\n", normalize_digits=True)
    assert sents[0][0][0] == "room00"


def test_jsonl_scrub_and_parse():
    from knowledgeextraction_ray.sources.jsonl import (parse_example_lines,
                                                       parse_squad_lines,
                                                       scrub_json_line)
    assert scrub_json_line('junk{"a":1}trailing') == '{"a":1}'
    assert scrub_json_line("no json here") is None
    rows = parse_example_lines(
        ['{"originalText":"ab","entities":[{"label_type":"T",'
         '"start_pos":0,"end_pos":1}]}', "garbage"])
    assert len(rows) == 1 and rows[0]["entities"] == [("T", 0, 1)]
    assert rows[0]["guid"] == "test-0"
    sq = parse_squad_lines(
        ['{"context":"c","qas":[{"id":"q1","question":"w?",'
         '"answers":[{"text":"c","answer_start":0}]},'
         '{"id":"q2","question":"x?","is_impossible":true}]}'])
    assert len(sq) == 2 and sq[1]["is_impossible"]


# --------------------------------------------------------------------------
# prep pipeline
# --------------------------------------------------------------------------

def _gold_docs():
    ent = pa.list_(pa.struct([("label_type", pa.string()),
                              ("start_pos", pa.int32()),
                              ("end_pos", pa.int32())]))
    text = "import alpha\ndef beta(x):\n    v0 = gamma(x)\n"
    ents = [{"label_type": "IMPORT_RAW", "start_pos": 7, "end_pos": 12},
            {"label_type": "FUNC", "start_pos": 17, "end_pos": 21}]
    return rd.from_arrow(pa.Table.from_pydict({
        "guid": pa.array(["d0"], pa.string()),
        "text": pa.array([text], pa.string()),
        "entities": pa.array([ents], ent),
    }))


def test_prep_label_mapping_and_bio(corpus_ready):
    from knowledgeextraction_ray.pipelines.prep import prep_pipeline
    train, dev, test = prep_pipeline(
        _gold_docs(), label_map={"IMPORT_RAW": "IMPORT"})
    rows = pd.concat([train.to_pandas(), dev.to_pandas(),
                      test.to_pandas()])
    assert len(rows) == 1
    labels = rows.iloc[0]["token_labels"]
    text = rows.iloc[0]["text"]
    assert len(labels) == len(text)
    assert labels[7] == "IMPORT-B"            # mapped label applied
    assert labels[8] == "IMPORT-I"
    assert labels[17] == "FUNC-B"


def test_prep_split_proportions(corpus_ready):
    from knowledgeextraction_ray.pipelines.queries import (
        q_prep_tagger_records)
    train = q_prep_tagger_records(corpus_ready)
    n_train = train.count()
    assert n_train > 0
    # ~90% of ~1000 files (some produce 2 segments → ~1130 records total)
    assert 900 <= n_train <= 1150


def test_mrc_answer_f1_vs_regex_gold(corpus_ready):
    """MRC n-best answers vs regex-derivable gold: high recall expected
    (the per-feature beam can drop low-rank candidates in dense windows, so
    the gate is ≥0.9, not 1.0)."""
    import re

    from knowledgeextraction_ray.corpus import (MENTION_PATTERNS,
                                                generate_files)
    from knowledgeextraction_ray.functions.hashing import sha256_hex
    from knowledgeextraction_ray.stages.mrc import mrc_answer_f1, mrc_pipeline

    corpus = generate_files(range(60))
    nbest = mrc_pipeline(rd.from_arrow(corpus)).to_pandas()
    gold_map = {}
    for content in corpus["content"].to_pylist():
        sha = sha256_hex(content)
        for qtype, pat in MENTION_PATTERNS.items():
            gold_map[f"{sha}:{qtype}"] = set(
                re.findall(pat, content))
    m = mrc_answer_f1(nbest, gold_map)
    assert m["n_examples"] == 240
    assert m["precision"] == 1.0          # never invents answers
    assert m["recall"] >= 0.9             # beam may drop dense tail


def test_merge_bucket_matches_merge_example():
    """Vectorized bucket merge ≡ per-example reference merge."""
    import numpy as np

    from knowledgeextraction_ray.stages.mrc import (_merge_bucket,
                                                    _merge_example)
    rs = np.random.RandomState(5)
    rows = []
    for ex in range(12):
        n_feat = rs.randint(1, 6)
        for f in range(n_feat):
            no_cand = rs.rand() < 0.2
            # every feature carries exactly one cls row (scorer convention)
            rows.append({"example_id": f"e{ex}", "cand_start": -1,
                         "cand_end": -1, "start_log_prob": -1e4,
                         "end_log_prob": -1e4,
                         "cls_logit": 5.0 if no_cand else -5.0,
                         "answer_text": ""})
            if no_cand:
                continue
            for c in range(rs.randint(1, 4)):
                s = int(rs.randint(0, 50))
                rows.append({"example_id": f"e{ex}", "cand_start": s,
                             "cand_end": s + int(rs.randint(1, 6)),
                             "start_log_prob": float(-0.1 * c),
                             "end_log_prob": float(-0.05 * c),
                             "cls_logit": 0.0,
                             "answer_text": f"ans{s % 7}"})
    g = pd.DataFrame(rows)
    vec = _merge_bucket(g, n_best=5).set_index("example_id")
    for ex, sub in g.groupby("example_id"):
        ref = _merge_example(sub, n_best=5)
        got = vec.loc[ex]
        assert got["entities"] == ref["entities"], ex
        assert np.allclose(got["probabilities"], ref["probabilities"])
        assert abs(got["na_prob"] - ref["na_prob"]) < 1e-12
        assert got["final_answer"] == ref["final_answer"], ex


def test_char_is_max_context_mirrors_reference_example():
    """The reference's own docstring example (mrc_utils.py:83-97): doc
    'the man went to the store and bought a gallon of milk', spans A=0-4,
    B=3-7, C=6-10; 'bought' (position 7) belongs to span C (left 1 right 3)
    not span B (left 4 right 0)."""
    from knowledgeextraction_ray.stages.mrc import char_is_max_context
    starts, lengths = [0, 3, 6], [5, 5, 5]
    assert char_is_max_context(starts, lengths, 2, 7)        # span C owns
    assert not char_is_max_context(starts, lengths, 1, 7)    # span B not
    # position 4: A(left 4, right 0)=0.05, B(left 1, right 3)=1.05 → B
    assert char_is_max_context(starts, lengths, 1, 4)
    assert not char_is_max_context(starts, lengths, 0, 4)


def test_mrc_final_answer_null_threshold():
    """get_predictions_v2 parity: best non-null text unless na_prob >=
    threshold; threshold None never nulls (the serving default)."""
    from knowledgeextraction_ray.stages.mrc import _merge_example
    g = pd.DataFrame({
        "cand_start": [-1, 0], "cand_end": [-1, 5],
        "start_log_prob": [-1e4, -0.1], "end_log_prob": [-1e4, -0.1],
        "cls_logit": [2.5, 0.0], "answer_text": ["", "foo"],
    })
    assert _merge_example(g, 5, null_threshold=0.0)["final_answer"] == ""
    assert _merge_example(g, 5, null_threshold=3.0)["final_answer"] == "foo"
    assert _merge_example(g, 5, null_threshold=None)["final_answer"] == "foo"
    assert _merge_example(g, 5, null_threshold=None)["na_prob"] == 2.5


def test_link_mentions_actor_variant_matches_stateless(corpus_ready):
    """The actor-pool linking form (kept for large-alias deployments) must
    equal the default stateless form."""
    import pyarrow.parquet as pq

    from knowledgeextraction_ray.corpus import alias_path
    from knowledgeextraction_ray.stages.linking import (LinkMentions,
                                                        link_batch)
    ap = alias_path(corpus_ready)
    import pyarrow as pa
    batch = pa.Table.from_pydict({
        "surface": ["main", "MAIN", "utils", "nonexistent_xyz", "Base"]})
    a = LinkMentions(ap)(batch).to_pydict()
    b = link_batch(batch, ap).to_pydict()
    assert a == b
    assert a["entity_id"][0] == "ent::main"         # ambiguous → max prior
    assert a["entity_id"][3] == "ent::nonexistent_xyz"  # fallback
    assert a["prior"][3] == 0.0


def test_hash_join_wrapper():
    from knowledgeextraction_ray.stages.joins import hash_join
    left = rd.from_items([{"k": f"k{i % 4}", "a": i} for i in range(12)])
    right = rd.from_items([{"k": f"k{i}", "b": i * 10} for i in range(3)])
    got = hash_join(left, right, on="k", num_partitions=4).to_pandas()
    lp = pd.DataFrame([{"k": f"k{i % 4}", "a": i} for i in range(12)])
    rp = pd.DataFrame([{"k": f"k{i}", "b": i * 10} for i in range(3)])
    want = lp.merge(rp, on="k")
    assert len(got) == len(want)
    assert (set(map(tuple, got[["k", "a", "b"]].values))
            == set(map(tuple, want[["k", "a", "b"]].values)))


# --------------------------------------------------------------------------
# serving envelopes (reference ner_server.py response contracts)
# --------------------------------------------------------------------------

def test_crf_serving_envelope():
    from knowledgeextraction_ray.pipelines.serving import crf_process
    queries = ["import utils", "def run(a):"]
    out = crf_process(queries)
    assert set(out) == {"predictions", "query_list"}
    assert out["query_list"] == queries
    assert len(out["predictions"]) == 2
    p0 = out["predictions"][0]
    assert set(p0) == {"words", "tags"}
    assert p0["words"] == list("import utils")
    assert p0["tags"][7] == "IMPORT-B"            # 'utils' surface start
    assert out["predictions"][1]["tags"][4] == "FUNC-B"


def test_mrc_serving_envelope():
    from knowledgeextraction_ray.pipelines.serving import mrc_process
    out = mrc_process([
        {"qas_id": "q1", "question": "Which functions are defined?",
         "context": "def alpha(x):\n    v0 = beta(x)"},
        {"qas_id": "q2", "question": "Which classes are defined?",
         "context": "def alpha(x):\n    v0 = beta(x)"},
    ])
    assert [r["guid"] for r in out] == ["q1", "q2"]
    assert set(out[0]) == {"guid", "entities", "probabilities", "na_prob"}
    assert out[0]["entities"] == ["alpha"]
    assert out[0]["na_prob"] < 0
    assert out[1]["entities"] == [] and out[1]["na_prob"] > 0


def test_nre_serving_predict_shape():
    from knowledgeextraction_ray.pipelines.serving import nre_process
    text = "def f(x):\n    y = g(x)"
    out = nre_process([{"text": text, "h": {"pos": [4, 5]},
                        "t": {"pos": [18, 19]}}])
    assert len(out) == 1
    rel, score = out[0]
    assert rel == "calls" and 0.5 <= score < 1.0


def test_asof_join_matches_pandas_merge_asof():
    """Generic as-of operator ≡ a single global pandas merge_asof
    (bucketing by key is a partition of the key space)."""
    rs = np.random.RandomState(7)
    left = pd.DataFrame({
        "k": rs.randint(0, 6, 80),
        "t": rs.randint(0, 1000, 80).astype("int64"),
        "lval": np.arange(80),
    }).drop_duplicates(["k", "t"])
    right = pd.DataFrame({
        "k": rs.randint(0, 6, 60),
        "t": rs.randint(0, 1000, 60).astype("int64"),
        "rval": np.arange(60) * 10,
    }).drop_duplicates(["k", "t"])
    from knowledgeextraction_ray.stages.joins import asof_join
    got = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                     by="k", on="t", num_buckets=4).to_pandas()
           .sort_values(["k", "t"]).reset_index(drop=True))
    want = (pd.merge_asof(left.sort_values("t", kind="mergesort"),
                          right.sort_values("t", kind="mergesort"),
                          on="t", by="k")
            .sort_values(["k", "t"]).reset_index(drop=True))
    cols = ["k", "t", "lval", "rval"]
    pd.testing.assert_frame_equal(got[cols].astype({"rval": "float64"}),
                                  want[cols].astype({"rval": "float64"}))


def test_ner_eval_fused_equals_join(corpus_ready):
    """Counts-without-join fast path ≡ the keyed-join formulation, with and
    without corruption."""
    from knowledgeextraction_ray.pipelines.evaluate import ner_eval
    for frac in (0.0, 0.3):
        a = ner_eval(corpus_ready, corrupt_frac=frac, mode="fused").iloc[0]
        b = ner_eval(corpus_ready, corrupt_frac=frac, mode="join").iloc[0]
        assert dict(a) == dict(b)
