"""End-to-end KG pipeline tests: oracle parity, sha256 invariant, decode-mode
parity (argmax vs Viterbi), scorer unit behavior."""

import numpy as np
import pyarrow as pa
import pytest

from knowledgeextraction_ray.compare import compare
from knowledgeextraction_ray.config import PipelineConfig, ScorerConfig
from knowledgeextraction_ray.oracle import KG_ORACLES
from knowledgeextraction_ray.pipelines.queries import KG_QUERIES, build_queries


# over ALL kg-oracle names, not just KG_QUERIES: three gated queries
# (ner_eval_prf, kg_triples_by_repo, kg_triples_resumable) register their
# callables elsewhere and used to be driver-gated only
@pytest.mark.parametrize("name", sorted(KG_ORACLES))
def test_kg_query_matches_duckdb_oracle(corpus_ready, name):
    sf = corpus_ready
    query = build_queries()[name]
    ok, msg = compare(query(sf), KG_ORACLES[name](sf))
    assert ok, f"{name}: {msg}"


def test_sha256_invariant_on_triples(corpus_ready):
    """Every output row's content_sha256 matches an input row's sha — and the
    (repo, path) → sha mapping is preserved exactly."""
    import duckdb

    from knowledgeextraction_ray.corpus import corpus_glob
    from knowledgeextraction_ray.pipelines.kg import kg_pipeline

    triples = kg_pipeline(corpus_ready).to_pandas()
    con = duckdb.connect()
    gold = con.sql(
        f"select repo, path, sha256(content) sha from "
        f"read_parquet('{corpus_glob(corpus_ready)}')").df()
    con.close()
    gold_map = dict(zip(zip(gold["repo"], gold["path"]), gold["sha"]))
    got = set(zip(triples["repo"], triples["path"], triples["content_sha256"]))
    for repo, path, sha in got:
        assert gold_map[(repo, path)] == sha


def test_viterbi_matches_argmax_on_confident_logits(corpus_ready):
    """north-star decode knob: viterbi must reproduce argmax tags on the
    deterministic model (confident emissions) — triple sets identical."""
    from knowledgeextraction_ray.pipelines.kg import kg_pipeline

    cfg_v = PipelineConfig(scorer=ScorerConfig(decode="viterbi"))
    t_arg = kg_pipeline(corpus_ready).to_pandas()
    t_vit = kg_pipeline(corpus_ready, cfg_v).to_pandas()
    key = ["subj", "pred", "obj"]
    a = set(map(tuple, t_arg[key].values))
    b = set(map(tuple, t_vit[key].values))
    assert a == b


def test_scorer_unit_tags():
    """Smoke the actor class directly (actor __init__ errors surface late in
    a pipeline — ray_guide pitfall)."""
    from knowledgeextraction_ray.stages.ner_scorer import (LABEL_LIST,
                                                           NerScorer)

    scorer = NerScorer()
    text = "import utils\ndef main(arg0):\n    v0 = run(arg0)\n"
    batch = pa.Table.from_pydict({
        "text": [text], "offset": [0], "guid": ["g:0"],
    })
    out = scorer(batch)
    tags = [LABEL_LIST[t] for t in out["tag_ids"][0].as_py()]
    assert len(tags) == len(text)
    s = text.index("utils")
    assert tags[s] == "IMPORT-B"
    assert tags[s + 1:s + 5] == ["IMPORT-I"] * 4
    d = text.index("main")
    assert tags[d] == "FUNC-B"
    c = text.index("run")
    assert tags[c] == "CALL-B"


def test_viterbi_decode_respects_bio_constraints():
    from knowledgeextraction_ray.stages.ner_scorer import (LABEL2ID,
                                                           NUM_LABELS,
                                                           bio_transitions,
                                                           viterbi_decode)

    # emissions favor an orphan I (illegal start) — viterbi must route
    # through B or O instead
    L = 5
    logits = np.zeros((1, L, NUM_LABELS), dtype=np.float32)
    logits[0, :, LABEL2ID["O"]] = 1.0
    logits[0, 2, LABEL2ID["IMPORT-I"]] = 2.0
    seq_len = np.array([L - 2])
    tags = viterbi_decode(logits, seq_len, bio_transitions())
    lab = tags[0, 2]
    assert lab != LABEL2ID["IMPORT-I"]


def test_canonical_hot_alias_resolution(corpus_ready):
    """Ambiguous hot alias 'main' must resolve to ent::main (prior 0.9),
    not ent::main_alt (0.4)."""
    from knowledgeextraction_ray.pipelines.queries import q_canonical

    pdf = q_canonical(corpus_ready).to_pandas()
    row = pdf[pdf["surface_norm"] == "main"]
    assert len(row) == 1
    assert row.iloc[0]["entity_id"] == "ent::main"


def test_nre_bag_grouping_planted():
    """Bag aggregation (BagAttention analog): instances group by
    (head, tail) across files; ordinals are per (file, pair); the bag score
    is the score-weighted mean of instance scores."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from knowledgeextraction_ray.stages.nre import nre_bag_pipeline

    f1 = "def f(a):\n    v0 = g(a)\n    v1 = g(a)\n    v2 = h(a)"
    f2 = "def f(b):\n    v0 = g(b)\ndef k(b):\n    v0 = g(b)"
    f3 = "    v9 = orphan(x)\ndef m(c):\n    v0 = g(c)"
    corpus = rd.from_arrow(pa.Table.from_pydict({
        "repo": ["r1", "r2", "r3"],
        "path": ["a.py", "b.py", "c.py"],
        "content": [f1, f2, f3],
    }))
    out = nre_bag_pipeline(corpus).to_pandas().set_index(
        ["head_surface", "tail_surface"]).sort_index()
    # (f, g): 2 instances in r1 (ordinals 1, 2) + 1 in r2 (ordinal 1)
    fg = out.loc[("f", "g")]
    assert fg["n_instances"] == 3 and fg["n_files"] == 2
    # orphan call before any def emits nothing; (m, g) exists
    assert ("m", "g") in out.index
    assert not any(out.index.get_level_values(1) == "orphan")

    def e4(repo, path, head, tail, ordinal):
        h = int(hashlib.md5(
            f"{repo}|{path}|{head}|{tail}|{ordinal}".encode())
            .hexdigest()[:8], 16)
        return 5000 + h % 5000
    scores = [e4("r1", "a.py", "f", "g", 1), e4("r1", "a.py", "f", "g", 2),
              e4("r2", "b.py", "f", "g", 1)]
    assert fg["sum_score_e4"] == sum(scores)
    want = sum(s * s for s in scores) / sum(scores) / 1e4
    assert abs(fg["bag_score"] - want) < 1e-6
