"""CRF transition training (stages/crf_train): kernel parity, convergence,
NLL behavior, edge-case semantics, and hand-built-corpus oracle parity.

The trained object is the analog of the reference's learned
``transition_params`` (``/root/reference/knowledgeextractor/nermodels/
crf_albert.py:147-168``); the loop is the estimator train/eval/best-ckpt
cycle (``test/albertNER/run_crf_albert.py:197-295``) restated as
structured-perceptron epochs with iterative parameter mixing.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from knowledgeextraction_ray.functions.crf import (bigram_counts, crf_nll,
                                                   crf_nll_ref,
                                                   viterbi_payload,
                                                   viterbi_payload_ref)
from knowledgeextraction_ray.stages.crf_train import (build_emissions,
                                                      featurize_crf_batch,
                                                      train_crf_transitions,
                                                      transitions_frame,
                                                      _padded)
from knowledgeextraction_ray.stages.ner_scorer import (LABEL2ID, LABEL_LIST,
                                                       NUM_LABELS)


def test_viterbi_payload_matches_ref():
    """Batch Viterbi ≡ scalar reference, including ties (small-int
    emissions/transitions make ties common) and zero-length rows."""
    rs = np.random.RandomState(7)
    for _ in range(30):
        n, L, K = rs.randint(1, 7), rs.randint(1, 10), rs.randint(2, 7)
        em = rs.randint(0, 4, size=(n, L, K)).astype(np.float64)
        lens = rs.randint(0, L + 1, size=n)
        T = rs.randint(-2, 3, size=(K, K)).astype(np.float64)
        assert (viterbi_payload(em, lens, T) ==
                viterbi_payload_ref(em, lens, T)).all()


def test_crf_nll_matches_ref():
    rs = np.random.RandomState(11)
    for _ in range(20):
        n, L, K = rs.randint(1, 6), rs.randint(1, 9), rs.randint(2, 6)
        em = rs.standard_normal((n, L, K))
        lens = rs.randint(0, L + 1, size=n)
        T = rs.standard_normal((K, K))
        tags = np.zeros((n, L), np.int64)
        for i in range(n):
            tags[i, :lens[i]] = rs.randint(0, K, size=lens[i])
        assert np.allclose(crf_nll(em, tags, lens, T),
                           crf_nll_ref(em, tags, lens, T))


def test_bigram_counts_matches_naive():
    rs = np.random.RandomState(3)
    n, L, K = 6, 12, 5
    tags = rs.randint(0, K, size=(n, L)).astype(np.int8)
    lens = rs.randint(0, L + 1, size=n)
    naive = np.zeros((K, K), np.int64)
    for i in range(n):
        for t in range(int(lens[i]) - 1):
            naive[tags[i, t], tags[i, t + 1]] += 1
    assert (bigram_counts(tags, lens, K) == naive).all()


def _records(rows):
    """[(guid, labels)] → tagger-record Table (text is len-matched filler —
    the trainer consumes only token_labels)."""
    return pa.Table.from_pydict({
        "guid": [g for g, _ in rows],
        "text": ["x" * len(ls) for _, ls in rows],
        "token_labels": [ls for _, ls in rows],
    })


def _labels(spec, n):
    """span spec [(type, s, e)] over length n → per-char BIO labels."""
    out = ["O"] * n
    for t, s, e in spec:
        out[s] = f"{t}-B"
        for i in range(s + 1, e):
            out[i] = f"{t}-I"
    return out


EDGE_ROWS = [
    # len-1 span mid-sequence, len-1 span at END of sequence
    ("r0", _labels([("IMPORT", 2, 3), ("CALL", 7, 8)], 8)),
    # span at position 0 (never occurs in the grammar corpus) + to seq end
    ("r1", _labels([("FUNC", 0, 3), ("CLASS", 5, 9)], 9)),
    # ADJACENT spans, same and different type (cross-type I→B bigrams)
    ("r2", _labels([("FUNC", 1, 4), ("CALL", 4, 7), ("CALL", 7, 10)], 11)),
    # no spans at all
    ("r3", ["O"] * 6),
    # len-2 span (I→I count is zero for it)
    ("r4", _labels([("CLASS", 3, 5)], 7)),
]

# malformed gold (I after O) is featurized with bio_to_spans chunk
# semantics but is INCONSISTENT training data (the emission model marks the
# chunk start, gold insists on I) — the perceptron rightly never converges
# on it, so it's pinned in the featurizer test only
MALFORMED_ROW = ("r5", ["O", "IMPORT-I", "IMPORT-I", "O"])


def test_featurizer_matches_bio_to_spans():
    """Vectorized span extraction ≡ functions/bio.bio_to_spans on every
    edge row, including the malformed I-after-O start."""
    from knowledgeextraction_ray.functions.bio import bio_to_spans
    rows = EDGE_ROWS + [MALFORMED_ROW]
    f = featurize_crf_batch(_records(rows)).to_pydict()
    types = [lab[:-2] for lab in LABEL_LIST if lab.endswith("-B")]
    for i, (_, ls) in enumerate(rows):
        want = bio_to_spans(ls)
        got = [(types[t], s, e) for s, e, t in
               zip(f["sp_s"][i], f["sp_e"][i], f["sp_t"][i])]
        assert got == want, (i, got, want)
        assert f["gold"][i] == [LABEL2ID[l] for l in ls]


def test_train_converges_and_learns_bio_on_edges(ray_session):
    """One epoch of sign updates makes decode ≡ gold even on adjacent
    spans, boundary spans, and len-1 spans; epoch metrics reflect it; the
    learned matrix separates B→I from B→B on every trained type."""
    train = rd.from_arrow(_records(EDGE_ROWS))
    dev = rd.from_arrow(_records(EDGE_ROWS))      # eval on the same set
    metrics, T = train_crf_transitions(train, dev, epochs=3, with_nll=True)
    assert metrics["epoch"].tolist() == [0, 1, 2]
    assert metrics.loc[0, "mismatch_chars"] > 0
    assert (metrics.loc[1:, "mismatch_chars"] == 0).all()
    assert (metrics.loc[1:, "delta_l1"] == 0).all()
    assert metrics.loc[1, "f1_e6"] == 10**6
    assert metrics["is_best"].tolist() == [0, 1, 0]
    # NLL improves once transitions are learned (crf_log_likelihood analog)
    assert metrics.loc[1, "train_nll"] < metrics.loc[0, "train_nll"]
    # T1 == T2, so epoch 2's NLL re-measures the same model (float partials
    # may merge in a different block order → tolerance, not equality)
    assert np.isclose(metrics.loc[1, "train_nll"],
                      metrics.loc[2, "train_nll"])
    # types with an n>=2 train span learn the continuation cell; IMPORT has
    # only len-1 spans here, so its cells rightly stay 0 (nothing to learn —
    # the documented per-type-coverage assumption of the closed form)
    for typ in ("CLASS", "FUNC", "CALL"):
        b, i = LABEL2ID[f"{typ}-B"], LABEL2ID[f"{typ}-I"]
        assert T[b, i] > T[b, b], typ
    ib = LABEL2ID["IMPORT-B"]
    assert T[ib, LABEL2ID["IMPORT-I"]] == 0 and T[ib, ib] == 0
    tf = transitions_frame(T)
    assert len(tf) == NUM_LABELS * NUM_LABELS
    # cross-type adjacency learned: CALL-I → CALL-B beats CALL-B → CALL-B
    assert T[LABEL2ID["FUNC-I"], LABEL2ID["CALL-B"]] >= 0


def test_epoch0_decode_is_perchar_argmax(ray_session):
    """With zero transitions, batch Viterbi over the continuation-blind
    emissions tags every span char B (argmax, first-index tie-break) — the
    closed form the SQL oracle's epoch-0 row is built on."""
    f = featurize_crf_batch(_records(EDGE_ROWS))
    gold, lens, _, spans, Lmax = _padded(f)
    em = build_emissions(lens, spans, Lmax)
    dec = viterbi_payload(em, lens, np.zeros((NUM_LABELS, NUM_LABELS)))
    expect = em.argmax(axis=2).astype(np.int8)
    mask = np.arange(Lmax)[None, :] < lens[:, None]
    assert (dec[mask] == expect[mask]).all()
    # every span char decodes to the B label of its type
    r, s, t = spans["row"], spans["sp_s"], spans["sp_t"]
    for k in range(len(r)):
        for p in range(int(s[k]), int(spans["sp_e"][k])):
            assert dec[r[k], p] == 1 + 2 * t[k]


# brute-forced so each record's content-keyed split bucket lands where the
# shape is needed (train < 90, dev in [90, 93)) — see md5(sha256:0) % 100
EDGE_CORPUS = [
    ("import x\nrest of line 0", "train len-1 span mid-text"),
    ("import x\nrest of line 26", "dev len-1 span mid-text"),
    ("pad 0\nimport tail", "train span at content end (hn=0)"),
    ("pad 6\nimport tail", "dev span at content end"),
    # fnq is n=3 deliberately: a dev span of length ≥3 needs the type's
    # I→I cell TAUGHT by train (Σ(n−2) > 0) or epoch-1 decode alternates
    # B-I-B-I through the untaught cell — the per-cell coverage assumption
    ("import abc0\nclass Bc:\ndef fnq(x):\nq = call(z)\n",
     "train n>=2 spans of all four types (FUNC/IMPORT/CALL at n>=3)"),
    ("import abc5\nclass Bc:\ndef fnq(x):\nq = call(z)\n",
     "dev n>=2 spans of all four types"),
    ("import ab\nfiller 0", "train len-2 span"),
    ("plain text with no grammar 0", "train no-span doc"),
    ("plain text with no grammar 48", "dev no-span doc"),
    ("def devfn44(y):\nmore", "dev n>=3 FUNC span"),
]


def test_crf_oracle_parity_edge_corpus(ray_session, tmp_path):
    """The closed-form SQL oracle holds beyond the generated corpus: len-1
    spans (in train AND dev — exercising the n==1 correct-chunk term),
    spans ending at the segment boundary (hn=0), len-2 spans, and no-span
    docs — real trainer ≡ oracle on a hand-built corpus parquet, value-
    compared the driver way."""
    import hashlib

    import pyarrow.parquet as pq

    from knowledgeextraction_ray.compare import compare
    from knowledgeextraction_ray.oracle import (sql_crf_train_run,
                                                sql_crf_transitions)
    from knowledgeextraction_ray.pipelines.prep import (prep_pipeline,
                                                        split_bucket)
    from knowledgeextraction_ray.pipelines.queries import docs_from_corpus

    # preconditions: the brute-forced contents still land in their buckets
    buckets = {}
    for content, note in EDGE_CORPUS:
        sha = hashlib.sha256(content.encode()).hexdigest()
        buckets[note] = split_bucket(f"{sha}:0")
    for note, b in buckets.items():
        if note.startswith("train"):
            assert b < 90, (note, b)
        else:
            assert 90 <= b < 93, (note, b)

    tbl = pa.table({
        "repo": [f"edge/r{i}" for i in range(len(EDGE_CORPUS))],
        "path": [f"f{i}.py" for i in range(len(EDGE_CORPUS))],
        "content": [c for c, _ in EDGE_CORPUS],
    })
    pq.write_table(tbl, tmp_path / "edge.parquet")
    docs = rd.from_arrow(tbl).map_batches(docs_from_corpus,
                                          batch_format="pyarrow")
    train, dev, _ = prep_pipeline(docs)
    metrics, T = train_crf_transitions(train, dev)
    corpus = str(tmp_path / "edge.parquet")
    ok, msg = compare(metrics.drop(columns=["train_nll"]),
                      sql_crf_train_run("unused", corpus=corpus))
    assert ok, msg
    ok, msg = compare(transitions_frame(T),
                      sql_crf_transitions("unused", corpus=corpus))
    assert ok, msg
    # the planted shapes really showed up: dev has a correct len-1 chunk at
    # epoch 0, and training still converges by epoch 1
    assert metrics.loc[0, "correct_chunks"] >= 1
    assert metrics.loc[1, "f1_e6"] == 10**6


def test_train_resume_equals_fresh(ray_session, tmp_path):
    """Epoch checkpointing (the reference's estimator ckpt loop at epoch
    granularity): run 2 epochs with a resume dir, rerun asking for 3 —
    only epoch 2 recomputes, and the result is bit-for-bit the fresh
    3-epoch run (every epoch quantity is integer-exact)."""
    import json

    train = rd.from_arrow(_records(EDGE_ROWS))
    dev = rd.from_arrow(_records(EDGE_ROWS))
    rdir = str(tmp_path / "ckpt")
    m2, _ = train_crf_transitions(train, dev, epochs=2, resume_dir=rdir)
    assert len(m2) == 2
    state = json.load(open(tmp_path / "ckpt" / "crf_train_state.json"))
    assert len(state["epochs"]) == 2
    m3r, Tr = train_crf_transitions(train, dev, epochs=3, resume_dir=rdir)
    m3f, Tf = train_crf_transitions(train, dev, epochs=3)
    pd.testing.assert_frame_equal(m3r.drop(columns=["train_nll"]),
                                  m3f.drop(columns=["train_nll"]))
    assert (Tr == Tf).all()
    # shrinking works too: epochs=1 from the 3-epoch checkpoint returns
    # the epoch-0 state (T after the first update), nothing recomputed
    m1, T1 = train_crf_transitions(train, dev, epochs=1, resume_dir=rdir)
    assert len(m1) == 1 and m1.loc[0, "is_best"] == 1
    assert (T1 == np.asarray(
        json.load(open(tmp_path / "ckpt" / "crf_train_state.json"))
        ["epochs"][0]["T_after"])).all()


def test_train_cached_features_equal_inmemory(ray_session, tmp_path):
    """Durable feature cache (r5, the reference's TFRecord cache S6/S16):
    cached epochs stream from Parquet and must equal the in-memory run
    bit-for-bit; a rerun reuses the landed cache (no re-featurize), and
    cached + resume together still equal fresh."""
    import json
    import os

    train = rd.from_arrow(_records(EDGE_ROWS))
    dev = rd.from_arrow(_records(EDGE_ROWS))
    cdir = str(tmp_path / "feats")
    mc, Tc = train_crf_transitions(train, dev, epochs=3, cache_dir=cdir)
    mf, Tf = train_crf_transitions(train, dev, epochs=3)
    pd.testing.assert_frame_equal(mc.drop(columns=["train_nll"]),
                                  mf.drop(columns=["train_nll"]))
    assert (Tc == Tf).all()
    assert os.path.exists(os.path.join(cdir, "train", "_DONE"))
    # rerun reuses the cache: mutate a cache-dir sentinel and check it
    # survives (rename-on-rebuild would remove it)
    probe = os.path.join(cdir, "train", "_probe")
    open(probe, "w").write("x")
    mc2, Tc2 = train_crf_transitions(train, dev, epochs=3, cache_dir=cdir)
    assert os.path.exists(probe)
    assert (Tc2 == Tf).all()
    # cached + epoch-resume ≡ fresh
    rdir = str(tmp_path / "ckpt")
    train_crf_transitions(train, dev, epochs=2, resume_dir=rdir,
                          cache_dir=cdir)
    mr, Tr = train_crf_transitions(train, dev, epochs=3, resume_dir=rdir,
                                   cache_dir=cdir)
    pd.testing.assert_frame_equal(mr.drop(columns=["train_nll"]),
                                  mf.drop(columns=["train_nll"]))
    assert (Tr == Tf).all()


def test_trained_transitions_serve_equals_constraint_decode(corpus_ready):
    """Train → serve: Viterbi inference with the LEARNED matrix equals the
    hand-coded-BIO-constraint decode on the real corpus (margins ≥ 5 beat
    any ±2 transition swing) — the invariant that lets
    ner_predictions_trained share ner_predictions' SQL gate."""
    from knowledgeextraction_ray.pipelines.queries import (
        q_ner_predictions, q_ner_predictions_trained)
    a = q_ner_predictions(corpus_ready).to_pandas() \
        .sort_values("guid").reset_index(drop=True)
    b = q_ner_predictions_trained(corpus_ready).to_pandas() \
        .sort_values("guid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# Float-SGD mode (r5): the literal crf_log_likelihood gradient
# ---------------------------------------------------------------------------

def test_expected_counts_batch_matches_ref():
    from knowledgeextraction_ray.functions.crf import (
        crf_expected_counts, crf_expected_counts_ref)
    rs = np.random.RandomState(3)
    N, L, K = 7, 9, 5
    em = rs.uniform(-2, 2, (N, L, K))
    lens = rs.randint(1, L + 1, N)
    lens[0], lens[1], lens[2] = L, 1, 2          # full / degenerate edges
    tr = rs.uniform(-1, 1, (K, K))
    a = crf_expected_counts_ref(em, lens, tr)
    b = crf_expected_counts(em, lens, tr)
    assert np.abs(a - b).max() < 1e-10


def test_sgd_gradient_matches_finite_differences():
    """expected − observed IS ∂NLL/∂trans: checked cell-by-cell against
    central finite differences of the forward-algorithm NLL."""
    from knowledgeextraction_ray.functions.crf import crf_expected_counts
    rs = np.random.RandomState(11)
    N, L, K = 5, 7, 4
    em = rs.uniform(-2, 2, (N, L, K))
    lens = rs.randint(2, L + 1, N)
    tr = rs.uniform(-1, 1, (K, K))
    tags = rs.randint(0, K, (N, L))
    obs = bigram_counts(tags.astype(np.int8), lens, K)
    grad = crf_expected_counts(em, lens, tr) - obs
    eps = 1e-6
    for u in range(K):
        for v in range(K):
            tp_ = tr.copy(); tp_[u, v] += eps
            tm = tr.copy(); tm[u, v] -= eps
            fd = (crf_nll(em, tags.astype(np.int64), lens, tp_).sum()
                  - crf_nll(em, tags.astype(np.int64), lens, tm).sum()) \
                / (2 * eps)
            assert abs(fd - grad[u, v]) < 1e-4, (u, v)


def test_sgd_training_descends_and_matches_perceptron_decode(ray_session):
    """The SGD mode on the edge corpus: NLL strictly decreases epoch over
    epoch, and the converged float matrix decodes the dev set EXACTLY like
    the converged perceptron matrix (same conlleval counts, F1 = 1)."""
    from knowledgeextraction_ray.stages.crf_train import (
        train_crf_transitions_sgd)
    train = rd.from_arrow(_records(EDGE_ROWS))
    dev = rd.from_arrow(_records(EDGE_ROWS))
    metrics, T = train_crf_transitions_sgd(train, dev, epochs=5, lr=4.0)
    nll = metrics["train_nll"].tolist()
    assert all(nll[i + 1] < nll[i] for i in range(len(nll) - 1)), nll
    assert metrics.loc[len(metrics) - 1, "f1_e6"] == 10**6
    pm, PT = train_crf_transitions(train, dev, epochs=2)
    feat = featurize_crf_batch(_records(EDGE_ROWS))
    gold, lens, _, spans, Lmax = _padded(feat)
    em = build_emissions(lens, spans, Lmax)
    dec_sgd = viterbi_payload(em, lens, T)
    dec_perc = viterbi_payload(em, lens, PT.astype(np.float64))
    assert np.array_equal(dec_sgd, dec_perc)
    assert np.array_equal(dec_sgd, gold)


def test_sgd_resume_equals_fresh(ray_session, tmp_path):
    """Killed-and-resumed SGD ≡ fresh: float epochs are deterministic
    (part_key-ordered partial sums + JSON float64 round-trip)."""
    from knowledgeextraction_ray.stages.crf_train import (
        train_crf_transitions_sgd)
    train = rd.from_arrow(_records(EDGE_ROWS))
    dev = rd.from_arrow(_records(EDGE_ROWS))
    m_fresh, T_fresh = train_crf_transitions_sgd(train, dev, epochs=4,
                                                 lr=2.0)
    rdir = str(tmp_path / "sgd_ckpt")
    train_crf_transitions_sgd(train, dev, epochs=2, lr=2.0, resume_dir=rdir)
    m_res, T_res = train_crf_transitions_sgd(train, dev, epochs=4, lr=2.0,
                                             resume_dir=rdir)
    assert np.array_equal(T_fresh, T_res)
    pd.testing.assert_frame_equal(m_fresh, m_res)
