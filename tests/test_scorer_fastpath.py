"""predict_tags fast path must equal argmax over the dense logits."""

import numpy as np

from knowledgeextraction_ray.corpus import generate_files
from knowledgeextraction_ray.functions.featurize import featurize_batch
from knowledgeextraction_ray.stages.ner_scorer import RuleCharTagModel
from knowledgeextraction_ray.stages.segmenter import SegmentCorpus


def test_predict_tags_equals_argmax():
    segs = SegmentCorpus()(generate_files(range(200)))
    texts = segs["text"].to_pylist()
    ids, mask, seq_len = featurize_batch(texts, 384)
    m = RuleCharTagModel()
    slow = m.logits(ids, seq_len).argmax(axis=2).astype(np.int8)
    fast = m.predict_tags(ids, seq_len)
    assert np.array_equal(slow, fast)


def test_featurize_dataset_stage(corpus_ready):
    """Staged featurizer (M9 as a Dataset transform): roundtrip + mask."""
    from knowledgeextraction_ray.functions.featurize import recover_text
    from knowledgeextraction_ray.pipelines.kg import read_corpus
    from knowledgeextraction_ray.stages.ner_scorer import featurize_dataset
    from knowledgeextraction_ray.stages.segmenter import segment_dataset

    rows = (featurize_dataset(segment_dataset(read_corpus(corpus_ready)))
            .limit(20).to_pandas())
    for _, r in rows.iterrows():
        assert recover_text(r["input_ids"]) == r["text"][:382]
        assert sum(r["input_mask"]) == min(len(r["text"]), 382) + 2
        assert r["seq_len"] == min(len(r["text"]), 382)


def test_dense_encoder_bounded_and_tag_identical():
    """The numpy mini-encoder (real matmul shapes) adds a bounded dense
    perturbation (|z| <= dense_scale) to the rule emissions, so argmax AND
    Viterbi tags are identical to the rule model's — the flagship stays
    oracle-correct while paying real tensor cost."""
    from knowledgeextraction_ray.stages.ner_scorer import (
        DenseCharTagModel, bio_transitions, viterbi_decode)
    segs = SegmentCorpus()(generate_files(range(60)))
    texts = segs["text"].to_pylist()
    ids, mask, seq_len = featurize_batch(texts, 384)
    rule = RuleCharTagModel()
    dense = DenseCharTagModel()
    pure = DenseCharTagModel(rule_bias=False)
    z = pure.logits(ids, seq_len)
    assert z.shape == (len(texts), 384, 9)
    assert np.abs(z).max() <= pure.scale + 1e-6
    rl = rule.logits(ids, seq_len)
    dl = dense.logits(ids, seq_len)
    assert np.array_equal(rl.argmax(axis=2), dl.argmax(axis=2))
    tr = bio_transitions()
    assert np.array_equal(viterbi_decode(rl, seq_len, tr),
                          viterbi_decode(dl, seq_len, tr))
    # fixed seed → bit-identical logits across fresh instances (actor
    # restarts / batch layout cannot change results)
    assert np.array_equal(z, DenseCharTagModel(rule_bias=False)
                          .logits(ids, seq_len))


def test_flagship_runs_with_dense_encoder(corpus_ready):
    """kg_pipeline with ScorerConfig(model='dense') produces the identical
    triple set (slower by design — every batch pays the matmul)."""
    import pandas as pd

    from knowledgeextraction_ray.config import PipelineConfig, ScorerConfig
    from knowledgeextraction_ray.pipelines.kg import kg_pipeline
    cols = ["subj", "pred", "obj", "n_mentions"]
    a = (kg_pipeline(corpus_ready).to_pandas()[cols]
         .sort_values(cols[:3], kind="mergesort").reset_index(drop=True))
    cfg = PipelineConfig(scorer=ScorerConfig(model="dense"))
    b = (kg_pipeline(corpus_ready, cfg=cfg).to_pandas()[cols]
         .sort_values(cols[:3], kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_viterbi_vectorized_matches_reference():
    """Batch-vectorized Viterbi ≡ the per-row scalar DP on random emissions
    (including transition-forbidden moves and ragged lengths)."""
    from knowledgeextraction_ray.stages.ner_scorer import (
        NUM_LABELS, bio_transitions, viterbi_decode, viterbi_decode_ref)
    rs = np.random.RandomState(7)
    tr = bio_transitions()
    for _ in range(5):
        n, L = rs.randint(1, 20), rs.randint(4, 60)
        logits = rs.standard_normal((n, L, NUM_LABELS)).astype(np.float32)
        seq_len = rs.randint(0, L - 1, size=n).astype(np.int32)
        assert np.array_equal(viterbi_decode(logits, seq_len, tr),
                              viterbi_decode_ref(logits, seq_len, tr))
