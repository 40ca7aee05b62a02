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
