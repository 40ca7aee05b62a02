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
