"""Block-scope dedup must equal global-scope dedup on the flagship corpus
(the partitioning invariant it relies on)."""

import pandas as pd


def test_block_scope_equals_global(corpus_ready):
    from knowledgeextraction_ray.pipelines.kg import (canonical_map_of,
                                                      linked_mentions)
    from knowledgeextraction_ray.stages.canonicalize import (
        canonicalize_dataset)
    from knowledgeextraction_ray.stages.triples import triples_dataset

    linked = linked_mentions(corpus_ready).materialize()
    cmap = canonical_map_of(canonicalize_dataset(linked))
    cols = ["subj", "pred", "obj", "repo", "path", "commit",
            "content_sha256", "n_mentions"]
    g = (triples_dataset(linked, cmap, scope="global").to_pandas()[cols]
         .sort_values(cols[:3], kind="mergesort").reset_index(drop=True))
    b = (triples_dataset(linked, cmap, scope="block").to_pandas()[cols]
         .sort_values(cols[:3], kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(g, b)
