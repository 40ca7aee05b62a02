"""Greedy sequence packing (`stages/text_analysis.pack_training_sequences`):
hand-pinned fold semantics. DuckDB parity for `doc_pack_sequences` runs in
the parametrized TABLE_QUERIES sweep."""

import pandas as pd
import ray.data as rd

from knowledgeextraction_ray.stages.text_analysis import (
    pack_training_sequences)


def _ds(token_counts):
    # doc i gets exactly token_counts[i] single-letter tokens
    rows = [{"doc_id": i, "text": " ".join(["x"] * n)}
            for i, n in enumerate(token_counts)]
    return rd.from_pandas(pd.DataFrame(rows))


def test_pack_fold_semantics(ray_session):
    # one bucket so the fold order is the doc order
    out = (pack_training_sequences(_ds([100, 200, 250, 600, 50, 512]),
                                   max_tokens=512, num_buckets=1)
           .to_pandas().sort_values("doc_id"))
    # 100+200 fit seq0; 250 would overflow (550) -> seq1; 600 overflows
    # alone -> seq2 (over-long doc occupies its own overflowing sequence);
    # 50 -> seq3; 512 would overflow (562) -> seq4 (exact-fit boundary:
    # fill+512 > 512 only because fill=50 > 0)
    assert out["seq_index"].tolist() == [0, 0, 1, 2, 3, 4]
    assert out["tok_offset"].tolist() == [0, 100, 0, 0, 0, 0]
    assert out["n_tokens"].tolist() == [100, 200, 250, 600, 50, 512]


def test_pack_exact_fit_boundary(ray_session):
    # 512 fills the window exactly; the NEXT doc starts a new sequence
    out = (pack_training_sequences(_ds([512, 1]),
                                   max_tokens=512, num_buckets=1)
           .to_pandas().sort_values("doc_id"))
    assert out["seq_index"].tolist() == [0, 1]
    assert out["tok_offset"].tolist() == [0, 0]


def test_pack_buckets_are_independent(ray_session):
    # same totals per bucket -> identical per-bucket packing
    out = (pack_training_sequences(_ds([300, 300, 300, 300]),
                                   max_tokens=512, num_buckets=2)
           .to_pandas().sort_values("doc_id"))
    # bucket 0: docs 0,2 ; bucket 1: docs 1,3 — each pair splits at doc 2
    assert out["bucket"].tolist() == [0, 1, 0, 1]
    assert out["seq_index"].tolist() == [0, 0, 1, 1]
