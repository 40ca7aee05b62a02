"""Cross-document line dedup (C4/RefinedWeb-style): planted semantics +
driver ≡ distributed ≡ join path equality. The DuckDB value-hash parity for
`corpus_line_dedup` runs in test_kg_pipeline's parametrized oracle sweep."""

import hashlib

import pandas as pd
import ray.data as rd

from knowledgeextraction_ray.stages.dedup import line_dedup

LONG_A = "this line is long enough to be eligible AAAA"
LONG_B = "this line is long enough to be eligible BBBB"
SHORT = "short dup"  # < 20 chars: always kept, even repeated


def _planted_ds():
    rows = [
        # file f1 owns the first occurrence of LONG_A (idx 1) and SHORT
        {"path": "f1", "content": f"{SHORT}\n{LONG_A}\n{SHORT}"},
        # f2 repeats LONG_A (dropped) and owns LONG_B (kept)
        {"path": "f2", "content": f"{LONG_A}\n{LONG_B}"},
        # f3 repeats both long lines (both dropped) around a unique line
        {"path": "f3", "content": f"{LONG_B}\nunique middle line that stays\n{LONG_A}"},
        # f4: only repeated short lines — nothing eligible, all kept
        {"path": "f4", "content": f"{SHORT}\n{SHORT}"},
        # f5: every line is a dropped duplicate → empty reassembly
        {"path": "f5", "content": LONG_A},
    ]
    return rd.from_pandas(pd.DataFrame(rows))


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_line_dedup_planted_semantics(ray_session):
    out = (line_dedup(_planted_ds(), mode="driver")
           .to_pandas().set_index("path").sort_index())
    # f1: first owner of LONG_A keeps everything
    assert out.loc["f1", "dropped_lines"] == 0
    assert out.loc["f1", "text_sha256"] == _sha(f"{SHORT}\n{LONG_A}\n{SHORT}")
    # f2: LONG_A repeated → dropped; LONG_B first → kept
    assert out.loc["f2", "kept_lines"] == 1
    assert out.loc["f2", "text_sha256"] == _sha(LONG_B)
    # f3: both long lines dropped, unique middle kept
    assert out.loc["f3", "kept_lines"] == 1
    assert out.loc["f3", "text_sha256"] == _sha("unique middle line that stays")
    # f4: short lines never dedup
    assert out.loc["f4", "dropped_lines"] == 0
    # f5: all lines dropped → empty text, counts still right
    assert (out.loc["f5", "n_lines"], out.loc["f5", "kept_lines"]) == (1, 0)
    assert out.loc["f5", "text_sha256"] == _sha("")


def test_line_dedup_paths_equal(ray_session):
    """The size-gate flip is a pure scale decision: all three execution
    paths produce identical frames on the same input."""
    base = (line_dedup(_planted_ds(), mode="driver")
            .to_pandas().sort_values("path").reset_index(drop=True))
    for mode in ("distributed", "join"):
        alt = (line_dedup(_planted_ds(), mode=mode)
               .to_pandas().sort_values("path").reset_index(drop=True))
        assert base.equals(alt[base.columns]), mode
