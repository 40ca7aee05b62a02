"""Seeded randomized brute-force cross-checks for the round-5 ops:
line_dedup and pack_training_sequences against naive single-process
reference implementations on random corpora."""

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

from knowledgeextraction_ray.stages.dedup import line_dedup
from knowledgeextraction_ray.stages.text_analysis import (
    pack_training_sequences)


def _brute_line_dedup(rows, min_len):
    """Naive reference: global first-occurrence by (path, line_idx)."""
    first = {}
    for path, content in sorted(rows):
        for idx, line in enumerate(content.split("\n")):
            if len(line) >= min_len and line not in first:
                first[line] = (path, idx)
    out = {}
    for path, content in rows:
        kept = []
        n = dropped = 0
        for idx, line in enumerate(content.split("\n")):
            n += 1
            if len(line) >= min_len and first.get(line) != (path, idx):
                dropped += 1
            else:
                kept.append(line)
        out[path] = (n, n - dropped, dropped,
                     hashlib.sha256("\n".join(kept).encode()).hexdigest())
    return out


def test_line_dedup_matches_brute_force(ray_session):
    rs = np.random.RandomState(17)
    pool = [f"line body number {i} with sufficient length" for i in range(8)]
    for trial in range(4):
        rows = []
        for f in range(20):
            n_lines = rs.randint(1, 7)
            lines = [pool[rs.randint(len(pool))] if rs.rand() < 0.6
                     else f"unique {trial}-{f}-{j} {'x' * rs.randint(0, 30)}"
                     for j in range(n_lines)]
            rows.append((f"f{f:03d}", "\n".join(lines)))
        expect = _brute_line_dedup(rows, 20)
        ds = rd.from_pandas(pd.DataFrame(
            [{"path": p, "content": c} for p, c in rows]))
        got = line_dedup(ds, min_len=20).to_pandas().set_index("path")
        for path, (n, kept, dropped, sha) in expect.items():
            row = got.loc[path]
            assert (row["n_lines"], row["kept_lines"],
                    row["dropped_lines"], row["text_sha256"]) == \
                (n, kept, dropped, sha), path


def _brute_pack(tokens_by_doc, max_tokens, num_buckets):
    out = {}
    by_bucket = {}
    for doc_id, n in sorted(tokens_by_doc):
        by_bucket.setdefault(doc_id % num_buckets, []).append((doc_id, n))
    for b, docs in by_bucket.items():
        seq = fill = 0
        for doc_id, n in docs:
            if fill > 0 and fill + n > max_tokens:
                seq += 1
                fill = 0
            out[doc_id] = (b, seq, fill, n)
            fill += n
    return out


def test_pack_sequences_matches_brute_force(ray_session):
    rs = np.random.RandomState(23)
    for trial in range(3):
        counts = [(i, int(rs.randint(0, 40))) for i in range(60)]
        rows = [{"doc_id": i, "text": " ".join(["tok"] * n)}
                for i, n in counts]
        got = (pack_training_sequences(rd.from_pandas(pd.DataFrame(rows)),
                                       max_tokens=64, num_buckets=4)
               .to_pandas().set_index("doc_id"))
        expect = _brute_pack(counts, 64, 4)
        for doc_id, (b, seq, off, n) in expect.items():
            row = got.loc[doc_id]
            assert (row["bucket"], row["seq_index"],
                    row["tok_offset"], row["n_tokens"]) == (b, seq, off, n)


def _brute_substring_dedup(rows, k):
    """Naive reference for substring_dedup: first occurrence of each
    duplicated k-gram by (path, pos); merged fixed-length windows."""
    first, counts = {}, {}
    for path, content in sorted(rows):
        for p in range(len(content) - k + 1):
            gram = content[p:p + k]
            counts[gram] = counts.get(gram, 0) + 1
            first.setdefault(gram, (path, p))
    out = {}
    for path, content in rows:
        covered = [p for p in range(len(content) - k + 1)
                   if counts[content[p:p + k]] >= 2
                   and first[content[p:p + k]] != (path, p)]
        spans = []
        for p in covered:
            if spans and p <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + k))
            else:
                spans.append((p, p + k))
        kept, prev = [], 0
        for s, e in spans:
            kept.append(content[prev:s])
            prev = e
        kept.append(content[prev:])
        out[path] = (len(content), sum(e - s for s, e in spans), len(spans),
                     hashlib.sha256("".join(kept).encode()).hexdigest())
    return out


def test_substring_dedup_matches_brute_force(ray_session):
    from knowledgeextraction_ray.stages.dedup import substring_dedup
    rs = np.random.RandomState(29)
    K = 16
    motif = "SHARED-MOTIF-" + "z" * 20      # long duplicated block
    for trial in range(3):
        rows = []
        for f in range(12):
            parts = []
            for _ in range(rs.randint(2, 5)):
                if rs.rand() < 0.5:
                    parts.append(motif)
                parts.append("".join(chr(97 + c) for c in
                                     rs.randint(0, 26, rs.randint(5, 40))))
            rows.append((f"f{f:02d}", " ".join(parts)))
        expect = _brute_substring_dedup(rows, K)
        ds = rd.from_pandas(pd.DataFrame(
            [{"path": p, "content": c} for p, c in rows]))
        got = (substring_dedup(ds, k=K).to_pandas().set_index("path"))
        for path, (n, removed, spans, sha) in expect.items():
            row = got.loc[path]
            assert (row["n_chars"], row["removed_chars"],
                    row["n_spans"], row["text_sha256"]) == \
                (n, removed, spans, sha), path


def test_substring_dedup_distributed_path_equal(ray_session):
    """The bucketed distributed combine (custom lexsort+reduceat, not the
    generic string-min bucketed_agg) must reproduce the driver merge."""
    from knowledgeextraction_ray.stages.dedup import substring_dedup
    rs = np.random.RandomState(31)
    motif = "ANOTHER-SHARED-MOTIF-" + "q" * 16
    rows = []
    for f in range(15):
        parts = [motif if rs.rand() < 0.5 else
                 "".join(chr(97 + c) for c in rs.randint(0, 26, 30))
                 for _ in range(4)]
        rows.append({"path": f"g{f:02d}", "content": " ".join(parts)})
    ds = rd.from_pandas(pd.DataFrame(rows))
    base = (substring_dedup(ds, k=16, mode="driver")
            .to_pandas().sort_values("path").reset_index(drop=True))
    alt = (substring_dedup(ds, k=16, mode="distributed")
           .to_pandas().sort_values("path").reset_index(drop=True))
    assert base.equals(alt[base.columns])
