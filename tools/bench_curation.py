"""Curation-flagship headroom bench: ≥1M docs with a per-stage breakdown.

The kg flagship has 2M-file headroom evidence; this gives `doc_curation`
(`pipelines/curation.py`) the same (r3 verdict item 7). Generates a
deterministic 1M-doc documents table under ``/tmp/kgray_docs/<n>/``
(seeded per shard — identical however sharded), with planted duplicate
structure so the dedup stages do real work: ~6% exact duplicates and ~10%
near-duplicates (one mutated token), Zipf word pools for realistic shingle
overlap.

Usage: ``python tools/bench_curation.py [n_docs]`` (default 1_000_000).
Prints one JSON line: total wall, per-stage walls (gates / exact-dedup /
near-dedup / join+verdict — each timed by consuming that stage's
sub-pipeline in isolation, so stage walls overlap-free but sum > total
is expected when stages share scans), verdict histogram.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/kgray_docs"
SHARD = 25_000

# word pool: random letter strings (NOT templated ids, NOT Zipf) so two
# random docs share almost no char-5-gram shingles — templated "tokNNNN"
# words put structural shingles in every doc and Zipf pools share hot
# words, either of which floods the LSH bands with candidate pairs no
# real corpus would produce (measured: 9M candidates for 50k docs)
_wrs = np.random.RandomState(1234)
_WORDS = ["".join(chr(97 + c) for c in _wrs.randint(0, 26,
                                                    _wrs.randint(4, 9)))
          for _ in range(8000)]
# glue words keep the quality gate's stopword-ratio test honest
_GLUE = ["the", "a", "of", "and", "to", "in", "is"]


def _doc_text(rs: np.random.RandomState) -> str:
    n = rs.randint(40, 120)
    ranks = rs.randint(0, len(_WORDS), size=n)
    words = [_WORDS[r] for r in ranks]
    for i in range(0, n, 6):
        words[i] = _GLUE[int(ranks[i]) % len(_GLUE)]
    return " ".join(words)


def _base_text(j: int, seed: int = 97) -> str:
    """Branch-independent base text for doc ``j`` — dup/near-dup branches
    reference it directly, so an exact dup really is byte-identical to its
    source (a source drawing its OWN branch first would desync the RNG)."""
    return _doc_text(np.random.RandomState((seed * 2_000_003 + j) % 2**32))


def _gen_shard(si: int, lo: int, hi: int, seed: int = 97) -> pa.Table:
    rows_id, rows_tx = [], []
    for j in range(lo, hi):
        rs = np.random.RandomState((seed * 1_000_003 + j) % 2**32)
        r = rs.rand()
        if r < 0.06 and j >= 100:
            # exact duplicate of an earlier doc's base text
            src = int(rs.randint(0, j // 2))
            text = _base_text(src, seed)
        elif r < 0.16 and j >= 100:
            # near-duplicate: one token appended
            src = int(rs.randint(0, j // 2))
            text = _base_text(src, seed) + " " + \
                _WORDS[int(rs.randint(len(_WORDS)))]
        else:
            text = _base_text(j, seed)
            if rs.rand() < 0.002:       # planted AWS key for the gate
                text += " AKIA" + "".join(
                    chr(65 + c) for c in rs.randint(0, 26, 16))
        rows_id.append(j)
        rows_tx.append(text)
    return pa.table({"doc_id": pa.array(rows_id, pa.int64()),
                     "text": pa.array(rows_tx, pa.string())})


def ensure_docs(n_docs: int) -> str:
    import ray
    out = os.path.join(ROOT, str(n_docs))
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)

    @ray.remote
    def gen(si, lo, hi):
        tbl = _gen_shard(si, lo, hi)
        pq.write_table(tbl, os.path.join(out, f"shard-{si:05d}.parquet"))
        return si

    refs = [gen.remote(si, lo, min(lo + SHARD, n_docs))
            for si, lo in enumerate(range(0, n_docs, SHARD))]
    ray.get(refs)
    open(done, "w").write("ok")
    return out


def main() -> None:
    import ray
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from knowledgeextraction_ray.pipelines.curation import (_gates_batch,
                                                            curation_pipeline)
    from knowledgeextraction_ray.stages.dedup import minhash_dedup_keep

    path = ensure_docs(n_docs)
    read = lambda: rd.read_parquet(path, file_extensions=["parquet"])  # noqa
    read().count()                      # warm page cache (untimed)

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    # headline FIRST (the number that matters survives a later crash)
    t = time.perf_counter()
    out = curation_pipeline(read())
    pdf = out.groupby("reason").count().to_pandas()
    total = round(time.perf_counter() - t, 2)
    hist = dict(zip(pdf["reason"], pdf["count()"].astype(int)))
    log(f"HEADLINE total={total}s reasons={hist}")

    stages = {}
    t0 = time.perf_counter()
    ds = read().materialize()
    stages["read_materialize"] = round(time.perf_counter() - t0, 2)
    log(f"stage read_materialize={stages['read_materialize']}")

    t = time.perf_counter()
    ds.map_batches(_gates_batch, batch_format="pyarrow").count()
    stages["gates"] = round(time.perf_counter() - t, 2)
    log(f"stage gates={stages['gates']}")

    t = time.perf_counter()
    from knowledgeextraction_ray.functions.hashing import sha256_column

    def sha_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"],
                         "text_sha": sha256_column(batch["text"])})
    ds.map_batches(sha_rows, batch_format="pyarrow").count()
    stages["exact_sha_scan"] = round(time.perf_counter() - t, 2)
    log(f"stage exact_sha_scan={stages['exact_sha_scan']}")

    t = time.perf_counter()
    minhash_dedup_keep(ds, threshold=0.7).count()
    stages["near_dedup_keep"] = round(time.perf_counter() - t, 2)
    log(f"stage near_dedup_keep={stages['near_dedup_keep']}")

    print(json.dumps({"metric": "curation_headroom", "n_docs": n_docs,
                      "num_cpus": ncpu, "total_sec": total,
                      "docs_per_sec": round(n_docs / total, 1),
                      "stage_sec": stages, "reasons": hist}),
          flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
