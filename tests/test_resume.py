"""Kill-and-resume test (north rule): partial run → resume skips completed
waves → output identical to a clean one-shot run, byte-for-byte."""

import json
import os
import shutil

import pytest


@pytest.fixture()
def out_dirs(tmp_path):
    return str(tmp_path / "run_a"), str(tmp_path / "run_b")


def _file_bytes(d):
    return {f: open(os.path.join(d, "triples", f), "rb").read()
            for f in sorted(os.listdir(os.path.join(d, "triples")))}


def test_kill_resume_byte_identical(corpus_ready, out_dirs):
    from knowledgeextraction_ray.state.lineage import run_resumable_kg
    dir_a, dir_b = out_dirs

    # clean one-shot run
    rep_a = run_resumable_kg(corpus_ready, dir_a, num_waves=3)
    assert rep_a["ran_waves"] == [0, 1, 2]

    # killed run: only 1 wave lands, then "crash"
    rep_b1 = run_resumable_kg(corpus_ready, dir_b, num_waves=3,
                              stop_after_waves=1)
    assert rep_b1.get("stopped_early")
    assert rep_b1["ran_waves"] == [0]

    # resume: completed wave skipped, remaining waves run
    rep_b2 = run_resumable_kg(corpus_ready, dir_b, num_waves=3)
    assert rep_b2["skipped_waves"] == [0]
    assert rep_b2["ran_waves"] == [1, 2]

    # byte-identical final output
    assert _file_bytes(dir_a) == _file_bytes(dir_b)


def test_resume_invalidates_stale_waves(corpus_ready, out_dirs):
    """Changing num_waves (or config / corpus) between runs must NOT
    silently combine stale checkpoints with fresh waves: mismatched
    partitions are removed and recomputed, and the final output equals a
    clean run at the new wave count."""
    from knowledgeextraction_ray.state.lineage import run_resumable_kg
    dir_a, dir_b = out_dirs
    run_resumable_kg(corpus_ready, dir_a, num_waves=2)
    # run b first at 3 waves, then "re-plan" at 2 — every wave's file
    # assignment changes, so all three landed partitions are stale
    run_resumable_kg(corpus_ready, dir_b, num_waves=3)
    rep = run_resumable_kg(corpus_ready, dir_b, num_waves=2)
    assert rep["invalidated_waves"] == [0, 1, 2]
    assert rep["skipped_waves"] == []
    assert rep["ran_waves"] == [0, 1]
    assert _file_bytes(dir_a) == _file_bytes(dir_b)


def test_flagship_degrades_to_wave_path(corpus_ready, tmp_path):
    """kg_pipeline above max_inmemory_bytes must route through the wave
    checkpoints (no full-mention materialize) and produce the same triples
    as the in-memory plan."""
    import pandas as pd

    from knowledgeextraction_ray.pipelines.kg import kg_pipeline
    cols = ["subj", "pred", "obj", "n_mentions"]
    mem = (kg_pipeline(corpus_ready).to_pandas()[cols]
           .sort_values(cols[:3], kind="mergesort").reset_index(drop=True))
    wave = (kg_pipeline(corpus_ready, max_inmemory_bytes=1,
                        wave_out_dir=str(tmp_path / "wv"))
            .to_pandas()[cols]
            .sort_values(cols[:3], kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(mem, wave)


def test_manifest_contents(corpus_ready, tmp_path):
    from knowledgeextraction_ray.state.lineage import run_resumable_kg
    out = str(tmp_path / "run")
    run_resumable_kg(corpus_ready, out, num_waves=2)
    m0 = json.load(open(os.path.join(out, "mentions", "part-0000",
                                     "manifest.json")))
    assert m0["wave"] == 0
    assert m0["counters"]["n_mentions"] > 0
    assert m0["counters"]["n_files_in"] > 0
    assert len(m0["counters"]["sha_min"]) == 64
    assert "config" in m0
    tm = json.load(open(os.path.join(out, "triples", "manifest.json")))
    assert tm["n_triples"] > 0
    # triples match the non-resumable pipeline exactly
    from knowledgeextraction_ray.pipelines.kg import kg_pipeline
    import pyarrow.parquet as pq
    direct = kg_pipeline(corpus_ready).to_pandas()
    import pandas as pd
    parts = [pq.read_table(os.path.join(out, "triples", f)).to_pandas()
             for f in sorted(os.listdir(os.path.join(out, "triples")))
             if f.endswith(".parquet")]
    got = pd.concat(parts, ignore_index=True)
    key = ["subj", "pred", "obj"]
    assert (set(map(tuple, got[key].values))
            == set(map(tuple, direct[key].values)))
    assert tm["n_triples"] == len(direct)


def test_concurrent_waves_byte_identical(corpus_ready, out_dirs):
    """Driving multiple wave jobs from driver threads must land the exact
    same partitions as the serial run (atomic tempdir+rename per wave)."""
    from knowledgeextraction_ray.state.lineage import run_resumable_kg
    dir_a, dir_b = out_dirs
    run_resumable_kg(corpus_ready, dir_a, num_waves=3)
    rep = run_resumable_kg(corpus_ready, dir_b, num_waves=3,
                           max_concurrent_waves=3)
    assert rep["ran_waves"] == [0, 1, 2]
    assert _file_bytes(dir_a) == _file_bytes(dir_b)


def _make_docs_dir(tmp_path, n_shards=4, per_shard=60):
    """Tiny sharded documents table with planted exact/near dups."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    base = ("the quick brown fox jumps of the dog and then the fox runs "
            "to a large house of words with many more tokens inside. ")
    j = 0
    for s in range(n_shards):
        ids, txts = [], []
        for k in range(per_shard):
            if j % 9 == 4:
                t = base * 3                        # exact-dup cluster
            elif j % 9 == 7:
                t = base * 3 + f" tail {j}"         # near-dup of the above
            elif j % 17 == 3:
                t = base + " AKIA" + "B" * 16       # secret
            elif j % 23 == 5:
                t = "x y"                           # low quality
            else:
                t = base.replace("fox", f"tok{j}x") * 3 + f" uniq {j}"
            ids.append(j)
            txts.append(t)
            j += 1
        pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(txts)}),
                       os.path.join(d, f"shard-{s:03d}.parquet"))
    return d


def _verdict_bytes(d):
    vd = os.path.join(d, "verdict")
    return {f: open(os.path.join(vd, f), "rb").read()
            for f in sorted(os.listdir(vd))}


def test_curation_kill_resume_byte_identical(ray_session, tmp_path):
    """Resumable curation (r5): kill after 2 waves → resume → verdict
    partition files byte-identical to a clean one-shot run, and the table
    equals the in-memory curation_pipeline verdict."""
    import ray.data as rd

    from knowledgeextraction_ray.pipelines.curation import curation_pipeline
    from knowledgeextraction_ray.state.lineage import run_resumable_curation
    docs = _make_docs_dir(tmp_path)
    dir_a = str(tmp_path / "cur_a")
    dir_b = str(tmp_path / "cur_b")

    rep_a = run_resumable_curation(docs, dir_a, num_waves=4)
    assert rep_a["ran_waves"] == [0, 1, 2, 3]

    rep_b1 = run_resumable_curation(docs, dir_b, num_waves=4,
                                    stop_after_waves=2)
    assert rep_b1.get("stopped_early")
    rep_b2 = run_resumable_curation(docs, dir_b, num_waves=4)
    assert rep_b2["skipped_waves"] == [0, 1]
    assert rep_b2["ran_waves"] == [2, 3]
    assert _verdict_bytes(dir_a) == _verdict_bytes(dir_b)

    # wave-path verdict ≡ in-memory pipeline verdict
    import pandas as pd
    wave = (rd.read_parquet(os.path.join(dir_a, "verdict"),
                            file_extensions=["parquet"]).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    mem = (curation_pipeline(
        rd.read_parquet(docs, file_extensions=["parquet"])).to_pandas()
        .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(wave, mem[wave.columns])
