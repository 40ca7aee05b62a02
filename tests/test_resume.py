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
