"""Per-partition lineage, counters and resume (north rule; SURVEY.md §4).

The reference's only resume machinery is checkpoint-file bookkeeping
(``run_crf_albert.py:197-295``) and load-if-exists feature caches
(``run_mrc_albert.py:281-308``). Here resume is first-class:

- The input corpus (many Parquet shards) is split into **waves** —
  contiguous groups of input files. Each wave runs the expensive extraction
  stages (segment → score → mention → link) as ONE streaming Dataset job and
  lands its linked mentions under ``out/mentions/part-<wave>/`` ATOMICALLY
  (write to a temp dir, rename), next to a ``manifest.json`` recording the
  exact input files, row counters, content-sha range and the pipeline config.
- On re-run, completed waves are skipped by an anti-join of pending waves
  against existing manifests (the analog of the reference's checkpoint-step
  anti-join, ``run_crf_albert.py:240-265``).
- The final wide stages (canonicalize → triples → partitioned write) re-run
  from the checkpointed mentions — never from the raw corpus — and the
  triple output is written ONE FILE PER subject-hash PARTITION with rows
  sorted by the triple key, so a re-run is byte-identical.

Wave count trades checkpoint granularity against scheduling overhead: at
100 TB you'd pick waves of O(100 GB) so a preempted node loses at most one
wave of scorer work.
"""

from __future__ import annotations

from ..functions.tables import from_pandas_clean

import json
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import PipelineConfig
from ..corpus import alias_path, corpus_parquet_dir, ensure_corpus


def wave_assignments(input_files: list[str], num_waves: int):
    files = sorted(input_files)
    return [files[w::num_waves] for w in range(num_waves)]


def _manifest_path(out_dir: str, wave: int) -> str:
    return os.path.join(out_dir, "mentions", f"part-{wave:04d}",
                        "manifest.json")


def completed_waves(out_dir: str, num_waves: int) -> set[int]:
    done = set()
    for w in range(num_waves):
        if os.path.exists(_manifest_path(out_dir, w)):
            done.add(w)
    return done


def _run_wave(wave: int, files: list[str], out_dir: str,
              cfg: PipelineConfig, alias_parquet: str,
              share: float = 1.0) -> dict:
    """Extraction stages for one wave → atomic mentions partition +
    manifest. Returns the counter dict. ``share`` < 1 caps the wave's actor
    pool to that CPU fraction (concurrent waves must not each book the
    whole node)."""
    import ray.data as rd

    from ..stages.fused import fused_linked_mentions

    part_dir = os.path.join(out_dir, "mentions", f"part-{wave:04d}")
    tmp = tempfile.mkdtemp(prefix=f"wave{wave}_", dir=out_dir)
    try:
        ds = rd.read_parquet(files)
        linked = fused_linked_mentions(ds, cfg, alias_parquet, share=share)
        linked.write_parquet(tmp)
        # counters from the landed partition (cheap metadata scan + one
        # column read — the partition is this wave's mentions only)
        t = pq.read_table(tmp, columns=["guid", "content_sha256"])
        shas = t["content_sha256"].to_pylist()
        counters = {
            "n_mentions": len(t),
            "n_files_in": len(files),
            "n_docs": len(set(shas)),
            "sha_min": min(shas) if shas else "",
            "sha_max": max(shas) if shas else "",
        }
        manifest = {
            "wave": wave,
            "input_files": files,
            "counters": counters,
            "config": json.loads(cfg.to_json()),
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.makedirs(os.path.dirname(part_dir), exist_ok=True)
        os.rename(tmp, part_dir)
        return counters
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def write_partitioned_triples(triples_ds, out_dir: str,
                              num_partitions: int) -> list[str]:
    """Deterministic final write: one Parquet file per subject-hash
    partition, rows sorted by (subj, pred, obj) — re-runs are byte-identical
    and a reader can prune by partition file."""
    import pandas as pd

    from ..stages.triples import add_partition_id

    tdir = os.path.join(out_dir, "triples")
    tmp = tempfile.mkdtemp(prefix="triples_", dir=out_dir)

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["partition_id"].iloc[0])
        g = g.drop(columns=["partition_id"]).sort_values(
            ["subj", "pred", "obj"], kind="mergesort")
        table = from_pandas_clean(g.reset_index(drop=True),
                                     preserve_index=False)
        pq.write_table(table, os.path.join(tmp, f"part-{pid:04d}.parquet"))
        return from_pandas_clean(pd.DataFrame({"partition_id": [pid],
                                               "n_triples": [len(g)]}))

    with_pid = triples_ds.map_batches(
        lambda b: add_partition_id(b, num_partitions),
        batch_format="pyarrow")
    stats = (with_pid.groupby("partition_id")
             .map_groups(write_part, batch_format="pandas")
             .to_pandas())
    manifest = {
        "partitions": {int(r.partition_id): int(r.n_triples)
                       for r in stats.itertuples()},
        "n_triples": int(stats["n_triples"].sum()),
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    if os.path.exists(tdir):
        shutil.rmtree(tdir)
    os.rename(tmp, tdir)
    return [os.path.join(tdir, f) for f in sorted(os.listdir(tdir))]


def _invalidate_stale_parts(part_root: str, waves: list[list[str]],
                            cfg_json: dict) -> list[int]:
    """Resume is valid only if a landed partition still matches TODAY's run
    plan: same wave assignment (input files, order-sensitive — assignments
    are deterministic slices of the sorted file list) and same pipeline
    config. Anything else — num_waves changed, corpus changed, config
    changed, or a partition beyond the current wave count — is removed and
    recomputed rather than silently combined with fresh waves (round-1
    ADVICE: existence-only resume merged stale checkpoints)."""
    stale: list[int] = []
    if not os.path.isdir(part_root):
        return stale
    for name in sorted(os.listdir(part_root)):
        if not name.startswith("part-"):
            continue
        w = int(name.split("-")[1])
        mpath = os.path.join(part_root, name, "manifest.json")
        ok = False
        if w < len(waves) and os.path.exists(mpath):
            with open(mpath) as f:
                man = json.load(f)
            ok = (man.get("input_files") == waves[w]
                  and man.get("config") == cfg_json)
        if not ok:
            shutil.rmtree(os.path.join(part_root, name))
            stale.append(w)
    return stale


def _invalidate_stale_waves(out_dir: str, waves: list[list[str]],
                            cfg: PipelineConfig) -> list[int]:
    return _invalidate_stale_parts(os.path.join(out_dir, "mentions"),
                                   waves, json.loads(cfg.to_json()))


def _stabilize_fsspec_http_import() -> None:
    """Ray's path resolution lazily runs ``from fsspec.implementations.http
    import HTTPFileSystem`` on EVERY dataset creation/write. In this
    environment that import always fails (no aiohttp), which is fine
    serially (Ray catches it) — but concurrent wave threads race the
    failing import and one observes a partially-initialized module, raising
    an ImportError Ray does NOT catch. Pre-seed a sentinel module so the
    import succeeds deterministically; the sentinel class never matches a
    real filesystem instance, so local-path behavior is unchanged."""
    import sys
    import types
    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ImportError:
        pass
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:                    # sentinel, never instantiated
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


def _run_curation_wave(wave: int, files: list[str], out_dir: str,
                       cfg_json: dict) -> None:
    """One wave of the resumable curation path: the fused per-doc stats
    scan (gates + sha + MinHash signature, ``curation_doc_stats``) lands
    atomically under ``out/docstats/part-<wave>/`` with a manifest."""
    import ray.data as rd

    from ..pipelines.curation import curation_doc_stats

    part_dir = os.path.join(out_dir, "docstats", f"part-{wave:04d}")
    tmp = tempfile.mkdtemp(prefix=f"cwave{wave}_", dir=out_dir)
    try:
        stats = rd.read_parquet(files).map_batches(
            curation_doc_stats,
            fn_kwargs={"num_hashes": cfg_json["num_hashes"],
                       "shingle_k": cfg_json["shingle_k"]},
            batch_format="pyarrow")
        stats.write_parquet(tmp)
        n_docs = pq.read_table(tmp, columns=["doc_id"]).num_rows
        manifest = {"wave": wave, "input_files": files,
                    "counters": {"n_docs": n_docs,
                                 "n_files_in": len(files)},
                    "config": cfg_json}
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.makedirs(os.path.dirname(part_dir), exist_ok=True)
        os.rename(tmp, part_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def write_partitioned_verdicts(verdict_ds, out_dir: str,
                               num_partitions: int) -> list[str]:
    """Deterministic final write: one Parquet file per doc_id-hash
    partition, rows sorted by doc_id — re-runs are byte-identical and a
    reader can prune by partition file (the triple-write contract applied
    to the curation verdict table)."""
    import numpy as np
    import pandas as pd

    from ..functions.hashing import splitmix64

    vdir = os.path.join(out_dir, "verdict")
    tmp = tempfile.mkdtemp(prefix="verdict_", dir=out_dir)

    def add_pid(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pid = (splitmix64(ids) % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("partition_id", pa.array(pid))

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["partition_id"].iloc[0])
        g = g.drop(columns=["partition_id"]).sort_values(
            "doc_id", kind="mergesort")
        table = from_pandas_clean(g.reset_index(drop=True),
                                  preserve_index=False)
        pq.write_table(table, os.path.join(tmp, f"part-{pid:04d}.parquet"))
        return from_pandas_clean(pd.DataFrame({"partition_id": [pid],
                                               "n_docs": [len(g)]}))

    stats = (verdict_ds.map_batches(add_pid, batch_format="pyarrow")
             .groupby("partition_id")
             .map_groups(write_part, batch_format="pandas")
             .to_pandas())
    manifest = {
        "partitions": {int(r.partition_id): int(r.n_docs)
                       for r in stats.itertuples()},
        "n_docs": int(stats["n_docs"].sum()),
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    if os.path.exists(vdir):
        shutil.rmtree(vdir)
    os.rename(tmp, vdir)
    return [os.path.join(vdir, f) for f in sorted(os.listdir(vdir))]


def run_resumable_curation(input_dir: str, out_dir: str,
                           neardup_threshold: float = 0.7,
                           num_waves: int = 4,
                           stop_after_waves: int | None = None,
                           num_partitions: int = 16,
                           num_buckets: int = 32,
                           broadcast_limit: int = 5_000_000) -> dict:
    """Resumable curation flagship — the over-``max_inmemory_bytes`` path
    of ``pipelines.curation.curation_pipeline`` (r4 verdict item 5), with
    the same wave-checkpoint contract as ``run_resumable_kg``:

    - each wave's fused per-doc stats (gates + sha + signature) land
      atomically with a manifest; on re-run completed waves are skipped
      and stale ones invalidated;
    - the GLOBAL steps (exact drops, LSH candidates from the checkpointed
      signatures, candidate-only verify against the raw corpus, verdict)
      read the checkpoints — the corpus text is re-read only for
      candidate docs;
    - the verdict table is written one file per doc_id-hash partition,
      rows sorted — byte-identical across kill-resume (test-pinned).

    Returns a run report."""
    import ray.data as rd

    from ..pipelines import curation as cur

    os.makedirs(out_dir, exist_ok=True)
    input_files = sorted(os.path.join(input_dir, f)
                         for f in os.listdir(input_dir)
                         if f.endswith(".parquet"))
    waves = wave_assignments(input_files, num_waves)
    cfg_json = {"neardup_threshold": neardup_threshold,
                "num_hashes": 128, "shingle_k": 5}
    part_root = os.path.join(out_dir, "docstats")
    stale = _invalidate_stale_parts(part_root, waves, cfg_json)
    done = {w for w in range(num_waves)
            if os.path.exists(os.path.join(part_root, f"part-{w:04d}",
                                           "manifest.json"))}
    report = {"skipped_waves": sorted(done), "ran_waves": [],
              "invalidated_waves": stale}
    ran = 0
    for w, files in enumerate(waves):
        if w in done or not files:
            continue
        if stop_after_waves is not None and ran >= stop_after_waves:
            report["stopped_early"] = True
            return report
        _run_curation_wave(w, files, out_dir, cfg_json)
        report["ran_waves"].append(w)
        ran += 1

    # global steps from the checkpoints (text re-read only for candidates)
    import ray
    stats = rd.read_parquet(part_root, file_extensions=["parquet"])
    docs = rd.read_parquet(input_files)
    exact = cur._exact_drop_ids(None, num_buckets, broadcast_limit,
                                sha_ds=stats)
    near = cur._near_drop_ids(docs, neardup_threshold, broadcast_limit,
                              sigs=stats)
    ref = ray.put({"exact": exact, "near": near})
    verdict = stats.select_columns(
        ["doc_id", "quality_ok", "has_secret"]).map_batches(
        cur._verdict_flags_scan, fn_kwargs={"drops_ref": ref},
        batch_format="pyarrow")
    files = write_partitioned_verdicts(verdict, out_dir, num_partitions)
    report["verdict_files"] = files
    return report


def run_resumable_kg(sf_dir: str, out_dir: str,
                     cfg: PipelineConfig | None = None, num_waves: int = 4,
                     stop_after_waves: int | None = None,
                     max_concurrent_waves: int = 1) -> dict:
    """Resumable flagship run. Call again after a crash — completed waves are
    skipped (anti-join against manifests). ``stop_after_waves`` simulates a
    mid-run kill for tests. Returns a run report.

    ``max_concurrent_waves`` > 1 drives that many wave Dataset jobs from
    driver THREADS: each wave still lands atomically (tempdir + rename), but
    the ~3-5 s per-wave session/pool spin-up overlaps instead of summing —
    at 100 TB wave counts this is the difference between pipeline-bound and
    constant-bound. Serial when ``stop_after_waves`` is set (the kill-test
    needs a deterministic prefix)."""
    import ray.data as rd

    from ..pipelines.kg import canonical_map_of
    from ..stages.canonicalize import canonicalize_dataset
    from ..stages.triples import triples_dataset

    cfg = cfg or PipelineConfig()
    ensure_corpus(sf_dir)
    os.makedirs(out_dir, exist_ok=True)
    src = corpus_parquet_dir(sf_dir)
    input_files = [os.path.join(src, f) for f in os.listdir(src)
                   if f.endswith(".parquet")]
    waves = wave_assignments(input_files, num_waves)
    stale = _invalidate_stale_waves(out_dir, waves, cfg)
    done = completed_waves(out_dir, num_waves)
    report = {"skipped_waves": sorted(done), "ran_waves": [],
              "invalidated_waves": stale}
    pending = [(w, files) for w, files in enumerate(waves)
               if w not in done and files]
    if max_concurrent_waves > 1 and stop_after_waves is None and \
            len(pending) > 1:
        from concurrent.futures import ThreadPoolExecutor
        _stabilize_fsspec_http_import()
        share = 1.0 / min(max_concurrent_waves, len(pending))
        with ThreadPoolExecutor(max_workers=max_concurrent_waves) as ex:
            futs = {ex.submit(_run_wave, w, files, out_dir, cfg,
                              alias_path(sf_dir), share): w
                    for w, files in pending}
            for f in futs:
                f.result()                      # propagate wave errors
        report["ran_waves"] = sorted(w for _, w in
                                     ((f, futs[f]) for f in futs))
    else:
        ran = 0
        for w, files in pending:
            if stop_after_waves is not None and ran >= stop_after_waves:
                report["stopped_early"] = True
                return report
            _run_wave(w, files, out_dir, cfg, alias_path(sf_dir))
            report["ran_waves"].append(w)
            ran += 1
    # final wide stages from the checkpointed mentions (never re-extract)
    linked = rd.read_parquet(os.path.join(out_dir, "mentions"),
                             file_extensions=["parquet"])
    canon = canonicalize_dataset(linked, cfg.canonicalize.num_salts)
    cmap = canonical_map_of(canon)
    triples = triples_dataset(linked, cmap,
                              concurrency=cfg.scorer.concurrency)
    files = write_partitioned_triples(triples, out_dir,
                                      cfg.output.num_partitions)
    report["triple_files"] = files
    return report
