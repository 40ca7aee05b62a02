"""Driver-contract smoke in test form: entry() runs, yields rows with a
stable schema, and the registries are consistent."""

import importlib.util


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_under_test", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_stable_triples(corpus_ready):
    mod = _load_entry()
    a = mod.entry().to_pandas()
    b = mod.entry().to_pandas()
    assert len(a) > 0
    assert list(a.columns) == ["subj", "pred", "obj", "repo", "path",
                               "commit", "content_sha256", "n_mentions"]
    key = ["subj", "pred", "obj"]
    assert set(map(tuple, a[key].values)) == set(map(tuple, b[key].values))


def test_registry_consistency():
    mod = _load_entry()
    qs = mod.queries()
    oq = mod.oracle_sql()
    assert set(oq) <= set(qs)              # every oracle has a query
    assert len(qs) >= 30
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oq.items():
        assert isinstance(sql, str) and "select" in sql.lower(), name


def test_scaling_fingerprint_covers_kg_closure():
    """bench._code_fingerprint hashes only the measured job's code slice;
    this pins that the slice really COVERS kg_pipeline's import closure —
    a module the job loads that isn't in the list would let a
    perf-relevant edit slip past the same-code ladder-history check. The
    closure is computed in a FRESH subprocess (the pytest session's
    sys.modules carries every other test's imports)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from bench import _KG_PIPELINE_FILES

    script = """
import json, os, sys
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import knowledgeextraction_ray
from knowledgeextraction_ray.pipelines.kg import kg_pipeline
kg_pipeline("/root/testdata/sf0.001").count()
root = os.path.dirname(os.path.abspath(knowledgeextraction_ray.__file__))
loaded = sorted({os.path.relpath(m.__file__, root)
                 for name, m in list(sys.modules.items())
                 if name.startswith("knowledgeextraction_ray")
                 and getattr(m, "__file__", None)})
ray.shutdown()
print("CLOSURE::" + json.dumps(loaded))
"""
    out = subprocess.run([sys.executable, "-c", script], cwd=repo,
                         capture_output=True, text=True, check=True).stdout
    line = next(ln for ln in out.splitlines() if ln.startswith("CLOSURE::"))
    loaded = set(json.loads(line[len("CLOSURE::"):]))
    missing = loaded - set(_KG_PIPELINE_FILES)
    assert not missing, f"kg closure grew past the fingerprint: {missing}"
