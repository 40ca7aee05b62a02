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
