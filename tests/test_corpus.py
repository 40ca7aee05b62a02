"""Corpus generator determinism + schema + skew properties."""

import numpy as np

from knowledgeextraction_ray.corpus import (CORPUS_SCHEMA, build_alias_table,
                                            generate_file, generate_files,
                                            n_files_for)


def test_generate_file_deterministic():
    a = generate_file(7)
    b = generate_file(7)
    assert a == b
    assert a != generate_file(8)


def test_generate_files_order_independent():
    # per-file seeding: sharding must not change content
    t1 = generate_files([5, 6, 7]).to_pylist()
    t2 = [generate_files([j]).to_pylist()[0] for j in (5, 6, 7)]
    assert t1 == t2


def test_corpus_schema_matches_input_hint():
    t = generate_files(range(3))
    assert t.schema.equals(CORPUS_SCHEMA)
    assert t.schema.names == ["repo", "path", "commit", "lang", "content"]


def test_corpus_grammar_lines_short():
    # no line may exceed the segment payload (so no mention ever straddles a
    # hard split)
    for j in range(50):
        for line in generate_file(j)["content"].split("\n"):
            assert len(line) < 382


def test_identifier_skew_is_zipfian():
    # hot heads should dominate: "main"/"utils" should be much more frequent
    # than tail identifiers
    import re
    counts = {}
    for j in range(300):
        for m in re.finditer(r"= ([A-Za-z_]\w*)\(",
                             generate_file(j)["content"]):
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    top = max(counts.values())
    med = float(np.median(list(counts.values())))
    assert top / max(med, 1) > 10  # hot key skew is real


def test_n_files_for():
    assert n_files_for("/root/testdata/sf0.001") == 1000
    assert n_files_for("/root/testdata/sf0.01") == 10_000
    assert n_files_for("/root/testdata/sf0.1") == 100_000


def test_alias_table_ambiguity():
    t = build_alias_table().to_pylist()
    by_alias = {}
    for r in t:
        by_alias.setdefault(r["alias"], []).append(r)
    # hot aliases are ambiguous (≥2 candidate entities)
    assert len(by_alias["main"]) >= 2
    # resolution rule picks max prior
    best = max(by_alias["main"], key=lambda r: (r["prior"], ))
    assert best["entity_id"] == "ent::main"
