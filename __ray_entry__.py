"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_SF001 = "/root/testdata/sf0.001"
_SF01 = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship KG-construction pipeline on the sf0.001 synthetic code corpus:
    segment → NER scorer actor pool → mention recovery → alias linking →
    salted canonicalization → deduplicated triples."""
    from knowledgeextraction_ray.pipelines.kg import kg_pipeline
    return kg_pipeline(_SF001)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from knowledgeextraction_ray.corpus import ensure_corpus
    from knowledgeextraction_ray.pipelines.queries import build_queries

    # the oracle SQL reads the deterministic corpus cache from /tmp — make
    # sure it exists regardless of whether the driver runs Ray or SQL first
    for sf in (_SF001, _SF01):
        ensure_corpus(sf)
    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (driver runs them at sf=0.01).
    Non-SQL-expressible ops are omitted → rows-only check."""
    from knowledgeextraction_ray.corpus import ensure_corpus
    from knowledgeextraction_ray.pipelines.queries import build_oracles

    # the kg-family SQL reads the corpus cache — make sure it exists even if
    # the driver evaluates the oracle before the Ray side
    for sf in (_SF001, _SF01):
        ensure_corpus(sf)
    return build_oracles(_SF01)
