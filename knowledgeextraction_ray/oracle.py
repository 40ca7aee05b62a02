"""DuckDB oracle SQL for the KG pipeline family.

Each builder returns ANSI SQL that recomputes a pipeline stage's result from
the SAME deterministic corpus parquet (``corpus.ensure_corpus``) with no model
in the loop — possible because the corpus grammar makes gold mentions exactly
regex-recoverable (``corpus.MENTION_PATTERNS``). Used by ``__ray_entry__
.oracle_sql()`` (driver correctness gate at sf0.01) and by the in-repo pytest
oracle harness at sf0.001.
"""

from __future__ import annotations

from .corpus import MENTION_PATTERNS, PREDICATES, alias_path, corpus_glob


def _mentions_cte(corpus: str) -> str:
    """UNION ALL of regexp_extract_all per label — one row per raw mention."""
    parts = []
    for label, pat in MENTION_PATTERNS.items():
        sql_pat = pat.replace("'", "''").replace("\\", "\\")
        parts.append(f"""
  select repo, path, commit, lang, sha256(content) as content_sha256,
         '{label}' as label,
         unnest(regexp_extract_all(content, '{sql_pat}', 1)) as surface
  from read_parquet('{corpus}')""")
    return "union all".join(parts)


def _pred_case() -> str:
    whens = "\n".join(f"when '{lab}' then '{pred}'"
                      for lab, pred in PREDICATES.items())
    return f"case label {whens} end"


def sql_corpus_sha(sf_dir: str) -> str:
    corpus = corpus_glob(sf_dir)
    return f"""
select repo, path, commit, lang, sha256(content) as content_sha256,
       length(content) as n_chars
from read_parquet('{corpus}')
"""


def sql_mentions(sf_dir: str) -> str:
    """Mention counts per (file, label, surface)."""
    return f"""
with mentions as ({_mentions_cte(corpus_glob(sf_dir))})
select repo, path, label, surface, count(*) as n
from mentions
group by repo, path, label, surface
"""


def sql_label_hist(sf_dir: str) -> str:
    return f"""
with mentions as ({_mentions_cte(corpus_glob(sf_dir))})
select label, count(*) as n, count(distinct surface) as n_distinct_surfaces
from mentions
group by label
"""


def _linked_ctes(sf_dir: str) -> str:
    corpus = corpus_glob(sf_dir)
    alias = alias_path(sf_dir)
    return f"""
mentions as ({_mentions_cte(corpus)}),
alias_best as (
  select alias, entity_id, prior from (
    select *, row_number() over (
        partition by alias order by prior desc, entity_id asc) as rn
    from read_parquet('{alias}')) where rn = 1
),
linked as (
  select m.*, lower(m.surface) as surface_norm,
         coalesce(a.entity_id, 'ent::' || lower(m.surface)) as entity_id,
         coalesce(a.prior, 0.0) as prior
  from mentions m left join alias_best a on a.alias = m.surface
),
canonical as (
  select surface_norm, entity_id, prior from (
    select surface_norm, entity_id, prior, row_number() over (
        partition by surface_norm order by prior desc, entity_id asc) as rn
    from linked) where rn = 1
)"""


def sql_canonical(sf_dir: str) -> str:
    """Canonicalization table: surface_norm → elected entity + group size."""
    return f"""
with {_linked_ctes(sf_dir)}
select c.surface_norm, c.entity_id, round(c.prior, 6) as prior,
       g.n_mentions
from canonical c
join (select surface_norm, count(*) as n_mentions
      from linked group by surface_norm) g using (surface_norm)
"""


def sql_triples(sf_dir: str) -> str:
    """Final deduplicated canonical triples with provenance."""
    return f"""
with {_linked_ctes(sf_dir)}
select l.repo || ':' || l.path as subj,
       {_pred_case()} as pred,
       c.entity_id as obj,
       min(l.repo) as repo, min(l.path) as path, min(l.commit) as commit,
       min(l.content_sha256) as content_sha256,
       count(*) as n_mentions
from linked l join canonical c using (surface_norm)
group by 1, 2, 3
"""


def sql_triples_by_repo(sf_dir: str) -> str:
    """Per-(repo, pred) rollup over the deduplicated triples."""
    return f"""
with {_linked_ctes(sf_dir)},
triples as (
  select l.repo || ':' || l.path as subj,
         {_pred_case()} as pred,
         c.entity_id as obj,
         min(l.repo) as repo, count(*) as n_mentions
  from linked l join canonical c using (surface_norm)
  group by 1, 2, 3)
select repo, pred, count(*) as n_triples,
       cast(sum(n_mentions) as bigint) as n_mentions
from triples group by 1, 2
"""


KG_ORACLES = {
    "kg_corpus_sha": sql_corpus_sha,
    "kg_mentions": sql_mentions,
    "kg_label_hist": sql_label_hist,
    "kg_canonical": sql_canonical,
    "kg_triples": sql_triples,
    "kg_triples_by_repo": sql_triples_by_repo,
    # the resumable/checkpointed path must produce the identical triple set
    "kg_triples_resumable": sql_triples,
}
