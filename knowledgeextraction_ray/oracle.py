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


def sql_nre_bags(sf_dir: str) -> str:
    """Bag-level relation aggregate (reference BagAttention analog): pair a
    call with the nearest preceding def in the file (window last_value over
    lines), md5-derived instance score, per-(head, tail) bag counts + summed
    scaled-int scores + score-weighted mean."""
    corpus = corpus_glob(sf_dir)
    return f"""
with ls as (
  select repo, path, string_split(content, chr(10)) as lines
  from read_parquet('{corpus}')
),
lined as (
  select repo, path, unnest(lines) as line,
         unnest(range(1, len(lines) + 1)) as line_no
  from ls
),
tagged as (
  select repo, path, line_no,
         nullif(regexp_extract(line,
                'def ([A-Za-z_][A-Za-z0-9_]*)\\(', 1), '') as def_name,
         nullif(regexp_extract(line,
                '= ([A-Za-z_][A-Za-z0-9_]*)\\(', 1), '') as call_name
  from lined
),
with_head as (
  select repo, path, line_no, call_name,
         last_value(def_name ignore nulls) over (
           partition by repo, path order by line_no
           rows between unbounded preceding and current row) as head_name
  from tagged
),
pairs as (
  select repo, path, head_name as head_surface, call_name as tail_surface,
         row_number() over (
           partition by repo, path, head_name, call_name
           order by line_no) as ordinal
  from with_head
  where call_name is not null and head_name is not null
),
scored as (
  select head_surface, tail_surface, repo || ':' || path as subj,
         5000 + (('0x' || substr(md5(repo || '|' || path || '|' ||
                  head_surface || '|' || tail_surface || '|' || ordinal),
                  1, 8))::bigint % 5000) as score_e4
  from pairs
)
select head_surface, tail_surface, 'calls' as relation,
       count(*) as n_instances,
       count(distinct subj) as n_files,
       cast(sum(score_e4) as bigint) as sum_score_e4,
       round(cast(sum(score_e4 * score_e4) as bigint)
             / cast(sum(score_e4) as bigint) / 10000.0, 6) as bag_score
from scored
group by 1, 2
"""


def sql_mrc_answers(sf_dir: str) -> str:
    """Single-window MRC oracle: per (content-sha × question type), matches
    in document order, beam-5, text dedup by first occurrence, softmax over
    -0.15·rank totals, ±5 no-answer odds, null-thresholded final answer —
    the exact semantics of the stand-in scorer + ``get_predictions_v2``
    merge when one window covers the file."""
    corpus = corpus_glob(sf_dir)
    branches = "\nunion all\n".join(
        f"""select sha, '{label}' as qtype, unnest(l) as surface,
       unnest(range(1, len(l) + 1)) as ord
from (select sha, regexp_extract_all(content, '{pat}', 1) as l
      from files)"""
        for label, pat in MENTION_PATTERNS.items())
    return f"""
with files as (select distinct sha256(content) as sha, content
               from read_parquet('{corpus}')),
q as (select unnest(['IMPORT', 'CLASS', 'FUNC', 'CALL']) as qtype),
m as ({branches}),
beam as (select * from m where ord <= 5),
kept as (select sha, qtype, surface, min(ord) as ord
         from beam group by 1, 2, 3),
agg as (select sha, qtype, count(*) as n_entities,
               round(1.0 / sum(exp(-0.15 * (ord - 1))), 6) as top_prob,
               min(case when ord = 1 then surface end) as top_surface
        from kept group by 1, 2),
allq as (select f.sha, q.qtype
         from (select distinct sha from files) f cross join q)
select allq.sha || ':' || allq.qtype as example_id,
       coalesce(n_entities, 0) as n_entities,
       coalesce(top_prob, 0.0) as top_prob,
       case when n_entities is null then 5.0 else -5.0 end as na_prob,
       coalesce(top_surface, '') as final_answer
from allq left join agg using (sha, qtype)
"""


def sql_ner_eval(sf_dir: str) -> str:
    """conlleval chunk-count oracle for the uncorrupted eval (G6): the
    scorer IS the grammar, so gold ≡ pred — chunk counts equal the corpus
    mention count, tag counts equal total corpus chars (segmentation
    partitions each file exactly; the sha-roundtrip gate pins that), and
    every rate is exactly 1. ``corrupt_frac > 0`` variants stay
    pytest-gated (corruption keys on segment guids, which SQL can't
    derive)."""
    corpus = corpus_glob(sf_dir)
    return f"""
with m as ({_mentions_cte(corpus)}),
c as (select count(*) as n from m),
t as (select cast(sum(length(content)) as bigint) as n
      from read_parquet('{corpus}'))
select c.n as correct_chunks, c.n as gold_chunks, c.n as pred_chunks,
       t.n as correct_tags, t.n as total_tags,
       1.0 as accuracy, 1.0 as precision, 1.0 as recall, 1.0 as f1
from c, t
"""


def sql_kg_hot_surfaces(sf_dir: str, top_n: int = 20) -> str:
    """Skew profile oracle: per-surface counts, rank by (n desc, key asc),
    integer ppm share of all mentions."""
    return f"""
with mentions as ({_mentions_cte(corpus_glob(sf_dir))}),
c as (select lower(surface) as surface_norm, count(*) as n
      from mentions group by 1),
t as (select cast(sum(n) as bigint) as n_total from c)
select surface_norm, cast(n as bigint) as n,
       cast(row_number() over (order by n desc, surface_norm asc)
            as bigint) as rank,
       cast(n * 1000000 // n_total as bigint) as share_e6,
       n_total
from c cross join t
qualify rank <= {top_n}
"""


def sql_kg_pagerank(sf_dir: str, iters: int = 5, scale: int = 10**9,
                    damping_pct: int = 85) -> str:
    """PageRank over the distinct (subj → obj) triple graph, the exact
    integer recurrence of ``stages/graph`` unrolled as one CTE per
    iteration: contribution = (rank * damping // 100) // outdeg (two floor
    divisions), new rank = base + incoming sum; dangling mass evaporates on
    both sides identically."""
    base = scale * (100 - damping_pct) // 100
    # triples/nodes/outdeg are consumed by every c_i/r_i — DuckDB INLINES
    # CTEs, so without `as materialized` the whole mentions-extraction
    # subtree re-evaluates ~4·iters+2 times per run (the CLAUDE.md fan-out
    # pitfall; r2 ADVICE item)
    ctes = [
        _linked_ctes(sf_dir),
        "triples as materialized (select distinct "
        "l.repo || ':' || l.path as src, "
        "c.entity_id as dst from linked l join canonical c "
        "using (surface_norm))",
        "nodes as materialized (select src as node from triples "
        "union select dst from triples)",
        "outdeg as materialized (select src, count(*) as n "
        "from triples group by src)",
        f"r0 as (select node, {scale}::hugeint as r from nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} as (select t.dst, "
            f"sum((r.r * {damping_pct} // 100) // d.n) as c "
            f"from triples t join r{i - 1} r on r.node = t.src "
            f"join outdeg d on d.src = t.src group by t.dst)")
        ctes.append(
            f"r{i} as (select n.node, "
            f"{base}::hugeint + coalesce(c.c, 0::hugeint) as r "
            f"from nodes n left join c{i} c on c.dst = n.node)")
    return ("with " + ",\n".join(ctes) +
            f"\nselect node, cast(r as bigint) as rank_e9 from r{iters}")


KG_ORACLES = {
    "kg_corpus_sha": sql_corpus_sha,
    "kg_mentions": sql_mentions,
    "kg_label_hist": sql_label_hist,
    "kg_canonical": sql_canonical,
    "kg_triples": sql_triples,
    "kg_triples_by_repo": sql_triples_by_repo,
    # the resumable/checkpointed path must produce the identical triple set
    "kg_triples_resumable": sql_triples,
    "kg_pagerank": sql_kg_pagerank,
    "kg_hot_surfaces": sql_kg_hot_surfaces,
    "nre_bags": sql_nre_bags,
    "mrc_answers": sql_mrc_answers,
    "ner_eval_prf": sql_ner_eval,
}
