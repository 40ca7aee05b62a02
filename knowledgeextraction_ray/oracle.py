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


# Whitespace chars Python treats as separators (str.split / re \s) that
# RE2's ASCII \s class does NOT: \v, the C1/file-separator controls, NBSP
# and the Unicode space category. The segment/token oracles tokenize with
# RE2 '\S+' while the pipeline splits with Python semantics — divergent
# ONLY on these chars, which the corpus grammar never emits. The guard
# makes that assumption fail LOUDLY (r4, per ADVICE) instead of as an
# opaque value-hash mismatch.
_NONASCII_WS_RE2 = (r"[\x0b\x1c-\x1f\x{85}\x{a0}\x{1680}"
                    r"\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}"
                    r"\x{205f}\x{3000}]")


def _ws_guarded(col: str = "content") -> str:
    """SQL expression: ``col``, or a loud ``error()`` if it contains
    whitespace outside RE2's ASCII ``\\s`` class."""
    return (f"case when regexp_matches({col}, '{_NONASCII_WS_RE2}') "
            f"then error('oracle assumption violated: content contains "
            f"whitespace outside RE2 ASCII \\s (Python split treats it as "
            f"a separator, this gate does not) — sha=' || sha256({col})) "
            f"else {col} end")


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


def sql_corpus_line_dedup(sf_dir: str, min_len: int = 20) -> str:
    """Cross-document line dedup: keep each repeated line's corpus-global
    first occurrence (order by path, line_idx); lines under ``min_len``
    chars always pass. ``generate_subscripts`` zips 1-based indices with
    the unnest (DuckDB lacks WITH ORDINALITY); the reassembled-text
    sha256 gates keep decisions AND line order in one value."""
    corpus = corpus_glob(sf_dir)
    return f"""
with parts as (select path, string_split(content, chr(10)) as ls
               from read_parquet('{corpus}')),
lines as (select path, unnest(ls) as line,
                 generate_subscripts(ls, 1)::bigint - 1 as line_idx
          from parts),
ranked as (
  select path, line_idx, line, length(line) >= {min_len} as elig,
         row_number() over (partition by line order by path, line_idx) rn
  from lines),
kept as (select path, line_idx, line, (not elig or rn = 1) as keep
         from ranked)
select path, count(*)::bigint as n_lines,
       (count(*) filter (where keep))::bigint as kept_lines,
       (count(*) filter (where not keep))::bigint as dropped_lines,
       sha256(coalesce(string_agg(line, chr(10) order by line_idx)
              filter (where keep), '')) as text_sha256
from kept group by path
"""


def sql_corpus_substring_dedup(sf_dir: str, k: int = 64,
                               max_len: int = 8192) -> str:
    """Exact substring dedup (Lee et al. 2022): every occurrence of a
    duplicated ``k``-char substring except the corpus-global first (by
    path, then position) is removed; fixed-length windows merge via a
    lag comparison (a new span starts where ``p > lag(p) + k``); kept
    text reassembles from the inter-span pieces. Positions are CHAR
    positions — identical to the Ray side's byte positions because the
    grammar corpus is ASCII by construction (same assumption the
    whitespace-tokenizing oracles guard). ``max_len`` bounds the
    positions table (DuckDB ``range`` takes constants only); the length
    join prunes it exactly."""
    corpus = corpus_glob(sf_dir)
    return f"""
with pos as materialized (
  select range::bigint as p from range(0, {max_len})),
grams as materialized (
  select t.path, p.p, substr(t.content, p.p + 1, {k}) as gram
  from read_parquet('{corpus}') t join pos p on p.p + {k} <= length(t.content)),
firsts as materialized (
  select gram, count(*) as cnt,
         min(t.path || chr(31) || lpad(t.p::varchar, 12, '0')) as owner
  from grams t group by gram),
covered as materialized (
  select g.path, g.p
  from grams g join firsts f using (gram)
  where f.cnt >= 2
    and f.owner <> g.path || chr(31) || lpad(g.p::varchar, 12, '0')),
brk as (
  select path, p,
         coalesce((p > lag(p) over (partition by path order by p)
                   + {k})::int, 1) as b
  from covered),
isl as (
  select path, p, sum(b) over (partition by path order by p
                               rows unbounded preceding) as island
  from brk),
islands as materialized (
  select path, island, min(p) as s, max(p) + {k} as e
  from isl group by path, island),
pieces as (
  select path,
         coalesce(lag(e) over (partition by path order by s), 0) as f,
         s as t
  from islands
  union all
  select c.path, coalesce(max(i.e), 0), length(c.content)
  from read_parquet('{corpus}') c left join islands i using (path)
  group by c.path, length(c.content)),
kept as (
  select p.path,
         string_agg(substr(c.content, p.f + 1, p.t - p.f), '' order by p.f)
           as kept_text
  from pieces p join read_parquet('{corpus}') c using (path)
  group by p.path)
select c.path, length(c.content)::bigint as n_chars,
       coalesce(sum(i.e - i.s), 0)::bigint as removed_chars,
       count(i.island)::bigint as n_spans,
       sha256(any_value(k.kept_text)) as text_sha256
from read_parquet('{corpus}') c
join kept k using (path)
left join islands i using (path)
group by c.path, length(c.content)
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


def _group_prefix_len(pat: str) -> int:
    """Char offset of capture group 1 inside a match — every grammar pattern
    is a fixed literal prefix followed by ``(...)``, so the offset is the
    index of the first ``(``. Positions of regex matches are not exposed by
    DuckDB; the oracles reconstruct them from ``string_split_regex`` part
    lengths + this fixed group offset."""
    return pat.index("(")


def _segments_ctes(sf_dir: str, max_payload: int = 382,
                   min_len: int = 4, corpus: str | None = None) -> str:
    """CTE chain restating the line segmenter (``functions/textseg``):
    newline split with ``\\n`` re-attached, GREEDY packing into ≤
    ``max_payload``-char chunks via a recursive chunk-start fold (one row
    per file per step — the packing recurrence is inherently sequential per
    file, parallel across files), then the min-length filter.

    Emits ``segs``: (fid, sha, repo, path, off, text, slen, si, seg_index)
    where ``si`` numbers chunks BEFORE the min-length filter (the prep
    pipeline's guid convention) and ``seg_index`` after it (the segmenter's).
    ASSUMES no single line exceeds ``max_payload`` (true of the grammar
    corpus by construction; the Python side hard-splits such lines and the
    recurrence here would diverge — kept out of SQL deliberately). The
    assumption FAILS LOUDLY (r4, per ADVICE): ``lpos`` raises a DuckDB
    ``error()`` naming the offending file instead of letting the gate
    surface it as an opaque value-hash mismatch."""
    corpus = corpus or corpus_glob(sf_dir)
    return f"""
files as (
  select repo || ':' || path as fid, repo, path,
         sha256(content) as sha, {_ws_guarded()} as content
  from read_parquet('{corpus}')),
rawlines as (
  select fid, unnest(string_split(content, chr(10))) as part,
         unnest(range(1, len(string_split(content, chr(10))) + 1)) as ln,
         len(string_split(content, chr(10))) as n_lines
  from files),
lpre as (
  select fid, ln,
         case when ln < n_lines then part || chr(10) else part end as line
  from rawlines where not (ln = n_lines and part = '')),
lpos as (
  select fid, ln, line,
         case when length(line) > {max_payload}
              then error('oracle assumption violated: line longer than '
                         || 'max_payload — the Python segmenter hard-'
                         || 'splits such lines; this gate cannot restate '
                         || 'that input (fid=' || fid || ')')
              else length(line) end as llen,
         sum(length(line)) over (partition by fid order by ln
             rows between unbounded preceding and current row)
           - length(line) as pos
  from lpre),
pack(fid, ln, chunk_start) as (
  select fid, ln, 0::bigint from lpos where ln = 1
  union all
  select l.fid, l.ln,
         case when l.pos + l.llen - p.chunk_start > {max_payload}
                   and l.pos > p.chunk_start
              then l.pos else p.chunk_start end
  from pack p join lpos l on l.fid = p.fid and l.ln = p.ln + 1),
segs0 as (
  select p.fid, p.chunk_start as off,
         string_agg(l.line, '' order by l.ln) as text
  from pack p join lpos l on l.fid = p.fid and l.ln = p.ln
  group by p.fid, p.chunk_start),
segsall as (
  select fid, off, text, length(text) as slen,
         row_number() over (partition by fid order by off) - 1 as si
  from segs0),
segs as materialized (
  select f.fid, f.sha, f.repo, f.path, s.off, s.text, s.slen, s.si,
         row_number() over (partition by s.fid order by s.off) - 1
           as seg_index
  from segsall s join files f using (fid)
  where s.slen >= {min_len})"""


def _segment_spans_ctes(labels=None) -> str:
    """CTEs over ``segs`` producing ``spans``: one row per grammar match per
    segment with EXACT group char positions (g_s, g_e half-open,
    segment-relative). Positions are reconstructed from split-part
    cumulative lengths: ``content = pre1 + match1 + pre2 + match2 + …``, so
    ``f_s(k) = Σ_{{i≤k}} len(pre_i) + Σ_{{i<k}} len(match_i)``, and group 1
    sits at a fixed offset inside each match (:func:`_group_prefix_len`)."""
    labels = labels or list(MENTION_PATTERNS)
    branches = "\nunion all\n".join(f"""
  select fid, sha, repo, path, si, seg_index, slen,
         '{lab}' as label, {_group_prefix_len(MENTION_PATTERNS[lab])} as plen,
         string_split_regex(text, '{MENTION_PATTERNS[lab]}') as parts,
         regexp_extract_all(text, '{MENTION_PATTERNS[lab]}', 0) as fulls,
         regexp_extract_all(text, '{MENTION_PATTERNS[lab]}', 1) as grps
  from segs""" for lab in labels)
    return f"""
sp as ({branches}),
mrows as (
  select fid, sha, repo, path, si, seg_index, slen, label, plen,
         unnest(range(1, len(fulls) + 1)) as k,
         unnest(fulls) as fm, unnest(grps) as gm,
         unnest(parts[1:len(fulls)]) as pre
  from sp where len(fulls) > 0),
spans as (
  select fid, sha, repo, path, si, seg_index, slen, label, gm,
         cast(sum(length(pre) + length(fm)) over (
             partition by fid, si, label order by k
             rows between unbounded preceding and current row)
           - length(fm) + plen as bigint) as g_s,
         cast(sum(length(pre) + length(fm)) over (
             partition by fid, si, label order by k
             rows between unbounded preceding and current row)
           - length(fm) + plen + length(gm) as bigint) as g_e
  from mrows)"""


def _bio_tag_sql(guid_expr: str) -> str:
    """CTEs assembling each segment's per-char BIO label string (comma-
    joined ``TYPE-B``/``TYPE-I``/``O``) from ``spans`` WITHOUT a per-char
    explode: consecutive runs are built with ``repeat`` per span plus the
    gap to the previous span (grammar spans never overlap)."""
    return f"""
pieces as (
  select {guid_expr} as guid, g_s, g_e, label,
         lag(g_e, 1, 0) over (partition by {guid_expr} order by g_s)
           as prev_e
  from spans),
tagged as (
  select guid,
         string_agg(repeat('O,', cast(g_s - prev_e as bigint)) ||
                    label || '-B,' ||
                    repeat(label || '-I,', cast(g_e - g_s - 1 as bigint)),
                    '' order by g_s) as body,
         max(g_e) as last_e
  from pieces group by guid)"""


def sql_ner_predictions(sf_dir: str) -> str:
    """Serving-schema NER predictions per segment: (guid, text, tags) where
    ``tags`` is the comma-joined per-char BIO sequence the rule scorer
    (grammar argmax) emits — ``words`` of the serving envelope is exactly
    ``list(text)`` and ``tags.split(',')`` restores the list form."""
    return ("with recursive " + _segments_ctes(sf_dir) + ",\n"
            + _segment_spans_ctes() + ",\n"
            + _bio_tag_sql("sha || ':' || seg_index") + """
select s.sha || ':' || s.seg_index as guid, s.text,
       rtrim(coalesce(t.body, '') ||
             repeat('O,', cast(s.slen - coalesce(t.last_e, 0) as bigint)),
             ',') as tags
from segs s
left join tagged t on t.guid = s.sha || ':' || s.seg_index
""")


def sql_prep_tagger_records(sf_dir: str) -> str:
    """Prep-pipeline TRAIN split: same segment/BIO construction as
    :func:`sql_ner_predictions` (the prep guid numbers chunks before the
    min-length filter), restricted to records whose content-keyed split
    bucket ``md5(guid) % 100`` falls in [0, 90) — the exact restatement of
    ``pipelines/prep.split_bucket``."""
    return ("with recursive " + _segments_ctes(sf_dir) + ",\n"
            + _segment_spans_ctes() + ",\n"
            + _bio_tag_sql("sha || ':' || si") + """
select guid, text, labels from (
  select s.sha || ':' || s.si as guid, s.text,
         rtrim(coalesce(t.body, '') ||
               repeat('O,', cast(s.slen - coalesce(t.last_e, 0) as bigint)),
               ',') as labels
  from segs s
  left join tagged t on t.guid = s.sha || ':' || s.si)
where ('0x' || substr(md5(guid), 1, 8))::bigint % 100 < 90
""")


def _crf_span_stats_ctes(sf_dir: str, corpus: str | None = None) -> str:
    """Shared CTEs for the CRF-training oracles: per-span stats over the
    prep segments (``st``: split bucket, label, span length ``n``,
    ``hn`` = 1 iff a char follows the span inside its segment).

    The closed form they feed (derived in ``stages/crf_train`` and verified
    empirically over the gate corpus + pinned edge cases in
    ``tests/test_crf_train.py``):

    - epoch 0 decodes every span char ``B`` (continuation-blind emissions
      tie B/I at continuation chars; zero transitions → per-char argmax,
      first-index tie-break → B), so train mismatch₀ = Σ(n−1) and the
      nonzero bigram-delta cells per type are B→I (+count n≥2),
      I→I (+Σ(n−2)), I→O (+count n≥2·hn), B→B (−Σ(n−1)),
      B→O (−count n≥2·hn); every other cell cancels exactly (gold and
      decode agree on all O positions, spans are never adjacent in the
      grammar corpus — literal pattern prefixes separate them).
    - after one sign update the margins are strict (≥1 through every span
      position, emission-forced elsewhere), so epochs ≥1 decode gold:
      mismatch 0, delta 0, dev F1 = 1e6.

    PER-CELL coverage assumption of the epoch-1 "decode = gold" claim:
    every transition cell a dev decode relies on must be TAUGHT by train —
    a type with an n≥2 dev span needs count(n≥2) > 0 in train (B→I), and
    a type with an n≥3 dev span needs Σ(n−2) > 0 in train (I→I; untaught,
    the decoder alternates B-I-B-I to farm the +1 B→I cell). The gate
    corpus satisfies both densely for all four types; a violation surfaces
    as a value-hash mismatch, not silent corruption (pinned in
    ``tests/test_crf_train.py``)."""
    return ("with recursive "
            + _segments_ctes(sf_dir, corpus=corpus) + ",\n"
            + _segment_spans_ctes() + """,
st as materialized (
  select ('0x' || substr(md5(sha || ':' || si), 1, 8))::bigint % 100 as bkt,
         label, g_e - g_s as n,
         case when g_e < slen then 1 else 0 end as hn
  from spans)""")


def sql_crf_train_run(sf_dir: str, epochs: int = 3,
                      corpus: str | None = None) -> str:
    """Per-epoch training metrics (see :func:`_crf_span_stats_ctes`)."""
    extra_epochs = ", ".join(str(e) for e in range(1, epochs))
    return (_crf_span_stats_ctes(sf_dir, corpus) + f""",
trseg as (
  select count(*) as n_train
  from segs
  where ('0x' || substr(md5(sha || ':' || si), 1, 8))::bigint % 100 < 90),
dvseg as (
  select cast(coalesce(sum(slen), 0) as bigint) as total_tags
  from segs
  where ('0x' || substr(md5(sha || ':' || si), 1, 8))::bigint % 100
        between 90 and 92),
tr as (
  select cast(coalesce(sum(case when n >= 2 then 1 else 0 end), 0) as bigint)
           as c_ge2,
         cast(coalesce(sum(greatest(n - 2, 0)), 0) as bigint) as s_ii,
         cast(coalesce(sum(n - 1), 0) as bigint) as s_nm1,
         cast(coalesce(sum(case when n >= 2 and hn = 1 then 1 else 0 end), 0)
              as bigint) as c_ge2hn
  from st where bkt < 90),
dv as (
  select cast(coalesce(sum(case when n = 1 then 1 else 0 end), 0) as bigint)
           as c1,
         cast(count(*) as bigint) as g,
         cast(coalesce(sum(n), 0) as bigint) as p,
         cast(coalesce(sum(n - 1), 0) as bigint) as mm
  from st where bkt between 90 and 92),
m as materialized (
  select 0 as epoch, (select n_train from trseg) as n_train,
         s_nm1 as mismatch_chars,
         c_ge2 + s_ii + s_nm1 + 2 * c_ge2hn as delta_l1,
         c1 as correct_chunks, g as gold_chunks, p as pred_chunks,
         (select total_tags from dvseg) - mm as dev_correct_tags,
         (select total_tags from dvseg) as dev_total_tags,
         case when p + g > 0 then (2 * c1 * 1000000) // (p + g)
              else 0 end as f1_e6
  from tr, dv
  union all
  select e, (select n_train from trseg), 0, 0, g, g, g,
         (select total_tags from dvseg), (select total_tags from dvseg),
         case when g > 0 then 1000000 else 0 end
  from dv, (select unnest([{extra_epochs}]) as e))
select cast(epoch as bigint) as epoch, cast(n_train as bigint) as n_train,
       mismatch_chars, delta_l1, correct_chunks, gold_chunks, pred_chunks,
       dev_correct_tags, dev_total_tags, f1_e6,
       case when epoch = (select min(epoch) from m
                          where f1_e6 = (select max(f1_e6) from m))
            then 1 else 0 end as is_best
from m order by epoch
""")


def sql_crf_transitions(sf_dir: str, corpus: str | None = None) -> str:
    """The learned matrix's closed form (see :func:`_crf_span_stats_ctes`):
    per TRAIN type, sign of the epoch-0 delta on the five learnable cells;
    every other cell 0 (all-label-pair scaffold)."""
    labels = ["O"] + [f"{t}-{s}" for t in MENTION_PATTERNS for s in "BI"]
    lits = ", ".join(f"'{lab}'" for lab in labels)
    return (_crf_span_stats_ctes(sf_dir, corpus) + f""",
stt as materialized (
  select label,
         cast(sum(case when n >= 2 then 1 else 0 end) as bigint) as c_ge2,
         cast(sum(greatest(n - 2, 0)) as bigint) as s_ii,
         cast(sum(n - 1) as bigint) as s_nm1,
         cast(sum(case when n >= 2 and hn = 1 then 1 else 0 end) as bigint)
           as c_ge2hn
  from st where bkt < 90 group by label),
nz as (
  select label || '-B' as f, label || '-I' as t,
         case when c_ge2 > 0 then 1 else 0 end as w from stt
  union all
  select label || '-I', label || '-I',
         case when s_ii > 0 then 1 else 0 end from stt
  union all
  select label || '-I', 'O',
         case when c_ge2hn > 0 then 1 else 0 end from stt
  union all
  select label || '-B', label || '-B',
         case when s_nm1 > 0 then -1 else 0 end from stt
  union all
  select label || '-B', 'O',
         case when c_ge2hn > 0 then -1 else 0 end from stt),
labs as (select unnest([{lits}]) as lab)
select a.lab as from_label, b.lab as to_label,
       cast(coalesce(nz.w, 0) as bigint) as weight
from labs a cross join labs b
left join nz on nz.f = a.lab and nz.t = b.lab
order by from_label, to_label
""")


def sql_nre_relations(sf_dir: str) -> str:
    """Relation extraction over (def → call) pairs inside each segment:
    every CALL span pairs with the nearest preceding FUNC span (window
    last_value over span order — the ``build_pairs`` fold), instance score
    is the md5-of-identity stand-in (``5000 + md5_32(key) % 5000`` e4),
    and pos1/pos2 are the marker positions of ``marker_featurize``:
    ``pos1 = min(h_start, 127)`` (no markers precede the head-open),
    ``pos2 = min(t_start + 2, 127)`` (head open+close precede tail-open),
    with ``max_length=128``."""
    return ("with recursive " + _segments_ctes(sf_dir) + ",\n"
            + _segment_spans_ctes(["FUNC", "CALL"]) + """,
with_head as (
  select fid, sha, repo, path, seg_index, label, gm, g_s, g_e,
         last_value(case when label = 'FUNC' then gm end ignore nulls)
           over w as head_surface,
         last_value(case when label = 'FUNC' then g_s end ignore nulls)
           over w as h_s
  from spans
  window w as (partition by fid, si order by g_s
               rows between unbounded preceding and current row)),
pairs as (
  select sha || ':' || seg_index as guid, repo, path,
         head_surface, gm as tail_surface, h_s, g_s as t_s
  from with_head
  where label = 'CALL' and head_surface is not null),
scored as (
  select *, 5000 + (('0x' || substr(md5(guid || '|' || head_surface || '|' ||
                     tail_surface || '|' || h_s || '|' || t_s), 1, 8))::bigint
                    % 5000) as score_e4
  from pairs)
select guid, repo, path, head_surface, tail_surface,
       'calls' as relation, cast(score_e4 as bigint) as score_e4,
       score_e4 / 10000.0 as score,
       cast(least(h_s, 127) as int) as pos1,
       cast(least(t_s + 2, 127) as int) as pos2
from scored
""")


def sql_mrc_nbest(sf_dir: str, max_span: int = 200, stride: int = 100,
                  n_top: int = 5, n_best: int = 20) -> str:
    """Sliding-window MRC oracle (the multi-window regime ``mrc_answers``'s
    single-window gate does not cover): per (file × question),

    - windows start at ``i·stride`` with length ``min(max_span, L - start)``,
      count ``ceil(max(1, L - max_span + stride) / stride)``;
    - a window CONTAINS a match iff the full match span fits inside it;
      per-window rank is position order among contained matches, beam-capped
      at ``n_top`` with log-probs ``(-0.1·r, -0.05·r)``;
    - a candidate row is emitted only by the max-context OWNER of its group
      start (``score = min(left, right) + 0.01·len``, tie → lowest window —
      the ``char_is_max_context`` rule, ``mrc_utils.py:80-114``), computed
      in DOUBLE arithmetic identical to the numpy side;
    - every (example, window) contributes one cls row: ``-5`` if the window
      contains any candidate else ``+5``; na_prob is their mean;
    - fan-in (``get_predictions_v2``): order by (total desc, start, end),
      first-wins text dedup, top ``n_best``, softmax (6dp-rounded on both
      sides), final answer nulled when ``na_prob ≥ 0``.

    Examples with no candidates emit one (ord=0, entity='') row so every
    (file × question) appears exactly once or per-kept-entity."""
    corpus = corpus_glob(sf_dir)
    S, T = max_span, stride
    branches = "\nunion all\n".join(f"""
  select sha, L, '{lab}' as qtype,
         {_group_prefix_len(MENTION_PATTERNS[lab])} as plen,
         string_split_regex(content, '{MENTION_PATTERNS[lab]}') as parts,
         regexp_extract_all(content, '{MENTION_PATTERNS[lab]}', 0) as fulls,
         regexp_extract_all(content, '{MENTION_PATTERNS[lab]}', 1) as grps
  from files""" for lab in MENTION_PATTERNS)
    return f"""
with files as materialized (
  select distinct sha256(content) as sha, content,
         length(content) as L
  from read_parquet('{corpus}')),
nw as materialized (
  select sha, L,
         (greatest(1, L - {S} + {T}) + {T} - 1) // {T} as n_win
  from files),
sp as ({branches}),
mrows as (
  select sha, L, qtype, plen,
         unnest(range(1, len(fulls) + 1)) as k,
         unnest(fulls) as fm, unnest(grps) as gm,
         unnest(parts[1:len(fulls)]) as pre
  from sp where len(fulls) > 0),
m as materialized (
  select sha, L, qtype, k, gm,
         cast(sum(length(pre) + length(fm)) over (
             partition by sha, qtype order by k
             rows between unbounded preceding and current row)
           - length(fm) as bigint) as f_s,
         cast(sum(length(pre) + length(fm)) over (
             partition by sha, qtype order by k
             rows between unbounded preceding and current row) as bigint)
           as f_e,
         plen
  from mrows),
mg as materialized (
  select m.sha, m.qtype, m.k, m.gm, m.f_s + m.plen as g_s,
         m.f_s + m.plen + length(m.gm) as g_e, m.L, n.n_win,
         greatest(0, cast(ceil((m.f_e - {S}) / {T}.0) as bigint)) as i_lo,
         least(m.f_s // {T}, n.n_win - 1) as i_hi
  from m join nw n using (sha)),
mw as materialized (
  select sha, qtype, k, gm, g_s, g_e, L,
         unnest(range(i_lo, i_hi + 1)) as win
  from mg where i_lo <= i_hi),
owned as (
  select *, row_number() over (
      partition by sha, qtype, k
      order by least(g_s - win * {T},
                     win * {T} + least({S}, L - win * {T}) - 1 - g_s)
               + 0.01 * least({S}, L - win * {T}) desc,
               win asc) as own_rn
  from mw),
ranked as (
  select sha, qtype, k, gm, g_s, g_e, win, own_rn,
         row_number() over (partition by sha, qtype, win
                            order by g_s) - 1 as rnk
  from owned),
emitted as (
  select sha, qtype, gm, g_s, g_e,
         (-0.1 * rnk) + (-0.05 * rnk) as total
  from ranked where own_rn = 1 and rnk < {n_top}),
wins as (
  select n.sha, q.qtype, unnest(range(0, n.n_win)) as win
  from nw n cross join (select unnest(['IMPORT', 'CLASS', 'FUNC', 'CALL'])
                        as qtype) q),
cls as materialized (
  select w.sha, w.qtype,
         avg(case when c.win is not null then -5.0 else 5.0 end) as na_prob
  from wins w
  left join (select distinct sha, qtype, win from mw) c
    on c.sha = w.sha and c.qtype = w.qtype and c.win = w.win
  group by w.sha, w.qtype),
deduped as (
  select *, row_number() over (
      partition by sha, qtype, gm
      order by total desc, g_s asc, g_e asc) as dup_rn
  from emitted),
kept as materialized (
  select sha, qtype, gm, g_s, g_e, total,
         row_number() over (partition by sha, qtype
                            order by total desc, g_s asc, g_e asc) as ord
  from deduped where dup_rn = 1
  qualify ord <= {n_best}),
kept_mx as (
  select *, max(total) over (partition by sha, qtype) as mx from kept),
probs as (
  select sha, qtype, gm, ord,
         round(exp(total - mx) /
               sum(exp(total - mx)) over (partition by sha, qtype), 6)
           as prob,
         count(*) over (partition by sha, qtype) as n_entities
  from kept_mx),
firsts as (
  select sha, qtype, gm as top_entity from kept where ord = 1)
select c.sha || ':' || c.qtype as example_id,
       coalesce(p.ord, 0) as ord,
       coalesce(p.gm, '') as entity,
       coalesce(p.prob, 0.0) as prob,
       coalesce(p.n_entities, 0) as n_entities,
       c.na_prob,
       case when f.top_entity is not null and c.na_prob < 0.0
            then f.top_entity else '' end as final_answer
from cls c
left join probs p on p.sha = c.sha and p.qtype = c.qtype
left join firsts f on f.sha = c.sha and f.qtype = c.qtype
"""


def sql_mrc_token_answers(sf_dir: str, corpus: str | None = None) -> str:
    """TOKEN-level MRC oracle (``stages/mrc.token_mrc_pipeline`` +
    ``pipelines/queries.q_mrc_token_answers``'s reduced shape).

    The pipeline's banded-LCS char↔token alignment
    (``functions/alignment.py``, mirroring ``mrc_utils.py:116-244``) is not
    SQL-expressible as a DP — but for the SP-style stand-in tokenizer
    (whitespace words, ▁→space concatenation) the alignment RESULT has a
    provable closed form, which this oracle restates directly:

    - ``ends[i]`` = original char index of word *i*'s last char (every word
      char is matched by the LCS);
    - ``starts[i]`` = the FIRST literal space of the whitespace gap before
      word *i* when the gap contains one (the DP's forward pass sets the
      match flag at the earliest in-band row that strictly improves, and
      the backtrace's up-move precedence lands on it), else the first gap
      char via ``convert_index`` front-interpolation (= ``prev_end + 1``),
      else 0 for a leading no-space gap;
    - zero-features exclusions: no tokens, either LCS buffer side over the
      1024 cap, or matched chars (word chars + one per space-bearing gap)
      < 0.8·len — the reference's MISMATCH bail-out
      (``mrc_utils.py:216-230``; the drop is strict ``<`` — the band loop
      breaks on ``>`` but the bail-out tests ``<``, so EXACT equality is
      KEPT; r4 fixed the gate's ``>`` to ``>=`` after randomized layouts
      found the divergence — see
      ``tests/test_token_mrc.py::test_token_oracle_parity_edge_corpus``).

    Tie-break assumptions (earliest-space match; band wide enough that the
    banded DP equals the true LCS) are exactly what the hash gate checks —
    validated against the Python alignment over the full sf0.01 corpus.
    Downstream restates ``_token_feature_rows`` in token space: candidate
    char span → token span via rank counts (``searchsorted`` ≡ filtered
    counts over the token table), sliding windows over token counts with a
    per-question ``max_tokens_for_doc``, per-window (ts, te) beam rank,
    max-context ownership of the candidate's START token over ALL
    position-containing windows (``mrc_utils.py:80-114``), ±5 per-window
    cls rows, and the ``get_predictions_v2`` fan-in with 6dp-both-sides
    softmax rounding."""
    from .stages.mrc import (QUESTIONS, TOKEN_DOC_STRIDE, TOKEN_LCS_CAP,
                             TOKEN_MAX_QUERY_LENGTH, TOKEN_MAX_SEQ_LENGTH,
                             sp_tokenize)
    corpus = corpus or corpus_glob(sf_dir)
    T = TOKEN_DOC_STRIDE
    n_top, n_best, cap = 5, 20, TOKEN_LCS_CAP
    # per-question max_tokens_for_doc (the question token count is a seeded
    # constant of the pipeline → embedded as a literal, CLAUDE.md technique)
    qs = ", ".join(
        f"('{t}', {TOKEN_MAX_SEQ_LENGTH - len(sp_tokenize(q)[:TOKEN_MAX_QUERY_LENGTH]) - 3})"
        for t, q in QUESTIONS.items())
    branches = "\nunion all\n".join(f"""
  select sha, '{lab}' as qtype,
         {_group_prefix_len(MENTION_PATTERNS[lab])} as plen,
         string_split_regex(content, '{MENTION_PATTERNS[lab]}') as parts,
         regexp_extract_all(content, '{MENTION_PATTERNS[lab]}', 0) as fulls,
         regexp_extract_all(content, '{MENTION_PATTERNS[lab]}', 1) as grps
  from elig""" for lab in MENTION_PATTERNS)
    header = f"""
with files as materialized (
  select distinct sha256(content) as sha, {_ws_guarded()} as content,
         length(content) as L
  from read_parquet('{corpus}')),
tk as (
  select sha, content, L,
         regexp_extract_all(content, '\\S+') as ws,
         string_split_regex(content, '\\S+') as gaps,
         length(regexp_replace(content, '\\s', '', 'g')) as nonws
  from files),
elig as materialized (
  select sha, content, L, ws, gaps, len(ws) as n_toks
  from tk
  where len(ws) > 0 and L <= {cap} and nonws + len(ws) <= {cap}
    and cast(nonws + len(list_filter(gaps[1:len(ws)],
                                     g -> contains(g, ' '))) as double)
        >= 0.8 * L),
tokrows as (
  select sha, unnest(range(1, n_toks + 1)) as i,
         unnest(ws) as w, unnest(gaps[1:n_toks]) as gap
  from elig),
tokpos as (
  select sha, i, w, gap,
         cast(sum(length(gap) + length(w)) over (
             partition by sha order by i
             rows between unbounded preceding and current row)
           - length(w) as bigint) as wstart
  from tokrows),
tok as materialized (
  select sha, i - 1 as ti,
         case when strpos(gap, ' ') > 0
              then wstart - length(gap) + strpos(gap, ' ') - 1
              else wstart - length(gap) end as tstart,
         wstart + length(w) - 1 as tend
  from tokpos)"""
    return header + "," + _token_mrc_tail(qs, branches, T, n_top, n_best)


def _token_mrc_tail(qs: str, branches: str, T: int, n_top: int,
                    n_best: int) -> str:
    """Window/beam/ownership/merge tail SHARED by the stand-in and the
    SP-tokenizer token-MRC oracles (they differ only in how the token table
    is built). Contract: the caller's header must define
    ``elig(sha, content, n_toks)`` — n_toks = TOKEN count — and
    ``tok(sha, ti, tstart, tend)`` — per-token original-char span maps."""
    return f"""
qm as (select * from (values {qs}) q(qtype, S)),
nw as materialized (
  select e.sha, q.qtype, q.S, e.n_toks,
         (greatest(1, e.n_toks - q.S + {T}) + {T} - 1) // {T} as n_win
  from elig e cross join qm q),
sp as ({branches}),
mrows as (
  select sha, qtype, plen,
         unnest(range(1, len(fulls) + 1)) as k,
         unnest(fulls) as fm, unnest(grps) as gm,
         unnest(parts[1:len(fulls)]) as pre
  from sp where len(fulls) > 0),
cand as (
  select sha, qtype, k, gm,
         cast(sum(length(pre) + length(fm)) over (
             partition by sha, qtype order by k
             rows between unbounded preceding and current row)
           - length(fm) + plen as bigint) as g_s,
         cast(sum(length(pre) + length(fm)) over (
             partition by sha, qtype order by k
             rows between unbounded preceding and current row)
           - length(fm) + plen + length(gm) as bigint) as g_e
  from mrows),
candtok as (
  select c.sha, c.qtype, c.k,
         count(*) filter (where t.tend < c.g_s) as ts,
         coalesce(max(t.ti) filter (where t.tstart <= c.g_e - 1), -1) as te
  from cand c join tok t using (sha)
  group by c.sha, c.qtype, c.k),
vc as materialized (
  select ct.sha, ct.qtype, ct.k, ct.ts, ct.te,
         trim(substr(e.content, tsx.tstart + 1,
                     tex.tend - tsx.tstart + 1),
              ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))
           as text
  from candtok ct
  join elig e using (sha)
  join tok tsx on tsx.sha = ct.sha and tsx.ti = ct.ts
  join tok tex on tex.sha = ct.sha and tex.ti = ct.te
  where ct.te >= 0 and ct.ts <= ct.te and ct.ts < e.n_toks),
vcw as materialized (
  select v.sha, v.qtype, v.k, v.ts, v.te, v.text,
         n.S, n.n_toks, n.n_win,
         greatest(0, cast(ceil((v.te + 1 - n.S) / {T}.0) as bigint)) as i_lo,
         least(v.ts // {T}, n.n_win - 1) as i_hi,
         greatest(0, cast(ceil((v.ts + 1 - n.S) / {T}.0) as bigint)) as p_lo,
         least(v.ts // {T}, n.n_win - 1) as p_hi
  from vc v join nw n using (sha, qtype)),
mw as materialized (
  select sha, qtype, k, ts, te, text, S, n_toks,
         unnest(range(i_lo, i_hi + 1)) as win
  from vcw where i_lo <= i_hi),
owned as (
  select sha, qtype, k, win,
         row_number() over (
             partition by sha, qtype, k
             order by least(ts - win * {T},
                            win * {T} + least(S, n_toks - win * {T}) - 1 - ts)
                      + 0.01 * least(S, n_toks - win * {T}) desc,
                      win asc) as own_rn
  from (select sha, qtype, k, ts, S, n_toks,
               unnest(range(p_lo, p_hi + 1)) as win
        from vcw where p_lo <= p_hi)),
ranked as (
  select sha, qtype, k, ts, te, text, win,
         row_number() over (partition by sha, qtype, win
                            order by ts, te, k) - 1 as rnk
  from mw),
emitted as (
  select r.sha, r.qtype, r.ts, r.te, r.text,
         -0.1 * r.rnk as s_lp, -0.05 * r.rnk as e_lp
  from ranked r
  join owned o on o.sha = r.sha and o.qtype = r.qtype and o.k = r.k
              and o.win = r.win and o.own_rn = 1
  where r.rnk < {n_top}),
wins as (
  select sha, qtype, unnest(range(0, n_win)) as win from nw),
cls as materialized (
  select w.sha, w.qtype,
         avg(case when c.win is not null then -5.0 else 5.0 end) as na_prob
  from wins w
  left join (select distinct sha, qtype, win from mw) c
    on c.sha = w.sha and c.qtype = w.qtype and c.win = w.win
  group by w.sha, w.qtype),
cell as (
  select sha, qtype, ts, te, min(text) as text,
         avg(s_lp) + avg(e_lp) as total
  from emitted group by sha, qtype, ts, te),
deduped as (
  select *, row_number() over (
      partition by sha, qtype, text
      order by total desc, ts asc, te asc) as dup_rn
  from cell),
kept as (
  select sha, qtype, text, total,
         row_number() over (partition by sha, qtype
                            order by total desc, ts asc, te asc) as ord
  from deduped where dup_rn = 1
  qualify ord <= {n_best}),
kept_mx as (
  select *, max(total) over (partition by sha, qtype) as mx from kept),
agg as (
  select sha, qtype, cast(count(*) as bigint) as n_entities,
         round(1.0 / sum(exp(total - mx)), 6) as top_prob,
         min(case when ord = 1 then text end) as top_text
  from kept_mx group by sha, qtype)
select c.sha || ':' || c.qtype as example_id,
       coalesce(a.n_entities, 0) as n_entities,
       coalesce(a.top_prob, 0.0) as top_prob,
       c.na_prob,
       case when a.top_text is not null and c.na_prob < 0.0
            then a.top_text else '' end as final_answer
from cls c
left join agg a on a.sha = c.sha and a.qtype = c.qtype
"""


def _sp_vocab_literals() -> tuple[str, str, int, float]:
    """The committed SP vocab fixture as SQL map literals — the seeded
    constants of the SP tokenizer embedded directly (CLAUDE.md technique:
    seeded-randomness operators gate by embedding their constants)."""
    from .functions.sptokenizer import SpUnigramModel
    m = SpUnigramModel.from_vocab_file()
    pieces = sorted(m.scores)
    keys = ", ".join("'" + p.replace("'", "''") + "'" for p in pieces)
    vals = ", ".join(repr(m.scores[p]) for p in pieces)
    return keys, vals, m.max_len, m.unk_score


def sql_mrc_token_answers_sp(sf_dir: str, corpus: str | None = None) -> str:
    """SP-tokenizer token-MRC oracle (``q_mrc_token_answers_sp``).

    Two genuinely new restatements over ``sql_mrc_token_answers``:

    1. **Unigram Viterbi in SQL** — the real SentencePiece segmentation
       (``functions/sptokenizer.SpUnigramModel.encode_as_pieces``) as a
       recursive CTE over the distinct lowered words: the fold state per
       word is the last-``max_len`` best-score window plus the back-pointer
       list, the per-step argmax is a pure ``list_transform`` /
       ``list_reduce`` over candidate piece lengths against the vocab MAP
       literal (tie-break: strict improvement keeps the shorter piece —
       identical to the Python loop), and the backtrace is a
       ``list_reduce`` fold producing the piece boundaries. Bit-exact: the
       same doubles (``repr`` round-trip), same comparison order.
    2. **Closed-form alignment WITH case mismatches** — the tokenizer
       lowercases, so every original uppercase char is unaligned in the
       banded LCS and resolves through ``convert_index``
       (``mrc_utils.py:43-76``). For this corpus (uppercase only at word
       offset 0 — GUARDED with a loud ``error()``), the interpolation has
       a closed form, validated against the pipeline's DP over all 11k
       sf0.001+sf0.01 files and pinned by
       ``tests/test_sp_tokenizer.py``. The 0.8·n mismatch bar loses the
       uppercase chars from the matched count.

    The digit-comma ``encode_pieces`` hack is DORMANT on this corpus
    (``,`` never follows a digit inside a word) — guarded loudly, covered
    by unit tests. Window/beam/merge tail shared with the stand-in oracle
    (``_token_mrc_tail``)."""
    from .functions.sptokenizer import sp_tokenize_real
    from .stages.mrc import (QUESTIONS, TOKEN_DOC_STRIDE, TOKEN_LCS_CAP,
                             TOKEN_MAX_QUERY_LENGTH, TOKEN_MAX_SEQ_LENGTH)
    corpus = corpus or corpus_glob(sf_dir)
    T = TOKEN_DOC_STRIDE
    n_top, n_best, cap = 5, 20, TOKEN_LCS_CAP
    keys, vals, ML, unk = _sp_vocab_literals()
    qs = ", ".join(
        f"('{t}', {TOKEN_MAX_SEQ_LENGTH - len(sp_tokenize_real(q)[:TOKEN_MAX_QUERY_LENGTH]) - 3})"
        for t, q in QUESTIONS.items())
    branches = "\nunion all\n".join(f"""
  select sha, '{lab}' as qtype,
         {_group_prefix_len(MENTION_PATTERNS[lab])} as plen,
         string_split_regex(content, '{MENTION_PATTERNS[lab]}') as parts,
         regexp_extract_all(content, '{MENTION_PATTERNS[lab]}', 0) as fulls,
         regexp_extract_all(content, '{MENTION_PATTERNS[lab]}', 1) as grps
  from elig""" for lab in MENTION_PATTERNS)
    header = f"""
with recursive
files as materialized (
  select distinct sha256(content) as sha, {_ws_guarded()} as content,
         length(content) as L
  from read_parquet('{corpus}')),
tk as (
  select sha, content, L,
         regexp_extract_all(content, '\\S+') as ws,
         string_split_regex(content, '\\S+') as gaps,
         length(regexp_replace(content, '\\s', '', 'g')) as nonws,
         length(regexp_replace(content, '[^A-Z]', '', 'g')) as nupper
  from files),
eligw as materialized (
  select sha, content, L, ws, gaps, len(ws) as n_words
  from tk
  where len(ws) > 0 and L <= {cap} and nonws + len(ws) <= {cap}
    and cast(nonws - nupper + len(list_filter(gaps[1:len(ws)],
                                              g -> contains(g, ' ')))
             as double) >= 0.8 * L),
wordrows as (
  select sha, unnest(range(1, n_words + 1)) as wi,
         unnest(ws) as w, unnest(gaps[1:n_words]) as gap
  from eligw),
wordpos as materialized (
  select sha, wi, gap,
         case when regexp_matches(w[2:], '[A-Z]')
                or (length(w) = 1 and regexp_matches(w, '^[A-Z]$'))
              then error('sp oracle assumption violated: uppercase past '
                         || 'word offset 0 or single-char uppercase word '
                         || '(word=' || w || ') — the closed-form '
                         || 'alignment does not cover this input')
              else lower(w) end as lw,
         regexp_matches(w, '^[A-Z]') as cap,
         cast(sum(length(gap) + length(w)) over (
             partition by sha order by wi
             rows between unbounded preceding and current row)
           - length(w) as bigint) as wstart
  from wordrows),
vm as (select map([{keys}], [{vals}]::double[]) as m),
wseg as (select distinct lw as w from wordpos),
wch as (select w, '▁' || w as s, length(w) + 1 as n from wseg),
vit as (
  select w, s, n, 0 as i,
         [0.0]::double[] as win, []::int[] as back
  from wch
  union all
  select w, s, n, i + 1,
         list_slice(win || [mx], greatest(1, len(win) + 2 - {ML}),
                    len(win) + 1),
         back || [bl]
  from (
    select w, s, n, i, win, back,
           list_aggregate(list_transform(cl, x -> x.c), 'max') as mx,
           list_aggregate(
             list_transform(
               list_filter(cl, x -> x.c = list_aggregate(
                   list_transform(cl, y -> y.c), 'max')),
               x -> x.l), 'min') as bl
    from (
      select v.w, v.s, v.n, v.i, v.win, v.back,
             list_filter(
               list_transform(range(1, least(v.i + 1, {ML}) + 1),
                 l -> {{'c': coalesce(m[v.s[v.i + 2 - l : v.i + 1]][1],
                                      case when l = 1
                                           then {unk!r}::double end)
                              + v.win[len(v.win) + 1 - l],
                       'l': l}}),
               x -> x.c is not null) as cl
      from vit v, vm
      where v.i < v.n) q0) q),
vfin as (select w, s, n, back from vit where i = n),
vbt as (
  select w, s, n, back, n as pos
  from vfin
  union all
  select w, s, n, back, pos - back[pos]
  from vbt where pos > 0),
pcs as materialized (
  select w,
         row_number() over (partition by w order by hi) as k,
         case when regexp_matches(s[lo + 1 : hi], '[0-9],$')
              then error('sp oracle: encode_pieces digit-comma re-split '
                         || 'triggered on word ' || w || ' — not '
                         || 'restated in SQL')
              else lo - 1 end as a,
         hi - 2 as b
  from (
    select w, s, lag(pos) over (partition by w order by pos) as lo,
           pos as hi
    from vbt)
  where lo is not null),
tokp as (
  select wp.sha, wp.wi, p.k, wp.wstart, wp.cap,
         length(wp.gap) as glen, strpos(wp.gap, ' ') as gsp,
         p.a, p.b
  from wordpos wp join pcs p on p.w = wp.lw),
tok as materialized (
  select sha, row_number() over (partition by sha order by wi, k) - 1 as ti,
         case
           when a > 0 or (a = 0 and not cap) then wstart + a
           when a = 0 then
             case when gsp > 0 then
                    case when wstart + 1 > wstart - glen + gsp
                         then wstart - glen + gsp else wstart + 1 end
                  when wi > 1 then
                    case when wstart + 1 > wstart - glen
                         then wstart - glen else wstart + 1 end
                  else 0 end
           else
             case when gsp > 0 then wstart - glen + gsp - 1
                  when wi > 1 then wstart - glen
                  else 0 end
         end as tstart,
         case
           when b > 0 or (b = 0 and not cap) then wstart + b
           when b = 0 then
             case when gsp > 0 then
                    case when wstart - glen + gsp - 1 < wstart
                         then wstart else wstart - glen + gsp - 1 end
                  when wi > 1 then
                    case when wstart - glen - 1 < wstart
                         then wstart else wstart - glen - 1 end
                  else case when wstart + 1 >= 1 then wstart
                            else wstart + 1 end end
           else
             case when gsp > 0 then wstart - glen + gsp - 1
                  when wi = 1 then 0
                  else case when wstart - glen - 1 <
                                 wstart + (case when cap then 1 else 0 end)
                                 - 1
                            then wstart
                                 + (case when cap then 1 else 0 end) - 1
                            else wstart - glen - 1 end
                  end
         end as tend
  from tokp),
elig as materialized (
  select e.sha, e.content, t.n_toks
  from eligw e
  join (select sha, count(*) as n_toks from tok group by sha) t
    using (sha))"""
    return header + "," + _token_mrc_tail(qs, branches, T, n_top, n_best)


KG_ORACLES = {
    "kg_corpus_sha": sql_corpus_sha,
    "corpus_line_dedup": sql_corpus_line_dedup,
    "corpus_substring_dedup": sql_corpus_substring_dedup,
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
    "ner_predictions": sql_ner_predictions,
    "prep_tagger_records": sql_prep_tagger_records,
    "nre_relations": sql_nre_relations,
    "mrc_nbest": sql_mrc_nbest,
    "mrc_token_answers": sql_mrc_token_answers,
    "mrc_token_answers_sp": sql_mrc_token_answers_sp,
    "crf_train_run": sql_crf_train_run,
    "crf_transitions": sql_crf_transitions,
    # train → serve: Viterbi inference with the LEARNED matrix must equal
    # the hand-coded-constraint decode on margin-dominated emissions
    "ner_predictions_trained": sql_ner_predictions,
}
