"""DuckDB oracle SQL for operators over the provided test tables
(documents / embeddings / events / TPC-H-ish). These run against the
driver's pre-registered views, so no paths are embedded.

Exactness strategy: every float aggregate is a scaled-integer sum
(``sum(cast(round(x*10^k, 0) as bigint))``), matching the Ray side's
vectorized int64 sums — order-independent, hash-exact. The regex engine on
both sides is RE2 (pyarrow and DuckDB), so regex counts agree exactly.
"""

from __future__ import annotations

import numpy as np

from .stages.text_analysis import (BPE_TOKEN_RE, LANG_MARKERS, PUNCT_RE,
                                   STOPWORD_RE, TOKEN_RE)

SQL_DOC_EXACT_DEDUP = """
select sha256(text) as text_sha, min(doc_id) as rep_doc_id,
       count(*) as n_dups
from documents group by 1
"""

SQL_DOC_TOKEN_COUNT = f"""
select doc_id,
       cast(len(regexp_extract_all(text, '{TOKEN_RE}')) as bigint)
         as n_tokens
from documents
"""

SQL_DOC_QUALITY = f"""
with c as (
  select doc_id,
         cast(length(text) as bigint) as n_chars,
         cast(len(regexp_extract_all(text, '{TOKEN_RE}')) as bigint)
           as n_tokens,
         cast(len(regexp_extract_all(text, '{PUNCT_RE}')) as bigint)
           as n_punct,
         cast(len(regexp_extract_all(text, '{STOPWORD_RE}')) as bigint)
           as n_stopwords
  from documents)
select *,
       (n_tokens >= 20 and 100 * n_punct < 10 * n_chars
        and 100 * n_stopwords >= 2 * n_tokens) as quality_ok
from c
"""


def _langid_sql() -> str:
    langs = sorted(LANG_MARKERS)       # de, en, es, fr — alphabetical
    cols = ",\n         ".join(
        f"cast(len(regexp_extract_all(text, '{LANG_MARKERS[l]}')) as bigint)"
        f" as {l}" for l in langs)
    # argmax with first-alphabetical tie-break == Ray's argmax(axis=1)
    case = (f"case when greatest({', '.join(langs)}) = 0 then 'und' "
            f"when de >= en and de >= es and de >= fr then 'de' "
            f"when en >= es and en >= fr then 'en' "
            f"when es >= fr then 'es' else 'fr' end")
    return f"""
with v as (
  select doc_id,
         {cols}
  from documents)
select doc_id, {case} as pred_lang from v
"""


SQL_DOC_LANGID = _langid_sql()

SQL_DOC_JACCARD_PAIRS = """
select d1.source as source, d1.doc_id as doc_id_a, d2.doc_id as doc_id_b,
       jaccard(d1.text, d2.text) as jaccard
from documents d1
join documents d2 on d1.source = d2.source and d1.doc_id < d2.doc_id
where jaccard(d1.text, d2.text) >= 0.5
"""

SQL_KNN_TOPK = """
with e as (
  select vec_id, list_transform(embedding, x -> cast(x as double)) as v
  from embeddings),
q as (select vec_id as q_id, v as qv from e where vec_id < 8)
select q_id, vec_id as neighbor_id,
       cast(row_number() over (
         partition by q_id
         order by list_cosine_similarity(qv, v) desc, vec_id asc)
         as bigint) as rank,
       round(list_cosine_similarity(qv, v), 6) as sim
from q join e on e.vec_id <> q.q_id
qualify rank <= 10
"""

# batch-query form (r4): every vector queries the whole table — the gate
# covers the chunked-broadcast + merge path end-to-end (Q = all vec_ids)
SQL_KNN_TOPK_BATCH = """
with e as (
  select vec_id, list_transform(embedding, x -> cast(x as double)) as v
  from embeddings)
select q.vec_id as q_id, e.vec_id as neighbor_id,
       cast(row_number() over (
         partition by q.vec_id
         order by list_cosine_similarity(q.v, e.v) desc, e.vec_id asc)
         as bigint) as rank,
       round(list_cosine_similarity(q.v, e.v), 6) as sim
from e q join e on e.vec_id <> q.vec_id
qualify rank <= 5
"""


def _hyperplane_bucket_expr(bits: int, dim: int, seed: int) -> str:
    """SQL expression for the hyperplane-LSH bucket of a double list ``v``:
    the seeded plane matrix is embedded as SQL literals (repr round-trips
    float64 exactly), so the bucket assignment matches the numpy side.

    NEAR-TIE ASSUMPTION (knn_lsh / knn_ivf / embedding_neardup gates): the
    plane/centroid literals are exact, but the DOT PRODUCTS are accumulated
    in different orders (numpy pairwise summation vs DuckDB's sequential
    ``list_dot_product``), so a dot product within ~1 ulp of 0 (or an IVF
    cell distance within ~1 ulp of a tie) could assign differently on the
    two sides and flip the gate. Verified not to occur on the provided
    embeddings (min |dot| and min cell-distance gap are ~1e-2, checked in
    ``tests/test_table_queries.py::test_lsh_oracle_margins``); regenerated
    inputs with near-degenerate vectors would need scaled-int quantization
    of the dot products on both sides instead."""
    from .stages.knn import lsh_planes
    planes = lsh_planes(dim, bits, seed)

    def plane_list(j: int) -> str:
        return "[" + ", ".join(repr(float(x)) for x in planes[:, j]) + "]"

    return " + ".join(
        f"(case when list_dot_product(v, {plane_list(j)}) > 0"
        f" then {1 << j} else 0 end)" for j in range(bits))


def _knn_lsh_sql(bits: int = 8, dim: int = 64, seed: int = 5,
                 n_queries: int = 8, k: int = 10) -> str:
    """knn_lsh oracle: literal-plane bucket filter, then exact cosine top-k
    among candidates."""
    bucket = _hyperplane_bucket_expr(bits, dim, seed)
    return f"""
with e as (
  select vec_id, list_transform(embedding, x -> cast(x as double)) as v
  from embeddings),
b as (select vec_id, v, {bucket} as bucket from e),
q as (select vec_id as q_id, v as qv, bucket as qb from b
      where vec_id < {n_queries}),
cand as (select * from b where bucket in (select qb from q))
select q_id, vec_id as neighbor_id,
       cast(row_number() over (
         partition by q_id
         order by list_cosine_similarity(qv, v) desc, vec_id asc)
         as bigint) as rank,
       round(list_cosine_similarity(qv, v), 6) as sim
from q join cand on cand.vec_id <> q.q_id
qualify rank <= {k}
"""


SQL_KNN_LSH = _knn_lsh_sql()


def _embedding_neardup_sql(threshold: float = 0.35, bits: int = 8,
                           dim: int = 64, seed: int = 5) -> str:
    """embedding_neardup oracle: same literal-plane bucket assignment as
    ``stages/dedup.HyperplaneBucketer``, in-bucket self-join, cosine
    threshold, 6dp half-away rounding on both sides. Parameterized at
    0.35/8 bits (r4) so the hash gate covers NON-EMPTY output on the
    provided vectors (5 pairs at sf0.01, 97 at sf0.1); margins to the
    threshold (≥9e-5) and to 6dp rounding boundaries (≥1e-11) are far
    above cross-engine float noise — pinned by
    ``tests/test_table_queries.py::test_lsh_oracle_margins``."""
    bucket = _hyperplane_bucket_expr(bits, dim, seed)
    return f"""
with e as (
  select vec_id, list_transform(embedding, x -> cast(x as double)) as v
  from embeddings),
b as (select vec_id, v, {bucket} as bucket from e)
select a.vec_id as vec_id_a, b2.vec_id as vec_id_b,
       round(list_cosine_similarity(a.v, b2.v), 6) as cosine
from b a join b b2 on a.bucket = b2.bucket and a.vec_id < b2.vec_id
where list_cosine_similarity(a.v, b2.v) >= {threshold}
"""


SQL_EMBEDDING_NEARDUP = _embedding_neardup_sql()


# --- exact uint64 arithmetic in SQL (hugeint limb helpers) -----------------
# 64-bit wraparound multiply = two 32-bit partial products mod 2^64;
# xor-shift = hugeint xor (exact, probed) with a floor-divide shift. Shared
# by every oracle that restates an avalanche/mix hash (simhash, sampling).

_M64 = 1 << 64


def _mulmod64(h: str, c: int) -> str:
    """SQL expr for (h * c) mod 2^64, h a hugeint expr in [0, 2^64)."""
    chi, clo = c >> 32, c & 0xFFFFFFFF
    return (f"(({h}) * {clo}::hugeint + "
            f"((({h}) % 4294967296::hugeint) * {chi}::hugeint "
            f"% 4294967296::hugeint) * 4294967296::hugeint) "
            f"% {_M64}::hugeint")


def _xorshift64(h: str, s: int) -> str:
    """SQL expr for h ^ (h >> s), h a hugeint expr in [0, 2^64)."""
    return f"xor({h}, ({h}) // {1 << s}::hugeint)"


def _to_int64(h: str) -> str:
    """SQL expr: two's-complement reinterpretation of a [0, 2^64) hugeint."""
    return (f"cast(case when ({h}) >= {1 << 63}::hugeint "
            f"then ({h}) - {_M64}::hugeint else ({h}) end as bigint)")


def _simhash_sql(seed: int = 11) -> str:
    """doc_simhash oracle: the SimHasher's exact semantics restated in SQL —
    polynomial byte hash mod 2^64 (hex expansion, as in the fingerprint
    oracle), splitmix64 avalanche via the hugeint limb helpers, per-bit
    majority votes as 64 aggregate columns, two's-complement repack.
    Bit-identical to ``stages/dedup.SimHasher`` (verified over the full
    sf0.01 corpus)."""
    from .stages.dedup import SimHasher
    salt = int(SimHasher(seed).salt)
    m = _M64
    c1, c2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    mulmod, xorshift = _mulmod64, _xorshift64

    votes = ",\n       ".join(
        f"sum(((h // {1 << b}::hugeint) % 2)::bigint) as v{b}"
        for b in range(64))
    packed = " + ".join(
        f"(case when 2 * v{b} > n then {1 << b}::hugeint else 0::hugeint end)"
        for b in range(64))
    return f"""
with recursive toks as (
  select doc_id, unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) as tok
  from documents),
tb as (
  select row_number() over () as tid, doc_id,
         hex(tok) as hx, length(hex(tok)) // 2 as L
  from toks),
-- powers bound derived from the actual max token length (the numpy
-- SimHasher grows its table on demand; a fixed cap would silently drop
-- bytes of over-long tokens — r2 ADVICE item)
powers(e, pw) as (
  select 0, 1::hugeint
  union all
  select e + 1, (pw * 1000003::hugeint) % {m}::hugeint
  from powers where e < (select coalesce(max(L), 1) from tb)),
bytes as (
  select tid, doc_id, L, hx, unnest(range(0, L)) as i from tb),
h0 as (
  select tid, doc_id,
         sum((('0x' || substr(hx, 2 * i + 1, 2))::bigint)::hugeint * p.pw)
           % {m}::hugeint as h
  from bytes join powers p on p.e = L - 1 - i
  group by 1, 2),
a1 as (select tid, doc_id, {xorshift('h', 30)} as h from h0),
a2 as (select tid, doc_id, {mulmod('h', c1)} as h from a1),
a3 as (select tid, doc_id, {xorshift('h', 27)} as h from a2),
a4 as (select tid, doc_id, {mulmod('h', c2)} as h from a3),
a5 as (select tid, doc_id, {xorshift('h', 31)} as h from a4),
a6 as (select tid, doc_id, xor(h, {salt}::hugeint) as h from a5),
vt as (select doc_id, count(*) as n,
       {votes}
       from a6 group by doc_id),
sh as (select doc_id, {packed} as su from vt)
select d.doc_id,
       cast(case when coalesce(su, 0::hugeint) >= {1 << 63}::hugeint
                 then coalesce(su, 0::hugeint) - {m}::hugeint
                 else coalesce(su, 0::hugeint) end as bigint) as simhash
from documents d left join sh using (doc_id)
"""


SQL_DOC_SIMHASH = _simhash_sql()

def _minhash_pairs_sql(num_hashes: int = 128, num_bands: int = 32,
                       shingle_k: int = 5, seed: int = 7,
                       max_bucket: int = 1000,
                       threshold: float = 0.7) -> str:
    """doc_minhash_pairs oracle — the full MinHash-LSH chain restated in
    exact SQL arithmetic (every step is mod-2^61/2^64 integer math, so the
    hugeint restatement is bit-identical to ``stages/dedup``):

    1. distinct k-gram shingle hashes per doc: byte polynomial mod 2^64 via
       the hex expansion (the fingerprint-oracle technique);
    2. signature: 128 ``min`` aggregate columns of the seeded affine
       permutations — ``(sh·a_i + b_i) mod 2^61`` (the numpy side wraps at
       2^64 then masks to 61 bits; 2^61 | 2^64, so one mod suffices).
       a/b literals come from the same ``RandomState(seed)`` draw;
    3. band fragment hashes: the r-value polynomial fold mod 2^64, one
       UNION ALL arm per band;
    4. LSH buckets: all pairs (a < b) for buckets ≤ ``max_bucket``, STAR
       pairs to the bucket min above it; ``n_bands`` = per-pair emission
       count across buckets;
    5. verify: exact shingle Jaccard via a pair ⋈ shingles ⋈ shingles
       match count; threshold filter.

    Assumes every doc has ≥ ``shingle_k`` bytes (the numpy side zero-pads
    shorter docs; none exist in the provided tables)."""
    import numpy as np
    m61 = 1 << 61
    rs = np.random.RandomState(seed)
    a = rs.randint(1, m61, size=num_hashes).astype(np.uint64)
    b = rs.randint(0, m61, size=num_hashes).astype(np.uint64)
    r = num_hashes // num_bands
    base = 1_000_003
    powers = [pow(base, shingle_k - 1 - j, _M64) for j in range(shingle_k)]
    gram = " + ".join(
        f"(('0x' || substr(h, 2 * (p + {j}) + 1, 2))::bigint "
        f"* {powers[j]}::hugeint)" for j in range(shingle_k))
    sig_cols = ",\n       ".join(
        f"min((sh * {int(a[i])}::hugeint + {int(b[i])}::hugeint) "
        f"% {m61}::hugeint) as s{i}" for i in range(num_hashes))

    def band_fold(bi: int) -> str:
        acc = f"s{bi * r}"
        for c in range(1, r):
            acc = (f"(({acc}) * {base}::hugeint % {_M64}::hugeint "
                   f"+ s{bi * r + c}) % {_M64}::hugeint")
        return acc

    band_arms = "\nunion all\n".join(
        f"select doc_id, {bi} as band_id, {band_fold(bi)} as band_hash "
        f"from sig" for bi in range(num_bands))
    return f"""
with hx as (select doc_id, hex(text) as h, length(hex(text)) // 2 as n
            from documents),
g as (select doc_id, unnest(range(0, n - {shingle_k} + 1)) as p, h
      from hx where n >= {shingle_k}),
sh0 as (select doc_id, ({gram}) % {_M64}::hugeint as sh from g),
sh as (select distinct doc_id, sh from sh0),
-- ``sig`` MATERIALIZED: it feeds all {num_bands} band arms, and DuckDB
-- inlines CTEs — un-materialized, every arm re-evaluated the whole
-- shingle scan (measured 18 s → 4 s at sf0.01; materializing the hugeint
-- ``sh`` rows instead REGRESSED to 27 s)
sig as materialized (select doc_id,
       {sig_cols}
       from sh group by doc_id),

bands as ({band_arms}),
bk as (select band_id, band_hash, doc_id,
              count(*) over (partition by band_id, band_hash) as bn,
              min(doc_id) over (partition by band_id, band_hash) as bmin
       from bands),
allp as (
  select x.doc_id as a, y.doc_id as b
  from bk x join bk y on x.band_id = y.band_id
   and x.band_hash = y.band_hash and x.doc_id < y.doc_id
  where x.bn <= {max_bucket}
  union all
  select bmin as a, doc_id as b from bk
  where bn > {max_bucket} and doc_id != bmin),
cand as (select a as doc_id_a, b as doc_id_b,
                cast(count(*) as bigint) as n_bands
         from allp group by 1, 2),
sizes as (select doc_id, count(*) as ns from sh group by 1),
inter as (select c.doc_id_a, c.doc_id_b, count(*) as i
          from cand c
          join sh sa on sa.doc_id = c.doc_id_a
          join sh sb on sb.doc_id = c.doc_id_b and sb.sh = sa.sh
          group by 1, 2)
select c.doc_id_a, c.doc_id_b, c.n_bands,
       cast(coalesce(i.i, 0) as double)
         / (za.ns + zb.ns - coalesce(i.i, 0)) as jaccard
from cand c
left join inter i on i.doc_id_a = c.doc_id_a and i.doc_id_b = c.doc_id_b
join sizes za on za.doc_id = c.doc_id_a
join sizes zb on zb.doc_id = c.doc_id_b
where cast(coalesce(i.i, 0) as double)
        / (za.ns + zb.ns - coalesce(i.i, 0)) >= {threshold}
"""


SQL_DOC_MINHASH_PAIRS = _minhash_pairs_sql()


def _decontaminate_sql(shingle_k: int = 8, n_bench: int = 5,
                       min_overlap: int = 2) -> str:
    """doc_decontaminate oracle: distinct k-gram shingle hashes (the same
    hex-expansion byte polynomial mod 2^64 as the minhash oracle), the
    benchmark = docs with doc_id < n_bench, per-doc overlap count."""
    powers = [pow(1_000_003, shingle_k - 1 - j, _M64)
              for j in range(shingle_k)]
    gram = " + ".join(
        f"(('0x' || substr(h, 2 * (p + {j}) + 1, 2))::bigint "
        f"* {powers[j]}::hugeint)" for j in range(shingle_k))
    return f"""
with hx as (select doc_id, hex(text) as h, length(hex(text)) // 2 as n
            from documents),
g as (select doc_id, unnest(range(0, n - {shingle_k} + 1)) as p, h
      from hx where n >= {shingle_k}),
sh0 as (select doc_id, ({gram}) % {_M64}::hugeint as sh from g),
sh as (select distinct doc_id, sh from sh0),
bench as (select distinct sh from sh where doc_id < {n_bench}),
ov as (select s.doc_id, cast(count(*) as bigint) as n
       from sh s join bench b using (sh) group by 1)
select d.doc_id, coalesce(ov.n, 0) as n_overlap_shingles,
       coalesce(ov.n, 0) >= {min_overlap} as contaminated
from documents d left join ov using (doc_id)
"""


SQL_DOC_DECONTAMINATE = _decontaminate_sql()


def _dedup_keep_sql() -> str:
    """doc_dedup_keep oracle: verified minhash pairs (the full chain above)
    → connected components as a recursive-CTE TRANSITIVE CLOSURE (exact for
    any component diameter; closure row count is Σ component_size², bounded
    by near-dup density) → min-member component ids, non-members keep
    themselves. The closure recursion references the materialized edge
    list once per step — unrolled min-label CTE chains re-evaluated the
    whole minhash subtree per round (measured 34 s → 5 s)."""
    return f"""
with pairs as materialized ({_minhash_pairs_sql()}),
e2 as materialized (select doc_id_a as src, doc_id_b as dst from pairs
      union all select doc_id_b, doc_id_a from pairs),
closure as (
  with recursive r(a, b) as (
    select src, dst from e2
    union
    select r.a, e2.dst from r join e2 on e2.src = r.b
  ) select * from r),
comp as (select a as node, least(a, min(b)) as component_id
         from closure group by a)
select d.doc_id, coalesce(c.component_id, d.doc_id) as component_id,
       coalesce(c.component_id, d.doc_id) = d.doc_id as keep
from documents d left join comp c on c.node = d.doc_id
"""


SQL_DOC_DEDUP_KEEP = _dedup_keep_sql()


def _curation_sql() -> str:
    """doc_curation oracle: the end-to-end curation verdict assembled from
    the SAME SQL pieces that gate the individual stages (quality, secret
    scan, exact-dedup representative, minhash-closure keep) — so stage
    WIRING errors fail the hash, not just kernel bugs."""
    return f"""
with q as (select doc_id, quality_ok from ({SQL_DOC_QUALITY}) t),
sec as (select doc_id, has_secret from ({SQL_DOC_SECRET_SCAN}) t),
exact as (select min(doc_id) as doc_id, true as is_exact_rep
          from documents group by sha256(text)),
keepres as (select doc_id, keep from ({SQL_DOC_DEDUP_KEEP}) t)
select d.doc_id, q.quality_ok, sec.has_secret,
       coalesce(e.is_exact_rep, false) as is_exact_rep,
       k.keep as near_keep,
       (q.quality_ok and not sec.has_secret
        and coalesce(e.is_exact_rep, false) and k.keep) as kept,
       case when not q.quality_ok then 'low_quality'
            when sec.has_secret then 'secret'
            when not coalesce(e.is_exact_rep, false) then 'exact_dup'
            when not k.keep then 'near_dup'
            else 'kept' end as reason
from documents d
join q using (doc_id)
join sec using (doc_id)
left join exact e using (doc_id)
join keepres k using (doc_id)
"""


def _knn_ivf_sql(sf_dir: str, k: int = 10, n_clusters: int = 16,
                 n_probe: int = 4, sample_size: int = 2000,
                 seed: int = 13, n_queries: int = 8) -> str:
    """knn_ivf oracle: retrain the IDENTICAL coarse quantizer from the raw
    parquet (the sample is a deterministic splitmix64-keyed head, the
    k-means is seeded numpy — both shared verbatim with the Ray stage via
    ``stages.knn.ivf_quantizer``), embed the centroids as SQL literals,
    assign each row its first-argmin cell through an ordered case chain
    (clause i fires iff d_i ≤ d_j ∀ j>i — exactly numpy argmin's
    first-minimal-index rule), filter to the queries' probed cells, exact
    cosine top-k among candidates."""
    import pyarrow.parquet as pq

    from .stages.knn import ivf_quantizer
    rows = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).to_pandas()
    centroids = ivf_quantizer(rows, n_clusters, sample_size, seed)
    qm = np.array(
        rows[rows["vec_id"] < n_queries].sort_values("vec_id")
        ["embedding"].tolist(), dtype=np.float64)
    qd = ((qm[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe = sorted(set(np.argsort(qd, axis=1)[:, :n_probe].ravel()
                       .tolist()))

    def c_list(j: int) -> str:
        return "[" + ", ".join(repr(float(x)) for x in centroids[j]) + "]"

    n_c = len(centroids)
    dists = ",\n       ".join(
        f"list_distance(v, {c_list(j)}) as d{j}" for j in range(n_c))
    argmin = " ".join(
        f"when " + " and ".join(f"d{i} <= d{j}" for j in range(i + 1, n_c))
        + f" then {i}" for i in range(n_c - 1)) + f" else {n_c - 1}"
    return f"""
with e as (
  select vec_id, list_transform(embedding, x -> cast(x as double)) as v
  from embeddings),
d as (select vec_id, v,
       {dists}
      from e),
cells as (select vec_id, v, (case {argmin} end) as cell from d),
q as (select vec_id as q_id, v as qv from e where vec_id < {n_queries}),
cand as (select vec_id, v from cells where cell in
         ({", ".join(str(int(p)) for p in probe)}))
select q_id, vec_id as neighbor_id,
       cast(row_number() over (
         partition by q_id
         order by list_cosine_similarity(qv, v) desc, vec_id asc)
         as bigint) as rank,
       round(list_cosine_similarity(qv, v), 6) as sim
from q join cand on cand.vec_id <> q.q_id
qualify rank <= {k}
"""


# sf-dependent oracles over the provided tables (need the parquet path at
# build time — e.g. to retrain the IVF quantizer deterministically)
TABLE_ORACLE_BUILDERS = {
    "knn_ivf": _knn_ivf_sql,
}


def _secret_scan_sql() -> str:
    from .stages.text_analysis import SECRET_PATTERNS
    cols = ",\n       ".join(
        f"cast(len(regexp_extract_all(text, "
        f"'{pat.replace(chr(39), chr(39) * 2)}')) as bigint) as {name}"
        for name, pat in SECRET_PATTERNS.items())
    anyflag = " + ".join(SECRET_PATTERNS)
    return f"""
with c as (
  select doc_id,
       {cols}
  from documents)
select *, ({anyflag}) > 0 as has_secret from c
"""


SQL_DOC_SECRET_SCAN = _secret_scan_sql()

# non-empty = survives stripping space/tab/CR (explicit char set matching
# the Ray side's pc.utf8_trim(" \\t\\r"))
SQL_DOC_REPETITION = """
with raw as (
  select doc_id, unnest(string_split(text, chr(10))) as line
  from documents),
nl as (select doc_id, line from raw
       where trim(line, ' ' || chr(9) || chr(13)) <> ''),
per_line as (select doc_id, line, count(*) as n from nl group by 1, 2),
agg as (select doc_id, cast(sum(n) as bigint) as n_lines,
               cast(count(*) as bigint) as n_distinct_lines,
               cast(max(n) as bigint) as max_line_freq
        from per_line group by doc_id)
select d.doc_id,
       coalesce(a.n_lines, 0) as n_lines,
       coalesce(a.n_distinct_lines, 0) as n_distinct_lines,
       coalesce(a.max_line_freq, 0) as max_line_freq,
       case when coalesce(a.n_lines, 0) > 0
            then (a.n_lines - a.n_distinct_lines) * 1000000 // a.n_lines
            else 0 end as dup_line_ppm
from documents d left join agg a using (doc_id)
"""

_SM_GAMMA = 0x9E3779B97F4A7C15


def _splitmix_ctes(carry: str, id_expr: str, src: str) -> str:
    """CTE chain k0..k5 computing h = splitmix64(id_expr) over ``src``,
    carrying ``carry`` columns through — the exact uint64 semantics of
    ``functions.hashing.splitmix64``."""
    steps = [_xorshift64("h", 30), _mulmod64("h", 0xBF58476D1CE4E5B9),
             _xorshift64("h", 27), _mulmod64("h", 0x94D049BB133111EB),
             _xorshift64("h", 31)]
    ctes = [f"k0 as (select {carry}, (({id_expr})::hugeint + "
            f"{_SM_GAMMA}::hugeint) % {_M64}::hugeint as h from {src})"]
    for i, e in enumerate(steps, 1):
        ctes.append(f"k{i} as (select {carry}, {e} as h from k{i - 1})")
    return ",\n".join(ctes)


def _doc_shuffle_sql(seed: int = 12345) -> str:
    """doc_shuffle oracle (T7/T8): the seeded permutation key
    splitmix64(doc_id + seed·1_000_003 + epoch) per epoch ∈ {0, 1},
    restated in hugeint limb arithmetic — hashing the keys gates the full
    permutation (bijection per epoch)."""
    parts = []
    for epoch in (0, 1):
        c = (seed * 1_000_003 + epoch) % (1 << 64)
        parts.append(f"""
select doc_id, {_to_int64('h')} as shuffle_key, {epoch}::bigint as epoch
from (
  with {_splitmix_ctes('doc_id', f'doc_id + {c}', 'documents')}
  select * from k5)""")
    return "\nunion all\n".join(parts)


def _train_metrics_sql(seed: int = 12345, step_bits: int = 6) -> str:
    """doc_train_metrics oracle (G9): running token-weighted accumulators
    over the seeded epoch stream — per-doc md5-of-identity stand-in
    loss/correct, steps = top ``step_bits`` bits of the shuffle key,
    cumulative window sums, ratios as exact integer division (all-int
    arithmetic: no float margin assumptions anywhere)."""
    shift = 1 << (64 - step_bits)
    eps = []
    for epoch in (0, 1):
        c = (seed * 1_000_003 + epoch) % (1 << 64)
        eps.append(f"""
select doc_id, {epoch}::bigint as epoch,
       (h // {shift}::hugeint)::bigint as step
from (
  with {_splitmix_ctes('doc_id', f'doc_id + {c}', 'documents')}
  select * from k5)""")
    keys = "\nunion all\n".join(eps)
    return f"""
with tok as (
  select doc_id,
         cast(len(regexp_extract_all(text, '{TOKEN_RE}')) as bigint)
           as n_tok
  from documents),
m as (
  select doc_id, n_tok,
         ('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint
           % (n_tok + 1) as corr,
         1000 + ('0x' || substr(md5(doc_id::varchar || ':loss'), 1, 8))
                ::bigint % 9000 as loss_e6
  from tok),
ks as ({keys}),
g as (
  select k.epoch, k.step, cast(count(*) as bigint) as n_docs,
         sum(m.n_tok) as tok, sum(m.corr) as corr,
         sum(m.loss_e6 * m.n_tok) as loss_tok
  from ks k join m using (doc_id)
  group by 1, 2)
select epoch, step, n_docs,
       cast(sum(tok) over w as bigint) as cum_tokens,
       cast(sum(corr) over w as bigint) as cum_correct,
       cast(sum(loss_tok) over w as bigint) as cum_loss_tok_e6,
       cast(sum(corr) over w * 1000000 // sum(tok) over w as bigint)
         as running_acc_e6,
       cast(sum(loss_tok) over w // sum(tok) over w as bigint)
         as running_loss_e6
from g
window w as (partition by epoch order by step
             rows between unbounded preceding and current row)
"""


def _stratified_sample_sql(k: int = 20) -> str:
    """doc_stratified_sample oracle: splitmix64 key via limb CTEs, exactly-k
    smallest keys per source (bijection → no ties)."""
    return f"""
with {_splitmix_ctes('doc_id, source', 'doc_id', 'documents')}
select source, doc_id, {_to_int64('h')} as sample_key,
       cast(row_number() over (partition by source order by h)
            as bigint) as rank
from k5
qualify rank <= {k}
"""


def _sample_rate_sql(rate: float = 0.3) -> str:
    """doc_sample_rate oracle: the deterministic Bernoulli filter — keep
    rows with splitmix64(doc_id) below rate·2^64."""
    threshold = min(int(rate * (1 << 64)), (1 << 64) - 1)
    return f"""
with {_splitmix_ctes('doc_id, source', 'doc_id', 'documents')}
select doc_id, source from k5 where h < {threshold}::hugeint
"""


SQL_DOC_STRATIFIED_SAMPLE = _stratified_sample_sql()
SQL_DOC_SAMPLE_RATE = _sample_rate_sql()

SQL_DOC_INVERTED_INDEX = f"""
with raw as (
  select doc_id, unnest(regexp_extract_all(text, '{TOKEN_RE}')) as term
  from documents),
t as (select distinct doc_id, term from raw)
select term, cast(count(*) as bigint) as df,
       string_agg(cast(doc_id as varchar), ',' order by doc_id) as postings
from t group by term
"""

SQL_DOC_BIGRAM_COUNTS = f"""
with raw as (
  select doc_id, regexp_extract_all(text, '{TOKEN_RE}') as l
  from documents),
pos as (select doc_id, l, unnest(range(1, len(l))) as i from raw),
bi as (select l[i] as w1, l[i + 1] as w2 from pos)
select w1, w2, cast(count(*) as bigint) as n
from bi group by 1, 2 having count(*) >= 3
"""

SQL_EVENTS_WINDOW = """
select user_id, date_trunc('hour', ts) as window_start,
       count(*) as n_events,
       cast(sum(cast(round(value * 10000, 0) as bigint)) as bigint) as sum_value_e4
from events group by 1, 2
"""

SQL_EVENTS_SESSIONS = """
with s as (
  select user_id, ts,
         case when lag(ts) over (partition by user_id order by ts) is null
                or ts - lag(ts) over (partition by user_id order by ts)
                   > interval '30 minutes'
              then 1 else 0 end as brk
  from events),
s2 as (
  select user_id, ts,
         sum(brk) over (partition by user_id order by ts
                        rows between unbounded preceding and current row) - 1
           as session_id
  from s)
select user_id, cast(session_id as bigint) as session_id,
       count(*) as n_events, min(ts) as start_ts, max(ts) as end_ts
from s2 group by 1, 2
"""

SQL_Q1 = """
select l_returnflag, l_linestatus,
       cast(sum(cast(round(l_quantity * 100, 0) as bigint)) as bigint) as sum_qty_e2,
       cast(sum(cast(round(l_extendedprice * 100, 0) as bigint)) as bigint) as sum_price_e2,
       cast(sum(cast(round(l_discount * 10000, 0) as bigint)) as bigint) as sum_disc_e4,
       count(*) as count_order
from lineitem
where l_shipdate <= timestamp '1998-09-02'
group by 1, 2
"""

SQL_ORDERS_BY_NATION = """
select coalesce(n.n_name, 'UNKNOWN') as n_name,
       count(*) as n_orders,
       cast(sum(cast(round(o.o_totalprice * 100, 0) as bigint)) as bigint) as sum_total_e2
from orders o
left join customer c on o.o_custkey = c.c_custkey
left join nation n on c.c_nationkey = n.n_nationkey
group by 1
"""

SQL_TOP_ORDERS = """
select o_orderkey, o_totalprice from orders
order by o_totalprice desc, o_orderkey asc limit 10
"""

SQL_PART_TYPE_STATS = """
select p_type, count(*) as n_parts,
       min(cast(round(p_retailprice * 100, 0) as bigint)) as min_price_e2,
       max(cast(round(p_retailprice * 100, 0) as bigint)) as max_price_e2
from part group by 1
"""

SQL_REVENUE_BY_REGION = """
select coalesce(r.r_name, 'UNKNOWN') as r_name,
       count(*) as n_items,
       cast(sum(cast(round(l.l_extendedprice * 100, 0) as bigint)
                * (100 - cast(round(l.l_discount * 100, 0) as bigint)))
            as bigint) as sum_revenue_e4
from lineitem l
left join supplier s on l.l_suppkey = s.s_suppkey
left join nation n on s.s_nationkey = n.n_nationkey
left join region r on n.n_regionkey = r.r_regionkey
group by 1
"""

SQL_VOCAB_FROM_CORPUS = f"""
select regexp_replace(word, '\\d', '0', 'g') as word, count(*) as n
from (select unnest(regexp_extract_all(text, '{TOKEN_RE}')) as word
      from documents)
group by 1 having count(*) > 5
"""

SQL_DOC_NORMALIZE = """
select doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '\\d', '0', 'g'),
                           '\\s+', ' ', 'g')) as norm_text
from documents
"""

# winnowing fingerprints (Schleimer et al.): the k-gram polynomial hash is
# computed over BYTES via the hex expansion (byte-exact for any encoding);
# sum fits HUGEINT, and mod 2^61 equals the Python (mod 2^64 → mask) result
# because 2^61 divides 2^64. Window min + consecutive dedup are plain window
# functions.
_FP_K, _FP_W, _FP_MOD = 16, 8, 1 << 61
_FP_POWERS = [pow(1_000_003, _FP_K - 1 - j, _FP_MOD) for j in range(_FP_K)]
_FP_TERMS = " + ".join(
    f"(('0x'||substr(h, {2 * j}+p*2+1, 2))::bigint * {_FP_POWERS[j]}::hugeint)"
    for j in range(_FP_K))

SQL_DOC_FINGERPRINT = f"""
with hx as (select doc_id, hex(text) as h, length(hex(text))//2 as n
            from documents),
g as (select doc_id, n - {_FP_K} + 1 as n_hashes,
             unnest(range(0, n - {_FP_K} + 1)) as p, h
      from hx where n >= {_FP_K}),
fp as (select doc_id, n_hashes, p,
              ({_FP_TERMS}) % {_FP_MOD}::hugeint as f from g),
w as (select doc_id, n_hashes, p,
             min(f) over (partition by doc_id order by p
                          rows between current row and {_FP_W - 1} following)
               as m
      from fp),
sel as (select doc_id, p, m from w
        where p <= greatest(n_hashes - {_FP_W}, 0)),
ded as (select doc_id, p, m,
               lag(m) over (partition by doc_id order by p) as pm from sel)
select doc_id,
       cast(row_number() over (partition by doc_id order by p) - 1
            as bigint) as fp_index,
       cast(m as bigint) as fingerprint
from ded where pm is null or m != pm
"""

SQL_EVENTS_ASOF = """
with l as (select event_id, user_id, ts from events
           where event_type = 'purchase'),
r0 as (select user_id, ts, max(event_id) as view_id from events
       where event_type = 'view' group by 1, 2),
j as (select l.event_id, l.user_id, l.ts, r0.view_id, r0.ts as vts
      from l asof left join r0
        on l.user_id = r0.user_id and l.ts >= r0.ts)
select event_id, user_id,
       coalesce(view_id, -1) as matched_event_id,
       coalesce(cast(date_diff('microsecond', vts, ts) as bigint), -1)
         as lag_us
from j
"""

SQL_EVENTS_RANGE_COUNT = """
with l as (select event_id, user_id, ts from events
           where event_type = 'purchase'),
r as (select user_id, ts from events where event_type = 'view')
select l.event_id, l.user_id, cast(count(r.ts) as bigint) as n_views_1h
from l left join r on r.user_id = l.user_id
   and r.ts between l.ts - interval 1 hour and l.ts
group by 1, 2
"""

SQL_DOC_TOKEN_COUNT_BPE = f"""
select doc_id,
       cast(len(regexp_extract_all(text, '{TOKEN_RE}')) as bigint)
         as n_tokens,
       cast(len(regexp_extract_all(text,
            '{BPE_TOKEN_RE.replace(chr(39), chr(39) * 2)}')) as bigint)
         as n_bpe_tokens
from documents
"""

SQL_EMBEDDING_CENTROIDS = """
with u as (
  select label, unnest(embedding) as v, unnest(range(len(embedding))) as dim
  from embeddings)
select label, cast(dim as bigint) as dim,
       count(*) as n_vecs,
       cast(sum(cast(round(cast(v as double) * 1000000, 0) as bigint))
            as bigint) as sum_e6,
       round(cast(sum(cast(round(cast(v as double) * 1000000, 0) as bigint))
                  as bigint) / count(*) / 1000000.0, 6) as centroid
from u group by 1, 2
"""

SQL_DOC_TFIDF = f"""
with toks as (
  select doc_id, unnest(regexp_extract_all(text, '{TOKEN_RE}')) as term
  from documents),
tf as (select doc_id, term, count(*) as tf from toks group by 1, 2),
df as (select term, count(distinct doc_id) as df from tf group by 1),
scored as (
  select tf.doc_id, tf.term, tf.tf, df.df,
         cast(floor(tf.tf * 1000000.0 / df.df) as bigint) as score_e6
  from tf join df using (term)),
ranked as (
  select *, row_number() over (partition by doc_id
             order by score_e6 desc, term) as rnk
  from scored)
select doc_id, term, tf, df, score_e6, cast(rnk as bigint) as rank
from ranked where rnk <= 5
"""

# the multimodal codec gate (late r4, JPEG arm r5): closed form of the
# formula images that q_media_decode_stats encodes (doc_id mod 3: 0 PNG /
# 1 GIF / 2 baseline JPEG of a block-constant grayscale image, which
# round-trips EXACTLY through unit quant tables) and decodes through the
# real codecs — stages/multimodal.synth_media_batch holds the same
# constants
SQL_MEDIA_DECODE_STATS = """
with xs as (select x from range(16) t(x)),
     ys as (select y from range(12) t(y)),
     cs as (select c from range(3) t(c)),
     png as (
       select d.doc_id, 'png' as codec,
              cast(sum((7*x + 13*y + 29*c + 31*(d.doc_id % 97)) % 256)
                   as bigint) as pixel_sum,
              cast(576 as bigint) as n_px
       from documents d cross join xs cross join ys cross join cs
       where d.doc_id % 3 = 0 group by d.doc_id),
     gif as (
       select d.doc_id, 'gif' as codec,
              cast(3 * sum((11*x + 17*y + 23*(d.doc_id % 89)) % 256)
                   as bigint) as pixel_sum,
              cast(576 as bigint) as n_px
       from documents d cross join xs cross join ys
       where d.doc_id % 3 = 1 group by d.doc_id),
     jpg as (
       select d.doc_id, 'jpeg' as codec,
              cast(3 * sum((37*(x//8) + 41*(y//8) + 19*(d.doc_id % 79))
                           % 256) as bigint) as pixel_sum,
              cast(576 as bigint) as n_px
       from documents d cross join xs cross join ys
       where d.doc_id % 3 = 2 group by d.doc_id)
select doc_id, codec, pixel_sum, n_px from png
union all
select doc_id, codec, pixel_sum, n_px from gif
union all
select doc_id, codec, pixel_sum, n_px from jpg
"""

SQL_MEDIA_AUDIO_STATS = """
with ts as (select t from range(1024) t(t))
select d.doc_id,
       case when d.doc_id % 2 = 0 then 'wav' else 'flac' end as codec,
       cast(sum(((13*t + 37*(d.doc_id % 101)) % 65536) - 32768
              + ((29*t + 53*(d.doc_id % 103)) % 65536) - 32768)
            as bigint) as sample_sum,
       cast(1024 as bigint) as n_samples
from documents d cross join ts
group by d.doc_id
"""

# video gate (r5): even doc_ids flow Y4M → frame sampling →
# re-containering → decode; odd doc_ids flow MP4/MJPEG → ISO-BMFF
# sample-table demux → per-frame baseline-JPEG decode (block-constant
# frames + unit quant tables = exact) — one hash covers both container
# paths end-to-end
SQL_MEDIA_VIDEO_STATS = """
with xs as (select x from range(16) t(x)),
     ys as (select y from range(12) t(y)),
     fs as (select f from range(8) t(f) where f % 3 = 0)
select d.doc_id, cast(f as bigint) as frame_index,
       cast(3 * sum((5*x + 9*y + 11*f + 17*(d.doc_id % 73)) % 256)
            as bigint) as pixel_sum
from documents d cross join fs cross join xs cross join ys
where d.doc_id % 2 = 0
group by d.doc_id, f
union all
select d.doc_id, cast(f as bigint) as frame_index,
       cast(3 * sum((37*(x//8) + 41*(y//8) + 23*f + 19*(d.doc_id % 71))
                    % 256) as bigint) as pixel_sum
from documents d cross join fs cross join xs cross join ys
where d.doc_id % 2 = 1
group by d.doc_id, f
"""



def _kmeans_ctes(k: int, iters: int, scale: int) -> list:
    """Shared CTE chain for the k-means family: quantized explode, seed
    centroids, one (assignment, centroid-update) CTE pair per Lloyd
    iteration — the ``sql_kg_pagerank`` unrolling technique. Everything
    integer: elements quantize half-away via ``round(e·scale)``; centroid
    update is ``floor(sum/count)`` (exact in double — quotient gaps ≥
    1/count dwarf the ulp); ties break to the lowest cluster id via
    ``order by dist, cluster``. Every CTE that fans out is ``as
    materialized`` (DuckDB inlines multi-consumer CTEs)."""
    ctes = [f"""emb as materialized (
  select vec_id, generate_subscripts(embedding, 1)::bigint - 1 as dim,
         cast(round(cast(unnest(embedding) as double) * {scale}, 0)
              as bigint) as v
  from embeddings)""",
            f"""init as (
  select vec_id, row_number() over (order by vec_id) - 1 as cluster
  from (select distinct vec_id from emb order by vec_id limit {k}))""",
            """cent0 as materialized (
  select i.cluster, e.dim, e.v as c from init i join emb e using (vec_id))"""]
    for i in range(1, iters + 1):
        ctes.append(f"""a{i} as materialized (
  select vec_id, cluster from (
    select e.vec_id, c.cluster,
           row_number() over (partition by e.vec_id
                              order by sum((e.v - c.c)*(e.v - c.c)),
                                       c.cluster) rn
    from emb e join cent{i - 1} c using (dim)
    group by e.vec_id, c.cluster) q where rn = 1)""")
        ctes.append(f"""cent{i} as materialized (
  select a.cluster, e.dim,
         cast(floor(cast(sum(e.v) as double) / count(*)) as bigint) as c
  from a{i} a join emb e using (vec_id) group by a.cluster, e.dim)""")
    ctes.append(f"""afin as materialized (
  select vec_id, cluster, dist_sq from (
    select e.vec_id, c.cluster,
           sum((e.v - c.c)*(e.v - c.c))::hugeint as dist_sq,
           row_number() over (partition by e.vec_id
                              order by sum((e.v - c.c)*(e.v - c.c)),
                                       c.cluster) rn
    from emb e join cent{iters} c using (dim)
    group by e.vec_id, c.cluster) q where rn = 1)""")
    return ctes


def _kmeans_sql(k: int = 8, iters: int = 3, scale: int = 1000) -> str:
    """Final k-means assignment under the converged centroids — see
    :func:`_kmeans_ctes`."""
    return ("with " + ",\n".join(_kmeans_ctes(k, iters, scale)) + """
select vec_id, cluster, cast(dist_sq as bigint) as dist_sq from afin""")


def _semdedup_sql(k: int = 8, iters: int = 3, scale: int = 1000,
                  t_pct: int = 40) -> str:
    """SemDeDup: within-cluster near-dup removal on top of the k-means
    CTEs. The cosine threshold is EXACT integer arithmetic (``dot > 0 AND
    10⁴·dot² ≥ (100T)²·‖a‖²·‖b‖²`` in hugeint — no float boundary); a
    member drops iff a strictly-more-central same-cluster member (by
    (dist_sq, vec_id)) is a near-dup, restated as a pair join that only
    emits (later, earlier) pairs."""
    ctes = _kmeans_ctes(k, iters, scale)
    ctes.append("""norms as materialized (
  select vec_id, sum(v*v)::hugeint as nn from emb group by 1)""")
    ctes.append("""dots as materialized (
  select a.vec_id as va, b.vec_id as vb,
         sum(ea.v * eb.v)::hugeint as dot
  from afin a join afin b on a.cluster = b.cluster
    and (b.dist_sq < a.dist_sq
         or (b.dist_sq = a.dist_sq and b.vec_id < a.vec_id))
  join emb ea on ea.vec_id = a.vec_id
  join emb eb on eb.vec_id = b.vec_id and eb.dim = ea.dim
  group by 1, 2)""")
    ctes.append(f"""drops as (
  select distinct d.va as vec_id from dots d
  join norms na on na.vec_id = d.va
  join norms nb on nb.vec_id = d.vb
  where d.dot > 0
    and 10000 * d.dot * d.dot >= {t_pct * t_pct} * na.nn * nb.nn)""")
    return ("with " + ",\n".join(ctes) + """
select a.vec_id, a.cluster, cast(a.dist_sq as bigint) as dist_sq,
       case when dr.vec_id is null then 1 else 0 end as keep
from afin a left join drops dr using (vec_id)""")


def _pack_sequences_sql(max_tokens: int = 512, num_buckets: int = 16) -> str:
    """Greedy sequence packing restated as a recursive CTE carrying only
    the per-bucket fold state (fill, seq_index) — one row per bucket per
    step, the ``oracle._segments_ctes`` greedy-fold technique at document
    granularity."""
    return f"""
with recursive docs as materialized (
  select doc_id, doc_id % {num_buckets} as bucket,
         len(regexp_extract_all(text, '{TOKEN_RE}'))::bigint as n_tokens
  from documents),
ord as materialized (
  select *, row_number() over (partition by bucket order by doc_id) as pos
  from docs),
rec as (
  select bucket, pos, doc_id, n_tokens,
         0::bigint as seq_index, 0::bigint as tok_offset,
         n_tokens as fill
  from ord where pos = 1
  union all
  select o.bucket, o.pos, o.doc_id, o.n_tokens,
         case when r.fill > 0 and r.fill + o.n_tokens > {max_tokens}
              then r.seq_index + 1 else r.seq_index end,
         case when r.fill > 0 and r.fill + o.n_tokens > {max_tokens}
              then 0::bigint else r.fill end,
         case when r.fill > 0 and r.fill + o.n_tokens > {max_tokens}
              then o.n_tokens else r.fill + o.n_tokens end
  from rec r join ord o on o.bucket = r.bucket and o.pos = r.pos + 1)
select doc_id, bucket, seq_index, tok_offset, n_tokens from rec
"""


def _curation_semantic_sql() -> str:
    """The complete curation stack: the surface-level composed verdict
    (``_curation_sql``) extended by the SemDeDup layer (``_semdedup_sql``)
    joined 1:1 on ``vec_id = doc_id``. Reason precedence: surface gates
    first; a surface-kept doc the semantic layer drops → 'semantic_dup'."""
    return f"""
with cur as materialized ({_curation_sql()}),
sem as materialized ({_semdedup_sql()})
select c.doc_id, c.quality_ok, c.has_secret, c.is_exact_rep, c.near_keep,
       (s.keep = 1) as sem_keep,
       (c.kept and s.keep = 1) as kept,
       case when c.kept and s.keep = 0 then 'semantic_dup'
            else c.reason end as reason
from cur c join sem s on s.vec_id = c.doc_id
"""


TABLE_ORACLES = {
    "media_decode_stats": SQL_MEDIA_DECODE_STATS,
    "media_audio_stats": SQL_MEDIA_AUDIO_STATS,
    "media_video_stats": SQL_MEDIA_VIDEO_STATS,
    "doc_tfidf": SQL_DOC_TFIDF,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "events_asof": SQL_EVENTS_ASOF,
    "events_range_count": SQL_EVENTS_RANGE_COUNT,
    "doc_token_count_bpe": SQL_DOC_TOKEN_COUNT_BPE,
    "embedding_centroids": SQL_EMBEDDING_CENTROIDS,
    "embedding_kmeans": _kmeans_sql(),
    "embedding_semdedup": _semdedup_sql(),
    "doc_exact_dedup": SQL_DOC_EXACT_DEDUP,
    "doc_token_count": SQL_DOC_TOKEN_COUNT,
    "doc_quality": SQL_DOC_QUALITY,
    "doc_langid": SQL_DOC_LANGID,
    "doc_jaccard_pairs": SQL_DOC_JACCARD_PAIRS,
    "knn_topk": SQL_KNN_TOPK,
    "knn_topk_batch": SQL_KNN_TOPK_BATCH,
    "knn_lsh": SQL_KNN_LSH,
    "doc_simhash": SQL_DOC_SIMHASH,
    "doc_stratified_sample": SQL_DOC_STRATIFIED_SAMPLE,
    "doc_shuffle": _doc_shuffle_sql(),
    "doc_train_metrics": _train_metrics_sql(),
    "doc_sample_rate": SQL_DOC_SAMPLE_RATE,
    "doc_inverted_index": SQL_DOC_INVERTED_INDEX,
    "doc_bigram_counts": SQL_DOC_BIGRAM_COUNTS,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
    "doc_minhash_pairs": SQL_DOC_MINHASH_PAIRS,
    "doc_secret_scan": SQL_DOC_SECRET_SCAN,
    "doc_decontaminate": SQL_DOC_DECONTAMINATE,
    "doc_dedup_keep": SQL_DOC_DEDUP_KEEP,
    # assembled last: composes the quality/secret/dedup SQL above
    "doc_curation": _curation_sql(),
    "doc_curation_semantic": _curation_semantic_sql(),
    "doc_pack_sequences": _pack_sequences_sql(),
    "doc_repetition": SQL_DOC_REPETITION,
    "events_window": SQL_EVENTS_WINDOW,
    "events_sessions": SQL_EVENTS_SESSIONS,
    "q1_pricing_summary": SQL_Q1,
    "orders_by_nation": SQL_ORDERS_BY_NATION,
    "top_orders": SQL_TOP_ORDERS,
    "part_type_stats": SQL_PART_TYPE_STATS,
    "revenue_by_region": SQL_REVENUE_BY_REGION,
    "vocab_from_corpus": SQL_VOCAB_FROM_CORPUS,
    "doc_length_quantiles": f"""
with t as (
  select 'chars' as field, cast(length(text) as bigint) as value
  from documents
  union all
  select 'tokens', cast(len(regexp_extract_all(text, '{TOKEN_RE}')) as bigint)
  from documents),
h as (
  select field, value, count(*) as n from t group by 1, 2),
c as (
  select field, value,
         sum(n) over (partition by field order by value) as cum,
         sum(n) over (partition by field) as total
  from h)
select c.field, cast(q.q_e3 as bigint) as q_e3,
       cast(min(c.value) as bigint) as value,
       cast(min(c.total) as bigint) as n_docs
from c cross join (select unnest([500, 900, 990, 999]) as q_e3) q
where c.cum >= (q.q_e3 * c.total + 999) // 1000
group by 1, 2
""",
    "doc_normalize": SQL_DOC_NORMALIZE,
    "doc_lang_distribution":
        "select lang, count(*) as n_docs from documents group by 1",
    "doc_token_stats": f"""
with c as (
  select lang,
         cast(len(regexp_extract_all(text, '{TOKEN_RE}')) as bigint)
           as n_tokens
  from documents)
select lang, count(*) as n_docs,
       min(n_tokens) as min_tokens, max(n_tokens) as max_tokens,
       cast(median(n_tokens) as double) as median_tokens
from c group by 1
""",
    "events_sliding_window": """
select user_id,
       date_trunc('hour', ts) - to_hours(i) as window_start,
       count(*) as n_events,
       cast(sum(cast(round(value * 10000, 0) as bigint)) as bigint) as sum_value_e4
from events cross join (select unnest([0, 1]) as i)
group by 1, 2
""",
    "top_orders_per_customer": """
select o_custkey, o_orderkey, o_totalprice,
       cast(row_number() over (
         partition by o_custkey
         order by o_totalprice desc, o_orderkey asc) as bigint) as rank
from orders qualify rank <= 3
""",
}
