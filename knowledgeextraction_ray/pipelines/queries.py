"""Named query callables — the driver-facing operator surface.

Each entry takes ``sf_dir`` and returns a Dataset / DataFrame / pyarrow
Table; names and column names line up 1:1 with the oracle SQL in
``knowledgeextraction_ray.oracle`` (the driver hash-compares values after
sorting columns by name).
"""

from __future__ import annotations

import pyarrow as pa
from ray.data.aggregate import Count

from ..config import PipelineConfig
from ..functions.hashing import sha256_column
from ..functions.tables import read_parquet_clean
from .kg import kg_pipeline, linked_mentions, read_corpus
from ..stages.canonicalize import canonicalize_dataset
from ..stages.ner_scorer import score_dataset
from ..stages.segmenter import segment_dataset


def q_corpus_sha(sf_dir: str):
    """Per-row content sha256 + length (the pipeline invariant, M8-style
    normalize analog)."""
    def add(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("content_sha256",
                                    sha256_column(batch["content"]))
        import pyarrow.compute as pc
        return batch.append_column(
            "n_chars", pc.cast(pc.utf8_length(batch["content"]), pa.int64()))
    return (read_corpus(sf_dir)
            .map_batches(add, batch_format="pyarrow")
            .select_columns(["repo", "path", "commit", "lang",
                             "content_sha256", "n_chars"]))


def _mentions(sf_dir: str):
    """Mention rows via the fused hot path (linking adds columns only —
    the mention stream is identical; equality is test-gated)."""
    from .kg import linked_mentions
    return linked_mentions(sf_dir)


def q_mentions(sf_dir: str):
    """Mention counts per (file, label, surface) — NER output aggregate.
    The key contains the file identity and mention blocks are
    file-contiguous, so the count is shuffle-free with straddler repair
    (``stages/groupagg.file_local_count``); materialized because the
    boundary scan and the counting scan are two consumers."""
    from ..stages.groupagg import file_local_count
    return file_local_count(_mentions(sf_dir).materialize(),
                            ["repo", "path", "label", "surface"])


def q_label_hist(sf_dir: str):
    """Label histogram (reference G4 Counter dumps, distributed)."""
    from ..stages.groupagg import bucketed_agg
    ds = _mentions(sf_dir)
    # count + exact distinct via two-level aggregate (level 1 bucketed —
    # high-cardinality (label, surface) key):
    per_surface = bucketed_agg(ds, ["label", "surface"], {},
                               count_alias="n_sub", num_buckets=16)
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "label": batch["label"],
            "n": batch["n_sub"],
            "one": pa.array([1] * len(batch), pa.int64()),
        })
    from ray.data.aggregate import Sum
    return (per_surface.map_batches(partial, batch_format="pyarrow")
            .groupby("label")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("one", alias_name="n_distinct_surfaces")))


def q_canonical(sf_dir: str):
    linked = linked_mentions(sf_dir)
    return canonicalize_dataset(linked)


def q_triples(sf_dir: str):
    return kg_pipeline(sf_dir)


def q_kg_hot_surfaces(sf_dir: str):
    """Skew diagnostic over the mention stream: top-20 hottest normalized
    surfaces with integer ppm share — the measurement that sizes the
    canonicalization salting (north-star hot keys: main/utils)."""
    import pyarrow.compute as pc

    from ..stages.profile import key_skew_profile

    def norm(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"surface_norm": pc.utf8_lower(batch["surface"])})
    return key_skew_profile(
        _mentions(sf_dir).map_batches(norm, batch_format="pyarrow"),
        "surface_norm", top_n=20)


def q_kg_pagerank(sf_dir: str):
    """PageRank over the triple graph (file → entity edges from the full
    flagship pipeline) — the iterative join+aggregate workload; exact
    integer ranks, unrolled-CTE DuckDB oracle."""
    from ..stages.graph import pagerank_dataset

    def as_edges(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"src": batch["subj"],
                                     "dst": batch["obj"]})
    edges = kg_pipeline(sf_dir).map_batches(as_edges,
                                            batch_format="pyarrow")
    return pagerank_dataset(edges, iters=5)


def q_nre_bags(sf_dir: str):
    """Bag-level relation aggregate (BagAttention analog) over file-scope
    pair instances — SQL-gated, window-function oracle."""
    import ray.data as rd

    from ..corpus import corpus_parquet_dir, ensure_corpus
    from ..stages.nre import nre_bag_pipeline
    ensure_corpus(sf_dir)
    corpus = rd.read_parquet(corpus_parquet_dir(sf_dir),
                             columns=["repo", "path", "content"])
    return nre_bag_pipeline(corpus)


def q_mrc_answers(sf_dir: str):
    """SQL-gated MRC: the single-window configuration (max_span covers any
    corpus file) runs the full explode → score → n-best merge pipeline and
    reduces each (file × question) to (n_entities, top softmax prob,
    no-answer odds, null-thresholded final answer) — every value exactly
    reproducible by the DuckDB ordinal/softmax oracle. The sliding-window
    configuration (max-context ownership across overlapping windows) is
    covered by ``mrc_nbest`` (rows) + the unit suite."""
    import numpy as np
    import ray.data as rd

    from ..corpus import corpus_parquet_dir, ensure_corpus
    from ..stages.mrc import mrc_pipeline
    ensure_corpus(sf_dir)
    corpus = rd.read_parquet(corpus_parquet_dir(sf_dir), columns=["content"])
    nbest = mrc_pipeline(corpus, max_span=4096, stride=4096, n_best=10_000)

    def shape(batch: pa.Table) -> pa.Table:
        ents = batch["entities"].to_pylist()
        probs = batch["probabilities"].to_pylist()
        top = np.array([p[0] if p else 0.0 for p in probs])
        top = np.floor(top * 1e6 + 0.5) / 1e6        # half-away 6dp
        return pa.Table.from_pydict({
            "example_id": batch["example_id"],
            "n_entities": pa.array([len(e) for e in ents], pa.int64()),
            "top_prob": pa.array(top, pa.float64()),
            "na_prob": batch["na_prob"],
            "final_answer": batch["final_answer"],
        })
    return nbest.map_batches(shape, batch_format="pyarrow")


def q_corpus_line_dedup(sf_dir: str):
    """Cross-document line dedup (C4/RefinedWeb-style repeated-line
    removal) over the corpus: keep each repeated line's corpus-global
    FIRST occurrence (by file path, then line index); lines shorter than
    20 chars always pass. Per file: line counts + sha256 of the
    reassembled text — one mis-kept or mis-ordered line fails the hash.
    Text is pruned at the read (path + content only)."""
    import ray.data as rd

    from ..corpus import corpus_parquet_dir, ensure_corpus
    from ..stages.dedup import line_dedup
    ensure_corpus(sf_dir)
    ds = rd.read_parquet(corpus_parquet_dir(sf_dir),
                         columns=["path", "content"])
    return line_dedup(ds)


def q_corpus_substring_dedup(sf_dir: str):
    """Exact substring dedup (Lee et al. 2022): remove all-but-first
    occurrences of duplicated 64-char substrings corpus-wide, merging
    overlapping windows into spans before splicing. The hash gates every
    file's span count, removed-char total AND the spliced text."""
    import ray.data as rd

    from ..corpus import corpus_parquet_dir, ensure_corpus
    from ..stages.dedup import substring_dedup
    ensure_corpus(sf_dir)
    ds = rd.read_parquet(corpus_parquet_dir(sf_dir),
                         columns=["path", "content"])
    return substring_dedup(ds, k=64)


KG_QUERIES = {
    "kg_corpus_sha": q_corpus_sha,
    "corpus_line_dedup": q_corpus_line_dedup,
    "corpus_substring_dedup": q_corpus_substring_dedup,
    "kg_mentions": q_mentions,
    "kg_label_hist": q_label_hist,
    "kg_canonical": q_canonical,
    "kg_triples": q_triples,
    "kg_pagerank": q_kg_pagerank,
    "kg_hot_surfaces": q_kg_hot_surfaces,
    "nre_bags": q_nre_bags,
    "mrc_answers": q_mrc_answers,
}


# ---------------------------------------------------------------------------
# operators over the provided tables (documents / embeddings / events / TPC-H)
# ---------------------------------------------------------------------------

def _docs(sf_dir: str, columns=None):
    from ..functions.tables import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def q_doc_tfidf(sf_dir: str):
    """Top-5 TF-IDF terms per document (corpus-global DF broadcast +
    row-local ranking; exact integer scores)."""
    from ..stages.text_analysis import tfidf_top_terms
    return tfidf_top_terms(_docs(sf_dir, ["doc_id", "text"]))


def q_doc_exact_dedup(sf_dir: str):
    from ..stages.dedup import exact_dedup
    return exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


def q_doc_token_count(sf_dir: str):
    from ..stages.text_analysis import token_count_batch
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pyarrow")


def q_doc_token_count_bpe(sf_dir: str):
    """Whitespace-ish + BPE-ish (GPT-2 pretokenizer classes) token counts
    per document — both RE2 kernels, SQL-gated."""
    from ..stages.text_analysis import bpe_token_count_batch
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        bpe_token_count_batch, batch_format="pyarrow")


def q_embedding_centroids(sf_dir: str):
    """Per-(label, dim) vector centroid as an exact scaled-int aggregate."""
    import ray.data as rd

    from ..stages.vectorops import label_centroids
    return label_centroids(read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                           columns=["label", "embedding"]))


def q_embedding_kmeans(sf_dir: str):
    """Seeded integer-exact k-means over the embedding column (the
    SemDeDup-style clustering stage): quantize half-away to int·1000,
    seed with the k smallest vec_ids, 3 Lloyd iterations of broadcast
    centroids + per-block integer partial sums, final assignment with
    exact integer distances. Ties break to the lowest cluster id on both
    sides; the hash gates every assignment AND distance."""
    from ..stages.vectorops import kmeans_assign
    return kmeans_assign(read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                            columns=["vec_id", "embedding"]))


def q_embedding_semdedup(sf_dir: str):
    """SemDeDup (cluster → within-cluster near-dup removal, keep the
    most-central member): k-means assignment + one bucketed exchange of
    quantized vectors + exact-integer cosine threshold (dot² vs norms —
    no float boundary anywhere). threshold_pct=40 is non-vacuous on the
    provided vectors (26 drops at sf0.01)."""
    from ..stages.vectorops import semdedup
    return semdedup(read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                       columns=["vec_id", "embedding"]))


def q_doc_quality(sf_dir: str):
    from ..stages.text_analysis import quality_batch
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow")


def q_doc_langid(sf_dir: str):
    from ..stages.text_analysis import langid_batch
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        langid_batch, batch_format="pyarrow")


def q_doc_jaccard_pairs(sf_dir: str):
    from ..stages.dedup import jaccard_pairs
    return jaccard_pairs(_docs(sf_dir, ["source", "doc_id", "text"]))


def q_knn_topk(sf_dir: str):
    import ray.data as rd

    from ..stages.knn import knn_brute
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return knn_brute(ds, query_ids=list(range(8)), k=10)


def q_doc_shuffle(sf_dir: str):
    """Seeded epoch shuffle (SURVEY T7/T8, r4): the permutation KEY per
    (doc, epoch) for two epochs — a bijection per epoch, so hashing the
    keys gates the full permutation without shipping a global rank; the
    ordering form is ``stages/sampling.seeded_shuffle`` (distributed sort
    by this key), pinned by pytest."""
    import pyarrow as pa
    import ray.data as rd

    from ..stages.sampling import with_shuffle_key
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])
    parts = []
    for epoch in (0, 1):
        keyed = with_shuffle_key(ds, "doc_id", seed=12345, epoch=epoch)
        parts.append(keyed.map_batches(
            lambda b, e=epoch: b.append_column(
                "epoch", pa.array([e] * len(b), pa.int64())),
            batch_format="pyarrow"))
    return parts[0].union(parts[1])


def q_doc_train_metrics(sf_dir: str):
    """Epoch accumulator metrics (SURVEY G9, r4): running token-weighted
    loss/accuracy over the seeded train stream (T7/T8's permutation) —
    the reference training loop's ``loss += mle_loss·nums; corr +=
    corrects`` accumulators (``ner.py:170-204``) with md5-of-identity
    stand-in signals. Steps are shuffle-key ranges (shuffle-free partial
    aggregation); running ratios are exact integer divisions."""
    from ..stages.metrics import epoch_train_metrics
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return epoch_train_metrics(ds)


def q_knn_topk_batch(sf_dir: str):
    """Batch-query ANN (r4): the QUERY side is a Dataset — here the whole
    embeddings table queries itself — through the chunked broadcast +
    size-gated merge path (``knn_brute_ds``), so similarity search composes
    with pipelines instead of a driver-provided ID list. Equality with the
    list form and a Q=10k distributed-merge case are test-pinned."""
    from ..stages.knn import knn_brute_ds
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return knn_brute_ds(ds, qds, k=5)


def q_events_window(sf_dir: str):
    import ray.data as rd

    from ..stages.windows import tumbling_window
    return tumbling_window(read_parquet_clean(f"{sf_dir}/events.parquet",
                                           columns=["user_id", "ts",
                                                    "value"]))


def _events(sf_dir: str, columns):
    from ..functions.tables import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/events.parquet", columns=columns)


def q_events_asof(sf_dir: str):
    """As-of attribution: purchase → most recent view at-or-before it per
    user (custom operator; DuckDB ASOF LEFT JOIN oracle)."""
    from ..stages.eventjoins import purchase_view_attribution
    return purchase_view_attribution(
        _events(sf_dir, ["event_id", "user_id", "ts", "event_type"]))


def q_events_range_count(sf_dir: str):
    """Interval range count: views per purchase in [ts-1h, ts], as a
    difference of two as-of lookups (no interval join)."""
    from ..stages.eventjoins import purchase_view_window_count
    return purchase_view_window_count(
        _events(sf_dir, ["event_id", "user_id", "ts", "event_type"]))


def q_events_sessions(sf_dir: str):
    import ray.data as rd

    from ..stages.windows import sessionize
    return sessionize(read_parquet_clean(f"{sf_dir}/events.parquet",
                                      columns=["user_id", "ts"]))


def q_q1(sf_dir: str):
    from ..stages.relational import q1_pricing_summary
    return q1_pricing_summary(sf_dir)


def q_orders_by_nation(sf_dir: str):
    from ..stages.relational import orders_by_nation
    return orders_by_nation(sf_dir)


def q_top_orders(sf_dir: str):
    from ..stages.relational import top_orders
    return top_orders(sf_dir)


def q_part_type_stats(sf_dir: str):
    from ..stages.relational import part_type_stats
    return part_type_stats(sf_dir)


def q_revenue_by_region(sf_dir: str):
    """lineitem ⋈ supplier ⋈ nation ⋈ region (broadcast dimension chain,
    fact table streams) → revenue per supplier region. Completes table
    coverage: every provided testdata table now feeds a gated query."""
    from ..stages.relational import revenue_by_region
    return revenue_by_region(sf_dir)


def q_vocab_from_corpus(sf_dir: str):
    """Count-based vocabulary builder (reference S10/G3,
    ``utils/chinese_CONLL.py:44-86``): token → count over the documents
    corpus, digit-normalized (M8), kept when count > min_occur."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.groupagg import bucketed_agg
    min_occur = 5

    def tokens(batch: pa.Table) -> pa.Table:
        import re
        tok_re = re.compile(r"[A-Za-z0-9_]+")
        words: list[str] = []
        counts: list[int] = []
        acc: dict[str, int] = {}
        for text in batch["text"].to_pylist():
            for w in tok_re.findall(text):
                w = re.sub(r"\d", "0", w)          # M8 digit normalization
                acc[w] = acc.get(w, 0) + 1
        for w, c in acc.items():
            words.append(w)
            counts.append(c)
        return pa.Table.from_pydict({
            "word": pa.array(words, pa.string()),
            "n_partial": pa.array(counts, pa.int64()),
        })

    counted = bucketed_agg(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            tokens, batch_format="pyarrow", batch_size=None),
        ["word"], {"n": ("n_partial", "sum")}, num_buckets=16)
    return counted.map_batches(
        lambda t: t.filter(pc.greater(t["n"], min_occur)),
        batch_format="pyarrow")


def q_doc_normalize(sf_dir: str):
    """Text normalizer (reference M8 + M13): lower → digits→0 → collapse
    whitespace → strip; fully vectorized pyarrow.compute (RE2, matching the
    DuckDB oracle's regexes exactly)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch["text"])
        t = pc.replace_substring_regex(t, r"\d", "0")
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim_whitespace(t)
        return pa.Table.from_pydict({
            "doc_id": batch["doc_id"],
            "norm_text": t,
        })
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        norm, batch_format="pyarrow")


# --- rows-only (no SQL oracle; verified in pytest instead) -----------------

def q_doc_minhash_pairs(sf_dir: str):
    """MinHash-LSH near-dup pairs, Jaccard-verified ≥ 0.7. The verify stage
    only ever materializes CANDIDATE docs (semi-join filter), never the
    corpus — see stages/dedup.minhash_dedup_pairs."""
    from ..stages.dedup import minhash_dedup_pairs
    return minhash_dedup_pairs(_docs(sf_dir, ["doc_id", "text"]))


def q_doc_simhash(sf_dir: str):
    from ..stages.dedup import simhash_dataset
    return simhash_dataset(_docs(sf_dir, ["doc_id", "text"]))


def q_doc_fingerprint(sf_dir: str):
    """Winnowing fingerprints, exploded one row per (doc, ordinal) —
    SQL-gated (byte-hex polynomial hash + window-min oracle)."""
    from ..stages.text_analysis import fingerprint_rows_batch
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fingerprint_rows_batch, batch_format="pyarrow")


def q_doc_curation(sf_dir: str):
    """End-to-end curation flagship: fused quality+secret gates, exact
    dedup, MinHash near-dedup keep, composed verdict + reason — gated by
    one oracle assembled from the stage oracles."""
    from .curation import curation_pipeline
    return curation_pipeline(_docs(sf_dir, ["doc_id", "text"]))


def q_doc_pack_sequences(sf_dir: str):
    """Greedy packing of docs into ≤512-token training sequences (LLM
    pretraining prep): sequential fold within doc_id%16 buckets, parallel
    across buckets; hash gates every doc's (bucket, seq_index,
    tok_offset)."""
    from ..stages.text_analysis import pack_training_sequences
    return pack_training_sequences(_docs(sf_dir, ["doc_id", "text"]))


def q_doc_curation_semantic(sf_dir: str):
    """The COMPLETE modern curation stack in one verdict: quality +
    secret gates, exact dedup, MinHash near-dedup, PLUS the SemDeDup
    semantic layer over the 1:1 embedding table (17 semantic drops among
    surface-kept docs at sf0.01 — non-vacuous)."""
    from .curation import curation_semantic_pipeline
    return curation_semantic_pipeline(
        _docs(sf_dir, ["doc_id", "text"]),
        read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]))


def q_doc_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag docs sharing ≥ 2 distinct 8-gram
    shingles with the probe set (docs 0-4 stand in as the benchmark) —
    broadcast probe, zero-exchange scan."""
    import pyarrow.parquet as pq

    from ..stages.dedup import decontaminate
    bench_tab = pq.read_table(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"],
                              filters=[("doc_id", "<", 5)])  # pushdown
    bench = dict(zip((int(i) for i in bench_tab["doc_id"].to_pylist()),
                     bench_tab["text"].to_pylist()))
    return decontaminate(_docs(sf_dir, ["doc_id", "text"]), bench)


def q_doc_secret_scan(sf_dir: str):
    """PII / credential scan (emails, URLs, key-shaped tokens, PEM private
    keys, AWS key ids) — the redaction gate of a training-data pipeline."""
    from ..stages.text_analysis import secret_scan_batch
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        secret_scan_batch, batch_format="pyarrow")


def q_doc_repetition(sf_dir: str):
    """Repetition quality signals (Gopher-style): line counts, distinct
    lines, max single-line frequency, integer ppm duplicate-line ratio."""
    from ..stages.text_analysis import repetition_batch
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        repetition_batch, batch_format="pyarrow")


def q_doc_inverted_index(sf_dir: str):
    """Posting-list index build: term → (df, sorted comma-joined doc_ids)."""
    from ..stages.text_analysis import inverted_index
    return inverted_index(_docs(sf_dir, ["doc_id", "text"]))


def q_doc_bigram_counts(sf_dir: str):
    """Corpus bigram counts (n-gram LM stats), min_count=3."""
    from ..stages.text_analysis import bigram_counts
    return bigram_counts(_docs(sf_dir, ["doc_id", "text"]), min_count=3)


def q_doc_stratified_sample(sf_dir: str):
    """Exactly-k-per-source deterministic sample (splitmix64 key — the
    SQL oracle reproduces the key in hugeint limb arithmetic)."""
    from ..stages.sampling import stratified_sample
    return stratified_sample(_docs(sf_dir, ["doc_id", "source"]),
                             "source", "doc_id", k=20)


def q_doc_sample_rate(sf_dir: str):
    """Deterministic Bernoulli-style downsample at rate 0.3 (zero-exchange
    filter; same row set on every run/engine)."""
    from ..stages.sampling import sample_by_rate
    return sample_by_rate(_docs(sf_dir, ["doc_id", "source"]),
                          "doc_id", rate=0.3)


def q_knn_lsh(sf_dir: str):
    import ray.data as rd

    from ..stages.knn import knn_lsh
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return knn_lsh(ds, query_ids=list(range(8)), k=10)


def q_knn_ivf(sf_dir: str):
    import ray.data as rd

    from ..stages.knn import knn_ivf
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return knn_ivf(ds, query_ids=list(range(8)), k=10)


def q_embedding_neardup(sf_dir: str):
    """LSH-bucketed embedding near-dup pairs, SQL-gated (literal-plane
    bucket oracle). Gated at threshold 0.35 / bits=8 so the hash covers
    NON-EMPTY output on the provided vectors (r3 verdict: the 0.9 gate
    matched on 0 == 0 rows — correct but vacuous; 0.35/8 emits 5 pairs at
    sf0.01 and 97 at sf0.1, with ≥9e-5 threshold margin and ≥1e-11
    6dp-boundary margin, far above cross-engine float noise). Cosine is
    6dp half-away rounded on BOTH sides. An all-empty ``map_groups``
    output drops its schema in ``to_pandas``, so the typed empty frame is
    restored explicitly (still possible at other scales)."""
    import pandas as pd
    import ray.data as rd

    from ..functions.rounding import scaled_int64_np
    from ..stages.dedup import embedding_neardup_pairs
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    pdf = embedding_neardup_pairs(ds, threshold=0.35, bits=8).to_pandas()
    if pdf.empty:
        pdf = pd.DataFrame({"vec_id_a": pd.Series(dtype="int64"),
                            "vec_id_b": pd.Series(dtype="int64"),
                            "cosine": pd.Series(dtype="float64")})
    else:
        pdf["cosine"] = scaled_int64_np(
            pdf["cosine"].to_numpy(), 1e6) / 1e6
    return pdf


TABLE_QUERIES = {
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_token_count": q_doc_token_count,
    "doc_tfidf": q_doc_tfidf,
    "doc_quality": q_doc_quality,
    "doc_langid": q_doc_langid,
    "doc_jaccard_pairs": q_doc_jaccard_pairs,
    "knn_topk": q_knn_topk,
    "events_window": q_events_window,
    "events_sessions": q_events_sessions,
    "q1_pricing_summary": q_q1,
    "orders_by_nation": q_orders_by_nation,
    "top_orders": q_top_orders,
    "part_type_stats": q_part_type_stats,
    "revenue_by_region": q_revenue_by_region,
    "vocab_from_corpus": q_vocab_from_corpus,
    "doc_normalize": q_doc_normalize,
    "doc_fingerprint": q_doc_fingerprint,
    "events_asof": q_events_asof,
    "events_range_count": q_events_range_count,
    "doc_token_count_bpe": q_doc_token_count_bpe,
    "embedding_centroids": q_embedding_centroids,
    "embedding_kmeans": q_embedding_kmeans,
    "embedding_semdedup": q_embedding_semdedup,
}

def q_ner_eval_prf(sf_dir: str):
    """Distributed conlleval (the P/R ≥ 0.95 gate): gold ⋈ pred on guid →
    chunk-count partials → global metrics (one row)."""
    from .evaluate import ner_eval
    return ner_eval(sf_dir)


def q_mrc_nbest(sf_dir: str):
    """MRC fan-out/fan-in in the SLIDING-WINDOW regime (max_span=200,
    stride=100 — multi-window files, max-context ownership, per-window
    beam): the full n-best lists exploded to one row per kept entity
    (ord 1..k; empty examples emit one ord=0 row), probabilities 6dp-
    rounded on both sides of the DuckDB gate (CLAUDE.md technique)."""
    import numpy as np

    from ..stages.mrc import mrc_pipeline
    from .kg import read_corpus
    nbest = mrc_pipeline(read_corpus(sf_dir))

    def explode(batch: pa.Table) -> pa.Table:
        ex, ords, ents, probs, nent, na, fin = [], [], [], [], [], [], []
        for e_id, es, ps, np_, fa in zip(
                batch["example_id"].to_pylist(),
                batch["entities"].to_pylist(),
                batch["probabilities"].to_pylist(),
                batch["na_prob"].to_pylist(),
                batch["final_answer"].to_pylist()):
            if not es:
                ex.append(e_id); ords.append(0); ents.append("")
                probs.append(0.0); nent.append(0); na.append(np_)
                fin.append(fa)
                continue
            for i, (ent, p) in enumerate(zip(es, ps), start=1):
                ex.append(e_id); ords.append(i); ents.append(ent)
                probs.append(np.floor(p * 1e6 + 0.5) / 1e6)  # half-away 6dp
                nent.append(len(es)); na.append(np_); fin.append(fa)
        return pa.Table.from_pydict({
            "example_id": pa.array(ex, pa.string()),
            "ord": pa.array(ords, pa.int64()),
            "entity": pa.array(ents, pa.string()),
            "prob": pa.array(probs, pa.float64()),
            "n_entities": pa.array(nent, pa.int64()),
            "na_prob": pa.array(na, pa.float64()),
            "final_answer": pa.array(fin, pa.string()),
        })
    return nbest.map_batches(explode, batch_format="pyarrow")


def q_nre_relations(sf_dir: str):
    """Relation extraction over (def → call) mention pairs."""
    from ..stages.nre import nre_pipeline
    from ..stages.ner_scorer import score_dataset
    from ..stages.segmenter import segment_dataset
    from .kg import read_corpus
    cfg = PipelineConfig()
    scored = score_dataset(segment_dataset(read_corpus(sf_dir), cfg.segment),
                           cfg.scorer, cfg.segment)
    return nre_pipeline(scored)


def docs_from_corpus(batch: "pa.Table") -> "pa.Table":
    """corpus → gold doc records (guid, text, entities) via grammar."""
    import re

    import pyarrow as pa

    from ..corpus import MENTION_PATTERNS
    from ..functions.hashing import sha256_hex
    pats = [(lab, re.compile(p)) for lab, p in MENTION_PATTERNS.items()]
    out = {"guid": [], "text": [], "entities": []}
    for content in batch["content"].to_pylist():
        ents = []
        for lab, pat in pats:
            for m in pat.finditer(content):
                s, e = m.span(1)
                ents.append({"label_type": lab, "start_pos": s,
                             "end_pos": e})
        out["guid"].append(sha256_hex(content))
        out["text"].append(content)
        out["entities"].append(ents)
    ent_t = pa.list_(pa.struct([("label_type", pa.string()),
                                ("start_pos", pa.int32()),
                                ("end_pos", pa.int32())]))
    return pa.Table.from_pydict({
        "guid": pa.array(out["guid"], pa.string()),
        "text": pa.array(out["text"], pa.string()),
        "entities": pa.array(out["entities"], ent_t),
    })


def _tagger_splits(sf_dir: str):
    """Grammar corpus → (train, dev, test) tagger-record Datasets — the
    shared front of the prep/train-path queries."""
    from .kg import read_corpus
    from .prep import prep_pipeline
    docs = read_corpus(sf_dir).map_batches(docs_from_corpus,
                                           batch_format="pyarrow")
    return prep_pipeline(docs)


def q_prep_tagger_records(sf_dir: str):
    """Prep pipeline output (train split) row count + char/label invariants
    checked downstream; returns the train tagger records."""
    import pyarrow as pa

    train, dev, test = _tagger_splits(sf_dir)

    def join_labels(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "guid": batch["guid"],
            "text": batch["text"],
            "labels": pa.array([",".join(ls) for ls in
                                batch["token_labels"].to_pylist()],
                               pa.string()),
        })
    return train.map_batches(join_labels, batch_format="pyarrow")


def q_doc_lang_distribution(sf_dir: str):
    """Distinct-values + counts (reference D2/G2 ``ds.unique`` analog) over
    a low-cardinality key — the built-in aggregate is the right tool here."""
    from ray.data.aggregate import Count
    return (_docs(sf_dir, ["lang"])
            .groupby("lang")
            .aggregate(Count(alias_name="n_docs")))


def q_kg_triples_by_repo(sf_dir: str):
    """Second-level rollup over the triple output: per (repo, pred) counts —
    a groupby OVER a pipeline result (composability check)."""
    from ..stages.groupagg import bucketed_agg
    from .kg import kg_pipeline
    triples = kg_pipeline(sf_dir)
    return bucketed_agg(triples, ["repo", "pred"],
                        {"n_triples": ("n_mentions", "count"),
                         "n_mentions": ("n_mentions", "sum")},
                        num_buckets=16)


def q_kg_triples_resumable(sf_dir: str):
    """The CHECKPOINTED path under the same SQL gate as kg_triples: run the
    wave-based resumable pipeline to a scratch dir and return the final
    partitioned triples (logical columns only). Must equal the in-memory
    flagship — and therefore the DuckDB oracle — exactly."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..corpus import sf_name_of
    from ..state.lineage import run_resumable_kg
    out = f"/tmp/kgray_resume_query/{sf_name_of(sf_dir)}"
    shutil.rmtree(out, ignore_errors=True)       # clean deterministic run
    run_resumable_kg(sf_dir, out, num_waves=4)
    tdir = os.path.join(out, "triples")
    files = [os.path.join(tdir, f) for f in sorted(os.listdir(tdir))
             if f.endswith(".parquet")]
    return rd.read_parquet(files)


TABLE_QUERIES["kg_triples_resumable"] = q_kg_triples_resumable


def q_doc_token_stats(sf_dir: str):
    """Per-lang token-count distribution incl. MEDIAN (quantile aggregate).

    Low-cardinality group key (5 langs) → plain ``groupby().map_groups`` is
    the right tool (exact quantiles need the group's values together; with
    few heavy groups there is no per-group-task overhead problem)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..stages.text_analysis import token_count_batch

    def add_lang(batch: pa.Table) -> pa.Table:
        counted = token_count_batch(batch)
        return counted.append_column("lang", batch["lang"])

    def per_lang(g: pd.DataFrame):
        from ..functions.tables import from_pandas_clean
        v = g["n_tokens"].to_numpy()
        return from_pandas_clean(pd.DataFrame({
            "lang": [g["lang"].iloc[0]],
            "n_docs": [len(v)],
            "min_tokens": [int(v.min())],
            "max_tokens": [int(v.max())],
            "median_tokens": [float(np.median(v))],
        }))

    return (_docs(sf_dir, ["doc_id", "lang", "text"])
            .map_batches(add_lang, batch_format="pyarrow")
            .groupby("lang")
            .map_groups(per_lang, batch_format="pandas"))


TABLE_QUERIES["doc_token_stats"] = q_doc_token_stats


def q_events_sliding_window(sf_dir: str):
    import ray.data as rd

    from ..stages.windows import sliding_window
    return sliding_window(read_parquet_clean(f"{sf_dir}/events.parquet",
                                          columns=["user_id", "ts",
                                                   "value"]))


def q_top_orders_per_customer(sf_dir: str):
    from ..stages.relational import top_orders_per_customer
    return top_orders_per_customer(sf_dir)


def q_media_decode_stats(sf_dir: str):
    """The multimodal codec path, VALUE-HASH GATED (late r4; JPEG arm
    r5): every document becomes a deterministic formula image (doc_id
    mod 3: 0 → truecolor PNG, 1 → grayscale GIF, 2 → baseline JPEG of a
    block-constant grayscale image, exactly lossless through unit quant
    tables), container-encoded, then decoded through the production
    ``DecodeImage`` dispatch (real pure-stdlib codecs, no fake path)
    into integer pixel sums. The formulas give the decoded sums a closed
    form DuckDB restates exactly, so one mis-decoded pixel anywhere —
    LZW, PNG filters, huffman decode, IDCT, palette — fails the hash."""
    from ..stages.multimodal import media_decode_stats
    return media_decode_stats(_docs(sf_dir, ["doc_id"]))


def q_media_audio_stats(sf_dir: str):
    """The audio codec path, value-hash gated: deterministic 2-channel
    PCM16 formula waveforms, WAV-encoded, decoded through the production
    ``AudioFeatures`` dispatch (real RIFF/PCM codec + mono mixdown) into
    exact channel-sum integers with a DuckDB closed form."""
    from ..stages.multimodal import media_audio_stats
    return media_audio_stats(_docs(sf_dir, ["doc_id"]))


def q_media_video_stats(sf_dir: str):
    """The video path, value-hash gated end-to-end: deterministic 8-frame
    videos per document (even doc_id → mono Y4M, odd → MP4/MJPEG, r5) →
    REAL frame sampling (``SampleFrames``: Y4M frames re-containered
    standalone; MP4 samples located by the ISO-BMFF sample tables, each a
    complete baseline JPEG) → per-frame decode through ``DecodeImage``
    into integer luma sums. One hash covers the sampling arithmetic, the
    container demux/re-containering, and both frame decodes."""
    from ..stages.multimodal import media_video_stats
    return media_video_stats(_docs(sf_dir, ["doc_id"]))


TABLE_QUERIES["doc_lang_distribution"] = q_doc_lang_distribution
TABLE_QUERIES["kg_triples_by_repo"] = q_kg_triples_by_repo
TABLE_QUERIES["events_sliding_window"] = q_events_sliding_window
TABLE_QUERIES["top_orders_per_customer"] = q_top_orders_per_customer
TABLE_QUERIES["media_decode_stats"] = q_media_decode_stats
TABLE_QUERIES["media_audio_stats"] = q_media_audio_stats
TABLE_QUERIES["media_video_stats"] = q_media_video_stats

TABLE_QUERIES["knn_lsh"] = q_knn_lsh
TABLE_QUERIES["doc_simhash"] = q_doc_simhash
TABLE_QUERIES["doc_stratified_sample"] = q_doc_stratified_sample
TABLE_QUERIES["doc_sample_rate"] = q_doc_sample_rate
TABLE_QUERIES["doc_inverted_index"] = q_doc_inverted_index
TABLE_QUERIES["doc_bigram_counts"] = q_doc_bigram_counts
TABLE_QUERIES["embedding_neardup"] = q_embedding_neardup
TABLE_QUERIES["doc_minhash_pairs"] = q_doc_minhash_pairs
TABLE_QUERIES["doc_secret_scan"] = q_doc_secret_scan
TABLE_QUERIES["doc_decontaminate"] = q_doc_decontaminate
TABLE_QUERIES["doc_curation"] = q_doc_curation
TABLE_QUERIES["doc_curation_semantic"] = q_doc_curation_semantic
TABLE_QUERIES["doc_pack_sequences"] = q_doc_pack_sequences
TABLE_QUERIES["doc_repetition"] = q_doc_repetition

TABLE_QUERIES["knn_ivf"] = q_knn_ivf
TABLE_QUERIES["knn_topk_batch"] = q_knn_topk_batch
TABLE_QUERIES["doc_shuffle"] = q_doc_shuffle
TABLE_QUERIES["doc_train_metrics"] = q_doc_train_metrics

def q_mrc_token_answers(sf_dir: str):
    """TOKEN-level MRC (real-tokenizer composition): SP-style whitespace
    tokenizer → banded-LCS char↔token alignment → token windows
    (doc_stride=64, max_query_length=64 per the reference's
    ``config/mrc_processor.json``) → ``convert_index`` span mapping back to
    original chars. SQL-gated (r3): the LCS DP itself is not
    SQL-expressible, but for the SP stand-in tokenizer its RESULT has a
    provable closed form (word ends; first gap space / ``convert_index``
    interpolation for starts) that ``oracle.sql_mrc_token_answers``
    restates — so the whole token-window composition is value-hashed. The
    alignment core stays differentially tested against the reference's own
    ``_convert_index`` and the zero-features modes are pytest-pinned.
    Output mirrors ``mrc_answers``'s reduced shape."""
    import ray.data as rd

    from ..corpus import corpus_parquet_dir, ensure_corpus
    from ..stages.mrc import token_mrc_pipeline
    ensure_corpus(sf_dir)
    corpus = rd.read_parquet(corpus_parquet_dir(sf_dir), columns=["content"])
    return token_answers_shape(token_mrc_pipeline(corpus))


def q_mrc_token_answers_sp(sf_dir: str):
    """TOKEN-level MRC through the REAL SentencePiece-style unigram
    tokenizer (``functions/sptokenizer.py``: committed vocab fixture,
    Viterbi segmentation, ALBERT ``preprocess_text`` lower+NFKD, XLNet
    ``encode_pieces`` glue) — the reference's actual tokenize path
    (``mrc_utils.py:124-131``) instead of the whitespace stand-in. Subword
    pieces + lowercasing make the banded-LCS char↔token alignment resolve
    real mismatches (every original uppercase char is unaligned and
    interpolates through ``convert_index``). Same window/beam/merge
    machinery and reduced output shape as ``mrc_token_answers``."""
    import ray.data as rd

    from ..corpus import corpus_parquet_dir, ensure_corpus
    from ..stages.mrc import token_mrc_pipeline
    ensure_corpus(sf_dir)
    corpus = rd.read_parquet(corpus_parquet_dir(sf_dir), columns=["content"])
    return token_answers_shape(token_mrc_pipeline(corpus, tokenizer="sp"))


def q_mrc_token_answers_sp_unicode(sf_dir: str):
    """The SP-tokenizer MRC over the UNICODE-DECORATED corpus
    (``corpus.decorate_unicode``: accents, ligatures, quote pairs) — inputs
    where the tokenizer's NFKD/quote normalization CHANGES text length, so
    the LCS alignment has no closed form and the DP is load-bearing.
    Rows-only at the driver (the alignment result is genuinely not
    SQL-expressible here); correctness is pinned by differential tests
    executing the reference's own ``_lcs_match``/``_convert_index`` on the
    same decorated inputs (``tests/test_sp_tokenizer.py``)."""
    import pyarrow as pa
    import ray.data as rd

    from ..corpus import corpus_parquet_dir, decorate_unicode, ensure_corpus
    from ..stages.mrc import token_mrc_pipeline
    ensure_corpus(sf_dir)

    def decorate(batch: pa.Table) -> pa.Table:
        return pa.table({"content": pa.array(
            [decorate_unicode(c) for c in batch["content"].to_pylist()],
            pa.string())})

    corpus = (rd.read_parquet(corpus_parquet_dir(sf_dir),
                              columns=["content"])
              .map_batches(decorate, batch_format="pyarrow"))
    return token_answers_shape(token_mrc_pipeline(corpus, tokenizer="sp"))


def token_answers_shape(nbest):
    """n-best rows → the gate's reduced shape (example_id, n_entities,
    half-away-6dp top prob, na_prob, final_answer) — shared by the driver
    query and the hand-built edge-corpus parity test."""
    import numpy as np

    def shape(batch: pa.Table) -> pa.Table:
        ents = batch["entities"].to_pylist()
        probs = batch["probabilities"].to_pylist()
        top = np.array([p[0] if p else 0.0 for p in probs])
        top = np.floor(top * 1e6 + 0.5) / 1e6        # half-away 6dp
        return pa.Table.from_pydict({
            "example_id": batch["example_id"],
            "n_entities": pa.array([len(e) for e in ents], pa.int64()),
            "top_prob": pa.array(top, pa.float64()),
            "na_prob": batch["na_prob"],
            "final_answer": batch["final_answer"],
        })
    return nbest.map_batches(shape, batch_format="pyarrow")


def q_crf_train_run(sf_dir: str):
    """CRF transition-training run metrics (reference train loop restated as
    distributed structured-perceptron epochs — ``stages/crf_train``): one
    row per epoch with train mismatch/update-mass and dev conlleval chunk
    F1, ``is_best`` marking the best-checkpoint epoch. All-integer, so the
    whole TRAINING RUN is value-hash gated (the oracle is the closed form
    of the converged perceptron on the grammar corpus)."""
    from ..stages.crf_train import train_crf_transitions
    train, dev, _ = _tagger_splits(sf_dir)
    metrics, _T = train_crf_transitions(train, dev)
    return metrics.drop(columns=["train_nll"])


def q_crf_train_sgd(sf_dir: str):
    """Float-SGD training run (r5): batch gradient descent on the exact
    CRF log-likelihood — the reference's LITERAL optimizer semantics
    (``crf_log_likelihood`` gradient = expected − observed bigram counts
    via forward-backward). Floats are not value-hash gateable (rows-only
    driver check); the mode is pytest-pinned instead: analytic gradient ≡
    finite differences, NLL strictly monotone, converged decode ≡ the
    perceptron path's converged decode (tests/test_crf_train.py). The
    returned frame keeps the integer dev-eval columns per epoch."""
    from ..stages.crf_train import train_crf_transitions_sgd
    train, dev, _ = _tagger_splits(sf_dir)
    metrics, _T = train_crf_transitions_sgd(train, dev, epochs=4, lr=0.25)
    return metrics.drop(columns=["train_nll", "grad_l1"])


def q_crf_transitions(sf_dir: str):
    """The LEARNED transition matrix after training (81 tidy rows): the
    analog of the reference's trained ``transition_params``
    (``crf_albert.py:147-168``) — must encode exactly the BIO continuation
    structure that ``ner_scorer.bio_transitions`` hard-codes for
    inference."""
    from ..stages.crf_train import train_crf_transitions, transitions_frame
    train, dev, _ = _tagger_splits(sf_dir)
    _metrics, T = train_crf_transitions(train, dev)
    return transitions_frame(T)


# gated as of round 3 (oracle.py segment/window/token restatements) — in
# KG_QUERIES so the pytest oracle-parity parametrization covers them
KG_QUERIES["mrc_nbest"] = q_mrc_nbest
KG_QUERIES["nre_relations"] = q_nre_relations
KG_QUERIES["prep_tagger_records"] = q_prep_tagger_records
KG_QUERIES["mrc_token_answers"] = q_mrc_token_answers
# gated as of round 4: unigram-Viterbi-in-SQL + closed-form alignment with
# case mismatches (oracle.sql_mrc_token_answers_sp)
KG_QUERIES["mrc_token_answers_sp"] = q_mrc_token_answers_sp
# gated as of round 4: the training loop's closed form (oracle.sql_crf_*)
KG_QUERIES["crf_train_run"] = q_crf_train_run
KG_QUERIES["crf_transitions"] = q_crf_transitions

ROWS_ONLY_QUERIES = {
    "ner_eval_prf": q_ner_eval_prf,
    # genuinely non-SQL-expressible: on unicode-decorated inputs the
    # tokenizer's NFKD/quote normalization changes text length, so the LCS
    # alignment has no closed form — gated by differential tests executing
    # the reference's own _lcs_match (tests/test_sp_tokenizer.py)
    "mrc_token_answers_sp_unicode": q_mrc_token_answers_sp_unicode,
    # float SGD on the exact CRF NLL (r5): exp/log make the run
    # platform-dependent in the last bits, so no value hash — pinned by
    # gradient/finite-difference, monotone-NLL and decode-parity tests
    "crf_train_sgd": q_crf_train_sgd,
}


def q_ner_predictions(sf_dir: str):
    """Serving-schema predictions (FIXTURES.md F4, reference response shape
    ``{guid, words, tags}`` per query — ``nerservice/ner_server.py:22-27``):
    per segment, the char tokens and their BIO tags. Gate form: ``tags`` is
    the comma-joined per-char label sequence (the envelope's ``words`` list
    is exactly ``list(text)`` and ``tags.split(',')`` restores the list —
    the list envelope itself is pinned by the serving tests)."""
    import pyarrow as pa

    from ..stages.ner_scorer import LABEL_LIST, score_dataset
    from ..stages.segmenter import segment_dataset
    from .kg import read_corpus
    cfg = PipelineConfig()
    scored = score_dataset(segment_dataset(read_corpus(sf_dir), cfg.segment),
                           cfg.scorer, cfg.segment)

    def fmt(batch: pa.Table) -> pa.Table:
        tag_ids = batch["tag_ids"].to_pylist()
        tags = [",".join(LABEL_LIST[i] for i in ids) for ids in tag_ids]
        return pa.Table.from_pydict({
            "guid": batch["guid"],
            "text": batch["text"],
            "tags": pa.array(tags, pa.string()),
        })
    return scored.map_batches(fmt, batch_format="pyarrow")


KG_QUERIES["ner_predictions"] = q_ner_predictions


def q_ner_predictions_trained(sf_dir: str):
    """The TRAIN → SERVE cycle closed end-to-end (reference: trained
    ``transition_params`` feed ``crf_decode`` at inference,
    ``crf_albert.py:147-168``): learn the transition matrix with the
    perceptron loop, then run Viterbi inference with the LEARNED matrix
    instead of the hand-coded BIO constraints. Gated by the SAME oracle as
    ``ner_predictions`` — the learned ±1 weights must not perturb decode
    on margin-dominated emissions (margins ≥ 5 > any 2-transition swing),
    so any training defect that produces an out-of-family matrix fails
    the hash."""
    import pyarrow as pa

    from ..config import ScorerConfig
    from ..stages.crf_train import train_crf_transitions
    from ..stages.ner_scorer import LABEL_LIST, score_dataset
    from ..stages.segmenter import segment_dataset
    from .kg import read_corpus

    train, dev, _ = _tagger_splits(sf_dir)
    _metrics, T = train_crf_transitions(train, dev)
    cfg = PipelineConfig()
    scorer_cfg = ScorerConfig(decode="viterbi")
    scored = score_dataset(segment_dataset(read_corpus(sf_dir), cfg.segment),
                           scorer_cfg, cfg.segment, transitions=T)

    def fmt(batch: pa.Table) -> pa.Table:
        tag_ids = batch["tag_ids"].to_pylist()
        tags = [",".join(LABEL_LIST[i] for i in ids) for ids in tag_ids]
        return pa.Table.from_pydict({
            "guid": batch["guid"],
            "text": batch["text"],
            "tags": pa.array(tags, pa.string()),
        })
    return scored.map_batches(fmt, batch_format="pyarrow")


KG_QUERIES["ner_predictions_trained"] = q_ner_predictions_trained


def q_doc_dedup_keep(sf_dir: str):
    """Near-dedup keep/drop decision per doc (LSH → verify → connected
    components, min-id representative). Per-doc assignment is a distributed
    scan against a broadcast member→component map."""
    from ..stages.dedup import minhash_dedup_keep
    return minhash_dedup_keep(_docs(sf_dir, ["doc_id", "text"]))


TABLE_QUERIES["doc_dedup_keep"] = q_doc_dedup_keep


def q_doc_length_quantiles(sf_dir: str):
    """Exact corpus length quantiles (char + token) via histogram partials
    — the cutoff-selection signal of a curation pipeline, one shuffle-free
    pass (stages/text_analysis.length_quantiles)."""
    from ..stages.text_analysis import length_quantiles
    return length_quantiles(_docs(sf_dir, ["doc_id", "text"]))


TABLE_QUERIES["doc_length_quantiles"] = q_doc_length_quantiles



def build_queries() -> dict:
    """Full driver-facing query registry (grows as operators land)."""
    out = dict(KG_QUERIES)
    out.update(TABLE_QUERIES)
    out.update(ROWS_ONLY_QUERIES)
    return out


def build_oracles(sf_dir: str) -> dict:
    """Oracle SQL per query name (rows-only queries intentionally absent)."""
    from ..oracle import KG_ORACLES
    from ..oracle_tables import TABLE_ORACLE_BUILDERS, TABLE_ORACLES
    out = {name: builder(sf_dir) for name, builder in KG_ORACLES.items()}
    out.update(TABLE_ORACLES)
    out.update({name: builder(sf_dir)
                for name, builder in TABLE_ORACLE_BUILDERS.items()})
    return out
