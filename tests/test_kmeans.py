"""Seeded integer-exact k-means (`stages/vectorops.kmeans_assign`):
planted-cluster semantics + empty-cluster drop rule. DuckDB value-hash
parity for `embedding_kmeans` runs in the parametrized TABLE_QUERIES sweep."""

import numpy as np
import pandas as pd
import ray.data as rd

from knowledgeextraction_ray.stages.vectorops import kmeans_assign


def _blob_ds():
    """Three tight, well-separated 8-dim blobs; vec_ids 0..2 land one per
    blob so the k=3 seeds start in distinct basins."""
    rs = np.random.RandomState(7)
    centers = np.array([[0.4] * 8, [-0.4] * 8, [0.4] * 4 + [-0.4] * 4])
    rows = []
    vid = 0
    for rep in range(12):
        for b in range(3):
            v = centers[b] + rs.uniform(-0.02, 0.02, 8)
            rows.append({"vec_id": vid, "embedding": v.astype(np.float32).tolist()})
            vid += 1
    return rd.from_pandas(pd.DataFrame(rows)), centers


def test_kmeans_planted_blobs(ray_session):
    ds, centers = _blob_ds()
    out = kmeans_assign(ds, k=3, iters=3).to_pandas()
    # every blob's members share one cluster; blobs never merge
    out["blob"] = out["vec_id"] % 3
    by_blob = out.groupby("blob")["cluster"].nunique()
    assert (by_blob == 1).all()
    assert out.groupby("blob")["cluster"].first().nunique() == 3
    # seeds were one-per-blob, so cluster ids are the seed ids
    assert set(out["cluster"]) == {0, 1, 2}


def test_kmeans_empty_cluster_drops(ray_session):
    """Two identical seed vectors: the tie breaks to the lower cluster id,
    the other seed's cluster loses every member and drops out."""
    rs = np.random.RandomState(3)
    rows = [{"vec_id": 0, "embedding": np.full(8, 0.3, np.float32).tolist()},
            {"vec_id": 1, "embedding": np.full(8, 0.3, np.float32).tolist()},
            {"vec_id": 2, "embedding": np.full(8, -0.3, np.float32).tolist()}]
    for i in range(3, 30):
        base = 0.3 if i % 2 == 0 else -0.3
        rows.append({"vec_id": i, "embedding":
                     (base + rs.uniform(-0.01, 0.01, 8)).astype(np.float32).tolist()})
    out = kmeans_assign(rd.from_pandas(pd.DataFrame(rows)),
                        k=3, iters=2).to_pandas()
    assert set(out["cluster"]) == {0, 2}          # cluster 1 dropped
    assert (out.loc[out["vec_id"] == 1, "cluster"] == 0).all()


def test_semdedup_planted(ray_session):
    """Planted near-identical pair inside one blob: the farther-from-
    centroid twin drops; all singletons keep. Star-cap path (max_cluster
    exceeded) must agree with the full pairwise path when every dup pair
    involves the most-central member."""
    from knowledgeextraction_ray.stages.vectorops import semdedup
    rs = np.random.RandomState(5)
    rows = []
    for i in range(24):
        base = 0.4 if i % 2 == 0 else -0.4
        v = np.full(8, base) + rs.uniform(-0.15, 0.15, 8)
        rows.append({"vec_id": i, "embedding": v.astype(np.float32).tolist()})
    # twin pair: 100 is a copy of vec 0 with a tiny perturbation
    v0 = np.asarray(rows[0]["embedding"])
    rows.append({"vec_id": 100,
                 "embedding": (v0 + 0.001).astype(np.float32).tolist()})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = (semdedup(ds, k=2, iters=3, threshold_pct=99)
           .to_pandas().set_index("vec_id"))
    assert len(out) == 25
    # the twins share a cluster and at most one survives; if one survives
    # it is the more-central one (smaller (dist_sq, vec_id))
    pair = out.loc[[0, 100]].sort_values(["dist_sq", "vec_id"])
    assert pair["cluster"].nunique() == 1
    assert pair["keep"].iloc[1] == 0              # the farther twin drops
    # drops always have a more-central near-dup: the most central member
    # of every cluster can never drop
    most_central = out.sort_values(["dist_sq", "vec_id"]).groupby(
        "cluster", sort=False).head(1)
    assert most_central["keep"].eq(1).all()


def test_semdedup_star_cap_degrades_linearly(ray_session):
    """Oversized cluster → star comparison vs the most-central member:
    duplicates OF THE CENTER are still caught."""
    from knowledgeextraction_ray.stages.vectorops import semdedup
    rows = [{"vec_id": 0, "embedding": [0.3] * 8},
            {"vec_id": 1, "embedding": [0.3] * 8},       # dup of center
            {"vec_id": 2, "embedding": [0.3] * 4 + [-0.3] * 4}]
    for i in range(3, 12):
        rows.append({"vec_id": i,
                     "embedding": [0.3 if (i + j) % 2 else -0.3
                                   for j in range(8)]})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = (semdedup(ds, k=1, iters=1, threshold_pct=95, max_cluster=4)
           .to_pandas().set_index("vec_id"))
    assert out.loc[1, "keep"] == 0 or out.loc[0, "keep"] == 0
    assert out["keep"].sum() == len(out) - 1      # exactly one twin drops


def test_curation_semantic_join_path_equals_broadcast(ray_session,
                                                      corpus_ready, sf_dir):
    """Forcing the semantic layer through the bucketed-join fallback
    (broadcast_limit=0 ... the drop set can't materialize) must reproduce
    the broadcast verdict exactly."""
    from knowledgeextraction_ray.functions.tables import read_parquet_clean
    from knowledgeextraction_ray.pipelines.curation import (
        curation_semantic_pipeline)

    def build(**kw):
        return curation_semantic_pipeline(
            read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"]),
            read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"]), **kw
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    base = build()
    alt = build(broadcast_limit=0)
    cols = sorted(base.columns)
    assert base[cols].equals(alt[cols])
