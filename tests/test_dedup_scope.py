"""Block-scope dedup must equal global-scope dedup on the flagship corpus
(the partitioning invariant it relies on)."""

import pandas as pd


def test_block_scope_equals_global(corpus_ready):
    from knowledgeextraction_ray.pipelines.kg import (canonical_map_of,
                                                      linked_mentions)
    from knowledgeextraction_ray.stages.canonicalize import (
        canonicalize_dataset)
    from knowledgeextraction_ray.stages.triples import triples_dataset

    linked = linked_mentions(corpus_ready).materialize()
    cmap = canonical_map_of(canonicalize_dataset(linked))
    cols = ["subj", "pred", "obj", "repo", "path", "commit",
            "content_sha256", "n_mentions"]
    g = (triples_dataset(linked, cmap, scope="global").to_pandas()[cols]
         .sort_values(cols[:3], kind="mergesort").reset_index(drop=True))
    b = (triples_dataset(linked, cmap, scope="block").to_pandas()[cols]
         .sort_values(cols[:3], kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(g, b)


def test_joined_obj_resolution_equals_broadcast(corpus_ready):
    """The surface_norm hash-join obj resolution (scale path, no broadcast
    vocab) must produce the identical triple set to the broadcast-map path,
    and the distributed canonicalize combine must equal the driver combine."""
    from knowledgeextraction_ray.pipelines.kg import (canonical_map_of,
                                                      linked_mentions)
    from knowledgeextraction_ray.stages.canonicalize import (
        canonicalize_dataset)
    from knowledgeextraction_ray.stages.triples import (
        triples_dataset, triples_dataset_joined)

    linked = linked_mentions(corpus_ready).materialize()
    ccols = ["surface_norm", "entity_id", "prior", "n_mentions"]
    cd = (canonicalize_dataset(linked, combine="driver").to_pandas()[ccols]
          .sort_values("surface_norm").reset_index(drop=True))
    cx = (canonicalize_dataset(linked, combine="distributed")
          .to_pandas()[ccols].sort_values("surface_norm")
          .reset_index(drop=True))
    pd.testing.assert_frame_equal(cd, cx)

    canon = canonicalize_dataset(linked)
    cmap = canonical_map_of(canon)
    cols = ["subj", "pred", "obj", "repo", "path", "commit",
            "content_sha256", "n_mentions"]
    bc = (triples_dataset(linked, cmap, scope="global").to_pandas()[cols]
          .sort_values(cols[:3], kind="mergesort").reset_index(drop=True))
    jn = (triples_dataset_joined(linked, canon).to_pandas()[cols]
          .sort_values(cols[:3], kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(bc, jn)


def _mention_table(rows):
    import pyarrow as pa
    cols = ["repo", "path", "commit", "content_sha256", "label",
            "surface_norm", "entity_id"]
    return pa.Table.from_pydict({c: [r[i] for r in rows]
                                 for i, c in enumerate(cols)})


def test_block_scope_survives_midfile_block_split():
    """Dynamic block splitting can cut a file's mentions across two blocks
    (ADVICE r1): block scope must still emit exactly one row per triple key,
    with n_mentions summed across the split."""
    import ray.data as rd

    from knowledgeextraction_ray.stages.triples import triples_dataset

    f1 = ("repoA", "a.py", "c1", "sha1")
    f2 = ("repoA", "b.py", "c2", "sha2")
    f3 = ("repoB", "c.py", "c3", "sha3")
    # file f2 straddles the two blocks: same CALL utils triple on both sides
    blk1 = _mention_table([
        f1 + ("IMPORT", "utils", "e_utils"),
        f1 + ("IMPORT", "utils", "e_utils"),
        f2 + ("CALL", "utils", "e_utils"),
    ])
    blk2 = _mention_table([
        f2 + ("CALL", "utils", "e_utils"),
        f2 + ("FUNC", "run", "e_run"),
        f3 + ("CLASS", "Cfg", "e_cfg"),
    ])
    linked = rd.from_arrow([blk1, blk2])
    assert linked.num_blocks() == 2
    cols = ["subj", "pred", "obj", "repo", "path", "commit",
            "content_sha256", "n_mentions"]
    out = (triples_dataset(linked, {}, scope="block").to_pandas()[cols]
           .sort_values(cols[:3], kind="mergesort").reset_index(drop=True))
    glob = (triples_dataset(linked, {}, scope="global").to_pandas()[cols]
            .sort_values(cols[:3], kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, glob)
    straddle = out[(out.subj == "repoA:b.py") & (out.pred == "calls")]
    assert len(straddle) == 1 and straddle.n_mentions.iloc[0] == 2


def test_file_local_count_equals_bucketed(corpus_ready):
    """The shuffle-free file-local count must equal the bucketed groupby on
    the real mention stream (the q_mentions aggregation)."""
    from knowledgeextraction_ray.pipelines.kg import linked_mentions
    from knowledgeextraction_ray.stages.groupagg import (bucketed_agg,
                                                         file_local_count)
    keys = ["repo", "path", "label", "surface"]
    linked = linked_mentions(corpus_ready).materialize()
    a = (file_local_count(linked, keys).to_pandas()
         .sort_values(keys, kind="mergesort").reset_index(drop=True))
    b = (bucketed_agg(linked, keys, {}, count_alias="n").to_pandas()
         .sort_values(keys, kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(a[keys + ["n"]], b[keys + ["n"]])


def test_file_local_count_survives_midfile_block_split():
    """A file's rows cut across two blocks must still count as one key
    (straddler repair)."""
    import ray.data as rd

    from knowledgeextraction_ray.stages.groupagg import file_local_count
    f1 = ("repoA", "a.py", "c1", "sha1")
    f2 = ("repoA", "b.py", "c2", "sha2")
    f3 = ("repoB", "c.py", "c3", "sha3")
    blk1 = _mention_table([
        f1 + ("IMPORT", "utils", "e_utils"),
        f1 + ("IMPORT", "utils", "e_utils"),
        f2 + ("CALL", "utils", "e_utils"),
    ])
    blk2 = _mention_table([
        f2 + ("CALL", "utils", "e_utils"),
        f3 + ("CLASS", "Cfg", "e_cfg"),
    ])
    linked = rd.from_arrow([blk1, blk2])
    assert linked.num_blocks() == 2
    keys = ["repo", "path", "label", "surface_norm"]
    out = (file_local_count(linked, keys).to_pandas()
           .sort_values(keys, kind="mergesort").reset_index(drop=True))
    straddle = out[(out.path == "b.py")]
    assert len(straddle) == 1 and straddle.n.iloc[0] == 2
    assert out.n.sum() == 5 and len(out) == 3
