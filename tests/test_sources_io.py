"""Dataset-level source reader/writer tests (file I/O through Ray)."""

import os


def test_read_conll_dataset(tmp_path):
    from knowledgeextraction_ray.sources.conll import read_conll_dataset
    p = tmp_path / "sample.conll"
    p.write_text("John B-PER\nSmith I-PER\nworks O\n\nBerlin42 B-LOC\n",
                 encoding="utf-8")
    rows = read_conll_dataset(str(p)).to_pandas()
    assert len(rows) == 2
    r0 = rows.iloc[0]
    assert list(r0["tokens"]) == ["John", "Smith", "works"]
    assert list(r0["tags"]) == ["B-PER", "I-PER", "O"]
    # digit normalization applied on read (M8)
    assert rows.iloc[1]["tokens"][0] == "Berlin00"


def test_read_examples_dataset(tmp_path):
    from knowledgeextraction_ray.sources.jsonl import read_examples_dataset
    p = tmp_path / "examples.jsonl"
    p.write_text(
        '{"originalText":"abcdef","entities":[{"label_type":"T",'
        '"start_pos":1,"end_pos":3}]}\n'
        "not json at all\n"
        'prefix{"text":"xyz","entities":[]}suffix\n', encoding="utf-8")
    rows = read_examples_dataset(str(p)).to_pandas()
    assert len(rows) == 2                     # bad line skipped
    assert rows.iloc[0]["text"] == "abcdef"
    ent = rows.iloc[0]["entities"][0]
    assert (ent["label_type"], ent["start_pos"], ent["end_pos"]) == ("T", 1, 3)
    assert rows.iloc[1]["text"] == "xyz"      # brace-scrubbed line parsed


def test_read_squad_dataset(tmp_path):
    from knowledgeextraction_ray.sources.jsonl import read_squad_dataset
    p = tmp_path / "squad.jsonl"
    p.write_text(
        '{"context":"ctx text","qas":[{"id":"q1","question":"w?",'
        '"answers":[{"text":"ctx","answer_start":0}]},'
        '{"id":"q2","question":"x?","is_impossible":true}]}\n',
        encoding="utf-8")
    rows = read_squad_dataset(str(p)).to_pandas()
    assert len(rows) == 2                     # nested qas exploded (S5)
    assert set(rows["qas_id"]) == {"q1", "q2"}
    assert rows[rows["qas_id"] == "q2"].iloc[0]["is_impossible"]


def test_write_conlleval_file(tmp_path):
    from knowledgeextraction_ray.sources.conll import write_conlleval_file
    out = tmp_path / "eval.txt"
    write_conlleval_file(
        [(["a", "b"], ["B-X", "I-X"], ["B-X", "O"]),
         (["c"], ["O"], ["O"])], str(out))
    text = out.read_text(encoding="utf-8")
    assert text == ("1 a _ _ B-X B-X\n2 b _ _ I-X O\n\n"
                    "1 c _ _ O O\n\n")


def test_glove_loader_reference_parity(tmp_path):
    """S9 (chinese_CONLL.py:146-187): digit normalization, duplicate
    overwrite, dim check, lowercase-fallback vocab init."""
    import numpy as np
    import pytest

    from knowledgeextraction_ray.sources.embeddings import (
        construct_init_word_vecs, load_glove)
    p = tmp_path / "vec.txt"
    p.write_text("hello 1.0 2.0\n"
                 "\n"
                 "year2024 3.0 4.0\n"
                 "year2025 5.0 6.0\n"        # same normalized key: overwrites
                 "World 7.0 8.0\n")
    g = load_glove(str(p), 2)
    assert set(g) == {"hello", "year0000", "World"}
    assert list(g["year0000"]) == [5.0, 6.0]       # later line wins
    g2 = load_glove(str(p), 2, normalize_digits=False)
    assert "year2024" in g2 and "year2025" in g2
    bad = tmp_path / "bad.txt"
    bad.write_text("x 1.0 2.0 3.0\n")
    with pytest.raises(ValueError, match="Inconsistent word vector sizes"):
        load_glove(str(bad), 2)

    vocab = {"HELLO": 0, "World": 1, "missing": 2}
    vecs = np.full((3, 2), -1.0)
    construct_init_word_vecs(vocab, vecs, g)
    assert list(vecs[0]) == [1.0, 2.0]             # lowercase fallback hit
    assert list(vecs[1]) == [7.0, 8.0]             # direct hit
    assert list(vecs[2]) == [-1.0, -1.0]           # untouched


def test_glove_dataset_feeds_knn(tmp_path):
    """The glove Dataset adapter plugs into the ANN operator family."""
    import numpy as np

    from knowledgeextraction_ray.sources.embeddings import glove_dataset
    from knowledgeextraction_ray.stages.knn import knn_brute
    rs = np.random.RandomState(0)
    lines = []
    for i in range(30):
        v = rs.standard_normal(8)
        lines.append(f"w{i:03d} " + " ".join(f"{x:.6f}" for x in v))
    p = tmp_path / "glove.txt"
    p.write_text("\n".join(lines) + "\n")
    ds = glove_dataset(str(p), 8, normalize_digits=False)
    import pyarrow as pa

    def add_id(batch: pa.Table) -> pa.Table:
        ids = [int(w[1:]) for w in batch["word"].to_pylist()]
        return batch.append_column("vec_id", pa.array(ids, pa.int64()))
    out = knn_brute(ds.map_batches(add_id, batch_format="pyarrow"),
                    query_ids=[0, 1], k=5)
    assert len(out) == 10
    assert set(out["q_id"]) == {0, 1}
    assert sorted(out[out["q_id"] == 0]["rank"]) == [1, 2, 3, 4, 5]
    # a planted duplicate of w000 must be its top neighbour
    dup = lines[0].replace("w000", "w029", 1)
    p2 = tmp_path / "glove2.txt"
    p2.write_text("\n".join(lines[:29] + [dup]) + "\n")
    ds2 = glove_dataset(str(p2), 8,
                        normalize_digits=False).map_batches(
        add_id, batch_format="pyarrow")
    out2 = knn_brute(ds2, query_ids=[0], k=3)
    assert int(out2[out2["rank"] == 1]["neighbor_id"].iloc[0]) == 29


def test_glove_embedder_actor(tmp_path):
    import ray.data as rd

    from knowledgeextraction_ray.sources.embeddings import (GloveEmbedder,
                                                            broadcast_glove)
    p = tmp_path / "g.txt"
    p.write_text("Alpha 1.0 0.0\nbeta 0.0 1.0\n")
    ref = broadcast_glove(str(p), 2)
    ds = rd.from_items([{"word": "Alpha"}, {"word": "BETA"},
                        {"word": "gamma"}])
    out = ds.map_batches(GloveEmbedder,
                         fn_constructor_kwargs={"glove_ref": ref,
                                                "emb_dim": 2},
                         batch_format="pyarrow",
                         concurrency=(1, 2)).to_pandas()
    got = {w: list(e) for w, e in zip(out["word"], out["embedding"])}
    assert got["Alpha"] == [1.0, 0.0]
    assert got["BETA"] == [0.0, 1.0]               # lowercase fallback
    assert got["gamma"] == [0.0, 0.0]              # absent → zeros
