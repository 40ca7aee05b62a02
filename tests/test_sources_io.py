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
