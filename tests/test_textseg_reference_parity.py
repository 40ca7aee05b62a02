"""Differential test: our ``to_sentences`` vs the reference's actual
``knowledgeextractor/utils/text_segment.py`` (pure-Python, imported by path),
over randomized CJK paragraphs with quotes, ellipses and punctuation runs."""

import importlib.util

import numpy as np
import pytest

from knowledgeextraction_ray.functions.textseg import to_sentences

REF = "/root/reference/knowledgeextractor/utils/text_segment.py"


def _load_reference():
    spec = importlib.util.spec_from_file_location("ref_text_segment", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_PIECES = ["今天", "天气好", "他说", "你好", "世界", "再见", "然后",
           "北京", "上海", " ", "ab3"]
_DELIMS = ["。", "，", "；", "？", "！", "……", "…", ""]
_QUOTES = ["“", "”", ""]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_to_sentences_matches_reference(seed):
    ref = _load_reference()
    rs = np.random.RandomState(seed)
    for _ in range(60):
        n = rs.randint(1, 14)
        s = "".join(
            _QUOTES[rs.randint(3)] + _PIECES[rs.randint(len(_PIECES))]
            + _DELIMS[rs.randint(len(_DELIMS))]
            for _ in range(n))
        assert to_sentences(s) == ref.to_sentences(s), repr(s)


def test_to_sentences_golden_cases():
    ref = _load_reference()
    cases = [
        "今天天气好。明天下雨，记得带伞！",
        "他说：“你好，世界”。再见。",
        "一……二……三",
        "只有一个省略号…不切分",
        "“未闭合的引号，后面，全部，并入",
    ]
    for c in cases:
        assert to_sentences(c) == ref.to_sentences(c), repr(c)
