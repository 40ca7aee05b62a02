"""Build the committed SentencePiece-style unigram vocab fixture.

Deterministic, run once, output committed at
``knowledgeextraction_ray/fixtures/sp_code.vocab`` (SentencePiece ``.vocab``
TSV format ``piece\\tscore``). Derivation: word frequencies from the first
2000 deterministic corpus files (preprocessed + lowered exactly as the
tokenizer will see them, ``▁``-prefixed), candidate pieces = all substrings
of length ≤ 8 (``▁`` only at position 0), unigram score = log relative
frequency. Selection: every single character seen (full coverage — Viterbi
always has a path) plus the top multi-char pieces by ``count·(len-1)``
(the marginal-savings heuristic). Scores get a tiny index-seeded epsilon so
no two pieces tie — the Viterbi tie-break rule then never fires.

Usage: ``python tools/build_sp_vocab.py`` (writes the fixture in place).
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knowledgeextraction_ray.corpus import generate_file          # noqa: E402
from knowledgeextraction_ray.functions.sptokenizer import (       # noqa: E402
    SPIECE_UNDERLINE, preprocess_text)

N_FILES = 2000
MAX_PIECE_LEN = 8
N_MULTI = 400

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "knowledgeextraction_ray", "fixtures", "sp_code.vocab")


def main() -> None:
    word_counts: Counter[str] = Counter()
    for j in range(N_FILES):
        text = preprocess_text(generate_file(j)["content"],
                               remove_space=True, lower=True)
        for w in text.split():
            word_counts[SPIECE_UNDERLINE + w] += 1

    piece_counts: Counter[str] = Counter()
    for w, c in word_counts.items():
        n = len(w)
        for a in range(n):
            # ▁ only at position 0: substrings starting past 0 begin at the
            # first real char
            if a == 0:
                for l in range(1, min(MAX_PIECE_LEN, n) + 1):
                    piece_counts[w[:l]] += c
            else:
                for l in range(1, min(MAX_PIECE_LEN, n - a) + 1):
                    piece_counts[w[a:a + l]] += c

    singles = sorted(p for p in piece_counts if len(p) == 1)
    multi = sorted((p for p in piece_counts if len(p) > 1),
                   key=lambda p: (-piece_counts[p] * (len(p) - 1), p))
    chosen = singles + multi[:N_MULTI]

    total = sum(piece_counts[p] for p in chosen)
    lines = []
    for k, p in enumerate(sorted(chosen,
                                 key=lambda p: (-piece_counts[p], p))):
        score = math.log(piece_counts[p] / total) - 1e-6 * k
        lines.append(f"{p}\t{score:.8f}")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} pieces to {OUT}")


if __name__ == "__main__":
    main()
