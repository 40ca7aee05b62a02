"""Differential test: our ChunkCounts vs the reference's actual Perl
conlleval script (/root/reference/knowledgeextractor/utils/conlleval).

The Perl script expects PREFIX-style tags (``B-TYPE``); our labels use the
reference data's SUFFIX style (``TYPE-B``) — the test converts when writing
the eval file. Randomized noisy predictions across many sequences make this
a strong semantic-parity check of chunk extraction + P/R/F1 counting.
"""

import re
import subprocess

import numpy as np
import pytest

from knowledgeextraction_ray.functions.conlleval import ChunkCounts

PERL_SCRIPT = "/root/reference/knowledgeextractor/utils/conlleval"
TYPES = ["FUNC", "CALL", "IMPORT", "CLASS"]


def _random_tags(rs, n):
    """Random BIO sequence (suffix style) with plausible structure."""
    tags = []
    i = 0
    while i < n:
        if rs.rand() < 0.3:
            t = TYPES[rs.randint(len(TYPES))]
            span = rs.randint(1, 4)
            tags.append(f"{t}-B")
            for _ in range(min(span - 1, n - len(tags))):
                tags.append(f"{t}-I")
            i = len(tags)
        else:
            tags.append("O")
            i += 1
    return tags[:n]


def _corrupt(rs, tags, p):
    out = []
    for t in tags:
        r = rs.rand()
        if r < p * 0.4:
            out.append("O")                                   # dropped
        elif r < p * 0.7:
            typ = TYPES[rs.randint(len(TYPES))]
            out.append(f"{typ}-B")                            # spurious B
        elif r < p:
            if t != "O":
                typ = TYPES[rs.randint(len(TYPES))]
                out.append(f"{typ}-{t[-1]}")                  # type flip
            else:
                out.append(t)
        else:
            out.append(t)
    return out


def _to_prefix(tag):
    if tag == "O":
        return "O"
    typ, pos = tag.rsplit("-", 1)
    return f"{pos}-{typ}"


def _perl_metrics(pairs) -> dict:
    lines = []
    for gold, pred in pairs:
        for g, p in zip(gold, pred):
            lines.append(f"w {_to_prefix(g)} {_to_prefix(p)}")
        lines.append("")
    out = subprocess.run(["perl", PERL_SCRIPT], input="\n".join(lines),
                         capture_output=True, text=True, check=True).stdout
    m = re.search(r"accuracy:\s+([\d.]+)%;\s+precision:\s+([\d.]+)%;\s+"
                  r"recall:\s+([\d.]+)%;\s+FB1:\s+([\d.]+)", out)
    assert m, out
    return {"accuracy": float(m.group(1)), "precision": float(m.group(2)),
            "recall": float(m.group(3)), "f1": float(m.group(4))}


@pytest.mark.parametrize("seed,noise", [(1, 0.0), (2, 0.15), (3, 0.4)])
def test_chunkcounts_matches_perl_conlleval(seed, noise):
    rs = np.random.RandomState(seed)
    pairs = []
    cc = ChunkCounts()
    for _ in range(60):
        gold = _random_tags(rs, rs.randint(5, 40))
        pred = _corrupt(rs, gold, noise)
        pairs.append((gold, pred))
        cc.update(gold, pred)
    ours = cc.metrics()
    perl = _perl_metrics(pairs)
    assert round(ours["accuracy"] * 100, 2) == perl["accuracy"]
    assert round(ours["precision"] * 100, 2) == perl["precision"]
    assert round(ours["recall"] * 100, 2) == perl["recall"]
    assert round(ours["f1"] * 100, 2) == perl["f1"]
