"""Corpus → segment rows (reference M1–M3, S1 guid convention).

One input file row fans out to N segment rows (``flat_map``-shaped, expressed
as a ``map_batches`` body that returns more rows than it consumes — cheaper
than per-row ``flat_map``). Every segment carries full provenance plus the
per-row invariant ``content_sha256 = sha256(content)`` computed ONCE here and
carried unchanged through every later stage (BASELINE.json input_hint).

guid convention: ``<content_sha256>:<seg_index>`` — the keyed replacement for
the reference's fragile positional zips (``eval_estimator.py:110-116``).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import SegmentConfig
from ..functions.hashing import sha256_hex
from ..functions.textseg import segment_text

SEGMENT_SCHEMA = pa.schema([
    ("guid", pa.string()),
    ("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
    ("lang", pa.string()), ("content_sha256", pa.string()),
    ("seg_index", pa.int32()), ("offset", pa.int32()),
    ("text", pa.string()),
])


class SegmentCorpus:
    """Stateless ``map_batches`` callable: corpus batch → segment batch."""

    def __init__(self, cfg: SegmentConfig | None = None, mode: str = "lines"):
        self.cfg = cfg or SegmentConfig()
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in SEGMENT_SCHEMA.names}
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        commits = batch["commit"].to_pylist()
        langs = batch["lang"].to_pylist()
        contents = batch["content"].to_pylist()
        for repo, path, commit, lang, content in zip(
                repos, paths, commits, langs, contents):
            sha = sha256_hex(content)
            segs = segment_text(content, self.cfg.max_payload,
                                self.cfg.min_sequence_length, self.mode)
            for i, (text, off) in enumerate(segs):
                out["guid"].append(f"{sha}:{i}")
                out["repo"].append(repo)
                out["path"].append(path)
                out["commit"].append(commit)
                out["lang"].append(lang)
                out["content_sha256"].append(sha)
                out["seg_index"].append(i)
                out["offset"].append(off)
                out["text"].append(text)
        return pa.Table.from_pydict(out, schema=SEGMENT_SCHEMA)


def segment_dataset(ds, cfg: SegmentConfig | None = None, mode: str = "lines"):
    """corpus Dataset → segment Dataset (streaming, zero-copy Arrow in)."""
    return ds.map_batches(SegmentCorpus(cfg, mode), batch_format="pyarrow")
