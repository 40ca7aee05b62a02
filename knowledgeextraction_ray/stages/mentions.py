"""BIO tag runs → mention rows (reference M10 + inverse of M4).

One segment row fans out to K mention rows: the conlleval chunking rules
(``functions/bio.bio_to_spans``) turn the per-char tag sequence back into
half-open char spans; offsets are re-based to GLOBAL file coordinates
(``offset + local``), undoing the segmenter's rebase (M3) so mentions address
the original ``content``.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.bio import bio_to_spans
from .ner_scorer import LABEL_LIST

MENTION_SCHEMA = pa.schema([
    ("guid", pa.string()),
    ("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
    ("lang", pa.string()), ("content_sha256", pa.string()),
    ("label", pa.string()),
    ("surface", pa.string()),
    ("start", pa.int32()), ("end", pa.int32()),
])


def recover_mentions(batch: pa.Table) -> pa.Table:
    """Stateless map_batches body: scored segments → mention rows."""
    out = {name: [] for name in MENTION_SCHEMA.names}
    texts = batch["text"].to_pylist()
    offsets = batch["offset"].to_pylist()
    tag_lists = batch["tag_ids"].to_pylist()
    prov = {c: batch[c].to_pylist()
            for c in ("guid", "repo", "path", "commit", "lang",
                      "content_sha256")}
    for i, (text, off, tag_ids) in enumerate(zip(texts, offsets, tag_lists)):
        labels = [LABEL_LIST[t] for t in tag_ids]
        for (typ, s, e) in bio_to_spans(labels):
            for c in prov:
                out[c].append(prov[c][i])
            out["label"].append(typ)
            out["surface"].append(text[s:e])
            out["start"].append(off + s)
            out["end"].append(off + e)
    return pa.Table.from_pydict(out, schema=MENTION_SCHEMA)


def mentions_dataset(ds):
    return ds.map_batches(recover_mentions, batch_format="pyarrow")
