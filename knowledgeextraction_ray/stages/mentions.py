"""BIO tag runs → mention rows (reference M10 + inverse of M4).

One segment row fans out to K mention rows: the conlleval chunking rules
(``functions/bio.bio_to_spans``) turn the per-char tag sequence back into
half-open char spans; offsets are re-based to GLOBAL file coordinates
(``offset + local``), undoing the segmenter's rebase (M3) so mentions address
the original ``content``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.bio import bio_to_spans  # noqa: F401  (string-path twin)
from .ner_scorer import LABEL_LIST

# label-id layout from functions.bio.label_vocab: 0=O, odd=TYPE-B, even=TYPE-I
_TYPE_OF_ID = np.array([0] + [(i + 1) // 2 for i in range(1, len(LABEL_LIST))],
                       dtype=np.int16)
_TYPE_NAME = ["O"] + [LABEL_LIST[2 * t - 1][:-2]
                      for t in range(1, (len(LABEL_LIST) + 1) // 2)]


def span_arrays_from_tag_ids(ids: np.ndarray):
    """Vectorized twin of ``bio_to_spans`` operating on int8 tag ids:
    → (type_indices, starts, ends) numpy arrays, conlleval chunk semantics.
    Parity with the string path is test-gated."""
    n = len(ids)
    if n == 0:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty, empty
    t = _TYPE_OF_ID[ids]
    is_b = (ids % 2 == 1)
    prev_t = np.empty_like(t)
    prev_t[0] = 0
    prev_t[1:] = t[:-1]
    # chunk starts: non-O and (B, or type differs from previous continuation)
    start_mask = (t != 0) & (is_b | (t != prev_t))
    # a B also terminates the previous chunk; so does any type change / O
    boundary = start_mask | (t == 0)
    starts = np.nonzero(start_mask)[0]
    bpos = np.nonzero(boundary)[0]
    # end of span starting at s = next boundary strictly after s (or n)
    idx = np.searchsorted(bpos, starts, side="right")
    ends = np.where(idx < len(bpos), bpos[np.minimum(idx, len(bpos) - 1)], n)
    return t[starts].astype(np.int64), starts, ends


def spans_from_tag_ids(ids: np.ndarray) -> list[tuple[int, int, int]]:
    """Tuple-list view of :func:`span_arrays_from_tag_ids` (parity tests)."""
    tis, starts, ends = span_arrays_from_tag_ids(ids)
    return [(int(a), int(b), int(c))
            for a, b, c in zip(tis, starts, ends)]

MENTION_SCHEMA = pa.schema([
    ("guid", pa.string()),
    ("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
    ("lang", pa.string()), ("content_sha256", pa.string()),
    ("label", pa.string()),
    ("surface", pa.string()),
    ("start", pa.int32()), ("end", pa.int32()),
])


def recover_mentions(batch: pa.Table) -> pa.Table:
    """Stateless map_batches body: scored segments → mention rows.

    Span recovery runs ONCE over the whole batch: all rows' tag ids are
    concatenated with an O separator (chunks can never cross the separator),
    spans are computed in one vectorized pass, and positions map back to
    rows via searchsorted — no per-row numpy call overhead."""
    texts = batch["text"].to_pylist()
    offsets = np.asarray(batch["offset"].to_pylist(), dtype=np.int64)
    n_rows = len(texts)
    if n_rows == 0:
        return pa.Table.from_pydict({c: [] for c in MENTION_SCHEMA.names},
                                    schema=MENTION_SCHEMA)
    # zero-copy flatten of the list<int8> column (to_pylist here would
    # materialize ~10^6 Python ints per block — measured 60% of stage time)
    tag_col = batch["tag_ids"].combine_chunks()
    flat = tag_col.values.to_numpy(zero_copy_only=False)
    offs = tag_col.offsets.to_numpy()
    lens = np.diff(offs).astype(np.int64)
    row_starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=row_starts[1:])      # +1 for the separator
    big = np.zeros(int(lens.sum() + n_rows), dtype=np.int8)
    # one vectorized scatter: value j of row i lands at row_starts[i] + j
    row_of_val = np.repeat(np.arange(n_rows), lens)
    target = (np.arange(len(flat), dtype=np.int64)
              - offs[:-1].astype(np.int64)[row_of_val]
              + row_starts[row_of_val])
    big[target] = flat
    tis, gs, ge = span_arrays_from_tag_ids(big)
    prov_cols = ("guid", "repo", "path", "commit", "lang", "content_sha256")
    if len(tis) == 0:
        return pa.Table.from_pydict({c: [] for c in MENTION_SCHEMA.names},
                                    schema=MENTION_SCHEMA)
    rows = np.searchsorted(row_starts, gs, side="right") - 1
    ls = gs - row_starts[rows]
    le = ge - row_starts[rows]
    take = pa.array(rows)
    out = {c: batch[c].take(take) for c in prov_cols}     # arrow C-side take
    out["label"] = pa.array(np.array(_TYPE_NAME, dtype=object)[tis],
                            pa.string())
    out["surface"] = pa.array(
        [texts[i][s:e] for i, s, e in zip(rows, ls, le)], pa.string())
    out["start"] = pa.array((offsets[rows] + ls).astype(np.int32))
    out["end"] = pa.array((offsets[rows] + le).astype(np.int32))
    return pa.Table.from_pydict(out, schema=MENTION_SCHEMA)


def mentions_dataset(ds):
    return ds.map_batches(recover_mentions, batch_format="pyarrow")
