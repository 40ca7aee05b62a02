"""Char-level featurizer (reference M9) and its inverse (M10).

Reimplements the semantics of ``knowledgeextractor/utils/crf_utils.py:72-220``
(``convert_single_example``) for a code corpus:

- per-CHARACTER tokenization (the reference iterates raw text chars, not
  wordpieces — see the bug notes at ``crf_utils.py:112-148``),
- OOV char → ``[UNK]`` (``crf_utils.py:158-159``),
- truncate payload to ``max_seq_length - 2``, insert ``[CLS]`` and append
  ``[SEP]`` with label ``O``,
- zero-pad ids and mask to ``max_seq_length``; pad label is ``O``
  (``crf_utils.py:166-198``).

Vectorized: text → UTF-32 code points (``np.frombuffer`` over the fixed-width
encoding — one uint32 per CHARACTER, so ids stay aligned with char offsets for
non-ASCII text) → 128-entry lookup table; the whole batch becomes dense
``(N, L) int32`` arrays. Code points outside the vocab map to ``[UNK]``
one-to-one (never one-per-byte).
The inverse (``recover_words_tags``, ``utils/crf_processor.py:86-103``) strips
``[CLS]`` and cuts at the first ``[SEP]``.
"""

from __future__ import annotations

import numpy as np

PAD_ID, UNK_ID, CLS_ID, SEP_ID = 0, 1, 2, 3
_N_SPECIAL = 4

# printable ASCII vocabulary (code corpus); ids are stable by construction
_CHARS = [chr(c) for c in range(32, 127)] + ["\n", "\t"]
CHAR2ID = {c: i + _N_SPECIAL for i, c in enumerate(_CHARS)}
ID2CHAR = {i: c for c, i in CHAR2ID.items()}
VOCAB_SIZE = _N_SPECIAL + len(_CHARS)

# all vocab chars are < U+0080; anything above maps to UNK via the where()
_CP_LUT = np.full(128, UNK_ID, dtype=np.int32)
for _c, _i in CHAR2ID.items():
    _CP_LUT[ord(_c)] = _i


def featurize_text(text: str, max_seq_length: int):
    """One text → (input_ids, input_mask) of length max_seq_length."""
    payload = text[: max_seq_length - 2]
    cp = np.frombuffer(payload.encode("utf-32-le"), dtype=np.uint32)
    ids = np.where(cp < 128, _CP_LUT[cp & 127], UNK_ID).astype(np.int32)
    out = np.zeros(max_seq_length, dtype=np.int32)
    out[0] = CLS_ID
    out[1:1 + len(ids)] = ids
    out[1 + len(ids)] = SEP_ID
    mask = np.zeros(max_seq_length, dtype=np.int32)
    mask[: len(ids) + 2] = 1
    return out, mask


def featurize_batch(texts, max_seq_length: int):
    """Batch of texts → dense (N, L) int32 arrays (ids, mask, seq_len).

    seq_len counts payload chars only (excl. CLS/SEP), matching the slice the
    decoder applies when recovering tags.
    """
    n = len(texts)
    ids = np.zeros((n, max_seq_length), dtype=np.int32)
    mask = np.zeros((n, max_seq_length), dtype=np.int32)
    seq_len = np.zeros(n, dtype=np.int32)
    for i, t in enumerate(texts):
        ids[i], mask[i] = featurize_text(t, max_seq_length)
        seq_len[i] = min(len(t), max_seq_length - 2)
    return ids, mask, seq_len


def recover_text(input_ids) -> str:
    """Inverse of :func:`featurize_text`: strip [CLS], cut at first [SEP]
    (``crf_processor.py:86-103``). UNK renders as the replacement char."""
    chars = []
    for tid in input_ids[1:]:
        if tid == SEP_ID or tid == PAD_ID:
            break
        chars.append(ID2CHAR.get(int(tid), "�"))
    return "".join(chars)


def labels_to_ids(labels, label2id, max_seq_length: int) -> np.ndarray:
    """Per-char labels → padded id vector aligned with featurize_text: O at
    [CLS]/[SEP]/pad positions (pad label = O, ``crf_utils.py:190-196``)."""
    o_id = label2id["O"]
    out = np.full(max_seq_length, o_id, dtype=np.int32)
    for i, lab in enumerate(labels[: max_seq_length - 2]):
        out[i + 1] = label2id[lab]
    return out
