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

Vectorized: text → utf-8 bytes → 256-entry numpy lookup table, one
``np.take`` per row; the whole batch becomes dense ``(N, L) int32`` arrays.
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

_BYTE_LUT = np.full(256, UNK_ID, dtype=np.int32)
for _c, _i in CHAR2ID.items():
    _b = _c.encode("utf-8")
    if len(_b) == 1:
        _BYTE_LUT[_b[0]] = _i


def featurize_text(text: str, max_seq_length: int):
    """One text → (input_ids, input_mask) of length max_seq_length."""
    payload = text[: max_seq_length - 2]
    raw = np.frombuffer(payload.encode("utf-8", "replace"), dtype=np.uint8)
    ids = _BYTE_LUT[raw]  # non-ascii multibyte chars degrade to UNK runs
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
