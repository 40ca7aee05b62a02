"""Char ↔ token alignment for real (SentencePiece-style) tokenizers.

Clean-room restatement of the reference MRC featurizer's alignment core
(``utils/mrc_utils.py:116-244``): a subword tokenizer normalizes text
(case/accents/whitespace markers), so answer spans predicted in TOKEN space
must be mapped back to ORIGINAL char offsets through a banded
longest-common-subsequence between the original text and the concatenated
token text:

- :func:`lcs_alignment` — the banded LCS (band ``|n-m|+5``, doubled once if
  the match ratio stays below 0.8·n; two rounds max, exactly the reference
  loop) with backtrace into ``orig_to_chartok`` / ``chartok_to_orig`` maps,
  and the reference's MISMATCH failure mode (``None`` when the common
  subsequence stays under 80% — the caller emits zero features for the
  example, ``mrc_utils.py:216-230``).
- :func:`convert_index` — ``_convert_index`` parity: resolve an unaligned
  position to the nearest aligned neighbor with the reference's start/end
  asymmetry.
- :func:`token_to_orig_maps` — the full pipeline: token list → chartok
  bookkeeping (SPIECE underline → space) → LCS → per-token
  ``tok_start_to_orig_index`` / ``tok_end_to_orig_index``.

The char-level flagship featurizer doesn't need any of this (its maps are
identity); these functions are the drop-in requirement for plugging a real
sentencepiece tokenizer into ``stages/mrc.py``.
"""

from __future__ import annotations

import os
import unicodedata

import numpy as np

SPIECE_UNDERLINE = "▁"


def default_char_match(a: str, b: str) -> bool:
    """Reference match rule analog: compare the original char after
    NFKD normalization + accent strip (``tokenization.preprocess_text`` on
    a single char with ``lower=False``) against the token-text char."""
    na = "".join(c for c in unicodedata.normalize("NFKD", a)
                 if not unicodedata.combining(c))
    return na == b


def lcs_alignment(orig_text: str, tok_cat_text: str, match_fn=None,
                  _return_tables: bool = False):
    """Banded LCS between ``orig_text`` (len n) and ``tok_cat_text``
    (len m) → ``(orig_to_chartok, chartok_to_orig)`` position maps
    (``None`` at unaligned positions), or ``None`` on the reference's
    mismatch bail-out (LCS < 0.8·n after both band rounds, or no aligned
    char at all). ``_return_tables`` short-circuits after the band loop and
    returns the raw ``(f, g)`` DP tables — the differential-test hook that
    lets ``tests/test_token_mrc.py`` compare them cell-for-cell against the
    reference's own ``_lcs_match`` (AST-extracted)."""
    match_fn = match_fn or default_char_match
    n, m = len(orig_text), len(tok_cat_text)
    if n == 0 or m == 0:
        return None
    f = np.zeros((n, m), dtype=np.float32)
    g: dict[tuple[int, int], int] = {}

    def _lcs_match(max_dist: int) -> None:
        f.fill(0)
        g.clear()
        for i in range(n):
            # banded: subword/original mismatch stays local, so only a
            # diagonal band is evaluated (reference optimization note)
            for j in range(i - max_dist, i + max_dist):
                if j >= m or j < 0:
                    continue
                if i > 0:
                    g[(i, j)] = 0
                    f[i, j] = f[i - 1, j]
                if j > 0 and f[i, j - 1] > f[i, j]:
                    g[(i, j)] = 1
                    f[i, j] = f[i, j - 1]
                f_prev = f[i - 1, j - 1] if i > 0 and j > 0 else 0
                if match_fn(orig_text[i], tok_cat_text[j]) and \
                        f_prev + 1 > f[i, j]:
                    g[(i, j)] = 2
                    f[i, j] = f_prev + 1

    max_dist = abs(n - m) + 5
    for _ in range(2):
        _lcs_match(max_dist)
        if f[n - 1, m - 1] > 0.8 * n:
            break
        max_dist *= 2
    if _return_tables:
        return f, dict(g)

    orig_to_chartok: list[int | None] = [None] * n
    chartok_to_orig: list[int | None] = [None] * m
    i, j = n - 1, m - 1
    while i >= 0 and j >= 0:
        if (i, j) not in g:
            break
        if g[(i, j)] == 2:
            orig_to_chartok[i] = j
            chartok_to_orig[j] = i
            i, j = i - 1, j - 1
        elif g[(i, j)] == 1:
            j -= 1
        else:
            i -= 1
    if all(v is None for v in orig_to_chartok) or \
            f[n - 1, m - 1] < 0.8 * n:
        return None                               # MISMATCH → zero features
    return orig_to_chartok, chartok_to_orig


def lcs_alignment_fast(orig_text: str, tok_cat_text: str):
    """Anti-diagonal vectorization of :func:`lcs_alignment` (default match
    rule only) — EXACTLY the same f/g tables and backtrace, test-pinned.

    The scalar banded DP is O(n·band) Python-loop iterations per document —
    unusable as a per-file pipeline stage. On anti-diagonal ``d = i + j``
    every in-band cell depends only on diagonals ``d-1`` (up, left) and
    ``d-2`` (diag), so each diagonal is one numpy slice op; the scalar
    code's priority order (up, then left if strictly greater, then
    diag+1 if strictly greater) is reproduced with vector ``where``s and
    the identical backtrace runs over the dense int8 choice matrix.
    f values are small integers, so int32 here ≡ the scalar's float32."""
    n, m = len(orig_text), len(tok_cat_text)
    if n == 0 or m == 0:
        return None
    # one normalization pass over the original text (the scalar path calls
    # default_char_match per CELL — n·band normalizations)
    na = _norm_chars(orig_text)
    tk = np.array(list(tok_cat_text))

    max_dist = abs(n - m) + 5
    for _ in range(2):
        G = np.full((n, m), -1, dtype=np.int8)
        Gf = G.ravel()
        step = m - 1                           # diagonal stride in raveled G
        # rolling diagonals with a leading sentinel 0 (index i+1 = row i),
        # so the up/diag reads for row 0 cost no masking
        fm1 = np.zeros(n + 1, dtype=np.int32)  # diagonal d-1
        fm2 = np.zeros(n + 1, dtype=np.int32)  # diagonal d-2
        cur = np.zeros(n + 1, dtype=np.int32)
        for d in range(n + m - 1):
            i_lo = max(0, d - m + 1, -((max_dist - 1 - d) // 2))
            i_hi = min(n - 1, d, (d + max_dist) // 2)
            cur.fill(0)
            if i_lo <= i_hi:
                up = fm1[i_lo:i_hi + 1]                     # f[i-1, j]
                left = fm1[i_lo + 1:i_hi + 2].copy()        # f[i, j-1]
                diag = fm2[i_lo:i_hi + 1].copy()            # f[i-1, j-1]
                if i_hi == d:                               # j == 0 element
                    left[-1] = 0
                    diag[-1] = 0
                g = np.zeros(i_hi - i_lo + 1, dtype=np.int8)
                if i_lo == 0:                               # i == 0 element
                    g[0] = -1
                f0 = up.astype(np.int32)
                if i_lo == 0:
                    f0[0] = 0
                use_l = left > f0
                f1 = np.where(use_l, left, f0)
                g[use_l] = 1
                match = na[i_lo:i_hi + 1] == tk[d - i_hi:d - i_lo + 1][::-1]
                use_d = match & (diag + 1 > f1)
                g[use_d] = 2
                cur[i_lo + 1:i_hi + 2] = np.where(use_d, diag + 1, f1)
                if step > 0:
                    Gf[d + i_lo * step:d + (i_hi + 1) * step:step] = g
                else:       # m == 1: j ≡ 0, one cell per diagonal at i == d
                    Gf[d] = g[0]
            fm2, fm1, cur = fm1, cur, fm2
        last = int(fm1[n])                     # f[n-1, m-1]
        if last > 0.8 * n:
            break
        max_dist *= 2

    orig_to_chartok: list = [None] * n
    chartok_to_orig: list = [None] * m
    i, j = n - 1, m - 1
    while i >= 0 and j >= 0:
        c = G[i, j]
        if c == -1:
            break
        if c == 2:
            orig_to_chartok[i] = j
            chartok_to_orig[j] = i
            i, j = i - 1, j - 1
        elif c == 1:
            j -= 1
        else:
            i -= 1
    if all(v is None for v in orig_to_chartok) or last < 0.8 * n:
        return None
    return orig_to_chartok, chartok_to_orig


def _norm_chars(text: str) -> np.ndarray:
    """Per-char NFKD+strip-combining array (the match rule's left side).
    ASCII fast path: normalization is the identity, so skip the per-char
    Python loop that otherwise costs ~1 µs/char."""
    if text.isascii():
        return np.array(list(text))
    return np.array(["".join(c for c in unicodedata.normalize("NFKD", ch)
                             if not unicodedata.combining(c))
                     for ch in text])


def lcs_alignment_fast_batch(pairs):
    """Batched :func:`lcs_alignment_fast`: one anti-diagonal DP loop for a
    whole LIST of (orig_text, tok_cat_text) pairs — identical tables and
    backtrace per pair (test-pinned against the scalar DP).

    Why: the per-file fast path still runs ~n+m Python-loop diagonals of
    tiny numpy ops per document (~25 ms/file on corpus-shaped text) and
    dominated the token-MRC pipeline. Stacking B files turns each diagonal
    into ops on (B, width) arrays — the Python overhead amortizes across
    the batch while the C work stays trivial. Pairs are processed in
    length-sorted sub-batches (padding waste bounded, ~128 MB of
    match/choice matrices per sub-batch); a pair whose FIRST band round
    misses the 0.8·n bar falls back to :func:`lcs_alignment_fast` for the
    reference's band-doubling second round (rare — identical semantics, the
    first round is deterministic either way).

    Returns a list aligned with ``pairs``: each element the
    ``(orig_to_chartok, chartok_to_orig)`` maps or ``None`` (mismatch /
    empty input)."""
    out: list = [None] * len(pairs)
    order = sorted((i for i, (o, t) in enumerate(pairs) if o and t),
                   key=lambda i: len(pairs[i][0]) + len(pairs[i][1]))
    # per-sub-batch padded-cell budget (int8 choice matrix = this many
    # bytes): bounds memory AND the union band width across stacked files
    # (a wider union means every diagonal op touches more dead cells) —
    # 8M measured fastest on corpus-shaped files both for the dense r3
    # storage and the banded r4 storage (1.5 ms/file; 2M ~13% and 32M
    # ~35% slower — the kernel is memory-bandwidth-bound, so bigger
    # fused sub-batches trade loop overhead for cache misses ~evenly,
    # while the banded layout cuts footprint ~5× per file)
    MAX_CELLS = int(os.environ.get("KGRAY_LCS_BATCH_CELLS",
                                   8 * 1024 * 1024))
    pos = 0
    while pos < len(order):
        # grow the sub-batch until the padded cell budget is hit — cells
        # estimated for the BANDED choice matrix (B × diagonals × union
        # band width), the r4 storage: ~5× less memory per file than the
        # dense n×m matrix on corpus-shaped text, so sub-batches are ~5×
        # larger and the per-diagonal Python overhead amortizes further
        end = pos
        n_max = m_max = 1
        band_max = 6
        while end < len(order):
            o, t = pairs[order[end]]
            nn, mm = max(n_max, len(o)), max(m_max, len(t))
            bb = max(band_max, abs(len(o) - len(t)) + 7)
            if (end - pos + 1) * (nn + mm) * bb > MAX_CELLS and end > pos:
                break
            n_max, m_max, band_max = nn, mm, bb
            end += 1
        idxs = order[pos:end]
        pos = end
        for i, al in zip(idxs, _lcs_batch_round1(
                [pairs[i] for i in idxs], n_max, m_max)):
            out[i] = al if al != "fallback" else \
                lcs_alignment_fast(*pairs[i])
    return out


def _lcs_batch_round1(batch, n_max: int, m_max: int):
    """First band round of the DP for ``batch`` pairs, padded to
    (n_max, m_max). Yields per pair: the alignment maps, ``None``
    (mismatch), or ``"fallback"`` (0.8·n bar missed — needs the doubled
    band, i.e. the scalar-path second round)."""
    B = len(batch)
    ns = np.array([len(o) for o, _ in batch], dtype=np.int64)
    ms = np.array([len(t) for _, t in batch], dtype=np.int64)
    band = np.abs(ns - ms) + 5
    d_last = ns + ms - 2

    norms = [_norm_chars(o) for o, _ in batch]
    # fixed-width unicode dtype (NOT object — object == is a Python call
    # per cell) wide enough for the longest NFKD decomposition in the batch;
    # np.zeros = calloc (np.full of -1/sentinels measured 60% of the whole
    # kernel) — '' padding can only "match" '' and those cells are
    # band-masked anyway
    width = max(1, max(a.dtype.itemsize // 4 for a in norms))
    na = np.zeros((B, n_max), dtype=f"<U{width}")
    tk = np.zeros((B, m_max), dtype="<U1")
    for f, ((_, t), a) in enumerate(zip(batch, norms)):
        na[f, :len(a)] = a
        tk[f, :len(t)] = list(t)
    # match is evaluated per diagonal on the band slice only (a full
    # B×n×m match matrix costs ~13× the band's comparisons)

    # move codes SHIFTED by 2 vs the scalar path (0 = never-written =
    # out-of-band = the scalar's -1 break) so G can be calloc'd:
    # 1 = break, 2 = up, 3 = left, 4 = diag.
    # Storage is BANDED (r4): (B, diagonal, i - GLO[diagonal]) — only
    # in-band cells exist, writes are contiguous per diagonal (the dense
    # (B, n, m) scatter was strided), and the smaller footprint lets the
    # caller stack ~5× more files per sub-batch. Allocated after the band
    # bounds below; backtrace indexes via (i+j, i - GLO[i+j]).
    fm1 = np.zeros((B, n_max + 1), dtype=np.int32)
    fm2 = np.zeros((B, n_max + 1), dtype=np.int32)
    cur = np.zeros((B, n_max + 1), dtype=np.int32)
    last = np.zeros(B, dtype=np.int32)

    # per-file band bounds for EVERY diagonal in two broadcast ops (the
    # per-diagonal vector math was ~40% of the loop's ufunc-call overhead)
    D = int(d_last.max()) + 1
    dd = np.arange(D, dtype=np.int64)[:, None]
    ILO = np.maximum(np.maximum(0, dd - ms + 1), -((band - 1 - dd) // 2))
    IHI = np.minimum(np.minimum(ns - 1, dd), (dd + band) // 2)
    GLO = ILO.min(axis=1)
    GHI = IHI.max(axis=1)
    W = max(1, int((GHI - GLO).max()) + 1)
    Gb = np.zeros((B, D, W), dtype=np.int8)
    capture: dict[int, list[int]] = {}
    for f, dl in enumerate(d_last):
        capture.setdefault(int(dl), []).append(f)

    # pre-reversed token matrix: the anti-diagonal's j indices DESCEND as i
    # ascends, so the natural slice needs a [::-1] stride — comparing
    # against tkr's contiguous mirror slice instead keeps the hot compare
    # on unit stride (tkr[:, m_max-1-j] == tk[:, j])
    tkr = tk[:, ::-1].copy()

    # rolling buffers hold zeros OUTSIDE their last write window — zero
    # only that window on reuse instead of the full (B, n_max+1) memset
    # per diagonal (~n_max/band × the useful traffic)
    win1 = win2 = winc = (0, 0)
    two, three, four = np.int8(2), np.int8(3), np.int8(4)
    for d in range(D):
        i_lo_f, i_hi_f = ILO[d], IHI[d]
        gi_lo = int(GLO[d])
        gi_hi = int(GHI[d])
        cur[:, winc[0]:winc[1]] = 0
        winc = (0, 0)
        if gi_lo <= gi_hi:
            gi = np.arange(gi_lo, gi_hi + 1)
            valid = (i_lo_f[:, None] <= gi) & (gi <= i_hi_f[:, None])
            up = fm1[:, gi_lo:gi_hi + 1]
            if gi_hi == d:                     # the j == 0 element needs
                left = fm1[:, gi_lo + 1:gi_hi + 2].copy()   # an edit —
                diag = fm2[:, gi_lo:gi_hi + 1].copy()       # copy only then
                left[:, -1] = 0
                diag[:, -1] = 0
            else:
                left = fm1[:, gi_lo + 1:gi_hi + 2]
                diag = fm2[:, gi_lo:gi_hi + 1]
            # anti-diagonal band slice: na[f, i] vs tk[f, d - i], read from
            # the contiguous mirror
            match = na[:, gi_lo:gi_hi + 1] == \
                tkr[:, m_max - 1 - d + gi_lo:m_max - d + gi_hi]
            if gi_lo == 0:                     # the i == 0 element: f0 = 0
                f0 = up.astype(np.int32)       # (copy: column 0 edited)
                f0[:, 0] = 0
            else:
                f0 = up                        # read-only — no copy
            use_l = left > f0
            f1 = np.where(use_l, left, f0)
            use_d = match & (diag + 1 > f1)
            g = np.where(use_d, four, np.where(use_l, three, two))
            if gi_lo == 0:                     # untaken i == 0 = break
                g[:, 0] = np.where(use_d[:, 0], four,
                                   np.where(use_l[:, 0], three, np.int8(1)))
            res = np.where(use_d, diag + 1, f1)
            cur[:, gi_lo + 1:gi_hi + 2] = np.where(valid, res, 0)
            winc = (gi_lo + 1, gi_hi + 2)
            Gb[:, d, :gi_hi - gi_lo + 1] = np.where(valid, g, 0)
        for f in capture.get(d, ()):           # capture f[n-1, m-1]
            last[f] = cur[f, ns[f]]
        fm2, fm1, cur = fm1, cur, fm2
        win2, win1, winc = win1, winc, win2

    # backtrace, vectorized ACROSS FILES like the forward pass (the per-file
    # Python walk measured as HALF the kernel): every eligible file steps
    # its (i, j) cursor in lockstep — one gather from the banded choice
    # matrix plus a handful of (B,) mask ops per step, ≤ D steps total
    # because each live step decreases i + j by at least one. Move codes
    # and the c <= 1 break are exactly the scalar walk's.
    eligible = last > 0.8 * ns.astype(np.float64)
    o2c = np.full((B, n_max), -1, dtype=np.int32)
    c2o = np.full((B, m_max), -1, dtype=np.int32)
    bidx = np.arange(B)
    ii = ns - 1
    jj = ms - 1
    active = eligible & (ii >= 0) & (jj >= 0)
    while active.any():
        d = np.where(active, ii + jj, 0)
        off = np.where(active, ii - GLO[d], 0)
        inb = (off >= 0) & (off < W)
        c = Gb[bidx, d, np.where(inb, off, 0)]
        live = active & inb & (c > 1)          # untouched / explicit break
        m4 = live & (c == 4)
        if m4.any():
            f4 = np.nonzero(m4)[0]
            o2c[f4, ii[f4]] = jj[f4]
            c2o[f4, jj[f4]] = ii[f4]
        ii = ii - (m4 | (live & (c == 2)))
        jj = jj - (m4 | (live & (c == 3)))
        active = live & (ii >= 0) & (jj >= 0)

    results = []
    for f in range(B):
        if not eligible[f]:
            results.append("fallback")
            continue
        n, m = int(ns[f]), int(ms[f])
        row = o2c[f, :n]
        hits = np.nonzero(row >= 0)[0]
        if hits.size == 0:
            results.append(None)
            continue
        orig_to_chartok: list = [None] * n
        chartok_to_orig: list = [None] * m
        for i_, j_ in zip(hits.tolist(), row[hits].tolist()):
            orig_to_chartok[i_] = j_
            chartok_to_orig[j_] = i_
        results.append((orig_to_chartok, chartok_to_orig))
    return results


def convert_index(index: list, pos: int, m: int | None = None,
                  is_start: bool = True) -> int:
    """``_convert_index`` (``mrc_utils.py:43-76``): nearest aligned
    neighbor with start/end-asymmetric interpolation."""
    if index[pos] is not None:
        return index[pos]
    n = len(index)
    rear = pos
    while rear < n - 1 and index[rear] is None:
        rear += 1
    front = pos
    while front > 0 and index[front] is None:
        front -= 1
    assert index[front] is not None or index[rear] is not None
    if index[front] is None:
        if index[rear] >= 1:
            return 0 if is_start else index[rear] - 1
        return index[rear]
    if index[rear] is None:
        if m is not None and index[front] < m - 1:
            return index[front] + 1 if is_start else m - 1
        return index[front]
    if is_start:
        if index[rear] > index[front] + 1:
            return index[front] + 1
        return index[rear]
    if index[front] < index[rear] - 1:
        return index[rear] - 1
    return index[front]


def _token_maps_from_alignment(para_tokens: list[str], n: int,
                               chartok_to_orig: list):
    """chartok bookkeeping (SPIECE underline → space) + ``convert_index``
    resolution — the non-LCS half of :func:`token_to_orig_maps`, shared by
    the single and batched paths."""
    tok_start_to_chartok: list[int] = []
    tok_end_to_chartok: list[int] = []
    char_cnt = 0
    for token in para_tokens:
        new_token = token.replace(SPIECE_UNDERLINE, " ")
        tok_start_to_chartok.append(char_cnt)
        char_cnt += len(new_token)
        tok_end_to_chartok.append(char_cnt - 1)
    starts, ends = [], []
    for i in range(len(para_tokens)):
        starts.append(convert_index(chartok_to_orig,
                                    tok_start_to_chartok[i], n,
                                    is_start=True))
        ends.append(convert_index(chartok_to_orig, tok_end_to_chartok[i], n,
                                  is_start=False))
    return starts, ends


def tok_cat_of(para_tokens: list[str]) -> str:
    """The LCS right-hand side: concatenated token text, marker → space."""
    return "".join(para_tokens).replace(SPIECE_UNDERLINE, " ")


def token_to_orig_maps(para_tokens: list[str], paragraph_text: str,
                       match_fn=None):
    """Token list → per-token original-char span maps
    ``(tok_start_to_orig_index, tok_end_to_orig_index)``; ``None`` on the
    LCS mismatch bail-out (caller emits no features —
    ``mrc_utils.py:140-244``)."""
    tok_cat_text = tok_cat_of(para_tokens)
    al = lcs_alignment_fast(paragraph_text, tok_cat_text) \
        if match_fn is None else \
        lcs_alignment(paragraph_text, tok_cat_text, match_fn)
    if al is None:
        return None
    return _token_maps_from_alignment(para_tokens, len(paragraph_text),
                                      al[1])


def token_to_orig_maps_batch(items: list):
    """Batched :func:`token_to_orig_maps` over ``(para_tokens,
    paragraph_text)`` items — the LCS runs through
    :func:`lcs_alignment_fast_batch`, everything else is identical."""
    als = lcs_alignment_fast_batch(
        [(text, tok_cat_of(toks)) for toks, text in items])
    return [None if al is None else
            _token_maps_from_alignment(toks, len(text), al[1])
            for (toks, text), al in zip(items, als)]
