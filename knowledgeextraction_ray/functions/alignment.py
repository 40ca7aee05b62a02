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
                                   4 * 1024 * 1024))
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
    band, i.e. the scalar-path second round).

    The forward pass walks ROWS, not anti-diagonals (r5): the in-row
    left-dependency ``f[i, j-1]`` resolves in one
    ``np.maximum.accumulate`` because row values are monotone in j
    (``f[i,j] = max(up, diag_cand, f[i,j-1])`` ⇒ each row is the running
    max of ``a[j] = max(up, diag_cand)``). That HALVES the Python-loop
    iterations (n rows vs n+m diagonals), reads up/diag as direct
    contiguous slices of one previous-row buffer (no reversed token
    mirror, no per-diagonal copies), and halves the choice-matrix
    footprint — so sub-batches stack ~2× more files per cell budget.
    Tables and backtrace remain bit-identical to the scalar DP
    (test-pinned)."""
    B = len(batch)
    ns = np.array([len(o) for o, _ in batch], dtype=np.int64)
    ms = np.array([len(t) for _, t in batch], dtype=np.int64)
    band = np.abs(ns - ms) + 5

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
    if width == 1:
        # every normalized char is a single codepoint → compare uint32
        # views instead of unicode strings (measured 3.7× faster; the hot
        # match compare is the kernel's largest C-side cost)
        na = na.view(np.uint32)
        tk = tk.view(np.uint32)

    # per-(row, file) band bounds in two broadcast ops: scalar row i scans
    # j ∈ [i - band, i + band - 1] ∩ [0, m-1]; rows ≥ n are inactive
    ii_col = np.arange(n_max, dtype=np.int64)[:, None]
    JLO = np.maximum(0, ii_col - band[None, :])            # (n_max, B)
    JHI = np.minimum(ms[None, :] - 1, ii_col + band[None, :] - 1)
    act = ii_col < ns[None, :]
    big = np.iinfo(np.int64).max
    JL = np.where(act & (JLO <= JHI), JLO, big).min(axis=1)   # (n_max,)
    JH = np.where(act & (JLO <= JHI), JHI, -1).max(axis=1)
    JL = np.where(JL == big, 0, JL)
    W = max(1, int((JH - JL).max()) + 1)

    # move codes SHIFTED by 2 vs the scalar path (1 = the scalar's -1
    # break): 1 = break, 2 = up, 3 = left, 4 = diag. Storage is
    # row-banded: (B, row, j - JL[row]); backtrace indexes via
    # (i, j - JL[i]) and detects out-of-band cells by BAND ARITHMETIC
    # (j within [i - band, i + band - 1] ∩ [0, m-1], i < n), so the
    # forward loop never masks the g write.
    Gb = np.zeros((B, n_max, W), dtype=np.int8)
    # previous/current row buffers indexed by j+1 (index 0 = the j == -1
    # sentinel, so diag = buf[:, j] and up = buf[:, j+1] need no masking)
    prev = np.zeros((B, m_max + 2), dtype=np.int32)
    curb = np.zeros((B, m_max + 2), dtype=np.int32)
    last = np.zeros(B, dtype=np.int32)
    capture: dict[int, list[int]] = {}
    for f, nf in enumerate(ns):
        capture.setdefault(int(nf) - 1, []).append(f)

    # rolling buffers hold zeros OUTSIDE their last write window — zero
    # only that window on reuse instead of the full (B, m_max+2) memset
    # (pre-building whole-sub-batch VALID/MATCH tensors measured ~45%
    # SLOWER than these per-row ops — the (n, B, W) temporaries cost more
    # memory traffic than the per-row windows they replace)
    win_prev = win_cur = (0, 0)
    one, two = np.int8(1), np.int8(2)
    three, four = np.int8(3), np.int8(4)
    for i in range(n_max):
        jl, jh = int(JL[i]), int(JH[i])
        w = jh - jl + 1
        curb[:, win_cur[0]:win_cur[1]] = 0
        win_cur = (0, 0)
        if jl <= jh:
            js = np.arange(jl, jh + 1)
            valid = (JLO[i][:, None] <= js) & (js <= JHI[i][:, None])
            up = prev[:, jl + 1:jh + 2]            # f[i-1, j]
            diag = prev[:, jl:jh + 1]              # f[i-1, j-1]
            match = na[:, i][:, None] == tk[:, jl:jh + 1]
            dgc = np.where(match, diag + 1, 0)
            a = np.where(valid, np.maximum(up, dgc), 0)
            F = np.maximum.accumulate(a, axis=1)   # = the row's f values
            leftv = np.empty_like(F)
            leftv[:, 0] = 0              # left of the window = stale zero
            leftv[:, 1:] = F[:, :-1]
            # dgc is 0 at non-match and max(up, leftv) ≥ 0, so the strict
            # > already implies match — no extra & needed
            use_d = dgc > np.maximum(up, leftv)
            base = one if i == 0 else two          # untaken row-0 = break
            g = np.where(use_d, four, np.where(leftv > up, three, base))
            curb[:, jl + 1:jh + 2] = np.where(valid, F, 0)
            win_cur = (jl + 1, jh + 2)
            Gb[:, i, :w] = g       # unmasked: backtrace breaks by band
        for f in capture.get(i, ()):               # capture f[n-1, m-1]
            last[f] = curb[f, ms[f]]
        prev, curb = curb, prev
        win_prev, win_cur = win_cur, win_prev

    # backtrace, vectorized ACROSS FILES like the forward pass (the
    # per-file Python walk measured as HALF the kernel): every eligible
    # file steps its (i, j) cursor in lockstep — one gather from the
    # row-banded choice matrix plus a handful of (B,) mask ops per step,
    # ≤ n+m steps total because each live step decreases i + j by at
    # least one. Move codes and the c <= 1 break are exactly the scalar
    # walk's.
    eligible = last > 0.8 * ns.astype(np.float64)
    o2c = np.full((B, n_max), -1, dtype=np.int32)
    c2o = np.full((B, m_max), -1, dtype=np.int32)
    bidx = np.arange(B)
    ii = ns - 1
    jj = ms - 1
    active = eligible & (ii >= 0) & (jj >= 0)
    while active.any():
        i_ = np.where(active, ii, 0)
        off = np.where(active, jj - JL[i_], 0)
        # out-of-band break by band arithmetic (the forward loop writes g
        # unmasked): the scalar walk breaks where no g entry exists, i.e.
        # outside j ∈ [i - band, i + band - 1]
        inb = (jj >= ii - band) & (jj < ii + band) & \
            (off >= 0) & (off < W)
        c = Gb[bidx, i_, np.where(inb, off, 0)]
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
