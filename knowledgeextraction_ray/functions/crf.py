"""Linear-chain CRF kernels for transition training (reference train path).

The reference trains a CRF head on top of the ALBERT encoder:
``tf.contrib.crf.crf_log_likelihood(inputs=logits, tag_indices=labels,
transition_params=trans, sequence_lengths=lengths)`` with a learned
``[num_labels, num_labels]`` transition matrix
(``knowledgeextractor/nermodels/crf_albert.py:147-168``). This module is the
numpy restatement of those kernels over PAYLOAD-length sequences (no
CLS/SEP positions — the trainer operates on the raw char tags):

- :func:`viterbi_payload` — max-plus best-path decode, batch-vectorized the
  same way as ``stages/ner_scorer.viterbi_decode`` (one Python step per
  time position, ``(N, K, K)`` broadcast per step). Integer-valued
  emissions/transitions stay EXACT (max-plus never rounds), which is what
  lets the training run be value-hash gated.
- :func:`crf_nll` — the forward-algorithm negative log-likelihood, the
  direct ``crf_log_likelihood`` analog (float; monitoring/tests only — the
  gated training metrics are integer-exact by construction).
- :func:`bigram_counts` — per-cell transition bigram counts over a batch
  of tag sequences (the sufficient statistic of both perceptron updates
  and the CRF gradient's observed-count term).

Scalar reference implementations are kept as parity pins for the
vectorized forms (same convention as ``viterbi_decode_ref``).
"""

from __future__ import annotations

import numpy as np


def viterbi_payload_ref(emissions: np.ndarray, lens: np.ndarray,
                        transitions: np.ndarray) -> np.ndarray:
    """Readable per-row Viterbi over payload positions 0..len-1.

    Ties break to the LOWEST state index everywhere (numpy ``argmax``
    first-occurrence), which the batch form reproduces bit-for-bit."""
    n, L, K = emissions.shape
    tags = np.zeros((n, L), dtype=np.int8)
    for i in range(n):
        T = int(lens[i])
        if T == 0:
            continue
        s = emissions[i, 0, :].astype(np.float64).copy()
        bk = np.zeros((T, K), dtype=np.int8)
        for t in range(1, T):
            cand = s[:, None] + transitions
            bk[t] = cand.argmax(axis=0)
            s = cand.max(axis=0) + emissions[i, t, :]
        cur = int(s.argmax())
        for t in range(T - 1, -1, -1):
            tags[i, t] = cur
            if t > 0:
                cur = int(bk[t, cur])
    return tags


def viterbi_payload(emissions: np.ndarray, lens: np.ndarray,
                    transitions: np.ndarray) -> np.ndarray:
    """Batch-vectorized first-order Viterbi over (N, L, K) payload
    emissions → (N, L) tag ids; ≡ :func:`viterbi_payload_ref`
    (test-pinned). Rows freeze at their own length so padding never
    influences a path."""
    n, L, K = emissions.shape
    if n == 0:
        return np.zeros((0, L), dtype=np.int8)
    lens = np.minimum(np.asarray(lens, dtype=np.int64), L)
    Lmax = int(lens.max()) if len(lens) else 0
    if Lmax == 0:
        return np.zeros((n, L), dtype=np.int8)
    trans = np.asarray(transitions, dtype=np.float64)[None, :, :]
    s = emissions[:, 0, :].astype(np.float64).copy()
    bk = np.zeros((n, Lmax, K), dtype=np.int8)
    for t in range(1, Lmax):
        cand = s[:, :, None] + trans                   # (N, K, K)
        bk[:, t] = cand.argmax(axis=1)
        ns = cand.max(axis=1) + emissions[:, t, :]
        active = (t < lens)[:, None]
        s = np.where(active, ns, s)
    tags = np.zeros((n, L), dtype=np.int8)
    cur = s.argmax(axis=1)
    rows = np.arange(n)
    for t in range(Lmax - 1, -1, -1):
        at_end = lens - 1 == t
        inside = t < lens - 1
        if at_end.any():
            tags[at_end, t] = cur[at_end]
        if inside.any():
            prev = bk[rows, t + 1, cur]
            cur = np.where(inside, prev, cur)
            tags[inside, t] = cur[inside]
    return tags


def crf_nll_ref(emissions: np.ndarray, tags: np.ndarray, lens: np.ndarray,
                transitions: np.ndarray) -> np.ndarray:
    """Per-sequence forward-algorithm NLL (scalar reference): ``logZ -
    score(gold path)`` — the quantity ``crf_log_likelihood`` negates."""
    n, L, K = emissions.shape
    out = np.zeros(n, dtype=np.float64)
    for i in range(n):
        T = int(lens[i])
        if T == 0:
            continue
        alpha = emissions[i, 0, :].astype(np.float64).copy()
        for t in range(1, T):
            cand = alpha[:, None] + transitions        # (K, K)
            m = cand.max(axis=0)
            alpha = m + np.log(np.exp(cand - m[None, :]).sum(axis=0))
            alpha += emissions[i, t, :]
        m = alpha.max()
        logz = m + np.log(np.exp(alpha - m).sum())
        path = emissions[i, np.arange(T), tags[i, :T]].sum()
        path += transitions[tags[i, :T - 1], tags[i, 1:T]].sum()
        out[i] = logz - path
    return out


def crf_nll(emissions: np.ndarray, tags: np.ndarray, lens: np.ndarray,
            transitions: np.ndarray) -> np.ndarray:
    """Batch-vectorized :func:`crf_nll_ref`: one Python step per time
    position, ``(N, K, K)`` log-sum-exp broadcast per step."""
    n, L, K = emissions.shape
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    lens = np.minimum(np.asarray(lens, dtype=np.int64), L)
    Lmax = int(lens.max()) if len(lens) else 0
    trans = np.asarray(transitions, dtype=np.float64)[None, :, :]
    alpha = emissions[:, 0, :].astype(np.float64).copy()
    for t in range(1, Lmax):
        cand = alpha[:, :, None] + trans               # (N, K, K)
        m = cand.max(axis=1)                           # (N, K)
        na = m + np.log(np.exp(cand - m[:, None, :]).sum(axis=1))
        na = na + emissions[:, t, :]
        active = (t < lens)[:, None]
        alpha = np.where(active, na, alpha)
    m = alpha.max(axis=1)
    logz = m + np.log(np.exp(alpha - m[:, None]).sum(axis=1))
    # gold-path score: emissions at gold tags + transitions along the path
    pos = np.arange(L)[None, :]
    mask = pos < lens[:, None]
    rows = np.arange(n)[:, None]
    e_gold = np.where(mask, emissions[rows, pos, tags.astype(np.int64)], 0.0)
    pmask = pos[:, : L - 1] < (lens - 1)[:, None]
    t_gold = np.where(
        pmask,
        np.asarray(transitions, dtype=np.float64)[
            tags[:, : L - 1].astype(np.int64), tags[:, 1:].astype(np.int64)],
        0.0)
    path = e_gold.sum(axis=1) + t_gold.sum(axis=1)
    out = logz - path
    out[lens == 0] = 0.0
    return out


def bigram_counts(tags: np.ndarray, lens: np.ndarray, K: int) -> np.ndarray:
    """(K, K) int64 counts of consecutive tag pairs over a (N, L) batch,
    rows delimited by ``lens`` — fully vectorized (flatten pairs to
    ``i*K + j`` and ``bincount``)."""
    n, L = tags.shape
    if n == 0 or L < 2:
        return np.zeros((K, K), dtype=np.int64)
    lens = np.minimum(np.asarray(lens, dtype=np.int64), L)
    pos = np.arange(L - 1)[None, :]
    mask = pos < (lens - 1)[:, None]
    pairs = tags[:, :-1].astype(np.int64) * K + tags[:, 1:].astype(np.int64)
    flat = pairs[mask]
    return np.bincount(flat, minlength=K * K).reshape(K, K).astype(np.int64)


def crf_expected_counts_ref(emissions: np.ndarray, lens: np.ndarray,
                            transitions: np.ndarray) -> np.ndarray:
    """Readable per-sequence forward-backward: Σ over sequences and
    positions of the posterior bigram marginals ``P(y_t=u, y_{t+1}=v)`` —
    the model-expectation term of the CRF log-likelihood gradient
    (∂NLL/∂trans = expected − observed; ``crf_log_likelihood``'s gradient
    wrt ``transition_params``, crf_albert.py:147-168)."""
    n, L, K = emissions.shape
    out = np.zeros((K, K), dtype=np.float64)
    tr = np.asarray(transitions, dtype=np.float64)
    for i in range(n):
        T = int(lens[i])
        if T < 2:
            continue
        em = emissions[i, :T].astype(np.float64)
        alpha = np.zeros((T, K))
        alpha[0] = em[0]
        for t in range(1, T):
            cand = alpha[t - 1][:, None] + tr
            m = cand.max(axis=0)
            alpha[t] = m + np.log(np.exp(cand - m[None, :]).sum(axis=0)) \
                + em[t]
        beta = np.zeros((T, K))
        for t in range(T - 2, -1, -1):
            cand = tr + em[t + 1][None, :] + beta[t + 1][None, :]
            m = cand.max(axis=1)
            beta[t] = m + np.log(np.exp(cand - m[:, None]).sum(axis=1))
        m = alpha[T - 1].max()
        logz = m + np.log(np.exp(alpha[T - 1] - m).sum())
        for t in range(T - 1):
            lp = (alpha[t][:, None] + tr + em[t + 1][None, :]
                  + beta[t + 1][None, :] - logz)
            out += np.exp(lp)
    return out


def crf_expected_counts(emissions: np.ndarray, lens: np.ndarray,
                        transitions: np.ndarray) -> np.ndarray:
    """Batch-vectorized :func:`crf_expected_counts_ref`: one Python step
    per time position forward and backward, ``(N, K, K)`` broadcasts per
    step; rows freeze at their own length so padding never contributes.
    Accumulates the (K, K) expectation on the fly — never holds an
    (N, L, K, K) marginal tensor."""
    n, L, K = emissions.shape
    if n == 0:
        return np.zeros((K, K), dtype=np.float64)
    lens = np.minimum(np.asarray(lens, dtype=np.int64), L)
    Lmax = int(lens.max()) if len(lens) else 0
    if Lmax < 2:
        return np.zeros((K, K), dtype=np.float64)
    tr = np.asarray(transitions, dtype=np.float64)
    em = emissions.astype(np.float64)
    alphas = np.zeros((n, Lmax, K))
    alphas[:, 0] = em[:, 0]
    for t in range(1, Lmax):
        cand = alphas[:, t - 1][:, :, None] + tr[None, :, :]
        m = cand.max(axis=1)
        na = m + np.log(np.exp(cand - m[:, None, :]).sum(axis=1)) \
            + em[:, t]
        active = (t < lens)[:, None]
        alphas[:, t] = np.where(active, na, alphas[:, t - 1])
    rows = np.arange(n)
    last = alphas[rows, lens - 1]
    m = last.max(axis=1)
    logz = m + np.log(np.exp(last - m[:, None]).sum(axis=1))
    out = np.zeros((K, K), dtype=np.float64)
    beta = np.zeros((n, K))
    # walk t from Lmax-2 down; beta freezes outside [t+1 < len]; a row's
    # bigram (t, t+1) contributes only while t+1 < len
    for t in range(Lmax - 2, -1, -1):
        contrib = (t + 1) < lens                      # (n,)
        if contrib.any():
            lp = (alphas[:, t][:, :, None] + tr[None, :, :]
                  + em[:, t + 1][:, None, :] + beta[:, None, :]
                  - logz[:, None, None])
            out += np.exp(lp[contrib]).sum(axis=0)
            cand = tr[None, :, :] + em[:, t + 1][:, None, :] \
                + beta[:, None, :]
            mm = cand.max(axis=2)
            nb = mm + np.log(np.exp(cand - mm[:, :, None]).sum(axis=2))
            beta = np.where(contrib[:, None], nb, beta)
    return out
