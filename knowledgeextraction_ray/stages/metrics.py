"""Epoch accumulator metrics (SURVEY G9) over the seeded train stream.

The reference's training loop keeps RUNNING accumulators while iterating
the shuffled train set — ``loss += mle_loss * nums; corr += corrects;
num_tokens += nums`` printed per batch as ``loss / num_tokens`` and
``corr / num_tokens`` (``test/albertNER/ner.py:170-204``). No model trains
in this engine, so the per-doc loss/correct signals are md5-of-identity
stand-ins (CLAUDE.md technique: deterministic AND SQL-exact), but the
OPERATOR — running token-weighted accumulators over the seeded epoch
stream (T7/T8's permutation) — is the real G9 shape.

Distribution: a "step" is a KEY RANGE of the shuffle key (top
``step_bits`` bits), not a row count — uniform keys make steps
near-equal-sized while keeping the operator one shuffle-free partial
aggregation (per-batch (epoch, step) sums → ≤ blocks × 2^bits tiny rows →
driver combine + cumulative). Running ratios are INTEGER divisions of the
cumulative sums (scaled 1e6) so the DuckDB gate is bit-exact with no
float-rounding margin assumptions.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def md5int32(ids: np.ndarray, salt: str = "") -> np.ndarray:
    """First 8 hex chars of md5(str(id) + salt) as int64 — the same
    derivation DuckDB restates as ``('0x' || substr(md5(...), 1, 8))``."""
    return np.array([int(hashlib.md5((str(int(i)) + salt).encode())
                         .hexdigest()[:8], 16) for i in ids],
                    dtype=np.int64)


def epoch_train_metrics(ds, id_col: str = "doc_id",
                        text_col: str = "text", seed: int = 12345,
                        epochs: tuple = (0, 1),
                        step_bits: int = 6) -> pd.DataFrame:
    """→ per-(epoch, step) running accumulators:
    ``(epoch, step, n_docs, cum_tokens, cum_correct, cum_loss_tok_e6,
    running_acc_e6, running_loss_e6)`` — cumulative within each epoch in
    stream order, ratios as exact integer divisions."""
    from .sampling import shuffle_key64
    from .text_analysis import TOKEN_RE, _count

    shift = np.uint64(64 - step_bits)

    def partial(batch: pa.Table) -> pa.Table:
        n_tok = _count(batch[text_col], TOKEN_RE).to_numpy()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        correct = md5int32(ids) % (n_tok + 1)     # ≤ n_tokens by definition
        loss_e6 = 1000 + md5int32(ids, ":loss") % 9000
        frames = []
        for epoch in epochs:
            step = (shuffle_key64(ids, seed, epoch) >> shift).astype(
                np.int64)
            df = pd.DataFrame({
                "epoch": np.int64(epoch), "step": step, "n_docs": 1,
                "tok": n_tok, "corr": correct,
                "loss_tok": loss_e6 * n_tok})
            frames.append(df.groupby(["epoch", "step"], sort=False)
                          .sum().reset_index())
        out = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = (partials.groupby(["epoch", "step"], sort=True).sum()
         .reset_index().sort_values(["epoch", "step"]))
    for col in ("tok", "corr", "loss_tok", "n_docs"):
        g["cum_" + col] = g.groupby("epoch")[col].cumsum()
    return pd.DataFrame({
        "epoch": g["epoch"].astype("int64"),
        "step": g["step"].astype("int64"),
        "n_docs": g["n_docs"].astype("int64"),
        "cum_tokens": g["cum_tok"].astype("int64"),
        "cum_correct": g["cum_corr"].astype("int64"),
        "cum_loss_tok_e6": g["cum_loss_tok"].astype("int64"),
        "running_acc_e6": (g["cum_corr"] * 1_000_000
                           // g["cum_tok"]).astype("int64"),
        "running_loss_e6": (g["cum_loss_tok"]
                            // g["cum_tok"]).astype("int64"),
    }).reset_index(drop=True)
