"""DuckDB-compatible scaled-integer rounding.

The oracle-parity scheme sums ``round(value·scale)`` as int64 on BOTH sides.
DuckDB's ``round()`` is half-AWAY-FROM-ZERO (round(2.5)=3, round(-2.5)=-3)
while Arrow ``pc.round`` and ``np.rint`` default to half-to-even — an input
landing exactly on .5 after scaling would silently break the hash gate
(round-1 ADVICE). These helpers pin the half-away mode on the Ray side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def scaled_int64(col, scale: float) -> pa.Array:
    """Arrow column → round(col·scale) as int64, half away from zero."""
    return pc.cast(pc.round(pc.multiply(col, scale),
                            round_mode="half_towards_infinity"), pa.int64())


def scaled_int64_np(x: np.ndarray, scale: float) -> np.ndarray:
    """numpy version: sign-aware half-away rounding to int64."""
    s = np.asarray(x, dtype=np.float64) * scale
    return np.copysign(np.floor(np.abs(s) + 0.5), s).astype(np.int64)
