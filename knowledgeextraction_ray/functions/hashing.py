"""Content hashing / partitioning helpers.

The per-row invariant (BASELINE.json input_hint) is ``sha256(content)``
equality between input rows and every derived output row; partitioning of the
triple output is by a stable hash of the subject.
"""

from __future__ import annotations

from hashlib import sha256

import numpy as np
import pyarrow as pa


def sha256_hex(s: str) -> str:
    return sha256(s.encode("utf-8")).hexdigest()


def sha256_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """sha256 hex digest of every string in an Arrow column.

    hashlib releases the GIL and runs at C speed; a Python loop over the
    (already-decoded) strings is the practical fast path — there is no
    pyarrow.compute sha kernel.
    """
    vals = col.to_pylist() if isinstance(col, (pa.ChunkedArray, pa.Array)) else col
    return pa.array([sha256(v.encode("utf-8")).hexdigest() for v in vals],
                    type=pa.string())


def stable_hash64(values: list[str]) -> np.ndarray:
    """Stable (process-independent) 63-bit hash per string — first 8 bytes of
    sha256. Used for partition assignment and salting, never compared to SQL."""
    out = np.empty(len(values), dtype=np.int64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(sha256(v.encode("utf-8")).digest()[:8],
                                "big") & 0x7FFF_FFFF_FFFF_FFFF
    return out


def partition_id_for(subjects: list[str], num_partitions: int) -> np.ndarray:
    return (stable_hash64(subjects) % num_partitions).astype(np.int32)
