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


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 of an integer array → uint64 in [0, 2^64).

    A bijection on uint64 (distinct ids → distinct keys, so orderings have
    no ties) whose exact semantics the DuckDB oracles restate in hugeint
    limb arithmetic (``oracle_tables._mulmod64``/``_xorshift64``) — the
    deterministic sampling key."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):              # mod-2^64 by design
        z += np.uint64(0x9E3779B97F4A7C15)
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z
