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


_FOLD_POWERS = np.ones(1, dtype=np.uint64)


def _fold_powers(n: int) -> np.ndarray:
    """base^i mod 2^64 for i < n (module-level, grown on demand)."""
    global _FOLD_POWERS
    if len(_FOLD_POWERS) < n:
        old = len(_FOLD_POWERS)
        grown = np.empty(n, dtype=np.uint64)
        grown[:old] = _FOLD_POWERS
        base = np.uint64(1_000_003)
        with np.errstate(over="ignore"):
            for i in range(old, n):            # ≤ max key length, once
                grown[i] = grown[i - 1] * base
        _FOLD_POWERS = grown
    return _FOLD_POWERS


def fast_hash64(values) -> np.ndarray:
    """Vectorized 63-bit string hash for PARTITION ASSIGNMENT only (group
    contents never reach output, so it need not match ``stable_hash64`` or
    any SQL) — a polynomial byte fold over the column's utf-8 buffer
    finished with the splitmix64 avalanche; no per-row Python loop (r4
    verdict item: ``stable_hash64``'s sha-per-string loop was the last
    Python loop on the distributed combine paths).

    Accepts an Arrow string Array/ChunkedArray (zero-copy over the offsets
    + data buffers) or a list of Python strings."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        if not (pa.types.is_string(values.type) or
                pa.types.is_large_string(values.type)):
            values = values.cast(pa.string())
        off_dtype = np.int64 if pa.types.is_large_string(values.type) \
            else np.int32
        offs_all = np.frombuffer(values.buffers()[1], dtype=off_dtype)
        offs = offs_all[values.offset:
                        values.offset + len(values) + 1].astype(np.int64)
        data = np.frombuffer(values.buffers()[2], dtype=np.uint8)
        seg = data[offs[0]:offs[-1]].astype(np.uint64)
        lengths = np.diff(offs)
    else:
        bufs = [v.encode("utf-8") for v in values]
        lengths = np.fromiter((len(b) for b in bufs), np.int64,
                              count=len(bufs))
        seg = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(
            np.uint64)
    n = len(lengths)
    out = np.zeros(n, dtype=np.uint64)
    nz = lengths > 0
    if seg.size:
        ends = np.cumsum(lengths)
        starts = ends - lengths
        powers = _fold_powers(int(lengths.max()))
        pos = np.repeat(ends, lengths) - 1 - np.arange(seg.size,
                                                       dtype=np.int64)
        with np.errstate(over="ignore"):          # mod-2^64 by design
            terms = seg * powers[pos]
            out[nz] = np.add.reduceat(terms, starts[nz])
    return (splitmix64(out) >> np.uint64(1)).astype(np.int64)


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
