"""Small shared utilities: deterministic vectorized string hashing.

Python's ``hash(str)`` is salted per process (PYTHONHASHSEED), so it can
NEVER be used as a shuffle/bucket key across Ray tasks — two tasks would
route the same key to different buckets. This FNV-1a variant is
process-independent and vectorized (one numpy pass per character column
of the padded code matrix; strings in hot paths are short URIs/keys).
"""

from __future__ import annotations

import numpy as np

_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)


def hash_strings(texts: list[str]) -> np.ndarray:
    """Deterministic 64-bit hash per string (vectorized)."""
    n = len(texts)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    L = int(lens.max()) if n else 0
    codes = np.zeros((n, max(L, 1)), dtype=np.uint64)
    for i, t in enumerate(texts):
        if t:
            codes[i, : len(t)] = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            )
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    # fold in the length first so zero-padding can't collide
    with np.errstate(over="ignore"):
        h = (h ^ lens.astype(np.uint64)) * _FNV_PRIME
        for j in range(L):
            active = j < lens
            hj = (h ^ codes[:, j]) * _FNV_PRIME
            h = np.where(active, hj, h)
    return h


def hash_string_columns(*cols: list[str]) -> np.ndarray:
    """Combined hash over several row-aligned string columns."""
    h = hash_strings(list(cols[0]))
    with np.errstate(over="ignore"):
        for col in cols[1:]:
            h = (h * _FNV_PRIME) ^ hash_strings(list(col))
    return h


def ts_to_us(col):
    """Timestamp column -> int64 MICROSECONDS since epoch, any input
    unit. Arrow refuses a lossy ns->us cast outright, so sub-µs
    precision is floored explicitly (numpy // — floor, not
    truncate-toward-zero, for pre-epoch values)."""
    import numpy as np
    import pyarrow as pa

    if not pa.types.is_timestamp(col.type):
        # integer columns are taken as already-µs (the int-axis case)
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    unit = col.type.unit
    iv = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    if unit == "ns":
        return iv // np.int64(1000)
    if unit == "us":
        return iv
    if unit == "ms":
        return iv * np.int64(1000)
    return iv * np.int64(1_000_000)  # 's'
