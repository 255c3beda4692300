"""Exact distributed top-k / heavy hitters WITHOUT a full-key shuffle.

``top_words`` (ops/vocab.py) is exact but its groupby still moves one
row per distinct key — at 100 TB a high-cardinality key column (URLs,
user ids, n-grams) makes even that exchange the bottleneck. This
operator avoids it with the classic two-pass space-saving scheme:

Pass 1 (candidates): each block emits its top-``m`` keys by EXACT
local count (vectorized ``np.unique`` + ``argpartition``). Pigeonhole
guarantee: any key with global count > N/(m+1) is in some block's
top-m — if it ranked below m keys in every block, each of those keys
counts ≥ it, so (m+1)·count_b ≤ n_b per block and summing gives
global ≤ N/(m+1). The candidate union is ≤ m × n_blocks keys — tiny.

Pass 2 (recount): one streaming filter of the input against the
broadcast candidate set, local pre-count, then a groupby over ONLY the
candidate keys. Exact counts for every candidate.

Certificate: the result is the true global top-k iff the k-th largest
recounted value exceeds N/(m+1) (no non-candidate can beat it). When
the certificate fails (near-uniform data — no heavy hitters at all),
the operator falls back to the exact full groupby, so the output is
ALWAYS exact; ``m`` only controls when the cheap path suffices.
Ties break deterministically: (count desc, key asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data.aggregate import Sum


def _local_counts(t: pa.Table, key_col: str) -> tuple[np.ndarray, np.ndarray]:
    keys = t.column(key_col).to_numpy(zero_copy_only=False)
    return np.unique(keys, return_counts=True)


def heavy_hitters(ds, key_col: str, k: int = 10, m: int | None = None,
                  coarse: int = 64) -> pd.DataFrame:
    """Exact top-k keys of ``ds[key_col]`` by count, (count desc, key
    asc) tie-break. ``m`` is the per-block candidate width (default
    ``max(8·k, 64)``); larger m widens the cheap-path certificate, the
    result is exact either way. Returns a k-row pandas frame with
    columns ``[key_col, "n"]``.
    """
    m = m or max(8 * k, 64)

    def block_candidates(t: pa.Table) -> pa.Table:
        keys, counts = _local_counts(t, key_col)
        if len(keys) == 0:
            return pa.table({key_col: t.column(key_col).slice(0, 0),
                             "_n_block": pa.array([], pa.int64())})
        if len(keys) > m:
            top = np.argpartition(counts, len(counts) - m)[-m:]
            keys = keys[top]
        return pa.table({key_col: pa.array(keys),
                         "_n_block": pa.array([t.num_rows] +
                                              [0] * (len(keys) - 1),
                                              pa.int64())})

    # candidate union is <= m x n_blocks rows; total N rides along in
    # one row per block so no separate count() pass over the input
    cand_tbl = (
        ds.map_batches(block_candidates, batch_format="pyarrow")
        .to_pandas()
    )
    if len(cand_tbl) == 0:
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    n_total = int(cand_tbl["_n_block"].sum())
    cand = np.unique(cand_tbl[key_col].to_numpy())
    cand_ref = ray.put(cand)

    def recount(t: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        keys, counts = _local_counts(t, key_col)
        hit = np.isin(keys, c)
        return pa.table({key_col: pa.array(keys[hit]),
                         "n": pa.array(counts[hit], pa.int64())})

    exact = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", key_col], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    kth = int(exact["n"].iloc[-1]) if len(exact) >= k else 0
    if len(exact) >= k and kth * (m + 1) > n_total:
        return exact  # certificate holds: no non-candidate can reach kth

    # near-uniform data: fall back to the exact full groupby (the
    # top_words shape — one row per distinct key per block)
    def pre(t: pa.Table) -> pa.Table:
        keys, counts = _local_counts(t, key_col)
        return pa.table({key_col: pa.array(keys),
                         "n": pa.array(counts, pa.int64())})

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", key_col], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
