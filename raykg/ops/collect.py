"""Ordered grouped collection — SQL's ``string_agg(x, sep ORDER BY
...)`` / ``array_agg``: per key, the concatenation of a value column
in a caller-pinned total order. The workhorse of behavioral-sequence
features (per-user event streams for sequence models) and of
conversation reassembly (turn texts back into transcripts).

Scale shape: the many-keys-per-call pattern (same as
agg_modal_event_type) — rows carry only the needed columns through a
coarse-bucket exchange; each bucket task sorts ONCE over the whole
bucket (key first, then the order columns) and builds every key's
string with one vectorized groupby-join. Partitioning assumption: one
key's rows fit a bucket task (hot keys would need the windows-style
range salting; a per-user event sequence is bounded in practice).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

COLLECT_BUCKETS = 256
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def grouped_string_agg(
    ds,
    key_col: str,
    val_col: str,
    order_cols: list[str],
    sep: str = ",",
    out_col: str = "agg",
    coarse: int = COLLECT_BUCKETS,
):
    """-> Dataset of ``(key_col, out_col)``: per key, ``val_col``
    values joined by ``sep`` in ascending ``order_cols`` order. Pin
    ``order_cols`` to a total order (include a unique tiebreaker) or
    the result is nondeterministic — same contract as SQL
    ``string_agg(... ORDER BY ...)``."""

    def tag(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
            from raykg.util import hash_strings

            kv = np.asarray(hash_strings(keys.to_pylist()))
        else:
            kv = keys.to_numpy(zero_copy_only=False).astype(np.int64)
        b = ((kv.astype(np.uint64) * _GOLDEN) >> np.uint64(52)) % np.uint64(coarse)
        cols = {key_col: keys, val_col: t.column(val_col)}
        for c in order_cols:
            cols[c] = t.column(c)
        return pa.table(cols).append_column(
            "_b", pa.array(b.astype(np.int32)))

    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, kind="mergesort")
        out = g.groupby(key_col, sort=False)[val_col].agg(sep.join)
        return out.rename(out_col).reset_index()

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(tag, batch_format="pyarrow"), "_b", coarse,
        agg_bucket)
