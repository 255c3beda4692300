"""Golden-record survivorship: merge each entity's duplicate records
into ONE record, per column taking the latest NON-NULL value.

The step after entity resolution (``dedup.jaccard_similarity_join`` ∘
``cc.connected_components`` → ``entity_match_groups``): once records
are grouped, a master-data pipeline must emit one "golden" row per
entity.  The standard survivorship rule — most-recent-wins but a null
never overwrites data — is exactly SQL's
``last(col ORDER BY ts, id) FILTER (WHERE col IS NOT NULL)`` per
column, which is what the paired DuckDB oracle runs.

Scale shape (partial-aggregation, same family as ``modal value``):
each block folds ITS rows to one partial golden row per key present
in the block, carrying per-column (value, best_ts, best_id) — so the
shuffle moves |keys-per-block| rows, never the record stream; a
coarse-bucket groupby folds partials with the identical rule.
Associative and commutative because (value, (ts, id)) pairs merge by
lexicographic max — deterministic under any partitioning / retry
order (SQL mirror: ``ORDER BY ts, id``).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raykg.ops.joins import _key_bucket


def golden_records(ds, key_col: str, ts_col: str, id_col: str,
                   value_cols: list, coarse: int = 64):
    """One merged row per ``key_col``: for each of ``value_cols`` the
    value of the latest (``ts_col``, ``id_col``)-ordered row where
    that column is non-null; null only if the column is null in every
    record of the group.  Also emits ``n_records`` (int64 group
    size).  -> Dataset(key, n_records, *value_cols).
    """
    value_cols = list(value_cols)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["_b"] = _key_bucket(t.column(key_col), coarse).to_numpy()
        df = df.sort_values([ts_col, id_col], kind="stable")
        g = df.groupby(key_col, sort=False)
        out = g.agg(n_records=(id_col, "size"),
                    _b=("_b", "first")).reset_index()
        for c in value_cols:
            sub = df[df[c].notna()]
            last = sub.groupby(key_col, sort=False).tail(1)
            out[c] = out[key_col].map(
                dict(zip(last[key_col], last[c])))
            out["_ts_" + c] = out[key_col].map(
                dict(zip(last[key_col], last[ts_col])))
            out["_id_" + c] = out[key_col].map(
                dict(zip(last[key_col], last[id_col])))
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, sort=False)
        out = g["n_records"].sum().astype(np.int64).reset_index()
        for c in value_cols:
            sub = df[df[c].notna()].sort_values(
                ["_ts_" + c, "_id_" + c], kind="stable")
            last = sub.groupby(key_col, sort=False).tail(1)
            out[c] = out[key_col].map(dict(zip(last[key_col], last[c])))
        return out[[key_col, "n_records"] + value_cols]

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(partial, batch_format="pyarrow"), "_b",
        coarse, merge)
