"""Pivot (long → wide conditional aggregation): one output row per
key, one column per pivoted category value — SQL's ``COUNT(*) FILTER
(WHERE cat = v)`` / ``PIVOT ... IN (v1, v2, ...)``.

Scale shape (the partial-aggregation pattern): each block is pivoted
LOCALLY into one wide partial row per key present in the block — what
enters the shuffle is |keys-per-block| × O(1) wide rows, never the
event stream — and Ray's hash aggregate sums the partials per key.
The category list is EXPLICIT (like SQL PIVOT's IN list): schema is
fixed up front, so there is no second pass to discover categories and
no ragged blocks; categories outside the list are dropped (use
``ops.vocab.top_words``-style pre-pass to pick the list when unknown).

Partitioning assumption: none beyond Ray's hash aggregate — key
cardinality can exceed memory (the aggregate spills); a wide partial
has len(values) × (1 + has value_col) columns, so keep the category
list in the hundreds, not millions (that transpose is what the sparse
long form is for).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from raykg.ops.exchange import hash_exchange


def pivot_agg(
    ds,
    key: str,
    pivot_col: str,
    values: list,
    value_col: str | None = None,
):
    """Wide per-key table: ``n_{v}`` count columns for each category v
    in ``values``, plus ``{value_col}_{v}`` sums when ``value_col``
    is given. Missing (key, category) pairs are 0."""
    values = list(values)
    n_cols = [f"n_{v}" for v in values]
    s_cols = [f"{value_col}_{v}" for v in values] if value_col else []

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[pivot_col].isin(values)]
        if df.empty:
            return pd.DataFrame(
                {key: pd.Series([], dtype=df[key].dtype)}
                | {c: pd.Series([], dtype=np.int64) for c in n_cols + s_cols}
            )
        g = df.groupby([key, pivot_col], sort=False)
        cnt = (
            g.size().unstack(fill_value=0)
            .reindex(columns=values, fill_value=0).astype(np.int64)
        )
        cnt.columns = n_cols
        out = cnt
        if value_col:
            sm = (
                g[value_col].sum().unstack(fill_value=0)
                .reindex(columns=values, fill_value=0).astype(np.int64)
            )
            sm.columns = s_cols
            out = pd.concat([cnt, sm], axis=1)
        return out.reset_index()

    # final combine: coarse-bucket map_groups with ONE pandas sum over
    # all wide columns — Ray's named-aggregate path costs a fixed
    # per-aggregate overhead that dominates at 2×len(values) columns
    from raykg.ops.joins import _key_bucket

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_b", _key_bucket(t.column(key), 64))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key, as_index=False)[n_cols + s_cols].sum()

    return (
        hash_exchange(
            ds.map_batches(partial, batch_format="pandas")
            .map_batches(add_bucket, batch_format="pyarrow"),
            "_b", 64, final)
    )


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_name: str = "metric", val_name: str = "value",
            cast=None):
    """Wide → long (SQL UNPIVOT / pandas melt), purely block-local —
    no shuffle: every input row becomes len(value_cols) output rows
    ``(id_cols..., metric, value)``. Heterogeneous value columns must
    unify; pass ``cast`` (a pyarrow DataType, e.g. ``pa.float64()``)
    to coerce them all (SQL UNPIVOT requires the same — the oracle
    casts each branch of its UNION ALL)."""

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = []
        for vc in value_cols:
            cols = {c: t.column(c) for c in id_cols}
            cols[var_name] = pa.array(np.repeat(vc, n))
            v = t.column(vc)
            cols[val_name] = v.cast(cast) if cast is not None else v
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")
