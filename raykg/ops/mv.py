"""Incremental materialized-view maintenance: apply an O(changes) CDC
stream to a STORED grouped SUM/COUNT aggregate without rescanning the
base table — the delta-maintenance rule for distributive aggregates
(each changed row contributes -old to its old group and +new to its
new group; classic self-maintainable-view result, Gupta & Mumick
1995, "Maintenance of Materialized Views: Problems, Techniques, and
Applications").

Scale shape:
  * the two-sided change stream is O(changes) by construction
    (``changes_with_both_sides``: the table_diff key set Bloom-prunes
    each snapshot before its value join, so no full snapshot is
    shuffled a second time);
  * contributions pre-aggregate per block (one pandas groupby) — the
    delta exchange carries one row per touched GROUP per block;
  * one outer ``hash_join`` folds deltas into the stored MV; groups
    whose row count reaches zero drop out, groups born in the delta
    appear.

Float caveat: delta application reassociates the sum, so float SUM
columns agree with a from-scratch rebuild only to float64 rounding —
round money-style columns for bit-stable comparison (the MV query
oracle rounds to 2 decimals on both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raykg.ops.diff import table_diff
from raykg.ops.joins import bloom_semi_join, hash_join


def changes_with_both_sides(old_ds, new_ds, key: str, cols: list[str],
                            key_type: pa.DataType | None = None):
    """-> Dataset(key, status, old_<c>..., new_<c>...) — the CDC stream
    carrying BOTH sides' values (what aggregate maintenance needs;
    ``diff.enrich_changes`` carries only the new side). Values travel
    as float64: the left joins null-pad the absent side of added/
    removed keys, which widens ints anyway — callers narrow back
    where exactness matters (group ids are < 2^53, so the trip is
    lossless)."""
    kt = key_type or pa.int64()
    diff = table_diff(old_ds, new_ds, key, cols,
                      key_type=kt).materialize()

    def pruned_side(snap_ds, prefix: str):
        def ren(t: pa.Table) -> pa.Table:
            arrs = [t.column(key)] + [
                t.column(c).cast(pa.float64()) for c in cols]
            return pa.table(
                dict(zip([key] + [f"{prefix}{c}" for c in cols], arrs)))

        return bloom_semi_join(
            snap_ds, diff, on=key, left_cols=cols, how="semi",
        ).map_batches(ren, batch_format="pyarrow")

    old_types = {key: kt, **{f"old_{c}": pa.float64() for c in cols}}
    new_types = {key: kt, **{f"new_{c}": pa.float64() for c in cols}}
    step = hash_join(
        diff, pruned_side(old_ds, "old_"), on=key,
        left_cols=["status"],
        right_cols=[f"old_{c}" for c in cols], how="left",
        left_types={key: kt, "status": pa.string()},
        right_types=old_types,
    )
    return hash_join(
        step, pruned_side(new_ds, "new_"), on=key,
        left_cols=["status"] + [f"old_{c}" for c in cols],
        right_cols=[f"new_{c}" for c in cols], how="left",
        left_types={key: kt, "status": pa.string(),
                    **{f"old_{c}": pa.float64() for c in cols}},
        right_types=new_types,
    )


def refresh_grouped_sum(
    base_mv_ds,
    changes2_ds,
    group_col: str,
    sum_cols: list[str],
    count_col: str = "n_rows",
    group_type: pa.DataType | None = None,
):
    """Fold a two-sided change stream (``changes_with_both_sides``
    output whose ``cols`` included ``group_col`` and every sum
    column) into a stored grouped aggregate
    ``(group_col, count_col, sum_<c>...)``. Returns the refreshed MV
    with empty groups dropped — equal (mod float reassociation) to
    recomputing the aggregate over the new snapshot, the law pinned
    in tests/test_ops.py."""
    gt = group_type or pa.int64()
    mv_cols = [count_col] + [f"sum_{c}" for c in sum_cols]

    def contribs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        parts = []
        for prefix, sign in (("old_", -1), ("new_", 1)):
            g = df[f"{prefix}{group_col}"]
            has = g.notna()
            if has.any():
                p = pd.DataFrame({group_col: g[has], count_col: sign})
                for c in sum_cols:
                    p[f"sum_{c}"] = (
                        sign * df.loc[has, f"{prefix}{c}"].to_numpy())
                parts.append(p)
        if not parts:
            empty = pd.DataFrame({
                group_col: pd.Series([], dtype="int64"),
                count_col: pd.Series([], dtype="int64")})
            for c in sum_cols:
                empty[f"sum_{c}"] = pd.Series([], dtype="float64")
            return pa.Table.from_pandas(empty, preserve_index=False)
        out = pd.concat(parts, ignore_index=True)
        # per-block pre-aggregation: one delta row per touched group
        out = out.groupby(group_col, as_index=False).sum()
        out[group_col] = out[group_col].astype("int64")
        out[count_col] = out[count_col].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    from ray.data.aggregate import Sum

    aggs = [Sum(count_col, alias_name=count_col)]
    aggs += [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sum_cols]
    delta = (changes2_ds.map_batches(contribs, batch_format="pyarrow")
             .groupby(group_col).aggregate(*aggs))

    def renamed_delta(t: pa.Table) -> pa.Table:
        name_map = {group_col: group_col,
                    **{c: f"_d_{c}" for c in mv_cols}}
        return t.rename_columns([name_map[n] for n in t.schema.names])

    joined = hash_join(
        base_mv_ds,
        delta.map_batches(renamed_delta, batch_format="pyarrow"),
        on=group_col,
        left_cols=mv_cols,
        right_cols=[f"_d_{c}" for c in mv_cols],
        how="outer",
        left_types={group_col: gt, count_col: pa.int64(),
                    **{f"sum_{c}": pa.float64() for c in sum_cols}},
        right_types={group_col: gt, **{
            f"_d_{c}": (pa.int64() if c == count_col else pa.float64())
            for c in mv_cols}},
    )

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n = (df[count_col].fillna(0)
             + df[f"_d_{count_col}"].fillna(0)).astype("int64")
        out = pd.DataFrame({group_col: df[group_col], count_col: n})
        for c in sum_cols:
            out[f"sum_{c}"] = (df[f"sum_{c}"].fillna(0.0)
                               + df[f"_d_sum_{c}"].fillna(0.0))
        out = out[out[count_col] > 0]
        out[group_col] = out[group_col].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return joined.map_batches(fold, batch_format="pyarrow")
