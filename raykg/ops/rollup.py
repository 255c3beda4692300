"""GROUPING SETS / ROLLUP / CUBE — multi-granularity aggregation in
ONE pass over the data.

Scale shape: the input shuffles ONCE, grouped at the FINEST
granularity (the union of all requested sets' columns); every coarser
set then re-aggregates that finest result, which is |distinct finest
keys| rows — orders of magnitude smaller than the input. This is the
standard warehouse plan for ROLLUP and only works because the
aggregates are decomposable (sum/count re-sum; min/max re-min/max);
a non-decomposable aggregate (median) would need its own pass.

Group columns absent from a set are filled with a SENTINEL (default
``(all)``) rather than SQL NULL — null-free output keeps Arrow
schemas stable across the union and hashes deterministically.

Helpers ``rollup_sets`` / ``cube_sets`` build the standard set lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ray.data.aggregate import Count, Max, Min, Sum

FILL = "(all)"

_COMBINE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def rollup_sets(cols: list[str]) -> list[list[str]]:
    """ROLLUP(a, b, c) -> [a,b,c], [a,b], [a], []"""
    return [cols[:i] for i in range(len(cols), -1, -1)]


def cube_sets(cols: list[str]) -> list[list[str]]:
    """CUBE over all subsets (len(cols) ≤ a handful)."""
    from itertools import combinations

    out = []
    for r in range(len(cols), -1, -1):
        out.extend([list(c) for c in combinations(cols, r)])
    return out


def _ray_agg(op: str, col, name):
    if op == "sum":
        return Sum(col, alias_name=name)
    if op == "count":
        return Count(alias_name=name)
    if op == "min":
        return Min(col, alias_name=name)
    if op == "max":
        return Max(col, alias_name=name)
    raise ValueError(f"unsupported aggregate {op!r}")


def grouping_sets(ds, sets: list[list[str]], aggs: list[tuple],
                  fill: str = FILL):
    """``aggs``: (op, col, out_name) with op in sum/count/min/max
    (col ignored for count). Returns a Dataset whose rows are the
    union over ``sets`` of per-set aggregates; group columns are cast
    to string so the sentinel fits the schema."""
    group_cols: list[str] = []
    for s in sets:
        for c in s:
            if c not in group_cols:
                group_cols.append(c)
    names = [name for _, _, name in aggs]

    finest = (
        ds.groupby(group_cols)
        .aggregate(*[_ray_agg(op, col, name) for op, col, name in aggs])
        .materialize()
        if group_cols else None
    )

    def finalize(tbl: pd.DataFrame, present: list[str]) -> pd.DataFrame:
        for c in group_cols:
            tbl[c] = tbl[c].astype(str) if c in present else fill
        return tbl[group_cols + names]

    out = None
    for s in sets:
        if s == group_cols and finest is not None:
            part_ds = finest.map_batches(
                lambda df, present=list(s): finalize(df, present),
                batch_format="pandas")
        elif s:
            part_ds = (
                finest.groupby(list(s))
                .aggregate(*[_ray_agg(_COMBINE[op], name, name)
                             for op, _, name in aggs])
                .map_batches(lambda df, present=list(s):
                             finalize(df, present),
                             batch_format="pandas")
            )
        else:
            # grand total: one scalar row
            src = finest if finest is not None else ds
            row = {}
            for op, col, name in aggs:
                c = col if finest is None else name
                o = _COMBINE[op] if finest is not None else op
                res = src.aggregate(_ray_agg(o, c, name))
                row[name] = res[name]
            tot = pd.DataFrame([row])
            part_ds = rd.from_pandas(finalize(tot, []))
        out = part_ds if out is None else out.union(part_ds)
    return out
