"""Pareto skyline (non-dominated frontier) over two numeric columns.

The multi-objective shortlist every curation / procurement pipeline
eventually runs: "rows where nothing else is better on BOTH axes"
(cheapest-per-quality documents, smallest-loss-per-token checkpoints,
price/latency frontiers). A row q is DOMINATED iff some row p is <= q
on both dimensions and strictly < on at least one (ties on both dims
are mutually non-dominated and all survive — the standard skyline
definition, mirrored exactly by the SQL oracle in __ray_entry__).

Scale shape (the classic two-level skyline plan):
  1. per-block LOCAL skyline — sort by (x, y, id), group-min per x,
     strictly-decreasing-y prefix scan: O(rows log rows) per block and
     the only pass over the full data;
  2. the surviving rows co-locate into ONE final task (constant key
     groupby) and the same scan runs once more.  Correct because
     skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — local
     pruning never discards a global frontier point.

The final task holds the UNION OF LOCAL SKYLINES, not the corpus: on
real (even mildly correlated) data that is tiny.  The adversarial
worst case — perfectly anti-correlated dims where every row is on the
frontier — makes ANY exact skyline output O(n); callers with such
data should pre-bucket one dimension and take per-bucket frontiers.

Directions: pass ``directions=("min"|"max", "min"|"max")``; max dims
are negated on the way in and restored on the way out, so the core
only reasons about minimization.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _local_skyline(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the min/min skyline of (x, y).

    Sort by (x, y); a point survives iff it has the min y of its
    x-group AND that y is strictly below every smaller-x group's min.
    Vectorized: group-min via the sorted first-occurrence trick, then
    a strict running-min prefix test.
    """
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    # first row of each x-group in the sort carries the group min y
    new_x = np.empty(n, dtype=bool)
    new_x[0] = True
    new_x[1:] = xs[1:] != xs[:-1]
    gidx = np.cumsum(new_x) - 1                  # group index per row
    gmin = ys[new_x]                             # per-group min y
    # strict prefix min over PREVIOUS groups
    prev = np.empty(len(gmin))
    prev[0] = np.inf
    np.minimum.accumulate(gmin[:-1], out=prev[1:]) if len(gmin) > 1 else None
    keep_group = gmin < prev                     # strictly better than all
    keep_sorted = keep_group[gidx] & (ys == gmin[gidx])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline(ds, x_col: str, y_col: str, id_col: str,
            directions: tuple[str, str] = ("min", "min")):
    """2-D Pareto frontier of ``ds`` → Dataset(id, x, y) of the
    non-dominated rows (see module docstring for plan + caveats)."""
    sx = -1.0 if directions[0] == "max" else 1.0
    sy = -1.0 if directions[1] == "max" else 1.0

    def local(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        keep = _local_skyline(sx * x, sy * y)
        return pa.table({
            "_g": pa.array(np.zeros(int(keep.sum()), dtype=np.int32)),
            id_col: t.column(id_col).filter(pa.array(keep)),
            x_col: t.column(x_col).filter(pa.array(keep)),
            y_col: t.column(y_col).filter(pa.array(keep)),
        })

    def final(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(dtype=np.float64)
        y = df[y_col].to_numpy(dtype=np.float64)
        keep = _local_skyline(sx * x, sy * y)
        out = df.loc[keep, [id_col, x_col, y_col]]
        return out.sort_values(id_col).reset_index(drop=True)

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby("_g")
            .map_groups(final, batch_format="pandas"))
