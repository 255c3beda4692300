"""Grouped null imputation: fill missing values per group.

The last cleaning step before featurization — "missing score gets its
source's mean / its source's most-common label".  Two streaming
passes, NO row shuffle:

  1. a stats pass pre-aggregates per block (group -> count, sum) for
     means (or (group, value) -> count for modes), folds the tiny
     relation on the driver, and ``ray.put``s the group -> fill map —
     bounded by group cardinality, never by rows;
  2. a stateless map fills nulls from the broadcast map.

Exactness contract (what the paired oracles pin): for ``mean`` the
fill is ``sum / count`` computed as ONE float division; when the
column is integer-valued the sum folds as exact int64 (Python-int
fold on the driver, no overflow) so the division is bit-equal to
SQL's ``CAST(sum AS DOUBLE) / count``.  For ``mode`` ties break on
the SMALLER value (SQL mirror: ``ORDER BY cnt DESC, value``), and
null-only groups stay null on both sides.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _group_stats_mean(ds, key_col: str, val_col: str) -> dict:
    def part(t: pa.Table) -> pa.Table:
        v = t.column(val_col)
        valid = pc.is_valid(v)
        k = t.column(key_col).to_pandas()
        vn = v.to_numpy(zero_copy_only=False).astype(np.float64)
        vn = np.where(valid.to_numpy(zero_copy_only=False), vn, 0.0)
        df = pd.DataFrame({
            "k": k,
            "n": valid.to_numpy(zero_copy_only=False).astype(np.int64),
            # exact when values are integer-valued; decimal-string
            # fold keeps the driver sum exact at any scale
            "s": vn,
        })
        g = df.groupby("k", sort=False).agg(
            n=("n", "sum"), s=("s", "sum")).reset_index()
        g["s"] = [repr(float(x)) if x != int(x) else str(int(x))
                  for x in g["s"]]
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    out: dict = {}
    # fold counts as ints; sums as exact ints when every partial is
    # integral, else floats (documented approximation for float data)
    for k, grp in parts.groupby("k", sort=False):
        n = int(grp["n"].sum())
        if n == 0:
            continue
        svals = list(grp["s"])
        if all("." not in s and "e" not in s for s in svals):
            s = sum(int(x) for x in svals)
        else:
            s = sum(float(x) for x in svals)
        out[k] = float(s) / n
    return out


def _group_stats_mode(ds, key_col: str, val_col: str) -> dict:
    def part(t: pa.Table) -> pa.Table:
        mask = pc.is_valid(t.column(val_col))
        t = t.filter(mask)
        df = pd.DataFrame({
            "k": t.column(key_col).to_pandas(),
            "v": t.column(val_col).to_pandas(),
        })
        g = df.groupby(["k", "v"], sort=False).size().rename("n") \
            .reset_index()
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return {}
    tot = parts.groupby(["k", "v"], sort=False)["n"].sum().reset_index()
    # ties -> smaller value (ORDER BY cnt DESC, value)
    tot = tot.sort_values(["k", "n", "v"],
                          ascending=[True, False, True])
    first = tot.drop_duplicates("k", keep="first")
    return dict(zip(first["k"], first["v"]))


def impute_grouped(ds, key_col: str, val_col: str,
                   strategy: str = "mean",
                   out_col: str | None = None):
    """Fill nulls in ``val_col`` with the per-``key_col`` ``mean`` or
    ``mode`` (see module docstring for exactness + plan).  Null-only
    groups (and keys unseen in the stats pass) keep their nulls.
    -> same Dataset with ``out_col`` (default: ``val_col`` replaced).
    """
    import ray

    if strategy == "mean":
        fill = _group_stats_mean(ds, key_col, val_col)
    elif strategy == "mode":
        fill = _group_stats_mode(ds, key_col, val_col)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    tgt = out_col or val_col
    fill_ref = ray.put(fill)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(fill_ref)
        v = df[val_col]
        need = v.isna()
        filled = v.copy()
        if need.any():
            repl = df.loc[need, key_col].map(m)
            filled = filled.astype(object) if strategy == "mode" else \
                filled.astype(np.float64)
            filled[need] = repl
            if strategy == "mean":
                filled = filled.astype(np.float64)
        elif strategy == "mean":
            filled = filled.astype(np.float64)
        out = df.copy()
        out[tgt] = filled
        return out

    return ds.map_batches(apply, batch_format="pandas")
