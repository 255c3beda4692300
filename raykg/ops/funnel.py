"""Ordered-funnel analysis over an event log: how many keys (users)
performed step 1, then step 2 strictly later, then step 3 … — the
MATCH_RECOGNIZE-lite every product-analytics engine ships, expressed
as one key-bucketed exchange.

Semantics (first-occurrence chaining, the standard funnel):
  t₁ = min ts of a step-1 event; tᵢ = min ts of a step-i event with
  ts STRICTLY AFTER tᵢ₋₁. A key reaches depth d if t_d exists.
  Simultaneous-timestamp events do not chain (documented; SQL mirror
  uses the same strict inequality).

Scale shape:
  * the per-block pre-filter keeps only events whose type is one of
    the funnel steps — at 100 TB the exchange ships the funnel-
    relevant slice, not the log;
  * keys co-locate by hash bucket (``coarse`` modulo); each bucket
    runs the chain as ``len(steps)`` vectorized pandas passes
    (filter type → merge previous times → strict filter → groupby
    min), never a per-key Python loop;
  * buckets emit per-depth partial counts; the driver folds
    O(buckets × steps) ints.

Output: one row per step — (step index, step name, n_reached) with
n_reached monotonically non-increasing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

FUNNEL_BUCKETS = 64


def funnel_counts(ds, steps: list[str], key: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  coarse: int = FUNNEL_BUCKETS) -> pd.DataFrame:
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")

    step_set = pa.array(steps)

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column(type_col), value_set=step_set))
        ids = t.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            bk = ((ids * np.uint64(0x9E3779B97F4A7C15))
                  >> np.uint64(52)).astype(np.int32) % coarse
        return pa.table({
            "_fk": pa.array(bk),
            key: t.column(key),
            ts_col: t.column(ts_col),
            type_col: t.column(type_col),
        })

    def bucket_chain(df: pd.DataFrame) -> pd.DataFrame:
        # depth-1: first occurrence of step 1 per key
        cur = (df[df[type_col] == steps[0]]
               .groupby(key, sort=False)[ts_col].min().rename("t"))
        counts = [len(cur)]
        for s in steps[1:]:
            nxt = df[df[type_col] == s][[key, ts_col]]
            nxt = nxt.merge(cur, left_on=key, right_index=True)
            nxt = nxt[nxt[ts_col] > nxt["t"]]
            cur = nxt.groupby(key, sort=False)[ts_col].min().rename("t")
            counts.append(len(cur))
        return pd.DataFrame({"step": np.arange(len(steps)),
                             "n": np.asarray(counts, dtype=np.int64)})

    parts = (ds.map_batches(pre, batch_format="pyarrow")
             .groupby("_fk").map_groups(bucket_chain, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("step", as_index=False)["n"].sum()
    out = pd.DataFrame({
        "step": np.arange(1, len(steps) + 1, dtype=np.int64),
        "name": steps,
        "n_reached": [int(agg[agg["step"] == i]["n"].sum())
                      for i in range(len(steps))],
    })
    return out
