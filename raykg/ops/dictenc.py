"""Global dictionary encoding: assign every distinct value of a
column a stable dense integer code (0..n_distinct-1, in value sort
order) and attach it to every row — the entity→id / token→id /
category→code mapping step every embedding or feature pipeline runs
before training (reference analogue: the entity-catalogue id space
built once and joined everywhere, `pipeline/indexer/main.py`).

Sort-order codes (vs hash codes) make the mapping reproducible,
SQL-checkable (``dense_rank() OVER (ORDER BY value) - 1``) and
range-partitionable downstream.

Plan (no driver materialization of data-sized relations):
  1. **per-block unique** — each input block ships one row per
     distinct value it contains (the Zipf-head bound from
     ops/vocab.py: the shuffle carries blocks × block-distinct rows,
     not rows);
  2. **range partition by value** — sampled splits (strings compare
     fine through np.searchsorted); same value → same bucket, so the
     per-bucket sorted ``unique`` yields the global distinct set,
     range-contiguous;
  3. **offsets** — one O(buckets) count relation folds into prefix
     offsets on the driver (integers only);
  4. **code assignment** — each bucket's sorted distinct values get
     ``offset + local ordinal``; the (value, code) dictionary is a
     materialized vocabulary-sized Dataset;
  5. **map back** — ``auto_join`` attaches codes to the full input
     (broadcast map-side while the dictionary is dimension-sized,
     tagged-union shuffle beyond).

Null values get NO code (left join → null code), mirroring SQL
``dense_rank`` semantics only over non-null rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DICT_RANGES = 64


def build_dictionary(ds, col: str, n_ranges: int = DICT_RANGES,
                     sample_cap: int = 65536):
    """-> materialized Dataset(``col``, code) — one row per distinct
    non-null value, ``code`` dense 0..n-1 in ascending value order."""
    import ray

    from raykg.ops.exchange import hash_exchange
    from raykg.ops.sample import hash_spread_sample_rows

    def block_unique(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        v = v[~pd.isna(v)]
        return pa.table({col: pa.array(pd.unique(v), t.column(col).type)})

    # materialized once: the sample pass (count + spread) and the
    # range-assign pass below would otherwise each re-execute the
    # full scan + per-block dedup
    uniq = ds.select_columns([col]).map_batches(
        block_unique, batch_format="pyarrow").materialize()

    # value-range splits from a hash-spread sample of the distinct rows
    rows = hash_spread_sample_rows(uniq, col, sample_cap)
    sample = np.array([r[col] for r in rows], dtype=object)
    if len(sample):
        sv = np.sort(sample)
        picks = np.linspace(0, len(sv) - 1, n_ranges + 1)[1:-1]
        splits = np.unique(sv[picks.astype(np.int64)])
    else:
        splits = np.array([], dtype=object)
    split_ref = ray.put(splits)

    def assign_range(t: pa.Table) -> pa.Table:
        sp = ray.get(split_ref)
        v = t.column(col).to_numpy(zero_copy_only=False)
        b = (np.searchsorted(sp, v, side="right").astype(np.int32)
             if len(sp) else np.zeros(len(v), dtype=np.int32))
        return t.append_column("_rb", pa.array(b))

    n_buckets = len(splits) + 1

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        # fold-safe whole-bucket fn (a merge task may hold several
        # folded _rb ranges): dedup on the value ALONE is still exact
        # because assign_range maps each value to exactly one range
        return g.drop_duplicates(col)[[col, "_rb"]]

    # raw-task exchange instead of the groupby sort shuffle; a side
    # effect the codes pass below exploits: each output BLOCK holds
    # whole _rb ranges (one merge task per fold group)
    distinct = hash_exchange(
        uniq.map_batches(assign_range, batch_format="pyarrow"),
        "_rb", n_buckets, bucket_distinct).materialize()
    counts = np.zeros(n_buckets, dtype=np.int64)
    part = distinct.map_batches(lambda t: pa.table({
        "b": pa.array(np.arange(n_buckets, dtype=np.int32)),
        "n": pa.array(np.bincount(
            t.column("_rb").to_numpy(zero_copy_only=False),
            minlength=n_buckets).astype(np.int64)),
    }), batch_format="pyarrow").to_pandas()
    for b, n in zip(part["b"], part["n"]):
        counts[b] += n
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    off_ref = ray.put(offsets)

    def codes(df: pd.DataFrame) -> pd.DataFrame:
        # per-BLOCK, not a second shuffle: the exchange above already
        # co-located every _rb range inside one block, so ranking
        # within runs of _rb here is the global dense code
        off = ray.get(off_ref)
        d = df.sort_values(["_rb", col], kind="mergesort")
        b = d["_rb"].to_numpy().astype(np.int64)
        idx = np.arange(len(b), dtype=np.int64)
        if len(b):
            newb = np.r_[True, b[1:] != b[:-1]]
            local = idx - idx[newb][np.cumsum(newb) - 1]
        else:
            local = idx
        return pd.DataFrame({col: d[col].to_numpy(),
                             "code": off[b] + local})

    return distinct.map_batches(
        codes, batch_format="pandas", batch_size=None).materialize()


def dict_encode(ds, col: str, out_col: str = "code",
                keep_cols: list[str] | None = None,
                n_ranges: int = DICT_RANGES):
    """-> Dataset(keep_cols…, ``col``, ``out_col``): every input row
    with its value's dense dictionary code attached (null values →
    null code). The dictionary build is the distributed part; the
    map-back is plan-adaptive (broadcast vs shuffle via auto_join)."""
    from raykg.ops.joins import auto_join

    d = build_dictionary(ds, col, n_ranges=n_ranges)

    # rename AND re-block as Arrow: build_dictionary's codes pass
    # emits pandas blocks, which the broadcast-side assembler (and
    # Ray's Project op) reject
    def ren(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [out_col if c == "code" else c for c in t.column_names])

    d = d.map_batches(ren, batch_format="pyarrow").materialize()
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    keep = list(dict.fromkeys(keep_cols or []))
    # left_types must cover EVERY left column: the shuffle fallback's
    # tag_right fills left columns with pa.nulls(ltypes[c])
    return auto_join(ds, d, on=col, how="left",
                     left_cols=keep, right_cols=[out_col],
                     left_types={c: types[c] for c in [col] + keep},
                     right_types={out_col: pa.int64()})
