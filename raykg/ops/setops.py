"""Distributed SQL set operations with DISTINCT semantics:
INTERSECT / EXCEPT / UNION over arbitrary column tuples.

Shape: the same tagged-union single shuffle as ``ops.joins`` — both
sides are locally DEDUPLICATED per block first (the set-semantics
analogue of partial aggregation: what enters the exchange is one row
per distinct tuple per block, so a million repeats of one row cost
one shuffled row per block), tagged with their side, bucketed by a
mixed hash over ALL tuple columns (multi-column keys don't skew on a
low-cardinality first column), and each bucket resolves membership
with one vectorized pandas merge. Buckets partition the distinct
tuple space, so per-bucket results concatenate to the exact answer.

Partitioning assumption: one bucket's DISTINCT tuples fit a task
(raise ``coarse`` with corpus size); a duplicate-heavy input is
already compacted before the exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raykg.ops.joins import _key_bucket

SETOP_BUCKETS = 256
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _tuple_bucket(t: pa.Table, cols: list[str], coarse: int) -> pa.Array:
    """Bucket id from a hash MIXED ACROSS all tuple columns."""
    acc = np.zeros(t.num_rows, dtype=np.uint64)
    big = np.uint64(1 << 61)  # keep per-column buckets, mix positions
    for i, c in enumerate(cols):
        h = np.asarray(
            _key_bucket(t.column(c), int(big)), dtype=np.uint64
        )
        acc ^= (h + np.uint64(i)) * _MIX
    return pa.array(((acc * _MIX) >> np.uint64(52)) % np.uint64(coarse),
                    type=pa.int32())


def set_op(
    left_ds,
    right_ds,
    op: str,
    cols: list[str],
    right_cols: list[str] | None = None,
    coarse: int = SETOP_BUCKETS,
):
    """``op`` in {"intersect", "except", "union"} — SQL DISTINCT set
    semantics over the tuple ``cols`` (right side's ``right_cols``
    are renamed to match; output columns are ``cols``)."""
    if op not in ("intersect", "except", "union"):
        raise ValueError(f"unknown set op {op!r}")
    right_cols = list(right_cols or cols)
    cols = list(cols)

    def prep(side: int, names: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(names).rename_columns(cols)
            # local pre-dedup: one row per distinct tuple per block
            df = t.to_pandas().drop_duplicates()
            t = pa.Table.from_pandas(df, preserve_index=False)
            return t.append_column(
                "_b", _tuple_bucket(t, cols, coarse)
            ).append_column(
                "_side", pa.array(np.full(t.num_rows, side, dtype=np.int8))
            )
        return fn

    tagged = left_ds.map_batches(prep(0, cols), batch_format="pyarrow").union(
        right_ds.map_batches(prep(1, right_cols), batch_format="pyarrow")
    )

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0][cols].drop_duplicates()
        r = df[df["_side"] == 1][cols].drop_duplicates()
        if op == "union":
            return pd.concat([l, r]).drop_duplicates()
        if op == "intersect":
            return l.merge(r, on=cols, how="inner")
        m = l.merge(r, on=cols, how="left", indicator=True)
        return m[m["_merge"] == "left_only"][cols]

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(tagged, "_b", coarse, resolve)


def union_by_name(datasets, strict_types: bool = True):
    """Schema-evolution union (``UNION ALL BY NAME``): concatenate
    Datasets whose schemas drifted — new columns added, old ones
    dropped, different column order — into one stream over the
    UNIFIED schema, absent columns typed-null-filled.  This is the
    ingest step every long-lived corpus needs when yesterday's shards
    predate a schema change (Ray's own ``Dataset.union`` requires
    identical schemas).

    Pure streaming: the unified schema comes from the datasets'
    metadata (one ``schema()`` call each, no data pass), then each
    dataset gets ONE stateless per-block pad/reorder map — no
    shuffle, no driver materialization.  Column order is first-seen
    across inputs.  A name carried by several inputs must have the
    same Arrow type when ``strict_types`` (the default) — silent
    casts hide real drift; with ``strict_types=False`` later types
    are cast to the first-seen type (errors surface per block).
    """
    if not datasets:
        raise ValueError("union_by_name needs at least one dataset")

    def _arrow_type(typ) -> pa.DataType:
        # ray Schema.types yields numpy dtypes / Python classes for
        # pandas-backed blocks; normalize everything to Arrow.
        if isinstance(typ, pa.DataType):
            return typ
        try:
            return pa.from_numpy_dtype(typ)
        except (pa.ArrowNotImplementedError, TypeError):
            if typ in (object, str):
                return pa.string()
            raise TypeError(f"cannot map {typ!r} to an Arrow type")

    unified: dict[str, pa.DataType] = {}
    for ds in datasets:
        sch = ds.schema()
        for name, typ in zip(sch.names, sch.types):
            typ = _arrow_type(typ)
            if name not in unified:
                unified[name] = typ
            elif strict_types and unified[name] != typ:
                raise TypeError(
                    f"column {name!r}: {unified[name]} vs {typ} — "
                    "pass strict_types=False to cast to first-seen")
    names = list(unified)

    def pad(t: pa.Table) -> pa.Table:
        cols = []
        for name in names:
            if name in t.column_names:
                c = t.column(name)
                if c.type != unified[name]:
                    # only reachable under strict_types=False: the
                    # caller opted into lossy drift (float->int
                    # truncates, Arrow semantics)
                    c = c.cast(unified[name], safe=False)
            else:
                c = pa.nulls(t.num_rows, unified[name])
            cols.append(c)
        return pa.table(dict(zip(names, cols)))

    out = datasets[0].map_batches(pad, batch_format="pyarrow")
    for ds in datasets[1:]:
        out = out.union(ds.map_batches(pad, batch_format="pyarrow"))
    return out
