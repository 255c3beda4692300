"""Join operators Ray Data lacks natively, built as compositions.

As-of join (the classic "latest right row at-or-before the left
timestamp" lookup): both sides are hash-bucketed by join key into a
bounded number of coarse buckets (ONE shuffle in total, expressed as a
tagged union + groupby), and each bucket answers all of its keys with a
per-key sort + ``np.searchsorted`` — vectorized over the left rows of
the key, no row loop.

Partitioning assumption (documented per the custom-operator contract):
all rows of one KEY fit in one bucket group. Keys are user/customer-
grade cardinality here; a single hot key larger than worker memory
would need a further right-side time-range split, which this corpus
does not exhibit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

ASOF_BUCKETS = 256
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _schema_types(ds) -> dict[str, pa.DataType]:
    """Column name -> pyarrow type for a Dataset whose schema may be an
    Arrow schema or a PandasBlockSchema (from_pandas inputs)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return {f.name: f.type for f in base}
    out: dict[str, pa.DataType] = {}
    for n, t in zip(base.names, base.types):
        try:
            out[n] = pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            out[n] = pa.string()
    return out


def _bucket_of(keys: np.ndarray, coarse: int) -> pa.Array:
    return pa.array(
        ((keys.astype(np.uint64) * _GOLDEN) >> np.uint64(52))
        % np.uint64(coarse),
        type=pa.int32(),
    )


def asof_join(
    left_ds,
    right_ds,
    key: str,
    right_key: str,
    ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    fill: dict | None = None,
    coarse: int = ASOF_BUCKETS,
):
    """For each left row: the right row of the same key with the
    greatest ``right_ts`` <= left ``ts``; ties on right_ts resolve to
    the row with the max first requested right column. Unmatched left
    rows take ``fill[col]`` (required for every right col, so output
    dtypes stay stable).

    Returns a Dataset with columns ``[key, ts] + left_cols +
    right_cols``.
    """
    fill = fill or {}
    ltypes = _schema_types(left_ds)
    rtypes = _schema_types(right_ds)

    def tag_left(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        cols = {key: batch.column(key), ts: batch.column(ts)}
        for c in left_cols:
            cols[c] = batch.column(c)
        for c in right_cols:
            cols["_r_" + c] = pa.nulls(batch.num_rows, type=rtypes[c])
        t = pa.table(cols)
        t = t.append_column("_bucket", _bucket_of(keys, coarse))
        return t.append_column(
            "_side", pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        keys = batch.column(right_key).to_numpy(zero_copy_only=False)
        cols = {key: batch.column(right_key), ts: batch.column(right_ts)}
        for c in left_cols:
            cols[c] = pa.nulls(batch.num_rows, type=ltypes[c])
        for c in right_cols:
            cols["_r_" + c] = batch.column(c)
        t = pa.table(cols)
        t = t.append_column("_bucket", _bucket_of(keys, coarse))
        return t.append_column(
            "_side", pa.array(np.ones(batch.num_rows, dtype=np.int8))
        )

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for _, kg in g.groupby(key, sort=False):
            left = kg[kg["_side"] == 0]
            if len(left) == 0:
                continue
            right = kg[kg["_side"] == 1].sort_values(
                [ts, "_r_" + right_cols[0]]
            )
            res = left[[key, ts] + left_cols].reset_index(drop=True)
            if len(right):
                idx = (
                    np.searchsorted(
                        right[ts].to_numpy(), left[ts].to_numpy(),
                        side="right",
                    )
                    - 1
                )
            else:
                idx = np.full(len(left), -1)
            for c in right_cols:
                if len(right):
                    vals = pd.Series(
                        right["_r_" + c].to_numpy()[np.clip(idx, 0, None)]
                    ).where(idx >= 0, fill.get(c))
                else:
                    vals = pd.Series([fill.get(c)] * len(left))
                res[c] = vals.to_numpy()
            parts.append(res)
        cols = [key, ts] + left_cols + right_cols
        if not parts:
            return pd.DataFrame({c: [] for c in cols})
        return pd.concat(parts, ignore_index=True)[cols]

    merged = tagged.groupby("_bucket").map_groups(
        merge_bucket, batch_format="pandas"
    )

    def finalize(t: pa.Table) -> pa.Table:
        # the union made left columns nullable, which pandas widened to
        # float64 — cast back to the left schema's dtypes
        for c in [key, ts] + left_cols:
            want = ltypes.get(c)
            if want is None:
                continue
            i = t.column_names.index(c)
            if t.schema.field(c).type != want:
                t = t.set_column(i, c, t.column(c).cast(want))
        return t

    return merged.map_batches(finalize, batch_format="pyarrow")
