"""Join operators Ray Data lacks natively, built as compositions.

As-of join (the classic "latest right row at-or-before the left
timestamp" lookup): both sides are hash-bucketed by join key into a
bounded number of coarse buckets (ONE shuffle in total, expressed as a
tagged union + groupby), and each bucket answers all of its keys with a
per-key sort + ``np.searchsorted`` — vectorized over the left rows of
the key, no row loop.

Hash equi-join (``hash_join``): the large×large shuffle join — neither
side is broadcast. Same tagged-union single-shuffle shape; each coarse
bucket runs one vectorized ``pd.merge``. This is the operator the
reference's entity-metadata join needs at its 5.9 M-entity scale
(``pipeline/indexer/main.py:97-135``) once the dimension side outgrows
``ray.put`` broadcast, and what MinHash verification uses to rejoin
candidate ids with corpus text without a driver hop.

Partitioning assumption (documented per the custom-operator contract):
all rows of one coarse BUCKET fit in one group task. ``coarse`` spreads
the key space uniformly (multiply-shift on int keys, FNV on strings);
raise it so that |input| / coarse fits worker memory. A single hot KEY
larger than a bucket would need per-key salting of the small-multiplied
side, which these corpora do not exhibit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

ASOF_BUCKETS = 256
JOIN_BUCKETS = 256
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


def _key_bucket(col: pa.ChunkedArray | pa.Array, coarse: int) -> pa.Array:
    """Bucket id for an int OR string key column."""
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        from raykg.util import hash_strings

        keys = hash_strings(col.to_pylist())
    else:
        keys = col.to_numpy(zero_copy_only=False).astype(np.int64)
    return _bucket_of(np.asarray(keys), coarse)


def hash_join(
    left_ds,
    right_ds,
    on: str,
    right_on: str | None = None,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    how: str = "inner",
    coarse: int = JOIN_BUCKETS,
    left_types: dict[str, pa.DataType] | None = None,
    right_types: dict[str, pa.DataType] | None = None,
):
    """Distributed hash equi-join of two LARGE datasets — one shuffle,
    no broadcast side, no driver materialization.

    Both sides are tagged with ``_bucket = h(key) % coarse`` and
    union-ed (so the exchange is a single groupby); each bucket group
    does a vectorized ``pd.merge`` of its two sides. ``how`` is
    ``inner`` or ``left``. Output columns: ``[on] + left_cols +
    right_cols`` (the right key is renamed onto ``on``; all output
    names must be distinct). Pass ``left_types``/``right_types`` (name
    -> pa.DataType for the key + requested columns) when a side is a
    still-lazy pipeline whose ``schema()`` would otherwise trigger
    execution.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    right_on = right_on or on
    left_cols = list(left_cols or [])
    right_cols = list(right_cols or [])
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"output name collision: {sorted(overlap)}")
    ltypes = left_types or _schema_types(left_ds)
    rtypes = right_types or _schema_types(right_ds)

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {on: batch.column(on)}
        for c in left_cols:
            cols[c] = batch.column(c)
        for c in right_cols:
            cols[c] = pa.nulls(batch.num_rows, type=rtypes[c])
        t = pa.table(cols)
        t = t.append_column("_bucket", _key_bucket(batch.column(on), coarse))
        return t.append_column(
            "_side", pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {on: batch.column(right_on)}
        for c in left_cols:
            cols[c] = pa.nulls(batch.num_rows, type=ltypes[c])
        for c in right_cols:
            cols[c] = batch.column(c)
        t = pa.table(cols)
        t = t.append_column(
            "_bucket", _key_bucket(batch.column(right_on), coarse)
        )
        return t.append_column(
            "_side", pa.array(np.ones(batch.num_rows, dtype=np.int8))
        )

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    out_cols = [on] + left_cols + right_cols

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == 0][[on] + left_cols]
        right = g[g["_side"] == 1][[on] + right_cols]
        res = left.merge(right, on=on, how=how)
        return res[out_cols]

    merged = tagged.groupby("_bucket").map_groups(
        merge_bucket, batch_format="pandas"
    )

    def finalize(t: pa.Table) -> pa.Table:
        # the union made both sides nullable and pandas may have widened
        # dtypes — cast back to the source schemas (right cols stay
        # nullable under how='left')
        import pyarrow.compute as pc

        for c in out_cols:
            want = ltypes.get(c) if (c == on or c in left_cols) else rtypes.get(c)
            if want is None:
                continue
            i = t.column_names.index(c)
            col = t.column(c)
            if col.type != want:
                if pa.types.is_floating(col.type) and pa.types.is_integer(want):
                    # unmatched left-join rows: NaN -> null before the cast
                    col = pc.if_else(
                        pc.is_nan(col), pa.nulls(len(col), type=col.type), col
                    )
                t = t.set_column(i, c, col.cast(want))
        return t

    return merged.map_batches(finalize, batch_format="pyarrow")


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
