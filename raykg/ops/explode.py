"""Explode / unnest — SQL ``UNNEST ... WITH ORDINALITY``: one output
row per element of a list column (or per token of a split string),
with the element's 1-based position.

Purely block-local (NO shuffle — the one relational operator that
never needs an exchange): each Arrow block flattens with
``pc.list_flatten`` + an offsets-derived position vector, so the
output streams with the same backpressure as the input. Row-count
amplification is the list length — downstream aggregates should
pre-combine per block (see ``ops.vocab`` for the canonical pattern).

The token variant reproduces DuckDB's ``string_split(text, sep)``
semantics exactly (positions are assigned BEFORE empty tokens are
dropped) so results are oracle-checkable bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _explode_table(t: pa.Table, list_col: str, id_cols: list[str],
                   out_col: str, pos_col: str) -> pa.Table:
    col = t.column(list_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        col = col.cast(pa.list_(col.type.value_type))
    flat = pc.list_flatten(col)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
    total = int(lens.sum())
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    pos = np.arange(total, dtype=np.int64) - starts + 1
    cols = {}
    for c in id_cols:
        vals = t.column(c)
        cols[c] = pc.take(
            vals, pa.array(np.repeat(np.arange(len(t)), lens)))
    cols[pos_col] = pa.array(pos)
    cols[out_col] = flat
    return pa.table(cols)


def explode_column(ds, list_col: str, id_cols: list[str],
                   out_col: str | None = None, pos_col: str = "pos"):
    """Unnest ``list_col`` (list or fixed-size-list) with ordinality;
    null/empty lists produce no rows (SQL UNNEST semantics)."""
    out_col = out_col or list_col

    def fn(t: pa.Table) -> pa.Table:
        return _explode_table(t, list_col, id_cols, out_col, pos_col)

    return ds.map_batches(fn, batch_format="pyarrow")


def explode_tokens(ds, id_col: str, text_col: str, sep: str = " ",
                   out_col: str = "word", pos_col: str = "pos",
                   drop_empty: bool = True):
    """Split ``text_col`` on ``sep`` and unnest with ordinality —
    positions count every split piece (DuckDB ``string_split``), empty
    pieces dropped afterwards when ``drop_empty``."""

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column(text_col), sep)
        base = pa.table({id_col: t.column(id_col), "_toks": toks})
        out = _explode_table(base, "_toks", [id_col], out_col, pos_col)
        if drop_empty:
            out = out.filter(pc.not_equal(out.column(out_col), ""))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")
