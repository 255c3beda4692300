"""Snapshot diff between two versions of a keyed table — the audit
step every incremental pipeline runs before publishing a refresh
("what changed since the last build?"): rows ``added``, ``removed``,
or ``changed`` between an old and a new snapshot.

Scale shape: each side is reduced per batch to ``(key, row-hash)`` —
a streaming map that ships 16 bytes/row no matter how wide the table
— then the two hash streams meet in ONE full-outer
``ops.joins.hash_join`` shuffle; classification is a final stateless
map over the joined pairs.  Nothing ever materializes on the driver,
and ``unchanged`` rows (the overwhelming majority of a typical
refresh) are dropped inside the classify map, so the output is
O(changes).

The row hash is the length-prefixed FNV fold of every compare
column's string form (``hash_string_columns``) with a sentinel for
NULL that no real value collides with; a false "unchanged" requires a
64-bit collision between the two versions of ONE key's row
(~5e-20 per key).  The SQL oracle compares column VALUES via
``IS DISTINCT FROM`` — equivalent modulo that collision odds.

Keys are assumed unique within each snapshot (snapshot semantics);
duplicate keys raise in the classify stage rather than silently
mis-pairing.

Reference tie-in: the reference's incremental KB rebuilds decide what
to (re)encode by comparing entity snapshots between runs
(scripts/postgres_populate_entities.py re-COPYies everything); this
operator is the delta pass that makes such a rebuild incremental.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from raykg.ops.joins import auto_join, hash_join
from raykg.util import hash_string_columns

ENRICH_BROADCAST_CHANGES = 1 << 18


@ray.remote
def _merge_enrich(diff_refs, side_refs, key, cols, col_types):
    """Worker task: left-merge the O(changes) diff with the filtered
    side rows; value columns come back as Arrow with their ORIGINAL
    types (nulls for removed keys), matching the hash_join plan."""
    def cat(refs):
        blocks = [b for b in ray.get(list(refs)) if b.num_rows]
        return pa.concat_tables(blocks) if blocks else None

    d_t = cat(diff_refs)
    if d_t is None:
        return pa.table({key: pa.array([], pa.int64()),
                         "status": pa.array([], pa.string()),
                         **{c: pa.array([], col_types[c]) for c in cols}})
    d = d_t.to_pandas()
    s_t = cat(side_refs)
    s = (s_t.to_pandas() if s_t is not None
         else pd.DataFrame({c: [] for c in [key] + cols}))
    m = d.merge(s, on=key, how="left")
    arrs = {key: pa.Array.from_pandas(m[key], type=d_t.schema.field(key).type),
            "status": pa.Array.from_pandas(m["status"], type=pa.string())}
    for c in cols:
        arrs[c] = pa.Array.from_pandas(m[c], type=col_types[c])
    return pa.table(arrs)

_NULL_SENTINEL = "#NULL#"


def _hashed(ds, key: str, compare_cols: list[str], out: str):
    def fn(t: pa.Table) -> pa.Table:
        cols = [
            t.column(c).cast(pa.string()).fill_null(_NULL_SENTINEL)
            .to_pylist()
            for c in compare_cols
        ]
        # decimal-string form: int64 hash columns would widen to
        # float64 (lossy above 2^53) when the outer join introduces
        # NaN for absent rows; strings stay exact and absent -> None
        h = hash_string_columns(*cols).view(np.int64).astype("<U20")
        return pa.table({key: t.column(key), out: pa.array(h)})

    return ds.map_batches(fn, batch_format="pyarrow")


def table_diff(old_ds, new_ds, key: str, compare_cols: list[str],
               key_type: pa.DataType | None = None):
    """-> Dataset(key, status) with status in
    {'added', 'removed', 'changed'}; unchanged rows are dropped."""
    kt = key_type or pa.int64()
    joined = hash_join(
        _hashed(old_ds, key, compare_cols, "h_old"),
        _hashed(new_ds, key, compare_cols, "h_new"),
        on=key, left_cols=["h_old"], right_cols=["h_new"], how="outer",
        left_types={key: kt, "h_old": pa.string()},
        right_types={key: kt, "h_new": pa.string()},
    )

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        if df[key].duplicated().any():
            dup = df[key][df[key].duplicated()].iloc[0]
            raise ValueError(
                f"duplicate key {dup!r}: table_diff needs snapshot "
                "semantics (unique keys per side)"
            )
        old_absent = df["h_old"].isna()
        new_absent = df["h_new"].isna()
        status = np.where(
            old_absent, "added",
            np.where(new_absent, "removed",
                     np.where(df["h_old"] != df["h_new"], "changed",
                              "")))
        out = pd.DataFrame({key: df[key], "status": status})
        return out[out["status"] != ""]

    # batch_size=None: one call per join-output BLOCK. A key's rows
    # never split across blocks (they share a join bucket task), so
    # the duplicate-key guard above sees every copy together.
    return joined.map_batches(classify, batch_format="pandas",
                              batch_size=None)


def enrich_changes(diff_ds, new_ds, key: str, cols: list[str],
                   key_type: pa.DataType | None = None,
                   col_types: dict[str, pa.DataType] | None = None):
    """Turn ``table_diff``'s (key, status) stream into a full CDC
    change stream ``(key, status, *cols)`` by pulling the NEW side's
    values for added/changed keys: one left hash-join shuffle of the
    O(changes) diff against the new snapshot — 'removed' keys have no
    new row and keep nulls for every value column.  Composes as
    ``apply_changes(old, enrich_changes(table_diff(old, new), new))``
    == new (the roundtrip law, pinned in tests/test_ops.py)."""
    kt = key_type or pa.int64()
    # adaptive: a small diff (the common CDC case) broadcasts its keys,
    # the new snapshot streams ONE map-side filter pass, and a worker
    # task does the O(changes) merge — no exchange after the diff
    diff_ds = diff_ds.materialize()
    if diff_ds.count() <= ENRICH_BROADCAST_CHANGES:
        from raykg.ops.joins import _assemble_broadcast_side

        keys_ref = _assemble_broadcast_side.remote(
            list(diff_ds.select_columns([key]).to_arrow_refs()),
            key, key, True)

        def filt(t: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            hit = np.isin(
                t.column(key).to_numpy(zero_copy_only=False), keys)
            return t.select([key] + cols).filter(pa.array(hit))

        filtered = new_ds.map_batches(
            filt, batch_format="pyarrow").materialize()
        ctypes = {c: filtered.schema().base_schema.field(c).type
                  for c in cols}
        ref = _merge_enrich.remote(
            list(diff_ds.to_arrow_refs()),
            list(filtered.to_arrow_refs()), key, cols, ctypes)
        return rd.from_arrow_refs([ref])
    # explicit types keep a lazy new_ds from executing for schema();
    # they must cover every requested right column, so only pass them
    # when col_types does (parquet reads infer from metadata for free)
    rt = None
    if col_types is not None and all(c in col_types for c in cols):
        rt = {key: kt, **col_types}
    return hash_join(
        diff_ds, new_ds, on=key,
        left_cols=["status"], right_cols=cols, how="left",
        left_types={key: kt, "status": pa.string()}, right_types=rt,
    )


def apply_changes(snapshot_ds, changes_ds, key: str, cols: list[str],
                  change_col: str = "status",
                  key_type: pa.DataType | None = None,
                  col_types: dict[str, pa.DataType] | None = None):
    """The publish step after ``table_diff``: apply a compacted CDC
    change stream to a snapshot and return the new snapshot.

    ``changes_ds`` rows are ``(key, status, *cols)`` with status in
    {'added', 'changed', 'removed'} (``table_diff`` vocabulary; the
    CDC synonyms insert/update/delete are accepted) and at most one
    change per key — a compacted stream, which is what ``table_diff``
    + ``enrich_changes`` emit by construction.  Scale shape: ONE anti
    hash-join shuffle removes every changed key's old row (removed/
    changed displace it; added keys have no old row, and the anti-join
    ignores them for free), then the non-delete change rows union in
    as a streaming concat — no driver materialization, output stays a
    Dataset of ``[key] + cols``.

    ``changes_ds`` feeds BOTH consumers (anti-join keys and upsert
    rows), so it is materialized once into the object store here —
    legitimate for a CDC stream, which is O(changes), not O(table);
    without it a lazy upstream (e.g. the whole table_diff chain)
    would execute twice.
    """
    changes_ds = changes_ds.materialize()
    kt = key_type or pa.int64()
    lt = None
    if col_types is not None and all(c in col_types for c in cols):
        lt = {key: kt, **col_types}
    # changes is materialized (size known): auto_join takes the
    # broadcast map-side anti filter for the common small-CDC case
    survivors = auto_join(
        snapshot_ds, changes_ds, on=key, left_cols=cols,
        right_cols=[], how="anti",
        left_types=lt, right_types={key: kt},
    )

    def upserts(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(
            t.column(change_col),
            value_set=pa.array(["removed", "delete"])))
        return t.filter(mask).select([key] + cols)

    incoming = changes_ds.map_batches(upserts, batch_format="pyarrow")
    return survivors.union(incoming)
