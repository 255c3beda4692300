"""Slowly-changing-dimension type-2 history build: fold an ordered
sequence of full dimension snapshots into per-key version intervals
``[valid_from, valid_to)`` with an ``is_current`` flag — the lakehouse
primitive behind every "as of snapshot s, what did this row look
like?" query, and the temporal complement of ``ops.diff`` (diff
compares TWO snapshots; SCD2 folds ALL of them into history).

Scale shape: every snapshot is tagged with its ordinal and streamed
into ONE key-bucketed exchange (hash(key) % coarse — the
many-keys-per-call pattern, scheduling per bucket, never per key).
Inside a bucket, version boundaries are found with one vectorized
pass over the (key, snap)-sorted rows: a version starts where the
key changes, where the snapshot ordinal jumps (the key was absent in
between — a delete + re-add is two versions, not one), or where the
row's value hash changes.  Values are compared through the same
length-prefixed FNV row hash as ``ops.diff`` (NULL sentinel included),
so a false "unchanged" needs a 64-bit collision between two versions
of one key.  Nothing materializes on the driver.

Interval convention: ``valid_to = last_snap + 1`` uniformly — the
snapshot at which the version stopped being visible (because the
value changed, the key was deleted, or, for current rows, one past
the final snapshot).  Current rows therefore carry the open-ended
sentinel ``n_snapshots + 1`` rather than NULL: the output stays pure
int64 (a nullable valid_to would widen to float64 through pandas and
lose exactness above 2^53) and ``is_current`` carries the
distinction.

Partitioning assumption: one key's full history (<= n_snapshots rows
per key per bucket times keys/bucket) fits a task; raise ``coarse``
with dimension size.  Snapshot count is the SMALL axis (dozens), key
count the large one.

Reference tie-in: the reference rebuilds its entity KB by re-COPYing
full Postgres snapshots per run (scripts/postgres_populate_entities
.py); this operator is what turns that chain of full snapshots into
a queryable change history without N^2 pairwise diffs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raykg.util import hash_string_columns

_NULL_SENTINEL = "\x00raykg-null\x00"
SCD_BUCKETS = 64


def scd2_history(snapshots, key: str, value_cols: list[str],
                 coarse: int = SCD_BUCKETS):
    """``snapshots``: ordered list of Datasets (oldest first), each a
    full dimension snapshot with unique ``key``.  -> Dataset(key,
    *value_cols, valid_from, valid_to, is_current) — one row per
    version, intervals ``[valid_from, valid_to)`` in 1-based snapshot
    ordinals, ``valid_to = n_snapshots + 1`` for current versions."""
    n_snaps = len(snapshots)
    if n_snaps == 0:
        raise ValueError("scd2_history needs at least one snapshot")

    def tag(snap_id: int):
        def fn(t: pa.Table) -> pa.Table:
            cols = [
                t.column(c).cast(pa.string()).fill_null(_NULL_SENTINEL)
                .to_pylist()
                for c in value_cols
            ]
            h = hash_string_columns(*cols).view(np.int64)
            kc = t.column(key)
            if pa.types.is_string(kc.type) or \
                    pa.types.is_large_string(kc.type):
                from raykg.util import hash_strings
                b = hash_strings(kc.to_pylist()) % np.uint64(coarse)
            else:
                k = kc.to_numpy(zero_copy_only=False)
                b = (k.astype(np.uint64) * np.uint64(2654435761)) \
                    % np.uint64(coarse)
            out = t.select([key] + value_cols)
            out = out.append_column(
                "_snap", pa.array(np.full(len(t), snap_id, np.int64)))
            out = out.append_column("_vh", pa.array(h))
            return out.append_column(
                "_b", pa.array(b.astype(np.int32)))
        return fn

    tagged = snapshots[0].map_batches(tag(1), batch_format="pyarrow")
    for i, snap in enumerate(snapshots[1:], start=2):
        tagged = tagged.union(
            snap.map_batches(tag(i), batch_format="pyarrow"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):        # empty bucket (the exchange types it)
            out = g[[key] + value_cols].copy()
            out["valid_from"] = np.array([], np.int64)
            out["valid_to"] = np.array([], np.int64)
            out["is_current"] = np.array([], bool)
            return out
        k = g[key].to_numpy()
        snap = g["_snap"].to_numpy()
        order = np.lexsort((snap, k))
        k, snap = k[order], snap[order]
        vh = g["_vh"].to_numpy()[order]
        # version start: key boundary, snapshot gap (absent in
        # between), or value change
        start = np.ones(len(k), dtype=bool)
        if len(k) > 1:
            start[1:] = ((k[1:] != k[:-1])
                         | (snap[1:] != snap[:-1] + 1)
                         | (vh[1:] != vh[:-1]))
        sidx = np.flatnonzero(start)
        last = np.empty(len(sidx), dtype=np.int64)
        last[:-1] = sidx[1:] - 1
        last[-1] = len(k) - 1
        out = g.iloc[order[sidx]][[key] + value_cols].reset_index(
            drop=True)
        out["valid_from"] = snap[sidx]
        last_snap = snap[last]
        out["valid_to"] = last_snap + 1
        out["is_current"] = last_snap == n_snaps
        return out

    # raw-task routing exchange (raykg.ops.exchange): the bucket
    # column already encodes the partitioning
    from raykg.ops.exchange import hash_exchange

    return hash_exchange(tagged, "_b", coarse, per_bucket)


def snapshot_as_of(history_ds, snap: int):
    """Point-in-time read over an SCD2 history: the rows visible at
    snapshot ordinal ``snap`` (1-based) — one stateless Arrow filter,
    no shuffle.  Composes with ``scd2_history`` to reconstruct any
    input snapshot exactly (tested law: as_of(s) == snapshot s)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.less_equal(t.column("valid_from"), pa.scalar(snap)),
            pc.greater(t.column("valid_to"), pa.scalar(snap)))
        return t.filter(m).drop_columns(
            ["valid_from", "valid_to", "is_current"])

    return history_ds.map_batches(fn, batch_format="pyarrow")
