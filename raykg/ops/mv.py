"""Incremental materialized-view maintenance: apply an O(changes) CDC
stream to a STORED grouped SUM/COUNT aggregate without rescanning the
base table — the delta-maintenance rule for distributive aggregates
(each changed row contributes -old to its old group and +new to its
new group; classic self-maintainable-view result, Gupta & Mumick
1995, "Maintenance of Materialized Views: Problems, Techniques, and
Applications").

Scale shape — ADAPTIVE on the measured change count (the same
broadcast-vs-shuffle planner as MinHash verification and the sharded
triples-uri map):

  * small change set (<= ``MV_BROADCAST_CHANGES``, the common nightly
    refresh): the change keys assemble ON A WORKER into the object
    store; each snapshot streams ONE map-side filter pass (no
    exchange) and the O(changes) survivors merge in a worker task —
    three map jobs total after the diff;
  * large change set: the table_diff key set Bloom-prunes each
    snapshot before tagged-union ``hash_join`` value joins — no full
    snapshot is shuffled a second time, no size assumption;
  * fold: small deltas broadcast and apply MAP-SIDE over the stored
    MV (one membership pass finds which delta groups already exist,
    one fold pass rewrites; groups born in the delta union in as a
    tiny source); large deltas pre-aggregate per block and fold
    through one outer ``hash_join``. Groups whose row count reaches
    zero drop out either way.

Float caveat: delta application reassociates the sum, so float SUM
columns agree with a from-scratch rebuild only to float64 rounding —
round money-style columns for bit-stable comparison (the MV query
oracle rounds to 2 decimals on both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from raykg.ops.diff import table_diff
from raykg.ops.joins import bloom_semi_join, hash_join

MV_BROADCAST_CHANGES = 1 << 18


@ray.remote
def _assemble_changes(diff_refs, old_refs, new_refs, key, cols):
    """Worker task: merge the (key, status) diff with both sides'
    filtered value rows into ONE O(changes) change table. The driver
    routes refs only."""

    def cat(refs):
        blocks = [b for b in ray.get(list(refs)) if b.num_rows]
        return (pa.concat_tables(blocks).to_pandas() if blocks else None)

    d = cat(diff_refs)
    if d is None:
        cols_out = ([key, "status"] + [f"old_{c}" for c in cols]
                    + [f"new_{c}" for c in cols])
        return pa.table({c: pa.array([]) for c in cols_out})
    for prefix, refs in (("old_", old_refs), ("new_", new_refs)):
        side = cat(refs)
        if side is None:
            for c in cols:
                d[f"{prefix}{c}"] = np.nan
            continue
        side = side.rename(
            columns={c: f"{prefix}{c}" for c in cols})
        for c in cols:  # float64: the join null-pads absent sides
            side[f"{prefix}{c}"] = side[f"{prefix}{c}"].astype("float64")
        d = d.merge(side, on=key, how="left")
    return pa.Table.from_pandas(d, preserve_index=False)


def changes_with_both_sides(old_ds, new_ds, key: str, cols: list[str],
                            key_type: pa.DataType | None = None):
    """-> Dataset(key, status, old_<c>..., new_<c>...) — the CDC stream
    carrying BOTH sides' values (what aggregate maintenance needs;
    ``diff.enrich_changes`` carries only the new side). Values travel
    as float64: the left joins null-pad the absent side of added/
    removed keys, which widens ints anyway — callers narrow back
    where exactness matters (group ids are < 2^53, so the trip is
    lossless)."""
    kt = key_type or pa.int64()
    diff = table_diff(old_ds, new_ds, key, cols,
                      key_type=kt).materialize()

    if diff.count() <= MV_BROADCAST_CHANGES:
        # small change set: one map-side filter pass per snapshot (no
        # exchange), worker-assembled merge — the driver holds refs only
        key_refs = diff.select_columns([key]).to_arrow_refs()
        from raykg.ops.joins import _assemble_broadcast_side

        keys_ref = _assemble_broadcast_side.remote(
            list(key_refs), key, key, True)

        def filter_changed(t: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            hit = np.isin(
                t.column(key).to_numpy(zero_copy_only=False), keys)
            return t.select([key] + cols).filter(pa.array(hit))

        old_refs = old_ds.map_batches(
            filter_changed, batch_format="pyarrow").to_arrow_refs()
        new_refs = new_ds.map_batches(
            filter_changed, batch_format="pyarrow").to_arrow_refs()
        table_ref = _assemble_changes.remote(
            list(diff.to_arrow_refs()), list(old_refs), list(new_refs),
            key, cols)
        return rd.from_arrow_refs([table_ref])

    def pruned_side(snap_ds, prefix: str):
        def ren(t: pa.Table) -> pa.Table:
            arrs = [t.column(key)] + [
                t.column(c).cast(pa.float64()) for c in cols]
            return pa.table(
                dict(zip([key] + [f"{prefix}{c}" for c in cols], arrs)))

        return bloom_semi_join(
            snap_ds, diff, on=key, left_cols=cols, how="semi",
        ).map_batches(ren, batch_format="pyarrow")

    old_types = {key: kt, **{f"old_{c}": pa.float64() for c in cols}}
    new_types = {key: kt, **{f"new_{c}": pa.float64() for c in cols}}
    step = hash_join(
        diff, pruned_side(old_ds, "old_"), on=key,
        left_cols=["status"],
        right_cols=[f"old_{c}" for c in cols], how="left",
        left_types={key: kt, "status": pa.string()},
        right_types=old_types,
    )
    return hash_join(
        step, pruned_side(new_ds, "new_"), on=key,
        left_cols=["status"] + [f"old_{c}" for c in cols],
        right_cols=[f"new_{c}" for c in cols], how="left",
        left_types={key: kt, "status": pa.string(),
                    **{f"old_{c}": pa.float64() for c in cols}},
        right_types=new_types,
    )


def refresh_grouped_sum(
    base_mv_ds,
    changes2_ds,
    group_col: str,
    sum_cols: list[str],
    count_col: str = "n_rows",
    group_type: pa.DataType | None = None,
):
    """Fold a two-sided change stream (``changes_with_both_sides``
    output whose ``cols`` included ``group_col`` and every sum
    column) into a stored grouped aggregate
    ``(group_col, count_col, sum_<c>...)``. Returns the refreshed MV
    with empty groups dropped — equal (mod float reassociation) to
    recomputing the aggregate over the new snapshot, the law pinned
    in tests/test_ops.py."""
    gt = group_type or pa.int64()
    mv_cols = [count_col] + [f"sum_{c}" for c in sum_cols]

    def contribs(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            _contrib_frame(t.to_pandas(), group_col, sum_cols, count_col),
            preserve_index=False)

    changes2_ds = changes2_ds.materialize()  # O(changes) by contract
    if changes2_ds.count() <= MV_BROADCAST_CHANGES:
        return _refresh_small(base_mv_ds, changes2_ds, group_col,
                              sum_cols, count_col)

    from ray.data.aggregate import Sum

    aggs = [Sum(count_col, alias_name=count_col)]
    aggs += [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sum_cols]
    delta = (changes2_ds.map_batches(contribs, batch_format="pyarrow")
             .groupby(group_col).aggregate(*aggs))

    def renamed_delta(t: pa.Table) -> pa.Table:
        name_map = {group_col: group_col,
                    **{c: f"_d_{c}" for c in mv_cols}}
        return t.rename_columns([name_map[n] for n in t.schema.names])

    joined = hash_join(
        base_mv_ds,
        delta.map_batches(renamed_delta, batch_format="pyarrow"),
        on=group_col,
        left_cols=mv_cols,
        right_cols=[f"_d_{c}" for c in mv_cols],
        how="outer",
        left_types={group_col: gt, count_col: pa.int64(),
                    **{f"sum_{c}": pa.float64() for c in sum_cols}},
        right_types={group_col: gt, **{
            f"_d_{c}": (pa.int64() if c == count_col else pa.float64())
            for c in mv_cols}},
    )

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n = (df[count_col].fillna(0)
             + df[f"_d_{count_col}"].fillna(0)).astype("int64")
        out = pd.DataFrame({group_col: df[group_col], count_col: n})
        for c in sum_cols:
            out[f"sum_{c}"] = (df[f"sum_{c}"].fillna(0.0)
                               + df[f"_d_sum_{c}"].fillna(0.0))
        out = out[out[count_col] > 0]
        out[group_col] = out[group_col].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return joined.map_batches(fold, batch_format="pyarrow")


def _contrib_frame(df: pd.DataFrame, group_col, sum_cols,
                   count_col) -> pd.DataFrame:
    """(-old, +new) contributions of a two-sided change frame,
    pre-aggregated to one delta row per touched group."""
    parts = []
    for prefix, sign in (("old_", -1), ("new_", 1)):
        g = df[f"{prefix}{group_col}"]
        has = g.notna()
        if has.any():
            p = pd.DataFrame({group_col: g[has], count_col: sign})
            for c in sum_cols:
                p[f"sum_{c}"] = (
                    sign * df.loc[has, f"{prefix}{c}"].to_numpy())
            parts.append(p)
    if not parts:
        empty = pd.DataFrame({
            group_col: pd.Series([], dtype="int64"),
            count_col: pd.Series([], dtype="int64")})
        for c in sum_cols:
            empty[f"sum_{c}"] = pd.Series([], dtype="float64")
        return empty
    out = pd.concat(parts, ignore_index=True)
    out = out.groupby(group_col, as_index=False).sum()
    out[group_col] = out[group_col].astype("int64")
    out[count_col] = out[count_col].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)


@ray.remote
def _delta_table(change_refs, group_col, sum_cols, count_col):
    blocks = [b for b in ray.get(list(change_refs)) if b.num_rows]
    if not blocks:
        return pa.Table.from_pandas(
            _contrib_frame(pd.DataFrame({
                f"old_{group_col}": [], f"new_{group_col}": []}),
                group_col, sum_cols, count_col), preserve_index=False)
    df = pa.concat_tables(blocks).to_pandas()
    return pa.Table.from_pandas(
        _contrib_frame(df, group_col, sum_cols, count_col),
        preserve_index=False)


def _refresh_small(base_mv_ds, changes2_ds, group_col, sum_cols,
                   count_col):
    """Map-side MV fold for a small delta: the whole delta computes in
    one worker task and broadcasts; the stored MV streams one
    membership pass (which delta groups already exist — O(touched)
    rows to the driver, bounded by the broadcast threshold) and one
    fold pass; groups born in the delta union in as a tiny source.
    Zero exchanges beyond what built the inputs."""
    delta_ref = _delta_table.remote(
        list(changes2_ds.to_arrow_refs()), group_col, sum_cols,
        count_col)
    base_mv = base_mv_ds.materialize()
    sum_names = [f"sum_{c}" for c in sum_cols]

    def member(t: pa.Table) -> pa.Table:
        d = ray.get(delta_ref)
        dg = d.column(group_col).to_numpy(zero_copy_only=False)
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        return pa.table({group_col: pa.array(
            g[np.isin(g, dg)].astype(np.int64))})

    consumed = np.asarray(
        [r[group_col] for r in
         base_mv.map_batches(member, batch_format="pyarrow").take_all()],
        dtype=np.int64)

    def fold_block(t: pa.Table) -> pa.Table:
        d = ray.get(delta_ref)
        dg = d.column(group_col).to_numpy(zero_copy_only=False)
        df = t.to_pandas()
        if len(dg):
            g = df[group_col].to_numpy()
            pos = np.clip(np.searchsorted(dg, g), 0, len(dg) - 1)
            hit = dg[pos] == g
            dn = d.column(count_col).to_numpy(zero_copy_only=False)
            df[count_col] = (df[count_col].to_numpy()
                             + np.where(hit, dn[pos], 0)).astype("int64")
            for c in sum_names:
                dv = d.column(c).to_numpy(zero_copy_only=False)
                df[c] = df[c].to_numpy() + np.where(hit, dv[pos], 0.0)
            df = df[df[count_col] > 0]
        return pa.Table.from_pandas(
            df[[group_col, count_col] + sum_names], preserve_index=False)

    folded = base_mv.map_batches(fold_block, batch_format="pyarrow")

    d = ray.get(delta_ref)
    dd = d.to_pandas()
    born = dd[~dd[group_col].isin(consumed) & (dd[count_col] > 0)]
    if len(born) == 0:
        return folded
    born = born[[group_col, count_col] + sum_names].reset_index(drop=True)
    born[group_col] = born[group_col].astype("int64")
    born[count_col] = born[count_col].astype("int64")
    return folded.union(rd.from_pandas(born))
