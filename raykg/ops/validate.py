"""Schema / data-quality validation gate: evaluate a rule list over a
Dataset in one streaming pass and report per-rule violation counts —
the pre-ingest contract check a training-data pipeline runs before
accepting a new drop of data.

Scale shape: every rule is a vectorized Arrow predicate evaluated
per block; each block emits ONE row per rule (row count, violation
count, min violating id) — the exchange is O(blocks × rules), never
O(rows). All outputs are integers, so a SQL oracle (`count(*) FILTER`)
matches bit-exactly with no float concerns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def validate_rules(ds, rules: list[tuple], id_col: str) -> pd.DataFrame:
    """``rules`` is a list of ``(name, fn)`` where ``fn(batch)``
    returns a Boolean Arrow array marking VIOLATING rows. Returns one
    row per rule: ``(rule, n_rows, n_violations, first_bad_id)`` with
    ``first_bad_id`` the minimum violating ``id_col`` (None if no
    violations). Null predicate results count as non-violations."""
    names = [n for n, _ in rules]

    def part(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        out_n, out_v, out_first = [], [], []
        for _, fn in rules:
            mask = pc.fill_null(fn(t), False)
            out_n.append(t.num_rows)
            out_v.append(int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0))
            bad = pc.filter(ids, mask)
            out_first.append(pc.min(bad).as_py() if len(bad) else None)
        return pa.table({
            "rule": pa.array(names),
            "n_rows": pa.array(out_n, pa.int64()),
            "n_violations": pa.array(out_v, pa.int64()),
            "first_bad_id": pa.array(out_first, pa.int64()),
        })

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("rule", as_index=False, sort=False).agg(
        n_rows=("n_rows", "sum"),
        n_violations=("n_violations", "sum"),
        first_bad_id=("first_bad_id", "min"),
    )
    # preserve the caller's rule order
    agg["_ord"] = agg["rule"].map({n: i for i, n in enumerate(names)})
    agg = agg.sort_values("_ord").drop(columns="_ord").reset_index(drop=True)
    agg["n_rows"] = agg["n_rows"].astype("int64")
    agg["n_violations"] = agg["n_violations"].astype("int64")
    return agg


def k_anonymity(ds, quasi_cols: list[str], k: int = 5, coarse: int = 64):
    """k-anonymity audit over a quasi-identifier column set: every
    combination of ``quasi_cols`` values carried by FEWER than ``k``
    rows is a re-identification risk — the privacy gate run before a
    dataset leaves a curation pipeline.

    One streaming pass of per-block exact (combo, count) pre-counts
    (the grouped-entropy shape: the exchange is O(blocks × distinct
    combos), Zipf-bounded, never O(rows)), one coarse-bucket fold,
    then a count filter.  -> Dataset(*quasi_cols, n) of violating
    combos (n < k).
    """
    from raykg.util import hash_string_columns

    def part(t: pa.Table) -> pa.Table:
        df = t.select(quasi_cols).to_pandas()
        out = (df.groupby(quasi_cols, sort=False, dropna=False).size()
               .rename("n").reset_index())
        h = hash_string_columns(
            *[out[c].astype(str).tolist() for c in quasi_cols])
        out["_b"] = (h % coarse).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(quasi_cols, sort=False, dropna=False)["n"].sum()
               .reset_index())
        return agg[agg["n"] < k]

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(part, batch_format="pyarrow"), "_b", coarse,
        fold)


def referential_integrity(child_ds, child_key: str, parent_ds,
                          parent_key: str,
                          broadcast_limit_bytes: int = 64 << 20
                          ) -> tuple[int, int]:
    """Foreign-key audit: (child row count, orphan count) where an
    orphan is a child row whose key has no parent — the dbt-style
    relationship test run before accepting a refresh. Null child keys
    count as orphans (they reference nothing).

    Plan is adaptive on the PARENT's measured size (the auto_join
    rule): a dimension-sized parent (<= ``broadcast_limit_bytes``,
    metadata-derived for parquet) assembles its unique keys ON A
    WORKER and the whole audit is ONE streaming map over the child —
    no exchange at all, O(blocks) count rows to the driver. A parent
    too big to broadcast runs the Bloom-pruned anti join
    (``ops.joins.bloom_semi_join``): definite non-members
    short-circuit map-side; only maybe-members enter the exact
    exchange."""
    import ray

    keyed = child_ds.select_columns([child_key])
    try:
        sz = parent_ds.size_bytes()
    except Exception:
        sz = None
    if sz is not None and sz <= broadcast_limit_bytes:
        from raykg.ops.joins import _assemble_broadcast_side

        refs = parent_ds.select_columns([parent_key]).to_arrow_refs()
        keys_ref = _assemble_broadcast_side.remote(
            list(refs), parent_key, parent_key, True)

        def part(t: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            col = t.column(child_key)
            valid = col.is_valid().to_numpy(zero_copy_only=False)
            vals = col.fill_null(0).to_numpy(zero_copy_only=False)
            hit = np.isin(vals[valid], keys)
            return pa.table({
                "n": pa.array([t.num_rows], pa.int64()),
                "orph": pa.array(
                    [int((~hit).sum()) + int((~valid).sum())],
                    pa.int64()),
            })

        parts = keyed.map_batches(part, batch_format="pyarrow").to_pandas()
        return int(parts["n"].sum()), int(parts["orph"].sum())

    from raykg.ops.joins import bloom_semi_join

    def non_null(t: pa.Table) -> pa.Table:
        return t.filter(t.column(child_key).is_valid())

    n_child = keyed.count()
    present = keyed.map_batches(non_null, batch_format="pyarrow")
    n_null = n_child - present.count()
    orphans = bloom_semi_join(
        present, parent_ds.select_columns([parent_key]),
        on=child_key, right_on=parent_key, how="anti",
    ).count()
    return n_child, orphans + n_null


def uniqueness_audit(ds, key_cols: list[str], coarse: int = 64):
    """Primary-key / uniqueness-constraint audit: which ``key_cols``
    tuples occur more than once, and how often — the first check a
    warehouse load runs (and the precondition half the joins in a
    pipeline silently assume).

    Same shape as ``k_anonymity``: one streaming pass of per-block
    exact (combo, count) pre-counts, one coarse-bucket fold, then the
    ``n > 1`` filter — the exchange is O(blocks x distinct combos),
    never O(rows). -> Dataset(*key_cols, n) of duplicated key tuples
    with their multiplicities (exact int64; SQL ``HAVING count(*) >
    1`` matches bit-exactly).
    """
    from raykg.util import hash_string_columns

    def part(t: pa.Table) -> pa.Table:
        df = t.select(key_cols).to_pandas()
        out = (df.groupby(key_cols, sort=False, dropna=False).size()
               .rename("n").reset_index())
        h = hash_string_columns(
            *[out[c].astype(str).tolist() for c in key_cols])
        out["_b"] = (h % coarse).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(key_cols, sort=False, dropna=False)["n"].sum()
               .reset_index())
        return agg[agg["n"] > 1]

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(part, batch_format="pyarrow"), "_b", coarse,
        fold)


def suppress_small_groups(ds, quasi_cols: list[str], k: int = 5,
                          id_col: str | None = None, coarse: int = 64):
    """k-anonymity REPAIR by suppression: drop every row whose
    quasi-identifier combination is carried by fewer than ``k`` rows —
    the enforcement counterpart of :func:`k_anonymity` (audit). The
    surviving dataset is k-anonymous over ``quasi_cols`` by
    construction.

    Plan: the violating-combo relation from :func:`k_anonymity`
    (Zipf-bounded pre-counts, one coarse-bucket fold) is joined back
    as an ANTI-join on a packed combo key. The combo relation is
    measured and broadcast while dimension-sized (``auto_join``),
    shuffled beyond — rows stream through one map otherwise.

    Null quasi values participate as their own combo value (pandas
    ``dropna=False`` grouping == SQL ``PARTITION BY`` null equality).
    Combo keys are hashed from ARROW-cast strings (stable per column
    across blocks) — pandas ``astype(str)`` would widen a nullable
    int block to float ('5.0' vs '5') and split a combo across
    blocks. -> the input Dataset filtered to surviving rows (same
    columns).
    """
    from raykg.ops.joins import auto_join
    from raykg.util import hash_string_columns

    _NULLS = "\x00<null>"

    def _combo_hash(t: pa.Table) -> np.ndarray:
        cols = []
        for c in quasi_cols:
            s = pc.fill_null(pc.cast(t.column(c), pa.string()), _NULLS)
            cols.append(s.to_pylist())
        return hash_string_columns(*cols).astype(np.int64)

    def pack_rows(t: pa.Table) -> pa.Table:
        return t.append_column("_combo", pa.array(_combo_hash(t)))

    # census over the hashed combo (the k_anonymity pre-count plan,
    # but keyed by the stable combo hash end-to-end)
    def census(t: pa.Table) -> pa.Table:
        h = _combo_hash(t)
        combo, cnt = np.unique(h, return_counts=True)
        return pa.table({
            "_combo": pa.array(combo),
            "n": pa.array(cnt.astype(np.int64)),
            "_b": pa.array((combo.view(np.uint64)
                            % np.uint64(coarse)).astype(np.int32)),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("_combo", as_index=False)["n"].sum()
        return agg[agg["n"] < k][["_combo"]]

    from raykg.ops.exchange import hash_exchange

    bad_keys = hash_exchange(
        ds.map_batches(census, batch_format="pyarrow"), "_b", coarse,
        fold).materialize()

    keep_cols = list(ds.schema().names)
    types = dict(zip(ds.schema().names, ds.schema().types))
    out = auto_join(
        ds.map_batches(pack_rows, batch_format="pyarrow"), bad_keys,
        on="_combo", how="anti", left_cols=keep_cols,
        left_types={"_combo": pa.int64(),
                    **{c: types[c] for c in keep_cols}},
        right_types={"_combo": pa.int64()})

    def strip(t: pa.Table) -> pa.Table:
        return t.select(keep_cols)

    return out.map_batches(strip, batch_format="pyarrow")
