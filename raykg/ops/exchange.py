"""Raw-task hash exchange — a drop-in for the
``ds.groupby(bucket_col).map_groups(fn, batch_format="pandas")`` plan
when the group key is a precomputed COARSE bucket column (the
sessionize/asof/SCD2 convention: operators bucket their real keys into
``coarse`` hash buckets and treat each bucket as one group task).

Ray Data executes that plan as a sort-based shuffle whose fixed cost
(sample pass + boundary broadcast + 2-stage sort, measured 4-7 s PER
EXCHANGE at 256 buckets on this host for <1 s of remote compute)
dominates micro/medium inputs. The bucket column makes the sort
pointless — rows only need ROUTING: one raw split task per input block
slices it into per-bucket sub-tables (typed slices, so empty buckets
stay typed), one merge task per bucket concatenates its parts and runs
``fn`` once over the whole bucket. The driver routes O(blocks × coarse)
ObjectRefs and never touches rows — the pagerank/MST manual-exchange
precedent generalized.

Semantics match ``groupby(bucket).map_groups(fn)`` when (a) ``fn``
handles a whole bucket (all callers with a bucket column already do —
they re-group by the real key inside), (b) ``fn`` does not rely on
input row order (the sort-shuffle never guaranteed a useful one), and
(c) ``fn`` of an empty, correctly-typed frame returns the typed empty
output (the zero-row-bucket case the groupby plan simply omitted).

Scale shape: identical exchange volume to the groupby (every row moves
once), minus the sample pass and sort. Driver ref routing is the only
super-linear term — O(blocks × coarse) in the flat plan — so beyond
``HX_MAX_REFS`` the exchange goes HIERARCHICAL (two-level): each block
splits into F << coarse SUPER-buckets, groups of per-super parts are
re-split into the final buckets by intermediate combine tasks, and one
merge task per final bucket runs ``fn``. Refs become
O(blocks·F + coarse·blocks/g + coarse) with F and g sized to the
budget, so the raw-task fast path survives the 100 TB block counts
(10^5 blocks × 256 buckets) where the flat plan would have reverted to
Ray's sort shuffle. Only when even the two-level plan cannot fit the
ref budget (blocks > HX_MAX_REFS/4) does the exchange fall back to the
sort-based shuffle — a safety valve, not the design point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _slice_by_key(tbl: pa.Table, keys: np.ndarray, n: int):
    """-> n typed slices of ``tbl`` grouped by ``keys`` (values in
    [0, n)); empty groups stay typed zero-row slices."""
    order = np.argsort(keys, kind="stable")
    t2 = tbl.take(pa.array(order))
    ks = keys[order]
    bounds = np.searchsorted(ks, np.arange(n + 1))
    return [t2.slice(int(bounds[j]), int(bounds[j + 1] - bounds[j]))
            for j in range(n)]


def _bucket_values(tbl: pa.Table, bucket_col: str,
                   coarse: int) -> np.ndarray:
    return (tbl.column(bucket_col).to_numpy(zero_copy_only=False)
            .astype(np.int64)) % coarse


@ray.remote
def _hx_split(tbl, bucket_col: str, coarse: int):
    if not isinstance(tbl, pa.Table):
        tbl = pa.Table.from_pandas(tbl, preserve_index=False)
    if tbl.num_rows == 0 and bucket_col not in tbl.column_names:
        # schema-less zero-row union artifact: nothing to type slices
        # from — merge tasks skip these (the all-blocks-schema-less
        # case is guarded at the driver via ds.schema())
        return [None] * coarse if coarse > 1 else None
    out = _slice_by_key(tbl, _bucket_values(tbl, bucket_col, coarse),
                        coarse)
    return out if coarse > 1 else out[0]


@ray.remote
def _hx_split_super(tbl, bucket_col: str, coarse: int, span: int,
                    n_super: int):
    """Level-1 of the hierarchical exchange: slice one block into
    ``n_super`` SUPER-buckets (final bucket // span)."""
    if not isinstance(tbl, pa.Table):
        tbl = pa.Table.from_pandas(tbl, preserve_index=False)
    if tbl.num_rows == 0 and bucket_col not in tbl.column_names:
        return [None] * n_super
    f = _bucket_values(tbl, bucket_col, coarse) // span
    out = _slice_by_key(tbl, f, n_super)
    return out if n_super > 1 else out[0]


@ray.remote
def _hx_subsplit(bucket_col: str, coarse: int, span: int, f: int,
                 n_local: int, *parts):
    """Level-2: concatenate a group of per-super parts and re-slice
    into that super-bucket's ``n_local`` FINAL buckets."""
    tabs = [p for p in parts if p is not None]
    if not tabs:
        return [None] * n_local if n_local > 1 else None
    try:
        t = pa.concat_tables(tabs, promote_options="permissive")
    except TypeError:                       # older pyarrow
        t = pa.concat_tables(tabs, promote=True)
    local = _bucket_values(t, bucket_col, coarse) - f * span
    out = _slice_by_key(t, local, n_local)
    return out if n_local > 1 else out[0]


@ray.remote
def _hx_merge(fn, arrow, *parts):
    tabs = [p for p in parts if p is not None]
    if not tabs:
        # unreachable when any input block is typed (typed blocks emit
        # typed zero-row slices for EVERY bucket); the all-blocks-
        # schema-less case never enters the raw-task plan — see the
        # ds.schema() guard in hash_exchange
        return pa.table({})
    try:
        t = pa.concat_tables(tabs, promote_options="permissive")
    except TypeError:                       # older pyarrow
        t = pa.concat_tables(tabs, promote=True)
    out = fn(t if arrow else t.to_pandas())
    if isinstance(out, pa.Table):
        return out
    return pa.Table.from_pandas(out, preserve_index=False)


# adaptive sizing: aim for this many rows per merge task — below it the
# per-task fixed cost (scheduling + fn pickle) dominates the group work
HX_ROWS_PER_BUCKET = 65_536

# driver-routed ObjectRef budget per exchange: above it the flat
# blocks x coarse plan switches to the two-level hierarchy; above what
# even the hierarchy can satisfy (blocks > HX_MAX_REFS/4), to Ray's
# sort shuffle
HX_MAX_REFS = 1 << 20


def _hierarchical_exchange(block_refs, bucket_col: str, coarse: int,
                           fn, arrow: bool):
    """Two-level exchange for blocks × coarse > HX_MAX_REFS.

    Level 1 splits each block into F super-buckets (F·blocks ≤
    budget/2); level 2 combines groups of g per-super parts and
    re-slices them into the final buckets (coarse·blocks/g ≤
    budget/2); level 3 merges per final bucket and runs ``fn``. Every
    row still moves exactly twice (split → combine) before its merge —
    the extra hop is the price of keeping the driver's routing table
    sub-linear in blocks × coarse."""
    import ray.data as rd

    n_blocks = len(block_refs)
    f_cap = min(coarse, HX_MAX_REFS // (2 * n_blocks))
    if f_cap < 2:
        return None  # cannot fit the budget even hierarchically
    # group size g: level-2 refs total ~ coarse * blocks/g <= budget/2
    g = max(1, -(-2 * n_blocks * coarse // HX_MAX_REFS))
    # super-bucket count F: SMALLEST that bounds a combine task's
    # working set (~8 source blocks of data: g parts of ~1/F block
    # each), capped by the ref budget (blocks x F <= budget/2).
    # Level-2 task count is F x blocks/g, so small F keeps the task
    # count near the unavoidable blocks/g floor instead of exploding
    # toward blocks x coarse.
    n_super = max(2, min(f_cap, -(-g // 8)))
    span = -(-coarse // n_super)            # final buckets per super
    n_super = -(-coarse // span)            # actual supers used

    supers = [
        _hx_split_super.options(num_returns=n_super).remote(
            b, bucket_col, coarse, span, n_super)
        for b in block_refs
    ]
    if n_super == 1:                        # defensive; n_super >= 2
        supers = [[s] for s in supers]
    merged = []
    for f in range(n_super):
        n_local = min(span, coarse - f * span)
        parts_f = [s[f] for s in supers]
        combined = []
        for i in range(0, n_blocks, g):
            grp = parts_f[i:i + g]
            c = _hx_subsplit.options(num_returns=n_local).remote(
                bucket_col, coarse, span, f, n_local, *grp)
            combined.append(c if n_local > 1 else [c])
        for loc in range(n_local):
            merged.append(_hx_merge.remote(
                fn, arrow, *[c[loc] for c in combined]))
    return rd.from_arrow_refs(merged)


def hash_exchange(ds, bucket_col: str, coarse: int, fn,
                  adaptive: bool = True, arrow: bool = False):
    """-> Dataset: ``fn`` (pandas in, pandas/arrow out) applied once
    per bucket of ``bucket_col`` over the whole dataset. See module
    docstring for the contract vs ``groupby().map_groups``.

    ``arrow=True`` hands the merged bucket to ``fn`` as a pa.Table
    (no pandas round-trip — use for fixed-size-list / binary columns
    that pandas would degrade).

    ``adaptive=True`` shrinks the bucket count to the measured row
    count (~HX_ROWS_PER_BUCKET rows per merge task, floor 2, cap
    ``coarse``), FOLDING several bucket values into one merge task via
    ``% coarse_eff``. Only safe when ``fn`` treats co-located distinct
    groups independently (it re-groups by the real key internally, or
    is a join whose semantics don't change when extra keys share the
    task). Callers whose bucket values encode REPLICATION (hash_join's
    salted hot keys: the same right row is replicated once per salt
    sub-bucket, so folding two sub-buckets into one task would
    duplicate matches) must pass ``adaptive=False``."""
    import ray.data as rd

    # materialize ONCE: count()/schema() below are then metadata-only
    # and to_arrow_refs() hands back the cached blocks — no replay of
    # the upstream plan for sizing probes
    ds = ds.materialize()
    block_refs = list(ds.to_arrow_refs())
    if not block_refs:
        return ds  # empty input: nothing to exchange
    schema = ds.schema(fetch_if_missing=False)
    names = list(getattr(schema, "names", []) or [])
    if bucket_col not in names:
        # every block is a schema-less zero-row artifact (a union of
        # filtered-to-empty inputs): the raw-task plan would emit
        # zero-column tables that break downstream schema unification
        # — the groupby plan's omit-empty-groups result is the
        # contract, so route through it
        return ds.groupby(bucket_col).map_groups(
            fn, batch_format="pyarrow" if arrow else "pandas")
    if adaptive:
        # metadata-only on a materialized dataset — no probe tasks
        n_rows = int(ds.count())
        # floor at the CPU count: group fns are often CPU-bound Python
        # (pair loops), so fewer tasks than cores loses parallelism;
        # the pathology being avoided is 100s of near-empty tasks.
        # Shrink BEFORE the ref-budget test: a caller-supplied huge
        # coarse (sorted_neighborhood's 1<<20) must not force the
        # sort-shuffle fallback when the adaptive count fits easily.
        cpus = int(ray.cluster_resources().get("CPU", 4))
        coarse = int(min(coarse,
                         max(2, cpus,
                             n_rows // HX_ROWS_PER_BUCKET + 1)))
    if len(block_refs) * coarse > HX_MAX_REFS:
        out = _hierarchical_exchange(block_refs, bucket_col, coarse,
                                     fn, arrow)
        if out is not None:
            return out
        # blocks alone exceed HX_MAX_REFS/4: even the two-level
        # routing table would swamp the driver — Ray's sort-based
        # shuffle streams that scale; fall back to it
        return ds.groupby(bucket_col).map_groups(
            fn, batch_format="pyarrow" if arrow else "pandas")
    splits = [
        _hx_split.options(num_returns=coarse).remote(b, bucket_col,
                                                     coarse)
        for b in block_refs
    ]
    if coarse == 1:
        splits = [[s] for s in splits]
    merged = [
        _hx_merge.remote(fn, arrow, *[s[j] for s in splits])
        for j in range(coarse)
    ]
    return rd.from_arrow_refs(merged)
