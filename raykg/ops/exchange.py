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
once), minus the sample pass and sort. At very large block × coarse
products the O(blocks × coarse) driver ref routing is the bound —
callers size ``coarse`` like they already did for the groupby plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


@ray.remote
def _hx_split(tbl, bucket_col: str, coarse: int):
    if not isinstance(tbl, pa.Table):
        tbl = pa.Table.from_pandas(tbl, preserve_index=False)
    if tbl.num_rows == 0 and bucket_col not in tbl.column_names:
        # schema-less zero-row union artifact: nothing to type slices
        # from — merge tasks skip these
        return [None] * coarse
    b = (tbl.column(bucket_col).to_numpy(zero_copy_only=False)
         .astype(np.int64)) % coarse
    order = np.argsort(b, kind="stable")
    t2 = tbl.take(pa.array(order))
    bs = b[order]
    bounds = np.searchsorted(bs, np.arange(coarse + 1))
    return [t2.slice(int(bounds[j]), int(bounds[j + 1] - bounds[j]))
            for j in range(coarse)]


@ray.remote
def _hx_merge(fn, arrow, *parts):
    tabs = [p for p in parts if p is not None]
    if not tabs:
        return pa.table({})
    try:
        t = pa.concat_tables(tabs, promote_options="permissive")
    except TypeError:                       # older pyarrow
        t = pa.concat_tables(tabs, promote=True)
    out = fn(t if arrow else t.to_pandas())
    if isinstance(out, pa.Table):
        return out
    return pa.Table.from_pandas(out, preserve_index=False)


@ray.remote
def _hx_rows(tbl) -> int:
    return int(getattr(tbl, "num_rows", len(tbl)))


# adaptive sizing: aim for this many rows per merge task — below it the
# per-task fixed cost (scheduling + fn pickle) dominates the group work
HX_ROWS_PER_BUCKET = 65_536

# blocks x coarse refs above this: route through Ray's sort shuffle
# instead (driver ref-routing table would dominate)
HX_MAX_REFS = 1 << 20


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

    block_refs = list(ds.to_arrow_refs())
    if not block_refs:
        return ds  # empty input: nothing to exchange
    if len(block_refs) * coarse > HX_MAX_REFS:
        # the driver routes blocks x coarse refs — beyond this the
        # routing table itself is the bottleneck (the 100 TB regime:
        # 10^5 blocks x 256 buckets = 26M refs). Ray's sort-based
        # shuffle streams that scale; fall back to it.
        return ds.groupby(bucket_col).map_groups(
            fn, batch_format="pyarrow" if arrow else "pandas")
    if adaptive:
        n_rows = sum(ray.get([_hx_rows.remote(b) for b in block_refs]))
        # floor at the CPU count: group fns are often CPU-bound Python
        # (pair loops), so fewer tasks than cores loses parallelism;
        # the pathology being avoided is 100s of near-empty tasks
        cpus = int(ray.cluster_resources().get("CPU", 4))
        coarse = int(min(coarse,
                         max(2, cpus,
                             n_rows // HX_ROWS_PER_BUCKET + 1)))
    splits = [
        _hx_split.options(num_returns=coarse).remote(b, bucket_col,
                                                     coarse)
        for b in block_refs
    ]
    merged = [
        _hx_merge.remote(fn, arrow, *[s[j] for s in splits])
        for j in range(coarse)
    ]
    return rd.from_arrow_refs(merged)
