"""Grouped ranking: per-key top-k selection.

Ray Data has global ``sort``/``limit`` but no per-group limit; at
training-data scale "keep the top-k documents per domain / per user /
per dedup cluster" is a routine curation step. Composition: a
per-block PARTIAL top-k (caps any key's contribution at k rows per
input block — this is the combiner that keeps the shuffle small and
makes the operator skew-safe) -> ONE coarse-bucket shuffle -> a
per-bucket vectorized final selection that answers many keys per group
task (never one ``map_groups`` call per key; see the
``exact_dedup``/``agg_label_centroids`` pattern).

Ordering rule: (value desc, id asc) — the id tiebreak makes output
deterministic for equal values, and is what the paired DuckDB oracle
(``row_number() OVER (... ORDER BY val DESC, id)``) computes.

Partitioning assumption (custom-operator contract): one coarse
bucket's surviving rows (≤ k × keys_in_bucket + k × n_blocks for the
partial) fit in one group task; raise ``coarse`` to shrink buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raykg.ops.joins import _key_bucket

RANK_BUCKETS = 256


def top_k_per_key(
    ds,
    key_col: str,
    val_col: str,
    id_col: str,
    k: int = 10,
    coarse: int = RANK_BUCKETS,
    val_ascending: bool = False,
    keep_ties: bool = False,
):
    """Top-k rows per distinct ``key_col`` by (``val_col`` desc,
    ``id_col`` asc). Returns the selected rows with the original
    columns (key, id, val). ``val_ascending=True`` flips to
    smallest-k (the deterministic-sampling building block).

    ``keep_ties=True`` switches from row_number to COMPETITION-RANK
    semantics (SQL ``RANK() OVER (...) <= k`` / ``FETCH FIRST k ROWS
    WITH TIES``): every row whose value ties the k-th kept value
    survives, so output per key may exceed k. The per-block combiner
    stays sound: a row with < k strictly-better values globally has
    < k strictly-better values in its own block too, so the local
    rank filter only ever keeps a superset."""
    order_cols = [key_col, val_col, id_col]
    ascending = [True, val_ascending, True]

    def select_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, ascending=ascending,
                            kind="mergesort")
        if not keep_ties:
            return df.groupby(key_col, sort=False).head(k)
        # competition rank over the VALUE only: 1 + count of strictly
        # better rows in the key — vectorized as the first position of
        # each distinct value run within the key
        grp = df.groupby(key_col, sort=False)
        pos = grp.cumcount()
        new_val = (df[val_col] != df[val_col].shift()) | (
            df[key_col] != df[key_col].shift())
        run_start = pos.where(new_val).ffill().astype("int64")
        return df[run_start < k]

    def local_topk(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, id_col, val_col])
        bucket = _key_bucket(t.column(key_col), coarse)
        df = t.append_column("_bucket", bucket).to_pandas()
        return pa.Table.from_pandas(
            select_k(df), preserve_index=False
        ).replace_schema_metadata(None)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return select_k(g).drop(columns=["_bucket"])

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(local_topk, batch_format="pyarrow"),
        "_bucket", coarse, final_topk)


def global_rank(ds, val_col: str, id_col: str, out_col: str = "rank",
                pct_col: str | None = None, n_ranges: int = 64,
                sample_cap: int = 65536):
    """Exact GLOBAL rank of every row by (``val_col``, ``id_col``) —
    the distributed ``row_number() OVER (ORDER BY val, id)`` (and
    optionally ``percent_rank``-style ``(rank-1)/(n-1)`` in
    ``pct_col``) — without a driver-side sort.

    Plan (two data passes + one sample pass):
      1. a hash-spread value sample picks ``n_ranges - 1`` split
         values; splits are DEDUPLICATED and buckets are closed-open
         on the VALUE, so ties never straddle a bucket (a value
         repeated a billion times lands in one task — same
         hot-value assumption as any groupby on the column;
         document-level values are near-unique in practice);
      2. one count pass emits per-block bucket bincounts →
         O(blocks × n_ranges) ints fold into global prefix offsets on
         the driver;
      3. rows co-locate by bucket, each bucket sorts once by
         (value, id) and emits ``offset + local_ordinal + 1``.

    Rows with null/NaN values rank AFTER everything else (SQL NULLS
    LAST), ordered by id.
    """
    import ray

    from raykg.ops.sample import hash_spread_sample_rows

    rows = hash_spread_sample_rows(ds.select_columns([val_col, id_col]),
                                   id_col, sample_cap)
    sample = pd.DataFrame(rows) if rows else pd.DataFrame(
        {val_col: [], id_col: []})
    sv = np.sort(sample[val_col].to_numpy(dtype=np.float64))
    sv = sv[~np.isnan(sv)]
    if len(sv):
        qs = np.linspace(0, 1, n_ranges + 1)[1:-1]
        splits = np.unique(np.quantile(sv, qs))
    else:
        splits = np.array([], dtype=np.float64)
    n_buckets = len(splits) + 2          # +1 value range, +1 NaN bucket

    def assign(t: pa.Table) -> pa.Table:
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        b = np.searchsorted(splits, v, side="right").astype(np.int32)
        b[np.isnan(v)] = n_buckets - 1   # NULLS LAST
        return pa.table({
            "_rb": pa.array(b),
            val_col: pa.array(v, pa.float64()),
            id_col: t.column(id_col),
        })

    ds = ds.materialize()     # consumed by the counts AND rank passes
    counts = np.zeros(n_buckets, dtype=np.int64)
    part = (ds.map_batches(assign, batch_format="pyarrow")
            .map_batches(lambda t: pa.table({
                "b": pa.array(np.arange(n_buckets, dtype=np.int32)),
                "n": pa.array(np.bincount(
                    t.column("_rb").to_numpy(zero_copy_only=False),
                    minlength=n_buckets).astype(np.int64)),
            }), batch_format="pyarrow")
            .to_pandas())
    for b, n in zip(part["b"], part["n"]):
        counts[b] += n
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = int(counts.sum())
    off_ref = ray.put(offsets)

    def bucket_rank(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        b = int(df["_rb"].iloc[0])
        v = df[val_col].to_numpy()
        i = df[id_col].to_numpy()
        # NaN bucket: order by id only (lexsort treats NaN poorly)
        order = np.argsort(i, kind="stable") if b == len(off) - 1 \
            else np.lexsort((i, v))
        rank = np.empty(len(df), dtype=np.int64)
        rank[order] = off[b] + np.arange(len(df), dtype=np.int64) + 1
        out = pd.DataFrame({id_col: i, val_col: v, out_col: rank})
        if pct_col is not None:
            out[pct_col] = (rank - 1) / max(total - 1, 1)
        return out

    def bucket_rank_folded(g: pd.DataFrame) -> pd.DataFrame:
        # the exchange folds several range buckets into one task and
        # types empty ones; each range still ranks against ITS offset
        if not len(g):
            out = pd.DataFrame({id_col: g[id_col], val_col: g[val_col],
                                out_col: np.array([], np.int64)})
            if pct_col is not None:
                out[pct_col] = np.array([], np.float64)
            return out
        return pd.concat(
            [bucket_rank(sub) for _, sub in g.groupby("_rb", sort=False)],
            ignore_index=True)

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(assign, batch_format="pyarrow"), "_rb",
        n_buckets, bucket_rank_folded)


def ntile(ds, val_col: str, id_col: str, k: int, out_col: str = "tile",
          n_ranges: int = 64):
    """Exact equal-frequency discretization: SQL ``ntile(k) OVER
    (ORDER BY val, id)`` — the first ``n % k`` tiles get one extra
    row, exactly DuckDB/ANSI semantics, so the paired oracle is
    bit-checkable with no float boundary anywhere.

    Plan: one streaming row count (block metadata where available),
    then :func:`global_rank`'s two-pass exact rank, then a STATELESS
    map turns rank into the tile via integer arithmetic — no extra
    shuffle beyond global_rank's single co-location pass.  Equal
    values order by id (deterministic under retries / partitioning);
    this is the quantile-binning step (``equi_depth_bins`` is the
    approximate cousin: sampled bounds, value-closed buckets; ntile
    is exact and ROW-balanced even when one value is hot, at the cost
    of the rank exchange).
    """
    n = ds.count()
    q, r = divmod(n, k)

    def to_tile(t: pa.Table) -> pa.Table:
        rank = t.column("rank").to_numpy(zero_copy_only=False)
        # ranks 1..n; first r tiles hold q+1 rows
        cut = r * (q + 1)
        tile = np.where(
            rank <= cut,
            (rank - 1) // max(q + 1, 1),
            r + (rank - cut - 1) // max(q, 1),
        ).astype(np.int64) + 1
        return t.drop_columns(["rank"]).append_column(
            out_col, pa.array(tile))

    ranked = global_rank(ds, val_col, id_col, out_col="rank",
                         n_ranges=n_ranges)
    return ranked.map_batches(to_tile, batch_format="pyarrow")


def pareto_coverage(ds, key_col: str, weight_col: str,
                    frac_num: int = 1, frac_den: int = 2,
                    coarse: int = 64, n_ranges: int = 64,
                    sample_cap: int = 65536):
    """Heavy-tail coverage cutoff: the smallest prefix of keys, taken
    in (total weight desc, key asc) order, whose cumulative weight
    reaches ``frac_num/frac_den`` of the grand total — "which parts
    make up half the revenue", the skew diagnostic behind salting
    decisions and mixture re-weighting.

    Everything is EXACT int64: weights are pre-floored integers, the
    threshold is ``ceil(frac · total) = (frac_num·total + frac_den-1)
    // frac_den``, and a key is kept iff the cumulative weight
    STRICTLY BEFORE it is below the threshold (the standard "rows
    needed to reach X%" rule — SQL mirror: ``sum(s) OVER (ORDER BY
    s DESC, k ROWS ... 1 PRECEDING) < ceil``).

    Plan (no driver-side key materialization):
      1. per-block partial sums fold to exact per-key totals through
         one coarse-bucket exchange (the ``top_k_per_key`` combiner
         shape);
      2. a hash-spread sample of the totals picks ``n_ranges`` splits
         on the weight; ONE O(blocks × ranges) count pass folds
         per-range (row count, weight sum) partials into global
         DESC-order prefix offsets on the driver (scalars only);
      3. keyed totals co-locate by range; each range task sorts
         (s desc, k), adds its exclusive prefix to the range offset,
         and emits only rows under the threshold.

    Ties on the weight stay inside one range (closed-open split on
    the value, like ``global_rank``) so the (s desc, k) order is
    exact across range boundaries.
    -> Dataset(key, s, cum_before), the coverage set.
    """
    import ray

    from raykg.ops.sample import hash_spread_sample_rows

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t.column(key_col).to_pandas(),
            "s": t.column(weight_col).to_numpy(zero_copy_only=False)
                 .astype(np.int64),
        })
        g = df.groupby("k", sort=False, as_index=False)["s"].sum()
        g["_b"] = _key_bucket(pa.array(g["k"]), coarse).to_numpy()
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", sort=False, as_index=False)["s"].sum()

    from raykg.ops.exchange import hash_exchange

    totals = hash_exchange(
        ds.map_batches(part, batch_format="pyarrow"), "_b", coarse,
        fold).materialize()

    rows = hash_spread_sample_rows(totals, "k", sample_cap)
    sv = np.sort(np.array([r["s"] for r in rows], dtype=np.int64)) \
        if rows else np.array([], dtype=np.int64)
    if len(sv):
        qs = np.linspace(0, 1, n_ranges + 1)[1:-1]
        splits = np.unique(np.quantile(sv, qs).astype(np.int64))
    else:
        splits = np.array([], dtype=np.int64)
    nb = len(splits) + 1

    def assign(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        b = np.searchsorted(splits, s, side="right").astype(np.int32)
        return pa.table({"_rb": pa.array(b), "k": t.column("k"),
                         "s": t.column("s")})

    def range_partials(t: pa.Table) -> pa.Table:
        rb = t.column("_rb").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        w = np.zeros(nb, dtype=np.int64)   # int64 adds stay exact
        np.add.at(w, rb, s)
        return pa.table({"b": pa.array(np.arange(nb, dtype=np.int32)),
                         "w": pa.array(w)})

    assigned = (totals.map_batches(assign, batch_format="pyarrow")
                .materialize())   # reused by the cut pass below
    stats = (assigned.map_batches(range_partials, batch_format="pyarrow")
             .to_pandas())
    wsum = np.zeros(nb, dtype=np.int64)
    for b, w in zip(stats["b"], stats["w"]):
        wsum[b] += w
    total = int(wsum.sum())
    threshold = (frac_num * total + frac_den - 1) // frac_den
    # DESC order: exclusive prefix of all HIGHER ranges
    suffix = np.concatenate([np.cumsum(wsum[::-1])[::-1][1:], [0]])
    off_ref = ray.put((suffix, threshold))

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        # fold-safe whole-bucket fn: several _rb ranges may share a
        # merge task — sort (range, s desc, k) and compute each
        # range's exclusive prefix from its own run boundary
        off, thr = ray.get(off_ref)
        if not len(df):
            return pd.DataFrame({
                "k": df["k"],
                "s": df["s"].astype(np.int64),
                "cum_before": pd.Series([], dtype="int64")})
        d = df.sort_values(["_rb", "s", "k"],
                           ascending=[True, False, True], kind="stable")
        rb = d["_rb"].to_numpy(dtype=np.int64)
        s = d["s"].to_numpy(dtype=np.int64)
        cum = np.cumsum(s)
        newb = np.empty(len(rb), dtype=bool)
        newb[0] = True
        newb[1:] = rb[1:] != rb[:-1]
        run_start = np.flatnonzero(newb)
        base = np.where(run_start > 0, cum[run_start - 1], 0)
        excl = cum - s - base[np.cumsum(newb) - 1]
        cum_before = off[rb] + excl
        keep = cum_before < thr
        return pd.DataFrame({"k": d["k"].to_numpy()[keep],
                             "s": s[keep],
                             "cum_before": cum_before[keep]})

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(assigned, "_rb", nb, cut)
