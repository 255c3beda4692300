"""Within-basket co-occurrence pair counting (market-basket /
collocation analysis): which items appear together in the same basket
(order, session, document) most often.

The naive formulation is a self-join on the basket key — quadratic in
basket size and an all-to-all exchange of raw rows. This plan bounds
every stage by the PAIR volume instead:

1. one hash exchange co-locates each basket's rows (bucket by
   ``h(basket)``, the sessionize/funnel shape);
2. per bucket, rows sort by (basket, item) and deduplicate; pairs are
   emitted by a vectorized LAG SWEEP — for lag d, positions i and i+d
   belong to the same basket iff the basket ids match, so each d
   yields one vectorized mask + gather. The loop runs to the largest
   basket size in the bucket, each iteration O(rows); total work is
   O(rows x max_basket) = O(output pairs). Items within a basket are
   sorted, so pairs arrive (a < b) canonically with no comparison
   pass. Pair counts pre-aggregate per bucket before leaving;
3. pairs exchange once on ``h(a, b)``; each pair lives entirely in
   one bucket, so per-bucket (a, b) count sums are global, and the
   global top-k is contained in the union of per-bucket top-ks —
   the driver merges at most ``k x buckets`` rows.

Partitioning assumption (custom-operator contract): one basket's rows
co-locate (same bound as sessionize, raykg/ops/windows.py); a single
basket of B items emits B(B-1)/2 pairs, so a degenerate basket
(every item in one basket) is the hot-key case — ``max_basket`` skips
baskets above the bound (an explicit, documented semantic change, the
C4-filter style) instead of silently exploding a task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raykg.ops.joins import _key_bucket

COOCCUR_BUCKETS = 128


def _emit_pairs(bk: np.ndarray, it: np.ndarray):
    """Vectorized within-group pair emission; ``bk`` sorted, ``it``
    sorted within each group, both deduplicated. Yields (a, b) with
    a < b in basket-item order."""
    if len(bk) == 0:
        return np.empty(0, it.dtype), np.empty(0, it.dtype)
    a_parts, b_parts = [], []
    # largest run length = largest basket
    change = np.flatnonzero(bk[1:] != bk[:-1])
    starts = np.concatenate([[0], change + 1])
    sizes = np.diff(np.concatenate([starts, [len(bk)]]))
    for d in range(1, int(sizes.max())):
        same = bk[d:] == bk[:-d]
        if not same.any():
            break
        a_parts.append(it[:-d][same])
        b_parts.append(it[d:][same])
    if not a_parts:
        return np.empty(0, it.dtype), np.empty(0, it.dtype)
    return np.concatenate(a_parts), np.concatenate(b_parts)


def cooccurrence_pairs(
    ds,
    basket_col: str,
    item_col: str,
    k: int = 50,
    min_count: int = 1,
    coarse: int = COOCCUR_BUCKETS,
    max_basket: int | None = None,
):
    """Top-``k`` co-occurring (item_a, item_b) pairs across baskets,
    ordered by (count desc, item_a asc, item_b asc) — the total order
    a SQL ``ORDER BY cnt DESC, a, b LIMIT k`` computes. Duplicate
    (basket, item) rows count once. Returns a pandas DataFrame
    ``(item_a, item_b, cnt)``; ties at the k-th count resolve by the
    item order, so output is deterministic."""

    def bucket_rows(t: pa.Table) -> pa.Table:
        t = t.select([basket_col, item_col])
        return t.append_column(
            "_bk", _key_bucket(t.column(basket_col), coarse))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # fold-safe: baskets stay whole per bucket, counts are partial
        if not len(g):
            return pd.DataFrame({"item_a": g[item_col],
                                 "item_b": g[item_col],
                                 "cnt": pd.Series([], dtype="int64")})
        g = g.drop_duplicates([basket_col, item_col]).sort_values(
            [basket_col, item_col], kind="mergesort")
        if max_basket is not None:
            sz = g.groupby(basket_col, sort=False)[item_col].transform(
                "size")
            g = g[sz <= max_basket]
        a, b = _emit_pairs(g[basket_col].to_numpy(),
                           g[item_col].to_numpy())
        out = (pd.DataFrame({"item_a": a, "item_b": b})
               .groupby(["item_a", "item_b"], sort=False)
               .size().rename("cnt").reset_index())
        return out

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t.column("item_a").to_numpy(zero_copy_only=False)
        b = t.column("item_b").to_numpy(zero_copy_only=False)
        from raykg.ops.sample import _murmur64

        h = _murmur64(a.astype(np.uint64) * np.uint64(1000003)
                      ^ b.astype(np.uint64))
        return t.append_column(
            "_pb", pa.array((h % np.uint64(coarse)).astype(np.int32)))

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        # fold-safe: a pair's rows all share its _pb bucket, and a
        # task-local head(k) still contains every global top-k row
        if not len(g):
            return g[["item_a", "item_b", "cnt"]]
        m = (g.groupby(["item_a", "item_b"], sort=False)["cnt"].sum()
             .reset_index())
        m = m[m["cnt"] >= min_count]
        m = m.sort_values(["cnt", "item_a", "item_b"],
                          ascending=[False, True, True],
                          kind="mergesort")
        return m.head(k)

    from raykg.ops.exchange import hash_exchange

    parts = hash_exchange(
        hash_exchange(
            ds.map_batches(bucket_rows, batch_format="pyarrow"),
            "_bk", coarse, bucket_pairs)
        .map_batches(pair_bucket, batch_format="pyarrow"),
        "_pb", coarse, bucket_topk).to_pandas()
    parts = parts.sort_values(["cnt", "item_a", "item_b"],
                              ascending=[False, True, True],
                              kind="mergesort").head(k)
    return parts.reset_index(drop=True)


def association_rules(
    ds,
    basket_col: str,
    item_col: str,
    k: int = 50,
    min_count: int = 2,
    coarse: int = COOCCUR_BUCKETS,
    max_basket: int | None = None,
):
    """Market-basket association rules over the top-``k``
    co-occurring pairs (by support): for each frequent pair both
    directed rules ``a -> b`` and ``b -> a`` with
    ``confidence = n_ab / n_a`` and
    ``lift = n_ab·N / (n_a·n_b)`` (N = distinct baskets) — the
    classic apriori 2-itemset output ranked exactly as a SQL oracle
    ranks it.

    Scale shape: ONE h(basket) exchange emits a tagged union from
    each basket bucket — pre-aggregated pair counts (kind 0, the
    ``cooccurrence_pairs`` lag-sweep plan), per-item distinct-basket
    partials (kind 1, the ops/vocab Zipf-head bound: one row per
    distinct item per bucket), and the bucket's basket count
    (kind 2).  The union materializes once; pairs route through the
    pair-key exchange + per-bucket top-k (driver merges <= k·buckets
    rows), and the item/basket sides are consumed FILTERED to the
    <= 2k items the surviving pairs mention (broadcast isin), so the
    driver never holds the vocabulary.  Every statistic is exact
    int64; confidence and lift are each ONE float division of exact
    BIGINT products — a DuckDB oracle mirrors them bit-for-bit.
    -> pandas ``(antecedent, consequent, pair_n, ante_n, cons_n,
    n_baskets, confidence, lift)``, 2 rows per top-k pair, ordered by
    (pair_n desc, antecedent, consequent).
    """
    import pyarrow.compute as pc

    def bucket_rows(t: pa.Table) -> pa.Table:
        t = t.select([basket_col, item_col])
        return t.append_column(
            "_bk", _key_bucket(t.column(basket_col), coarse))

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        # fold-safe: baskets stay whole per bucket; pair/item partials
        # sum downstream, and the single kind-2 row per task is a
        # partial basket count (baskets never straddle buckets)
        if not len(g):
            return pd.DataFrame({"item_a": g[item_col],
                                 "item_b": g[item_col],
                                 "cnt": pd.Series([], dtype="int64"),
                                 "kind": pd.Series([], dtype="int32")})
        g = g.drop_duplicates([basket_col, item_col]).sort_values(
            [basket_col, item_col], kind="mergesort")
        if max_basket is not None:
            sz = g.groupby(basket_col, sort=False)[item_col].transform(
                "size")
            g = g[sz <= max_basket]
        a, b = _emit_pairs(g[basket_col].to_numpy(),
                           g[item_col].to_numpy())
        pairs = (pd.DataFrame({"item_a": a, "item_b": b})
                 .groupby(["item_a", "item_b"], sort=False)
                 .size().rename("cnt").reset_index())
        pairs["kind"] = np.int32(0)
        items = (g.groupby(item_col, sort=False)[basket_col]
                 .size().rename("cnt").reset_index()
                 .rename(columns={item_col: "item_a"}))
        items["item_b"] = items["item_a"]
        items["kind"] = np.int32(1)
        nb = pd.DataFrame({
            "item_a": g[item_col].iloc[:1],
            "item_b": g[item_col].iloc[:1],
            "cnt": [g[basket_col].nunique()],
            "kind": [np.int32(2)],
        })
        cols = ["item_a", "item_b", "cnt", "kind"]
        return pd.concat([pairs[cols], items[cols], nb[cols]],
                         ignore_index=True)

    from raykg.ops.exchange import hash_exchange

    tagged = hash_exchange(
        ds.map_batches(bucket_rows, batch_format="pyarrow"),
        "_bk", coarse, bucket_stats).materialize()

    # pairs: the cooccurrence_pairs tail (pair-key exchange, top-k);
    # string items hash through hash_strings, ints directly
    def _u64(col: pa.ChunkedArray) -> np.ndarray:
        if pa.types.is_string(col.type) or pa.types.is_large_string(
                col.type):
            from raykg.util import hash_strings

            return np.asarray(hash_strings(col.to_pylist()),
                              dtype=np.uint64)
        return col.to_numpy(zero_copy_only=False).astype(np.uint64)

    def pair_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), 0))
        from raykg.ops.sample import _murmur64

        h = _murmur64(_u64(t.column("item_a")) * np.uint64(1000003)
                      ^ _u64(t.column("item_b")))
        return t.append_column(
            "_pb", pa.array((h % np.uint64(coarse)).astype(np.int32)))

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        # fold-safe: pair rows share their _pb bucket; task-local
        # head(k) keeps every global top-k row
        if not len(g):
            return g[["item_a", "item_b", "cnt"]]
        m = (g.groupby(["item_a", "item_b"], sort=False)["cnt"].sum()
             .reset_index())
        m = m[m["cnt"] >= min_count]
        m = m.sort_values(["cnt", "item_a", "item_b"],
                          ascending=[False, True, True],
                          kind="mergesort")
        return m.head(k)

    pairs = hash_exchange(
        tagged.map_batches(pair_bucket, batch_format="pyarrow"),
        "_pb", coarse, bucket_topk).to_pandas()
    out_cols = ["antecedent", "consequent", "pair_n", "ante_n",
                "cons_n", "n_baskets", "confidence", "lift"]
    if len(pairs) == 0:  # every bucket filtered out below min_count
        return pd.DataFrame(columns=out_cols)
    pairs = (pairs.sort_values(["cnt", "item_a", "item_b"],
                               ascending=[False, True, True],
                               kind="mergesort").head(k)
             .drop(columns=["kind"], errors="ignore")
             .reset_index(drop=True))

    if len(pairs) == 0:
        return pd.DataFrame(columns=out_cols)

    # item supports, filtered map-side to the items the pairs mention
    import ray

    relevant = np.unique(np.concatenate([
        pairs["item_a"].to_numpy(), pairs["item_b"].to_numpy()]))
    rel_ref = ray.put(pa.array(relevant))

    def item_rows(t: pa.Table) -> pa.Table:
        rel = ray.get(rel_ref)
        t = t.filter(pc.equal(t.column("kind"), 1))
        return (t.filter(pc.is_in(t.column("item_a"), value_set=rel))
                .select(["item_a", "cnt"]))

    item_n = (tagged.map_batches(item_rows, batch_format="pyarrow")
              .to_pandas()
              .groupby("item_a")["cnt"].sum().astype(np.int64))

    def basket_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("kind"), 2)).select(["cnt"])

    n_baskets = int(tagged.map_batches(
        basket_rows, batch_format="pyarrow").to_pandas()["cnt"].sum())

    rows = []
    for r in pairs.itertuples():
        na = int(item_n[r.item_a])
        nb_ = int(item_n[r.item_b])
        c = int(r.cnt)
        for ante, cons, n1, n2 in ((r.item_a, r.item_b, na, nb_),
                                   (r.item_b, r.item_a, nb_, na)):
            rows.append((ante, cons, c, n1, n2, n_baskets,
                         float(c) / float(n1),
                         float(c * n_baskets) / float(n1 * n2)))
    out = pd.DataFrame(rows, columns=out_cols)
    return (out.sort_values(["pair_n", "antecedent", "consequent"],
                            ascending=[False, True, True],
                            kind="mergesort").reset_index(drop=True))


def cooccur_cosine(
    ds,
    basket_col: str,
    item_col: str,
    k: int = 50,
    min_count: int = 2,
    coarse: int = COOCCUR_BUCKETS,
    max_basket: int | None = None,
):
    """Top-``k`` item pairs by COSINE similarity of their basket
    incidence vectors — item-item collaborative filtering's core
    statistic:  cos(a,b) = n_ab / sqrt(n_a · n_b)  over binary
    basket membership (duplicate (basket, item) rows count once).

    Plan: the :func:`cooccurrence_pairs` exchange produces exact pair
    counts per pair-hash bucket; the per-item distinct-basket counts
    are an O(items) relation (per-block dedup pre-counts, one fold)
    BROADCAST into the bucket top-k step, so ranking by cosine happens
    bucket-locally (each pair lives wholly in one bucket) and the
    driver merges <= k rows per bucket. n_a·n_b is exact int64 and
    IEEE sqrt is correctly rounded, so the one-division cosine is
    bit-mirrorable in SQL. Ties resolve by (item_a, item_b) — total
    order matches ``ORDER BY cosine DESC, item_a, item_b LIMIT k``.

    -> DataFrame(item_a, item_b, cnt, n_a, n_b, cosine).
    """
    import ray

    # per-item distinct-basket counts: per-block (basket,item) dedup
    # then per-item partial counts — duplicate (basket,item) rows may
    # straddle blocks, so count distinct through one basket-bucketed
    # exchange (the same bucketing the pair pass uses). Known cost:
    # the raw rows cross this exchange twice (once here, once for the
    # pair pass); sharing one exchange would need the pair pass to
    # consume the materialized per-bucket groups with whole-basket
    # block alignment, which Ray's re-blocking doesn't guarantee.
    def item_parts(g: pd.DataFrame) -> pd.DataFrame:
        # fold-safe: dedup keys on (basket, item); partials sum below
        if not len(g):
            return pd.DataFrame({item_col: g[item_col],
                                 "n": pd.Series([], dtype="int64")})
        g = g.drop_duplicates([basket_col, item_col])
        return (g.groupby(item_col, sort=False).size()
                .rename("n").reset_index())

    def bucket_rows(t: pa.Table) -> pa.Table:
        t = t.select([basket_col, item_col])
        return t.append_column(
            "_bk", _key_bucket(t.column(basket_col), coarse))

    from raykg.ops.exchange import hash_exchange

    item_counts = (
        hash_exchange(ds.map_batches(bucket_rows, batch_format="pyarrow"),
                      "_bk", coarse, item_parts)
        .to_pandas()
        .groupby(item_col, as_index=False)["n"].sum())
    counts_ref = ray.put(dict(zip(item_counts[item_col],
                                  item_counts["n"].astype(np.int64))))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # fold-safe: baskets stay whole per bucket, counts are partial
        if not len(g):
            return pd.DataFrame({"item_a": g[item_col],
                                 "item_b": g[item_col],
                                 "cnt": pd.Series([], dtype="int64")})
        g = g.drop_duplicates([basket_col, item_col]).sort_values(
            [basket_col, item_col], kind="mergesort")
        if max_basket is not None:
            sz = g.groupby(basket_col, sort=False)[item_col].transform(
                "size")
            g = g[sz <= max_basket]
        a, b = _emit_pairs(g[basket_col].to_numpy(),
                           g[item_col].to_numpy())
        return (pd.DataFrame({"item_a": a, "item_b": b})
                .groupby(["item_a", "item_b"], sort=False)
                .size().rename("cnt").reset_index())

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t.column("item_a").to_numpy(zero_copy_only=False)
        b = t.column("item_b").to_numpy(zero_copy_only=False)
        from raykg.ops.sample import _murmur64

        h = _murmur64(a.astype(np.uint64) * np.uint64(1000003)
                      ^ b.astype(np.uint64))
        return t.append_column(
            "_pb", pa.array((h % np.uint64(coarse)).astype(np.int32)))

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        # fold-safe: pair rows share their _pb bucket; task-local
        # head(k) keeps every global top-k row
        import ray as _r
        nmap = _r.get(counts_ref)
        m = (g.groupby(["item_a", "item_b"], sort=False)["cnt"].sum()
             .reset_index())
        m = m[m["cnt"] >= min_count]
        if not len(m):
            return pd.DataFrame({"item_a": pd.array([], "int64"),
                                 "item_b": pd.array([], "int64"),
                                 "cnt": pd.array([], "int64"),
                                 "n_a": pd.array([], "int64"),
                                 "n_b": pd.array([], "int64"),
                                 "cosine": pd.array([], "float64")})
        na = m["item_a"].map(nmap).to_numpy(np.int64)
        nb = m["item_b"].map(nmap).to_numpy(np.int64)
        m["n_a"], m["n_b"] = na, nb
        m["cosine"] = m["cnt"].to_numpy(np.int64) / np.sqrt(
            (na * nb).astype(np.float64))
        m = m.sort_values(["cosine", "item_a", "item_b"],
                          ascending=[False, True, True],
                          kind="mergesort")
        return m.head(k)

    parts = hash_exchange(
        hash_exchange(
            ds.map_batches(bucket_rows, batch_format="pyarrow"),
            "_bk", coarse, bucket_pairs)
        .map_batches(pair_bucket, batch_format="pyarrow"),
        "_pb", coarse, bucket_topk).to_pandas()
    parts = parts.sort_values(["cosine", "item_a", "item_b"],
                              ascending=[False, True, True],
                              kind="mergesort").head(k)
    for c in ("item_a", "item_b", "cnt", "n_a", "n_b"):
        parts[c] = parts[c].astype("int64")
    return parts.reset_index(drop=True)
