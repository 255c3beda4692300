"""Fellegi–Sunter probabilistic record-linkage scoring (Fellegi &
Sunter 1969) — the classical entity-resolution decision model that
the flagship's learned NIL/cluster chain replaces with embeddings:
for every candidate pair, score = Σ_f log-likelihood weight of field
f's agreement, with per-field u-probabilities (chance agreement among
non-matches) estimated EXACTLY from the data and m-probabilities
(agreement among true matches) supplied by the caller.

Exactness: u_f is all-integer — ``u_num_f = Σ_v c_v² − n`` ordered
agreeing pairs over the field's value counts, ``u_den = n² − n`` —
and each weight is ONE mirrored float expression
(``ln(m_f / u_f)`` / ``ln((1−m_f) / (1−u_f))`` with
``u_f = u_num::DOUBLE / u_den::DOUBLE``); the score sums the F terms
in field order. The SQL oracle mirrors every operand, so scores match
bit-for-bit (the PSI/PMI libm-ln convention).

Plan (two passes, nothing corpus-sized on the driver):
1. u-statistics: per-block (field, value) pre-counts -> one small
   value-key exchange -> per-field Σc² partials fold to F scalars;
2. candidate generation + scoring: rows co-locate by h(block key)
   (the sessionize exchange); per bucket, each block's pairs are
   emitted by the vectorized lag sweep over block-sorted rows (the
   cooccur trick — O(pairs) work, id_a < id_b canonical), agreement
   bits compared vectorized, and the score is computed from the F
   broadcast scalars.

Partitioning assumption: one blocking key's rows co-locate; a block
of B rows emits B(B−1)/2 pairs — blocks with more than ``max_block``
rows are DROPPED entirely (the cooccur ``max_basket`` convention;
emitting a partial lag-bounded subset would be sort-order-dependent).
The SQL oracle mirrors the cap with a block-size qualify. u requires
0 < u_num_f < u_den (a field that never or always agrees carries no
information and makes a weight infinite) — raised, not NaN'd.
"""

from __future__ import annotations

import logging
import math

import numpy as np
import pandas as pd
import pyarrow as pa

from raykg.ops.joins import _key_bucket

LINKAGE_BUCKETS = 64

_LOG = logging.getLogger("raykg.linkage")


def _block_census(ds, block_col: str, max_block: int,
                  coarse: int = 16):
    """-> (n_blocks, n_oversize, rows_in_oversize): block-size census
    so fs_link_scores can SURFACE its oversize-block drop instead of
    silently returning fewer (or zero) pairs. Scale shape: per-batch
    value pre-counts (vocab.py pattern) -> one tiny value-key
    exchange folding each bucket to ONE stats row -> ``coarse`` rows
    on the driver; never O(distinct blocks) anywhere central."""

    def pre(t: pa.Table) -> pa.Table:
        vc = t.column(block_col).combine_chunks().value_counts()
        vals = vc.field("values")
        cnts = vc.field("counts").cast(pa.int64())
        key = pa.array(pd.util.hash_array(
            np.asarray(vals.to_pandas().astype(str)
                       .to_numpy(object))).astype(np.int64))
        return pa.table({"blk": vals, "c": cnts,
                         "_b": _key_bucket(key, coarse)})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("blk", sort=False)["c"].sum()
        over = g.to_numpy(np.int64) > max_block
        return pd.DataFrame({
            "n_blocks": pd.array([len(g)], "int64"),
            "n_over": pd.array([int(over.sum())], "int64"),
            "rows_over": pd.array(
                [int(g.to_numpy(np.int64)[over].sum())], "int64"),
        })

    from raykg.ops.exchange import hash_exchange

    sel = ds.map_batches(pre, batch_format="pyarrow")
    parts = hash_exchange(sel, "_b", coarse, fold).to_pandas()
    if len(parts) == 0:
        return 0, 0, 0
    return (int(parts["n_blocks"].sum()), int(parts["n_over"].sum()),
            int(parts["rows_over"].sum()))


def _field_u(ds, fields: list[str]):
    """Exact ordered-agreeing-pair counts per field:
    (u_num_f = Σ_v c_v² − n, u_den = n² − n). Driver holds F+1 ints."""
    def pre(t: pa.Table) -> pa.Table:
        outs = []
        for fi, f in enumerate(fields):
            vc = (t.select([f]).to_pandas()[f].astype(str)
                  .value_counts())
            outs.append(pd.DataFrame({
                "fi": np.int64(fi), "val": vc.index.to_numpy(object),
                "c": vc.to_numpy(np.int64),
            }))
        out = pd.concat(outs, ignore_index=True)
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        key = pa.array(pd.util.hash_array(
            (out["fi"].astype(str) + "\x1f" + out["val"].astype(str))
            .to_numpy(object)).astype(np.int64))
        return tbl.append_column("_b", _key_bucket(key, 16))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["fi", "val"], sort=False)["c"].sum()
             .reset_index())
        sq = g.groupby("fi", sort=False)["c"].apply(
            lambda s: int((s.to_numpy(np.int64) ** 2).sum()))
        n = g.groupby("fi", sort=False)["c"].sum()
        return pd.DataFrame({"fi": sq.index.to_numpy(np.int64),
                             "sq": sq.to_numpy(np.int64),
                             "n": n.to_numpy(np.int64)})

    from raykg.ops.exchange import hash_exchange

    parts = hash_exchange(
        ds.map_batches(pre, batch_format="pyarrow"), "_b", 16,
        fold).to_pandas()
    agg = parts.groupby("fi").sum()
    n = int(agg["n"].iloc[0])
    u_num = [int(agg.loc[fi, "sq"]) - n for fi in range(len(fields))]
    u_den = n * n - n
    return u_num, u_den


def fs_link_scores(ds, block_col: str, fields: list[str],
                   m_probs: list[float], id_col: str = "id",
                   coarse: int = LINKAGE_BUCKETS,
                   max_block: int = 10_000):
    """-> Dataset(id_a, id_b, score): Fellegi–Sunter log-likelihood
    score for every within-block candidate pair (id_a < id_b).

    Blocks with more than ``max_block`` rows contribute NO pairs (a
    block of B rows emits B(B-1)/2 pairs, so one degenerate blocking
    key would dominate the whole job; all-or-nothing is the only
    deterministic contract). The drop is SURFACED, never silent: a
    cheap block-size census runs first, raises ``ValueError`` when
    EVERY block is oversize (the query would silently return zero
    rows otherwise — e.g. nation-blocked customers beyond ~sf1.7),
    and logs a warning with the dropped block/row counts when only
    some are."""
    assert len(fields) == len(m_probs)
    ds = ds.materialize()  # census + u-stats + pairs: 3 passes, 1 read
    n_blocks, n_over, rows_over = _block_census(ds, block_col,
                                                max_block)
    if n_blocks > 0 and n_over == n_blocks:
        raise ValueError(
            f"fs_link_scores: every one of the {n_blocks} blocks of "
            f"{block_col!r} exceeds max_block={max_block} rows — the "
            "result would be empty. Choose a finer blocking key or "
            "raise max_block.")
    if n_over:
        _LOG.warning(
            "fs_link_scores: dropping %d of %d blocks of %r "
            "(%d rows) that exceed max_block=%d — oversize blocks "
            "contribute no pairs", n_over, n_blocks, block_col,
            rows_over, max_block)
    u_num, u_den = _field_u(ds, fields)
    for f, num in zip(fields, u_num):
        if not 0 < num < u_den:
            raise ValueError(
                f"field {f!r} never or always agrees (u_num={num}, "
                f"u_den={u_den}); it carries no linkage information")
    # math.log, not np.log: numpy's scalar log is its own SIMD
    # implementation and differs from libm (== DuckDB ln) by 1 ulp on
    # some inputs; math.log is the C library call the oracle mirrors
    u = [num / float(u_den) for num in u_num]
    w_agree = [math.log(m / uf) for m, uf in zip(m_probs, u)]
    w_disagree = [math.log((1.0 - m) / (1.0 - uf))
                  for m, uf in zip(m_probs, u)]

    def project(t: pa.Table) -> pa.Table:
        cols = {"blk": t.column(block_col), "pid": t.column(id_col)}
        for fi, f in enumerate(fields):
            cols[f"f{fi}"] = t.column(f)
        out = pa.table(cols)
        return out.append_column("_b", _key_bucket(t.column(block_col),
                                                   coarse))

    nf = len(fields)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["blk", "pid"], kind="stable")
        # Drop oversize blocks ENTIRELY (the cooccur max_basket
        # convention): a block of B rows emits B(B-1)/2 pairs, so one
        # degenerate blocking key (B > max_block) would dominate the
        # whole job. Emitting only lag<max_block pairs of an oversize
        # block would be a sort-order-dependent partial subset — all
        # or nothing is the only deterministic contract.
        bsize = df.groupby("blk", sort=False)["blk"].transform("size")
        df = df[bsize.to_numpy(np.int64) <= max_block]
        bk = df["blk"].to_numpy()
        pid = df["pid"].to_numpy(np.int64)
        fvals = [df[f"f{fi}"].to_numpy() for fi in range(nf)]
        sizes = df.groupby("blk", sort=False).size().to_numpy()
        a_parts, b_parts, s_parts = [], [], []
        dmax = int(sizes.max(initial=0))
        for d in range(1, dmax):
            same = bk[d:] == bk[:-d]
            if not same.any():
                break
            ia = np.flatnonzero(same)
            score = np.zeros(len(ia), np.float64)
            for fi in range(nf):
                agree = fvals[fi][ia] == fvals[fi][ia + d]
                score = score + np.where(agree, w_agree[fi],
                                         w_disagree[fi])
            a_parts.append(pid[ia])
            b_parts.append(pid[ia + d])
            s_parts.append(score)
        if not a_parts:
            return pd.DataFrame({"id_a": pd.array([], "int64"),
                                 "id_b": pd.array([], "int64"),
                                 "score": pd.array([], "float64")})
        return pd.DataFrame({
            "id_a": np.concatenate(a_parts),
            "id_b": np.concatenate(b_parts),
            "score": np.concatenate(s_parts),
        })

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(project, batch_format="pyarrow"), "_b",
        coarse, pairs)


def sorted_neighborhood_pairs(ds, val_col: str, id_col: str,
                              window: int, bucket_rows: int = 8192):
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995, the
    merge/purge method): rank every record by ``(val_col, id_col)``
    and emit each pair of records whose ranks differ by less than
    ``window`` — the classic alternative to key-equality blocking
    when near-duplicates share a SORT neighborhood rather than an
    exact key (names, prices, timestamps).

    Plan: exact dense global ranks from ops/rank.global_rank (sampled
    range partition, no driver sort), then a rank-range bucket
    exchange where each bucket's trailing ``window - 1`` rows are
    REPLICATED into the next bucket (pair emission stays bucket-local
    and each pair is emitted exactly once, in the bucket that OWNS its
    lower rank). Per bucket the ranks are dense, so distance-d
    partners align by pure array offset — one vectorized slice per
    d in 1..window-1, no search.

    -> Dataset(id_a, id_b, dist): id_a = the lower-ranked record,
    dist = rank distance (1..window-1).
    """
    import ray

    from raykg.ops.rank import global_rank

    if window < 2:
        raise ValueError("window must be >= 2")
    B = max(bucket_rows, window * 4)

    ranked = global_rank(ds, val_col, id_col, out_col="rank")

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        r = df["rank"].to_numpy(np.int64)
        own = (r - 1) // B
        out = pd.DataFrame({"id": df[id_col].to_numpy(np.int64),
                            "rank": r, "_b": own, "_own": True})
        carry = ((r - 1) % B) < (window - 1)
        prev = out[carry & (own > 0)].copy()
        prev["_b"] = prev["_b"] - 1
        prev["_own"] = False
        return pd.concat([out, prev], ignore_index=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("rank", kind="mergesort")
        r = g["rank"].to_numpy(np.int64)
        ids = g["id"].to_numpy(np.int64)
        own = g["_own"].to_numpy(bool)
        lo = int(r.min())
        # dense ranks -> position == rank - lo (replication guarantees
        # every partner of an OWNED lower rank is present)
        pos = r - lo
        n_slots = int(pos.max()) + 1 if len(pos) else 0
        arr = np.zeros(n_slots, dtype=np.int64)
        present = np.zeros(n_slots, dtype=bool)  # ids may be ANY
        arr[pos] = ids                           # int64 incl. negative
        present[pos] = True
        out_a, out_b, out_d = [], [], []
        own_pos = pos[own]
        for d in range(1, window):
            j = own_pos + d
            ok = j < n_slots
            a_pos = own_pos[ok]
            b_pos = j[ok]
            hit = present[b_pos]
            out_a.append(arr[a_pos][hit])
            out_b.append(arr[b_pos][hit])
            out_d.append(np.full(int(hit.sum()), d, np.int64))
        if not out_a:
            return pd.DataFrame({"id_a": pd.array([], "int64"),
                                 "id_b": pd.array([], "int64"),
                                 "dist": pd.array([], "int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "dist": np.concatenate(out_d)})

    from raykg.ops.exchange import hash_exchange

    def pairs_folded(g: pd.DataFrame) -> pd.DataFrame:
        # the exchange may fold several rank-range buckets into one
        # task; the dense-slot array must span ONE range, so re-group
        if not len(g):
            return pd.DataFrame({"id_a": pd.array([], "int64"),
                                 "id_b": pd.array([], "int64"),
                                 "dist": pd.array([], "int64")})
        return pd.concat([pairs(sub) for _, sub in g.groupby("_b")],
                         ignore_index=True)

    return hash_exchange(
        ranked.map_batches(emit, batch_format="pandas"), "_b",
        1 << 20, pairs_folded)


def blocking_quality(cand_pairs, truth_pairs, n_records: int,
                     coarse: int = 64):
    """Blocking-strategy evaluation (Christen 2012 §7.4): given the
    CANDIDATE pair set a blocking scheme produced and the TRUE match
    pair set, compute

        reduction_ratio   = 1 - |C| / (n·(n-1)/2)
        pair_completeness = |C ∩ T| / |T|   (blocking recall)
        pair_quality      = |C ∩ T| / |C|   (blocking precision)

    — the three numbers that justify any blocking choice before the
    expensive compare step runs. All counts exact int64: the ∩ is one
    pair-key bucketed exchange of (id_a, id_b) rows tagged by side
    (per-block dedup pre-pass, candidates may repeat); each ratio is
    ONE float division of exact ints, SQL-mirrorable.

    ``cand_pairs`` / ``truth_pairs``: Datasets with id_a < id_b int
    columns. -> one-row DataFrame(n_cand, n_truth, n_hit,
    reduction_ratio, pair_completeness, pair_quality).
    """
    from raykg.ops.joins import _key_bucket

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            a = t.column("id_a").to_numpy(
                zero_copy_only=False).astype(np.int64)
            b = t.column("id_b").to_numpy(
                zero_copy_only=False).astype(np.int64)
            df = pd.DataFrame({"id_a": a, "id_b": b}).drop_duplicates()
            df["_side"] = np.int8(side)
            tbl = pa.Table.from_pandas(df, preserve_index=False)
            return tbl.append_column(
                "_b", _key_bucket(pa.chunked_array([pa.array(
                    df["id_a"].to_numpy() * 1_000_003
                    + df["id_b"].to_numpy())]), coarse))
        return fn

    both = (cand_pairs.map_batches(tag(0), batch_format="pyarrow")
            .union(truth_pairs.map_batches(tag(1),
                                           batch_format="pyarrow")))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["id_a", "id_b", "_side"])
        cand = d[d["_side"] == 0]
        truth = d[d["_side"] == 1]
        m = cand.merge(truth, on=["id_a", "id_b"], how="inner")
        return pd.DataFrame({"n_cand": [np.int64(len(cand))],
                             "n_truth": [np.int64(len(truth))],
                             "n_hit": [np.int64(len(m))]})

    from raykg.ops.exchange import hash_exchange

    parts = hash_exchange(both, "_b", 64, fold).to_pandas()
    n_cand = int(parts["n_cand"].sum())
    n_truth = int(parts["n_truth"].sum())
    n_hit = int(parts["n_hit"].sum())
    total = n_records * (n_records - 1) // 2
    return pd.DataFrame({
        "n_cand": pd.array([n_cand], "int64"),
        "n_truth": pd.array([n_truth], "int64"),
        "n_hit": pd.array([n_hit], "int64"),
        "reduction_ratio": [1.0 - (float(n_cand) / float(total))
                            if total else 0.0],
        "pair_completeness": [float(n_hit) / float(n_truth)
                              if n_truth else 0.0],
        "pair_quality": [float(n_hit) / float(n_cand)
                         if n_cand else 0.0],
    })
