"""Distributed binary-classifier evaluation: exact tie-aware ROC-AUC
plus threshold confusion metrics over a scored Dataset.

A curation stack trains quality / toxicity / domain classifiers (see
``raykg.ops.logreg``) and then needs their headline metrics over the
FULL corpus, not a driver-held sample (the reference computes its NIL
metrics after collecting everything into one frame,
scripts/feature_ablation_study.py:376-426 — exactly what does not
scale). Everything here is exact and partition-invariant:

* confusion counts (tp/fp/tn/fn) fall out of the same per-score
  (pos, neg) relation the AUC pass builds — a threshold split of the
  bucket partials, no separate pass;
* AUC uses the rank-sum identity over score GROUPS:

      AUC = sum_g pos_g * (neg_below_g + neg_g / 2) / (P * N)

  computed as the integer numerator ``sum_g pos_g * (2*neg_below_g +
  neg_g)`` over ``2*P*N`` — ties are handled exactly (each tied group
  contributes half its pos x neg cross pairs), no float accumulates
  across tasks. The plan is the ``global_rank`` range-partition shape:
  sampled closed-open score splits (ties never straddle a bucket), a
  per-block (bucket, score) -> (pos, neg) pre-aggregation so the
  exchange carries one row per distinct score per block, per-bucket
  within-bucket prefix sums, and an O(n_ranges) driver fold of the
  bucket partials. Per-bucket numerator partials travel as DECIMAL
  STRINGS and the driver folds Python ints (the ``table_diff`` trick),
  so nothing overflows at any corpus size.

Derived ratios (accuracy/precision/recall/f1, and AUC itself) are each
ONE float division of exact integers — bit-reproducible against a SQL
oracle that mirrors the same expressions (window ``sum(neg) OVER
(ORDER BY score ROWS .. 1 PRECEDING)`` for the prefix).

Partitioning assumption (custom-operator contract): one score-range
bucket's distinct (score, pos, neg) rows fit in a group task; raise
``n_ranges`` to shrink buckets. Scores must be non-null.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def calibration_bins(
    ds,
    label_col: str,
    score_col: str,
    bins: int = 10,
    int_sum_cols: list[str] | None = None,
) -> pd.DataFrame:
    """Reliability-diagram data: equal-width score bins with exact
    integer (n, pos) counts and ``frac_pos = pos / n`` — the
    calibration readout run right after
    ``binary_classification_report`` to see WHERE a classifier's
    probabilities are wrong, not just how often.

    Scale shape: each block pre-aggregates to at most ``bins`` partial
    rows (bin, n, pos, ...), so the exchange is O(blocks x bins)
    regardless of corpus size; the final fold is one tiny groupby.
    ``int_sum_cols`` are extra int64 columns summed EXACTLY per bin as
    Python ints travelling as decimal strings (the ``table_diff``
    trick — no int64 overflow at any scale); callers use them to
    reconstruct bit-exact mean scores from integer numerators (see
    the eval_calibration_bins query) instead of trusting an
    order-dependent float sum. Only non-empty bins are emitted, the
    same relation a SQL ``GROUP BY`` produces. Scores in [0, 1];
    values == 1.0 clamp into the last bin (SQL mirror: ``LEAST``).
    -> pandas (bin, n, pos, frac_pos, sum_<c>...), bin-ascending.
    """
    extra = list(int_sum_cols or [])

    def assign(t: pa.Table) -> pa.Table:
        s = t.column(score_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t.column(label_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        b = np.minimum((s * bins).astype(np.int64), bins - 1)
        df = pd.DataFrame({"bin": b, "y": y})
        for c in extra:
            df[c] = t.column(c).to_numpy(zero_copy_only=False)
        g = df.groupby("bin", sort=False)
        out = g["y"].agg(n="size", pos="sum").reset_index()
        for c in extra:
            # Python-int exact sums as decimal strings
            out["sum_" + c] = [
                str(int(sum(int(v) for v in grp)))
                for _, grp in g[c]
            ]
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        row = {"bin": [int(g["bin"].iloc[0])],
               "n": [int(g["n"].sum())],
               "pos": [int(g["pos"].sum())]}
        for c in extra:
            row["sum_" + c] = [str(sum(int(v) for v in g["sum_" + c]))]
        return pd.DataFrame(row)

    out = (ds.map_batches(assign, batch_format="pyarrow")
           .groupby("bin")
           .map_groups(fold, batch_format="pandas")
           .to_pandas()
           .sort_values("bin").reset_index(drop=True))
    out["frac_pos"] = out["pos"] / out["n"]
    return out[["bin", "n", "pos", "frac_pos"]
               + ["sum_" + c for c in extra]]


def binary_classification_report(
    ds,
    label_col: str,
    score_col: str,
    id_col: str,
    threshold: float = 0.5,
    n_ranges: int = 64,
    sample_cap: int = 65536,
) -> pd.DataFrame:
    """One-row report: n, pos, neg, tp/fp/tn/fn at ``threshold``,
    accuracy, precision, recall, f1, and exact tie-aware ROC-AUC.
    ``label_col`` is 0/1 int; ``score_col`` float (non-null); ``id_col``
    feeds the split sampler only."""
    from raykg.ops.sample import hash_spread_sample_rows

    # --- split sample, then ONE data pass: the per-score (pos, neg)
    # relation determines BOTH the confusion counts (threshold split)
    # and the AUC numerator, so no separate confusion pass runs -----
    rows = hash_spread_sample_rows(
        ds.select_columns([score_col, id_col]), id_col, sample_cap)
    sv = np.sort(np.array([r[score_col] for r in rows], dtype=np.float64))
    if len(sv):
        qs = np.linspace(0, 1, n_ranges + 1)[1:-1]
        splits = np.unique(np.quantile(sv, qs))
    else:
        splits = np.array([], dtype=np.float64)

    def assign(t: pa.Table) -> pa.Table:
        s = t.column(score_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t.column(label_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        b = np.searchsorted(splits, s, side="right").astype(np.int32)
        # per-block (bucket, score) pre-agg: the exchange ships one
        # row per distinct score per block, not per input row
        df = pd.DataFrame({"_rb": b, "s": s, "y": y})
        g = df.groupby(["_rb", "s"], sort=False)["y"].agg(
            pos="sum", cnt="size").reset_index()
        g["neg"] = g["cnt"] - g["pos"]
        return pa.Table.from_pandas(
            g[["_rb", "s", "pos", "neg"]], preserve_index=False
        ).replace_schema_metadata(None)

    def bucket_partial(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_rb"].iloc[0])
        m = (g.groupby("s", sort=True)[["pos", "neg"]].sum()
             .reset_index())
        pos_l = m["pos"].to_numpy().tolist()   # Python ints: no overflow
        neg_l = m["neg"].to_numpy().tolist()
        nb = 0
        num = 0
        for p, q in zip(pos_l, neg_l):
            num += p * (2 * nb + q)
            nb += q
        hit = m["s"].to_numpy() >= threshold
        return pd.DataFrame({
            "_rb": [b],
            "pos_tot": [int(sum(pos_l))],
            "neg_tot": [int(sum(neg_l))],
            "tp": [int(m["pos"].to_numpy()[hit].sum())],
            "fp": [int(m["neg"].to_numpy()[hit].sum())],
            "num_str": [str(num)],
        })

    parts = (ds.map_batches(assign, batch_format="pyarrow")
             .groupby("_rb")
             .map_groups(bucket_partial, batch_format="pandas")
             .to_pandas()
             .sort_values("_rb"))
    numerator = 0
    neg_below = 0
    for r in parts.itertuples():
        numerator += int(r.num_str) + 2 * int(r.pos_tot) * neg_below
        neg_below += int(r.neg_tot)
    P, N = int(parts["pos_tot"].sum()), int(parts["neg_tot"].sum())
    n = P + N
    tp, fp = int(parts["tp"].sum()), int(parts["fp"].sum())
    fn, tn = P - tp, N - fp

    auc = float(numerator) / (2.0 * P * N) if P and N else float("nan")
    return pd.DataFrame({
        "n": [n], "pos": [P], "neg": [N],
        "tp": [tp], "fp": [fp], "tn": [tn], "fn": [fn],
        "accuracy": [(tp + tn) / n if n else float("nan")],
        "precision": [tp / (tp + fp) if tp + fp else float("nan")],
        "recall": [tp / P if P else float("nan")],
        "f1": [2 * tp / (2 * tp + fp + fn)
               if 2 * tp + fp + fn else float("nan")],
        "auc": [auc],
    })


def grouped_auc(ds, group_col: str, label_col: str, score_col: str,
                coarse: int = 64) -> pd.DataFrame:
    """Per-segment tie-aware ROC-AUC — the sliced evaluation readout
    ("how does the classifier do per language / per source / per
    cohort") run right after the global
    ``binary_classification_report``.

    Same exact-integer machinery as the global report, partitioned by
    segment instead of score range: each block pre-aggregates to
    (group, score, pos, neg) partial counts, groups co-locate by key
    hash, and within each group the doubled rank-sum numerator
    ``Σ_pos (2·rank + ties − 1) − P(P+1)`` is computed from exact
    int64 counts — AUC is then ONE double division
    ``num2 / (2·P·N)``, bit-equal to the SQL window mirror
    (``rank()`` + ``count(*) OVER (PARTITION BY g, s)``).  Groups
    with no positives or no negatives are dropped (AUC undefined),
    matching the oracle's ``WHERE P > 0 AND N > 0``.

    Shuffle volume: distinct (group, score) pairs per block — scores
    from a real model are near-unique, so this is bounded by rows in
    the worst case but typically far smaller after quantization; the
    global report's range-partitioned plan is the fallback when ONE
    segment outgrows a task (hot-segment caveat, documented).
    -> pandas (group, pos, neg, auc), group-ascending.
    """
    from raykg.ops.joins import _key_bucket

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t.column(group_col).to_pandas(),
            "s": t.column(score_col).to_numpy(zero_copy_only=False)
                 .astype(np.float64),
            "y": t.column(label_col).to_numpy(zero_copy_only=False)
                 .astype(np.int64),
        })
        df["pos"] = df["y"]
        df["neg"] = 1 - df["y"]
        g = df.groupby(["g", "s"], sort=False).agg(
            pos=("pos", "sum"), neg=("neg", "sum")).reset_index()
        g["_b"] = _key_bucket(pa.array(g["g"]), coarse).to_numpy()
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        f = df.groupby(["g", "s"], sort=False).agg(
            pos=("pos", "sum"), neg=("neg", "sum")).reset_index()
        f = f.sort_values(["g", "s"], kind="stable")
        c = (f["pos"] + f["neg"]).to_numpy(dtype=np.int64)
        # rank of the first row of each (g, s) run: 1 + prefix count
        # within the group
        csum = pd.Series(c).groupby(f["g"].to_numpy()).cumsum() \
            .to_numpy() - c
        rank = csum + 1
        term = f["pos"].to_numpy(dtype=np.int64) * (2 * rank + c - 1)
        out = pd.DataFrame({"g": f["g"], "pos": f["pos"],
                            "neg": f["neg"], "t": term})
        a = out.groupby("g", sort=False).agg(
            pos=("pos", "sum"), neg=("neg", "sum"),
            t=("t", "sum")).reset_index()
        a = a[(a["pos"] > 0) & (a["neg"] > 0)]
        P = a["pos"].to_numpy(dtype=np.int64)
        N = a["neg"].to_numpy(dtype=np.int64)
        num2 = a["t"].to_numpy(dtype=np.int64) - P * (P + 1)
        a["auc"] = num2.astype(np.float64) / (2.0 * P * N)
        return a[["g", "pos", "neg", "auc"]]

    from raykg.ops.exchange import hash_exchange

    out = hash_exchange(
        ds.map_batches(part, batch_format="pyarrow"), "_b", coarse,
        fold).to_pandas()
    return out.sort_values("g").reset_index(drop=True)


def ranking_metrics(results_ds, rel_ds, qid_col: str = "qid",
                    doc_col: str = "doc_id", rank_col: str = "rank",
                    rel_col: str = "rel", k: int = 10,
                    coarse: int = 64):
    """Search-ranking evaluation per query: MRR and nDCG@k — the
    metrics that close the retrieval loop (bm25 / hybrid RRF are the
    producers, this is the judge).

        MRR  = 1 / (first rank with rel > 0)        (0 if none)
        DCG  = Σ_{rank<=k} rel / log2(rank + 1)     (rank-ascending)
        IDCG = same fold over rel sorted (desc, doc) — the ideal
        nDCG = DCG / IDCG                           (0 if IDCG = 0)

    Contract: ``k <= 128`` ranks per query (top-k result lists).
    Plan: one qid-bucket tagged co-location of results ⋈ relevance
    (many queries per task); the log2 values come from a
    ``math.log2`` (libm) lookup table over the k rank positions, each
    per-query fold runs rank-ascending — so DCG/IDCG are bit-equal to
    a SQL ``list_sum(list(term ORDER BY rank))`` oracle, and every
    other statistic is one mirrored float division of exact ints.

    ``rel_ds``: Dataset(qid, doc_id, rel) with INTEGER relevance
    grades; absent pairs take rel 0. -> DataFrame(qid, n_rel, mrr,
    dcg, idcg, ndcg) sorted by qid.
    """
    import math

    from raykg.ops.joins import _key_bucket

    log2v = np.array([0.0] + [math.log2(r + 1)
                              for r in range(1, k + 1)])

    def tag_res(t: pa.Table) -> pa.Table:
        out = pa.table({
            "qid": t.column(qid_col).cast(pa.int64()),
            "doc": t.column(doc_col).cast(pa.int64()),
            "rank": t.column(rank_col).cast(pa.int64()),
            "rel": pa.array(np.zeros(t.num_rows, np.int64)),
            "is_res": pa.array(np.ones(t.num_rows, np.bool_)),
        })
        return out.append_column("_b", _key_bucket(out.column("qid"),
                                                   coarse))

    def tag_rel(t: pa.Table) -> pa.Table:
        out = pa.table({
            "qid": t.column(qid_col).cast(pa.int64()),
            "doc": t.column(doc_col).cast(pa.int64()),
            "rank": pa.array(np.zeros(t.num_rows, np.int64)),
            "rel": t.column(rel_col).cast(pa.int64()),
            "is_res": pa.array(np.zeros(t.num_rows, np.bool_)),
        })
        return out.append_column("_b", _key_bucket(out.column("qid"),
                                                   coarse))

    both = (results_ds.map_batches(tag_res, batch_format="pyarrow")
            .union(rel_ds.map_batches(tag_rel,
                                      batch_format="pyarrow")))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["qid", "n_rel", "mrr", "dcg", "idcg", "ndcg"]
        res = g[g["is_res"]][["qid", "doc", "rank"]]
        rel = g[~g["is_res"]][["qid", "doc", "rel"]]
        m = res.merge(rel, on=["qid", "doc"], how="left")
        m["rel"] = m["rel"].fillna(0).astype(np.int64)
        # ranks are 1-based; a rank<1 row must not wrap via negative
        # indexing into another rank position's relm column
        m = m[(m["rank"] >= 1) & (m["rank"] <= k)]
        if not len(m):
            return pd.DataFrame({c: [] for c in cols})
        # (queries × rank-position) relevance grid; the folds run
        # RANK-ASCENDING (vectorized across queries) — absent ranks
        # contribute +0.0, an exact identity, so each query's fold is
        # bit-equal to folding only its present ranks in order
        qids = np.sort(m["qid"].unique())
        qix = np.searchsorted(qids, m["qid"].to_numpy())
        relm = np.zeros((len(qids), k + 1))
        relm[qix, m["rank"].to_numpy(np.int64)] = \
            m["rel"].to_numpy(np.int64)
        body = relm[:, 1:]
        dcg = np.zeros(len(qids))
        for r in range(1, k + 1):
            dcg += relm[:, r] / log2v[r]
        ideal = np.sort(body, axis=1)[:, ::-1]
        idcg = np.zeros(len(qids))
        for i in range(ideal.shape[1]):
            idcg += ideal[:, i] / log2v[i + 1]
        has = (body > 0).any(axis=1)
        first = np.argmax(body > 0, axis=1) + 1
        mrr = np.where(has, 1.0 / first, 0.0)
        ndcg = np.where(idcg > 0, dcg / np.where(idcg > 0, idcg, 1.0),
                        0.0)
        return pd.DataFrame({
            "qid": qids, "n_rel": (body > 0).sum(axis=1),
            "mrr": mrr, "dcg": dcg, "idcg": idcg, "ndcg": ndcg,
        })

    from raykg.ops.exchange import hash_exchange

    out = hash_exchange(both, "_b", coarse, fold).to_pandas()
    out["qid"] = out["qid"].astype("int64")
    out["n_rel"] = out["n_rel"].astype("int64")
    return out.sort_values("qid").reset_index(drop=True)
