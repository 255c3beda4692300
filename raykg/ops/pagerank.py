"""Distributed PageRank by power iteration — the second graph
operator beside connected components (ops/cc.py), for link-structure
importance over corpus-derived graphs (URL/citation/co-mention
graphs are standard features in web-corpus quality filtering).

Semantics (the classic formulation, with dangling-mass
redistribution): rank'(v) = (1-d)/N + d * ( Σ_{u→v} rank(u)/deg(u)
+ dangling/N ), where ``dangling`` is the rank mass sitting on nodes
with no out-edges. Fixed ``n_iter`` iterations from the uniform
start — deterministic, so tests pin it against a dense numpy
reference bit-for-bit (float64 sums ordered per bucket).

Scale shape: edges are bucketed ONCE by h(src) and iterated in place;
each iteration is (1) a bucket-local rank lookup (ranks arrive
bucketed the same way — the co-partitioning trick, no per-iteration
re-join of the full edge set), (2) a contribution groupby h(dst), and
(3) a left-join back onto the node list for zero-indegree nodes. The
rank table (one float per node) is the only state that moves between
iterations; the edge table never leaves its buckets. Partitioning
assumption: one src-hash bucket of edges fits a task (``coarse``
spreads uniformly; a super-node's OUT-edges share one bucket — at web
scale raise ``coarse`` so max out-degree x row width fits memory).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data.aggregate import Sum

PR_BUCKETS = 64
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _bucket(keys: np.ndarray, coarse: int) -> np.ndarray:
    return (
        (keys.astype(np.uint64) * _GOLDEN) >> np.uint64(52)
    ).astype(np.int64) % coarse


def pagerank(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
    coarse: int = PR_BUCKETS,
):
    """-> Dataset of ``(node, rank)`` over all nodes appearing in any
    edge. Duplicate edges count once (multi-edges are deduped, the
    convention of the numpy reference and most graph libraries'
    default adjacency-matrix formulation)."""

    # ---- one-time: dedup edges, out-degree per src, node universe.
    # Everything below is bucketed by the SAME h(key)%coarse so ranks
    # and edges meet bucket-locally each iteration.
    def prep(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "src": t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64),
            "dst": t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64),
        }).drop_duplicates()
        df["_b"] = _bucket(df["src"].to_numpy(), coarse)
        return pa.Table.from_pandas(df, preserve_index=False)

    edges = (
        edges_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: g.drop_duplicates(subset=["src", "dst"]),
            batch_format="pandas",
        )
        .materialize()  # iterated n_iter times — pay the exchange once
    )

    def degs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("src", as_index=False).size()
        d = d.rename(columns={"src": "node", "size": "outdeg"})
        d["_b"] = g["_b"].iloc[0]
        return d

    outdeg = edges.groupby("_b").map_groups(degs, batch_format="pandas")

    def nodes_of(t: pa.Table) -> pa.Table:
        ns = np.unique(np.concatenate([
            t.column("src").to_numpy(zero_copy_only=False),
            t.column("dst").to_numpy(zero_copy_only=False),
        ]).astype(np.int64))
        return pa.table({"node": pa.array(ns, pa.int64()),
                         "_b": pa.array(_bucket(ns, coarse))})

    nodes = (
        edges.map_batches(nodes_of, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(lambda g: g.drop_duplicates(subset=["node"]),
                    batch_format="pandas")
        .materialize()
    )
    n_nodes = nodes.count()

    # node -> outdeg (0 for sinks), bucketed; this joins ranks each
    # iteration so contributions divide by degree bucket-locally
    def with_deg(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == 0][["node", "_b"]]
        right = g[g["_side"] == 1][["node", "outdeg"]]
        m = left.merge(right, on="node", how="left")
        m["outdeg"] = m["outdeg"].fillna(0).astype("int64")
        return m

    node_deg = (
        nodes.map_batches(
            lambda t: t.append_column("_side", pa.array(
                np.zeros(t.num_rows, np.int8))),
            batch_format="pyarrow")
        .union(outdeg.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "_b": t.column("_b"),
                "outdeg": t.column("outdeg"),
                "_side": pa.array(np.ones(t.num_rows, np.int8)),
            }), batch_format="pyarrow"))
        .groupby("_b")
        .map_groups(with_deg, batch_format="pandas")
        .materialize()
    )

    ranks = node_deg.map_batches(
        lambda t: t.append_column(
            "rank", pa.array(np.full(t.num_rows, 1.0 / n_nodes))),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(n_iter):
        # (1) bucket-local src-rank lookup -> per-edge contribution
        def contribs(g: pd.DataFrame) -> pd.DataFrame:
            rk = g[g["_side"] == 0][["node", "rank", "outdeg"]]
            eg = g[g["_side"] == 1][["src", "dst"]]
            m = eg.merge(rk.rename(columns={"node": "src"}), on="src",
                         how="left")
            out = pd.DataFrame({
                "dst": m["dst"],
                "c": (m["rank"] / m["outdeg"]).astype(np.float64),
            })
            out["_db"] = _bucket(out["dst"].to_numpy(), coarse)
            # bucket-local pre-sum: the exchange ships one row per
            # distinct dst per src-bucket
            return out.groupby(["_db", "dst"], as_index=False)["c"].sum()

        tagged = ranks.map_batches(
            lambda t: pa.table({
                "node": t.column("node"), "_b": t.column("_b"),
                "rank": t.column("rank"), "outdeg": t.column("outdeg"),
                "src": pa.nulls(t.num_rows, pa.int64()),
                "dst": pa.nulls(t.num_rows, pa.int64()),
                "_side": pa.array(np.zeros(t.num_rows, np.int8)),
            }), batch_format="pyarrow",
        ).union(edges.map_batches(
            lambda t: pa.table({
                "node": pa.nulls(t.num_rows, pa.int64()),
                "_b": t.column("_b"),
                "rank": pa.nulls(t.num_rows, pa.float64()),
                "outdeg": pa.nulls(t.num_rows, pa.int64()),
                "src": t.column("src"), "dst": t.column("dst"),
                "_side": pa.array(np.ones(t.num_rows, np.int8)),
            }), batch_format="pyarrow"))
        contrib = (
            tagged.groupby("_b").map_groups(contribs, batch_format="pandas")
            .groupby("_db")
            .map_groups(
                lambda g: g.groupby("dst", as_index=False)["c"].sum()
                .assign(_db=g["_db"].iloc[0]),
                batch_format="pandas",
            )
            .materialize()
        )
        # (2) dangling mass: whatever of the unit total did not flow
        flowed = contrib.map_batches(
            lambda t: pa.table({"s": pa.array(
                [np.float64(t.column("c").to_numpy().sum())])}),
            batch_format="pyarrow",
        ).sum("s")
        dangling = 1.0 - float(flowed or 0.0)
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes

        # (3) left-join contributions back onto the node universe
        def apply(g: pd.DataFrame) -> pd.DataFrame:
            nd = g[g["_side"] == 0][["node", "_b", "outdeg"]]
            cb = g[g["_side"] == 1][["node", "c"]]
            m = nd.merge(cb, on="node", how="left")
            m["rank"] = base + damping * m["c"].fillna(0.0)
            return m[["node", "_b", "outdeg", "rank"]]

        ranks = (
            node_deg.map_batches(
                lambda t: pa.table({
                    "node": t.column("node"), "_b": t.column("_b"),
                    "outdeg": t.column("outdeg"),
                    "c": pa.nulls(t.num_rows, pa.float64()),
                    "_side": pa.array(np.zeros(t.num_rows, np.int8)),
                }), batch_format="pyarrow")
            .union(contrib.map_batches(
                lambda t: pa.table({
                    "node": t.column("dst").cast(pa.int64()),
                    "_b": t.column("_db").cast(pa.int64()),
                    "outdeg": pa.nulls(t.num_rows, pa.int64()),
                    "c": t.column("c"),
                    "_side": pa.array(np.ones(t.num_rows, np.int8)),
                }), batch_format="pyarrow"))
            .groupby("_b")
            .map_groups(apply, batch_format="pandas")
            .materialize()
        )

    return ranks.map_batches(
        lambda t: t.select(["node", "rank"]), batch_format="pyarrow"
    )


def pagerank_numpy(edges: np.ndarray, damping: float = 0.85,
                   n_iter: int = 10) -> dict[int, float]:
    """Dense single-process reference with identical semantics."""
    edges = np.unique(edges, axis=0)
    nodes = np.unique(edges)
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, d in edges:
        A[idx[d], idx[s]] = 1.0
    deg = A.sum(axis=0)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = A @ np.where(deg > 0, r / np.maximum(deg, 1), 0.0)
        dangling = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {int(nodes[i]): float(r[i]) for i in range(n)}
