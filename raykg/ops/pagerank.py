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

Scale shape: edges are bucketed ONCE by h(src) into object-store
blobs and ITERATED AS RAW TASKS (the documented raw-task case:
iterative co-partitioned state) — each iteration is coarse contrib
tasks (segmented sums per src bucket, pre-grouped by h(dst)) + coarse
apply tasks, with only the scalar dangling mass crossing the driver.
The rank vectors (one float per node) are the only state that moves
between iterations; the edge blobs never leave the object store.
Partitioning assumption: one src-hash bucket of edges fits a task
(``coarse`` spreads uniformly; a super-node's OUT-edges share one
bucket — at web scale raise ``coarse`` so max out-degree x row width
fits memory).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

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
    coarse: int = 32,
):
    """-> Dataset of ``(node, rank)`` over all nodes appearing in any
    edge. Duplicate edges count once (multi-edges are deduped, the
    convention of the numpy reference and most graph libraries'
    default adjacency-matrix formulation).

    Implementation: the ITERATION runs as raw Ray tasks over
    co-partitioned object-store state — the documented raw-task case
    (iterative shared state the Dataset API cannot express without
    paying a full shuffle-job's fixed cost per iteration; the previous
    Ray-Data-loop formulation spent ~4 all-to-all jobs x n_iter on
    scheduling overhead alone, 40-70 s at fixture scale for seconds of
    actual work). One Ray-Data pass buckets the edge list by h(src)
    into per-bucket blobs (src positions, per-edge 1/outdeg, dst runs
    grouped by h(dst), sink mask — all precomputed once); each
    iteration is then coarse ``_pr_contribs`` tasks (one GEMV-shaped
    gather + segmented sums per src bucket) and coarse ``_pr_apply``
    tasks (merge the dst-bucket partials), with only the scalar
    dangling mass synchronizing on the driver. The rank vectors (one
    float per node) are the only state that moves between iterations;
    the edge blobs never leave the object store.
    """
    coarse = max(2, coarse)  # num_returns=1 would not unpack per-bucket refs

    def prep(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "src": t.column(src_col).to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "dst": t.column(dst_col).to_numpy(zero_copy_only=False)
            .astype(np.int64),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    block_refs = list(
        edges_ds.map_batches(prep, batch_format="pyarrow").to_arrow_refs()
    )
    if not block_refs:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64()),
        }))

    # manual bucket exchange: each block splits into coarse edge parts
    # (by h(src)) + coarse dst-id parts (by h(dst)); parts stay in the
    # object store, the driver routes refs only.
    @ray.remote
    def _pr_split(tbl: pa.Table, c: int):
        if tbl.num_rows == 0 or "src" not in tbl.column_names:
            # zero-row blocks can bypass the prep map and arrive with
            # the upstream schema — emit typed empty parts
            z = np.zeros(0, np.int64)
            return [(z, z) for _ in range(c)] + [z for _ in range(c)]
        s = tbl.column("src").to_numpy(zero_copy_only=False)
        d = tbl.column("dst").to_numpy(zero_copy_only=False)
        sb = _bucket(s, c)
        db = _bucket(d, c)
        out = []
        for j in range(c):
            m = sb == j
            out.append((s[m], d[m]))
        for j in range(c):
            out.append(np.unique(d[db == j]))
        return out

    splits = [
        _pr_split.options(num_returns=2 * coarse).remote(b, coarse)
        for b in block_refs
    ]

    @ray.remote(num_returns=3)
    def _pr_assemble(c: int, *parts):
        k = len(parts) // 2
        s = np.concatenate([p[0] for p in parts[:k]]) if k else np.zeros(
            0, np.int64)
        d = np.concatenate([p[1] for p in parts[:k]]) if k else np.zeros(
            0, np.int64)
        ed = np.unique(np.stack([s, d], axis=1), axis=0) if len(s) else \
            np.zeros((0, 2), np.int64)
        s, d = ed[:, 0], ed[:, 1]
        dst_only = (np.concatenate(parts[k:]) if k else
                    np.zeros(0, np.int64))
        nodes = np.unique(np.concatenate([s, dst_only]))
        # outdeg per node of this bucket (0 for dst-only sinks)
        outdeg = np.zeros(len(nodes), dtype=np.int64)
        if len(s):
            sp = np.searchsorted(nodes, s)
            np.add.at(outdeg, sp, 1)
        else:
            sp = np.zeros(0, np.int64)
        inv_deg = 1.0 / outdeg[sp] if len(sp) else np.zeros(0)
        # order edges by (h(dst), dst) once; contribs then emits each
        # dst bucket's partial sums with one reduceat per run
        db = _bucket(d, c)
        order = np.lexsort((d, db))
        d, sp, inv_deg, db = d[order], sp[order], inv_deg[order], db[order]
        db_off = np.searchsorted(db, np.arange(c + 1))
        sink = outdeg == 0
        blob = (db_off, d, sp, inv_deg, sink)
        return blob, nodes, int(len(nodes))

    asm = [
        _pr_assemble.remote(
            coarse,
            *[splits[i][j] for i in range(len(splits))],
            *[splits[i][coarse + j] for i in range(len(splits))],
        )
        for j in range(coarse)
    ]
    blob_refs = [a[0] for a in asm]
    node_refs = [a[1] for a in asm]
    n_nodes = sum(ray.get([a[2] for a in asm]))
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64()),
        }))

    @ray.remote
    def _pr_init(nodes, n):
        return np.full(len(nodes), 1.0 / n, dtype=np.float64)

    rank_refs = [_pr_init.remote(node_refs[j], n_nodes)
                 for j in range(coarse)]

    @ray.remote
    def _pr_contribs(blob, ranks, c: int):
        db_off, d, sp, inv_deg, sink = blob
        contrib = ranks[sp] * inv_deg if len(sp) else np.zeros(0)
        out = []
        for j in range(c):
            lo, hi = int(db_off[j]), int(db_off[j + 1])
            dj, cj = d[lo:hi], contrib[lo:hi]
            if len(dj):
                starts = np.flatnonzero(np.r_[True, dj[1:] != dj[:-1]])
                out.append((dj[starts], np.add.reduceat(cj, starts)))
            else:
                out.append((dj, cj))
        out.append(float(ranks[sink].sum()))
        return out

    @ray.remote
    def _pr_apply(nodes, base: float, d_factor: float, *parts):
        acc = np.zeros(len(nodes), dtype=np.float64)
        for ids, sums in parts:
            if len(ids):
                np.add.at(acc, np.searchsorted(nodes, ids), sums)
        return base + d_factor * acc

    for _ in range(n_iter):
        res = [
            _pr_contribs.options(num_returns=coarse + 1).remote(
                blob_refs[j], rank_refs[j], coarse)
            for j in range(coarse)
        ]
        dangling = sum(ray.get([r[coarse] for r in res]))
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes
        rank_refs = [
            _pr_apply.remote(node_refs[j], base, damping,
                             *[res[i][j] for i in range(coarse)])
            for j in range(coarse)
        ]

    @ray.remote
    def _pr_table(nodes, ranks) -> pa.Table:
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "rank": pa.array(ranks, pa.float64())})

    tables = [_pr_table.remote(node_refs[j], rank_refs[j])
              for j in range(coarse)]
    return ray.data.from_arrow_refs(tables)


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
