"""Multi-source BFS shortest-hop distances — the third graph operator
beside connected components (ops/cc.py) and PageRank (ops/pagerank.py):
for every node reachable from a seed set, the minimum number of
directed edges from ANY seed ("hops from the crawl frontier", "degrees
of separation from flagged users" — the reachability primitive of
link-graph curation).

Semantics: dist(v) = 0 for seeds, else min over in-neighbours u of
dist(u) + 1, capped at ``max_hops`` (unreached nodes are omitted).
Deterministic and exactly SQL-expressible — the oracle is a recursive
CTE closed under ``min(dist) GROUP BY node``.

Scale shape (the documented raw-task case: iterative co-partitioned
state, same plan as ops/pagerank.py): edges are bucketed ONCE by
h(src) into object-store blobs, nodes by h(node) into per-bucket
sorted id arrays with an int64 dist vector; each BFS level is coarse
``_bfs_expand`` tasks (gather the bucket's frontier srcs, emit each
dst bucket's unique candidate ids) + coarse ``_bfs_apply`` tasks
(settle still-unreached candidates), with only the per-bucket update
COUNTS crossing the driver (the loop stops when they sum to zero).
The dist vectors (one int per node) are the only state that moves
between iterations; the edge blobs never leave the object store.
Partitioning assumption: one src-hash bucket of edges fits a task —
``coarse`` spreads uniformly; a super-node's out-edges share one
bucket, so at web scale raise ``coarse`` until max out-degree x 16 B
fits worker memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from raykg.ops.pagerank import _bucket


def bfs_distances(
    edges_ds,
    sources: list[int],
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
    coarse: int = 32,
):
    """-> Dataset of ``(node, dist)`` for every node whose shortest
    directed hop distance from the seed set is <= ``max_hops``
    (seeds themselves at dist 0, even when isolated). Duplicate edges
    are harmless (BFS settles each node once); self-loops never
    change a distance.
    """
    coarse = max(2, coarse)  # num_returns=1 would not unpack refs
    seed_arr = np.unique(np.asarray(sorted(set(int(s) for s in sources)),
                                    dtype=np.int64))

    def prep(t: pa.Table) -> pa.Table:
        s = t.column(src_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        d = t.column(dst_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        ed = np.unique(np.stack([s, d], axis=1), axis=0) if len(s) \
            else np.zeros((0, 2), np.int64)
        return pa.table({"src": pa.array(ed[:, 0]),
                         "dst": pa.array(ed[:, 1])})

    block_refs = list(
        edges_ds.map_batches(prep, batch_format="pyarrow").to_arrow_refs()
    )

    empty = pa.table({"node": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})
    if not block_refs and len(seed_arr) == 0:
        return ray.data.from_arrow(empty)

    # one exchange: every block splits into coarse (src, dst) edge
    # parts by h(src) + coarse node-id parts by h(node); the driver
    # routes refs only.
    @ray.remote
    def _bfs_split(tbl: pa.Table, c: int):
        if tbl.num_rows == 0 or "src" not in tbl.column_names:
            z = np.zeros(0, np.int64)
            return [(z, z) for _ in range(c)] + [z for _ in range(c)]
        s = tbl.column("src").to_numpy(zero_copy_only=False)
        d = tbl.column("dst").to_numpy(zero_copy_only=False)
        sb = _bucket(s, c)
        out = []
        for j in range(c):
            m = sb == j
            out.append((s[m], d[m]))
        ids = np.unique(np.concatenate([s, d]))
        ib = _bucket(ids, c)
        for j in range(c):
            out.append(ids[ib == j])
        return out

    splits = [
        _bfs_split.options(num_returns=2 * coarse).remote(b, coarse)
        for b in block_refs
    ]

    @ray.remote(num_returns=2)
    def _bfs_assemble(c: int, seeds: np.ndarray, j: int, *parts):
        k = len(parts) // 2
        s = np.concatenate([p[0] for p in parts[:k]]) if k else \
            np.zeros(0, np.int64)
        d = np.concatenate([p[1] for p in parts[:k]]) if k else \
            np.zeros(0, np.int64)
        if len(s):
            ed = np.unique(np.stack([s, d], axis=1), axis=0)
            s, d = ed[:, 0], ed[:, 1]
        node_parts = list(parts[k:])
        # seeds may be isolated (no edges) — they still own a dist row
        sj = seeds[_bucket(seeds, c) == j]
        node_parts.append(sj)
        nodes = np.unique(np.concatenate(node_parts)) if node_parts \
            else np.zeros(0, np.int64)
        sp = np.searchsorted(nodes, s)  # src position in THIS bucket
        # order edges by (h(dst), dst): expand emits each dst bucket's
        # slice with one unique() per run
        db = _bucket(d, c)
        order = np.lexsort((d, db))
        d, sp, db = d[order], sp[order], db[order]
        db_off = np.searchsorted(db, np.arange(c + 1))
        dist = np.full(len(nodes), -1, dtype=np.int64)
        dist[np.searchsorted(nodes, sj)] = 0
        return (db_off, d, sp), (nodes, dist)

    asm = [
        _bfs_assemble.remote(
            coarse, seed_arr, j,
            *[splits[i][j] for i in range(len(splits))],
            *[splits[i][coarse + j] for i in range(len(splits))],
        )
        for j in range(coarse)
    ]
    blob_refs = [a[0] for a in asm]
    state_refs = [a[1] for a in asm]

    @ray.remote
    def _bfs_expand(blob, state, level: int, c: int):
        db_off, d, sp = blob
        nodes, dist = state
        frontier = dist[sp] == level if len(sp) else np.zeros(0, bool)
        out = []
        for j in range(c):
            lo, hi = int(db_off[j]), int(db_off[j + 1])
            out.append(np.unique(d[lo:hi][frontier[lo:hi]]))
        return out

    @ray.remote(num_returns=2)
    def _bfs_apply(state, level: int, *cand_parts):
        nodes, dist = state
        if len(cand_parts):
            cand = np.unique(np.concatenate(cand_parts))
        else:
            cand = np.zeros(0, np.int64)
        pos = np.searchsorted(nodes, cand)
        fresh = pos[dist[pos] < 0]
        if len(fresh):
            dist = dist.copy()
            dist[fresh] = level + 1
        return (nodes, dist), int(len(fresh))

    for level in range(max_hops):
        res = [
            _bfs_expand.options(num_returns=coarse).remote(
                blob_refs[j], state_refs[j], level, coarse)
            for j in range(coarse)
        ]
        applied = [
            _bfs_apply.remote(state_refs[j], level,
                              *[res[i][j] for i in range(coarse)])
            for j in range(coarse)
        ]
        state_refs = [a[0] for a in applied]
        if sum(ray.get([a[1] for a in applied])) == 0:
            break

    @ray.remote
    def _bfs_table(state) -> pa.Table:
        nodes, dist = state
        keep = dist >= 0
        return pa.table({"node": pa.array(nodes[keep], pa.int64()),
                         "dist": pa.array(dist[keep], pa.int64())})

    return ray.data.from_arrow_refs(
        [_bfs_table.remote(state_refs[j]) for j in range(coarse)])


def bfs_numpy(edges: np.ndarray, sources: list[int],
              max_hops: int = 32) -> dict[int, int]:
    """Single-process reference with identical semantics."""
    from collections import deque

    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(int(s), []).append(int(d))
    dist = {int(s): 0 for s in set(sources)}
    q = deque(dist)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist
