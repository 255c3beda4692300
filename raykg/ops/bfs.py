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


def sssp_distances(
    edges_ds,
    sources: list[int],
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    max_hops: int = 32,
    coarse: int = 32,
):
    """Weighted single-source (multi-seed) shortest paths, hop-capped:
    dist(v) = min over directed paths of <= ``max_hops`` edges from any
    seed of the path's integer weight sum (non-negative weights;
    parallel edges reduce to their min weight). Bellman-Ford by rounds
    with frontier pruning — after round r every shortest path using
    <= r edges is settled, so ``max_hops`` rounds realize exactly the
    hop-capped semantics the recursive-CTE oracle computes.

    Same co-partitioned raw-task plan as ``bfs_distances`` (edge blobs
    bucketed once by h(src), per-bucket (nodes, dist, changed) state,
    only per-bucket update counts on the driver); the per-round message
    volume is min-reduced per dst BEFORE leaving the expand task.
    -> Dataset(node, dist) for reached nodes (seeds at 0).
    """
    coarse = max(2, coarse)
    seed_arr = np.unique(np.asarray(sorted(set(int(s) for s in sources)),
                                    dtype=np.int64))
    INF = np.int64(2**62)

    def prep(t: pa.Table) -> pa.Table:
        s = t.column(src_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        d = t.column(dst_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        if len(s):
            # reduce parallel edges to min weight per (src, dst)
            order = np.lexsort((w, d, s))
            s, d, w = s[order], d[order], w[order]
            first = np.ones(len(s), bool)
            first[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
            s, d, w = s[first], d[first], w[first]
        return pa.table({"src": pa.array(s), "dst": pa.array(d),
                         "w": pa.array(w)})

    block_refs = list(
        edges_ds.map_batches(prep, batch_format="pyarrow").to_arrow_refs()
    )

    empty = pa.table({"node": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})
    if not block_refs and len(seed_arr) == 0:
        return ray.data.from_arrow(empty)

    @ray.remote
    def _sp_split(tbl: pa.Table, c: int):
        if tbl.num_rows == 0 or "src" not in tbl.column_names:
            z = np.zeros(0, np.int64)
            return [(z, z, z) for _ in range(c)] + [z for _ in range(c)]
        s = tbl.column("src").to_numpy(zero_copy_only=False)
        d = tbl.column("dst").to_numpy(zero_copy_only=False)
        w = tbl.column("w").to_numpy(zero_copy_only=False)
        sb = _bucket(s, c)
        out = []
        for j in range(c):
            m = sb == j
            out.append((s[m], d[m], w[m]))
        ids = np.unique(np.concatenate([s, d]))
        ib = _bucket(ids, c)
        for j in range(c):
            out.append(ids[ib == j])
        return out

    splits = [
        _sp_split.options(num_returns=2 * coarse).remote(b, coarse)
        for b in block_refs
    ]

    @ray.remote(num_returns=2)
    def _sp_assemble(c: int, seeds: np.ndarray, j: int, *parts):
        k = len(parts) // 2
        if k:
            s = np.concatenate([p[0] for p in parts[:k]])
            d = np.concatenate([p[1] for p in parts[:k]])
            w = np.concatenate([p[2] for p in parts[:k]])
        else:
            s = d = w = np.zeros(0, np.int64)
        if len(s):
            # blocks may carry duplicate (src, dst): keep min weight
            order = np.lexsort((w, d, s))
            s, d, w = s[order], d[order], w[order]
            first = np.ones(len(s), bool)
            first[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
            s, d, w = s[first], d[first], w[first]
        node_parts = list(parts[k:])
        sj = seeds[_bucket(seeds, c) == j]
        node_parts.append(sj)
        nodes = np.unique(np.concatenate(node_parts)) if node_parts \
            else np.zeros(0, np.int64)
        sp = np.searchsorted(nodes, s)
        db = _bucket(d, c)
        order = np.lexsort((d, db))
        d, sp, w, db = d[order], sp[order], w[order], db[order]
        db_off = np.searchsorted(db, np.arange(c + 1))
        dist = np.full(len(nodes), INF, dtype=np.int64)
        changed = np.zeros(len(nodes), bool)
        spos = np.searchsorted(nodes, sj)
        dist[spos] = 0
        changed[spos] = True
        return (db_off, d, sp, w), (nodes, dist, changed)

    asm = [
        _sp_assemble.remote(
            coarse, seed_arr, j,
            *[splits[i][j] for i in range(len(splits))],
            *[splits[i][coarse + j] for i in range(len(splits))],
        )
        for j in range(coarse)
    ]
    blob_refs = [a[0] for a in asm]
    state_refs = [a[1] for a in asm]

    @ray.remote
    def _sp_expand(blob, state, c: int):
        db_off, d, sp, w = blob
        nodes, dist, changed = state
        out = []
        for j in range(c):
            lo, hi = int(db_off[j]), int(db_off[j + 1])
            m = changed[sp[lo:hi]] if hi > lo else np.zeros(0, bool)
            dj, nd = d[lo:hi][m], dist[sp[lo:hi]][m] + w[lo:hi][m]
            if len(dj):
                # slice is d-sorted; min-reduce per dst before shipping
                starts = np.concatenate(
                    [[0], np.flatnonzero(dj[1:] != dj[:-1]) + 1])
                out.append((dj[starts], np.minimum.reduceat(nd, starts)))
            else:
                z = np.zeros(0, np.int64)
                out.append((z, z))
        return out

    @ray.remote(num_returns=2)
    def _sp_apply(state, *cand_parts):
        nodes, dist, changed = state
        ids = np.concatenate([p[0] for p in cand_parts]) if cand_parts \
            else np.zeros(0, np.int64)
        nds = np.concatenate([p[1] for p in cand_parts]) if cand_parts \
            else np.zeros(0, np.int64)
        changed = np.zeros(len(nodes), bool)
        if len(ids):
            uniq, inv = np.unique(ids, return_inverse=True)
            best = np.full(len(uniq), INF, np.int64)
            np.minimum.at(best, inv, nds)
            pos = np.searchsorted(nodes, uniq)
            better = best < dist[pos]
            if better.any():
                dist = dist.copy()
                dist[pos[better]] = best[better]
                changed[pos[better]] = True
        return (nodes, dist, changed), int(changed.sum())

    for _ in range(max_hops):
        res = [
            _sp_expand.options(num_returns=coarse).remote(
                blob_refs[j], state_refs[j], coarse)
            for j in range(coarse)
        ]
        applied = [
            _sp_apply.remote(state_refs[j],
                             *[res[i][j] for i in range(coarse)])
            for j in range(coarse)
        ]
        state_refs = [a[0] for a in applied]
        if sum(ray.get([a[1] for a in applied])) == 0:
            break

    @ray.remote
    def _sp_table(state) -> pa.Table:
        nodes, dist, _changed = state
        keep = dist < INF
        return pa.table({"node": pa.array(nodes[keep], pa.int64()),
                         "dist": pa.array(dist[keep], pa.int64())})

    return ray.data.from_arrow_refs(
        [_sp_table.remote(state_refs[j]) for j in range(coarse)])


def sssp_numpy(edges: np.ndarray, sources: list[int],
               max_hops: int = 32) -> dict[int, int]:
    """Single-process reference: hop-capped Bellman-Ford over
    (src, dst, w) rows with identical semantics."""
    best: dict[int, int] = {int(s): 0 for s in set(sources)}
    ew: dict[tuple[int, int], int] = {}
    for s, d, w in edges:
        k = (int(s), int(d))
        if k not in ew or w < ew[k]:
            ew[k] = int(w)
    for _ in range(max_hops):
        upd = {}
        for (s, d), w in ew.items():
            if s in best:
                nd = best[s] + w
                if nd < best.get(d, 2**62) and nd < upd.get(d, 2**62):
                    upd[d] = nd
        if not upd:
            break
        best.update(upd)
    return best


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
