"""Transitive ancestor closure of a hierarchy — flatten a parent-child
relation (category tree, org chart, ontology subclass-of, dimension
rollup paths) into (node, ancestor, depth) rows, the precomputed
closure table every hierarchical query wants (SQL's recursive-CTE
result, materialized once).

Algorithm: min-plus POINTER DOUBLING. Round k holds, for every pair,
the exact minimum path length over paths of <= 2^k edges
(``R_{k+1} = min(R_k, R_k ∘ R_k)``); the loop stops when a round adds
no pairs — at that point the pair set is the full closure and every
depth is exact (a first-new-pair at round k+1 would need a factor pair
first seen at round k). ceil(log2(max depth)) rounds instead of the
semi-naive chain's max-depth rounds.

Scale shape: each round is TWO bucketed exchanges, both bounded by the
closure size (never n²) — (1) a tagged-union compose exchange
co-locating R by h(anc) against R by h(node) (the hash_join plan,
raykg/ops/joins.py) with per-bucket vectorized merge, (2) a
(node, anc)-bucketed min-depth dedup. The frontier Dataset is
materialized once per round (iterative algorithms re-execute lazy
lineage otherwise — the pagerank lesson).

Contract: any directed graph. Depths are exact shortest WALK lengths
(== path lengths for acyclic input; a cycle yields finite self-pairs,
e.g. (i, i) at the cycle length, and the pair set still saturates, so
the count-stable termination holds). ``max_rounds`` caps the loop at
2^max_rounds edge diameter; hitting the cap raises rather than
silently returning a partial closure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raykg.ops.joins import _key_bucket

CLOSURE_BUCKETS = 64


def _dedup_min_depth(ds, coarse: int):
    """(node, anc)-bucketed min(depth) — pair-key exchange; each pair
    lives wholly in one bucket, so per-bucket mins are global."""
    def bucketize(t: pa.Table) -> pa.Table:
        n = t.column("node").to_numpy(zero_copy_only=False)
        a = t.column("anc").to_numpy(zero_copy_only=False)
        key = pa.array(n * np.int64(1_000_003) + a)
        return t.append_column("_b", _key_bucket(key, coarse))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["node", "anc"], sort=False, as_index=False)
               ["depth"].min())
        return out[["node", "anc", "depth"]]

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        "_b", coarse, fold)


def ancestor_closure(edges_ds, child_col: str = "child",
                     parent_col: str = "parent", max_rounds: int = 16,
                     coarse: int = CLOSURE_BUCKETS):
    """-> Dataset(node, anc, depth): every (node, ancestor) pair
    reachable through >= 1 ``child -> parent`` edges with its exact
    minimum edge distance. int64 keys."""

    def project(t: pa.Table) -> pa.Table:
        c = t.column(child_col).cast(pa.int64())
        p = t.column(parent_col).cast(pa.int64())
        n = t.num_rows
        return pa.table({
            "node": c, "anc": p,
            "depth": pa.array(np.ones(n, np.int64)),
        })

    R = _dedup_min_depth(
        edges_ds.map_batches(project, batch_format="pyarrow"), coarse
    ).materialize()
    prev = R.count()

    def tag_both(t: pa.Table) -> pa.Table:
        # one map emits BOTH exchange copies of each pair (no
        # Dataset.union — two lazy branches over one materialized
        # parent deadlocked the streaming executor): side 0 keyed by
        # h(anc) joins side 1 keyed by h(node).
        two = pa.concat_tables([t, t])
        n = t.num_rows
        side = pa.array(np.concatenate(
            [np.zeros(n, np.int8), np.ones(n, np.int8)]))
        b = pa.concat_arrays([
            _key_bucket(t.column("anc"), coarse),
            _key_bucket(t.column("node"), coarse),
        ])
        return pa.table({
            "node": two.column("node"), "anc": two.column("anc"),
            "depth": two.column("depth"), "side": side, "_b": b,
        })

    def compose(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["side"] == 0]
        # side-1 rows are exactly R's rows with h(node) == this
        # bucket — a partition of R, re-emitted below so the output
        # dataset is R ∪ composed with no union
        right = df[df["side"] == 1]
        keep = right[["node", "anc", "depth"]]
        if left.empty or right.empty:
            return keep
        m = left.merge(right, left_on="anc", right_on="node",
                       suffixes=("", "_r"))
        if m.empty:
            return keep
        new = pd.DataFrame({
            "node": m["node"].to_numpy(np.int64),
            "anc": m["anc_r"].to_numpy(np.int64),
            "depth": (m["depth"].to_numpy(np.int64)
                      + m["depth_r"].to_numpy(np.int64)),
        })
        return pd.concat([keep, new], ignore_index=True)

    for _ in range(max_rounds):
        from raykg.ops.exchange import hash_exchange

        unioned = hash_exchange(
            R.map_batches(tag_both, batch_format="pyarrow"),
            "_b", coarse, compose)
        R2 = _dedup_min_depth(unioned, coarse).materialize()
        cnt = R2.count()
        R = R2
        if cnt == prev:
            return R
        prev = cnt
    raise ValueError(
        f"ancestor_closure did not converge in {max_rounds} rounds "
        "(graph diameter exceeds 2^max_rounds; raise max_rounds)")


def closure_bruteforce(edges: list[tuple[int, int]]) -> pd.DataFrame:
    """Single-process reference: BFS up the parent relation from every
    node; identical (node, anc, depth) semantics."""
    from collections import defaultdict, deque

    up = defaultdict(list)
    for c, p in edges:
        up[int(c)].append(int(p))
    rows = []
    for start in sorted(up):
        best: dict[int, int] = {}
        q = deque([(start, 0)])
        while q:
            u, d = q.popleft()
            for v in up.get(u, ()):
                if v not in best or d + 1 < best[v]:
                    best[v] = d + 1
                    q.append((v, d + 1))
        rows += [(start, a, d) for a, d in best.items()]
    return (pd.DataFrame(rows, columns=["node", "anc", "depth"])
            .sort_values(["node", "anc"]).reset_index(drop=True))
