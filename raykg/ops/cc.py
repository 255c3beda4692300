"""Distributed connected components over an edge list — the step that
turns near-duplicate PAIRS (minhash/simhash/jaccard/embedding output)
into duplicate GROUPS with a canonical representative, and entity
match-pairs into merged entities.

Algorithm: hash-min label propagation (the classic BSP formulation;
Kiveris et al. 2014 "Connected Components in MapReduce and Beyond"
§3 baseline). Every node starts labelled with its own id; each round,
every edge pushes the smaller label across, and a node keeps the min
of what it hears:

    new_lbl(x) = min(lbl(x), min over neighbours y of lbl(y))

Each round is ONE tagged-union exchange: labels and edges co-locate by
node bucket, messages (neighbour, label) emit per direction, and a
grouped min folds them — expressed as plain Ray Data ``map_batches``
+ ``groupby().map_groups``. Convergence detection is free: labels are
non-negative and MONOTONE NON-INCREASING ints, so the global label sum
is a strictly decreasing potential — when the sum stops moving, the
labelling is a fixed point (no aggregate-to-driver of the labels
themselves, just one scalar per round).

Round count is O(component diameter). Near-dup components are dense
little cliques (diameter ≲ 3), so 3-5 rounds suffice; a pathological
path graph needs O(n) rounds — for such graphs the star-contraction
variant (alternating large-star/small-star, O(log n) rounds) is the
published remedy; ``max_rounds`` guards against it (raises rather
than silently returning a partial labelling).

Partitioning assumption: one node bucket's incident edges fit a task
(raise ``coarse``); a celebrity node with huge degree still only emits
its own label once per incident edge — degree skew inflates one
bucket, the salting remedy would split a node's edge list and combine
mins, not implemented (documented).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ray.data.aggregate import Sum

CC_BUCKETS = 64
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _bucket(ids: np.ndarray, coarse: int) -> np.ndarray:
    return (((ids.astype(np.uint64) * _GOLDEN) >> np.uint64(52))
            % np.uint64(coarse)).astype(np.int32)


def connected_components(edges_ds, src: str = "id_a", dst: str = "id_b",
                         max_rounds: int = 25, coarse: int = CC_BUCKETS):
    """Label every node reachable through ``edges_ds`` with its
    component's MINIMUM node id. Node ids must be non-negative ints.
    Returns Dataset(node, component). Nodes with no edges are absent
    (callers union isolated nodes as self-components if needed)."""

    # one pass over the (possibly expensive) upstream pair pipeline:
    # cache the typed edge list in the object store, then every
    # structure below — init labels AND each round — reads the cache
    def to_ab(t: pa.Table) -> pa.Table:
        a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    edges_all = edges_ds.map_batches(to_ab,
                                     batch_format="pyarrow").materialize()

    def edge_rows(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        # initial labels double as the first message round: each edge
        # offers its endpoints each other's id (plus self-labels)
        node = np.concatenate([a, b, a, b])
        lbl = np.concatenate([b, a, a, b])
        return pa.table({
            "_bk": pa.array(_bucket(node, coarse)),
            "node": pa.array(node),
            "lbl": pa.array(lbl),
        })

    def fold_min(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", as_index=False)["lbl"].min()
        return out

    labels = (
        edges_all.map_batches(edge_rows, batch_format="pyarrow")
        .groupby("_bk").map_groups(fold_min, batch_format="pandas")
        .materialize()
    )
    if labels.count() == 0:  # no edges: empty labelling, typed schema
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "component": pa.array([], pa.int64()),
        }))

    def strip_self(t: pa.Table) -> pa.Table:
        keep = t.column("a").to_numpy(zero_copy_only=False) != \
            t.column("b").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keep))

    edges = edges_all.map_batches(strip_self,
                                  batch_format="pyarrow").materialize()

    prev_sum = labels.aggregate(Sum("lbl", alias_name="s"))["s"]
    for _ in range(max_rounds):
        def tag_labels(t: pa.Table) -> pa.Table:
            node = t.column("node").to_numpy(zero_copy_only=False)
            return pa.table({
                "_bk": pa.array(_bucket(node, coarse)),
                "n1": t.column("node"), "n2": t.column("node"),
                "lbl": t.column("lbl"),
            })

        def tag_edges(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy(zero_copy_only=False)
            return pa.table({
                "_bk": pa.array(_bucket(a, coarse)),
                "n1": t.column("a"), "n2": t.column("b"),
                "lbl": pa.array(np.full(len(a), -1, dtype=np.int64)),
            })

        def propagate(df: pd.DataFrame) -> pd.DataFrame:
            cur = df[df["lbl"] >= 0]
            lab = cur.set_index("n1")["lbl"]
            e = df[df["lbl"] < 0]
            # message to the OTHER endpoint: my current label
            msg = pd.DataFrame({
                "node": e["n2"].to_numpy(),
                "lbl": lab.reindex(e["n1"]).to_numpy(),
            }).dropna()
            mine = pd.DataFrame({"node": cur["n1"].to_numpy(),
                                 "lbl": cur["lbl"].to_numpy()})
            allm = pd.concat([mine, msg])
            allm["lbl"] = allm["lbl"].astype(np.int64)
            return allm.groupby("node", as_index=False)["lbl"].min()

        # edges bucket by SOURCE node (reads its label there), so each
        # undirected edge must appear in both orientations
        def both_dirs(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            return pa.table({"a": pa.array(np.concatenate([a, b])),
                             "b": pa.array(np.concatenate([b, a]))})

        tagged = (
            labels.map_batches(tag_labels, batch_format="pyarrow")
            .union(edges.map_batches(both_dirs, batch_format="pyarrow")
                   .map_batches(tag_edges, batch_format="pyarrow"))
        )
        folded = (
            tagged.groupby("_bk").map_groups(propagate,
                                             batch_format="pandas")
            # a node's messages land in ITS bucket next: regroup by node
            .map_batches(lambda t: t.append_column(
                "_bk2", pa.array(_bucket(
                    t.column("node").to_numpy(zero_copy_only=False),
                    coarse))), batch_format="pyarrow")
            .groupby("_bk2").map_groups(
                lambda df: df.groupby("node", as_index=False)["lbl"].min(),
                batch_format="pandas")
            .materialize()
        )
        new_sum = folded.aggregate(Sum("lbl", alias_name="s"))["s"]
        labels = folded
        if new_sum == prev_sum:
            return labels.map_batches(
                lambda t: t.rename_columns(["node", "component"]),
                batch_format="pyarrow")
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(high-diameter graph — raise max_rounds or use star contraction)")


def near_dedup_keep_canonical(ds, pairs_ds, id_col: str = "doc_id",
                              src: str = "id_a", dst: str = "id_b",
                              max_rounds: int = 25,
                              coarse: int = CC_BUCKETS):
    """The end-user near-dedup: given a corpus and its near-duplicate
    PAIRS (any of ops.dedup's detectors), keep exactly ONE document
    per duplicate family — the minimum id — plus every unpaired
    document. Components label the families; the (small — bounded by
    duplicate count, not corpus size) drop list broadcasts and the
    corpus filters in one stateless streaming pass."""
    import ray

    comp = connected_components(pairs_ds, src=src, dst=dst,
                                max_rounds=max_rounds, coarse=coarse)

    def non_canonical(t: pa.Table) -> pa.Table:
        keep = t.column("node").to_numpy(zero_copy_only=False) != \
            t.column("component").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keep)).select(["node"])

    drop = np.sort(
        comp.map_batches(non_canonical, batch_format="pyarrow")
        .to_pandas()["node"].to_numpy()
    )
    drop_ref = ray.put(drop)

    def keep_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        bad = np.isin(ids, ray.get(drop_ref))
        return t.filter(pa.array(~bad))

    return ds.map_batches(keep_rows, batch_format="pyarrow")


def triangle_count(edges_ds, src: str = "src", dst: str = "dst",
                   coarse: int = CC_BUCKETS) -> int:
    """EXACT global triangle count of an undirected graph — the
    standard distributed wedge-close plan (Suri & Vassilvitskii,
    WWW'11 "Counting triangles and the curse of the last reducer"):

    1. **normalize + dedup** — (u,v) = (min,max) endpoints, self-loops
       dropped, duplicate/bidirectional edges collapsed in one
       bucketed shuffle.
    2. **degree orientation** — each vertex's degree is a grouped
       count; two ``hash_join`` passes attach (deg, id) to both
       endpoints and every edge is oriented toward the larger
       (deg, id) — the trick that bounds any vertex's out-degree at
       O(√m), so the hub vertex that makes id-ordered wedge counting
       quadratic (the "last reducer") cannot occur.
    3. **wedges** — per out-vertex, emit each unordered pair of
       out-neighbors keyed by its id-normalized ``"a:b"`` string;
       bucketed by the out-vertex so a group holds many vertices.
    4. **close** — one inner ``hash_join`` of wedge keys against edge
       keys; the match count IS the triangle count (every triangle
       forms exactly ONE wedge, at its orientation-minimal vertex,
       because the orientation is acyclic).

    Four shuffles total, each O(edges) or O(wedges) = O(m^1.5).
    Returns the integer count (a global scalar, not a Dataset).
    """
    from raykg.ops.joins import hash_join

    def norm(t: pa.Table) -> pa.Table:
        a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        keep = u != v
        df = pd.DataFrame({"u": u[keep], "v": v[keep]}).drop_duplicates()
        df["_b"] = _bucket(df["u"].to_numpy() * 31 + df["v"].to_numpy(),
                           coarse)
        return pa.Table.from_pandas(df, preserve_index=False)

    edges = (edges_ds.map_batches(norm, batch_format="pyarrow")
             .groupby("_b")
             .map_groups(lambda g: g.drop_duplicates(["u", "v"])
                         .drop(columns=["_b"]),
                         batch_format="pandas")).materialize()

    # vertex degrees over the dedup'd undirected edge set
    def endpoints(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        ids = np.concatenate([u, v])
        vert, cnt = np.unique(ids, return_counts=True)
        return pa.table({"vertex": pa.array(vert),
                         "deg": pa.array(cnt.astype(np.int64)),
                         "_b": pa.array(_bucket(vert, coarse))})

    degrees = (edges.map_batches(endpoints, batch_format="pyarrow")
               .groupby("_b")
               .map_groups(lambda g: g.groupby("vertex", as_index=False)
                           .agg(deg=("deg", "sum")),
                           batch_format="pandas"))

    i64 = pa.int64()
    with_du = hash_join(edges, degrees, on="u", right_on="vertex",
                        left_cols=["v"], right_cols=["deg"],
                        left_types={"u": i64, "v": i64},
                        right_types={"deg": i64})
    both = hash_join(with_du.rename_columns({"deg": "du"}), degrees,
                     on="v", right_on="vertex",
                     left_cols=["u", "du"], right_cols=["deg"],
                     left_types={"v": i64, "u": i64, "du": i64},
                     right_types={"deg": i64})

    def orient(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        du = t.column("du").to_numpy(zero_copy_only=False)
        dv = t.column("deg").to_numpy(zero_copy_only=False)
        # orient x -> y toward larger (deg, id)
        fwd = (du < dv) | ((du == dv) & (u < v))
        x = np.where(fwd, u, v)
        y = np.where(fwd, v, u)
        return pa.table({"x": pa.array(x), "y": pa.array(y),
                         "_b": pa.array(_bucket(x, coarse))})

    def wedges(g: pd.DataFrame):
        keys = []
        for _, grp in g.groupby("x", sort=False):
            ys = np.unique(grp["y"].to_numpy())
            if len(ys) < 2:
                continue
            ii, jj = np.triu_indices(len(ys), k=1)
            a, b = ys[ii], ys[jj]  # already sorted: a < b
            keys.append(a.astype("U20").astype(object) + ":"
                        + b.astype("U20").astype(object))
        if not keys:  # typed empty block: no object-dtype size probes
            return pa.table({"key": pa.array([], pa.string())})
        return pa.table({"key": pa.array(np.concatenate(keys))})

    wedge_ds = (both.map_batches(orient, batch_format="pyarrow")
                .groupby("_b")
                .map_groups(wedges, batch_format="pandas"))

    def edge_keys(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        k = (u.astype("U20").astype(object) + ":"
             + v.astype("U20").astype(object))
        return pa.table({"key": pa.array(k), "one": pa.array(
            np.ones(len(k), dtype=np.int8))})

    s = pa.string()
    closed = hash_join(wedge_ds, edges.map_batches(edge_keys,
                                                   batch_format="pyarrow"),
                       on="key", left_cols=[], right_cols=["one"],
                       left_types={"key": s},
                       right_types={"one": pa.int8()})
    return closed.count()
