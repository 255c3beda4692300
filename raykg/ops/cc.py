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

Each round runs as RAW RAY TASKS over co-partitioned object-store
state (see connected_components' docstring — the pagerank.py rewrite):
labels and the bucketed edge blobs stay in the object store, a round
is coarse segmented-min message tasks + coarse apply tasks, and only
per-bucket changed-counts reach the driver. Labels are non-negative
MONOTONE NON-INCREASING ints, so changed == 0 is a fixed point.

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

from raykg.ops.exchange import hash_exchange

CC_BUCKETS = 64
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _bucket(ids: np.ndarray, coarse: int) -> np.ndarray:
    return (((ids.astype(np.uint64) * _GOLDEN) >> np.uint64(52))
            % np.uint64(coarse)).astype(np.int32)


def connected_components(edges_ds, src: str = "id_a", dst: str = "id_b",
                         max_rounds: int = 25, coarse: int = 32):
    """Label every node reachable through ``edges_ds`` with its
    component's MINIMUM node id. Node ids must be non-negative ints.
    Returns Dataset(node, component). Nodes with no edges are absent
    (callers union isolated nodes as self-components if needed).

    Implementation: hash-min label propagation with the ROUNDS run as
    raw Ray tasks over co-partitioned object-store state (the same
    rewrite as ops/pagerank.py — a Ray-Data groupby job per round
    costs its fixed all-to-all scheduling overhead times the graph
    diameter). One Ray-Data pass buckets the bidirectional edge list
    by h(source endpoint) into per-bucket blobs (source positions into
    the bucket's node list, dst runs pre-grouped by h(dst)); each
    round is coarse ``_cc_msgs`` tasks (segmented min per dst run) and
    coarse ``_cc_apply`` tasks (min of incoming vs current), with only
    per-bucket changed-counts crossing the driver. Converges in
    O(component diameter) rounds — raise ``max_rounds`` (or star-
    contract first) for high-diameter graphs.
    """

    coarse = max(2, coarse)  # num_returns=1 would not unpack per-bucket refs

    def to_ab(t: pa.Table) -> pa.Table:
        a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    import ray

    empty = pa.table({"node": pa.array([], pa.int64()),
                      "component": pa.array([], pa.int64())})
    block_refs = list(
        edges_ds.map_batches(to_ab, batch_format="pyarrow").to_arrow_refs()
    )
    if not block_refs:
        return rd.from_arrow(empty)

    @ray.remote
    def _cc_split(tbl: pa.Table, c: int):
        if tbl.num_rows == 0 or "a" not in tbl.column_names:
            # zero-row blocks can bypass the to_ab map and arrive with
            # the upstream schema — emit typed empty parts
            z = np.zeros(0, np.int64)
            return [(z, z) for _ in range(c)]
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        b = tbl.column("b").to_numpy(zero_copy_only=False)
        s = np.concatenate([a, b])  # both orientations: each endpoint
        d = np.concatenate([b, a])  # reads its label where it lives
        sb = _bucket(s, c)
        return [(s[sb == j], d[sb == j]) for j in range(c)]

    splits = [_cc_split.options(num_returns=coarse).remote(b, coarse)
              for b in block_refs]

    @ray.remote(num_returns=3)
    def _cc_assemble(c: int, *parts):
        s = (np.concatenate([p[0] for p in parts]) if parts
             else np.zeros(0, np.int64))
        d = (np.concatenate([p[1] for p in parts]) if parts
             else np.zeros(0, np.int64))
        if len(s):
            ed = np.unique(np.stack([s, d], axis=1), axis=0)
            s, d = ed[:, 0], ed[:, 1]
        nodes = np.unique(s)
        sp = np.searchsorted(nodes, s) if len(s) else np.zeros(0, np.int64)
        db = _bucket(d, c)
        order = np.lexsort((d, db))
        d, sp, db = d[order], sp[order], db[order]
        db_off = np.searchsorted(db, np.arange(c + 1))
        return (db_off, d, sp), nodes, int(len(nodes))

    asm = [
        _cc_assemble.remote(coarse,
                            *[splits[i][j] for i in range(len(splits))])
        for j in range(coarse)
    ]
    blob_refs = [a[0] for a in asm]
    node_refs = [a[1] for a in asm]
    if sum(ray.get([a[2] for a in asm])) == 0:
        return rd.from_arrow(empty)

    @ray.remote
    def _cc_init(nodes):
        return nodes.copy()  # own id is the starting label

    label_refs = [_cc_init.remote(node_refs[j]) for j in range(coarse)]

    @ray.remote
    def _cc_msgs(blob, labels, c: int):
        db_off, d, sp = blob
        lab = labels[sp] if len(sp) else np.zeros(0, np.int64)
        out = []
        for j in range(c):
            lo, hi = int(db_off[j]), int(db_off[j + 1])
            dj, lj = d[lo:hi], lab[lo:hi]
            if len(dj):
                starts = np.flatnonzero(np.r_[True, dj[1:] != dj[:-1]])
                out.append((dj[starts], np.minimum.reduceat(lj, starts)))
            else:
                out.append((dj, lj))
        return out

    @ray.remote(num_returns=2)
    def _cc_apply(nodes, labels, *parts):
        new = labels.copy()
        for ids, mins in parts:
            if len(ids):
                pos = np.searchsorted(nodes, ids)
                np.minimum.at(new, pos, mins)
        return new, int((new != labels).sum())

    for _ in range(max_rounds):
        res = [
            _cc_msgs.options(num_returns=coarse).remote(
                blob_refs[j], label_refs[j], coarse)
            for j in range(coarse)
        ]
        nxt = [
            _cc_apply.remote(node_refs[j], label_refs[j],
                             *[res[i][j] for i in range(coarse)])
            for j in range(coarse)
        ]
        changed = sum(ray.get([n[1] for n in nxt]))
        label_refs = [n[0] for n in nxt]
        if changed == 0:
            @ray.remote
            def _cc_table(nodes, labels) -> pa.Table:
                return pa.table({"node": pa.array(nodes, pa.int64()),
                                 "component": pa.array(labels, pa.int64())})

            return rd.from_arrow_refs(
                [_cc_table.remote(node_refs[j], label_refs[j])
                 for j in range(coarse)])
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


def near_dedup_keep_best(ds, pairs_ds, id_col: str = "doc_id",
                         score_col: str = "n_chars",
                         src: str = "id_a", dst: str = "id_b",
                         max_rounds: int = 25,
                         coarse: int = CC_BUCKETS):
    """Quality-aware near-dedup: keep, from each duplicate family, the
    member with the HIGHEST ``score_col`` (ties -> minimum id) — the
    standard curation policy ("keep the longest / best-quality copy"),
    vs :func:`near_dedup_keep_canonical`'s min-id rule.

    Scale shape: component labels and member scores are bounded by the
    PAIRED-node count (duplicate volume), not corpus size — members
    broadcast once, one streaming corpus pass gathers their scores, a
    driver-side argmax over that small frame derives the drop list,
    and the corpus filters in a second stateless streaming pass. The
    corpus itself is never materialized.
    """
    import pandas as pd
    import ray

    comp = connected_components(pairs_ds, src=src, dst=dst,
                                max_rounds=max_rounds, coarse=coarse).to_pandas()
    if len(comp) == 0:
        return ds
    members = np.sort(comp["node"].to_numpy())
    members_ref = ray.put(members)

    def member_scores(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        hit = np.isin(ids, ray.get(members_ref))
        return t.filter(pa.array(hit)).select([id_col, score_col])

    sc = ds.map_batches(member_scores, batch_format="pyarrow").to_pandas()
    m = comp.merge(sc, left_on="node", right_on=id_col)
    m = m.sort_values([score_col, "node"], ascending=[False, True],
                      kind="stable")
    winners = m.drop_duplicates("component")["node"].to_numpy()
    drop = np.sort(np.setdiff1d(members, winners))
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
    from raykg.ops.joins import auto_join

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

    edges = hash_exchange(
        edges_ds.map_batches(norm, batch_format="pyarrow"), "_b",
        coarse,
        lambda g: g.drop_duplicates(["u", "v"]).drop(columns=["_b"]),
    ).materialize()

    # vertex degrees over the dedup'd undirected edge set
    def endpoints(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        ids = np.concatenate([u, v])
        vert, cnt = np.unique(ids, return_counts=True)
        return pa.table({"vertex": pa.array(vert),
                         "deg": pa.array(cnt.astype(np.int64)),
                         "_b": pa.array(_bucket(vert, coarse))})

    degrees = hash_exchange(
        edges.map_batches(endpoints, batch_format="pyarrow"), "_b",
        coarse,
        lambda g: g.groupby("vertex", as_index=False)
        .agg(deg=("deg", "sum")),
    )

    i64 = pa.int64()
    # degrees is O(vertices): materialized so auto_join can measure it
    # and take the broadcast map-side plan when it is dimension-sized
    # (the shuffle plan remains the fallback at huge vertex counts)
    degrees = degrees.materialize()
    with_du = auto_join(edges, degrees, on="u", right_on="vertex",
                        left_cols=["v"], right_cols=["deg"],
                        left_types={"u": i64, "v": i64},
                        right_types={"deg": i64})
    # rename inside a map (not Dataset.rename_columns): the broadcast
    # join plan emits pandas blocks, which Ray's Project op rejects
    def _deg_to_du(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["du" if c == "deg" else c for c in t.column_names])

    both = auto_join(with_du.map_batches(_deg_to_du,
                                         batch_format="pyarrow"), degrees,
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

    wedge_ds = hash_exchange(
        both.map_batches(orient, batch_format="pyarrow"), "_b",
        coarse, wedges)

    def edge_keys(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        k = (u.astype("U20").astype(object) + ":"
             + v.astype("U20").astype(object))
        return pa.table({"key": pa.array(k), "one": pa.array(
            np.ones(len(k), dtype=np.int8))})

    s = pa.string()
    # the edge-key relation is O(m): measured, broadcast when small
    ek = edges.map_batches(edge_keys, batch_format="pyarrow").materialize()
    closed = auto_join(wedge_ds, ek,
                       on="key", left_cols=[], right_cols=["one"],
                       left_types={"key": s},
                       right_types={"one": pa.int8()})
    return closed.count()


def local_clustering(edges_ds, src: str = "src", dst: str = "dst",
                     coarse: int = CC_BUCKETS):
    """Per-vertex triangle count, degree and local clustering
    coefficient 2T/(d(d-1)) of an undirected graph — the node-level
    companion of :func:`triangle_count` (community density scoring,
    spam-graph features, KG neighborhood quality).

    Same WWW'11 degree-oriented wedge-close plan, with two changes:
    wedges carry their three vertex ids alongside the join key, and
    each CLOSED wedge (= one triangle, found exactly once at its
    orientation-minimal vertex) credits all three corners through one
    bucketed count exchange. Coefficient = one float64 division of
    exact int64 products (SQL-mirrorable bit-for-bit); degree-0/1
    vertices get coefficient 0.0.

    -> Dataset(vertex, deg, tri, coeff), one row per vertex of the
    dedup'd edge set.
    """
    from raykg.ops.joins import auto_join

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

    edges = hash_exchange(
        edges_ds.map_batches(norm, batch_format="pyarrow"), "_b",
        coarse,
        lambda g: g.drop_duplicates(["u", "v"]).drop(columns=["_b"]),
    ).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        ids = np.concatenate([u, v])
        vert, cnt = np.unique(ids, return_counts=True)
        return pa.table({"vertex": pa.array(vert),
                         "deg": pa.array(cnt.astype(np.int64)),
                         "_b": pa.array(_bucket(vert, coarse))})

    degrees = hash_exchange(
        edges.map_batches(endpoints, batch_format="pyarrow"), "_b",
        coarse,
        lambda g: g.groupby("vertex", as_index=False)
        .agg(deg=("deg", "sum")),
    ).materialize()

    i64 = pa.int64()
    with_du = auto_join(edges, degrees, on="u", right_on="vertex",
                        left_cols=["v"], right_cols=["deg"],
                        left_types={"u": i64, "v": i64},
                        right_types={"deg": i64})

    def _deg_to_du(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["du" if c == "deg" else c for c in t.column_names])

    both = auto_join(with_du.map_batches(_deg_to_du,
                                         batch_format="pyarrow"), degrees,
                     on="v", right_on="vertex",
                     left_cols=["u", "du"], right_cols=["deg"],
                     left_types={"v": i64, "u": i64, "du": i64},
                     right_types={"deg": i64})

    def orient(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        du = t.column("du").to_numpy(zero_copy_only=False)
        dv = t.column("deg").to_numpy(zero_copy_only=False)
        fwd = (du < dv) | ((du == dv) & (u < v))
        x = np.where(fwd, u, v)
        y = np.where(fwd, v, u)
        return pa.table({"x": pa.array(x), "y": pa.array(y),
                         "_b": pa.array(_bucket(x, coarse))})

    def wedges(g: pd.DataFrame):
        xs, as_, bs, keys = [], [], [], []
        for xval, grp in g.groupby("x", sort=False):
            ys = np.unique(grp["y"].to_numpy())
            if len(ys) < 2:
                continue
            ii, jj = np.triu_indices(len(ys), k=1)
            a, b = ys[ii], ys[jj]  # already sorted: a < b
            keys.append(a.astype("U20").astype(object) + ":"
                        + b.astype("U20").astype(object))
            xs.append(np.full(len(a), xval, dtype=np.int64))
            as_.append(a)
            bs.append(b)
        if not keys:
            return pa.table({"key": pa.array([], pa.string()),
                             "wx": pa.array([], pa.int64()),
                             "wa": pa.array([], pa.int64()),
                             "wb": pa.array([], pa.int64())})
        return pa.table({"key": pa.array(np.concatenate(keys)),
                         "wx": pa.array(np.concatenate(xs)),
                         "wa": pa.array(np.concatenate(as_)),
                         "wb": pa.array(np.concatenate(bs))})

    wedge_ds = hash_exchange(
        both.map_batches(orient, batch_format="pyarrow"), "_b",
        coarse, wedges)

    def edge_keys(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        k = (u.astype("U20").astype(object) + ":"
             + v.astype("U20").astype(object))
        return pa.table({"key": pa.array(k), "one": pa.array(
            np.ones(len(k), dtype=np.int8))})

    s = pa.string()
    ek = edges.map_batches(edge_keys, batch_format="pyarrow").materialize()
    closed = auto_join(wedge_ds, ek, on="key",
                       left_cols=["wx", "wa", "wb"], right_cols=["one"],
                       left_types={"key": s, "wx": i64, "wa": i64,
                                   "wb": i64},
                       right_types={"one": pa.int8()})

    # credit each triangle to its three corners, pre-counted per block
    def credits(t: pa.Table) -> pa.Table:
        ids = np.concatenate([
            t.column("wx").to_numpy(zero_copy_only=False),
            t.column("wa").to_numpy(zero_copy_only=False),
            t.column("wb").to_numpy(zero_copy_only=False)])
        vert, cnt = np.unique(ids, return_counts=True)
        return pa.table({"vertex": pa.array(vert.astype(np.int64)),
                         "tri": pa.array(cnt.astype(np.int64)),
                         "_b": pa.array(_bucket(vert, coarse))})

    tri_counts = hash_exchange(
        closed.map_batches(credits, batch_format="pyarrow"), "_b",
        coarse,
        lambda g: g.groupby("vertex", as_index=False)
        .agg(tri=("tri", "sum")),
    ).materialize()

    joined = auto_join(degrees.select_columns(["vertex", "deg"]),
                       tri_counts, on="vertex", how="left",
                       left_cols=["deg"], right_cols=["tri"],
                       left_types={"vertex": i64, "deg": i64},
                       right_types={"tri": i64})

    def coeff(df: pd.DataFrame) -> pd.DataFrame:
        d = df["deg"].to_numpy(np.int64)
        tri = df["tri"].fillna(0).to_numpy(np.int64)
        denom = d * (d - 1)
        c = np.where(denom > 0,
                     (2.0 * tri) / np.where(denom > 0, denom, 1), 0.0)
        return pd.DataFrame({"vertex": df["vertex"].to_numpy(np.int64),
                             "deg": d, "tri": tri, "coeff": c})

    return joined.map_batches(coeff, batch_format="pandas")


def k_core(edges_ds, k: int, src: str = "src", dst: str = "dst",
           max_rounds: int = 64, coarse: int = CC_BUCKETS):
    """k-core of an undirected graph: the maximal subgraph in which
    every vertex has degree >= k — the classic peel for separating a
    graph's dense core from its fringe (spam-farm detection, KG hub
    extraction, community seeding).

    Iterative peeling, each round three bounded exchanges:
      1. vertex degrees of the surviving edge set (per-block
         ``np.unique`` pre-counts, one coarse-bucket fold);
      2. survivors (deg >= k) — an O(vertices) relation, measured and
         BROADCAST while dimension-sized (``auto_join`` semi), shuffle
         beyond;
      3. edges filtered to both-endpoints-surviving (two semi joins).
    Edge count is MONOTONE NON-INCREASING, so an unchanged count is a
    fixed point. Round count is the CASCADE depth: each round removes
    every vertex below k simultaneously, which converges in a handful
    of rounds on clustered graphs but can reach O(V) on chain-shaped
    inputs (a 200-node path at k=2 peels two endpoints per round) —
    raise ``max_rounds`` for such graphs; the guard RAISES rather
    than returning a partial core.

    -> Dataset(vertex, deg): the k-core members with their in-core
    degrees (empty when no k-core exists).
    """
    from raykg.ops.joins import auto_join

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

    edges = hash_exchange(
        edges_ds.map_batches(norm, batch_format="pyarrow"), "_b",
        coarse,
        lambda g: g.drop_duplicates(["u", "v"]).drop(columns=["_b"]),
    ).materialize()
    n_edges = edges.count()

    def endpoints(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        ids = np.concatenate([u, v])
        vert, cnt = np.unique(ids, return_counts=True)
        return pa.table({"vertex": pa.array(vert.astype(np.int64)),
                         "deg": pa.array(cnt.astype(np.int64)),
                         "_b": pa.array(_bucket(vert, coarse))})

    def fold_deg(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("vertex", as_index=False)
                .agg(deg=("deg", "sum")))

    i64 = pa.int64()
    degrees = None
    for _ in range(max_rounds):
        degrees = hash_exchange(
            edges.map_batches(endpoints, batch_format="pyarrow"),
            "_b", coarse, fold_deg).materialize()
        if n_edges == 0:
            break

        def survives(t: pa.Table) -> pa.Table:
            d = t.column("deg").to_numpy(zero_copy_only=False)
            return t.select(["vertex"]).filter(pa.array(d >= k))

        alive = degrees.map_batches(
            survives, batch_format="pyarrow").materialize()
        pruned = auto_join(
            auto_join(edges, alive, on="u", right_on="vertex",
                      how="semi", left_cols=["v"],
                      left_types={"u": i64, "v": i64}),
            alive, on="v", right_on="vertex", how="semi",
            left_cols=["u"],
            left_types={"u": i64, "v": i64}).materialize()
        n_new = pruned.count()
        if n_new == n_edges:
            break
        edges, n_edges = pruned, n_new
    else:
        raise RuntimeError(f"k_core did not converge in {max_rounds} "
                           "rounds")

    def final(t: pa.Table) -> pa.Table:
        d = t.column("deg").to_numpy(zero_copy_only=False)
        return t.select(["vertex", "deg"]).filter(pa.array(d >= k))

    return degrees.map_batches(final, batch_format="pyarrow")


def k_core_bruteforce(edges: "pd.DataFrame", k: int,
                      src: str = "src", dst: str = "dst") -> pd.DataFrame:
    """Single-process iterative peel with identical semantics."""
    a = edges[src].to_numpy(np.int64)
    b = edges[dst].to_numpy(np.int64)
    u, v = np.minimum(a, b), np.maximum(a, b)
    keep = u != v
    e = pd.DataFrame({"u": u[keep], "v": v[keep]}).drop_duplicates()
    while True:
        if not len(e):
            return pd.DataFrame({"vertex": pd.array([], "int64"),
                                 "deg": pd.array([], "int64")})
        cnt = pd.concat([e["u"], e["v"]]).value_counts()
        alive = set(cnt[cnt >= k].index)
        e2 = e[e["u"].isin(alive) & e["v"].isin(alive)]
        if len(e2) == len(e):
            break
        e = e2
    cnt = pd.concat([e["u"], e["v"]]).value_counts().sort_index()
    out = pd.DataFrame({"vertex": cnt.index.to_numpy(np.int64),
                        "deg": cnt.to_numpy(np.int64)})
    return out[out["deg"] >= k].reset_index(drop=True)
