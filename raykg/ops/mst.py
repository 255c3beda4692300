"""Minimum spanning forest by distributed Borůvka contraction — the
classic O(log V)-round MST plan (Borůvka 1926; the MapReduce variant
in Lattanzi et al. 2011 "Filtering: a method for solving graph
problems in MapReduce"): every round, each component picks its
globally-minimum incident cross-edge (total order ``(w, u, v)`` — a
strict tiebreak makes the chosen set cycle-free by the standard
cut-property argument even with duplicate weights), the chosen edges
join the forest, and components contract by POINTER DOUBLING over the
per-component winner relation (component count at least HALVES per
round, so <= log2 V outer rounds; the contraction itself is
ceil(log2 depth) joins — hash-min CC would need diameter rounds and
equal-weight graphs legitimately chain).

Uses: network/similarity-graph backbone extraction, single-linkage
clustering at scale (an MST cut at threshold t IS single-linkage),
entity-graph dedup cost minimization.

Scale shape per round: two plan-adaptive ``auto_join``s to attach
component labels (labels are an O(V) relation — broadcast while
dimension-sized, shuffled beyond), a per-block pre-min + one
component-bucket fold to pick winners (exchange O(blocks × live
components)), and the pointer-doubling self-joins over the
O(components) winner relation. Only per-round counts cross the
driver; forest edges accumulate as materialized Datasets, unioned at
the end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MST_BUCKETS = 64


ROOTS_INMEM_BYTES = 128 << 20


def _roots_inmem(blocks) -> pa.Table:
    """Single-task pointer doubling over the assembled (c, p) parent
    relation — the worker-side fast path (~16 B per live component:
    128 MB covers 8M components; the join-round path takes over
    beyond). Same 2-cycle-break + jump semantics as the distributed
    rounds."""
    import ray

    blocks = ray.get(list(blocks))  # a LIST of refs is not auto-resolved
    tabs = []
    for b in blocks:
        if isinstance(b, pa.Table):
            if b.num_rows:
                tabs.append(b)
        elif len(b):
            tabs.append(pa.Table.from_pandas(b, preserve_index=False))
    t = pa.concat_tables([b.select(["c", "p"]) for b in tabs])
    c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    p = t.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(c, kind="stable")
    c, p = c[order], p[order]
    # every parent is itself a live component (it has a winner row)
    pi = np.searchsorted(c, p)
    # mutual 2-cycle: smaller id self-roots
    self_pos = np.arange(len(c))
    mutual = pi[pi] == self_pos
    pi = np.where(mutual & (c < p), self_pos, pi)
    for _ in range(64):
        nxt = pi[pi]
        if (nxt == pi).all():
            break
        pi = nxt
    return pa.table({"c": pa.array(c), "root": pa.array(c[pi])})


def _forest_roots(winners, max_rounds: int):
    """Root pointers of the winner pseudo-forest: winners holds ONE
    row per live component ``c`` with its chosen edge's other
    component ``oc``. Break each merged tree's unique mutual 2-cycle
    (the two endpoints of its minimum edge point at each other —
    smaller id becomes the self-rooted representative), then pointer-
    double until every parent is a root.

    While the relation fits ``ROOTS_INMEM_BYTES`` it is assembled BY
    A WORKER TASK and doubled in memory (one task instead of ~3 jobs
    per jump round — the auto_join adaptive-broadcast rationale);
    beyond that, each round is one plan-adaptive self-join of the
    O(live components) relation, ceil(log2 max tree depth) rounds.

    -> materialized Dataset(c, root)."""
    import ray
    import ray.data as rd

    from raykg.ops.joins import auto_join

    i64 = pa.int64()

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({"c": t.column("c").cast(pa.int64()),
                         "p": t.column("oc").cast(pa.int64())})

    P = winners.map_batches(proj, batch_format="pyarrow").materialize()

    try:
        sz = P.size_bytes()
    except Exception:
        sz = None
    if sz is not None and sz <= ROOTS_INMEM_BYTES:
        task = ray.remote(_roots_inmem)
        ref = task.remote(list(P.to_arrow_refs()))
        return rd.from_arrow_refs([ref]).materialize()

    def ren(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["rc" if c == "c" else "pp" if c == "p" else c
             for c in t.column_names])

    for rnd in range(max_rounds):
        R = P.map_batches(ren, batch_format="pyarrow").materialize()
        J = auto_join(P, R, on="p", right_on="rc",
                      left_cols=["c"], right_cols=["pp"],
                      left_types={"p": i64, "c": i64},
                      right_types={"pp": i64})

        if rnd == 0:
            def step(t: pa.Table) -> pa.Table:
                c = t.column("c").to_numpy(zero_copy_only=False)
                p = t.column("p").to_numpy(zero_copy_only=False)
                pp = t.column("pp").to_numpy(zero_copy_only=False)
                # mutual 2-cycle: smaller id self-roots
                newp = np.where((pp == c) & (c < p), c, p)
                return pa.table({"c": pa.array(c), "p": pa.array(newp)})

            P = J.map_batches(step, batch_format="pyarrow").materialize()
            continue

        def jump(t: pa.Table) -> pa.Table:
            c = t.column("c").to_numpy(zero_copy_only=False)
            p = t.column("p").to_numpy(zero_copy_only=False)
            pp = t.column("pp").to_numpy(zero_copy_only=False)
            return pa.table({"c": pa.array(c), "p": pa.array(pp),
                             "_chg": pa.array((pp != p).astype(np.int8))})

        nxt = J.map_batches(jump, batch_format="pyarrow").materialize()
        changed = int(nxt.sum("_chg") or 0)
        P = nxt.drop_columns(["_chg"]).materialize()
        if changed == 0:
            def final(t: pa.Table) -> pa.Table:
                return pa.table({"c": t.column("c"),
                                 "root": t.column("p")})

            return P.map_batches(final,
                                 batch_format="pyarrow").materialize()
    raise RuntimeError(f"_forest_roots did not converge in {max_rounds} "
                       "rounds")


def minimum_spanning_forest(edges_ds, src: str = "src", dst: str = "dst",
                            weight: str = "w", max_rounds: int = 40,
                            coarse: int = MST_BUCKETS):
    """-> Dataset(u, v, w): the minimum spanning forest edge set
    (one tree per connected component), u < v. Weights must be
    INTEGER (the cents convention — pre-quantize float similarities;
    a float column raises rather than being silently truncated);
    duplicate edges collapse to their minimum weight; self-loops
    dropped.

    Execution: while the vertex-label relation fits
    ``ROOTS_INMEM_BYTES`` the rounds run as RAW RAY TASKS over
    co-partitioned object-store numpy state (the pagerank precedent —
    iterative co-partitioned state is the documented raw-task case;
    the Ray-Data-loop formulation paid ~12 fixed-cost jobs per Borůvka
    round on micro data). Edges are bucketed once by h(u); each round
    is attach-cu tasks → attach-cv + cross-filter + local-min tasks →
    per-component winner folds → ONE pointer-doubling task over the
    O(live components) winner relation → relabel tasks; only per-round
    cross-edge counts touch the driver. Beyond the bound the original
    plan-adaptive Dataset-join rounds take over (``_msf_dataset``)."""
    import ray

    n_verts, ebuckets, vparts, eff_coarse = _mst_prepare(
        edges_ds, src, dst, weight, coarse)
    if n_verts is not None and n_verts * 48 <= ROOTS_INMEM_BYTES:
        return _msf_tasks(ebuckets, vparts, max_rounds, eff_coarse)
    return _msf_dataset(edges_ds, src, dst, weight, max_rounds, coarse)


_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _vbucket(keys: np.ndarray, coarse: int) -> np.ndarray:
    return ((keys.astype(np.uint64) * _GOLDEN)
            >> np.uint64(52)).astype(np.int64) % coarse


def _mst_prepare(edges_ds, src, dst, weight, coarse):
    """One raw-task split pass: per-block normalize (u<v, self-loops
    dropped, integer-weight check) and route rows to h(u) edge buckets
    + h(id) vertex-id parts. Returns (n_vertices, [edge-bucket refs],
    [[vertex-part refs per bucket]]); n_vertices is None when the
    input has no blocks."""
    import ray

    @ray.remote
    def _split(tbl, c: int):
        if (not isinstance(tbl, pa.Table)):
            tbl = pa.Table.from_pandas(tbl, preserve_index=False)
        if tbl.num_rows == 0 or src not in tbl.column_names:
            z = np.zeros(0, np.int64)
            return ([(z, z, z) for _ in range(c)]
                    + [z for _ in range(c)])
        a = tbl.column(src).to_numpy(zero_copy_only=False).astype(
            np.int64)
        b = tbl.column(dst).to_numpy(zero_copy_only=False).astype(
            np.int64)
        wr = tbl.column(weight).to_numpy(zero_copy_only=False)
        if not np.issubdtype(wr.dtype, np.integer):
            raise ValueError(
                "minimum_spanning_forest needs integer weights — "
                "pre-quantize float similarities (cents convention); "
                "astype truncation would silently reorder edges")
        w = wr.astype(np.int64)
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        keep = u != v
        u, v, w = u[keep], v[keep], w[keep]
        ub = _vbucket(u, c)
        ids = np.unique(np.concatenate([u, v]))
        ib = _vbucket(ids, c)
        out = []
        for j in range(c):
            m = ub == j
            out.append((u[m], v[m], w[m]))
        for j in range(c):
            out.append(ids[ib == j])
        return out

    @ray.remote
    def _concat_edges(*parts):
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
                np.concatenate([p[2] for p in parts]))

    @ray.remote
    def _vert_labels(*id_parts):
        ids = (np.unique(np.concatenate(id_parts)) if id_parts
               else np.zeros(0, np.int64))
        return (ids, ids.copy())          # (vertex sorted, comp)

    block_refs = list(edges_ds.to_arrow_refs())
    if not block_refs:
        return None, [], [], coarse
    # adaptive bucket count: the round structure routes O(coarse²)
    # refs and spawns ~4·coarse tasks per round — at micro scale that
    # fixed cost dominates the numpy work. Aim for ~128k edges per
    # bucket, floor 2 (num_returns=1 would not unpack), cap at the
    # caller's coarse (the 100 TB setting).
    n_edges = sum(ray.get([
        ray.remote(lambda t: int(getattr(t, "num_rows", len(t))))
        .remote(b) for b in block_refs
    ]))
    coarse = int(min(coarse, max(2, n_edges // 131_072 + 1)))
    splits = [_split.options(num_returns=2 * coarse).remote(b, coarse)
              for b in block_refs]
    ebuckets = [
        _concat_edges.remote(*[s[j] for s in splits])
        for j in range(coarse)
    ]
    vlabels = [
        _vert_labels.remote(*[s[coarse + j] for s in splits])
        for j in range(coarse)
    ]
    n_verts = sum(ray.get([
        ray.remote(lambda lb: len(lb[0])).remote(lb) for lb in vlabels
    ]))
    return n_verts, ebuckets, vlabels, coarse


def _msf_tasks(ebuckets, vlabels, max_rounds: int, coarse: int):
    """Raw-task Borůvka rounds (see minimum_spanning_forest). State in
    the object store: per-bucket edge arrays (static ids, shrinking to
    the live cross set each round), per-bucket (vertex, comp) labels,
    and per-round winner parts whose (u, v, w) accumulate into the
    forest. Only scalar cross-edge counts cross the driver."""
    import ray
    import ray.data as rd

    @ray.remote
    def _attach_u(eb, lab, c: int):
        u, v, w = eb
        verts, comp = lab
        cu = (comp[np.searchsorted(verts, u)] if len(u)
              else np.zeros(0, np.int64))
        vb = _vbucket(v, c) if len(v) else np.zeros(0, np.int64)
        return [(u[vb == k], v[vb == k], w[vb == k], cu[vb == k])
                for k in range(c)]

    @ray.remote
    def _attach_v(lab, c: int, *parts):
        u = np.concatenate([p[0] for p in parts])
        v = np.concatenate([p[1] for p in parts])
        w = np.concatenate([p[2] for p in parts])
        cu = np.concatenate([p[3] for p in parts])
        verts, comp = lab
        cv = (comp[np.searchsorted(verts, v)] if len(v)
              else np.zeros(0, np.int64))
        cross = cu != cv
        u, v, w, cu, cv = u[cross], v[cross], w[cross], cu[cross], \
            cv[cross]
        n_cross = int(len(u))
        # surviving edges route back to their h(u) bucket for the
        # next round
        ub = _vbucket(u, c) if len(u) else np.zeros(0, np.int64)
        out = [(u[ub == j], v[ub == j], w[ub == j]) for j in range(c)]
        # candidate minima per incident component, both directions,
        # local (w, u, v)-min per c before the exchange
        cc = np.concatenate([cu, cv])
        oc = np.concatenate([cv, cu])
        u2 = np.concatenate([u, u])
        v2 = np.concatenate([v, v])
        w2 = np.concatenate([w, w])
        order = np.lexsort((v2, u2, w2, cc))
        first = np.ones(len(order), dtype=bool)
        ccs = cc[order]
        if len(ccs) > 1:
            first[1:] = ccs[1:] != ccs[:-1]
        sel = order[first]
        cb = (_vbucket(cc[sel], c) if len(sel)
              else np.zeros(0, np.int64))
        for m in range(c):
            s = sel[cb == m]
            out.append((cc[s], oc[s], u2[s], v2[s], w2[s]))
        out.append(n_cross)
        return out

    @ray.remote
    def _fold_winners(*cand_parts):
        c = np.concatenate([p[0] for p in cand_parts])
        oc = np.concatenate([p[1] for p in cand_parts])
        u = np.concatenate([p[2] for p in cand_parts])
        v = np.concatenate([p[3] for p in cand_parts])
        w = np.concatenate([p[4] for p in cand_parts])
        order = np.lexsort((v, u, w, c))
        first = np.ones(len(order), dtype=bool)
        cs = c[order]
        if len(cs) > 1:
            first[1:] = cs[1:] != cs[:-1]
        sel = order[first]
        return (c[sel], oc[sel], u[sel], v[sel], w[sel])

    @ray.remote
    def _roots(*winner_parts):
        c = np.concatenate([p[0] for p in winner_parts])
        p_ = np.concatenate([p[1] for p in winner_parts])
        order = np.argsort(c, kind="stable")
        c, p_ = c[order], p_[order]
        pi = np.searchsorted(c, p_)
        self_pos = np.arange(len(c))
        mutual = pi[pi] == self_pos
        pi = np.where(mutual & (c < p_), self_pos, pi)
        for _ in range(64):
            nxt = pi[pi]
            if (nxt == pi).all():
                break
            pi = nxt
        return (c, c[pi])                 # (comp sorted, root)

    @ray.remote
    def _relabel(lab, roots):
        verts, comp = lab
        rc, rr = roots
        if len(rc):
            pos = np.clip(np.searchsorted(rc, comp), 0, len(rc) - 1)
            hit = rc[pos] == comp
            comp = np.where(hit, rr[pos], comp)
        return (verts, comp)

    @ray.remote
    def _winner_edges(wp):
        _, _, u, v, w = wp
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "w": pa.array(w)})

    forest_refs = []
    for _ in range(max_rounds):
        a_refs = [
            _attach_u.options(num_returns=coarse).remote(
                ebuckets[j], vlabels[j], coarse)
            for j in range(coarse)
        ]
        b_refs = [
            _attach_v.options(num_returns=2 * coarse + 1).remote(
                vlabels[k], coarse, *[a_refs[j][k] for j in range(coarse)])
            for k in range(coarse)
        ]
        n_cross = sum(ray.get([b[2 * coarse] for b in b_refs]))
        if n_cross == 0:
            break
        ebuckets = [
            # next round's live edge set for bucket j, parts from all k
            _concat3.remote(*[b_refs[k][j] for k in range(coarse)])
            for j in range(coarse)
        ]
        winner_parts = [
            _fold_winners.remote(
                *[b_refs[k][coarse + m] for k in range(coarse)])
            for m in range(coarse)
        ]
        forest_refs.extend(
            _winner_edges.remote(wp) for wp in winner_parts)
        roots_ref = _roots.remote(*winner_parts)
        vlabels = [_relabel.remote(lb, roots_ref) for lb in vlabels]
    else:
        raise RuntimeError(f"minimum_spanning_forest did not converge "
                           f"in {max_rounds} rounds")

    if not forest_refs:
        return rd.from_arrow(pa.table({
            "u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64())}))
    out = rd.from_arrow_refs(forest_refs)

    # ONE edge-key dedup for the whole forest (an edge may be chosen
    # by both endpoint components in its round)
    from raykg.ops.cc import _bucket

    def edge_key(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        return t.append_column("_e", pa.array(
            _bucket(u * 1_000_003 + v, MST_BUCKETS)))

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        out.map_batches(edge_key, batch_format="pyarrow"),
        "_e", MST_BUCKETS, _dedup_uv_whole_bucket)


def _dedup_uv_whole_bucket(g: pd.DataFrame) -> pd.DataFrame:
    # fold-safe: dedup keys on (u, v) itself, not the bucket value
    return g.drop_duplicates(["u", "v"]).drop(columns="_e")


def _concat3_fn(*parts):
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]))


import ray as _ray  # noqa: E402  (module-level remote for _msf_tasks)

_concat3 = _ray.remote(_concat3_fn)


def _msf_dataset(edges_ds, src: str = "src", dst: str = "dst",
                 weight: str = "w", max_rounds: int = 40,
                 coarse: int = MST_BUCKETS):
    """Plan-adaptive Dataset-join Borůvka rounds — the beyond-inmem
    fallback of minimum_spanning_forest (labels exceed
    ROOTS_INMEM_BYTES)."""
    from raykg.ops.cc import _bucket
    from raykg.ops.exchange import hash_exchange
    from raykg.ops.joins import auto_join

    def norm(t: pa.Table) -> pa.Table:
        a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        wr = t.column(weight).to_numpy(zero_copy_only=False)
        if not np.issubdtype(wr.dtype, np.integer):
            raise ValueError(
                "minimum_spanning_forest needs integer weights — "
                "pre-quantize float similarities (cents convention); "
                "astype truncation would silently reorder edges")
        w = wr.astype(np.int64)
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        keep = u != v
        df = (pd.DataFrame({"u": u[keep], "v": v[keep], "w": w[keep]})
              .groupby(["u", "v"], as_index=False)["w"].min())
        df["_b"] = _bucket(df["u"].to_numpy() * 31 + df["v"].to_numpy(),
                           coarse)
        return pa.Table.from_pandas(df, preserve_index=False)

    def min_w_per_edge(g: pd.DataFrame) -> pd.DataFrame:
        # fold-safe: re-groups by the real (u, v) key internally
        return g.groupby(["u", "v"], as_index=False)["w"].min()

    edges = hash_exchange(
        edges_ds.map_batches(norm, batch_format="pyarrow"),
        "_b", coarse, min_w_per_edge).materialize()

    def verts(t: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            t.column("u").to_numpy(zero_copy_only=False),
            t.column("v").to_numpy(zero_copy_only=False)]))
        return pa.table({"vertex": pa.array(ids.astype(np.int64)),
                         "comp": pa.array(ids.astype(np.int64)),
                         "_b": pa.array(_bucket(ids, coarse))})

    def dedup_vertex(g: pd.DataFrame) -> pd.DataFrame:
        # fold-safe: dedup keys on vertex itself, not the bucket value
        return g.drop_duplicates("vertex").drop(columns="_b")

    labels = hash_exchange(
        edges.map_batches(verts, batch_format="pyarrow"),
        "_b", coarse, dedup_vertex).materialize()

    i64 = pa.int64()
    forest_parts = []
    for _ in range(max_rounds):
        # attach both endpoints' component labels (plan-adaptive)
        with_cu = auto_join(edges, labels, on="u", right_on="vertex",
                            left_cols=["v", "w"], right_cols=["comp"],
                            left_types={"u": i64, "v": i64, "w": i64},
                            right_types={"comp": i64})

        def _cu(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                ["cu" if c == "comp" else c for c in t.column_names])

        both = auto_join(with_cu.map_batches(_cu, batch_format="pyarrow"),
                         labels, on="v", right_on="vertex",
                         left_cols=["u", "w", "cu"], right_cols=["comp"],
                         left_types={"v": i64, "u": i64, "w": i64,
                                     "cu": i64},
                         right_types={"comp": i64})

        def cross_only(t: pa.Table) -> pa.Table:
            cu = t.column("cu").to_numpy(zero_copy_only=False)
            cv = t.column("comp").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(cu != cv))

        cross = both.map_batches(cross_only,
                                 batch_format="pyarrow").materialize()
        if cross.count() == 0:
            break

        # intra-component edges never become cross edges again
        # (components only merge) — the live edge set SHRINKS to the
        # cross set, so later rounds re-join only surviving edges
        def live(t: pa.Table) -> pa.Table:
            return t.select(["u", "v", "w"])

        edges = cross.map_batches(live,
                                  batch_format="pyarrow").materialize()

        # each component's minimum incident cross-edge by (w, u, v):
        # per-block pre-min per component, then one component-bucket
        # fold — the exchange carries O(blocks x live components) rows
        def cand(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            rows = pd.concat([
                df[["cu", "w", "u", "v", "comp"]].rename(
                    columns={"cu": "c", "comp": "oc"}),
                df[["comp", "w", "u", "v", "cu"]].rename(
                    columns={"comp": "c", "cu": "oc"}),
            ], ignore_index=True)
            rows = (rows.sort_values(["c", "w", "u", "v"],
                                     kind="mergesort")
                    .drop_duplicates("c"))
            rows["_b"] = _bucket(rows["c"].to_numpy(np.int64), coarse)
            return pa.Table.from_pandas(rows, preserve_index=False)

        def fold_min(g: pd.DataFrame) -> pd.DataFrame:
            # fold-safe: min-per-component keys on c itself
            return (g.sort_values(["c", "w", "u", "v"], kind="mergesort")
                    .drop_duplicates("c").drop(columns="_b"))

        winners = hash_exchange(
            cross.map_batches(cand, batch_format="pyarrow"),
            "_b", coarse, fold_min).materialize()

        # an edge chosen by both endpoints appears twice in winners —
        # contraction (pointer doubling) doesn't care, and the forest
        # output is deduped ONCE at the end instead of paying a
        # groupby shuffle per round
        forest_parts.append(winners)

        # contract via POINTER DOUBLING over the per-component winner
        # relation (one parent per live component: parent[c] = oc) —
        # NOT hash-min CC, whose round count is the component-chain
        # DIAMETER (equal-weight graphs legitimately chain; a path
        # would need O(V) rounds). The winner relation is a functional
        # pseudo-forest whose only cycles are the mutual 2-cycles at
        # each merged tree's minimum edge; break those (smaller id
        # self-roots), then parent <- parent[parent] converges to root
        # pointers in ceil(log2 depth) plan-adaptive joins.
        roots = _forest_roots(winners, max_rounds)

        relab = auto_join(labels, roots, on="comp",
                          right_on="c", how="left",
                          left_cols=["vertex"], right_cols=["root"],
                          left_types={"comp": i64, "vertex": i64},
                          right_types={"root": i64})

        def apply_label(df: pd.DataFrame) -> pd.DataFrame:
            comp = df["root"].fillna(df["comp"]).astype(np.int64)
            return pd.DataFrame({"vertex": df["vertex"].to_numpy(np.int64),
                                 "comp": comp.to_numpy()})

        labels = relab.map_batches(
            apply_label, batch_format="pandas").materialize()
    else:
        raise RuntimeError(f"minimum_spanning_forest did not converge "
                           f"in {max_rounds} rounds")

    import ray.data as rd

    if not forest_parts:
        return rd.from_arrow(pa.table({
            "u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64())}))

    out = forest_parts[0]
    for p in forest_parts[1:]:
        out = out.union(p)

    # ONE edge-key dedup for the whole forest (each edge may appear
    # twice in its round's winners — chosen by both endpoints)
    def edge_key(t: pa.Table) -> pa.Table:
        t = t.select(["u", "v", "w"])
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        return t.append_column("_e", pa.array(
            _bucket(u * 1_000_003 + v, coarse)))

    return hash_exchange(
        out.map_batches(edge_key, batch_format="pyarrow"),
        "_e", coarse, _dedup_uv_whole_bucket)


def mst_bruteforce(edges: pd.DataFrame, src: str = "src",
                   dst: str = "dst", weight: str = "w") -> pd.DataFrame:
    """Kruskal with union-find and the identical (w, u, v) total
    order — the single-process reference."""
    a = edges[src].to_numpy(np.int64)
    b = edges[dst].to_numpy(np.int64)
    w = edges[weight].to_numpy(np.int64)
    u, v = np.minimum(a, b), np.maximum(a, b)
    keep = u != v
    df = (pd.DataFrame({"u": u[keep], "v": v[keep], "w": w[keep]})
          .groupby(["u", "v"], as_index=False)["w"].min()
          .sort_values(["w", "u", "v"], kind="mergesort"))
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    rows = []
    for r in df.itertuples(index=False):
        ru, rv = find(r.u), find(r.v)
        if ru != rv:
            parent[ru] = rv
            rows.append((r.u, r.v, r.w))
    out = pd.DataFrame(rows, columns=["u", "v", "w"])
    return out.sort_values(["u", "v"]).reset_index(drop=True)
