"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is the small side
(broadcast once via ray.put); each corpus block does one matmul and
emits its local top-k per query; a final groupby(query) merge keeps the
global top-k. Wall-clock scales with corpus blocks, memory with
k × queries.

Scale path: IVF — coarse centroids from a driver-side k-means on a
sample (small), every vector assigned to its nearest centroid in one
broadcast map_batches pass; queries probe only the nprobe nearest
partitions. Same output contract as brute force (approximate recall).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from raykg.encode import column_to_vectors


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1
    return M / n


def knn_bruteforce(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """-> Dataset(qid, vec_id, rank) — global cosine top-k per query.

    Ranks are 1-based by (cosine desc, vec_id asc); similarity is
    computed in float64 so results are reproducible against SQL oracles.
    """
    Qn = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), Qn))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, Q = ray.get(qref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        M = _normalize(column_to_vectors(batch.column(vec_col)).astype(np.float64))
        sims = Q @ M.T  # (nq, nblock)
        kk = min(k, sims.shape[1])
        # per query: top-kk by (sim desc, id asc)
        order = np.lexsort((ids[None, :].repeat(len(Q), 0), -sims), axis=1)[:, :kk]
        out_q = np.repeat(qids, kk)
        out_v = ids[order].reshape(-1)
        out_s = np.take_along_axis(sims, order, axis=1).reshape(-1)
        return pa.table(
            {
                "qid": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "vec_id", "rank"]]

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )


def kmeans_lite(
    X: np.ndarray, n_clusters: int, n_iter: int = 10, seed: int = 3
) -> np.ndarray:
    """Plain Lloyd's k-means on a (sample) matrix — centroid builder for
    IVF. Deterministic in seed."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, dtype=np.float64)
    centers = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(n_iter):
        d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        for c in range(len(centers)):
            members = X[lab == c]
            if len(members):
                centers[c] = members.mean(axis=0)
    return centers


def build_ivf(ds, n_lists: int = 16, sample_n: int = 2048,
              vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 3):
    """-> (centroids, assigned Dataset with a 'list_id' column)."""
    sample = ds.limit(sample_n).take_all()
    X = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    centers = kmeans_lite(_normalize(X), n_lists, seed=seed)
    cref = ray.put(centers)

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(cref)
        M = _normalize(column_to_vectors(batch.column(vec_col)).astype(np.float64))
        lab = (M @ C.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("list_id", pa.array(lab))

    return centers, ds.map_batches(assign, batch_format="pyarrow")


def knn_ivf(
    assigned_ds,
    centers: np.ndarray,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Approximate top-k: each query searches only its nprobe nearest
    inverted lists. Corpus blocks skip queries that don't probe any of
    the block's lists."""
    Qn = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(Qn @ centers.T), axis=1)[:, :nprobe]
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), Qn, probes))

    def local_topk(batch: pa.Table) -> pa.Table:
        # grouped BY LIST, not by query: one GEMM per inverted list
        # present in the block, vectorized over all queries probing it —
        # scales to 10^5 queries without a per-query Python loop
        qids, Q, P = ray.get(qref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        lists = batch.column("list_id").to_numpy(zero_copy_only=False)
        M = _normalize(column_to_vectors(batch.column(vec_col)).astype(np.float64))
        row_order = np.argsort(lists, kind="stable")
        lists_s = lists[row_order]
        ul, rstarts = np.unique(lists_s, return_index=True)
        rbounds = np.append(rstarts, len(lists_s))

        nq, npb = P.shape
        flat_q = np.repeat(np.arange(nq), npb)
        flat_l = P.reshape(-1)
        qorder = np.argsort(flat_l, kind="stable")
        flat_q, flat_l = flat_q[qorder], flat_l[qorder]
        uq, qstarts = np.unique(flat_l, return_index=True)
        qbounds = np.append(qstarts, len(flat_l))
        q_by_list = {int(l): (qstarts[i], qbounds[i + 1]) for i, l in enumerate(uq)}

        out_q, out_v, out_s = [], [], []
        for i, l in enumerate(ul):
            span = q_by_list.get(int(l))
            if span is None:
                continue
            qs = flat_q[span[0] : span[1]]
            rows = row_order[rstarts[i] : rbounds[i + 1]]
            S = M[rows] @ Q[qs].T  # (n_rows, n_qs)
            sub_ids = ids[rows]
            kk = min(k, len(rows))
            # per-query top-kk within the list by (sim desc, id asc)
            order = np.lexsort(
                (np.broadcast_to(sub_ids[:, None], S.shape), -S), axis=0
            )[:kk]
            out_q.append(np.repeat(qids[qs], kk))
            out_v.append(np.take_along_axis(
                np.broadcast_to(sub_ids[:, None], S.shape), order, axis=0
            ).T.ravel())
            out_s.append(np.take_along_axis(S, order, axis=0).T.ravel())
        if not out_q:
            return pa.table(
                {
                    "qid": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "vec_id", "rank"]]

    return (
        assigned_ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )


def fit_sq8(ds, vec_col: str = "embedding"):
    """Per-dimension scalar-quantization bounds (FAISS SQ8): exact
    global min/max per dimension from one streaming pass of per-block
    (d,)-sized partials — the driver folds O(blocks × d) floats, never
    vectors. Returns (lo, scale) with scale sized so codes span 0..255.
    """

    def part(batch: pa.Table) -> pa.Table:
        M = column_to_vectors(batch.column(vec_col)).astype(np.float64)
        return pa.table({
            "lo": pa.array([M.min(axis=0)], pa.list_(pa.float64())),
            "hi": pa.array([M.max(axis=0)], pa.list_(pa.float64())),
        })

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    lo = np.min(np.stack(parts["lo"].to_numpy()), axis=0)
    hi = np.max(np.stack(parts["hi"].to_numpy()), axis=0)
    scale = (hi - lo) / 255.0
    scale[scale == 0] = 1.0
    return lo, scale


def sq8_encode(ds, lo: np.ndarray, scale: np.ndarray,
               vec_col: str = "embedding", out_col: str = "code"):
    """Quantize the vector column to uint8 codes (4x smaller at rest —
    the KB-compression transform a 100 TB embedding store runs before
    serving). Codes round half-up for determinism across platforms."""
    ref = ray.put((np.asarray(lo), np.asarray(scale)))

    def fn(t: pa.Table) -> pa.Table:
        l, s = ray.get(ref)
        M = column_to_vectors(t.column(vec_col)).astype(np.float64)
        c = np.floor((M - l) / s + 0.5)
        codes = np.clip(c, 0, 255).astype(np.uint8)
        return t.drop_columns([vec_col]).append_column(
            out_col,
            pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), codes.shape[1]),
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def knn_sq8(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    shortlist_mult: int = 8,
    lo: np.ndarray | None = None,
    scale: np.ndarray | None = None,
):
    """Cosine top-k through int8 scalar quantization + exact re-rank.

    Same output contract as ``knn_bruteforce`` (qid, vec_id, rank).
    Per block: the block's vectors quantize once to uint8; the
    approximate score is an affine rewrite of the dot product
    (q'·codes where q' = q∘scale, plus a per-query constant that
    cannot change ordering), so scanning costs one low-precision GEMM
    over 4x-smaller data. The per-query top ``shortlist_mult × k``
    shortlist is then re-scored EXACTLY from the block's original
    floats, and only exact scores leave the block — the global merge
    is exact over the union of block shortlists (the PQ/ADC re-rank
    argument, ``raykg/ops/pq.py``). Recall < 1 only when a true
    block-local top-k row falls outside the block shortlist; gate in
    ``tests/test_ops.py`` pins >= 0.98 vs brute force.

    At rest the corpus would store codes (``sq8_encode``); here codes
    are derived per block so the operator composes with any upstream
    without a schema change.
    """
    if lo is None or scale is None:
        lo, scale = fit_sq8(ds, vec_col=vec_col)
    Qn = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), Qn,
                    np.asarray(lo), np.asarray(scale)))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, Q, l, s = ray.get(qref)
        if batch.num_rows == 0:
            return pa.table({
                "qid": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            })
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        M = column_to_vectors(batch.column(vec_col)).astype(np.float64)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1
        codes = np.clip(np.floor((M - l) / s + 0.5), 0, 255)
        # approx cosine: (Q∘s)·codes / ||m||  (+ Q·l/||m||, kept —
        # norms vary per row so the affine term must stay in)
        approx = ((Q * s) @ codes.T + (Q @ l)[:, None]) / norms[None, :]
        sl = min(shortlist_mult * k, approx.shape[1])
        if sl < approx.shape[1]:
            cand = np.argpartition(-approx, sl - 1, axis=1)[:, :sl]
        else:
            cand = np.broadcast_to(
                np.arange(approx.shape[1]), approx.shape).copy()
        # exact re-rank of the shortlist only
        kk = min(k, sl)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(Q)):
            c = cand[qi]
            sims = (M[c] @ Q[qi]) / norms[c]
            order = np.lexsort((ids[c], -sims))[:kk]
            out_q.append(np.full(kk, qids[qi], dtype=np.int64))
            out_v.append(ids[c][order])
            out_s.append(sims[order])
        return pa.table({
            "qid": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "vec_id", "rank"]]

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )
