"""Product quantization (Jégou et al. 2011) for embedding search —
the memory path at reference scale: the 5.9 M × 1024-float32 KB is
~24 GB of raw vectors; m=8 PQ codes are 8 BYTES/vector (~47 MB), so a
worker holds the whole compressed index where raw vectors must stream.

Operator shape (`knn_pq`): codebooks train driver-side on a small
sample (k-means per subspace — the small-model-broadcast pattern, like
IVF centroids), then ONE map_batches pass per corpus block:

  1. encode the block's vectors to (n, m) uint8 codes (nearest
     codebook entry per subspace — one GEMM per subspace);
  2. ADC scoring: each query precomputes an (m, ks) inner-product
     table against the codebooks; a block's score matrix is m table
     lookups + a sum — no per-vector float math;
  3. PQ is a SHORTLIST, not the answer: the top `rerank × k` PQ
     candidates are re-scored EXACTLY against the block's raw vectors
     (they are already in memory — this is free locality), and only
     exact scores leave the block, so the global merge is exact over
     the union of shortlists.

Sizing ``rerank``: ADC scores track exact cosine closely in the large
(corr ~0.99 on clustered data) but cannot resolve the tiny gaps AMONG
near-identical vectors — if the corpus has tight clusters of c
near-duplicates, the shortlist (rerank × k) must be ≥ c for the exact
re-rank to see the true top-k. rerank=4 suits well-separated corpora;
raise it with expected duplicate multiplicity.

Same output contract as ``knn_bruteforce`` (qid, vec_id, rank);
approximation only narrows the shortlist. Recall gates live in
tests/test_curation.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from raykg.encode import column_to_vectors
from raykg.ops.similarity import _normalize, kmeans_lite


def train_pq_codebooks(
    sample: np.ndarray, m: int = 8, ks: int = 256, n_iter: int = 8,
    seed: int = 5
) -> np.ndarray:
    """(m, ks, d/m) codebooks — independent k-means per subspace on a
    NORMALIZED sample (cosine = inner product afterwards)."""
    X = _normalize(np.asarray(sample, dtype=np.float64))
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    ks = min(ks, n)
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        books[j] = kmeans_lite(X[:, j * dsub:(j + 1) * dsub], ks,
                               n_iter=n_iter, seed=seed + j)
    return books


def _encode(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8/uint16 nearest-entry codes."""
    m, ks, dsub = books.shape
    codes = np.empty((len(X), m), dtype=np.uint16)
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        # argmin ||x - c||^2 = argmax (x·c - ||c||²/2)
        scores = sub @ books[j].T - 0.5 * (books[j] ** 2).sum(axis=1)
        codes[:, j] = scores.argmax(axis=1)
    return codes


def knn_pq(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    m: int = 8,
    ks: int = 256,
    rerank: int = 4,
    sample_n: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 5,
):
    """-> Dataset(qid, vec_id, rank): PQ-shortlisted, exactly re-ranked
    cosine top-k per query. Output ranks are 1-based by (exact sim
    desc, vec_id asc) over the shortlist union."""
    # training sample must SPREAD across the corpus: a head sample
    # (limit) sees only the first blocks — on cluster-ordered data the
    # codebooks then never see half the space (measured: recall@10
    # 0.42 vs 0.97+). Deterministic hash filter on the id instead.
    n_total = ds.count()
    rate = min(1.0, (4.0 * sample_n) / max(n_total, 1))
    thr = np.uint64(int(rate * (1 << 32)))
    knuth = np.uint64(2654435761)

    def spread(t: pa.Table) -> pa.Table:
        ids_ = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.filter(pa.array((ids_ * knuth) % np.uint64(1 << 32) < thr))

    head = (ds.map_batches(spread, batch_format="pyarrow")
            .limit(sample_n).to_pandas())
    sample = np.stack([np.asarray(v, dtype=np.float64)
                       for v in head[vec_col]])
    books = train_pq_codebooks(sample, m=m, ks=ks, seed=seed)

    Qn = _normalize(np.asarray(queries, dtype=np.float64))
    # per-query ADC lookup tables: table[q, j, c] = q_sub[j] · book[j, c]
    tables = np.einsum("qjd,jkd->qjk", Qn.reshape(len(Qn), m, -1), books)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), Qn, books, tables))
    shortlist = rerank * k

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, Q, bks, tbl = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        M = _normalize(column_to_vectors(batch.column(vec_col)).astype(np.float64))
        codes = _encode(M, bks)  # (n, m)
        # ADC scores: sum of table lookups, (nq, n)
        approx = np.zeros((len(Q), len(ids)))
        for j in range(bks.shape[0]):
            approx += tbl[:, j, codes[:, j]]
        ss = min(shortlist, len(ids))
        cand = np.argpartition(-approx, ss - 1, axis=1)[:, :ss]
        out_q, out_v, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(len(Q)):
            rows = cand[qi]
            exact = M[rows] @ Q[qi]  # exact re-rank of the shortlist
            order = np.lexsort((ids[rows], -exact))[:kk]
            out_q.append(np.full(kk, qids[qi], dtype=np.int64))
            out_v.append(ids[rows][order])
            out_s.append(exact[order])
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
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )
