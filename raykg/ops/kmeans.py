"""Distributed exact k-means (Lloyd's algorithm) over an embedding
column — the clustering step corpus-curation pipelines run for data
mixing, topic balancing, and cluster-based curriculum (and the exact
counterpart of the sample-based ``kmeans_lite`` that seeds IVF / PQ /
SemDeDup).

Scale shape:

- **Init** — centers come from ``kmeans_lite`` on a hash-spread,
  globally-capped sample (the pq.py pattern: a head sample sees one
  arm of a clustered corpus), so init cost is independent of corpus
  size and deterministic in the seed.
- **Each Lloyd iteration is ONE streaming pass**: centers broadcast
  once via ``ray.put``; every block computes assignments with the
  ``|x|² − 2x·C + |C|²`` GEMM identity (one BLAS call per block, no
  per-row loop) and emits per-center partials ``(count, Σx, Σ
  min-dist²)`` — one row per NON-EMPTY center per block, so the
  exchange is O(blocks × k) regardless of row count.  The driver
  folds those metadata-sized partials into new centers and the
  iteration's inertia; empty centers keep their previous position.
- **Convergence** — stops when the max center shift drops below
  ``tol`` or after ``n_iter`` passes.  At 100 TB each iteration reads
  the corpus once; cap ``n_iter`` (curation k-means converges in a
  handful of passes from a k-means-lite init) or fall back to the
  sample-based fit when exactness is not required.

Determinism: identical partitioning gives bit-identical centers; the
driver fold's block order can perturb float sums at the 1-ulp level
across different partitionings, so cross-partitioning tests pin
ASSIGNMENTS (stable on separated data) and centers to 1e-9.

Reference tie-in: the reference clusters NIL mentions with greedy /
agglomerative strategies over small per-batch groups
(pipeline/greedyclustering/__main__.py:30-34); corpus-scale k-means is
the operation those strategies cannot reach — this module is the
missing global variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from raykg.encode import column_to_vectors


def _spread_sample(ds, vec_col: str, id_col: str, max_sample: int):
    from raykg.ops.sample import hash_spread_sample_rows

    sample = hash_spread_sample_rows(ds, id_col, max_sample)
    if not sample:
        raise ValueError("empty dataset")
    return np.stack([np.asarray(r[vec_col], dtype=np.float64)
                     for r in sample])


def kmeans_fit(ds, vec_col: str = "embedding", id_col: str = "vec_id",
               k: int = 8, n_iter: int = 20, tol: float = 1e-6,
               seed: int = 3, sample_per_block: int = 256):
    """Fit exact k-means.  Returns ``(centers, inertia, iters_run)``
    where ``centers`` is (k, d) float64 and ``inertia`` the total
    squared distance of every row to its assigned center at the last
    completed iteration.
    """
    from raykg.ops.similarity import kmeans_lite

    X0 = _spread_sample(ds, vec_col, id_col, sample_per_block * 16)
    centers = kmeans_lite(X0, k, seed=seed)

    # the Lloyd loop runs as RAW TASKS over the materialized blocks
    # (the pagerank/MST precedent — iterative co-partitioned state):
    # a Ray-Data job per iteration would re-execute the parquet read
    # and pay the job's fixed cost x n_iter; here the vector blocks
    # sit in the object store once and each iteration is one
    # numpy-GEMM task per block + a metadata-sized driver fold.
    block_refs = list(ds.to_arrow_refs())

    inertia = float("inf")
    iters = 0
    for _ in range(n_iter):
        cref = ray.put(centers)
        refs = [_kmeans_partials.remote(b, cref, vec_col)
                for b in block_refs]
        parts = ray.get(refs)
        iters += 1
        k_, d_ = centers.shape
        agg_n = np.zeros(k_, np.int64)
        agg_s = np.zeros((k_, d_), np.float64)
        agg_ssd = 0.0
        for cs, ns, ss, ssd in parts:
            agg_n[cs] += ns
            agg_s[cs] += ss
            agg_ssd += ssd
        new_centers = centers.copy()
        nz = agg_n > 0
        new_centers[nz] = agg_s[nz] / agg_n[nz, None]
        shift = float(np.sqrt(((new_centers - centers) ** 2)
                              .sum(axis=1)).max())
        centers, inertia = new_centers, agg_ssd
        if shift < tol:
            break
    return centers, inertia, iters


@ray.remote
def _kmeans_partials(tbl, cref, vec_col: str):
    C = cref if isinstance(cref, np.ndarray) else ray.get(cref)
    if not isinstance(tbl, pa.Table):
        tbl = pa.Table.from_pandas(tbl, preserve_index=False)
    if tbl.num_rows == 0 or vec_col not in tbl.column_names:
        d = C.shape[1]
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros((0, d), np.float64), 0.0)
    V = column_to_vectors(tbl.column(vec_col)).astype(np.float64)
    # |x|^2 - 2 x.C + |C|^2, one GEMM per block
    d2 = ((V * V).sum(axis=1)[:, None]
          - 2.0 * (V @ C.T)
          + (C * C).sum(axis=1)[None, :])
    lab = d2.argmin(axis=1)
    mind = d2[np.arange(len(lab)), lab]
    cs = np.unique(lab)
    ns = np.zeros(len(cs), np.int64)
    ss = np.zeros((len(cs), V.shape[1]), np.float64)
    for i, c in enumerate(cs):
        m = lab == c
        ns[i] = int(m.sum())
        ss[i] = V[m].sum(axis=0)
    return (cs.astype(np.int64), ns, ss, float(mind.sum()))


def kmeans_assign(ds, centers: np.ndarray, vec_col: str = "embedding",
                  out_col: str = "cluster"):
    """Streaming assignment: broadcast the (k, d) centers once, label
    every row with its nearest center (argmin ties -> lowest id)."""
    cref = ray.put(np.asarray(centers, dtype=np.float64))

    def fn(t: pa.Table) -> pa.Table:
        C = ray.get(cref)
        V = column_to_vectors(t.column(vec_col)).astype(np.float64)
        d2 = ((V * V).sum(axis=1)[:, None]
              - 2.0 * (V @ C.T)
              + (C * C).sum(axis=1)[None, :])
        return t.append_column(
            out_col, pa.array(d2.argmin(axis=1).astype(np.int32)))

    return ds.map_batches(fn, batch_format="pyarrow")


def simplified_silhouette(ds, centers: np.ndarray,
                          vec_col: str = "embedding"):
    """Simplified (centroid-based) silhouette score per cluster — the
    clustering-quality metric that scales: for each point,
    a = euclidean distance to its OWN centroid, b = distance to the
    nearest OTHER centroid, s = (b - a) / max(a, b) (0 when both are
    0). The pairwise-distance silhouette is O(n²); the centroid form
    is the standard streaming proxy (one (rows × k) GEMM per batch
    against the broadcast centers, nothing shuffles — the exchange is
    O(blocks × k) partial rows).

    Float partials fold in CLUSTER-then-block-sum order via pandas
    groupby (sum order over blocks is arrival-dependent — means are
    reproducible to ~1e-12, asserted with tolerance, not bit-pinned).

    -> DataFrame(cluster, n, mean_s) sorted by cluster, plus an
    ``overall`` row with cluster = -1.
    """
    C = np.asarray(centers, dtype=np.float64)
    cref = ray.put(C)

    def part(t: pa.Table) -> pa.Table:
        Cw = ray.get(cref)
        V = column_to_vectors(t.column(vec_col)).astype(np.float64)
        d2 = ((V * V).sum(axis=1)[:, None]
              - 2.0 * (V @ Cw.T)
              + (Cw * Cw).sum(axis=1)[None, :])
        np.maximum(d2, 0.0, out=d2)
        d = np.sqrt(d2)
        own = d.argmin(axis=1)
        a = d[np.arange(len(d)), own]
        d[np.arange(len(d)), own] = np.inf
        b = d.min(axis=1)
        denom = np.maximum(a, b)
        s = np.where(denom > 0, (b - a) / np.where(denom > 0, denom, 1.0),
                     0.0)
        g = (pd.DataFrame({"cluster": own.astype(np.int64), "s": s})
             .groupby("cluster", as_index=False)
             .agg(n=("s", "size"), sum_s=("s", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("cluster", as_index=False)
           .agg(n=("n", "sum"), sum_s=("sum_s", "sum"))
           .sort_values("cluster"))
    out = pd.DataFrame({
        "cluster": agg["cluster"].to_numpy(np.int64),
        "n": agg["n"].to_numpy(np.int64),
        "mean_s": agg["sum_s"].to_numpy() / agg["n"].to_numpy(),
    })
    total_n = int(agg["n"].sum())
    overall = (float(agg["sum_s"].sum()) / total_n) if total_n else 0.0
    out = pd.concat([out, pd.DataFrame(
        {"cluster": [-1], "n": [total_n], "mean_s": [overall]})],
        ignore_index=True)
    return out.sort_values("cluster").reset_index(drop=True)
