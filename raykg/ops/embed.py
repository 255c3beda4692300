"""Embedding-column transforms: L2 normalization, distributed PCA,
random projection.

At 100 TB the embedding table (~10^11 rows x d floats) never fits a
node, so every operator here is a streaming per-batch map; the only
cross-block state is O(d^2) moment partials:

- ``l2_normalize`` — pure per-batch map, no shuffle, zero-copy Arrow
  in and out.
- ``pca_project`` — two streaming passes.  Pass 1 accumulates
  per-block (n, sum_x, X^T X) moment partials; one row of d + d^2
  doubles leaves each block, so the driver holds O(blocks * d^2)
  scalars, never rows.  The d x d eigendecomposition runs on the
  driver (d is small: 64-1024), components broadcast once via
  ``ray.put``; pass 2 projects per batch with one GEMM.  This is the
  covariance-method PCA every large-scale system uses when d is
  small and n is huge (e.g. Spark MLlib's RowMatrix PCA).
- ``random_projection`` — Johnson-Lindenstrauss Gaussian projection;
  the matrix derives deterministically from a seed and is built once
  per worker (no broadcast needed), so the stage is stateless and
  retry-safe.

Reference tie-in: the reference pipeline stores raw 1024-d BLINK
embeddings and searches them exactly (faiss_indexer.py:76-91); a
100 TB corpus wants them unit-normalized (cosine == dot) and often
dimensionality-reduced before ANN — these are those missing steps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raykg.encode import column_to_vectors, vectors_to_column


def _fold_sq_norm(v64: np.ndarray) -> np.ndarray:
    """Sum of squares with an explicit left-to-right fold over the
    dimensions (not np.sum's pairwise tree) so the accumulated double
    is bit-identical to DuckDB's ``list_sum`` left fold — the oracle
    for ``embed_l2_normalize`` relies on this.
    """
    acc = np.zeros(v64.shape[0], dtype=np.float64)
    for j in range(v64.shape[1]):
        acc += v64[:, j] * v64[:, j]
    return acc


def l2_normalize(ds, vec_col: str = "embedding", out_col: str | None = None):
    """Unit-normalize a vector column (zero vectors pass through
    unchanged).  Output is float64 so downstream cosine == dot is
    exact to the input's precision; per-batch map, no shuffle.
    """
    out = out_col or vec_col

    def fn(t: pa.Table) -> pa.Table:
        v = column_to_vectors(t.column(vec_col)).astype(np.float64)
        nrm = np.sqrt(_fold_sq_norm(v))
        nrm[nrm == 0.0] = 1.0
        v /= nrm[:, None]
        flat = pa.array(np.ascontiguousarray(v).reshape(-1), pa.float64())
        col = pa.FixedSizeListArray.from_arrays(flat, v.shape[1])
        if out in t.column_names:
            t = t.drop_columns([out])
        return t.append_column(out, col)

    return ds.map_batches(fn, batch_format="pyarrow")


def _moment_partials(t: pa.Table, vec_col: str) -> pa.Table:
    v = column_to_vectors(t.column(vec_col)).astype(np.float64)
    n = v.shape[0]
    s = v.sum(axis=0)
    ss = v.T @ v
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "s": pa.array([s.tolist()]),
        "ss": pa.array([ss.reshape(-1).tolist()]),
    })


def fit_pca(ds, vec_col: str = "embedding", k: int = 8):
    """Pass 1: exact covariance from streaming moment partials, then
    the d x d eigendecomposition on the driver.

    Returns ``(mean, components)`` with components (k, d), rows =
    descending-eigenvalue principal axes.  Sign is pinned per
    component (largest-|w| coordinate made positive) so the fit is
    deterministic across eigensolver builds.

    Only one (n, d + d^2) partial row per block reaches the driver;
    the rows themselves never move.
    """
    parts = ds.map_batches(
        lambda t: _moment_partials(t, vec_col), batch_format="pyarrow"
    ).take_all()
    n = sum(p["n"] for p in parts)
    if n == 0:
        raise ValueError("empty dataset")
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    d = s.shape[0]
    ss = np.sum([np.asarray(p["ss"]).reshape(d, d) for p in parts], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    w, vecs = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = vecs[:, order].T               # (k, d)
    # sign convention: the largest-magnitude coordinate of each
    # component is positive (eigenvectors are sign-ambiguous)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps


def pca_project(ds, vec_col: str = "embedding", k: int = 8,
                out_col: str = "pc", fitted=None):
    """Pass 2: project every vector onto the top-k principal axes.
    ``fitted`` (from :func:`fit_pca`) is broadcast via ``ray.put`` —
    one object-store copy read by every task, never re-shipped per
    batch.
    """
    import ray

    mean, comps = fitted if fitted is not None else fit_pca(ds, vec_col, k)
    ref = ray.put((mean.astype(np.float64), comps.astype(np.float64)))

    def fn(t: pa.Table) -> pa.Table:
        m, c = ray.get(ref)
        v = column_to_vectors(t.column(vec_col)).astype(np.float64)
        proj = (v - m) @ c.T
        flat = pa.array(np.ascontiguousarray(proj).reshape(-1), pa.float64())
        col = pa.FixedSizeListArray.from_arrays(flat, proj.shape[1])
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, col)

    return ds.map_batches(fn, batch_format="pyarrow")


def random_projection(ds, vec_col: str = "embedding", k: int = 16,
                      seed: int = 0, out_col: str = "proj"):
    """Gaussian Johnson-Lindenstrauss projection to k dims.  The
    (d, k) matrix is rebuilt per worker from the seed (cheaper than
    broadcasting for small d*k and makes the stage stateless /
    retry-idempotent); scaled 1/sqrt(k) so expected norms are
    preserved.
    """
    cache: dict = {}

    def fn(t: pa.Table) -> pa.Table:
        v = column_to_vectors(t.column(vec_col))
        d = v.shape[1]
        R = cache.get(d)
        if R is None:
            rng = np.random.default_rng(seed)
            R = rng.standard_normal((d, k)) / np.sqrt(k)
            cache[d] = R
        proj = v.astype(np.float64) @ R
        mat = np.ascontiguousarray(proj, dtype=np.float32)
        return t.append_column(out_col, vectors_to_column(mat))

    return ds.map_batches(fn, batch_format="pyarrow")
