"""Distributed logistic-regression training (IRLS) — fit the model
over the FULL dataset without ever collecting a row.

The reference trains its NIL predictor by loading every prepared
batch into one pandas frame and calling sklearn
(``scripts/feature_ablation_study.py:376-426``; ``README.md:316``
documents the cost: ~43 GB resident for the full train set). The
objective is tiny (d ≤ a few dozen features) — only the DATA is big —
which makes it the textbook case for partial-sufficient-statistics
training: every IRLS (Newton) iteration needs just

    H = Xᵇᵀ W Xᵇ + R        ((d+1)×(d+1))
    g = Xᵇᵀ (p − y) + R w   (d+1)

and both are sums of per-row outer products, so each block can emit
its own (d+1)² + (d+1) partial and the driver folds O(blocks) rows of
metadata-sized state per iteration. Row data never moves; the model
visits the corpus ``max_iter`` streaming passes (IRLS converges in
5-15 on real data).

Plan:
  * pass 0 — per-block ``(n, Σx, Σx²)`` partials → StandardScaler
    mean/scale (exactly the sklearn preprocessing the reference uses);
  * per iteration — one ``map_batches`` over the feature columns
    computes the block's H and g partials with the CURRENT weight
    vector closed over (weights are d+1 floats — rebroadcast by value,
    no object-store churn); the driver folds partials in a canonical
    sorted order (stable under block arrival order), solves the
    (d+1)-dim Newton system and updates w;
  * convergence — max |step| < tol, same stop rule as the in-memory
    ``raykg.nil.LogisticModel.fit``.

The result is a ``raykg.nil.LogisticModel`` — identical objective
(½/C·‖w‖² + Σ log-loss, intercept unpenalized, standardized features),
so the distributed fit lands on the in-memory optimum to solver
tolerance; ``tests/test_logreg.py`` pins coefficient agreement and
partition-count stability.

Partitioning assumption: none beyond "a block fits a task" — partials
are O(d²) per block regardless of block size, and label/feature skew
is irrelevant to a global Newton step.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from raykg.nil import LogisticModel


def _feature_matrix(t: pa.Table, feature_cols: list[str]) -> np.ndarray:
    cols = [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in feature_cols]
    return np.stack(cols, axis=1) if cols else np.empty((t.num_rows, 0))


def _fold(parts: pd.DataFrame, col: str) -> np.ndarray:
    """Sum a list<float64> partial column in a canonical order so the
    result does not depend on block arrival order."""
    rows = np.stack([np.asarray(v, dtype=np.float64) for v in parts[col]])
    order = np.lexsort(rows.T[::-1])
    return rows[order].sum(axis=0)


def fit_logreg_distributed(
    ds,
    feature_cols: list[str],
    label_col: str,
    C: float = 1.0,
    max_iter: int = 50,
    tol: float = 1e-8,
) -> LogisticModel:
    """Fit sklearn-objective logistic regression over ``ds`` in
    O(max_iter) streaming passes; returns a ``LogisticModel`` (with
    the scaler folded in) interchangeable with the in-memory fit."""
    d = len(feature_cols)
    if d == 0:
        raise ValueError("need at least one feature column")

    # materialize ONCE; both the scaler pass and every IRLS step run
    # as raw tasks over these blocks
    block_refs_all = list(ds.to_arrow_refs())

    # ---- pass 0: scaler moments (one partial tuple per block)
    moms = ray.get([
        _moments_partials.remote(b, feature_cols) for b in block_refs_all
    ])
    n_total = int(sum(m[0] for m in moms))
    if n_total == 0:
        raise ValueError("empty dataset")
    rows = np.stack([m[1] for m in moms])
    order = np.lexsort(rows.T[::-1])   # canonical fold order
    sx = rows[order].sum(axis=0)
    rows2 = np.stack([m[2] for m in moms])
    sxx = rows2[np.lexsort(rows2.T[::-1])].sum(axis=0)
    mean = sx / n_total
    var = np.maximum(sxx / n_total - mean * mean, 0.0)
    scale = np.sqrt(var)
    scale[scale == 0.0] = 1.0

    # ---- IRLS iterations as RAW TASKS over the materialized blocks
    # (the kmeans/pagerank precedent): a Ray-Data job per Newton step
    # would re-execute the upstream read and pay the job's fixed cost
    # x max_iter; here the feature blocks sit in the object store once
    # and each step is one GEMM task per block + an O(d²) driver fold.
    block_refs = block_refs_all
    reg = np.eye(d + 1) / C
    reg[d, d] = 0.0
    w = np.zeros(d + 1)

    for _ in range(max_iter):
        w_now = w.copy()
        refs = [_irls_partials.remote(b, w_now, mean, scale,
                                      feature_cols, label_col)
                for b in block_refs]
        parts = ray.get(refs)
        H = sum(p[0] for p in parts) + reg
        g = sum(p[1] for p in parts) + reg @ w_now
        step = np.linalg.solve(H, g)
        w = w_now - step
        if np.abs(step).max() < tol:
            break

    return LogisticModel(feature_cols, w[:d], w[d], mean=mean, scale=scale)


def _irls_partials_fn(tbl, w_now, mean, scale, feature_cols, label_col):
    if not isinstance(tbl, pa.Table):
        tbl = pa.Table.from_pandas(tbl, preserve_index=False)
    d = len(feature_cols)
    if tbl.num_rows == 0 or feature_cols[0] not in tbl.column_names:
        return np.zeros((d + 1, d + 1)), np.zeros(d + 1)
    X = _feature_matrix(tbl, feature_cols)
    Xs = (X - mean) / scale
    Xb = np.concatenate([Xs, np.ones((len(Xs), 1))], axis=1)
    y = tbl.column(label_col).to_numpy(
        zero_copy_only=False).astype(np.float64)
    z = Xb @ w_now
    p = 1.0 / (1.0 + np.exp(-z))
    wgt = np.maximum(p * (1 - p), 1e-10)
    H = (Xb * wgt[:, None]).T @ Xb
    g = Xb.T @ (p - y)
    return H, g


_irls_partials = ray.remote(_irls_partials_fn)


@ray.remote
def _moments_partials(tbl, feature_cols):
    if not isinstance(tbl, pa.Table):
        tbl = pa.Table.from_pandas(tbl, preserve_index=False)
    d = len(feature_cols)
    if tbl.num_rows == 0 or (feature_cols
                             and feature_cols[0] not in tbl.column_names):
        return 0, np.zeros(d), np.zeros(d)
    X = _feature_matrix(tbl, feature_cols)
    return len(X), X.sum(axis=0), (X * X).sum(axis=0)


def score_dataset(ds, model: LogisticModel, feature_cols: list[str],
                  out_col: str = "p"):
    """Apply a fitted model as a stateless vectorized stage (the
    coefficients travel by closure — they are d+1 floats)."""
    def apply(t: pa.Table) -> pa.Table:
        X = _feature_matrix(t, feature_cols)
        return t.append_column(out_col,
                               pa.array(model.predict_proba1(X),
                                        pa.float64()))

    return ds.map_batches(apply, batch_format="pyarrow")
