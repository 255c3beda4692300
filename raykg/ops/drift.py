"""Distribution drift between two dataset snapshots: Population
Stability Index (PSI) over fixed numeric bins.

The standard ML-platform monitor — "did the feature distribution of
this week's data move vs the training snapshot?" — run before every
retrain / scoring deployment (reference analogue: the per-batch
added-entities / score-distribution drift the incremental pipeline
inspects between epochs, scripts/eval_kbp.py's per-batch report).

Scale shape: each side folds to EXACT integer bin counts with one
streaming pass of per-block ``np.bincount`` partials — the exchange
is O(blocks x bins), never O(rows) — and the driver folds
metadata-sized count vectors only.  Bins are closed-open
``[lo + i*width, lo + (i+1)*width)`` with clamp-to-edge (the
``numeric_histogram`` convention), so both sides of any oracle bin
identically.

Exactness contract: counts get Laplace +1 smoothing (every bin, both
sides) so no probability is ever zero — deterministic, and the whole
PSI term ``(pa - pb) * ln(pa / pb)`` becomes ONE float expression
over exact integers that a SQL oracle mirrors operand-for-operand;
the total folds bin-ascending through libm ``log`` (the
``grouped_entropy`` fold discipline), bit-identical to DuckDB's
``list_sum(list(term ORDER BY bin))`` with NO rounding anywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _bin_counts(ds, col: str, lo: float, width: float, nbins: int) -> np.ndarray:
    """Exact int64 bin counts of ``col`` via per-block partials."""

    def part(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        # the numeric_histogram convention exactly: NaNs dropped (SQL
        # NULL semantics), clip the FLOAT before the int cast so ±inf
        # clamp to the edge bins instead of wrapping through INT64_MIN
        v = v[~np.isnan(v)]
        b = np.clip(np.floor((v - lo) / width), 0, nbins - 1).astype(np.int64)
        c = np.bincount(b, minlength=nbins).astype(np.int64)
        return pa.table({"bin": pa.array(np.arange(nbins, dtype=np.int64)),
                         "c": pa.array(c)})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    out = np.zeros(nbins, dtype=np.int64)
    for b, c in zip(parts["bin"], parts["c"]):
        out[b] += c
    return out


def psi_drift(ds_a, ds_b, col: str, lo: float, width: float,
              nbins: int) -> pd.DataFrame:
    """PSI between snapshot A (expected/reference) and snapshot B
    (actual/current) of ``col``, plus the per-bin contributions.

    -> DataFrame(bin, count_a, count_b, term, psi) — one row per bin;
    ``psi`` (the bin-ascending fold of ``term``) repeats on every row
    so the relation is self-contained for a SQL mirror.
    """
    ca = _bin_counts(ds_a, col, lo, width, nbins)
    cb = _bin_counts(ds_b, col, lo, width, nbins)
    # Laplace +1: pa = (c+1) / (n + nbins); never zero, exact ints in
    na = float(int(ca.sum()) + nbins)
    nb = float(int(cb.sum()) + nbins)
    terms = np.empty(nbins, dtype=np.float64)
    for i in range(nbins):  # libm log per bin, bin-ascending fold
        p = (float(int(ca[i]) + 1)) / na
        q = (float(int(cb[i]) + 1)) / nb
        terms[i] = (q - p) * math.log(q / p)
    psi = 0.0
    for i in range(nbins):
        psi += terms[i]
    return pd.DataFrame({
        "bin": np.arange(nbins, dtype=np.int64),
        "count_a": ca, "count_b": cb,
        "term": terms, "psi": np.full(nbins, psi),
    })
