"""Exact GLOBAL quantiles of a numeric column without a global sort —
distributed selection by sample-guided range narrowing (the classic
k-th-element algorithm every SQL engine hides under ORDER BY /
quantile_cont when the column does not fit one machine).

Plan, all streaming passes:

1. **Sample pass** — a hash-spread row sample brackets the target
   rank: ``[lo, hi]`` are sample quantiles a DKW-style margin either
   side of q, so with overwhelming probability the true k-th element
   lies inside.
2. **Count pass** — one ``map_batches`` emits per-block
   ``(n_below_lo, n_in_range, n_total)`` partials (three ints per
   block). If the bracket missed (pathological sample), it widens to
   the whole range and retries — never wrong, only slower.
3. **Narrow / collect** — while the in-range count exceeds
   ``collect_budget``, one histogram pass over ``[lo, hi]`` (64
   equal-width bins, per-block ``np.bincount`` partials) shrinks the
   bracket to the bin containing the target rank; a bracket that can
   no longer shrink (massive ties: lo == hi as doubles) IS the
   answer. Finally the surviving in-range values — bounded by the
   budget — are collected and the exact k-th / k+1-th elements
   interpolated with ``np.quantile``-compatible (quantile_cont)
   linear interpolation.

Each pass ships O(blocks) or O(blocks × bins) scalars; row data never
moves. Pass count is 2 + O(log_64(spread)) in the worst case, 3 for
typical distributions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _column(t: pa.Table, col: str) -> np.ndarray:
    x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
    return x[~np.isnan(x)]


def exact_global_quantile(ds, col: str, q: float, id_col: str | None = None,
                          sample_cap: int = 65536,
                          collect_budget: int = 1 << 20,
                          max_narrow: int = 24) -> float:
    """Exact ``quantile_cont(col, q)`` (linear interpolation between
    the floor/ceil rank elements, == ``np.quantile`` default) over the
    whole dataset. NaNs are ignored, matching SQL aggregate semantics.
    """
    if not (0.0 <= q <= 1.0):
        raise ValueError("q must be in [0, 1]")

    # selection is multi-pass (extent + sample + count(s) + collect):
    # pin the input blocks once so a lazy upstream read is not
    # re-executed per pass (ref-copy no-op when already materialized)
    ds = ds.materialize()

    # ---- total count + global min/max (one pass)
    def extent(t: pa.Table) -> pa.Table:
        x = _column(t, col)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "mn": pa.array([float(x.min()) if len(x) else np.inf]),
            "mx": pa.array([float(x.max()) if len(x) else -np.inf]),
        })

    ext = ds.map_batches(extent, batch_format="pyarrow").to_pandas()
    n = int(ext["n"].sum())
    if n == 0:
        return float("nan")
    lo_all, hi_all = float(ext["mn"].min()), float(ext["mx"].max())
    # target ranks for linear interpolation: value = v[f] + frac*(v[f+1]-v[f])
    pos = q * (n - 1)
    f = int(np.floor(pos))
    frac = pos - f
    need = {f, min(f + 1, n - 1)}

    # ---- sample-guided initial bracket
    def spread(t: pa.Table) -> pa.Table:
        x = _column(t, col)
        if len(x) == 0:
            return pa.table({"v": pa.array([], pa.float64())})
        # hash the value BITS (not block positions — those repeat per
        # block and would bias a position-correlated layout)
        h = (x.view(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
        keep = h < np.uint64(max(1, int((1 << 32) * min(
            1.0, 4.0 * sample_cap / max(n, 1)))))
        return pa.table({"v": pa.array(x[keep], pa.float64())})

    sample = (ds.map_batches(spread, batch_format="pyarrow")
              .limit(sample_cap).to_pandas()["v"].to_numpy())
    if len(sample):
        margin = 2.0 / np.sqrt(len(sample)) + 1e-3  # DKW-ish rank slack
        lo = float(np.quantile(sample, max(0.0, q - margin)))
        hi = float(np.quantile(sample, min(1.0, q + margin)))
    else:
        lo, hi = lo_all, hi_all

    def count_pass(lo_v: float, hi_v: float):
        def part(t: pa.Table) -> pa.Table:
            x = _column(t, col)
            return pa.table({
                "below": pa.array([int((x < lo_v).sum())], pa.int64()),
                "inr": pa.array(
                    [int(((x >= lo_v) & (x <= hi_v)).sum())], pa.int64()),
            })

        p = ds.map_batches(part, batch_format="pyarrow").to_pandas()
        return int(p["below"].sum()), int(p["inr"].sum())

    below, inr = count_pass(lo, hi)
    if not (below <= f and max(need) < below + inr):
        lo, hi = lo_all, hi_all          # sample bracket missed: widen
        below, inr = count_pass(lo, hi)

    # ---- histogram narrowing while too many rows survive
    for _ in range(max_narrow):
        if inr <= collect_budget or not (hi > lo):
            break
        edges = np.linspace(lo, hi, 65)

        def hist(t: pa.Table) -> pa.Table:
            x = _column(t, col)
            x = x[(x >= lo) & (x <= hi)]
            idx = np.clip(np.searchsorted(edges, x, side="right") - 1,
                          0, 63)
            return pa.table({
                "b": pa.array(np.arange(64, dtype=np.int64)),
                "c": pa.array(np.bincount(idx, minlength=64), pa.int64()),
            })

        hp = (ds.map_batches(hist, batch_format="pyarrow").to_pandas()
              .groupby("b")["c"].sum())
        cum = below
        new = None
        for b in range(64):
            c = int(hp.get(b, 0))
            if cum <= min(need) and max(need) < cum + c:
                new = (float(edges[b]), float(edges[b + 1]), cum)
                break
            cum += c
        if new is None:          # ranks straddle a bin edge: keep pair
            # fall back to collecting the two bins around rank f
            break
        nlo, nhi, nbelow = new
        if nlo == lo and nhi == hi:
            break                # cannot shrink further (ties)
        lo, hi, below = nlo, nhi, nbelow
        below, inr = count_pass(lo, hi)

    # ---- collect the bounded in-range values and select exactly
    def keep(t: pa.Table) -> pa.Table:
        x = _column(t, col)
        return pa.table({"v": pa.array(x[(x >= lo) & (x <= hi)],
                                       pa.float64())})

    vals = np.sort(
        ds.map_batches(keep, batch_format="pyarrow").to_pandas()["v"]
        .to_numpy())
    vf = vals[f - below]
    vc = vals[min(f + 1, n - 1) - below]
    return float(vf + frac * (vc - vf))


def equi_depth_bins(ds, col: str, nbins: int, out_col: str = "bin",
                    **quantile_kwargs):
    """Equi-depth (quantile) bucketing — the feature-engineering
    discretizer: append ``out_col`` = index of the quantile bucket
    each row's ``col`` value falls in (0 .. nbins-1), with boundaries
    the exact global ``quantile_cont(col, i/nbins)`` order statistics.

    Plan: the ``nbins - 1`` interior boundaries come from
    ``exact_global_quantile`` (distributed selection — O(blocks)
    scalars per pass, no global sort); assignment is then one
    stateless ``map_batches`` with the tiny boundary vector in the
    closure: ``bin = searchsorted(boundaries, x, side='left')`` ==
    the number of boundaries strictly below x, which is exactly
    ``sum(CASE WHEN x > b_i)`` in SQL — ties at a boundary all land in
    the LOWER bucket on both sides.  NaN/null values get bin = -1.

    Boundary-count note: each boundary costs ~3 streaming passes, so
    this is meant for the usual 4-100 buckets; for hundreds of
    buckets use ``sketch.approx_grouped_quantiles``' sampled variant.
    With an integer-valued column and ``nbins`` a power of two the
    interpolation arithmetic is exact in float64 on both the numpy
    and SQL sides (pos = q*(n-1) and frac are exact binaries), making
    the oracle bit-exact — the pinning used by
    ``__ray_entry__.bin_quantity_equidepth``.
    """
    if nbins < 2:
        raise ValueError("nbins must be >= 2")
    ds = ds.materialize()   # nbins-1 selections share one read
    bounds = np.array([
        exact_global_quantile(ds, col, i / nbins, **quantile_kwargs)
        for i in range(1, nbins)
    ])

    def assign(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(bounds, x, side="left").astype(np.int32)
        b[np.isnan(x)] = -1
        return t.append_column(out_col, pa.array(b, pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow"), bounds


def winsorize(ds, col: str, q_lo: float = 0.125, q_hi: float = 0.875,
              out_col: str | None = None, **quantile_kwargs):
    """Winsorization (outlier clipping) of ``col`` to its exact global
    ``[quantile_cont(q_lo), quantile_cont(q_hi)]`` — the standard
    robust-preprocessing step before training on heavy-tailed
    features.

    Plan: the two bounds come from ``exact_global_quantile``
    (distributed selection, O(blocks) scalars per pass); clipping is
    then one stateless vectorized ``map_batches`` with the two floats
    in the closure. Appends ``out_col`` (default ``col + '_w'``) and
    a ``clipped`` int8 flag (-1 clipped low, 1 clipped high, 0 kept)
    so downstream audits can count interventions without re-deriving
    the bounds.

    Exactness: with an integer-valued column and binary-fraction
    quantiles (0.125/0.875 defaults) the interpolated bounds and every
    clipped value are exact in float64, so a SQL oracle using the same
    interpolation identity folds bit-equal (the
    ``equi_depth_bins`` pinning convention).
    """
    if not (0.0 <= q_lo < q_hi <= 1.0):
        raise ValueError("need 0 <= q_lo < q_hi <= 1")
    ds = ds.materialize()   # both selections share one read
    lo = exact_global_quantile(ds, col, q_lo, **quantile_kwargs)
    hi = exact_global_quantile(ds, col, q_hi, **quantile_kwargs)
    out = out_col or (col + "_w")

    def clip(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        flag = np.zeros(len(x), dtype=np.int8)
        flag[x < lo] = -1
        flag[x > hi] = 1
        t = t.append_column(out, pa.array(np.clip(x, lo, hi), pa.float64()))
        return t.append_column("clipped", pa.array(flag, pa.int8()))

    return ds.map_batches(clip, batch_format="pyarrow"), (lo, hi)
