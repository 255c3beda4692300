"""Dataset profiling: per-column summary statistics in one streaming
pass — the ``describe()`` every engine ships for data validation and
drift checks before a training run.

Scale shape: each block emits ONE partial row per profiled column
(count, null count, Σx, Σx², min, max) — the exchange is
O(blocks × columns), never O(rows) — and the driver folds those
metadata-sized partials. Mean and population std derive from the
folded sums with the textbook one-pass identities, written so a SQL
oracle can mirror the exact operand order (``sum(x*x)/n - m*m``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _block_partials(columns: list[str]):
    def part(t: pa.Table) -> pa.Table:
        names, n, n_null, s, s2, mn, mx = [], [], [], [], [], [], []
        for c in columns:
            v = t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            null = np.isnan(v)
            x = v[~null]
            names.append(c)
            n.append(len(x))
            n_null.append(int(null.sum()))
            s.append(float(x.sum()) if len(x) else 0.0)
            s2.append(float((x * x).sum()) if len(x) else 0.0)
            mn.append(float(x.min()) if len(x) else np.nan)
            mx.append(float(x.max()) if len(x) else np.nan)
        return pa.table({
            "column": pa.array(names),
            "n": pa.array(n, pa.int64()),
            "n_null": pa.array(n_null, pa.int64()),
            "s": pa.array(s, pa.float64()),
            "s2": pa.array(s2, pa.float64()),
            "mn": pa.array(mn, pa.float64()),
            "mx": pa.array(mx, pa.float64()),
        })

    return part


def dataset_profile(ds, columns: list[str]) -> pd.DataFrame:
    """-> one row per column: ``(column, n, n_null, mean, std, min,
    max)`` with std the POPULATION standard deviation. The driver only
    ever sees O(blocks × columns) partial rows."""
    parts = ds.map_batches(
        _block_partials(columns), batch_format="pyarrow"
    ).to_pandas()
    rows = []
    for c in columns:
        g = parts[parts["column"] == c]
        n = int(g["n"].sum())
        n_null = int(g["n_null"].sum())
        s = float(g["s"].sum())
        s2 = float(g["s2"].sum())
        if n:
            mean = s / n
            var = s2 / n - mean * mean
            std = float(np.sqrt(max(var, 0.0)))
            mn = float(g["mn"].min())
            mx = float(g["mx"].max())
        else:
            mean = std = mn = mx = float("nan")
        rows.append((c, n, n_null, mean, std, mn, mx))
    return pd.DataFrame(
        rows, columns=["column", "n", "n_null", "mean", "std", "min", "max"]
    )


def numeric_histogram(ds, col: str, lo: float, width: float,
                      nbins: int) -> pd.DataFrame:
    """Fixed-width histogram of a numeric column in one streaming
    pass.  Each block emits at most ``nbins`` partial rows
    (``np.bincount`` locally), so the exchange is O(blocks × nbins)
    regardless of row count.  Out-of-range values clamp into the
    first/last bin (``LEAST/GREATEST`` semantics a SQL oracle can
    mirror exactly: ``floor((x - lo) / width)`` on identical
    doubles).  -> ``(bin, lo, hi, n)``, one row per non-empty bin.
    """

    def part(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        idx = np.clip(np.floor((x - lo) / width), 0, nbins - 1).astype(np.int64)
        counts = np.bincount(idx, minlength=nbins)
        return pa.table({
            "bin": pa.array(np.arange(nbins, dtype=np.int64)),
            "n": pa.array(counts, pa.int64()),
        })

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("bin", as_index=False)["n"].sum()
    agg = agg[agg["n"] > 0].reset_index(drop=True)
    b = agg["bin"].to_numpy(dtype=np.float64)
    return pd.DataFrame({
        "bin": agg["bin"].astype("int64"),
        "lo": lo + b * width,
        "hi": lo + (b + 1.0) * width,
        "n": agg["n"].astype("int64"),
    })


def grouped_zscore(ds, key: str, col: str, out_col: str = "z",
                   ddof: int = 1):
    """Per-group standardization: ``z = (x - mean_g) / std_g`` with
    the SAMPLE std (ddof=1), as a two-pass streaming transform.

    Pass 1 folds per-block grouped (n, Σx, Σx²) partials into an
    O(keys) stats table on the driver; pass 2 broadcasts it once via
    ``ray.put`` and maps every batch (no shuffle of the rows
    themselves — the wide exchange a naive groupby+join would pay is
    avoided entirely).  Variance uses the explicit operand order
    ``(Σx² - Σx·Σx/n) / (n - ddof)`` so a SQL oracle computing the
    same expression on integer-valued columns (exact sums below 2^53)
    is bit-identical.  Groups with n <= ddof or zero variance emit
    NaN.  For key cardinalities beyond broadcast reach (~10^8) use
    ``ops.joins.hash_join`` against the stats table instead.
    """
    import ray

    def part(t: pa.Table) -> pa.Table:
        df = t.select([key, col]).to_pandas()
        v = df[col].astype(np.float64)
        g = df.groupby(key, sort=False)
        out = pd.DataFrame({
            "n": g[col].count(),
            "s": g[col].sum().astype(np.float64),
            "s2": (v * v).groupby(df[key], sort=False).sum(),
        }).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(key, as_index=False).sum()
    n = agg["n"].to_numpy(dtype=np.float64)
    s = agg["s"].to_numpy()
    s2 = agg["s2"].to_numpy()
    mean = s / n
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (s2 - s * s / n) / (n - ddof)
        std = np.sqrt(var)
    std = np.where((n > ddof) & (var > 0), std, np.nan)
    idx = pd.Index(agg[key])
    stats_ref = ray.put((idx, mean, std))

    def apply(t: pa.Table) -> pa.Table:
        kidx, means, stds = ray.get(stats_ref)
        keys = t.column(key).to_pandas()
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        # vectorized hash lookup (Index.get_indexer), no per-row lambda
        pos = kidx.get_indexer(keys)
        m = np.where(pos >= 0, means[pos], np.nan)
        sd = np.where(pos >= 0, stds[pos], np.nan)
        return t.append_column(out_col, pa.array((x - m) / sd, pa.float64()))

    return ds.map_batches(apply, batch_format="pyarrow")


def grouped_minmax(ds, key: str, col: str, out_col: str = "scaled"):
    """Per-group min-max scaling: ``(x - min_g) / (max_g - min_g)``
    — the feature-prep normalization next to :func:`grouped_zscore`,
    and the same two-pass streaming shape: pass 1 folds per-block
    grouped (min, max) partials into an O(keys) stats table, pass 2
    broadcasts it once (``ray.put``) and maps every batch — the rows
    themselves never shuffle.  min/max fold exactly (no float
    accumulation error at any scale), and the single division
    mirrors SQL's ``(x - min) OVER w / (max - min) OVER w`` operand
    order bit-for-bit.  Constant groups (max == min) emit NaN.
    For key cardinalities beyond broadcast reach use
    ``ops.joins.hash_join`` against the stats table instead."""
    import ray

    def part(t: pa.Table) -> pa.Table:
        df = t.select([key, col]).to_pandas()
        g = df.groupby(key, sort=False)[col]
        out = pd.DataFrame({"mn": g.min().astype(np.float64),
                            "mx": g.max().astype(np.float64)}).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(key, as_index=False).agg(
        mn=("mn", "min"), mx=("mx", "max"))
    idx = pd.Index(agg[key])
    mn = agg["mn"].to_numpy()
    mx = agg["mx"].to_numpy()
    stats_ref = ray.put((idx, mn, mx))

    def apply(t: pa.Table) -> pa.Table:
        kidx, mns, mxs = ray.get(stats_ref)
        keys = t.column(key).to_pandas()
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        pos = kidx.get_indexer(keys)
        lo = np.where(pos >= 0, mns[pos], np.nan)
        hi = np.where(pos >= 0, mxs[pos], np.nan)
        with np.errstate(invalid="ignore", divide="ignore"):
            scaled = (x - lo) / (hi - lo)
        return t.append_column(out_col, pa.array(scaled, pa.float64()))

    return ds.map_batches(apply, batch_format="pyarrow")


def grouped_mad(ds, key: str, col: str, coarse: int = 64):
    """Per-group median and MAD (median absolute deviation,
    ``median(|x - median(x)|)``) — the robust location/scale pair an
    outlier gate uses when means/stds are poisoned by the outliers
    themselves.

    Exact quantiles need each key's values co-located, so this is ONE
    bucketed shuffle (hash(key) % coarse — scheduling per bucket, not
    per key, the many-keys-per-call pattern); both statistics of a
    key come from its group in the same task, so there is no second
    pass and no broadcast.  Interpolation is ``np.quantile`` linear ==
    SQL ``quantile_cont``.  -> Dataset(key, n, med, mad).
    """
    from raykg.util import hash_strings

    def add_bucket(t: pa.Table) -> pa.Table:
        c = t.column(key)
        if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
            b = hash_strings(c.to_pylist()) % coarse
        else:
            b = (c.to_numpy(zero_copy_only=False).astype(np.uint64)
                 * np.uint64(2654435761)) % np.uint64(coarse)
        return t.append_column("_b", pa.array(b.astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, v in g.groupby(key)[col]:
            a = v.to_numpy(dtype=np.float64)
            med = float(np.quantile(a, 0.5))
            mad = float(np.quantile(np.abs(a - med), 0.5))
            rows.append((k, len(a), med, mad))
        return pd.DataFrame(rows, columns=[key, "n", "med", "mad"])

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(add_bucket, batch_format="pyarrow"), "_b",
        coarse, per_bucket)


def grouped_entropy(ds, key: str, col: str) -> pd.DataFrame:
    """Shannon entropy (nats) of ``col``'s value distribution per
    ``key`` group — the domain/topic-diversity statistic a corpus
    audit computes per source (e.g. per-user event-type diversity,
    per-domain language spread).

    One streaming pass: each block pre-counts its (key, value) pairs
    (`groupby.size`, exact integers), so the exchange is
    O(blocks × distinct pairs per block) — the Zipf-head bound, never
    O(rows).  The driver folds the integer counts exactly, then per
    key computes ``H = ln(n) - (Σ c·ln c)/n`` with the Σ as an
    explicit LEFT fold in value-ascending order using libm ``log``
    (``math.log``, not numpy's vectorized log which can differ by
    1 ulp) — bit-identical to a DuckDB oracle folding
    ``list(c ORDER BY value)`` through ``list_sum``, so the checked
    query needs NO rounding anywhere.  Driver work is O(distinct
    pairs); for key cardinalities beyond driver reach, route the
    count table through the many-keys-per-call bucket pattern
    (`ops/rank.py`) instead.
    -> ``(key, n, n_distinct, entropy)``.
    """
    import math

    def part(t: pa.Table) -> pa.Table:
        df = t.select([key, col]).to_pandas()
        out = (df.groupby([key, col], sort=False).size()
                 .rename("c").reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    counts = parts.groupby([key, col], as_index=False)["c"].sum()
    counts = counts.sort_values([key, col], kind="mergesort")
    logmemo: dict = {}
    rows = []
    for k, g in counts.groupby(key, sort=True):
        n = int(g["c"].sum())
        acc = 0.0
        for c in g["c"]:  # value-ascending left fold, libm log
            x = float(c)
            term = logmemo.get(c)
            if term is None:
                term = logmemo[c] = x * math.log(x)
            acc += term
        rows.append((k, n, int(len(g)),
                     math.log(float(n)) - acc / float(n)))
    return pd.DataFrame(rows, columns=[key, "n", "n_distinct", "entropy"])


def grouped_corr(ds, key: str, x: str, y: str) -> pd.DataFrame:
    """Pearson correlation of ``x`` vs ``y`` per ``key`` group, from
    one streaming pass of per-block partials (n, Σx, Σy, Σxy, Σx²,
    Σy²) — the textbook distributed-corr fold; the exchange is
    O(blocks × keys). Population (not sample) moments, written with
    the same operand order a SQL oracle can mirror:
    (Σxy/n − mx·my) / sqrt((Σx²/n − mx²)(Σy²/n − my²))."""

    def part(t: pa.Table) -> pa.Table:
        df = t.select([key, x, y]).to_pandas()
        g = df.groupby(key, sort=False)
        vx, vy = df[x].astype(np.float64), df[y].astype(np.float64)
        out = pd.DataFrame({
            "n": g[x].count(),
            "sx": g[x].sum().astype(np.float64),
            "sy": g[y].sum().astype(np.float64),
            "sxy": (vx * vy).groupby(df[key], sort=False).sum(),
            "sxx": (vx * vx).groupby(df[key], sort=False).sum(),
            "syy": (vy * vy).groupby(df[key], sort=False).sum(),
        }).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(key, as_index=False).sum()
    n = agg["n"].to_numpy(dtype=np.float64)
    mx = agg["sx"].to_numpy() / n
    my = agg["sy"].to_numpy() / n
    cov = agg["sxy"].to_numpy() / n - mx * my
    vx = agg["sxx"].to_numpy() / n - mx * mx
    vy = agg["syy"].to_numpy() / n - my * my
    denom = np.sqrt(vx * vy)
    corr = np.where(denom > 0, cov / denom, np.nan)
    return pd.DataFrame({key: agg[key], "n": agg["n"].astype("int64"),
                         "corr": corr})


def grouped_ols(ds, key: str, x: str, y: str) -> pd.DataFrame:
    """Per-key simple linear regression (``y ~ x``) from the same
    one-pass moment partials as :func:`grouped_corr` — the distributed
    ``regr_slope`` / ``regr_intercept``. Exchange is O(blocks × keys);
    slope = (Σxy/n − mx·my) / (Σx²/n − mx²), intercept = my − slope·mx,
    operand order written so a SQL oracle over raw sums mirrors it
    bit-for-bit when the columns are exact-integer-valued (the
    test-SF convention established by ``dataset_profile``)."""

    def part(t: pa.Table) -> pa.Table:
        df = t.select([key, x, y]).to_pandas()
        g = df.groupby(key, sort=False)
        vx, vy = df[x].astype(np.float64), df[y].astype(np.float64)
        out = pd.DataFrame({
            "n": g[x].count(),
            "sx": g[x].sum().astype(np.float64),
            "sy": g[y].sum().astype(np.float64),
            "sxy": (vx * vy).groupby(df[key], sort=False).sum(),
            "sxx": (vx * vx).groupby(df[key], sort=False).sum(),
        }).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(key, as_index=False).sum()
    n = agg["n"].to_numpy(dtype=np.float64)
    mx = agg["sx"].to_numpy() / n
    my = agg["sy"].to_numpy() / n
    cov = agg["sxy"].to_numpy() / n - mx * my
    vx = agg["sxx"].to_numpy() / n - mx * mx
    slope = np.where(vx > 0, cov / np.where(vx > 0, vx, 1.0), np.nan)
    intercept = my - slope * mx
    return pd.DataFrame({key: agg[key], "n": agg["n"].astype("int64"),
                         "slope": slope, "intercept": intercept})


def storage_profile(paths) -> pd.DataFrame:
    """Physical-layout audit of a parquet dataset from METADATA ONLY —
    per column: compressed/uncompressed bytes, value count, null
    count, row-group count — the first thing to read before tuning a
    100 TB layout (is the hot column dictionary-compressed? did one
    writer emit a single giant row group that caps read parallelism —
    the round-2 headline bug this repo fixed?).

    No row data is read: each task opens its fragment's FOOTER
    (``pyarrow.parquet.ParquetFile.metadata``) and emits one partial
    row per column; fan-out is a Dataset over the file list, so a
    million-fragment corpus profiles in one streaming pass of footer
    reads. -> (column, n_values, n_nulls, compressed_bytes,
    uncompressed_bytes, n_row_groups, n_files).
    """
    import pyarrow.parquet as pq

    import ray.data as rd

    if isinstance(paths, str):
        import os

        if os.path.isdir(paths):
            paths = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith(".parquet"))
        else:
            paths = [paths]

    def footer(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for path in batch["path"]:
            md = pq.ParquetFile(path).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    rows.append((
                        ".".join(c.path_in_schema.split(".")),
                        c.num_values,
                        (c.statistics.null_count
                         if c.statistics is not None
                         and c.statistics.has_null_count else 0),
                        c.total_compressed_size,
                        c.total_uncompressed_size,
                        1, path,
                    ))
        return pd.DataFrame(rows, columns=[
            "column", "n_values", "n_nulls", "compressed_bytes",
            "uncompressed_bytes", "n_row_groups", "path"])

    parts = (rd.from_items([{"path": p} for p in paths])
             .map_batches(footer, batch_format="pandas").to_pandas())
    agg = parts.groupby("column", as_index=False).agg(
        n_values=("n_values", "sum"),
        n_nulls=("n_nulls", "sum"),
        compressed_bytes=("compressed_bytes", "sum"),
        uncompressed_bytes=("uncompressed_bytes", "sum"),
        n_row_groups=("n_row_groups", "sum"),
        n_files=("path", "nunique"),
    )
    return agg.sort_values("column").reset_index(drop=True)


def chi2_contingency(ds, col_a: str, col_b: str) -> pd.DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, plus Cramér's V — the feature-selection / drift-detection
    association measure.

    Scale shape: one streaming pass of per-block (a, b, n) pre-counts
    (the ``numeric_histogram`` bound — each block ships at most
    |A| x |B| cell partials, never rows); the fold and the chi-square
    sum run on the CELL GRID, which is category-cardinality-sized by
    definition of "categorical" (drift columns, languages, sources —
    not ids).

    Exactness: observed counts and marginals are exact int64; expected
    ``e = (r * c) / n`` and each term ``((o - e) * (o - e)) / e``
    evaluate in DOUBLE with pinned operand order, INCLUDING
    zero-observed grid cells (which contribute ``e``), and the sum
    folds in (a, b)-sorted order — a DuckDB oracle reproduces the
    double bit-for-bit via ``list_sum(list(term ORDER BY a, b))`` over
    the cross-joined category grid. Output rounds half-up to 1e-6.
    -> one row ``(n, dof, chi2, cramers_v)``."""

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "a": t.column(col_a).to_pandas(),
            "b": t.column(col_b).to_pandas(),
        })
        g = df.groupby(["a", "b"], sort=False).size().rename("n")
        return pa.Table.from_pandas(g.reset_index(),
                                    preserve_index=False)

    cells = (ds.map_batches(part, batch_format="pyarrow")
             .to_pandas()
             .groupby(["a", "b"], as_index=False)["n"].sum())
    n = int(cells["n"].sum())
    ra = cells.groupby("a")["n"].sum()          # row marginals
    cb = cells.groupby("b")["n"].sum()          # col marginals
    # full grid including zero-observed cells, (a, b)-sorted fold
    grid = pd.MultiIndex.from_product(
        [ra.index.sort_values(), cb.index.sort_values()],
        names=["a", "b"])
    obs = cells.set_index(["a", "b"])["n"].reindex(
        grid, fill_value=0).reset_index()
    chi2 = 0.0
    for r in obs.itertuples():
        e = (float(ra[r.a]) * float(cb[r.b])) / float(n)
        o = float(r.n)
        chi2 += ((o - e) * (o - e)) / e
    ka, kb = len(ra), len(cb)
    dof = (ka - 1) * (kb - 1)
    v = float(np.sqrt(chi2 / (n * min(ka - 1, kb - 1)))) \
        if dof > 0 and n > 0 else float("nan")
    return pd.DataFrame({
        "n": [n], "dof": [dof],
        "chi2": [np.floor(chi2 * 1e6 + 0.5) / 1e6],
        "cramers_v": [np.floor(v * 1e6 + 0.5) / 1e6],
    })


def cohens_kappa(ds, col_a: str, col_b: str) -> pd.DataFrame:
    """Cohen's kappa — chance-corrected agreement between two
    categorical label columns (two annotators, or model vs heuristic
    labels in a curation loop):

        kappa = (p_o - p_e) / (1 - p_e)

    with ``p_o`` the observed agreement rate and ``p_e`` the
    marginal-product chance rate. Reuses the ``chi2_contingency``
    cell-partial shape: one streaming pass of per-block (a, b)
    pre-counts, then a category-grid-sized fold.

    Exactness: agreement and marginal counts are exact int64;
    ``p_e``'s sum of marginal products folds in category-sorted order
    as exact INTEGERS (sum of r_i * c_i) so both sides divide the same
    two exact ints by ``n*n`` — p_o, p_e and kappa are three float
    divisions with pinned operand order, rounded half-up 1e-6.
    -> one row ``(n, agree, p_o, p_e, kappa)``."""

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "a": t.column(col_a).to_pandas(),
            "b": t.column(col_b).to_pandas(),
        })
        g = df.groupby(["a", "b"], sort=False).size().rename("n")
        return pa.Table.from_pandas(g.reset_index(),
                                    preserve_index=False)

    cells = (ds.map_batches(part, batch_format="pyarrow")
             .to_pandas()
             .groupby(["a", "b"], as_index=False)["n"].sum())
    n = int(cells["n"].sum())
    agree = int(cells.loc[cells["a"] == cells["b"], "n"].sum())
    ra = cells.groupby("a")["n"].sum()
    cb = cells.groupby("b")["n"].sum()
    labels = sorted(set(ra.index) | set(cb.index))
    pe_num = 0
    for lab in labels:                       # exact integer fold
        pe_num += int(ra.get(lab, 0)) * int(cb.get(lab, 0))
    p_o = agree / n if n else float("nan")
    p_e = pe_num / (n * n) if n else float("nan")
    kappa = (p_o - p_e) / (1.0 - p_e) if n and p_e != 1.0 else float("nan")
    return pd.DataFrame({
        "n": [n], "agree": [agree],
        "p_o": [np.floor(p_o * 1e6 + 0.5) / 1e6],
        "p_e": [np.floor(p_e * 1e6 + 0.5) / 1e6],
        "kappa": [np.floor(kappa * 1e6 + 0.5) / 1e6],
    })


def grouped_ttest(ds, key: str, arm_col: str, val_col: str) -> pd.DataFrame:
    """Welch's two-sample t-test per ``key`` between the two arms of
    ``arm_col`` — the A/B experiment readout ("did the treatment move
    the metric for this segment?").  ``arm_col`` must take exactly two
    values per key; arms are ordered ascending (a = smaller label).

    Scale shape: one streaming pass of per-block (key, arm) moment
    partials (n, Σx, Σx²) — O(blocks × keys × 2) exchange, never
    O(rows); with integer-valued ``val_col`` the partials fold as
    EXACT int64 and every output is one float expression over exact
    ints, mirrored operand-for-operand by a SQL oracle (sample
    variance ``(Σx² − Σx·Σx/n)/(n−1)``, Welch se, t, and the
    Welch–Satterthwaite df) — bit-exact, no rounding.
    -> (key, n_a, n_b, mean_a, mean_b, t_stat, df).
    """

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t.column(key).to_pandas(),
            "a": t.column(arm_col).to_pandas(),
            "x": t.column(val_col).to_numpy(zero_copy_only=False)
                 .astype(np.int64),
        })
        df["xx"] = df["x"] * df["x"]
        g = df.groupby(["k", "a"], sort=False).agg(
            n=("x", "size"), s=("x", "sum"), ss=("xx", "sum"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(["k", "a"], as_index=False).sum()
    agg = agg.sort_values(["k", "a"], kind="mergesort")
    rows = []
    for k, g in agg.groupby("k", sort=True):
        if len(g) != 2:
            raise ValueError(f"key {k!r} has {len(g)} arms, need 2")
        (n1, s1, ss1), (n2, s2, ss2) = (
            (float(r.n), float(r.s), float(r.ss)) for r in g.itertuples())
        # every operand converted to double FIRST (exact for ints
        # < 2^53), then pure IEEE ops in the order the SQL mirror uses
        m1 = s1 / n1
        m2 = s2 / n2
        if n1 < 2.0 or n2 < 2.0:   # no sample variance -> undefined
            rows.append((k, int(n1), int(n2), m1, m2,
                         float("nan"), float("nan")))
            continue
        v1 = (ss1 - s1 * s1 / n1) / (n1 - 1.0)
        v2 = (ss2 - s2 * s2 / n2) / (n2 - 1.0)
        se1 = v1 / n1
        se2 = v2 / n2
        se = se1 + se2
        if se == 0.0:              # both arms constant -> undefined
            rows.append((k, int(n1), int(n2), m1, m2,
                         float("nan"), float("nan")))
            continue
        t_stat = (m1 - m2) / math.sqrt(se)
        df_w = (se * se) / (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0))
        rows.append((k, int(n1), int(n2), m1, m2, t_stat, df_w))
    out = pd.DataFrame(rows, columns=[key, "n_a", "n_b", "mean_a",
                                      "mean_b", "t_stat", "df"])
    return out.astype({"n_a": "int64", "n_b": "int64"})


def grouped_gini(ds, key: str, val_col: str, coarse: int = 64):
    """Gini coefficient of ``val_col``'s distribution per ``key`` —
    the inequality/concentration statistic ("how skewed is spend
    across this customer's orders", "how concentrated is traffic over
    hosts"), the scalar companion to :func:`raykg.ops.rank
    .pareto_coverage`'s cutoff set.

    Definition (ascending sort, 1-based rank i):
    ``G = 2·Σ(i·x) / (n·Σx) − (n+1)/n`` — invariant to tie order
    (within a tied block Σi is fixed), so a SQL ``row_number()``
    oracle matches regardless of its tie-break.

    Scale shape: values co-locate by key hash (one exchange — the
    sessionize shape); each bucket task sorts once and computes every
    key's rank-weighted sum vectorized (factorize + segmented
    cumcount), all in EXACT int64 for integer values, then one
    mirrored float expression.  -> Dataset(key, n, total, gini).
    """
    from raykg.ops.joins import _key_bucket

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t.column(key)))  # null keys drop,
        # matching the pandas-groupby siblings (they'd wrap factorize's
        # -1 codes into the last real key otherwise)
        return pa.table({
            "k": t.column(key),
            "x": t.column(val_col).cast(pa.int64()),
            "_b": _key_bucket(t.column(key), coarse),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["k", "x"], kind="stable")
        codes, uniq = pd.factorize(df["k"], sort=False)
        i = df.groupby(codes, sort=False).cumcount().to_numpy() + 1
        x = df["x"].to_numpy(dtype=np.int64)
        # exact: i*x <= n*max(x), folded in int64 per key
        num = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(num, codes, i * x)
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tot, codes, x)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        nf = n.astype(np.float64)
        gini = (2.0 * num.astype(np.float64)) / (nf * tot.astype(np.float64)) \
            - (nf + 1.0) / nf
        return pd.DataFrame({key: uniq, "n": n, "total": tot, "gini": gini})

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(project, batch_format="pyarrow"), "_b",
        coarse, fold)


def target_encode_loo(ds, cat_col: str, target_col: str,
                      out_col: str = "te"):
    """Leave-one-out target encoding: each row's category is replaced
    by the mean target of the OTHER rows in that category,
    ``(Σy_g − y_i) / (n_g − 1)`` — the leakage-safe categorical
    feature every tabular training pipeline derives (plain mean
    encoding leaks the row's own label).

    Scale shape: the two-pass broadcast pattern (:func:`grouped_minmax`)
    — pass 1 folds O(categories) exact int64 (n, Σy) stats, pass 2
    broadcasts them once and maps every batch; rows never shuffle.
    With integer targets the numerator/denominator are exact ints and
    the single division mirrors SQL's
    ``(sum(y) OVER w − y) / (count(*) OVER w − 1)`` bit-for-bit.
    Singleton categories (n == 1) emit NaN — filter or smooth first.
    """
    import ray

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c": t.column(cat_col).to_pandas(),
            "y": t.column(target_col).to_numpy(zero_copy_only=False)
                 .astype(np.int64),
        })
        g = df.groupby("c", sort=False).agg(n=("y", "size"), s=("y", "sum"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("c", as_index=False).sum()
    idx = pd.Index(agg["c"])
    stats_ref = ray.put((idx, agg["n"].to_numpy(dtype=np.int64),
                         agg["s"].to_numpy(dtype=np.int64)))

    def apply(t: pa.Table) -> pa.Table:
        kidx, ns, ss = ray.get(stats_ref)
        pos = kidx.get_indexer(t.column(cat_col).to_pandas())
        y = t.column(target_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        known = pos >= 0        # null / unseen categories -> NaN
        n = np.where(known, ns[pos], 0)
        num = (np.where(known, ss[pos], 0) - y).astype(np.float64)
        den = (n - 1).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            te = np.where(known & (n > 1), num / den, np.nan)
        return t.append_column(out_col, pa.array(te, pa.float64()))

    return ds.map_batches(apply, batch_format="pyarrow")


def mutual_information(ds, col_a: str, col_b: str) -> pd.DataFrame:
    """Mutual information (nats) between two categorical columns —
    the feature-relevance / redundancy measure beside
    ``chi2_contingency`` (chi2 answers "dependent at all?"; MI
    answers "how many bits does one column carry about the other?" —
    the quantity feature selection and leakage audits rank by).

    ``MI = Σ_{observed (a,b)} (c/n)·ln( c·n / (r_a·r_b) )`` over the
    exact int64 cell grid (zero-observed cells contribute exactly 0
    and are excluded on both sides).  Scale shape: the
    ``chi2_contingency`` plan — per-block (a, b) pre-counts, so the
    exchange is O(blocks × |A|·|B|), category-cardinality-bounded by
    the "categorical" contract, never O(rows).  Every term is ONE
    float expression of exact ints (``c·n`` and ``r_a·r_b`` are exact
    BIGINT products) through libm ``log``, folded LEFT in
    (a, b)-ascending order — bit-identical to a DuckDB
    ``list_sum(list(term ORDER BY a, b))`` oracle, no rounding.
    -> one row ``(n, n_cells, mi)``.
    """
    import math

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "a": t.column(col_a).to_pandas(),
            "b": t.column(col_b).to_pandas(),
        })
        g = df.groupby(["a", "b"], sort=False).size().rename("c")
        return pa.Table.from_pandas(g.reset_index(),
                                    preserve_index=False)

    cells = (ds.map_batches(part, batch_format="pyarrow")
             .to_pandas()
             .groupby(["a", "b"], as_index=False)["c"].sum())
    n = int(cells["c"].sum())
    ra = cells.groupby("a")["c"].sum()
    rb = cells.groupby("b")["c"].sum()
    cells = cells.sort_values(["a", "b"], kind="mergesort")
    mi = 0.0
    for r in cells.itertuples():  # (a, b)-ascending left fold
        c = int(r.c)
        mi += (float(c) / float(n)) * math.log(
            float(c * n) / float(int(ra[r.a]) * int(rb[r.b])))
    return pd.DataFrame({"n": [n], "n_cells": [int(len(cells))],
                         "mi": [mi]})


def key_skew(ds, key: str, coarse: int = 64) -> pd.DataFrame:
    """Key-distribution skew report — the operational "does this key
    need salting?" diagnostic run before choosing a partitioning key:
    row count, distinct keys, the heaviest key's count and share, and
    the Herfindahl–Hirschman concentration index
    ``HHI = Σ (c_k/N)²`` (1/HHI is the effective number of uniformly
    loaded partitions a shuffle on this key would achieve).

    Scale shape: per-block (key, count) pre-counts, one key-bucket
    exchange (each key's partials co-locate, the exact-dedup combiner
    shape), per-bucket fold to FOUR integers (keys, rows, max, Σc²) —
    the driver merges O(buckets) rows. Null keys are excluded (they
    are not a shuffle key). Everything is exact int64 (Σc² needs
    c ≤ ~3e9 rows on one key before overflow — beyond that the key is
    the answer already); ``top1_share`` and ``hhi`` are each ONE
    float division of exact ints, so a SQL oracle mirrors bit-exact.
    -> one row ``(n_rows, n_keys, max_count, top1_share, hhi)``.
    """
    from raykg.ops.joins import _key_bucket

    def pre(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t.column(key)))
        df = pd.DataFrame({"k": t.column(key).to_pandas()})
        g = df.groupby("k", sort=False).size().rename("c").reset_index()
        tb = pa.Table.from_pandas(g, preserve_index=False)
        return tb.append_column("_b", _key_bucket(tb.column("k"), coarse))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("k", sort=False)["c"].sum()
        c = m.to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "n_keys": [np.int64(len(c))],
            "n_rows": [c.sum()],
            "max_count": [c.max() if len(c) else np.int64(0)],
            "sum_sq": [(c * c).sum()],
        })

    from raykg.ops.exchange import hash_exchange

    parts = hash_exchange(
        ds.map_batches(pre, batch_format="pyarrow"), "_b", coarse,
        fold).to_pandas()
    n = int(parts["n_rows"].sum())
    mx = int(parts["max_count"].max()) if len(parts) else 0
    ssq = int(parts["sum_sq"].sum())
    return pd.DataFrame({
        "n_rows": [n], "n_keys": [int(parts["n_keys"].sum())],
        "max_count": [mx],
        "top1_share": [float(mx) / float(n) if n else 0.0],
        "hhi": [float(ssq) / float(n * n) if n else 0.0],
    })


def cuped_adjust(ds, arm_col: str, x_col: str, y_col: str) -> pd.DataFrame:
    """CUPED variance-reduced A/B means (Deng et al., WSDM 2013
    "Improving the sensitivity of online controlled experiments"):
    per-arm means of the adjusted metric

        y' = y - theta * (x - mean(x)),   theta = cov(x, y) / var(x)

    where ``x`` is a PRE-experiment covariate and theta/mean(x) are
    pooled over all units. Input = one row per experiment unit with
    INTEGER x/y (cents convention).

    Scale shape: one streaming pass of per-block exact int64 partials
    (n, Σx, Σy, Σxy, Σx², and per-arm n/Σx/Σy) — the exchange is
    O(blocks × (arms + 1)), never O(units). Partials fold on the
    driver in PYTHON ints (arbitrary precision: n·Σxy etc. overflow
    int64 at corpus scale); every emitted statistic is ONE float
    expression over those exact integers, mirrored operand-for-operand
    by a HUGEINT-arithmetic SQL oracle. Constant x (var 0) -> theta 0
    (adjusted == raw, the standard degenerate-covariate convention).

    -> DataFrame(arm, n, mean_y, adj_mean_y) sorted by arm.
    """
    def part(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        arm = t.column(arm_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"arm": arm, "x": x, "y": y})
        g = df.groupby("arm", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"))

        def exact_sum(a: np.ndarray, b: np.ndarray) -> int:
            # int64 fast path unless Σ|a·b| could wrap; then Python
            # ints (the block partial must already be exact — the
            # driver fold can't repair a wrapped int64)
            mx = int(np.abs(a).max(initial=0))
            my = int(np.abs(b).max(initial=0))
            if mx * my * max(len(a), 1) < (1 << 62):
                return int((a * b).sum())
            return sum(int(av) * int(bv) for av, bv in zip(a, b))

        sxy, sxx = exact_sum(x, y), exact_sum(x, x)
        # block-level Σxy/Σx² ride in the FIRST arm row (only their
        # global sums are consumed); stored as decimal strings so a
        # huge block partial cannot wrap the int64 column either
        zeros = ["0"] * max(len(g) - 1, 0)
        return pa.table({
            "arm": pa.array(g["arm"]),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "sx": pa.array(g["sx"].to_numpy(np.int64)),
            "sy": pa.array(g["sy"].to_numpy(np.int64)),
            "sxy": pa.array(([str(sxy)] + zeros) if len(g) else [],
                            pa.string()),
            "sxx": pa.array(([str(sxx)] + zeros) if len(g) else [],
                            pa.string()),
        })

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"arm": [], "n": [], "mean_y": [],
                             "adj_mean_y": []})
    # pooled moments in Python ints (exact at any scale)
    n = int(parts["n"].sum())
    sx = int(parts["sx"].sum())
    sy = int(parts["sy"].sum())
    sxy = sum(int(v) for v in parts["sxy"])   # decimal strings
    sxx = sum(int(v) for v in parts["sxx"])
    cov_num = n * sxy - sx * sy          # n² · cov
    var_num = n * sxx - sx * sx          # n² · var
    theta = float(cov_num) / float(var_num) if var_num != 0 else 0.0
    mean_x = float(sx) / float(n)

    arms = parts.groupby("arm", as_index=False).agg(
        n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"))
    na = arms["n"].to_numpy(np.int64)
    mean_y = arms["sy"].to_numpy(np.int64).astype(np.float64) / na
    mean_xa = arms["sx"].to_numpy(np.int64).astype(np.float64) / na
    adj = mean_y - theta * (mean_xa - mean_x)
    out = pd.DataFrame({"arm": arms["arm"], "n": na,
                        "mean_y": mean_y, "adj_mean_y": adj})
    return out.sort_values("arm").reset_index(drop=True)


def grouped_geomean(ds, key: str, col: str) -> pd.DataFrame:
    """Geometric (and harmonic) mean of a POSITIVE integer column per
    key — the multiplicative-scale averages (growth rates, latency
    ratios, relevance scores) the arithmetic mean misrepresents.

    The grouped_entropy plan: per-block exact integer (key, value)
    pre-counts (Zipf-bounded exchange), then per key

        geomean  = exp( (Σ c·ln v) / n )      — value-ascending fold
        harmmean = n / (Σ c/v)                — same fold

    Both Σ are explicit LEFT folds in value-ascending order through
    libm ``math.log`` / plain division: equal terms are contiguous, so
    the fold is deterministic and bit-identical to a DuckDB oracle
    folding ``list(term ORDER BY value)`` through ``list_sum`` — no
    rounding anywhere. Non-positive values are DROPPED on both sides
    (the domain restriction of both means).
    -> (key, n, geomean, harmmean).
    """
    import math

    def part(t: pa.Table) -> pa.Table:
        df = t.select([key, col]).to_pandas()
        df = df[df[col] > 0]
        out = (df.groupby([key, col], sort=False).size()
               .rename("c").reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    counts = parts.groupby([key, col], as_index=False)["c"].sum()
    counts = counts.sort_values([key, col], kind="mergesort")
    rows = []
    for k, g in counts.groupby(key, sort=True):
        n = int(g["c"].sum())
        acc_ln = 0.0
        acc_inv = 0.0
        for v, c in zip(g[col], g["c"]):
            acc_ln += float(c) * math.log(float(v))
            acc_inv += float(c) / float(v)
        rows.append((k, n, math.exp(acc_ln / float(n)),
                     float(n) / acc_inv))
    return pd.DataFrame(rows, columns=[key, "n", "geomean", "harmmean"])


def grouped_weighted_mean(ds, key: str, val_col: str,
                          weight_col: str) -> pd.DataFrame:
    """Weighted mean per key over INTEGER values and weights:
    Σ(w·x) / Σw — both sums exact (int64 per-block partials escalated
    to Python ints at the fold, the cuped_adjust convention), the
    mean ONE mirrored float division; SQL = sum(w*x)::HUGEINT vs
    sum(w). Zero-total-weight keys are dropped on both sides.
    -> (key, n, sum_w, wmean) sorted by key.
    """
    def part(t: pa.Table) -> pa.Table:
        x = t.column(val_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        w = t.column(weight_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        kv = t.column(key).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"k": kv, "w": w, "wx": w * x})
        mx = int(np.abs(x).max(initial=0))
        mw = int(np.abs(w).max(initial=0))
        if mx * mw * max(len(x), 1) >= (1 << 62):  # exact fallback:
            # Python-int OBJECTS sum exactly through pandas groupby —
            # dtype=object is load-bearing (a bare list of big ints
            # infers uint64 and wraps again)
            df["wx"] = pd.Series(
                [int(a) * int(b) for a, b in zip(w, x)], dtype=object)
        g = df.groupby("k", as_index=False).agg(
            n=("w", "size"), sw=("w", "sum"), swx=("wx", "sum"))
        g["swx"] = g["swx"].map(str)   # decimal strings survive int64
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    rows = []
    for k, g in parts.groupby("k", sort=True):
        n = int(g["n"].sum())
        sw = int(g["sw"].sum())
        swx = sum(int(v) for v in g["swx"])
        if sw != 0:
            rows.append((k, n, sw, float(swx) / float(sw)))
    return pd.DataFrame(rows, columns=[key, "n", "sum_w", "wmean"])
