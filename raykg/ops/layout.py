"""Multi-dimensional data layout: Z-order (Morton) clustering of a
dataset on several columns — the OPTIMIZE ZORDER of lakehouse engines,
built so parquet zone maps (row-group min/max) stay selective on ALL
clustered columns at once. A plain sort makes one column's zone maps
perfect and leaves the others useless; bit interleaving bounds every
clustered column's per-block span at ~(block_fraction)^(1/ncols).

Plan:
  * one hash-spread sample per column picks EQUI-DEPTH code
    boundaries (2^bits quantile bins), so skewed columns still spread
    across the code space — min-max scaling would put 99% of a
    Zipf column in one code;
  * one stateless pass maps each row to its per-column codes
    (``searchsorted``) and interleaves bits into a single uint64 key
    (``bits × ncols ≤ 64``);
  * one range-partitioned distributed ``Dataset.sort`` on the key —
    the same scale-appropriate all-to-all as
    ``sample.deterministic_shuffle``.

Use ``storage_profile`` + ``block_extents`` (below) to audit the
result; pair with the resumable partitioned sink for the write.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _interleave(codes: list[np.ndarray], bits: int) -> np.ndarray:
    z = np.zeros(len(codes[0]), dtype=np.uint64)
    k = len(codes)
    for b in range(bits):
        for ci, c in enumerate(codes):
            z |= ((c >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * k + ci)
    return z


def zorder_sort(ds, cols: list[str], bits: int | None = None,
                sample_cap: int = 65536, keep_key: bool = False):
    """Return ``ds`` re-clustered in Z-order on ``cols`` (2-4 numeric
    columns). ``bits`` per column defaults to ``64 // ncols`` capped
    at 16 (65k equi-depth bins per column)."""
    from raykg.ops.sample import hash_spread_sample_rows

    if not 2 <= len(cols) <= 4:
        raise ValueError("zorder needs 2-4 columns")
    bits = bits or min(16, 64 // len(cols))
    if bits * len(cols) > 64:
        raise ValueError("bits * ncols must be <= 64")

    # sampled equi-depth boundaries per column (id column: first col)
    rows = hash_spread_sample_rows(ds.select_columns(cols), cols[0],
                                   sample_cap)
    sample = pd.DataFrame(rows)
    n_codes = 1 << bits
    bounds = {}
    for c in cols:
        v = sample[c].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        qs = np.linspace(0, 1, n_codes + 1)[1:-1]
        bounds[c] = np.unique(np.quantile(v, qs)) if len(v) else \
            np.array([], dtype=np.float64)

    def add_key(t: pa.Table) -> pa.Table:
        codes = []
        for c in cols:
            v = t.column(c).to_numpy(zero_copy_only=False).astype(
                np.float64)
            code = np.searchsorted(bounds[c], v, side="right").astype(
                np.uint64)
            code[np.isnan(v)] = np.uint64(n_codes - 1)   # NULLS LAST-ish
            codes.append(code)
        z = _interleave(codes, bits).astype(np.int64)
        return t.append_column("_zkey", pa.array(z))

    out = ds.map_batches(add_key, batch_format="pyarrow").sort("_zkey")
    if keep_key:
        return out
    return out.map_batches(lambda t: t.drop_columns(["_zkey"]),
                           batch_format="pyarrow")


def block_extents(ds, cols: list[str]) -> pd.DataFrame:
    """Layout audit: per-BLOCK min/max of each column (what a parquet
    zone map would record) — one metadata-sized row per block per
    column. Feed the same columns before/after ``zorder_sort`` and
    compare mean normalized spans."""

    def ext(t: pa.Table) -> pa.Table:
        names, mn, mx, n = [], [], [], []
        for c in cols:
            v = t.column(c).to_numpy(zero_copy_only=False).astype(
                np.float64)
            v = v[~np.isnan(v)]
            names.append(c)
            mn.append(float(v.min()) if len(v) else np.nan)
            mx.append(float(v.max()) if len(v) else np.nan)
            n.append(t.num_rows)
        return pa.table({"column": pa.array(names),
                         "mn": pa.array(mn, pa.float64()),
                         "mx": pa.array(mx, pa.float64()),
                         "rows": pa.array(n, pa.int64())})

    return ds.map_batches(ext, batch_format="pyarrow").to_pandas()


def mean_normalized_span(extents: pd.DataFrame, col: str,
                         lo: float, hi: float) -> float:
    """Average (max-min)/(hi-lo) across blocks for one column — the
    zone-map selectivity number (1.0 = every block spans everything,
    ~block_fraction^(1/ncols) = ideal Z-order)."""
    g = extents[extents["column"] == col]
    return float(((g["mx"] - g["mn"]) / (hi - lo)).mean())


def compact_parquet(in_dir: str, out_dir: str,
                    target_mb: int = 128) -> dict:
    """Small-file compaction — the lakehouse maintenance job that
    rewrites a fragmented parquet directory (streaming sinks and
    per-epoch deltas leave thousands of KB-sized files; every one
    costs a scan task + a footer read) into ~``target_mb`` files.

    The plan comes from METADATA only: total byte size from the
    dataset's parquet footers (no data read), file count from the
    filesystem. The rewrite is one streaming ``read_parquet →
    repartition(n) → write_parquet`` — repartition here is the whole
    point of the job (the rare case where an all-to-all exchange IS
    the useful work), and the output is again one file per block, so
    a failed run can be re-pointed at a fresh ``out_dir`` and retried
    idempotently. Returns an audit dict (files/bytes before and
    after, rows preserved) the caller should assert on before
    swapping directories."""
    import os

    import ray.data as rd

    def _scan(d: str):
        names = [os.path.join(d, f) for f in os.listdir(d)
                 if f.endswith(".parquet")]
        return len(names), sum(os.path.getsize(f) for f in names)

    n_files_in, bytes_in = _scan(in_dir)
    ds = rd.read_parquet(in_dir)
    n_rows = ds.count()
    n_out = max(1, -(-bytes_in // (target_mb << 20)))  # ceil division
    ds = rd.read_parquet(in_dir).repartition(n_out)
    ds.write_parquet(out_dir)
    n_files_out, bytes_out = _scan(out_dir)
    rows_out = rd.read_parquet(out_dir).count()
    return {
        "n_files_before": n_files_in,
        "n_files_after": n_files_out,
        "bytes_before": int(bytes_in),
        "bytes_after": int(bytes_out),
        "n_rows": int(n_rows),
        "n_rows_after": int(rows_out),
    }
