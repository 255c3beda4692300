"""HyperLogLog count-distinct sketch (Flajolet et al. 2007) — the
scale path for cardinality: exact count-distinct must shuffle every
distinct value (``agg_user_distinct_types`` does, with local
pre-dedup); HLL moves at most ``keys × 2^p`` register rows no matter
how many distinct values exist, with ~1.04/√2^p relative error.

Relational formulation (what makes it a clean Ray Data operator): a
value's sketch contribution is the pair ``(bucket = top p hash bits,
rho = 1 + leading zeros of the rest)`` and the sketch is just
``max(rho) GROUP BY key, bucket``. So: one vectorized map_batches
computes (key, bucket, rho), a per-block ``np.maximum`` pre-aggregate
caps each block's shuffle contribution at keys × 2^p rows, Ray's
``groupby().aggregate(Max)`` merges, and a final small groupby turns
registers into estimates. Standard small-range (linear counting) and
large-range corrections applied.

Error contract is probabilistic — tests gate the estimate within
3 × the theoretical standard error against exact counts; there is no
hash-exact oracle by design (the exact query remains available for
conformance).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Max, Sum

from raykg.util import hash_strings


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _finalize64(v: np.ndarray) -> np.ndarray:
    """Murmur3-style 64-bit finalizer. Applied to EVERY input: raw FNV
    high bits barely move between similar short strings (measured: 3k
    distinct user-N strings hit 105/4096 top-12-bit buckets), and
    sequential ints funnel the same way — HLL buckets come from the
    top bits, so they must be avalanche-mixed."""
    v = v.copy()
    v ^= v >> np.uint64(33)
    with np.errstate(over="ignore"):
        v *= np.uint64(0xFF51AFD7ED558CCD)
        v ^= v >> np.uint64(33)
        v *= np.uint64(0xC4CEB9FE1A85EC53)
    v ^= v >> np.uint64(33)
    return v


def _hash_col(col: pa.ChunkedArray) -> np.ndarray:
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return _finalize64(hash_strings(col.to_pylist()))
    return _finalize64(col.to_numpy(zero_copy_only=False).astype(np.uint64))


def _bit_length64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (log2 on 32-bit halves —
    32-bit ints are exact in float64, so floor(log2) cannot round past
    a power of two; a single log2 over full 64-bit values can)."""
    hi = (w >> np.uint64(32)).astype(np.float64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)
    with np.errstate(divide="ignore"):
        bl_hi = np.where(hi > 0, np.floor(np.log2(np.maximum(hi, 1))) + 1, 0)
        bl_lo = np.where(lo > 0, np.floor(np.log2(np.maximum(lo, 1))) + 1, 0)
    return np.where(hi > 0, bl_hi + 32, bl_lo).astype(np.int64)


def _registers(t: pa.Table, key_col: str | None, value_col: str, p: int) -> pa.Table:
    h = _hash_col(t.column(value_col))
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)  # low 64-p bits
    # rho = leading-zero count within the (64-p)-bit window, + 1;
    # w == 0 gives bit_length 0 -> rho = 64-p+1, the defined maximum
    rho = (64 - p) - _bit_length64(w) + 1
    cols = {"bucket": bucket, "rho": rho}
    if key_col is not None:
        cols = {key_col: t.column(key_col), **cols}
        df = pa.table(cols).to_pandas()
        agg = df.groupby([key_col, "bucket"], sort=False)["rho"].max().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)
    df = pd.DataFrame(cols)
    agg = df.groupby("bucket", sort=False)["rho"].max().reset_index()
    return pa.Table.from_pandas(agg, preserve_index=False)


def _estimate(group: pd.DataFrame, p: int) -> float:
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    regs[group["bucket"].to_numpy()] = group["rho"].to_numpy()
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -regs))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting
    elif est > (1 << 32) / 30.0:
        est = -(1 << 32) * np.log(1 - est / (1 << 32))
    return float(est)


def hll_count_distinct(ds, value_col: str, key_col: str | None = None, p: int = 12):
    """Approximate distinct count of ``value_col`` (optionally per
    ``key_col`` group). Returns a small pandas frame: (key?, approx_n)."""

    reg = (
        ds.map_batches(
            lambda t: _registers(t, key_col, value_col, p),
            batch_format="pyarrow",
        )
        .groupby([key_col, "bucket"] if key_col else "bucket")
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )
    if key_col is None:
        return pd.DataFrame({"approx_n": [round(_estimate(reg, p))]})
    out = (
        reg.groupby(key_col, sort=False)
        .apply(lambda g: round(_estimate(g, p)), include_groups=False)
        .rename("approx_n")
        .reset_index()
    )
    return out


def approx_grouped_quantiles(
    ds,
    key_col: str,
    val_col: str,
    id_col: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    rate: float = 0.05,
    coarse: int = 64,
):
    """Approximate per-key quantiles from a deterministic hash sample.

    Exact grouped quantiles must co-locate EVERY value of a key (the
    ``agg_value_quantiles`` path) — at corpus scale that shuffle
    carries the whole column. Sampling first shrinks the exchange by
    1/rate with a known guarantee: a uniform sample of m values bounds
    the rank error of any sample quantile by ~1.15/sqrt(m) with 95%
    confidence (DKW inequality), so rate is a direct precision dial.
    The sample is hash-of-id deterministic (same rows every run and
    every partitioning — see ops/sample.py for why that matters), then
    the surviving (key, value) pairs flow through the same
    coarse-bucket many-keys-per-call selection as the exact path.

    Returns one row per key present in the sample: (key, q{..} cols).
    """
    thr = np.uint64(int(rate * (1 << 32)))
    knuth = np.uint64(2654435761)
    m32 = np.uint64(1 << 32)

    def sample_and_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = (ids * knuth) % m32 < thr
        t = t.select([key_col, val_col]).filter(pa.array(keep))
        kh = _hash_col(t.column(key_col)) % np.uint64(coarse)
        return t.append_column("_b", pa.array(kh.astype(np.int64)))

    qcols = [f"q{int(q * 100)}" for q in qs]

    def q_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, v in g.groupby(key_col, sort=False)[val_col]:
            a = v.to_numpy()
            rows.append((k, *(float(np.quantile(a, q)) for q in qs)))
        return pd.DataFrame(rows, columns=[key_col, *qcols])

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(sample_and_bucket, batch_format="pyarrow"),
        "_b", coarse, q_bucket)


# ------------------------------------------------------------- Count-Min


def _cms_slots(h: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(n, depth) slot indices from one 64-bit hash per value, using
    the standard Kirsch–Mitzenmacher double hashing h1 + i·h2 (two
    independent halves of the finalized hash)."""
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = (h >> np.uint64(32)).astype(np.uint64) | np.uint64(1)  # odd
    i = np.arange(depth, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(width)).astype(
            np.int64
        )


def cms_frequencies(
    ds,
    value_col: str,
    query_values: list,
    depth: int = 4,
    width: int = 2048,
) -> pd.DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) frequency
    estimates for ``query_values`` — the approx complement of the
    EXACT two-pass heavy hitters (ops/heavy.py): one pass, bounded
    memory, never underestimates; overestimate ≤ 2N/width with
    probability 1 − 2^−depth per query.

    Relational formulation (the HLL register trick): a value's sketch
    contribution is ``+1`` to (row i, slot_i(value)) for each of the
    ``depth`` rows, and the sketch IS ``sum(c) GROUP BY (row, slot)``.
    One vectorized map_batches emits per-block PRE-SUMMED counter rows
    (≤ depth × width per block, regardless of row count), a small
    groupby folds them, and estimates are the min over each query
    value's depth counters. Deterministic given the data — partition-
    invariant bit-for-bit (tested) — though the estimate's accuracy
    contract stays probabilistic, so the driver query is rows-only."""
    # hash query values exactly as the column is hashed (type-matched)
    qh = _hash_col(pa.chunked_array([pa.array(query_values)]))
    q_slots = _cms_slots(qh, depth, width)  # (nq, depth)

    def block_counters(t: pa.Table) -> pa.Table:
        h = _hash_col(t.column(value_col))
        slots = _cms_slots(h, depth, width)  # (n, depth)
        flat = (np.arange(depth, dtype=np.int64)[None, :] * width
                + slots).ravel()
        counts = np.bincount(flat, minlength=depth * width)
        nz = np.flatnonzero(counts)
        return pa.table({
            "cell": pa.array(nz, pa.int64()),
            "c": pa.array(counts[nz], pa.int64()),
        })

    counters = (
        ds.map_batches(block_counters, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    table = np.zeros(depth * width, dtype=np.int64)
    table[counters["cell"].to_numpy()] = counters["c"].to_numpy()
    cells = np.arange(depth, dtype=np.int64)[None, :] * width + q_slots
    est = table[cells].min(axis=1)
    return pd.DataFrame({
        "value": [str(v) for v in query_values],
        "est_count": est.astype("int64"),
    })


def cms_never_underestimates(est: np.ndarray, exact: np.ndarray) -> bool:
    """CMS structural invariant (useful in tests and data checks)."""
    return bool((est >= exact).all())
