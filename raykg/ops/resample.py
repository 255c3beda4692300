"""Time-grid gap fill (resample): per-key regular time buckets with
explicit zero rows for empty buckets.

Downstream rate / trend / anomaly math needs a DENSE series — "no
events that hour" must be a row, not an absence (a rolling mean over
a sparse series silently skips gaps).  This op buckets timestamps to
a fixed period and emits EVERY bucket between each key's first and
last event, zero-filled where nothing happened — SQL's
``generate_series`` + left-join pattern, which is what the paired
DuckDB oracle runs.

Scale shape: one pre-aggregation pass folds the event stream to
(key, bucket) partial counts/sums per block (the shuffle ships at
most one row per (key, bucket) per block, never events); buckets
co-locate by key hash and each group task materializes its keys'
grids with ``np.arange`` — grid rows are GENERATED inside workers,
proportional to time span × keys, never on the driver.

Caveat (documented contract): a single key whose span is huge at a
tiny period produces span/period rows in one task — pick the period
to match the analysis window, or pre-filter the time range.
Timestamps are handled as int64 epoch MICROSECONDS end-to-end (the
µs-resolution lesson from cohort retention: no lossy Arrow casts).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raykg.ops.joins import _key_bucket


def gapfill_grid(ds, key_col: str, ts_col: str, bucket_us: int,
                 val_col: str | None = None, coarse: int = 64):
    """Dense per-key time grid: one row per (key, bucket) for every
    bucket in [min_bucket(key), max_bucket(key)], with ``n`` event
    counts and (optionally) ``s`` = sum of ``floor(val_col)`` as
    exact int64 — zeros where the bucket is empty.  Buckets are
    ``epoch_us // bucket_us`` (int64).
    -> Dataset(key, bk, n[, s]).
    """
    def partial(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        bk = ts // bucket_us
        df = pd.DataFrame({
            key_col: t.column(key_col).to_pandas(),
            "bk": bk,
            "n": np.ones(len(bk), np.int64),
        })
        if val_col is not None:
            v = t.column(val_col).to_numpy(zero_copy_only=False)
            df["s"] = np.floor(v).astype(np.int64)
        g = df.groupby([key_col, "bk"], sort=False).sum().reset_index()
        g["_b"] = _key_bucket(
            pa.array(g[key_col]), coarse).to_numpy()
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        agg = {"n": "sum"}
        if val_col is not None:
            agg["s"] = "sum"
        cols = [key_col, "bk", "n"] + (["s"] if val_col is not None
                                       else [])
        if not len(df):          # empty bucket (exchange types it)
            return df.reindex(columns=cols)
        folded = df.groupby([key_col, "bk"], sort=False).agg(
            agg).reset_index()
        pieces = []
        for k, grp in folded.groupby(key_col, sort=False):
            lo, hi = int(grp["bk"].min()), int(grp["bk"].max())
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            n = np.zeros(len(grid), np.int64)
            idx = grp["bk"].to_numpy(dtype=np.int64) - lo
            n[idx] = grp["n"].to_numpy(dtype=np.int64)
            out = {key_col: np.full(len(grid), k, dtype=object)
                   if isinstance(k, str) else
                   np.full(len(grid), k),
                   "bk": grid, "n": n}
            if val_col is not None:
                s = np.zeros(len(grid), np.int64)
                s[idx] = grp["s"].to_numpy(dtype=np.int64)
                out["s"] = s
            pieces.append(pd.DataFrame(out))
        return pd.concat(pieces, ignore_index=True)

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(partial, batch_format="pyarrow"), "_b",
        coarse, fill)


def grouped_ewma(ds, key_col: str, val_col: str, order_cols: list,
                 alpha: float = 0.25, coarse: int = 64):
    """Per-key exponentially-weighted moving average — the final
    smoothed value of the exact sequential fold
    ``s_1 = x_1;  s_t = alpha·x_t + (1-alpha)·s_(t-1)``
    over rows ordered by ``order_cols``.  The trend/level readout a
    monitoring pipeline keeps per entity.

    The recurrence is inherently SEQUENTIAL per key (each step needs
    the previous float), so rows co-locate by key hash (one exchange
    of (key, order, x) rows — the sessionize shape; same hot-key
    caveat) and the fold runs as a step-synchronous scan VECTORIZED
    ACROSS KEYS: rows are ordered by within-key position, and step t
    updates every key that has a t-th element in one numpy op — each
    row is touched exactly once, O(rows + max_len) per task, never a
    per-row Python loop.  The op order ``alpha·x + (1-alpha)·acc``
    matches DuckDB's ``list_reduce(list(x ORDER BY ...), (acc, x) ->
    a*x + (1-a)*acc)`` fold exactly: with a binary-fraction alpha both
    sides produce bit-identical IEEE doubles (the oracle needs no
    tolerance).  A closed-form Σ a(1-a)^j x version would vectorize
    the time axis but loses that bit-exactness (pow rounding) and
    underflows for long histories.
    -> Dataset(key, n, ewma).
    """
    one_minus = 1.0 - alpha

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t.column(key_col)))  # null keys drop
        cols = {key_col: t.column(key_col)}
        for c in order_cols:
            col = t.column(c)
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.int64())
            cols[c] = col
        cols["_x"] = t.column(val_col).cast(pa.float64())
        out = pa.table(cols)
        return out.append_column("_b", _key_bucket(t.column(key_col),
                                                   coarse))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col] + list(order_cols), kind="stable")
        codes, uniq = pd.factorize(df[key_col], sort=False)
        pos = df.groupby(codes, sort=False).cumcount().to_numpy()
        x = df["_x"].to_numpy(dtype=np.float64)
        # rows re-ordered by step so each scan step is one slice
        order2 = np.lexsort((codes, pos))
        pos_s, codes_s, x_s = pos[order2], codes[order2], x[order2]
        max_len = int(pos.max()) + 1 if len(pos) else 0
        starts = np.searchsorted(pos_s, np.arange(max_len + 1))
        acc = np.empty(len(uniq), dtype=np.float64)
        for t in range(max_len):
            s, e = starts[t], starts[t + 1]
            k, xv = codes_s[s:e], x_s[s:e]
            if t == 0:
                acc[k] = xv
            else:
                acc[k] = alpha * xv + one_minus * acc[k]
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame({key_col: uniq, "n": n, "ewma": acc})

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(project, batch_format="pyarrow"), "_b",
        coarse, fold)


def time_weighted_avg(ds, key_col: str, ts_col: str, val_col: str,
                      tiebreak_col: str, coarse: int = 64):
    """Per-key time-weighted average: each value is weighted by how
    long it was "current" — the duration until the key's NEXT event —
    ``TWA = Σ v_i·dur_i / Σ dur_i`` over rows ordered by
    ``(ts, tiebreak)``; the last event has no successor and carries
    no weight.  The correct average for irregularly-sampled state
    (price, gauge, session quality): a plain mean over-weights bursts.

    Scale shape: rows co-locate by key hash (one exchange — the
    sessionize shape, same hot-key caveat); each bucket task lexsorts
    once and computes every key's weighted sums vectorized (segmented
    diff over the sorted array).  Durations are exact int64
    microseconds and with integer values ``Σ v·dur`` folds exact, so
    the single output division mirrors a SQL
    ``lead(ts) OVER (PARTITION BY key ORDER BY ts, tiebreak)`` oracle
    bit-for-bit.  Keys with fewer than two events (no duration) are
    dropped; a key whose durations sum to zero (all-identical
    timestamps) would divide by zero — also dropped, mirrored by
    ``HAVING sum(dur) > 0``.
    -> Dataset(key, n, twa).
    """
    from raykg.ops.joins import _key_bucket

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t.column(key_col)))  # null keys drop
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            # normalize to µs: raw cast(int64) yields the column's
            # NATIVE unit (ns inputs would be 1000x off vs the µs
            # tolerance contract)
            from raykg.util import ts_to_us

            ts = pa.array(ts_to_us(ts), pa.int64())
        return pa.table({
            "k": t.column(key_col),
            "ts": ts,
            "tb": t.column(tiebreak_col),
            "x": t.column(val_col).cast(pa.int64()),
            "_b": _key_bucket(t.column(key_col), coarse),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["k", "ts", "tb"], kind="stable")
        codes, uniq = pd.factorize(df["k"], sort=False)
        ts = df["ts"].to_numpy(dtype=np.int64)
        x = df["x"].to_numpy(dtype=np.int64)
        n_rows = len(df)
        # duration to next row, zero where the next row is a new key
        dur = np.zeros(n_rows, dtype=np.int64)
        if n_rows > 1:
            same = codes[1:] == codes[:-1]
            dur[:-1] = np.where(same, ts[1:] - ts[:-1], 0)
        num = np.zeros(len(uniq), dtype=np.int64)
        den = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(num, codes, x * dur)
        np.add.at(den, codes, dur)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        keep = den > 0
        twa = num[keep].astype(np.float64) / den[keep].astype(np.float64)
        return pd.DataFrame({key_col: np.asarray(uniq)[keep],
                             "n": n[keep], "twa": twa})

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(project, batch_format="pyarrow"), "_b",
        coarse, fold)


def grouped_acf(ds, key_col: str, ts_col: str, val_col: str,
                tiebreak_col: str, lags: tuple[int, ...] = (1, 2),
                coarse: int = 64):
    """Per-key sample autocorrelation at the requested ``lags`` over
    rows ordered by ``(ts, tiebreak)`` — the seasonality / burstiness
    signal of per-entity event series (is a user's activity value
    correlated with their previous one?).

    Estimator (the standard plug-in form, shared-mean variant):
    ``r_L = Σ_{i<=n-L}(x_i - x̄)(x_{i+L} - x̄) / Σ(x_i - x̄)²``,
    expanded so every accumulated quantity is an EXACT int64 —
    ``S1 = Σ x_i·x_{i+L}``, head/tail sums, ``Sx``, ``Sxx`` — and the
    ratio is ONE pinned float expression
    ``(S1 - m·Sh - m·St + nL·m·m) / (Sxx - m·Sx)`` with ``m = Sx/n``,
    mirrored operand-for-operand by a DuckDB ``lead()`` window oracle
    (bit-exact, no rounding).  Values must be integral (callers floor
    floats explicitly so the contract is visible in the SQL too).

    Scale shape: rows co-locate by key hash (ONE exchange — the
    ``time_weighted_avg`` shape and hot-key caveat); each bucket task
    lexsorts once and computes every key's lagged products for all
    lags vectorized (the shifted-slice trick over the key-contiguous
    sorted array).  Keys with ``n <= L`` (no lagged pair) or zero
    variance are dropped, mirrored by the oracle's HAVING.
    -> Dataset(key, lag, n, acf).
    """
    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t.column(key_col)))
        return pa.table({
            "k": t.column(key_col),
            "ts": t.column(ts_col),
            "tb": t.column(tiebreak_col),
            "x": t.column(val_col).cast(pa.int64()),
            "_b": _key_bucket(t.column(key_col), coarse),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["k", "ts", "tb"], kind="stable")
        codes, uniq = pd.factorize(df["k"], sort=False)
        x = df["x"].to_numpy(dtype=np.int64)
        g = len(uniq)
        n = np.bincount(codes, minlength=g).astype(np.int64)
        sx = np.zeros(g, np.int64)
        sxx = np.zeros(g, np.int64)
        np.add.at(sx, codes, x)
        np.add.at(sxx, codes, x * x)
        out_key, out_lag, out_n, out_acf = [], [], [], []
        for lag in lags:
            if len(x) > lag:
                same = codes[lag:] == codes[:-lag]
                ch, ct = codes[:-lag][same], x[:-lag][same]
                xt = x[lag:][same]
                s1 = np.zeros(g, np.int64)
                sh = np.zeros(g, np.int64)
                st = np.zeros(g, np.int64)
                nl = np.bincount(ch, minlength=g).astype(np.int64)
                np.add.at(s1, ch, ct * xt)
                np.add.at(sh, ch, ct)
                np.add.at(st, ch, xt)
            else:
                s1 = sh = st = np.zeros(g, np.int64)
                nl = np.zeros(g, np.int64)
            m = sx.astype(np.float64) / n.astype(np.float64)
            den = sxx.astype(np.float64) - m * sx.astype(np.float64)
            keep = (nl > 0) & (den != 0.0)
            num = (s1.astype(np.float64) - m * sh.astype(np.float64)
                   - m * st.astype(np.float64)
                   + nl.astype(np.float64) * m * m)
            out_key.append(np.asarray(uniq)[keep])
            out_lag.append(np.full(int(keep.sum()), lag, np.int64))
            out_n.append(n[keep])
            out_acf.append(num[keep] / den[keep])
        return pd.DataFrame({
            key_col: np.concatenate(out_key),
            "lag": np.concatenate(out_lag),
            "n": np.concatenate(out_n),
            "acf": np.concatenate(out_acf),
        })

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(project, batch_format="pyarrow"), "_b",
        coarse, fold)


def cusum_changepoint(ds, key_col: str, ts_col: str, val_col: str,
                      tiebreak_col: str, coarse: int = 64):
    """Per-key CUSUM changepoint detection: over each key's series
    ordered by ``(ts, tiebreak)``, find the split point k* maximizing
    the mean-centered cumulative-sum deviation
    ``|S_k| = |Σ_{i<=k} x_i - k·x̄|`` (Page 1954 / Taylor's CUSUM
    changepoint estimator) — the level-shift detector of metric
    monitoring ("when did this user's spend change?").

    Exactness: with integer-valued ``val_col`` (callers floor floats
    explicitly), the deviation is scaled by n to stay integral —
    ``dev_k = |n·cum_k − k·total|`` is exact int64, the argmax
    (ties -> smallest k) is an integer comparison, and the reported
    statistic is ONE float division ``dev/n`` — so the SQL
    window-function oracle matches bit-for-bit with no rounding.

    Scale shape: rows co-locate by key hash (ONE exchange, the
    grouped_acf plan and hot-key caveat); each bucket task lexsorts
    once and computes every key's prefix sums, deviations and argmax
    vectorized over the key-contiguous array (reduceat group maxima;
    first-position tie-break via first-occurrence unique). Keys emit
    exactly one row. -> Dataset(key, n, k_star, dev, stat).
    """
    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t.column(key_col)))
        return pa.table({
            "k": t.column(key_col),
            "ts": t.column(ts_col),
            "tb": t.column(tiebreak_col),
            "x": t.column(val_col).cast(pa.int64()),
            "_b": _key_bucket(t.column(key_col), coarse),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):          # empty bucket (exchange types it)
            return pd.DataFrame({
                key_col: df["k"], "n": np.array([], np.int64),
                "k_star": np.array([], np.int64),
                "dev": np.array([], np.int64),
                "stat": np.array([], np.float64)})
        df = df.sort_values(["k", "ts", "tb"], kind="stable")
        codes, uniq = pd.factorize(df["k"], sort=False)
        x = df["x"].to_numpy(dtype=np.int64)
        g = len(uniq)
        n_per = np.bincount(codes, minlength=g).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(n_per)[:-1]])
        cum_all = np.cumsum(x, dtype=np.int64)
        base = np.repeat(cum_all[starts] - x[starts], n_per)
        cum = cum_all - base                       # within-key prefix sum
        kpos = np.arange(len(x), dtype=np.int64) - np.repeat(
            starts, n_per) + 1                     # 1-based position
        tot = np.zeros(g, np.int64)
        np.add.at(tot, codes, x)
        n_rep = np.repeat(n_per, n_per)
        # |n·cum − k·tot| is bounded by ~2·n²·max|x| per key; escalate
        # to exact Python-int (object) arithmetic when that bound
        # nears int64 (the grouped_weighted_mean convention) instead
        # of silently wrapping. The SQL oracle runs the same products
        # in HUGEINT and casts dev::BIGINT at output, so a dev that
        # cannot fit int64 raises on both sides.
        n_max = int(n_per.max(initial=0))
        m_abs = int(np.abs(x).max(initial=0))
        if 2 * n_max * n_max * m_abs >= (1 << 62):
            cum_all_o = np.cumsum(x.astype(object))
            base_o = np.repeat(cum_all_o[starts] - x[starts], n_per) \
                if len(x) else np.zeros(0, object)
            cum_o = cum_all_o - base_o
            dev = np.abs(n_rep.astype(object) * cum_o
                         - kpos.astype(object)
                         * np.repeat(tot, n_per).astype(object))
            if len(dev) and int(max(dev)) >= (1 << 63):
                raise OverflowError(
                    "cusum_changepoint: dev exceeds int64 (matches "
                    "the oracle's dev::BIGINT cast failure)")
            dev = dev.astype(np.int64)
        else:
            dev = np.abs(n_rep * cum - kpos * np.repeat(tot, n_per))
        max_dev = np.maximum.reduceat(dev, starts) if len(x) else \
            np.zeros(0, np.int64)
        # first position attaining the max (ties -> smallest k)
        hit = dev == np.repeat(max_dev, n_per)
        rows = np.flatnonzero(hit)
        first_code, first_idx = np.unique(codes[rows], return_index=True)
        k_star = np.zeros(g, np.int64)
        k_star[first_code] = kpos[rows[first_idx]]
        return pd.DataFrame({
            key_col: np.asarray(uniq),
            "n": n_per,
            "k_star": k_star,
            "dev": max_dev,
            "stat": max_dev.astype(np.float64) / n_per.astype(np.float64),
        })

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(project, batch_format="pyarrow"), "_b",
        coarse, fold)


def parse_timestamps(ds, col: str, fmt: str = "%Y-%m-%d %H:%M:%S",
                     out_col: str = "ts_parsed", unit: str = "us"):
    """String→timestamp parsing at the read boundary (CSV/JSONL
    ingestion): one vectorized ``pc.strptime`` kernel per batch, no
    Python per-row datetime work, no shuffle. Unparseable strings
    raise (fail-fast contract: a silent-null variant is one
    ``error_is_null=True`` flag away — kept strict so ingest bugs
    surface at the gate, mirroring SQL ``strptime``'s error
    behavior)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        parsed = pc.strptime(t.column(col), format=fmt, unit=unit)
        return t.append_column(out_col, parsed)

    return ds.map_batches(fn, batch_format="pyarrow")


def time_features(ds, ts_col: str = "ts", keep: list[str] | None = None):
    """Calendar feature extraction — the feature-engineering step
    before any time-aware model: hour-of-day, day-of-week (Monday=0,
    the ISO convention minus one), month, is_weekend, all from
    vectorized Arrow temporal kernels (one kernel call per feature per
    batch, no Python datetime objects, no shuffle).

    DuckDB mirror: hour(ts), isodow(ts) - 1, month(ts),
    isodow(ts) >= 6."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        dow = pc.day_of_week(ts)  # Arrow default: Monday=0
        out = t.select(list(keep or []))
        out = out.append_column("hour", pc.cast(pc.hour(ts), pa.int64()))
        out = out.append_column("dow", pc.cast(dow, pa.int64()))
        out = out.append_column("month",
                                pc.cast(pc.month(ts), pa.int64()))
        out = out.append_column("is_weekend", pc.greater_equal(dow, 5))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def interpolate_grid(ds, key_col: str, ts_col: str, val_col: str,
                     tiebreak_col: str, bucket_us: int,
                     coarse: int = 64):
    """Linear-interpolation resampling: one row per (key, bucket) on
    the dense grid [first obs bucket, last obs bucket], where each
    bucket's observation is the value of its LAST event (by
    (ts, tiebreak)) and empty buckets take the straight line between
    their neighboring observations

        v = v0 + (v1 - v0) · (g - b0) / (b1 - b0)

    — the ffill sibling (resample_ffill / gapfill_grid) for metrics
    where a step function misrepresents a trend. All operands exact
    int64; ONE mirrored float expression per gap point, so the SQL
    oracle (IGNORE NULLS window fills over the same grid) matches
    bit-for-bit. Values are floored to int cents on entry (the
    gapfill convention).

    Scale shape: per-block last-per-(key, bucket) pre-pick (exchange
    O(blocks × touched buckets)), one key-bucket fold; each key's
    grid expands vectorized (interior gaps always have both
    neighbors, so no NaN edge).  -> Dataset(key, bk, v, is_observed).
    """
    from raykg.ops.joins import _key_bucket
    from raykg.util import ts_to_us

    def partial(t: pa.Table) -> pa.Table:
        us = ts_to_us(t.column(ts_col))
        bk = us // bucket_us
        v = t.column(val_col).to_numpy(zero_copy_only=False)
        # floor().astype(int64) on a NaN is platform-dependent
        # garbage, not an error — enforce the 'floored int cents on
        # entry' contract explicitly (the grouped_gini convention)
        if np.isnan(v.astype(np.float64)).any():
            raise ValueError(
                f"interpolate_grid: null/NaN in {val_col!r}; values "
                "must be non-null (floored-int-cents-on-entry "
                "contract)")
        df = pd.DataFrame({
            key_col: t.column(key_col).to_pandas(),
            "bk": bk,
            "ts": us,
            "tb": t.column(tiebreak_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False),
            "cv": np.floor(v).astype(np.int64),
        })
        # per-block last event per (key, bucket)
        df = (df.sort_values(["ts", "tb"], kind="mergesort")
              .drop_duplicates([key_col, "bk"], keep="last"))
        g = pa.Table.from_pandas(df, preserve_index=False)
        return g.append_column("_b", _key_bucket(g.column(key_col),
                                                 coarse))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["ts", "tb"], kind="mergesort")
              .drop_duplicates([key_col, "bk"], keep="last"))
        pieces = []
        for k, grp in df.groupby(key_col, sort=False):
            grp = grp.sort_values("bk", kind="mergesort")
            ob = grp["bk"].to_numpy(np.int64)
            ov = grp["cv"].to_numpy(np.int64)
            lo, hi = int(ob[0]), int(ob[-1])
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            nxt = np.searchsorted(ob, grid, side="left")
            prv = np.searchsorted(ob, grid, side="right") - 1
            observed = (nxt < len(ob)) & (ob[np.clip(nxt, 0,
                                                     len(ob) - 1)]
                                          == grid)
            b0, v0 = ob[prv], ov[prv]
            b1 = ob[np.clip(nxt, 0, len(ob) - 1)]
            v1 = ov[np.clip(nxt, 0, len(ob) - 1)]
            db = np.where(b1 > b0, b1 - b0, 1)
            interp = (v0.astype(np.float64)
                      + ((v1 - v0).astype(np.float64)
                         * (grid - b0).astype(np.float64))
                      / db.astype(np.float64))
            v = np.where(observed, ov[prv].astype(np.float64), interp)
            pieces.append(pd.DataFrame({
                key_col: np.full(len(grid), k, dtype=object)
                if isinstance(k, str) else np.full(len(grid), k),
                "bk": grid, "v": v, "is_observed": observed,
            }))
        if not pieces:
            return pd.DataFrame({key_col: pd.array([], "int64"),
                                 "bk": pd.array([], "int64"),
                                 "v": pd.array([], "float64"),
                                 "is_observed": pd.array([], "bool")})
        return pd.concat(pieces, ignore_index=True)

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(partial, batch_format="pyarrow"), "_b",
        coarse, fold)
