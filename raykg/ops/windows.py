"""Event-time windowing over a keyed event log.

Ray Data has no native event-time windows (ray_guide: streaming-shaped
workloads); windows are expressed as grouped computations over
ts-sorted partitions:

  * tumbling windows == grouped aggregate on the truncated timestamp
    (see ``__ray_entry__._q_hourly_events``);
  * session windows == per-key gap detection over the sorted group
    (this module), with HOT-KEY SPLITTING: a cheap pre-aggregated
    count pass finds keys whose event count exceeds ``max_group``;
    their events are salted into contiguous TIME RANGES, sessionized
    per range, and the per-range session summaries re-merge in a
    second (tiny) grouped pass — sessions straddling a range boundary
    fuse exactly like the unsalted gap rule, and ids renumber in ts
    order, so output is identical to the unsalted path. Residual
    partitioning assumption: one key's SESSION SUMMARIES (5 scalar
    columns per session) fit a worker — far weaker than the raw-event
    bound the round-2 implementation required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

MAX_SESSION_GROUP = 100_000  # events per group a single task may hold
SESSION_SALTS = 16


def hopping_window(ds, ts_col: str = "ts", width_minutes: int = 60,
                   hop_minutes: int = 15, agg_col: str | None = None):
    """Hopping (sliding) event-time windows: width W, hop S (W % S ==
    0); every event lands in W/S windows. Expressed Ray-Data-natively:
    a vectorized per-batch EXPLODE to (window_start, value) rows — the
    replication factor is exactly W/S — followed by one grouped
    aggregate on window_start (partial aggregation happens inside
    Ray's hash aggregate, so the shuffle carries one row per
    (block, window) after combining, not per event).

    -> Dataset(window_start, n_events[, sum_value]) with window_start
    as timestamp[ns]."""
    import pyarrow as pa

    from ray.data.aggregate import Count, Sum

    if width_minutes % hop_minutes:
        raise ValueError("width must be a multiple of hop")
    k = width_minutes // hop_minutes
    hop_ns = np.int64(hop_minutes * 60 * 1_000_000_000)

    def explode(t: pa.Table) -> pa.Table:
        ts_ns = (
            t.column(ts_col).cast(pa.timestamp("ns")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        base = (ts_ns // hop_ns) * hop_ns  # latest window start
        starts = (base[:, None] - hop_ns * np.arange(k)[None, :]).reshape(-1)
        cols = {
            "window_start": pa.array(starts).cast(pa.timestamp("ns")),
        }
        if agg_col is not None:
            vals = t.column(agg_col).to_numpy(zero_copy_only=False)
            cols[agg_col] = pa.array(np.repeat(vals, k))
        return pa.table(cols)

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    aggs = [Count(alias_name="n_events")]
    if agg_col is not None:
        aggs.append(Sum(agg_col, alias_name="sum_value"))
    return exploded.groupby("window_start").aggregate(*aggs)


def _session_cols(key):
    return [key, "session_id", "n_events", "start_ts", "end_ts"]


def sessionize(ds, key: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30, max_group: int = MAX_SESSION_GROUP,
               n_salts: int = SESSION_SALTS, census: bool = True):
    """-> Dataset(key, session_id, n_events, start_ts, end_ts);
    session_id is 1-based per key in ts order (ties keep ts order
    stable by event order within the sorted group).

    ``census=False`` skips the hot-key pre-pass (one full extra read of
    ``ds``) — a metadata hint for callers who KNOW no key exceeds
    ``max_group`` events (e.g. bounded-session telemetry). A key that
    does exceed it then lands in one group task anyway (the round-2
    partitioning assumption)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    # ---- hot-key census: per-batch partial (key, n, tmin, tmax) then a
    # small grouped combine; only rows with n > max_group ever reach the
    # driver (bounded by the number of HOT keys, not by cardinality)
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, as_index=False).agg(
            _n=(ts_col, "size"), _tmin=(ts_col, "min"), _tmax=(ts_col, "max")
        )
        g["_hb"] = pd.util.hash_array(
            g[key].to_numpy(object)).astype(np.int64)
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # whole-bucket fold (hash_exchange contract): several keys
        # co-locate per task, so re-group by the real key
        g = df.groupby(key, as_index=False).agg(
            _n=("_n", "sum"), _tmin=("_tmin", "min"),
            _tmax=("_tmax", "max"))
        return g[g["_n"].to_numpy(np.int64) > max_group]

    if census:
        from raykg.ops.exchange import hash_exchange

        hot = hash_exchange(
            ds.map_batches(partial, batch_format="pandas"), "_hb", 16,
            combine).to_pandas()
    else:
        hot = pd.DataFrame()
    hot_map = {
        r[key]: (r["_tmin"].value, max(r["_tmax"].value - r["_tmin"].value, 1))
        for _, r in hot.iterrows()
    } if len(hot) else {}
    hot_ref = ray.put(hot_map) if hot_map else None

    def add_salt(df: pd.DataFrame) -> pd.DataFrame:
        salt = np.zeros(len(df), dtype=np.int64)
        if hot_ref is not None:
            hm = ray.get(hot_ref)
            t0s = df[key].map({k: v[0] for k, v in hm.items()})
            widths = df[key].map({k: v[1] for k, v in hm.items()})
            mask = t0s.notna().to_numpy()
            if mask.any():
                ts_ns = (
                    df[ts_col].astype("datetime64[ns]").astype("int64")
                    .to_numpy()[mask]
                )
                t0 = t0s.to_numpy(dtype="float64")[mask].astype(np.int64)
                w = widths.to_numpy(dtype="float64")[mask].astype(np.int64)
                salt[mask] = np.minimum(
                    (ts_ns - t0) * n_salts // w, n_salts - 1
                )
        return df.assign(_salt=salt)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        new_session = (g[ts_col].diff() > gap) | g[ts_col].diff().isna()
        sid = new_session.cumsum().astype(np.int64)
        out = g.assign(session_id=sid).groupby("session_id").agg(
            n_events=(ts_col, "size"),
            start_ts=(ts_col, "min"),
            end_ts=(ts_col, "max"),
        )
        out = out.reset_index()
        out[key] = g[key].iloc[0]
        out["_salt"] = g["_salt"].iloc[0]
        return out[[key, "_salt", "session_id", "n_events", "start_ts",
                    "end_ts"]]

    def add_salt_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = add_salt(df)
        h = pd.util.hash_array(df[key].to_numpy(object)).astype(np.int64)
        return df.assign(_sb=(h + df["_salt"].to_numpy(np.int64))
                         % SESSION_BUCKETS)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # fold-safe whole-bucket fn: re-group by the real (key, salt)
        if not len(df):
            return pd.DataFrame({
                key: df[key], "_salt": df["_salt"],
                "session_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "start_ts": df[ts_col], "end_ts": df[ts_col]})
        parts = [per_group(g) for _, g in
                 df.groupby([key, "_salt"], sort=False)]
        return pd.concat(parts, ignore_index=True)

    from raykg.ops.exchange import hash_exchange

    sessions = hash_exchange(
        ds.map_batches(add_salt_bucket, batch_format="pandas"),
        "_sb", SESSION_BUCKETS, per_bucket)

    if not hot_map:
        # no hot keys: every _salt is 0, groups are exactly per-key
        return sessions.map_batches(
            lambda df: df[_session_cols(key)], batch_format="pandas"
        )

    # ---- boundary re-merge: per-key pass over SESSION SUMMARIES only.
    # Ranges are contiguous in ts (identical ts -> identical salt), so
    # sorting summaries by (start_ts, end_ts) restores global session
    # order; a boundary-straddling session fuses when the next range's
    # first session starts within `gap` of the previous range's last end
    # — the exact unsalted gap rule applied to summaries.
    def merge_one(g: pd.DataFrame) -> pd.DataFrame:
        if g["_salt"].nunique() <= 1:
            out = g.sort_values("session_id")
        else:
            g = g.sort_values(["start_ts", "end_ts"], kind="mergesort")
            new = (g["start_ts"] - g["end_ts"].shift()) > gap
            new.iloc[0] = True
            grp = new.cumsum()
            out = (
                g.groupby(grp)
                .agg(
                    n_events=("n_events", "sum"),
                    start_ts=("start_ts", "min"),
                    end_ts=("end_ts", "max"),
                )
                .reset_index(drop=True)
            )
            out[key] = g[key].iloc[0]
            out["session_id"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out[_session_cols(key)]

    def add_merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df[key].to_numpy(object)).astype(np.int64)
        return df.assign(_mb=h % SESSION_BUCKETS)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # fold-safe whole-bucket fn: re-group by the real key
        if not len(df):
            return df[_session_cols(key)]
        parts = [merge_one(g) for _, g in df.groupby(key, sort=False)]
        return pd.concat(parts, ignore_index=True)

    return hash_exchange(
        sessions.map_batches(add_merge_bucket, batch_format="pandas"),
        "_mb", SESSION_BUCKETS, merge_bucket)


SESSION_BUCKETS = 256

RESAMPLE_BUCKETS = 256


def resample_ffill(
    ds,
    key: str,
    ts_col: str,
    val_col: str,
    tiebreak: str,
    every: str = "1h",
    fill: float = -1.0,
    out_ts: str = "gts",
    coarse: int = RESAMPLE_BUCKETS,
):
    """Regularize an event stream onto a fixed time grid with
    forward-fill — the resample step before any per-key time-series
    featurization: for each key, grid points every ``every`` from
    ``floor(min ts)`` to ``max ts``; each point carries the value of
    the LATEST event at-or-before it ((ts, tiebreak) order pins ties),
    ``fill`` before the first event.

    Scale shape: the many-keys-per-call bucket exchange (one shuffle
    of (key, ts, tiebreak, value) rows); per key the fill is one
    ``searchsorted`` of the grid into the key's sorted events — the
    Python loop is per distinct key in the bucket, the inner work
    vectorized. Partitioning assumption: one key's events + grid fit a
    task (a key hot beyond that needs the sessionize-style time-range
    salting; grids are bounded by span/every)."""
    import pyarrow as pa

    from raykg.ops.joins import _key_bucket

    def tag(t: pa.Table) -> pa.Table:
        cols = {key: t.column(key), ts_col: t.column(ts_col),
                tiebreak: t.column(tiebreak), val_col: t.column(val_col)}
        return pa.table(cols).append_column(
            "_b", _key_bucket(t.column(key), coarse))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):            # empty bucket (exchange types it)
            return pd.DataFrame({
                key: g[key],
                out_ts: pd.array([], dtype="datetime64[ns]"),
                val_col: np.array([], np.float64),
            })
        g = g.sort_values([key, ts_col, tiebreak], kind="mergesort")
        out_k, out_t, out_v = [], [], []
        ts_all = pd.to_datetime(g[ts_col]).astype("datetime64[ns]")
        for kv, idx in g.groupby(key, sort=False).indices.items():
            ts = ts_all.iloc[idx]
            vals = g[val_col].iloc[idx].to_numpy()
            grid = pd.date_range(ts.iloc[0].floor(every), ts.iloc[-1],
                                 freq=every)
            pos = np.searchsorted(ts.to_numpy().astype("int64"),
                                  grid.to_numpy().astype("int64"),
                                  side="right") - 1
            v = np.where(pos >= 0, vals[np.maximum(pos, 0)], fill)
            out_k.append(np.full(len(grid), kv))
            out_t.append(grid.to_numpy())
            out_v.append(v)
        return pd.DataFrame({
            key: np.concatenate(out_k),
            out_ts: np.concatenate(out_t),
            val_col: np.concatenate(out_v),
        })

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(tag, batch_format="pyarrow"), "_b", coarse,
        per_bucket)
