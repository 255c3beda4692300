"""Ordered-funnel analysis over an event log: how many keys (users)
performed step 1, then step 2 strictly later, then step 3 … — the
MATCH_RECOGNIZE-lite every product-analytics engine ships, expressed
as one key-bucketed exchange.

Semantics (first-occurrence chaining, the standard funnel):
  t₁ = min ts of a step-1 event; tᵢ = min ts of a step-i event with
  ts STRICTLY AFTER tᵢ₋₁. A key reaches depth d if t_d exists.
  Simultaneous-timestamp events do not chain (documented; SQL mirror
  uses the same strict inequality).

Scale shape:
  * the per-block pre-filter keeps only events whose type is one of
    the funnel steps — at 100 TB the exchange ships the funnel-
    relevant slice, not the log;
  * keys co-locate by hash bucket (``coarse`` modulo); each bucket
    runs the chain as ``len(steps)`` vectorized pandas passes
    (filter type → merge previous times → strict filter → groupby
    min), never a per-key Python loop;
  * buckets emit per-depth partial counts; the driver folds
    O(buckets × steps) ints.

Output: one row per step — (step index, step name, n_reached) with
n_reached monotonically non-increasing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

FUNNEL_BUCKETS = 64


def funnel_counts(ds, steps: list[str], key: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  coarse: int = FUNNEL_BUCKETS) -> pd.DataFrame:
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")

    step_set = pa.array(steps)

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column(type_col), value_set=step_set))
        ids = t.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            bk = ((ids * np.uint64(0x9E3779B97F4A7C15))
                  >> np.uint64(52)).astype(np.int32) % coarse
        return pa.table({
            "_fk": pa.array(bk),
            key: t.column(key),
            ts_col: t.column(ts_col),
            type_col: t.column(type_col),
        })

    def bucket_chain(df: pd.DataFrame) -> pd.DataFrame:
        # depth-1: first occurrence of step 1 per key
        cur = (df[df[type_col] == steps[0]]
               .groupby(key, sort=False)[ts_col].min().rename("t"))
        counts = [len(cur)]
        for s in steps[1:]:
            nxt = df[df[type_col] == s][[key, ts_col]]
            # merge on COLUMNS: a right_index merge propagates the
            # named index, making `key` ambiguous in the next groupby
            nxt = nxt.merge(cur.reset_index(), on=key)
            nxt = nxt[nxt[ts_col] > nxt["t"]]
            cur = nxt.groupby(key, sort=False)[ts_col].min().rename("t")
            counts.append(len(cur))
        return pd.DataFrame({"step": np.arange(len(steps)),
                             "n": np.asarray(counts, dtype=np.int64)})

    from raykg.ops.exchange import hash_exchange

    # fold-safe: bucket_chain re-groups by the key internally and its
    # per-step counts are partials the driver sums below
    parts = hash_exchange(
        ds.map_batches(pre, batch_format="pyarrow"),
        "_fk", coarse, bucket_chain).to_pandas()
    agg = parts.groupby("step", as_index=False)["n"].sum()
    out = pd.DataFrame({
        "step": np.arange(1, len(steps) + 1, dtype=np.int64),
        "name": steps,
        "n_reached": [int(agg[agg["step"] == i]["n"].sum())
                      for i in range(len(steps))],
    })
    return out


def cohort_retention(ds, key: str = "user_id", ts_col: str = "ts",
                     anchor_type: str | None = None,
                     type_col: str = "event_type",
                     period_days: int = 7, max_offset: int = 12,
                     coarse: int = FUNNEL_BUCKETS) -> pd.DataFrame:
    """Cohort retention matrix: assign every key (user) to the cohort
    period of its FIRST event (optionally first ``anchor_type``
    event), then count how many of each cohort were active again
    k periods later — the product-analytics retention triangle.

    -> (cohort, offset, n_active) with cohort the epoch-period index
    of the anchor, offset 0..max_offset, n_active the DISTINCT keys
    of that cohort active in cohort+offset. offset 0 row equals
    cohort size by construction.

    Scale shape: one key-bucketed exchange of (key, period) pairs
    pre-DEDUPLICATED per block (a user active 10⁶ times in a week
    ships once per block, not per event); each bucket owns all rows
    of its keys, so anchor selection and offset counting are local —
    what reaches the driver is O(buckets × cohorts × max_offset)
    count partials.

    Semantics notes (mirrored by the SQL oracle): periods are
    ``floor(epoch_microseconds / (period_days·86400·10⁶))`` —
    calendar-agnostic fixed-width buckets (µs floor-division, exactly
    DuckDB's ``epoch_us(ts) // period_us``); activity in the anchor
    period itself is offset 0; offsets beyond ``max_offset`` are
    dropped.
    """
    period_us = np.int64(period_days * 86400) * np.int64(1_000_000)

    def pre(t: pa.Table) -> pa.Table:
        ids = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        ts_us = (t.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
                 .to_numpy(zero_copy_only=False))
        per = ts_us // period_us
        if anchor_type is not None:
            is_anchor = pc.equal(t.column(type_col), anchor_type
                                 ).to_numpy(zero_copy_only=False)
        else:
            is_anchor = np.ones(len(ids), dtype=bool)
        # per-block dedup of (key, period, is_anchor-capable rows kept
        # separately so the bucket can pick the true anchor min)
        rows = np.stack([ids, per, is_anchor.astype(np.int64)], axis=1)
        uniq = np.unique(rows, axis=0)
        with np.errstate(over="ignore"):
            bk = ((uniq[:, 0].astype(np.uint64)
                   * np.uint64(0x9E3779B97F4A7C15))
                  >> np.uint64(52)).astype(np.int32) % coarse
        return pa.table({
            "_fk": pa.array(bk),
            key: pa.array(uniq[:, 0], pa.int64()),
            "per": pa.array(uniq[:, 1], pa.int64()),
            "anch": pa.array(uniq[:, 2] == 1),
        })

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        anchors = (df[df["anch"]].groupby(key, sort=False)["per"].min()
                   .rename("cohort"))
        if not len(anchors):
            return pd.DataFrame({"cohort": pd.Series([], dtype="int64"),
                                 "offset": pd.Series([], dtype="int64"),
                                 "n_active": pd.Series([], dtype="int64")})
        act = df[[key, "per"]].drop_duplicates().merge(
            anchors, left_on=key, right_index=True)
        act["offset"] = act["per"] - act["cohort"]
        act = act[(act["offset"] >= 0) & (act["offset"] <= max_offset)]
        out = (act.groupby(["cohort", "offset"], as_index=False)
               .agg(n_active=(key, "nunique")))
        return out

    from raykg.ops.exchange import hash_exchange

    # fold-safe: bucket_counts re-groups by the key internally and its
    # (cohort, offset) counts are partials the driver sums below
    parts = hash_exchange(
        ds.map_batches(pre, batch_format="pyarrow"),
        "_fk", coarse, bucket_counts).to_pandas()
    out = (parts.groupby(["cohort", "offset"], as_index=False)
           ["n_active"].sum())
    for c in ("cohort", "offset", "n_active"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["cohort", "offset"]).reset_index(drop=True)


def transition_counts(ds, key: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      tiebreak: str = "event_id",
                      coarse: int = FUNNEL_BUCKETS) -> pd.DataFrame:
    """Markov transition matrix over per-key event streams: global
    counts of consecutive (prev, next) event-type pairs when each
    key's events are ordered by (ts, tiebreak) — the first-order
    model behind "what do users do after X" product analytics and
    next-event baselines.

    Scale shape: one key-bucket exchange of the four needed columns;
    each bucket sorts once, computes the within-key shift VECTORIZED
    (a row pairs with its predecessor iff the key matches), and emits
    per-bucket (prev, next, n) partials — the driver folds
    O(buckets × |types|²) rows, never events. Partitioning assumption:
    one key's events fit a task (same bound as ``funnel_counts``)."""
    from raykg.ops.joins import _key_bucket

    def pre(t: pa.Table) -> pa.Table:
        cols = {key: t.column(key), ts_col: t.column(ts_col),
                tiebreak: t.column(tiebreak), type_col: t.column(type_col)}
        return pa.table(cols).append_column(
            "_fk", _key_bucket(t.column(key), coarse))

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tiebreak], kind="mergesort")
        same = df[key].to_numpy()[1:] == df[key].to_numpy()[:-1]
        prev = df[type_col].to_numpy()[:-1][same]
        nxt = df[type_col].to_numpy()[1:][same]
        out = pd.DataFrame({"prev_type": prev, "next_type": nxt})
        return (out.groupby(["prev_type", "next_type"], as_index=False)
                .size().rename(columns={"size": "n"}))

    parts = (ds.map_batches(pre, batch_format="pyarrow")
             .groupby("_fk")
             .map_groups(bucket_pairs, batch_format="pandas")
             .to_pandas())
    out = (parts.groupby(["prev_type", "next_type"], as_index=False)
           ["n"].sum())
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["prev_type", "next_type"])
            .reset_index(drop=True))


def sequence_pattern_match(ds, key_col: str, ts_col: str,
                           tiebreak_col: str, event_col: str,
                           symbols: dict[str, str], pattern: str,
                           coarse: int = 64):
    """MATCH_RECOGNIZE-lite: count non-overlapping regex matches of
    ``pattern`` over each key's event-type SEQUENCE (ordered by
    ``(ts, tiebreak)``) — "users who did view -> any clicks ->
    purchase", the behavioural-pattern query SQL:2016 row pattern
    matching answers, expressed as one regex over a per-key symbol
    string.

    ``symbols`` maps event values to single chars; unmapped events
    become ``'-'`` (a gap that breaks adjacency, the MATCH_RECOGNIZE
    default-skip analogue — patterns can hop gaps explicitly with
    ``[-]*``). Matching is the standard non-overlapping left-to-right
    scan (Python ``re.findall`` == RE2 ``regexp_extract_all`` for
    backreference-free patterns, so a DuckDB
    ``string_agg(ch ORDER BY ts, tiebreak)`` oracle mirrors counts
    exactly).

    Scale shape: rows co-locate by key hash (ONE exchange, the
    sessionize/funnel shape and hot-key caveat — a key's whole
    sequence must fit a task); chars are mapped VECTORIZED via
    factorize + a lookup table, and only the regex scan itself is
    per-key (inherently per-string, the LangId rationale).  Keys with
    zero matches are dropped (bounds output by match support).
    -> Dataset(key, n_events, n_matches).
    """
    import re

    from raykg.ops.joins import _key_bucket

    rx = re.compile(pattern)

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t.column(key_col)))
        return pa.table({
            "k": t.column(key_col),
            "ts": t.column(ts_col),
            "tb": t.column(tiebreak_col),
            "ev": t.column(event_col),
            "_b": _key_bucket(t.column(key_col), coarse),
        })

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["k", "ts", "tb"], kind="stable")
        ev_codes, ev_uniq = pd.factorize(df["ev"], sort=False)
        lut = np.array([symbols.get(v, "-") for v in ev_uniq],
                       dtype="<U1")
        # factorize gives -1 for nulls, which would wrap to the LAST
        # unique's char — nulls are gaps like unmapped events
        chars = np.where(ev_codes >= 0, lut[ev_codes], "-")
        codes, uniq = pd.factorize(df["k"], sort=False)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)]
        out_k, out_n, out_m = [], [], []
        for s, e in zip(starts, ends):
            seq = "".join(chars[s:e])
            m = len(rx.findall(seq))
            if m > 0:
                out_k.append(uniq[codes[s]])
                out_n.append(e - s)
                out_m.append(m)
        return pd.DataFrame({
            key_col: out_k,
            "n_events": np.asarray(out_n, dtype=np.int64),
            "n_matches": np.asarray(out_m, dtype=np.int64),
        })

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(project, batch_format="pyarrow"), "_b",
        coarse, scan)


def window_touch_counts(conv_ds, touch_ds, key: str, conv_ts: str,
                        touch_ts: str, conv_id: str,
                        lookback_us: int, coarse: int = 64):
    """Linear multi-touch attribution support counts: for every
    conversion, the number of SAME-KEY touches in the half-open
    lookback window ``[conv_ts - lookback_us, conv_ts)`` — each touch
    then earns credit 1/n (the linear model; last-touch is the k=1
    sibling, ops/joins.asof_join + attribution_last_touch).

    One tagged-union key-bucket exchange (the asof_join plan); per
    bucket, touches sort once by (ts, id) and every conversion's count
    is TWO vectorized searchsorted probes (upper(conv_ts) −
    lower(conv_ts − lookback)) — O((T + C) log T) per bucket, no pair
    expansion. Timestamps normalized to µs int64 on entry
    (util.ts_to_us — ns inputs and µs windows must not mix).

    -> Dataset(conv_id, key, n_touches, credit): ``credit`` = 1.0/n
    (one float division of exact ints; 0-touch conversions keep
    n_touches 0, credit 0.0 — SQL mirrors with a CASE).
    """
    from raykg.ops.joins import _key_bucket
    from raykg.util import ts_to_us

    def tag_conv(t: pa.Table) -> pa.Table:
        out = pa.table({
            "k": t.column(key).cast(pa.int64()),
            "ts": pa.array(ts_to_us(t.column(conv_ts))),
            "cid": t.column(conv_id).cast(pa.int64()),
            "is_conv": pa.array(np.ones(t.num_rows, np.bool_)),
        })
        return out.append_column("_b", _key_bucket(out.column("k"),
                                                   coarse))

    def tag_touch(t: pa.Table) -> pa.Table:
        out = pa.table({
            "k": t.column(key).cast(pa.int64()),
            "ts": pa.array(ts_to_us(t.column(touch_ts))),
            "cid": pa.array(np.zeros(t.num_rows, np.int64)),
            "is_conv": pa.array(np.zeros(t.num_rows, np.bool_)),
        })
        return out.append_column("_b", _key_bucket(out.column("k"),
                                                   coarse))

    both = (conv_ds.map_batches(tag_conv, batch_format="pyarrow")
            .union(touch_ds.map_batches(tag_touch,
                                        batch_format="pyarrow")))

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"conv_id": pd.array([], "int64"),
                              "key": pd.array([], "int64"),
                              "n_touches": pd.array([], "int64"),
                              "credit": pd.array([], "float64")})
        conv = df[df["is_conv"]]
        if not len(conv):
            return empty
        touch = df[~df["is_conv"]]
        ck = conv["k"].to_numpy(np.int64)
        cts = conv["ts"].to_numpy(np.int64)
        tk = touch["k"].to_numpy(np.int64)
        tts = touch["ts"].to_numpy(np.int64)
        # vectorized per-key window count: fold (key, ts) into ONE
        # sortable int64 — dense key ids × the bucket's clamped time
        # span (probe floors at tmin, so the lookback edge never
        # underflows into the previous key's range)
        keys = np.unique(np.concatenate([ck, tk]))
        dk_c = np.searchsorted(keys, ck)
        if len(tts):
            tmin = int(tts.min())
            span = int(tts.max()) - tmin + 2
        else:
            tmin, span = 0, 2
        if len(keys) * span >= (1 << 62):  # composite would overflow:
            raise ValueError("window_touch_counts: key x time-span "
                             "domain exceeds int64 — shrink the bucket "
                             "time range or raise coarse")
        comp_t = np.sort(np.searchsorted(keys, tk) * span + (tts - tmin))
        hi = np.searchsorted(
            comp_t, dk_c * span + np.clip(cts - tmin, 0, span - 1))
        lo = np.searchsorted(
            comp_t, dk_c * span + np.clip(cts - lookback_us - tmin,
                                          0, span - 1))
        n = (hi - lo).astype(np.int64)
        out = pd.DataFrame({
            "conv_id": conv["cid"].to_numpy(np.int64),
            "key": ck, "n_touches": n,
        })
        out["credit"] = np.where(n > 0, 1.0 / np.where(n > 0, n, 1), 0.0)
        return out

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(both, "_b", coarse, count_bucket)
