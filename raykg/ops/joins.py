"""Join operators Ray Data lacks natively, built as compositions.

As-of join (the classic "latest right row at-or-before the left
timestamp" lookup): both sides are hash-bucketed by join key into a
bounded number of coarse buckets (ONE shuffle in total, expressed as a
tagged union + groupby), and each bucket answers all of its keys with a
per-key sort + ``np.searchsorted`` — vectorized over the left rows of
the key, no row loop.

Hash equi-join (``hash_join``): the large×large shuffle join — neither
side is broadcast. Same tagged-union single-shuffle shape; each coarse
bucket runs one vectorized ``pd.merge``. This is the operator the
reference's entity-metadata join needs at its 5.9 M-entity scale
(``pipeline/indexer/main.py:97-135``) once the dimension side outgrows
``ray.put`` broadcast, and what MinHash verification uses to rejoin
candidate ids with corpus text without a driver hop.

Partitioning assumption (documented per the custom-operator contract):
all rows of one coarse BUCKET fit in one group task. ``coarse`` spreads
the key space uniformly (multiply-shift on int keys, FNV on strings);
raise it so that |input| / coarse fits worker memory. A single hot KEY
larger than a bucket would need per-key salting of the small-multiplied
side, which these corpora do not exhibit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

ASOF_BUCKETS = 256
JOIN_BUCKETS = 256
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _schema_types(ds) -> dict[str, pa.DataType]:
    """Column name -> pyarrow type for a Dataset whose schema may be an
    Arrow schema or a PandasBlockSchema (from_pandas inputs)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return {f.name: f.type for f in base}
    out: dict[str, pa.DataType] = {}
    for n, t in zip(base.names, base.types):
        try:
            out[n] = pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            out[n] = pa.string()
    return out


def _bucket_of(keys: np.ndarray, coarse: int) -> pa.Array:
    return pa.array(
        ((keys.astype(np.uint64) * _GOLDEN) >> np.uint64(52))
        % np.uint64(coarse),
        type=pa.int32(),
    )


def _key_bucket(col: pa.ChunkedArray | pa.Array, coarse: int) -> pa.Array:
    """Bucket id for an int OR string key column."""
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        from raykg.util import hash_strings

        keys = hash_strings(col.to_pylist())
    else:
        keys = col.to_numpy(zero_copy_only=False).astype(np.int64)
    return _bucket_of(np.asarray(keys), coarse)


def hash_join(
    left_ds,
    right_ds,
    on: str,
    right_on: str | None = None,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    how: str = "inner",
    coarse: int = JOIN_BUCKETS,
    left_types: dict[str, pa.DataType] | None = None,
    right_types: dict[str, pa.DataType] | None = None,
    max_group: int | None = None,
    n_salts: int = 16,
):
    """Distributed hash equi-join of two LARGE datasets — one shuffle,
    no broadcast side, no driver materialization.

    Both sides are tagged with ``_bucket = h(key) % coarse`` and
    union-ed (so the exchange is a single groupby); each bucket group
    does a vectorized ``pd.merge`` of its two sides. ``how`` is
    ``inner``, ``left``, ``right``, ``outer`` (full outer — unmatched
    rows of BOTH sides survive with nulls on the other side's
    columns), ``semi`` (left rows with >=1 match, emitted once, left
    columns only) or ``anti`` (left rows with no match, left columns
    only) — the two filters a user reaches for when the filter side
    outgrows a ``ray.put`` broadcast. Output columns:
    ``[on] + left_cols + right_cols`` (the right key is renamed onto
    ``on``; all output names must be distinct). Pass
    ``left_types``/``right_types`` (name -> pa.DataType for the key +
    requested columns) when a side is a still-lazy pipeline whose
    ``schema()`` would otherwise trigger execution.

    HOT-KEY SALTING (``max_group``, inner/left/semi/anti only): a
    pre-aggregated census of the LEFT side finds keys with more than
    ``max_group`` left rows; their left rows are spread over
    ``n_salts`` sub-buckets and the matching RIGHT rows are replicated
    to every sub-bucket, so output is identical to the unsalted plan
    while no single group task holds more than ~max_group left rows of
    one key. Costs one extra streaming pass over the left key column.
    A key hot on the RIGHT side is not split (its inner-join output is
    inherently |L_k|x|R_k| — replication cannot reduce that); for
    ``right``/``outer`` pass ``max_group=None`` (swap the sides for a
    left-heavy right join).
    """
    if how not in ("inner", "left", "right", "outer", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    if max_group is not None and how in ("right", "outer"):
        raise ValueError("hot-key salting replicates right rows; "
                         "unsupported for how='right'/'outer'")
    right_on = right_on or on
    left_cols = list(left_cols or [])
    right_cols = list(right_cols or [])
    if how in ("semi", "anti"):
        if right_cols:
            raise ValueError(f"how={how!r} emits left columns only")
        # the filter side needs just its key — ship one column
        right_cols = []
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"output name collision: {sorted(overlap)}")
    ltypes = left_types or _schema_types(left_ds)
    # no right output columns -> the right schema is never consulted
    # (and a lazy right pipeline need not execute for it)
    rtypes = right_types or ({} if not right_cols else _schema_types(right_ds))

    hot_ref = None
    if max_group is not None:
        from ray.data.aggregate import Sum

        def _count(b: pa.Table) -> pa.Table:
            keys, counts = np.unique(
                b.column(on).to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table({on: pa.array(keys),
                             "_n": pa.array(counts, pa.int64())})

        def _hot_only(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.filter(
                pc.greater(b.column("_n"), pa.scalar(max_group))
            ).select([on])

        hot = (
            left_ds.map_batches(_count, batch_format="pyarrow")
            .groupby(on)
            .aggregate(Sum("_n", alias_name="_n"))
            .map_batches(_hot_only, batch_format="pyarrow")
            .to_pandas()[on]
            .to_numpy()
        )  # only keys hotter than max_group reach the driver
        if len(hot):
            hot_ref = ray.put(np.unique(hot))

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {on: batch.column(on)}
        for c in left_cols:
            cols[c] = batch.column(c)
        for c in right_cols:
            cols[c] = pa.nulls(batch.num_rows, type=rtypes[c])
        t = pa.table(cols)
        bucket = _key_bucket(batch.column(on), coarse).to_numpy().copy()
        if hot_ref is not None:
            keys_np = batch.column(on).to_numpy(zero_copy_only=False)
            mask = np.isin(keys_np, ray.get(hot_ref))
            if mask.any():
                salt = np.arange(int(mask.sum()), dtype=np.int64) % n_salts
                bucket[mask] += coarse * salt
        t = t.append_column("_bucket", pa.array(bucket, type=pa.int32()))
        return t.append_column(
            "_side", pa.array(np.zeros(t.num_rows, dtype=np.int8))
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        if how in ("semi", "anti"):
            # only key MEMBERSHIP matters — local pre-dedup cuts the
            # shuffle to distinct keys per block
            import pyarrow.compute as pc

            keys = batch.column(right_on)
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            batch = pa.table({right_on: pc.unique(keys)})
        if hot_ref is not None and batch.num_rows:
            keys_np = batch.column(right_on).to_numpy(zero_copy_only=False)
            mask = np.isin(keys_np, ray.get(hot_ref))
            if mask.any():
                # replicate hot-key right rows to every salted sub-
                # bucket so each left salt group sees the full match set
                idx = np.concatenate([
                    np.where(~mask)[0],
                    np.repeat(np.where(mask)[0], n_salts),
                ])
                salt = np.concatenate([
                    np.zeros((~mask).sum(), dtype=np.int64),
                    np.tile(np.arange(n_salts, dtype=np.int64),
                            int(mask.sum())),
                ])
                batch = batch.take(pa.array(idx))
                base = _key_bucket(batch.column(right_on), coarse).to_numpy()
                bucket = base + coarse * salt
            else:
                bucket = _key_bucket(batch.column(right_on), coarse).to_numpy()
        else:
            bucket = _key_bucket(batch.column(right_on), coarse).to_numpy()
        cols = {on: batch.column(right_on)}
        for c in left_cols:
            cols[c] = pa.nulls(batch.num_rows, type=ltypes[c])
        for c in right_cols:
            cols[c] = batch.column(c)
        t = pa.table(cols)
        t = t.append_column("_bucket", pa.array(bucket, type=pa.int32()))
        return t.append_column(
            "_side", pa.array(np.ones(t.num_rows, dtype=np.int8))
        )

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    out_cols = [on] + left_cols + right_cols

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == 0][[on] + left_cols]
        right = g[g["_side"] == 1][[on] + right_cols]
        if how == "semi":
            res = left[left[on].isin(right[on])]
        elif how == "anti":
            res = left[~left[on].isin(right[on])]
        else:
            res = left.merge(right, on=on, how=how)
        return res[out_cols]

    # raw-task routing exchange instead of the groupby sort-shuffle:
    # the bucket column already encodes the partitioning, so the sort
    # machinery's fixed cost (~4-7 s at 256 buckets) buys nothing
    from raykg.ops.exchange import hash_exchange

    # salted hot keys occupy buckets up to coarse*n_salts — the
    # exchange must keep them separate (rights are replicated per
    # salt; folding them back would duplicate matches)
    # salted hot keys replicate rights once per salt sub-bucket, so
    # bucket folding would duplicate matches - disable adaptation then
    n_buckets = coarse * (n_salts if hot_ref is not None else 1)
    merged = hash_exchange(tagged, "_bucket", n_buckets, merge_bucket,
                           adaptive=hot_ref is None)

    def finalize(t: pa.Table) -> pa.Table:
        # the union made both sides nullable and pandas may have widened
        # dtypes — cast back to the source schemas (right cols stay
        # nullable under how='left')
        import pyarrow.compute as pc

        for c in out_cols:
            want = ltypes.get(c) if (c == on or c in left_cols) else rtypes.get(c)
            if want is None:
                continue
            i = t.column_names.index(c)
            col = t.column(c)
            if col.type != want:
                if pa.types.is_floating(col.type) and pa.types.is_integer(want):
                    # unmatched left-join rows: NaN -> null before the cast
                    col = pc.if_else(
                        pc.is_nan(col), pa.nulls(len(col), type=col.type), col
                    )
                t = t.set_column(i, c, col.cast(want))
        return t

    return merged.map_batches(finalize, batch_format="pyarrow")


ASOF_MAX_GROUP = 500_000  # rows of one key a single merge task may hold
ASOF_SALTS = 16


def asof_join(
    left_ds,
    right_ds,
    key: str,
    right_key: str,
    ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    fill: dict | None = None,
    coarse: int = ASOF_BUCKETS,
    max_group: int = ASOF_MAX_GROUP,
    n_salts: int = ASOF_SALTS,
    census: bool = True,
    direction: str = "backward",
    tolerance: int | None = None,
):
    """For each left row: the right row of the same key with the
    greatest ``right_ts`` <= left ``ts`` (``direction='backward'``,
    the default), the smallest ``right_ts`` >= ``ts`` (``'forward'``),
    or whichever of the two is closer in absolute distance
    (``'nearest'``, exact ties resolving backward — pandas
    ``merge_asof`` semantics, pinned in tests). Ties on right_ts
    resolve to the row with the max first requested right column in
    every direction. Unmatched left rows take ``fill[col]`` (required
    for every right col, so output dtypes stay stable).

    ``'forward'`` is computed as the backward as-of on the NEGATED
    time axis — one extra stateless map per side, after which the
    whole plan (single tagged-union shuffle, hot-key time-range
    salting, prefix injection) applies unchanged: the backward path's
    latest-earlier-range prefix row IS the earliest-later-range
    suffix on the original axis. ``'nearest'`` augments each salted
    range with BOTH boundary rows (prefix and suffix) so the closer
    neighbour is always in-range.

    HOT-KEY SPLITTING: a pre-aggregated census finds keys whose
    combined row count exceeds ``max_group``; their rows are salted
    into contiguous TIME RANGES. Each (key, range) group answers its
    left rows from the rights in-range plus one injected PREFIX row —
    the latest right from all earlier ranges (computed in a bounded
    per-(key, range) reduction, hot_keys × n_salts rows on the driver)
    — so output is identical to the unsalted path. Identical
    timestamps share a range, so cross-boundary ties cannot occur.

    Returns a Dataset with columns ``[key, ts] + left_cols +
    right_cols``.

    ``census=False`` skips the hot-key pre-pass (one full extra read of
    both sides) — a metadata hint for callers who KNOW no key's
    combined row count exceeds ``max_group``; such a key then lands in
    one group task anyway.

    ``tolerance`` (pandas ``merge_asof`` parity — the attribution /
    staleness window): a match further than this from the left ``ts``
    is rejected and the row takes ``fill`` instead.  MICROSECONDS for
    timestamp axes, axis units for integer axes.  Implemented as a
    composition: the right side carries a copy of its own timestamp
    through the join, and one stateless post-map clamps out-of-window
    matches — the shuffle plan, salting, and tie rules are untouched.
    """
    if tolerance is not None:
        return _asof_with_tolerance(
            left_ds, right_ds, key, right_key, ts, right_ts,
            left_cols, right_cols, fill=fill, coarse=coarse,
            max_group=max_group, n_salts=n_salts, census=census,
            direction=direction, tolerance=tolerance)
    if direction == "forward":
        return _asof_forward(
            left_ds, right_ds, key, right_key, ts, right_ts,
            left_cols, right_cols, fill=fill, coarse=coarse,
            max_group=max_group, n_salts=n_salts, census=census)
    if direction not in ("backward", "nearest"):
        raise ValueError(f"unsupported direction={direction!r}")
    nearest = direction == "nearest"
    fill = fill or {}
    ltypes = _schema_types(left_ds)
    rtypes = _schema_types(right_ds)

    # ---- hot-key census over BOTH sides (partial per batch, small
    # grouped combine; only hot rows reach the driver)
    def census(col_key, col_ts):
        def part(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(col_key, as_index=False).agg(
                _n=(col_ts, "size"), _tmin=(col_ts, "min"),
                _tmax=(col_ts, "max"),
            )
            return g.rename(columns={col_key: key})

        return part

    cens = (
        left_ds.map_batches(census(key, ts), batch_format="pandas")
        .union(right_ds.map_batches(census(right_key, right_ts),
                                    batch_format="pandas"))
        .groupby(key)
        .map_groups(
            lambda g: (lambda row: row[row["_n"] > max_group])(
                pd.DataFrame({
                    key: [g[key].iloc[0]],
                    "_n": [int(g["_n"].sum())],
                    "_tmin": [g["_tmin"].min()],
                    "_tmax": [g["_tmax"].max()],
                })
            ),
            batch_format="pandas",
        )
        .to_pandas()
    ) if census else pd.DataFrame()
    hot_map = {
        r[key]: (
            pd.Timestamp(r["_tmin"]).value,
            max(pd.Timestamp(r["_tmax"]).value
                - pd.Timestamp(r["_tmin"]).value, 1),
        )
        for _, r in cens.iterrows()
    } if len(cens) else {}
    hot_ref = ray.put(hot_map) if hot_map else None

    def _salts(keys_np, ts_vals) -> np.ndarray:
        salt = np.zeros(len(keys_np), dtype=np.int64)
        if hot_ref is not None:
            hm = ray.get(hot_ref)
            t0s = pd.Series(keys_np).map({k: v[0] for k, v in hm.items()})
            ws = pd.Series(keys_np).map({k: v[1] for k, v in hm.items()})
            mask = t0s.notna().to_numpy()
            if mask.any():
                tns = ts_vals[mask]
                t0 = t0s.to_numpy(dtype="float64")[mask].astype(np.int64)
                w = ws.to_numpy(dtype="float64")[mask].astype(np.int64)
                salt[mask] = np.minimum((tns - t0) * n_salts // w, n_salts - 1)
        return salt

    def tag_left(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        cols = {key: batch.column(key), ts: batch.column(ts)}
        for c in left_cols:
            cols[c] = batch.column(c)
        for c in right_cols:
            cols["_r_" + c] = pa.nulls(batch.num_rows, type=rtypes[c])
        t = pa.table(cols)
        salt = _salts(
            keys,
            batch.column(ts).cast(pa.timestamp("ns")).cast(pa.int64())
            .to_numpy(zero_copy_only=False),
        )
        t = t.append_column("_salt", pa.array(salt))
        t = t.append_column(
            "_bucket",
            pa.array(
                (np.asarray(_bucket_of(keys, coarse)) + salt) % coarse,
                type=pa.int32(),
            ),
        )
        return t.append_column(
            "_side", pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        keys = batch.column(right_key).to_numpy(zero_copy_only=False)
        cols = {key: batch.column(right_key), ts: batch.column(right_ts)}
        for c in left_cols:
            cols[c] = pa.nulls(batch.num_rows, type=ltypes[c])
        for c in right_cols:
            cols["_r_" + c] = batch.column(c)
        t = pa.table(cols)
        salt = _salts(
            keys,
            batch.column(right_ts).cast(pa.timestamp("ns")).cast(pa.int64())
            .to_numpy(zero_copy_only=False),
        )
        t = t.append_column("_salt", pa.array(salt))
        t = t.append_column(
            "_bucket",
            pa.array(
                (np.asarray(_bucket_of(keys, coarse)) + salt) % coarse,
                type=pa.int32(),
            ),
        )
        return t.append_column(
            "_side", pa.array(np.ones(batch.num_rows, dtype=np.int8))
        )

    # ---- per-(hot key, range) boundary rows, bounded at
    # hot_keys × n_salts driver rows: the PREFIX (latest right row of
    # every earlier range — max right_ts, tie by max first right col,
    # the merge's own rule) and, for direction='nearest', also the
    # SUFFIX (earliest right row of every later range — min right_ts,
    # same col tie rule) so the closer neighbour is always in-range.
    def _boundary_ref(latest: bool):
        col0 = right_cols[0]
        sort_cols = [right_ts, col0]
        asc = [True, True] if latest else [True, False]

        def pick(df: pd.DataFrame) -> pd.DataFrame:
            g = df.sort_values(sort_cols, ascending=asc, kind="mergesort")
            g = g.groupby([right_key, "_salt"], as_index=False)
            return g.tail(1) if latest else g.head(1)

        def local_pick(df: pd.DataFrame) -> pd.DataFrame:
            hm = ray.get(hot_ref)
            df = df[df[right_key].isin(list(hm))]
            if not len(df):
                return df.assign(_salt=pd.Series([], dtype="int64"))
            salt = _salts(
                df[right_key].to_numpy(),
                df[right_ts].astype("datetime64[ns]").astype("int64").to_numpy(),
            )
            return pick(df.assign(_salt=salt))

        picks = (
            right_ds.map_batches(local_pick, batch_format="pandas")
            .groupby([right_key, "_salt"])
            .map_groups(pick, batch_format="pandas")
            .to_pandas()
        )
        out: dict = {}
        for k, kg in picks.groupby(right_key):
            best = None
            rows = {int(r["_salt"]): r for _, r in kg.iterrows()}
            seq = range(1, n_salts) if latest else range(n_salts - 2, -1, -1)
            for s in seq:
                cand = rows.get(s - 1 if latest else s + 1)
                if cand is not None:
                    if best is None:
                        best = cand
                    elif latest and (
                        (cand[right_ts], cand[col0])
                        >= (best[right_ts], best[col0])
                    ):
                        best = cand
                    elif not latest and (
                        cand[right_ts] < best[right_ts]
                        or (cand[right_ts] == best[right_ts]
                            and cand[col0] > best[col0])
                    ):
                        best = cand
                if best is not None:
                    out[(k, s)] = {
                        ts: best[right_ts],
                        **{"_r_" + c: best[c] for c in right_cols},
                    }
        return ray.put(out)

    prefix_ref = _boundary_ref(True) if hot_map else None
    suffix_ref = _boundary_ref(False) if (hot_map and nearest) else None

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def _merge_fast(g: pd.DataFrame):
        """Vectorized backward-asof across MANY keys at once (the
        point-in-time / fact-to-dimension regime: 10⁵ keys × a few
        rows each, where the per-key pandas loop pays 10⁵ × group
        overhead — measured 300 s CPU at sf0.1 vs ~1 s vectorized).
        Folds (key, salt, ts) into ONE sortable int64 (dense (key,
        salt) rank × the bucket's clamped time span) so every left
        row's match is a single searchsorted probe over the
        (dense, ts, tiebreak)-sorted rights. Returns None when the
        encoding can't hold the domain (string keys, float axis,
        |key| ≥ 2⁵⁵, span overflow) — caller falls back to the loop.
        Backward-only; injected boundary rows and 'nearest' use the
        loop."""
        out_cols = [key, ts] + left_cols + right_cols
        left = g[g["_side"] == 0]
        if not len(left):
            return pd.DataFrame({c: [] for c in out_cols})
        right = g[g["_side"] == 1]

        def as_int(a):
            if np.issubdtype(a.dtype, np.datetime64):
                return a.astype("datetime64[ns]").astype(np.int64)
            if np.issubdtype(a.dtype, np.integer):
                return a.astype(np.int64)
            return None

        lk_raw = left[key].to_numpy()
        rk_raw = right[key].to_numpy()
        if not (np.issubdtype(lk_raw.dtype, np.integer)
                and (len(right) == 0
                     or np.issubdtype(rk_raw.dtype, np.integer))):
            return None
        lts = as_int(left[ts].to_numpy())
        rts = as_int(right[ts].to_numpy()) if len(right) else \
            np.zeros(0, np.int64)
        if lts is None or rts is None:
            return None
        res = left[[key, ts] + left_cols].reset_index(drop=True)
        if not len(right):
            for c in right_cols:
                res[c] = pd.Series([fill.get(c)] * len(left)).to_numpy()
            return res[out_cols]
        lk = lk_raw.astype(np.int64)
        rk = rk_raw.astype(np.int64)
        if max(np.abs(lk).max(initial=0),
               np.abs(rk).max(initial=0)) >= (1 << 55):
            return None
        lsalt = left["_salt"].to_numpy(np.int64)
        rsalt = right["_salt"].to_numpy(np.int64)
        # (key, salt) packs as key*256 + salt; a salt >= 256 would
        # alias (k, 256) onto (k+1, 0) — fall back to the loop path.
        if max(lsalt.max(initial=0), rsalt.max(initial=0)) >= 256:
            return None
        comb_l = lk.astype(np.uint64) * np.uint64(256) \
            + lsalt.astype(np.uint64)
        comb_r = rk.astype(np.uint64) * np.uint64(256) \
            + rsalt.astype(np.uint64)
        uniq = np.unique(np.concatenate([comb_l, comb_r]))
        dl = np.searchsorted(uniq, comb_l).astype(np.int64)
        dr = np.searchsorted(uniq, comb_r).astype(np.int64)
        tsmin = int(rts.min())
        span = int(rts.max()) - tsmin + 2
        if len(uniq) * span >= (1 << 62):
            return None
        col0 = "_r_" + right_cols[0]
        rdf = right.assign(_dk=dr, _tsi=rts).sort_values(
            ["_dk", ts, col0], kind="mergesort")
        rcomp = (rdf["_dk"].to_numpy(np.int64) * span
                 + (rdf["_tsi"].to_numpy(np.int64) - tsmin))
        probe = dl * span + np.clip(lts - tsmin, 0, span - 1)
        idx = np.searchsorted(rcomp, probe, side="right") - 1
        safe = np.clip(idx, 0, None)
        valid = ((idx >= 0)
                 & (rdf["_dk"].to_numpy(np.int64)[safe] == dl)
                 & (rdf["_tsi"].to_numpy(np.int64)[safe] <= lts))
        for c in right_cols:
            vals = pd.Series(rdf["_r_" + c].to_numpy()[safe]).where(
                valid, fill.get(c))
            res[c] = vals.to_numpy()
        return res[out_cols]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pfx = ray.get(prefix_ref) if prefix_ref is not None else {}
        sfx = ray.get(suffix_ref) if suffix_ref is not None else {}
        if not pfx and not sfx and not nearest:
            fast = _merge_fast(g)
            if fast is not None:
                return fast
        parts = []
        for (k, s), kg in g.groupby([key, "_salt"], sort=False):
            left = kg[kg["_side"] == 0]
            if len(left) == 0:
                continue
            right = kg[kg["_side"] == 1]
            inj_rows = [r for r in (pfx.get((k, int(s))),
                                    sfx.get((k, int(s)))) if r is not None]
            if inj_rows:
                new_rows = []
                for inj in inj_rows:
                    inj_row = {key: k, "_side": np.int8(1), "_salt": s,
                               **inj}
                    for c in left_cols:
                        inj_row.setdefault(c, None)
                    new_rows.append(inj_row)
                right = pd.concat(
                    [right, pd.DataFrame(new_rows)], ignore_index=True
                )
            right = right.sort_values([ts, "_r_" + right_cols[0]])
            res = left[[key, ts] + left_cols].reset_index(drop=True)
            if len(right):
                rts_v = right[ts].to_numpy()
                lts_v = left[ts].to_numpy()
                idx = np.searchsorted(rts_v, lts_v, side="right") - 1
                if nearest:
                    nr = len(right)
                    idx_f = np.searchsorted(rts_v, lts_v, side="left")
                    if_ok = idx_f < nr
                    # forward hit lands on the FIRST row of an equal-
                    # right_ts run; realign to the last (max first
                    # right col — the shared tie rule)
                    idx_fc = np.clip(idx_f, 0, nr - 1)
                    idx_fa = np.searchsorted(
                        rts_v, rts_v[idx_fc], side="right") - 1
                    ib_ok = idx >= 0
                    if np.issubdtype(rts_v.dtype, np.datetime64):
                        li = lts_v.astype("datetime64[ns]").astype("int64")
                        ri = rts_v.astype("datetime64[ns]").astype("int64")
                        big = np.iinfo(np.int64).max
                    else:
                        li = lts_v.astype(np.float64)
                        ri = rts_v.astype(np.float64)
                        big = np.inf
                    d_b = np.where(ib_ok, li - ri[np.clip(idx, 0, None)],
                                   big)
                    d_f = np.where(if_ok, ri[idx_fc] - li, big)
                    # strict <: exact-distance ties resolve backward
                    idx = np.where(if_ok & (d_f < d_b), idx_fa, idx)
            else:
                idx = np.full(len(left), -1)
            for c in right_cols:
                if len(right):
                    vals = pd.Series(
                        right["_r_" + c].to_numpy()[np.clip(idx, 0, None)]
                    ).where(idx >= 0, fill.get(c))
                else:
                    vals = pd.Series([fill.get(c)] * len(left))
                res[c] = vals.to_numpy()
            parts.append(res)
        cols = [key, ts] + left_cols + right_cols
        if not parts:
            return pd.DataFrame({c: [] for c in cols})
        return pd.concat(parts, ignore_index=True)[cols]

    # raw-task routing exchange instead of the groupby sort-shuffle:
    # the bucket column already encodes the partitioning, so the sort
    # machinery's fixed cost (~4-7 s at 256 buckets) buys nothing
    from raykg.ops.exchange import hash_exchange

    merged = hash_exchange(tagged, "_bucket", coarse, merge_bucket)

    def finalize(t: pa.Table) -> pa.Table:
        # the union made left columns nullable, which pandas widened to
        # float64 — cast back to the left schema's dtypes
        for c in [key, ts] + left_cols:
            want = ltypes.get(c)
            if want is None:
                continue
            i = t.column_names.index(c)
            if t.schema.field(c).type != want:
                t = t.set_column(i, c, t.column(c).cast(want))
        return t

    return merged.map_batches(finalize, batch_format="pyarrow")


def _asof_with_tolerance(left_ds, right_ds, key, right_key, ts, right_ts,
                         left_cols, right_cols, fill, tolerance, **kwargs):
    """asof_join with a max match distance: the right side carries a
    copy of its timestamp (``_asof_match_ts``) through the ordinary
    join; a stateless post-map rejects matches with
    ``|left ts − matched right ts| > tolerance`` (µs for timestamp
    axes), resetting the right columns to ``fill``.  Unmatched rows
    (null match ts) pass through already filled."""
    MATCH = "_asof_match_ts"
    fills = fill or {}

    def copyts(t: pa.Table) -> pa.Table:
        return t.append_column(MATCH, t.column(right_ts))

    inner = asof_join(
        left_ds, right_ds.map_batches(copyts, batch_format="pyarrow"),
        key, right_key, ts, right_ts, left_cols,
        list(right_cols) + [MATCH],
        fill={**fills, MATCH: None}, tolerance=None, **kwargs)

    def clamp(df: pd.DataFrame) -> pd.DataFrame:
        lt, mt = df[ts], df[MATCH]
        ok = mt.notna().to_numpy()
        if np.issubdtype(lt.dtype, np.datetime64):
            lv = lt.to_numpy().astype("datetime64[ns]").astype("int64")
            mv = np.where(
                ok,
                mt.to_numpy().astype("datetime64[ns]").astype("int64"),
                np.int64(0))
            tol = np.int64(tolerance) * 1000  # µs -> ns
        else:
            lv = lt.to_numpy().astype(np.int64)
            mv = np.where(ok, mt.fillna(0).to_numpy().astype(np.int64),
                          np.int64(0))
            tol = np.int64(tolerance)
        within = ok & (np.abs(lv - mv) <= tol)
        for c in right_cols:
            df[c] = df[c].where(within, fills.get(c))
        return df.drop(columns=[MATCH])

    return inner.map_batches(clamp, batch_format="pandas")


def _asof_forward(left_ds, right_ds, key, right_key, ts, right_ts,
                  left_cols, right_cols, **kwargs):
    """direction='forward' as-of: the backward as-of on the NEGATED
    time axis (greatest -right_ts <= -ts  ==  smallest right_ts >=
    ts). One extra stateless map per side builds the negated int64
    axis; everything else — the single shuffle, hot-key time-range
    salting, prefix injection (which becomes the suffix on the
    original axis), the max-first-right-col tie rule — applies
    unchanged. Timestamps or integer time axes only (same cast
    contract as the backward path)."""
    import pyarrow.compute as pc

    def neg(col):
        def fn(t: pa.Table) -> pa.Table:
            v = t.column(col).cast(pa.timestamp("ns")).cast(pa.int64())
            return t.append_column("_negts", pc.negate_checked(v))
        return fn

    left2 = left_ds.map_batches(neg(ts), batch_format="pyarrow")
    right2 = right_ds.map_batches(neg(right_ts), batch_format="pyarrow")
    inner = asof_join(
        left2, right2, key, right_key, "_negts", "_negts",
        [ts] + left_cols, right_cols, direction="backward", **kwargs)

    out_cols = [key, ts] + list(left_cols) + list(right_cols)

    def strip(t: pa.Table) -> pa.Table:
        return t.select(out_cols)

    return inner.map_batches(strip, batch_format="pyarrow")


BROADCAST_JOIN_BYTES = 64 << 20  # small side under this -> map-side join

# Worker-local deserialization cache for broadcast join sides: a
# pandas frame in the object store is PICKLED, so every ray.get in
# every map task re-deserializes it (unlike numpy/Arrow zero-copy
# reads). One frame per worker process is the right cost; bounded so
# a long session over many joins can't hoard frames.
_BCAST_CACHE: "dict[str, object]" = {}
_BCAST_CACHE_MAX = 4


def _get_broadcast(ref):
    key = ref.hex()
    hit = _BCAST_CACHE.get(key)
    if hit is None:
        if len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        hit = _BCAST_CACHE[key] = ray.get(ref)
    return hit


@ray.remote
def _assemble_broadcast_side(block_refs, right_on, on, keys_only,
                             cols=None):
    """Build the broadcast payload ON A WORKER from the right side's
    block refs: the driver passes refs only and never materializes the
    table (the same pattern as the sharded triples uri map,
    raykg/pipeline.py). Returns the sorted unique key array for
    semi/anti, else the renamed pandas frame for pd.merge.

    Columns are selected PER BLOCK before combining: Ray Data can emit
    blocks whose schemas differ by extra columns (an upstream-select
    that left some blocks with the pre-select schema), which breaks a
    whole-table concat but not a per-block projection.

    Blocks may arrive as PANDAS frames despite ``to_arrow_refs``: Ray
    skips the UDF on empty blocks, so an empty pandas block from an
    upstream ``map_groups`` flows through any later Arrow-format map
    (and ``to_arrow_refs``) unconverted — normalize per block."""
    raw = ray.get(block_refs)
    blocks = []
    for b in raw:
        if isinstance(b, pa.Table):
            if b.num_rows:
                blocks.append(b)
        elif len(b):
            blocks.append(pa.Table.from_pandas(b, preserve_index=False))
    if keys_only:
        parts = [b.column(right_on).to_numpy(zero_copy_only=False)
                 for b in blocks]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))
    want = cols if cols is not None else [right_on]
    kept = [b.select(want) for b in blocks]
    t = pa.concat_tables(kept) if kept else None
    df = (t.to_pandas() if t is not None
          else pd.DataFrame({c: [] for c in want}))
    return df.rename(columns={right_on: on})


def auto_join(
    left_ds,
    right_ds,
    on: str,
    right_on: str | None = None,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    how: str = "inner",
    broadcast_limit_bytes: int = BROADCAST_JOIN_BYTES,
    **hash_join_kwargs,
):
    """Equi-join that picks its physical plan from the RIGHT side's
    measured size — the decision every query engine makes and a user
    should not have to: under ``broadcast_limit_bytes`` the right side
    is assembled once BY A WORKER into the object store (the driver
    only routes block refs — it never holds the table), and every left
    block joins map-side with zero shuffle (the reference-scale dimension
    tables: region/nation at any SF); over it, the tagged-union
    shuffle ``hash_join`` runs (the 5.9 M-entity metadata join shape).

    ``size_bytes()`` is metadata-derived for parquet inputs (no
    execution); a lazy right pipeline without size metadata executes
    to count — pass an explicit plan via ``hash_join`` directly when
    that matters. Output contract matches ``hash_join``:
    ``[on] + left_cols + right_cols``, same ``how`` semantics.
    """
    try:
        sz = right_ds.size_bytes()
    except Exception:
        sz = None
    # right/full-outer must see the unmatched RIGHT rows, which the
    # map-side broadcast plan structurally cannot emit (each left block
    # observes only its own matches) — always take the shuffle plan.
    if how in ("right", "outer") or sz is None or sz > broadcast_limit_bytes:
        return hash_join(left_ds, right_ds, on, right_on=right_on,
                         left_cols=left_cols, right_cols=right_cols,
                         how=how, **hash_join_kwargs)

    right_on = right_on or on
    left_cols = list(left_cols or [])
    right_cols = list(right_cols or [])
    if how in ("semi", "anti") and right_cols:
        raise ValueError(f"how={how!r} emits left columns only")
    # Worker-side collect: the right side's blocks stay in the object
    # store (to_arrow_refs gives refs, not bytes); one remote task
    # concatenates them and the RESULT ref is what map tasks read. The
    # driver never holds the table — only refs — so a right side near
    # broadcast_limit_bytes costs the driver nothing.
    block_refs = right_ds.select_columns([right_on] + right_cols).to_arrow_refs()
    rdf_ref = _assemble_broadcast_side.remote(
        list(block_refs), right_on, on, how in ("semi", "anti"),
        cols=[right_on] + right_cols,
    )
    if how in ("semi", "anti"):
        keys_ref = rdf_ref

        def filter_block(t: pa.Table) -> pa.Table:
            keys = _get_broadcast(keys_ref)
            hit = np.isin(t.column(on).to_numpy(zero_copy_only=False), keys)
            return t.select([on] + left_cols).filter(
                pa.array(hit if how == "semi" else ~hit)
            )

        return left_ds.map_batches(filter_block, batch_format="pyarrow")

    def join_block(df: pd.DataFrame) -> pd.DataFrame:
        r = _get_broadcast(rdf_ref)
        out = df[[on] + left_cols].merge(r, on=on, how=how)
        return out[[on] + left_cols + right_cols]

    return left_ds.map_batches(join_block, batch_format="pandas")


INTERVAL_CHUNK_MINUTES = 60


def interval_join(
    left_ds,
    intervals_ds,
    ts_col: str,
    start_col: str,
    end_col: str,
    left_cols: list[str] | None = None,
    interval_cols: list[str] | None = None,
    chunk_minutes: int = INTERVAL_CHUNK_MINUTES,
):
    """Range join: one output row per (left row, interval) with
    ``start <= ts < end`` — point-in-interval containment, the join
    behind "which maintenance window / session / experiment covers
    this event". Ray Data has no native non-equi join; DuckDB's is a
    nested-loop at scale.

    Shape: the time axis is diced into ``chunk_minutes`` chunks; left
    rows route to their chunk, intervals REPLICATE to every chunk they
    overlap, and the whole exchange is the same tagged-union single
    shuffle as ``hash_join``. Per chunk, matching is a vectorized
    sweep: intervals sorted by start, events sorted by ts, two
    ``searchsorted`` passes per interval-batch emit the pair list via
    ``np.repeat`` — O(pairs) work, no row loop.

    Partitioning assumptions (custom-operator contract): intervals are
    SHORT relative to ``chunk_minutes`` (replication factor = 1 +
    length/chunk); one chunk's rows fit a group task — shrink
    ``chunk_minutes`` for denser streams. Output timestamps keep ns
    resolution.
    """
    left_cols = list(left_cols or [])
    interval_cols = list(interval_cols or [])
    chunk_ns = np.int64(chunk_minutes * 60 * 1_000_000_000)
    ltypes = _schema_types(left_ds)
    itypes = _schema_types(intervals_ds)

    def _ns(col) -> np.ndarray:
        return pd.to_datetime(col.to_pandas()).astype("datetime64[ns]").astype(
            np.int64).to_numpy()

    def tag_left(batch: pa.Table) -> pa.Table:
        ts = _ns(batch.column(ts_col))
        t = pa.table({
            "_chunk": pa.array(ts // chunk_ns),
            "_side": pa.array(np.zeros(len(ts), dtype=np.int8)),
            "_ts": pa.array(ts),
            "_start": pa.array(np.zeros(len(ts), dtype=np.int64)),
            "_end": pa.array(np.zeros(len(ts), dtype=np.int64)),
            **{c: batch.column(c) for c in left_cols},
        })
        for c in interval_cols:
            t = t.append_column(c, pa.nulls(len(ts), itypes[c]))
        return t

    def tag_intervals(batch: pa.Table) -> pa.Table:
        s = _ns(batch.column(start_col))
        e = _ns(batch.column(end_col))
        first = s // chunk_ns
        # replicate to every overlapped chunk ([start, end) inclusive
        # of the chunk containing end-1)
        last = np.maximum(first, (np.maximum(e - 1, s)) // chunk_ns)
        reps = (last - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), reps)
        offs = np.concatenate([np.arange(r) for r in reps]) if len(s) else (
            np.zeros(0, dtype=np.int64))
        t = pa.table({
            "_chunk": pa.array(first[idx] + offs),
            "_side": pa.array(np.ones(len(idx), dtype=np.int8)),
            "_ts": pa.array(np.zeros(len(idx), dtype=np.int64)),
            "_start": pa.array(s[idx]),
            "_end": pa.array(e[idx]),
        })
        for c in left_cols:
            t = t.append_column(c, pa.nulls(len(idx), ltypes[c]))
        for c in interval_cols:
            t = t.append_column(c, batch.column(c).take(pa.array(idx)))
        return t

    def match_chunk(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["_side"] == 0]
        iv = g[g["_side"] == 1]
        empty = pd.DataFrame({
            ts_col: pd.Series([], dtype="datetime64[ns]"),
            **{c: pd.Series([], dtype=g[c].dtype)
               for c in left_cols + interval_cols},
        })
        if not len(ev) or not len(iv):
            return empty
        ev = ev.sort_values("_ts", kind="mergesort")
        ts = ev["_ts"].to_numpy()
        lo = np.searchsorted(ts, iv["_start"].to_numpy(), side="left")
        hi = np.searchsorted(ts, iv["_end"].to_numpy(), side="left")
        reps = hi - lo
        if reps.sum() == 0:
            return empty
        iv_idx = np.repeat(np.arange(len(iv)), reps)
        ev_idx = np.concatenate(
            [np.arange(a, b) for a, b in zip(lo, hi) if b > a])
        out = pd.DataFrame({ts_col: pd.to_datetime(ts[ev_idx])})
        for c in left_cols:
            out[c] = ev[c].to_numpy()[ev_idx]
        for c in interval_cols:
            out[c] = iv[c].to_numpy()[iv_idx]
        return out

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow")
    it = intervals_ds.map_batches(tag_intervals, batch_format="pyarrow")
    return (
        lt.union(it)
        .groupby("_chunk")
        .map_groups(match_chunk, batch_format="pandas")
    )


@ray.remote(num_cpus=1)
def _assemble_cross_side(block_refs):
    blocks = ray.get(block_refs)
    t = pa.concat_tables(blocks) if blocks else None
    return t.to_pandas() if t is not None else pd.DataFrame()


CROSS_JOIN_BYTES = 32 << 20


def cross_join(
    left_ds,
    right_ds,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    limit_bytes: int = CROSS_JOIN_BYTES,
):
    """Cartesian product with a SMALL right side: the right table is
    assembled once by a worker task into the object store (driver
    routes refs only) and every left block expands map-side — zero
    shuffle. Output is |L|x|R| rows, so the right side is hard-capped
    at ``limit_bytes`` (a large-large cross join is a modeling error
    at any scale, not a missing feature). Column names must not
    collide."""
    left_cols = list(left_cols or [c for c in left_ds.schema().names])
    right_cols = list(right_cols or [c for c in right_ds.schema().names])
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"output name collision: {sorted(overlap)}")
    try:
        sz = right_ds.size_bytes()
    except Exception:
        sz = None
    if sz is not None and sz > limit_bytes:
        raise ValueError(
            f"cross_join right side is {sz} bytes > limit {limit_bytes}")
    refs = right_ds.select_columns(right_cols).to_arrow_refs()
    rdf_ref = _assemble_cross_side.remote(list(refs))

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        r = _get_broadcast(rdf_ref)
        if len(r) == 0 or len(df) == 0:
            return pd.DataFrame(columns=left_cols + right_cols)
        left = df[left_cols].loc[df.index.repeat(len(r))].reset_index(drop=True)
        right = pd.concat([r] * len(df), ignore_index=True)
        return pd.concat([left, right], axis=1)

    return left_ds.map_batches(expand, batch_format="pandas")


def composite_join(
    left_ds,
    right_ds,
    on: list[str],
    right_on: list[str] | None = None,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    how: str = "inner",
    **hash_join_kwargs,
):
    """Multi-column equi-join: packs the key columns of each side into
    one exact string key (LENGTH-PREFIXED parts — "3:abc2:xy" — so no
    value content can make two different key tuples collide, unlike a
    separator sentinel; NULL in any key column never matches, SQL
    semantics) and runs the single-key ``hash_join``. The original
    left key columns ride along as payload so output keeps them
    typed; the packed key is dropped.

    Output columns: ``on + left_cols + right_cols``. All ``how`` modes
    of hash_join are supported EXCEPT right/outer (the unpacked left
    key columns would be NULL for unmatched right rows — pack the key
    yourself and keep the packed column if you need those modes).
    """
    if how in ("right", "outer"):
        raise ValueError(
            "composite_join supports inner/left/semi/anti; for "
            "right/outer pack the key manually and keep the packed col")
    right_on = right_on or on
    left_cols = list(left_cols or [])
    right_cols = list(right_cols or [])

    def packer(cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            key = None
            valid = None
            for c in cols:
                col = t.column(c)
                v = col.is_valid()
                valid = v if valid is None else pc.and_(valid, v)
                s = pc.cast(col.cast(pa.string()).combine_chunks()
                            .fill_null(""), pa.string())
                # "len:value" — all Arrow kernels, no Python strings
                part = pc.binary_join_element_wise(
                    pc.cast(pc.utf8_length(s), pa.string()), s, ":")
                key = part if key is None else \
                    pc.binary_join_element_wise(key, part, "")
            # NULL in any key column -> never matches (SQL semantics):
            # those rows are dropped from the join here and, for
            # how='left', unioned back below with null right columns
            t = t.append_column("_ck", key)
            return t.filter(valid)
        return fn

    lk = left_ds.map_batches(packer(on), batch_format="pyarrow")
    rk = right_ds.map_batches(packer(right_on), batch_format="pyarrow")
    out_right = right_cols if how not in ("semi", "anti") else []
    joined = hash_join(
        lk, rk, on="_ck",
        left_cols=on + left_cols,
        right_cols=out_right,
        how=how,
        **hash_join_kwargs,
    ).map_batches(lambda t: t.drop_columns(["_ck"]),
                  batch_format="pyarrow")
    if how != "left":
        return joined

    def null_key_rows(t: pa.Table) -> pa.Table:
        valid = None
        for c in on:
            v = t.column(c).is_valid().to_numpy(zero_copy_only=False)
            valid = v if valid is None else (valid & v)
        t = t.filter(pa.array(~valid)).select(on + left_cols)
        rtypes = hash_join_kwargs.get("right_types") or {}
        for c in out_right:
            # match the joined side's null-widened right column types
            # (pass right_types for non-float right columns)
            t = t.append_column(
                c, pa.nulls(t.num_rows, rtypes.get(c, pa.float64())))
        return t

    return joined.union(
        left_ds.map_batches(null_key_rows, batch_format="pyarrow"))


def _key64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """int64 view of a join key column (strings FNV-hashed) for the
    Bloom probes — same key domain on both sides by construction."""
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        from raykg.util import hash_strings

        return hash_strings(col.to_pylist()).astype(np.int64)
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def bloom_semi_join(
    left_ds,
    right_ds,
    on: str,
    right_on: str | None = None,
    left_cols: list[str] | None = None,
    how: str = "semi",
    left_types: dict[str, pa.DataType] | None = None,
    **hash_join_kwargs,
):
    """Runtime-filter-pruned semi/anti join — the Bloom pushdown every
    warehouse engine applies when a selective dimension filters a fact
    scan (Snowflake/Spark "runtime filters"): the RIGHT side's keys are
    folded into one fixed 512 KB Bloom bitmap (per-block bitmaps
    OR-merged, ``ops/dedup._bloom_build`` — driver memory independent
    of key count), every LEFT block tests membership map-side, and only
    the survivors enter the exact ``hash_join`` exchange. The result is
    EXACT, not approximate:

      * ``semi``: Bloom false positives are eliminated by the exact
        semi join over the (already tiny) pruned left;
      * ``anti``: a Bloom negative is a DEFINITE non-member — those
        rows bypass the exchange entirely; only the maybe-members are
        anti-joined exactly.

    At 100 TB this converts an all-rows shuffle into
    O(matching + false-positive) exchange volume: with 2²² bits and
    two probes the FP rate at 1 M distinct right keys is ~0.04.
    String keys are FNV-hashed into the Bloom domain (hash equality is
    necessary for key equality, so pruning stays sound). Output
    contract matches ``hash_join`` semi/anti: left columns only.
    """
    if how not in ("semi", "anti"):
        raise ValueError(f"bloom_semi_join supports semi/anti, got {how!r}")
    right_on = right_on or on
    from raykg.ops.dedup import _bloom_hashes

    def block_bitmap(batch: pa.Table) -> pa.Table:
        from raykg.ops.dedup import _BLOOM_LOG2

        keys = _key64(batch.column(right_on))
        bm = np.zeros(1 << (_BLOOM_LOG2 - 6), dtype=np.uint64)
        for h in _bloom_hashes(keys):
            np.bitwise_or.at(
                bm, (h >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (h & np.uint64(63)),
            )
        return pa.table({"bm": pa.array([bm.tobytes()], type=pa.binary())})

    from raykg.ops.dedup import _BLOOM_LOG2, _bloom_test

    parts = right_ds.select_columns([right_on]).map_batches(
        block_bitmap, batch_format="pyarrow", batch_size=None
    ).take_all()
    bm = np.zeros(1 << (_BLOOM_LOG2 - 6), dtype=np.uint64)
    for p in parts:
        bm |= np.frombuffer(p["bm"], dtype=np.uint64)
    bloom_ref = ray.put(bm)

    def prune(want_member: bool):
        def fn(t: pa.Table) -> pa.Table:
            keep = _bloom_test(ray.get(bloom_ref), _key64(t.column(on)))
            return t.filter(pa.array(keep if want_member else ~keep))

        return fn

    left_cols = list(left_cols or [])
    maybe = left_ds.map_batches(prune(True), batch_format="pyarrow")
    verified = hash_join(
        maybe, right_ds.select_columns([right_on]), on=on,
        right_on=right_on, left_cols=left_cols, how=how,
        left_types=left_types, **hash_join_kwargs,
    )
    if how == "semi":
        return verified
    definite = left_ds.map_batches(prune(False), batch_format="pyarrow")
    # match hash_join's output column order for the union
    return verified.union(definite.select_columns([on] + left_cols))
