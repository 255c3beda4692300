"""hash_exchange contract tests: the raw-task plan (flat and
hierarchical) must be output-equivalent to the
``groupby(bucket).map_groups(fn)`` plan it replaces, the adaptive
shrink must run BEFORE the ref-budget fallback test, and the
schema-less-empty edge must route through the groupby plan instead of
emitting zero-column blocks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from raykg.ops import exchange
from raykg.ops.exchange import hash_exchange


def _make_per_bucket_stats():
    # a CLOSURE (pickled by value) — a module-level test function
    # would be pickled by reference and fail to import on workers
    def per_bucket_stats(df: pd.DataFrame) -> pd.DataFrame:
        # re-groups by the REAL key inside the bucket, like callers do
        if len(df) == 0:
            return pd.DataFrame({"k": pd.array([], "int64"),
                                 "n": pd.array([], "int64"),
                                 "s": pd.array([], "float64")})
        g = df.groupby("k", sort=True).agg(n=("v", "size"),
                                           s=("v", "sum"))
        return g.reset_index()

    return per_bucket_stats


_per_bucket_stats = _make_per_bucket_stats()


def _input_ds(n_rows=5000, n_keys=97, n_blocks=8, seed=7):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, n_keys, n_rows).astype(np.int64)
    df = pd.DataFrame({
        "k": k,
        "v": rng.normal(size=n_rows),
        "_b": k % 23,
    })
    return rd.from_pandas(df).repartition(n_blocks), df


def _reference(df: pd.DataFrame) -> pd.DataFrame:
    return (df.groupby("k", sort=True)
            .agg(n=("v", "size"), s=("v", "sum")).reset_index())


def _collect(ds) -> pd.DataFrame:
    out = ds.to_pandas().sort_values("k").reset_index(drop=True)
    return out


def test_flat_exchange_matches_groupby_plan():
    ds, df = _input_ds()
    out = _collect(hash_exchange(ds, "_b", 23, _per_bucket_stats))
    ref = _reference(df)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_hierarchical_exchange_matches_flat(monkeypatch):
    ds, df = _input_ds(n_rows=8000, n_blocks=16)
    # force blocks x coarse over the budget so the two-level plan
    # engages, while keeping blocks <= budget/4 so it does NOT fall
    # back to the sort shuffle
    monkeypatch.setattr(exchange, "HX_MAX_REFS", 64)
    called = {"hier": 0}
    orig = exchange._hierarchical_exchange

    def spy(*a, **kw):
        called["hier"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(exchange, "_hierarchical_exchange", spy)
    out = _collect(hash_exchange(ds, "_b", 23, _per_bucket_stats,
                                 adaptive=False))
    assert called["hier"] == 1, "two-level path did not engage"
    pd.testing.assert_frame_equal(out, _reference(df),
                                  check_dtype=False)


def test_hierarchical_engages_where_flat_used_to_fall_back():
    # the 100 TB regime in miniature: blocks x coarse just over the
    # real budget must now run the raw-task hierarchy, not the
    # sort shuffle — pin by result equality with a tiny local budget
    ds, df = _input_ds(n_rows=6000, n_blocks=16)
    out = _collect(hash_exchange(ds, "_b", 23, _per_bucket_stats,
                                 adaptive=False))
    pd.testing.assert_frame_equal(out, _reference(df),
                                  check_dtype=False)
    # and the planner picks the hierarchy exactly when flat overflows
    n_blocks, coarse = 10 ** 5, 256
    assert n_blocks * coarse > exchange.HX_MAX_REFS
    n_super = min(coarse, exchange.HX_MAX_REFS // (2 * n_blocks))
    assert n_super >= 2, "hierarchy must be feasible at 1e5 x 256"


def test_arrow_mode_hierarchical(monkeypatch):
    ds, df = _input_ds(n_rows=3000, n_blocks=9)
    monkeypatch.setattr(exchange, "HX_MAX_REFS", 80)

    stats = _make_per_bucket_stats()

    def fn_arrow(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(stats(t.to_pandas()),
                                    preserve_index=False)

    out = _collect(hash_exchange(ds, "_b", 23, fn_arrow, arrow=True))
    pd.testing.assert_frame_equal(out, _reference(df),
                                  check_dtype=False)


def test_adaptive_shrink_runs_before_ref_budget(monkeypatch):
    # caller-supplied huge coarse (sorted_neighborhood's 1<<20) must
    # shrink to ~CPU count FIRST so the flat fast path is kept; the
    # old order fell back to the sort shuffle whenever blocks >= 2
    ds, df = _input_ds(n_rows=4000, n_blocks=8)
    flat_calls = {"n": 0}
    orig_split = exchange._hx_split

    class SpySplit:
        @staticmethod
        def options(**kw):
            flat_calls["n"] += 1
            return orig_split.options(**kw)

    monkeypatch.setattr(exchange, "_hx_split", SpySplit)
    out = _collect(hash_exchange(ds, "_b", 1 << 20, _per_bucket_stats,
                                 adaptive=True))
    assert flat_calls["n"] > 0, (
        "adaptive coarse did not shrink before the budget test — "
        "flat raw-task path was skipped")
    pd.testing.assert_frame_equal(out, _reference(df),
                                  check_dtype=False)


def test_all_schema_less_empty_routes_through_groupby():
    empty = rd.from_pandas(pd.DataFrame({"k": [1], "_b": [0],
                                         "v": [1.0]}))
    empty = empty.filter(lambda r: False).materialize()
    out = hash_exchange(empty, "_b", 8, _per_bucket_stats)
    assert out.count() == 0
    # downstream schema unification must not see zero-column blocks
    tables = [t for t in ray.get(out.to_arrow_refs())]
    assert all(t.num_columns > 0 or t.num_rows == 0 for t in tables)


def test_single_bucket_coarse_one():
    ds, df = _input_ds(n_rows=500, n_blocks=3)
    out = _collect(hash_exchange(ds, "_b", 1, _per_bucket_stats,
                                 adaptive=False))
    pd.testing.assert_frame_equal(out, _reference(df),
                                  check_dtype=False)


def test_real_operators_under_forced_hierarchy(monkeypatch, tmp_path):
    """End-to-end insurance: real operators built on hash_exchange
    produce identical output when the two-level plan is forced (tiny
    ref budget) — pins that their bucket fns rely only on bucket
    co-location, which the hierarchy preserves exactly."""
    from raykg.ops.dedup import exact_dedup
    from raykg.ops.joins import asof_join

    rng = np.random.default_rng(21)
    docs = pd.DataFrame({
        "doc_id": np.arange(600, dtype=np.int64),
        "text": [f"doc body {i % 37}" for i in range(600)],
    })
    dds = rd.from_pandas(docs).repartition(7)
    want_dedup = (exact_dedup(dds, text_col="text", id_col="doc_id")
                  .to_pandas().sort_values("doc_id")
                  .reset_index(drop=True))

    left = pd.DataFrame({
        "k": rng.integers(0, 9, 400).astype(np.int64),
        "t": rng.integers(0, 1000, 400).astype(np.int64),
        "lv": np.arange(400, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 9, 300).astype(np.int64),
        "t": rng.integers(0, 1000, 300).astype(np.int64),
        "rv": np.arange(300, dtype=np.int64),
    })

    def run_asof():
        return (asof_join(rd.from_pandas(left).repartition(5),
                          rd.from_pandas(right).repartition(4),
                          key="k", right_key="k", ts="t",
                          right_ts="t", left_cols=["lv"],
                          right_cols=["rv"])
                .to_pandas().sort_values(["k", "t", "lv"])
                .reset_index(drop=True))

    want_asof = run_asof()

    monkeypatch.setattr(exchange, "HX_MAX_REFS", 48)
    got_dedup = (exact_dedup(dds, text_col="text", id_col="doc_id")
                 .to_pandas().sort_values("doc_id")
                 .reset_index(drop=True))
    pd.testing.assert_frame_equal(got_dedup, want_dedup)
    got_asof = run_asof()
    pd.testing.assert_frame_equal(got_asof, want_asof)


@pytest.mark.parametrize("force_hier", [False, True])
def test_exchange_property_sweep(monkeypatch, force_hier):
    """Property sweep over the exchange contract: random shapes
    (row counts incl. 0 and 1, key cardinalities, block counts,
    coarse from 1 to far-above-cardinality, negative bucket hashes via
    % coarse) must all reproduce the single-process aggregation, on
    both the flat and the forced-two-level plan."""
    if force_hier:
        monkeypatch.setattr(exchange, "HX_MAX_REFS", 8)
    rng = np.random.default_rng(123)
    cases = [
        (0, 5, 2, 4), (1, 1, 1, 1), (7, 3, 4, 2), (50, 50, 3, 64),
        (500, 7, 16, 5), (1000, 999, 2, 1), (2048, 13, 32, 257),
    ]
    for n_rows, n_keys, n_blocks, coarse in cases:
        k = (rng.integers(0, n_keys, n_rows).astype(np.int64)
             if n_rows else np.array([], dtype=np.int64))
        df = pd.DataFrame({
            "k": k,
            "v": rng.normal(size=n_rows),
            "_b": k % max(coarse, 1),
        })
        ds = rd.from_pandas(df)
        if n_blocks > 1 and n_rows:
            ds = ds.repartition(n_blocks)
        out = hash_exchange(ds, "_b", coarse, _per_bucket_stats)
        if n_rows == 0:
            # schema-less empty input routes through the groupby plan,
            # whose contract is "omit empty groups" — rows only
            assert out.count() == 0
            continue
        got = _collect(out)
        want = _reference(df)
        pd.testing.assert_frame_equal(
            got, want, check_dtype=True,
            obj=f"case n={n_rows} keys={n_keys} blocks={n_blocks} "
                f"coarse={coarse} hier={force_hier}")
