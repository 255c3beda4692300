"""grouped_window pinned against a per-group pandas reference —
including duplicate order values (tiebreak), string keys, boundary
fills, and SQL RANGE peer semantics for the rolling windows."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raykg.ops.wfuncs import grouped_window


def _reference(df, key, order, tiebreak, range_ns):
    """Straight-line per-group pandas implementation."""
    out = []
    for _, g in df.sort_values([key, order, tiebreak]).groupby(key, sort=False):
        g = g.reset_index(drop=True)
        g["rn"] = np.arange(len(g)) + 1
        g["prev_v"] = g["v"].shift(1, fill_value=-1)
        g["next_v"] = g["v"].shift(-1, fill_value=-1)
        g["cum_v"] = g["v"].cumsum()
        ts = g[order].to_numpy().astype("datetime64[ns]").astype(np.int64)
        n1, s1 = [], []
        for t in ts:
            m = (ts >= t - range_ns) & (ts <= t)
            n1.append(int(m.sum()))
            s1.append(int(g["v"].to_numpy()[m].sum()))
        g["n_1h"], g["sum_1h"] = n1, s1
        out.append(g)
    return pd.concat(out).reset_index(drop=True)


def _random_events(seed, n, n_keys, str_keys=False):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, n)
    df = pd.DataFrame({
        "k": [f"user-{k}" for k in keys] if str_keys else keys,
        # coarse ts grid => plenty of exact ties
        "ts": pd.to_datetime(
            rng.integers(0, 50, n) * 600_000_000_000, unit="ns"
        ),
        "id": np.arange(n, dtype=np.int64),
        "v": rng.integers(-5, 100, n).astype(np.int64),
    })
    return df


SPECS = [
    {"op": "row_number", "name": "rn"},
    {"op": "lag", "col": "v", "name": "prev_v", "fill": -1},
    {"op": "lead", "col": "v", "name": "next_v", "fill": -1},
    {"op": "cumsum", "col": "v", "name": "cum_v"},
    {"op": "rolling_count", "ts": "ts", "range": "1h", "name": "n_1h"},
    {"op": "rolling_sum", "col": "v", "ts": "ts", "range": "1h",
     "name": "sum_1h"},
]
OUT_COLS = ["rn", "prev_v", "next_v", "cum_v", "n_1h", "sum_1h"]


@pytest.mark.parametrize("str_keys", [False, True])
def test_grouped_window_matches_reference(str_keys):
    df = _random_events(7, 400, 12, str_keys=str_keys)
    ds = rd.from_pandas(df).repartition(7)
    got = (
        grouped_window(ds, key="k", order="ts", tiebreak="id",
                       specs=SPECS, coarse=8)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    ref = (
        _reference(df, "k", "ts", "id", np.int64(3600) * 10**9)
        .sort_values("id").reset_index(drop=True)
    )
    for c in OUT_COLS:
        assert np.array_equal(
            got[c].to_numpy().astype(np.int64),
            ref[c].to_numpy().astype(np.int64),
        ), c


def test_single_row_groups_and_fills():
    df = pd.DataFrame({
        "k": [1, 2, 3],
        "ts": pd.to_datetime([10, 20, 30], unit="s"),
        "id": [0, 1, 2],
        "v": [5, 6, 7],
    })
    got = (
        grouped_window(rd.from_pandas(df), key="k", order="ts",
                       tiebreak="id", specs=SPECS, coarse=4)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert got["rn"].tolist() == [1, 1, 1]
    assert got["prev_v"].tolist() == [-1, -1, -1]
    assert got["next_v"].tolist() == [-1, -1, -1]
    assert got["cum_v"].tolist() == [5, 6, 7]
    assert got["n_1h"].tolist() == [1, 1, 1]


def test_rolling_includes_ts_peers():
    # SQL RANGE semantics: equal-ts rows are peers — every one of them
    # sees the whole peer set regardless of tiebreak order.
    df = pd.DataFrame({
        "k": [1] * 4,
        "ts": pd.to_datetime([100, 100, 100, 100_000], unit="s"),
        "id": [0, 1, 2, 3],
        "v": [1, 2, 4, 8],
    })
    got = (
        grouped_window(rd.from_pandas(df), key="k", order="ts",
                       tiebreak="id",
                       specs=[{"op": "rolling_sum", "col": "v",
                               "ts": "ts", "range": "1h",
                               "name": "s"}], coarse=2)
        .to_pandas().sort_values("id")
    )
    assert got["s"].tolist() == [7, 7, 7, 8]
