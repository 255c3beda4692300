"""Skyline, ntile, and grouped imputation pinned against brute-force /
pandas references, including partition invariance and tie handling."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raykg.ops.impute import impute_grouped
from raykg.ops.rank import ntile
from raykg.ops.skyline import skyline


def _brute_skyline(df, sx=1.0, sy=1.0):
    x = sx * df["x"].to_numpy()
    y = sy * df["y"].to_numpy()
    keep = []
    for i in range(len(df)):
        dominated = np.any(
            (x <= x[i]) & (y <= y[i]) & ((x < x[i]) | (y < y[i])))
        keep.append(not dominated)
    return set(df.loc[keep, "id"])


@pytest.mark.parametrize("nblocks", [1, 7])
def test_skyline_matches_bruteforce(nblocks):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "id": np.arange(400),
        "x": rng.integers(0, 40, 400).astype(float),
        "y": rng.integers(0, 40, 400).astype(float),
    })
    # plant exact duplicates of a frontier point: both must survive
    df.loc[398, ["x", "y"]] = [0.0, 5.0]
    df.loc [399, ["x", "y"]] = [0.0, 5.0]
    got = skyline(rd.from_pandas(df, override_num_blocks=nblocks),
                  "x", "y", "id").to_pandas()
    assert set(got["id"]) == _brute_skyline(df)
    assert {398, 399} <= set(got["id"]) or df.loc[398, "y"] > 0  # both dups


def test_skyline_max_directions():
    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "id": np.arange(300),
        "x": rng.random(300),
        "y": rng.random(300),
    })
    got = skyline(rd.from_pandas(df, override_num_blocks=5),
                  "x", "y", "id", directions=("max", "min")).to_pandas()
    assert set(got["id"]) == _brute_skyline(df, sx=-1.0, sy=1.0)


def _sql_ntile(n, k, rank):
    q, r = divmod(n, k)
    cut = r * (q + 1)
    if rank <= cut:
        return (rank - 1) // (q + 1) + 1
    return r + (rank - cut - 1) // q + 1


@pytest.mark.parametrize("k", [3, 7, 10])
def test_ntile_matches_sql_semantics(k):
    rng = np.random.default_rng(9)
    n = 257                       # prime: exercises the n % k remainder
    df = pd.DataFrame({
        "id": np.arange(n),
        "v": rng.integers(0, 50, n).astype(float),  # heavy ties
    })
    got = (ntile(rd.from_pandas(df, override_num_blocks=6), "v", "id", k)
           .to_pandas().sort_values("id").reset_index(drop=True))
    order = np.lexsort((df["id"].to_numpy(), df["v"].to_numpy()))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(1, n + 1)
    want = np.array([_sql_ntile(n, k, r) for r in rank])
    np.testing.assert_array_equal(
        got.sort_values("id")["tile"].to_numpy(), want)
    sizes = pd.Series(want).value_counts()
    assert sizes.max() - sizes.min() <= 1   # row-balanced by definition


def test_ntile_k_exceeds_n():
    df = pd.DataFrame({"id": [1, 2, 3], "v": [5.0, 1.0, 3.0]})
    got = ntile(rd.from_pandas(df), "v", "id", 10).to_pandas()
    assert sorted(got["tile"]) == [1, 2, 3]
    assert int(got.loc[got["id"] == 2, "tile"].iloc[0]) == 1


def test_impute_grouped_mean_exact():
    rng = np.random.default_rng(11)
    n = 1000
    df = pd.DataFrame({
        "k": rng.integers(0, 8, n),
        "v": rng.integers(0, 100, n).astype(float),
    })
    df.loc[df.index % 7 == 0, "v"] = np.nan
    got = (impute_grouped(rd.from_pandas(df, override_num_blocks=5),
                          "k", "v")
           .to_pandas())
    ref = df.copy()
    means = df.groupby("k")["v"].mean()
    ref["v"] = ref["v"].fillna(ref["k"].map(means))
    # integer-valued data: the fill is one exact division — bit-equal
    a = got.sort_values(["k", "v"]).reset_index(drop=True)
    b = ref.sort_values(["k", "v"]).reset_index(drop=True)
    np.testing.assert_array_equal(a["v"].to_numpy(), b["v"].to_numpy())


def test_impute_grouped_mode_and_null_only_group():
    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "c", "c"],
        "v": ["x", "y", None, "z", None, None, None],
    })
    # tie in group a (x:1, y:1) -> smaller value "x"
    got = (impute_grouped(rd.from_pandas(df, override_num_blocks=3),
                          "k", "v", strategy="mode")
           .to_pandas().sort_values(["k", "v"], na_position="last")
           .reset_index(drop=True))
    assert got.loc[(got["k"] == "a"), "v"].tolist() == ["x", "x", "y"]
    assert got.loc[(got["k"] == "b"), "v"].tolist() == ["z", "z"]
    assert got.loc[(got["k"] == "c"), "v"].isna().all()  # null-only stays
