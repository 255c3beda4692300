"""grouped_ewma (exact sequential fold, vectorized across keys),
grouped_minmax (two-pass broadcast scaling), pareto_coverage
(exact-integer heavy-tail cutoff): pinned vs in-memory references,
partition invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.ops.profile import grouped_minmax
from raykg.ops.rank import pareto_coverage
from raykg.ops.resample import grouped_ewma


def _series(n=600, keys=9, seed=23):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, keys, n).astype(np.int64),
        "t": rng.permutation(n).astype(np.int64),
        "x": np.round(rng.random(n) * 100, 2),
    })


def _ref_ewma(df, alpha):
    rows = []
    for k, grp in df.sort_values(["k", "t"]).groupby("k"):
        acc = None
        for x in grp["x"]:
            acc = x if acc is None else alpha * x + (1 - alpha) * acc
        rows.append({"k": k, "n": len(grp), "ewma": acc})
    return pd.DataFrame(rows)


def test_ewma_bit_equal_to_sequential_fold():
    df = _series()
    ref = _ref_ewma(df, 0.25)
    for blocks in (1, 11):
        got = (grouped_ewma(rd.from_pandas(df, override_num_blocks=blocks),
                            "k", "x", ["t"], alpha=0.25, coarse=4)
               .to_pandas().sort_values("k").reset_index(drop=True))
        # bit-exact: identical op order per step
        assert got["ewma"].tolist() == ref["ewma"].tolist()
        assert got["n"].tolist() == ref["n"].tolist()


def test_ewma_single_row_keys_and_order():
    # one-element keys return x unchanged; order columns drive the fold
    df = pd.DataFrame({"k": [1, 2, 2], "t": [5, 2, 1],
                       "x": [7.0, 10.0, 2.0]})
    got = (grouped_ewma(rd.from_pandas(df), "k", "x", ["t"], alpha=0.5)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got.loc[got["k"] == 1, "ewma"].iloc[0] == 7.0
    # key 2 ordered by t: x=2 then x=10 -> 0.5*10 + 0.5*2 = 6
    assert got.loc[got["k"] == 2, "ewma"].iloc[0] == 6.0


def test_grouped_minmax_matches_pandas():
    df = _series(n=400, keys=5, seed=31)
    got = (grouped_minmax(rd.from_pandas(df, override_num_blocks=7),
                          "k", "x")
           .to_pandas().sort_values(["k", "t"]).reset_index(drop=True))
    ref = df.sort_values(["k", "t"]).reset_index(drop=True)
    g = ref.groupby("k")["x"]
    expect = ((ref["x"] - g.transform("min"))
              / (g.transform("max") - g.transform("min")))
    np.testing.assert_array_equal(got["scaled"].to_numpy(),
                                  expect.to_numpy())
    assert got["scaled"].min() == 0.0 and got["scaled"].max() == 1.0


def test_grouped_minmax_constant_group_nan():
    df = pd.DataFrame({"k": [1, 1, 2, 2], "x": [3.0, 3.0, 1.0, 5.0]})
    got = grouped_minmax(rd.from_pandas(df), "k", "x").to_pandas()
    assert got.loc[got["k"] == 1, "scaled"].isna().all()
    assert sorted(got.loc[got["k"] == 2, "scaled"]) == [0.0, 1.0]


def _ref_coverage(df, num, den):
    tot = (df.groupby("k", as_index=False)["s"].sum()
           .sort_values(["s", "k"], ascending=[False, True]))
    total = int(tot["s"].sum())
    thr = (num * total + den - 1) // den
    cum_before = np.concatenate([[0], np.cumsum(tot["s"].to_numpy())[:-1]])
    keep = cum_before < thr
    out = tot[keep].copy()
    out["cum_before"] = cum_before[keep]
    return out.reset_index(drop=True)


def test_pareto_coverage_exact_and_partition_invariant():
    rng = np.random.default_rng(5)
    n = 3000
    # Zipf-ish skew: a few keys dominate
    k = (rng.zipf(1.5, n) % 200).astype(np.int64)
    df = pd.DataFrame({"k": k, "s": rng.integers(1, 1000, n)})
    ref = _ref_coverage(df, 1, 2)
    for blocks in (1, 13):
        got = (pareto_coverage(
                   rd.from_pandas(df, override_num_blocks=blocks),
                   "k", "s", 1, 2, coarse=4, n_ranges=8)
               .to_pandas()
               .sort_values(["s", "k"], ascending=[False, True])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["k", "s", "cum_before"]],
            ref[["k", "s", "cum_before"]], check_dtype=False)
    # the cutoff is real: kept keys < total keys, coverage >= half
    assert 0 < len(ref) < df["k"].nunique()
    assert ref["s"].sum() >= (df["s"].sum() + 1) // 2


def test_pareto_coverage_full_fraction_keeps_all_positive():
    df = pd.DataFrame({"k": [1, 2, 3], "s": [5, 3, 2]})
    got = (pareto_coverage(rd.from_pandas(df), "k", "s", 1, 1)
           .to_pandas().sort_values("k"))
    assert got["k"].tolist() == [1, 2, 3]


def test_pareto_coverage_string_keys():
    df = pd.DataFrame({"k": [f"host{i % 7}" for i in range(200)],
                       "s": np.arange(1, 201, dtype=np.int64)})
    got = (pareto_coverage(rd.from_pandas(df, override_num_blocks=5),
                           "k", "s", 1, 2, coarse=4, n_ranges=4)
           .to_pandas())
    ref = _ref_coverage(df, 1, 2)
    assert sorted(got["k"]) == sorted(ref["k"])
