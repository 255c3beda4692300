"""Chi-square contingency (raykg/ops/profile.py chi2_contingency):
pinned vs a crosstab reference, zero-cell handling, partition
invariance, degenerate single-category input."""

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.ops.profile import chi2_contingency


def _manual(df, a, b):
    ct = pd.crosstab(df[a], df[b])
    e = np.outer(ct.sum(1), ct.sum(0)) / ct.values.sum()
    return float((((ct.values - e) ** 2) / e).sum())


def test_matches_crosstab_and_partitions():
    rng = np.random.default_rng(2)
    # dependent columns: y concentrates under x == 'a'
    x = rng.choice(["a", "b", "c"], 4000, p=[0.5, 0.3, 0.2])
    y = np.where((x == "a") & (rng.random(4000) < 0.7), "p",
                 rng.choice(["p", "q", "r"], 4000))
    df = pd.DataFrame({"x": x, "y": y})
    want = _manual(df, "x", "y")
    for blocks in (1, 9):
        got = chi2_contingency(
            rd.from_pandas(df, override_num_blocks=blocks), "x", "y")
        assert got["chi2"].iloc[0] == np.floor(want * 1e6 + 0.5) / 1e6
        assert int(got["dof"].iloc[0]) == 4
        v = np.sqrt(want / (len(df) * 2))
        assert got["cramers_v"].iloc[0] == np.floor(v * 1e6 + 0.5) / 1e6


def test_zero_cells_contribute_expected():
    # (a,q) and (b,p) never observed -> zero cells must still add e
    df = pd.DataFrame({"x": ["a"] * 5 + ["b"] * 5,
                       "y": ["p"] * 5 + ["q"] * 5})
    got = chi2_contingency(rd.from_pandas(df), "x", "y")
    assert got["chi2"].iloc[0] == 10.0      # perfect association
    assert got["cramers_v"].iloc[0] == 1.0


def test_degenerate_one_category():
    df = pd.DataFrame({"x": ["a"] * 10, "y": ["p", "q"] * 5})
    got = chi2_contingency(rd.from_pandas(df), "x", "y")
    assert int(got["dof"].iloc[0]) == 0
    assert np.isnan(got["cramers_v"].iloc[0])
