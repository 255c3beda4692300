"""grouping_sets / rollup_sets / cube_sets pinned against pandas —
sum/count/min/max, sentinel fill, grand totals, CUBE subsets."""

import numpy as np
import pandas as pd

import ray.data as rd

from raykg.ops.rollup import cube_sets, grouping_sets, rollup_sets


def _data(seed=2, n=500):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.choice(["p", "q"], n),
        "v": rng.integers(-10, 100, n).astype(np.int64),
    })


def _ref(df, s, fill="(all)"):
    if s:
        g = df.groupby(s)["v"]
        out = pd.DataFrame({
            "sum_v": g.sum(), "n": g.size(),
            "min_v": g.min(), "max_v": g.max(),
        }).reset_index()
    else:
        out = pd.DataFrame([{"sum_v": df.v.sum(), "n": len(df),
                             "min_v": df.v.min(), "max_v": df.v.max()}])
    for c in ["a", "b"]:
        if c not in out.columns:
            out[c] = fill
    return out[["a", "b", "sum_v", "n", "min_v", "max_v"]]


AGGS = [("sum", "v", "sum_v"), ("count", None, "n"),
        ("min", "v", "min_v"), ("max", "v", "max_v")]


def _compare(sets):
    df = _data()
    got = (
        grouping_sets(rd.from_pandas(df).repartition(6), sets, AGGS)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    ref = (
        pd.concat([_ref(df, s) for s in sets])
        .sort_values(["a", "b"]).reset_index(drop=True)
    )
    for c in ref.columns:
        assert got[c].tolist() == ref[c].tolist(), c


def test_rollup_matches_pandas():
    assert rollup_sets(["a", "b"]) == [["a", "b"], ["a"], []]
    _compare(rollup_sets(["a", "b"]))


def test_cube_matches_pandas():
    sets = cube_sets(["a", "b"])
    assert [["a", "b"], ["a"], ["b"], []] == sets
    _compare(sets)


def test_single_grand_total_only():
    df = _data()
    got = grouping_sets(rd.from_pandas(df), [[]], AGGS).to_pandas()
    assert len(got) == 1
    assert got["sum_v"].iloc[0] == df.v.sum()
    assert got["n"].iloc[0] == len(df)
