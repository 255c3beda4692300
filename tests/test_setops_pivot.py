"""set_op and pivot_agg pinned against pandas references — multi-column
tuples, duplicate-heavy inputs, string keys, empty results."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raykg.ops.pivot import pivot_agg
from raykg.ops.setops import set_op


def _rand_tuples(seed, n, card):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "a": rng.integers(0, card, n),
        "b": [f"s{v}" for v in rng.integers(0, 3, n)],
    })


def _sorted_set(df):
    return set(map(tuple, df.itertuples(index=False)))


@pytest.mark.parametrize("op", ["intersect", "except", "union"])
def test_set_op_multicol_matches_pandas(op):
    l = _rand_tuples(1, 500, 40)   # heavy duplication
    r = _rand_tuples(2, 300, 40)
    got = set_op(rd.from_pandas(l).repartition(5),
                 rd.from_pandas(r).repartition(3),
                 op, cols=["a", "b"], coarse=16).to_pandas()
    ls, rs = _sorted_set(l.drop_duplicates()), _sorted_set(r.drop_duplicates())
    want = {"intersect": ls & rs, "except": ls - rs, "union": ls | rs}[op]
    assert _sorted_set(got) == want
    assert len(got) == len(got.drop_duplicates())


def test_set_op_renamed_right_and_empty_result():
    l = pd.DataFrame({"k": [1, 2, 3]})
    r = pd.DataFrame({"other": [1, 2, 3, 4]})
    out = set_op(rd.from_pandas(l), rd.from_pandas(r), "except",
                 cols=["k"], right_cols=["other"]).to_pandas()
    assert len(out) == 0
    inter = set_op(rd.from_pandas(l), rd.from_pandas(r), "intersect",
                   cols=["k"], right_cols=["other"]).to_pandas()
    assert sorted(inter["k"]) == [1, 2, 3]


def test_pivot_agg_matches_pandas():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.integers(0, 20, 600),
        "cat": rng.choice(["x", "y", "z", "ignored"], 600),
        "v": rng.integers(0, 100, 600).astype(np.int64),
    })
    got = (
        pivot_agg(rd.from_pandas(df).repartition(7), key="k",
                  pivot_col="cat", values=["x", "y", "z"], value_col="v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    kept = df[df.cat.isin(["x", "y", "z"])]
    ref_n = kept.pivot_table(index="k", columns="cat", values="v",
                             aggfunc="count", fill_value=0)
    ref_s = kept.pivot_table(index="k", columns="cat", values="v",
                             aggfunc="sum", fill_value=0)
    for cat in ["x", "y", "z"]:
        ref_nc = ref_n[cat].reindex(got["k"], fill_value=0).to_numpy()
        ref_sc = ref_s[cat].reindex(got["k"], fill_value=0).to_numpy()
        assert np.array_equal(got[f"n_{cat}"].to_numpy(), ref_nc)
        assert np.array_equal(got[f"v_{cat}"].to_numpy(), ref_sc)
    # keys whose rows were all in the dropped category don't appear
    assert set(got["k"]) == set(kept["k"].unique())
