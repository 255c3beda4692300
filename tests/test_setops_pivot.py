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


def test_union_by_name_pads_and_orders():
    import pyarrow as pa
    from raykg.ops.setops import union_by_name

    a = pd.DataFrame({"x": [1, 2], "y": ["a", "b"]})
    b = pd.DataFrame({"y": ["c"], "z": [1.5]})          # new col, no x
    c = pd.DataFrame({"z": [2.5, 3.5], "x": [9, 10]})   # reordered
    out = union_by_name([rd.from_pandas(a), rd.from_pandas(b),
                         rd.from_pandas(c)])
    sch = out.schema()
    # first-seen column order across inputs
    assert sch.names == ["x", "y", "z"]
    df = out.to_pandas()
    assert len(df) == 5
    ref = pd.concat([a, b, c], ignore_index=True)[["x", "y", "z"]]
    pd.testing.assert_frame_equal(
        df.sort_values(["x", "y", "z"], na_position="last")
          .reset_index(drop=True),
        ref.sort_values(["x", "y", "z"], na_position="last")
           .reset_index(drop=True),
        check_dtype=False)
    # absent columns are typed nulls, not empty strings / NaN objects
    t = pa.Table.from_pandas(df)
    assert df["x"].isna().sum() == 1   # b's row
    assert df["z"].isna().sum() == 2   # a's rows


def test_union_by_name_strict_types():
    from raykg.ops.setops import union_by_name

    a = rd.from_pandas(pd.DataFrame({"k": np.array([1, 2], np.int64)}))
    b = rd.from_pandas(pd.DataFrame({"k": np.array([1.5], np.float64)}))
    with pytest.raises(TypeError, match="strict_types"):
        union_by_name([a, b])
    # non-strict: cast to first-seen (int64) — 1.5 truncates per Arrow
    out = union_by_name([a, b], strict_types=False).to_pandas()
    assert out["k"].dtype.kind == "i"
    assert len(out) == 3


def test_union_by_name_single_and_empty():
    from raykg.ops.setops import union_by_name

    a = pd.DataFrame({"k": [1, 2, 3]})
    out = union_by_name([rd.from_pandas(a)]).to_pandas()
    assert out["k"].tolist() == [1, 2, 3]
    with pytest.raises(ValueError):
        union_by_name([])
