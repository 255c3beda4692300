import numpy as np
import pandas as pd

import ray.data as rd

def test_composite_join_matches_pandas_and_defeats_separator_ambiguity():
    from raykg.ops.joins import composite_join

    left = pd.DataFrame({
        "a": ["x#y", "x", "q", "n", None],
        "b": ["z", "y#z", "z", "m", "k"],
        "lv": [1, 2, 3, 4, 5],
    })
    # ("x#y","z") must NOT match ("x","y#z") — a '#'-sentinel pack would
    right = pd.DataFrame({
        "a": ["x#y", "q", "n"],
        "b": ["z", "z", "other"],
        "rv": [10.0, 30.0, 99.0],
    })
    got = composite_join(
        rd.from_pandas(left).repartition(2),
        rd.from_pandas(right),
        on=["a", "b"], left_cols=["lv"], right_cols=["rv"],
    ).to_pandas().sort_values("lv").reset_index(drop=True)
    want = left.dropna().merge(right, on=["a", "b"], how="inner")
    assert list(got.lv) == sorted(want.lv)
    assert set(zip(got.a, got.b, got.lv, got.rv)) == set(
        zip(want.a, want.b, want.lv, want.rv))
    # semi mode
    semi = composite_join(rd.from_pandas(left), rd.from_pandas(right),
                          on=["a", "b"], left_cols=["lv"],
                          how="semi").to_pandas()
    assert sorted(semi.lv) == sorted(want.lv)


def test_composite_join_left_keeps_null_key_rows():
    from raykg.ops.joins import composite_join

    left = pd.DataFrame({"a": ["x", None, "y"], "b": ["1", "1", "9"],
                         "lv": [1, 2, 3]})
    right = pd.DataFrame({"a": ["x"], "b": ["1"], "rv": [10.0]})
    got = composite_join(rd.from_pandas(left), rd.from_pandas(right),
                         on=["a", "b"], left_cols=["lv"],
                         right_cols=["rv"], how="left").to_pandas()
    got = got.sort_values("lv").reset_index(drop=True)
    assert list(got.lv) == [1, 2, 3]
    assert got.rv.iloc[0] == 10.0
    assert got.rv.isna().iloc[1] and got.rv.isna().iloc[2]


def test_bloom_semi_join_matches_hash_join():
    from raykg.ops.joins import bloom_semi_join, hash_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "k": rng.integers(0, 500, size=2000),
        "v": np.arange(2000),
    })
    right = pd.DataFrame({"rk": np.arange(0, 500, 7)})  # selective
    for how in ("semi", "anti"):
        got = bloom_semi_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(2),
            on="k", right_on="rk", left_cols=["v"], how=how,
        ).to_pandas().sort_values("v").reset_index(drop=True)
        want = hash_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", right_on="rk", left_cols=["v"], how=how,
        ).to_pandas().sort_values("v").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["k", "v"]], want[["k", "v"]])


def test_bloom_semi_join_string_keys_and_disjoint():
    from raykg.ops.joins import bloom_semi_join

    left = pd.DataFrame({"k": ["a", "b", "c", "d", "a"],
                         "v": [1, 2, 3, 4, 5]})
    right = pd.DataFrame({"k": ["a", "c", "zz"]})
    semi = bloom_semi_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", left_cols=["v"], how="semi",
    ).to_pandas()
    assert sorted(semi.v) == [1, 3, 5]
    anti = bloom_semi_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", left_cols=["v"], how="anti",
    ).to_pandas()
    assert sorted(anti.v) == [2, 4]
    # disjoint right -> anti passes everything, semi nothing
    none = pd.DataFrame({"k": ["x", "y"]})
    assert bloom_semi_join(rd.from_pandas(left), rd.from_pandas(none),
                           on="k", left_cols=["v"], how="semi",
                           ).count() == 0
    assert bloom_semi_join(rd.from_pandas(left), rd.from_pandas(none),
                           on="k", left_cols=["v"], how="anti",
                           ).count() == 5
