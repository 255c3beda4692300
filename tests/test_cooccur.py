"""Co-occurrence pair counting (raykg/ops/cooccur.py): pinned vs a
brute-force pandas self-join, partition invariance, dedup semantics,
max_basket skip."""

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.ops.cooccur import cooccurrence_pairs


def _brute(df, basket, item, k=50, min_count=1, max_basket=None):
    b = df.drop_duplicates([basket, item])
    if max_basket is not None:
        sz = b.groupby(basket)[item].transform("size")
        b = b[sz <= max_basket]
    j = b.merge(b, on=basket, suffixes=("_a", "_b"))
    j = j[j[f"{item}_a"] < j[f"{item}_b"]]
    m = (j.groupby([f"{item}_a", f"{item}_b"]).size()
         .rename("cnt").reset_index()
         .rename(columns={f"{item}_a": "item_a", f"{item}_b": "item_b"}))
    m = m[m["cnt"] >= min_count]
    m = m.sort_values(["cnt", "item_a", "item_b"],
                      ascending=[False, True, True], kind="mergesort")
    return m.head(k).reset_index(drop=True)


def _fixture(n_baskets=400, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for bk in range(n_baskets):
        size = rng.integers(1, 8)
        items = rng.choice(40, size=size, replace=True)  # dup items too
        rows += [(bk, int(it)) for it in items]
    return pd.DataFrame(rows, columns=["bk", "it"])


def test_matches_bruteforce_and_partitions():
    df = _fixture()
    want = _brute(df, "bk", "it")
    for blocks in (1, 9):
        got = cooccurrence_pairs(
            rd.from_pandas(df, override_num_blocks=blocks), "bk", "it")
        pd.testing.assert_frame_equal(
            got.astype({"item_a": "int64", "item_b": "int64",
                        "cnt": "int64"}),
            want.astype({"item_a": "int64", "item_b": "int64",
                         "cnt": "int64"}))


def test_min_count_and_k():
    df = _fixture(seed=9)
    want = _brute(df, "bk", "it", k=5, min_count=3)
    got = cooccurrence_pairs(rd.from_pandas(df), "bk", "it",
                             k=5, min_count=3)
    assert got["cnt"].min() >= 3
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


def test_duplicate_basket_item_counts_once():
    df = pd.DataFrame({"bk": [1, 1, 1, 2, 2],
                       "it": [7, 7, 9, 7, 9]})
    got = cooccurrence_pairs(rd.from_pandas(df), "bk", "it")
    assert got.to_records(index=False).tolist() == [(7, 9, 2)]


def test_max_basket_skips_hot_basket():
    # basket 0 has 30 items -> 435 pairs; bound at 10 drops it entirely
    hot = pd.DataFrame({"bk": [0] * 30, "it": range(30)})
    small = pd.DataFrame({"bk": [1, 1, 2, 2], "it": [1, 2, 1, 2]})
    df = pd.concat([hot, small])
    got = cooccurrence_pairs(rd.from_pandas(df), "bk", "it",
                             max_basket=10)
    want = _brute(df, "bk", "it", max_basket=10)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))
    assert len(got) == 1
