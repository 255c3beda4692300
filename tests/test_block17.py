"""Seventeenth-block operators: sorted-neighborhood ER blocking
(raykg/ops/linkage.py sorted_neighborhood_pairs) and bounded-radius
nearest-neighbor spatial join (spatial.nearest_within) — pinned
against brute-force references and partition invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.ops.linkage import sorted_neighborhood_pairs
from raykg.ops.spatial import nearest_within


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ------------------------------------------------- sorted neighborhood

def _snm_reference(df, window):
    r = df.sort_values(["v", "id"], kind="mergesort").reset_index(
        drop=True)
    rows = []
    for i in range(len(r)):
        for d in range(1, window):
            if i + d < len(r):
                rows.append((r["id"][i], r["id"][i + d], d))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "dist"])


def test_sorted_neighborhood_matches_reference():
    rng = np.random.default_rng(41)
    df = pd.DataFrame({"id": np.arange(500, dtype=np.int64),
                       "v": rng.integers(0, 80, 500)})  # heavy ties
    want = _sorted(_snm_reference(df, 4))
    for parts in (1, 6):
        got = sorted_neighborhood_pairs(
            rd.from_pandas(df).repartition(parts),
            val_col="v", id_col="id", window=4,
            bucket_rows=64).to_pandas()
        pd.testing.assert_frame_equal(_sorted(got), want,
                                      check_dtype=False)


def test_sorted_neighborhood_window_two_is_adjacent_pairs():
    df = pd.DataFrame({"id": [10, 20, 30], "v": [3, 1, 2]})
    got = _sorted(sorted_neighborhood_pairs(
        rd.from_pandas(df), val_col="v", id_col="id",
        window=2).to_pandas())
    # sort order by v: 20, 30, 10 -> adjacent pairs (20,30), (30,10)
    want = pd.DataFrame({"id_a": [20, 30], "id_b": [30, 10],
                         "dist": [1, 1]})
    pd.testing.assert_frame_equal(got, _sorted(want), check_dtype=False)


def test_sorted_neighborhood_bucket_boundary_replication():
    # tiny bucket size forces many boundary replications
    df = pd.DataFrame({"id": np.arange(40, dtype=np.int64),
                       "v": np.arange(40, dtype=np.int64)})
    got = sorted_neighborhood_pairs(
        rd.from_pandas(df).repartition(3), val_col="v", id_col="id",
        window=3, bucket_rows=12).to_pandas()
    want = _snm_reference(df, 3)
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                  check_dtype=False)


# ------------------------------------------------------ nearest within

def _nn_reference(left, right, r):
    rows = []
    for lr in left.itertuples(index=False):
        d2 = ((right["x"] - lr.x) ** 2 + (right["y"] - lr.y) ** 2)
        ok = d2 <= r * r
        if ok.any():
            cand = right[ok].assign(d2=d2[ok]).sort_values(
                ["d2", "id"], kind="mergesort")
            rows.append((lr.id, cand["id"].iloc[0],
                         int(cand["d2"].iloc[0])))
    return pd.DataFrame(rows, columns=["id_l", "id_r", "dist2"])


def test_nearest_within_matches_bruteforce():
    rng = np.random.default_rng(43)
    left = pd.DataFrame({"id": np.arange(150, dtype=np.int64),
                         "x": rng.integers(0, 2000, 150),
                         "y": rng.integers(0, 2000, 150)})
    right = pd.DataFrame({"id": np.arange(60, dtype=np.int64),
                          "x": rng.integers(0, 2000, 60),
                          "y": rng.integers(0, 2000, 60)})
    want = _sorted(_nn_reference(left, right, 300))
    for parts in (1, 4):
        got = nearest_within(
            rd.from_pandas(left).repartition(parts),
            rd.from_pandas(right).repartition(parts),
            r=300, coarse=8).to_pandas()
        pd.testing.assert_frame_equal(_sorted(got), want,
                                      check_dtype=False)


def test_nearest_within_boundary_and_ties():
    # right points at exactly distance r (included) and a tie broken
    # by smaller right id
    left = pd.DataFrame({"id": [1], "x": [100], "y": [100]})
    right = pd.DataFrame({"id": [7, 5, 9],
                          "x": [110, 90, 100],
                          "y": [100, 100, 200]})  # d=10, 10, 100
    got = nearest_within(rd.from_pandas(left), rd.from_pandas(right),
                         r=100, coarse=2).to_pandas()
    assert got[["id_l", "id_r", "dist2"]].values.tolist() == [[1, 5, 100]]
    # left point with nothing inside r is absent
    far = pd.DataFrame({"id": [2], "x": [5000], "y": [5000]})
    got2 = nearest_within(rd.from_pandas(far), rd.from_pandas(right),
                          r=100, coarse=2).to_pandas()
    assert len(got2) == 0


# ------------------------------------------------- blocking quality

def test_blocking_quality_exact_counts():
    from raykg.ops.linkage import blocking_quality

    cand = pd.DataFrame({"id_a": [1, 1, 2, 3, 1],  # dup candidate row
                         "id_b": [2, 3, 3, 4, 2]})
    truth = pd.DataFrame({"id_a": [1, 2, 7],
                          "id_b": [2, 3, 8]})
    out = blocking_quality(rd.from_pandas(cand),
                           rd.from_pandas(truth), n_records=10,
                           coarse=4)
    row = out.iloc[0]
    assert row["n_cand"] == 4          # dedup'd
    assert row["n_truth"] == 3
    assert row["n_hit"] == 2           # (1,2), (2,3); (7,8) unblocked
    assert row["reduction_ratio"] == 1.0 - 4 / 45
    assert row["pair_completeness"] == 2 / 3
    assert row["pair_quality"] == 0.5


def test_sorted_neighborhood_negative_ids():
    # review fix: -1 was the empty-slot sentinel, dropping pairs whose
    # partner id was negative
    df = pd.DataFrame({"id": np.array([-1, -5, 3], dtype=np.int64),
                       "v": [1, 2, 3]})
    got = _sorted(sorted_neighborhood_pairs(
        rd.from_pandas(df), val_col="v", id_col="id",
        window=2).to_pandas())
    want = _sorted(pd.DataFrame({"id_a": [-1, -5], "id_b": [-5, 3],
                                 "dist": [1, 1]}))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --------------------------------------------- asof fast-path equivalence

def test_asof_fast_path_random_many_keys():
    """The vectorized many-keys merge (joins._merge_fast) must be
    indistinguishable from pandas merge_asof across random inputs
    with empty-right keys, out-of-range probes, and negative ts."""
    from raykg.ops.joins import asof_join

    rng = np.random.default_rng(61)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, 400),
        "ts": rng.integers(-1000, 1000, 400),
        "lid": np.arange(400, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 40, 150),   # keys 40..49 have no rights
        "ts": rng.integers(-1000, 1000, 150),
        "val": rng.integers(0, 10_000, 150),
    }).drop_duplicates(["k", "ts"])     # merge_asof needs unique ts/key
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts", by="k", direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    got = (asof_join(rd.from_pandas(left).repartition(4),
                     rd.from_pandas(right).repartition(3),
                     key="k", right_key="k", ts="ts", right_ts="ts",
                     left_cols=["lid"], right_cols=["val"],
                     fill={"val": -1}, census=False)
           .to_pandas().sort_values("lid").reset_index(drop=True))
    want_val = want["val"].fillna(-1).astype(np.int64)
    assert got["val"].astype(np.int64).tolist() == want_val.tolist()


def test_asof_fast_path_huge_key_falls_back():
    # |key| >= 2^55 disables the composite encoding; the loop path
    # must produce the same answer
    from raykg.ops.joins import asof_join

    big = 1 << 60
    left = pd.DataFrame({"k": [big, big, 5], "ts": [10, 3, 7],
                         "lid": [0, 1, 2]})
    right = pd.DataFrame({"k": [big, 5], "ts": [5, 6], "val": [77, 88]})
    got = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                     key="k", right_key="k", ts="ts", right_ts="ts",
                     left_cols=["lid"], right_cols=["val"],
                     fill={"val": -1}, census=False)
           .to_pandas().sort_values("lid"))
    assert got["val"].astype(np.int64).tolist() == [77, -1, 88]
