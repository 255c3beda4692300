"""Eighteenth-block operators: grouped geometric/harmonic means
(raykg/ops/profile.py grouped_geomean) and calendar feature extraction
(resample.time_features)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raykg.ops.profile import grouped_geomean
from raykg.ops.resample import time_features


def test_grouped_geomean_matches_reference():
    rng = np.random.default_rng(47)
    df = pd.DataFrame({"k": rng.integers(0, 6, 400),
                       "v": rng.integers(-3, 200, 400)})  # some <= 0
    for parts in (1, 5):
        got = grouped_geomean(rd.from_pandas(df).repartition(parts),
                              key="k", col="v")
        for _, row in got.iterrows():
            vals = df[(df["k"] == row["k"]) & (df["v"] > 0)]["v"]
            assert row["n"] == len(vals)
            assert row["geomean"] == pytest.approx(
                np.exp(np.log(vals.astype(float)).mean()), rel=1e-12)
            assert row["harmmean"] == pytest.approx(
                len(vals) / (1.0 / vals.astype(float)).sum(), rel=1e-12)
    # geomean <= arithmetic mean, harmonic <= geomean (AM-GM-HM)
    for _, row in got.iterrows():
        vals = df[(df["k"] == row["k"]) & (df["v"] > 0)]["v"]
        assert row["harmmean"] <= row["geomean"] + 1e-9
        assert row["geomean"] <= vals.mean() + 1e-9


def test_grouped_geomean_all_nonpositive_key_absent():
    df = pd.DataFrame({"k": [1, 1, 2], "v": [0, -5, 3]})
    got = grouped_geomean(rd.from_pandas(df), key="k", col="v")
    assert got["k"].tolist() == [2]
    assert got["geomean"].iloc[0] == pytest.approx(3.0)


def test_time_features_matches_pandas():
    ts = pd.to_datetime(["2024-01-01 00:15:00",    # Monday
                         "2024-06-15 23:59:59",    # Saturday
                         "2025-12-31 12:00:00"])   # Wednesday
    df = pd.DataFrame({"event_id": [1, 2, 3], "ts": ts})
    got = (time_features(rd.from_pandas(df), ts_col="ts",
                         keep=["event_id"])
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert got["hour"].tolist() == [0, 23, 12]
    assert got["dow"].tolist() == [0, 5, 2]       # Monday=0
    assert got["month"].tolist() == [1, 6, 12]
    assert got["is_weekend"].tolist() == [False, True, False]


# --------------------------------------------------------- phrase count

def test_phrase_count_matches_python():
    from raykg.ops.invindex import phrase_count

    texts = ["a b a b a", "b a b", "x y", "", "a b"]
    # phrase "a b": counts 2, 1, 0, 0, 1
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    got = (phrase_count(rd.from_pandas(df).repartition(2), "a", "b")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 1, 4]
    assert got["n_occurrences"].tolist() == [2, 1, 1]


def test_phrase_count_rejects_self_phrase():
    from raykg.ops.invindex import phrase_count

    df = pd.DataFrame({"doc_id": [0], "text": ["a a a"]})
    with pytest.raises(ValueError):
        phrase_count(rd.from_pandas(df), "a", "a")


def test_phrase_count_case_insensitive_and_boundary():
    from raykg.ops.invindex import phrase_count

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["A b", "c A"]})
    got = phrase_count(rd.from_pandas(df), "a", "b").to_pandas()
    assert got["doc_id"].tolist() == [0]
    # no cross-document adjacency: doc 0 ends 'b', doc 1 starts 'c'
    got2 = phrase_count(rd.from_pandas(df), "b", "c").to_pandas()
    assert len(got2) == 0
