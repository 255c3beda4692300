"""Twenty-first-block operators: Multinomial Naive Bayes
(raykg/ops/nb.py) and search-ranking metrics
(mlmetrics.ranking_metrics) — pinned against sequential references."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raykg.ops.mlmetrics import ranking_metrics
from raykg.ops.nb import nb_classify, nb_reference, nb_train


def _corpus(rng, n, labels=("en", "fr", "de")):
    vocabs = {
        "en": ["the", "cat", "dog", "runs", "fast"],
        "fr": ["le", "chat", "chien", "court", "vite"],
        "de": ["der", "katze", "hund", "lauft", "schnell"],
    }
    shared = ["data", "table", "row"]
    rows = []
    for i in range(n):
        lab = labels[int(rng.integers(0, len(labels)))]
        words = list(rng.choice(vocabs[lab] + shared,
                                size=int(rng.integers(3, 12))))
        rows.append((i, " ".join(words), lab))
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def test_nb_train_counts_exact():
    rng = np.random.default_rng(51)
    df = _corpus(rng, 200)
    for parts in (1, 5):
        counts, stats = nb_train(
            rd.from_pandas(df).repartition(parts),
            text_col="text", label_col="label")
        got = (counts.to_pandas().sort_values(["label", "word"])
               .reset_index(drop=True))
        want = (df.assign(w=df["text"].str.lower().str.split(" "))
                .explode("w").groupby(["label", "w"]).size()
                .rename("c").reset_index()
                .rename(columns={"w": "word"})
                .sort_values(["label", "word"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # class stats
        want_docs = df.groupby("label").size()
        for _, r in stats.iterrows():
            assert r["n_docs"] == want_docs[r["label"]]


def test_nb_classify_matches_reference_bitexact():
    rng = np.random.default_rng(53)
    train = _corpus(rng, 300)
    test = _corpus(rng, 120)
    want = nb_reference(train, test, label_col="label")
    for parts in (1, 4):
        counts, stats = nb_train(
            rd.from_pandas(train).repartition(parts),
            text_col="text", label_col="label")
        got = (nb_classify(rd.from_pandas(test).repartition(parts),
                           counts, stats, text_col="text")
               .to_pandas().sort_values("doc_id")
               .reset_index(drop=True))
        assert got["pred"].tolist() == want.sort_values(
            "doc_id")["pred"].tolist()
    # sanity: learns the language signal
    truth = test.set_index("doc_id")["label"]
    acc = (got.set_index("doc_id")["pred"] == truth).mean()
    assert acc > 0.9


def test_nb_classify_unseen_words_floor():
    train = pd.DataFrame({"doc_id": [0, 1],
                          "text": ["aa aa bb", "cc cc dd"],
                          "label": ["x", "y"]})
    test = pd.DataFrame({"doc_id": [2, 3],
                         "text": ["aa zz", "cc zz"],
                         "label": ["?", "?"]})
    counts, stats = nb_train(rd.from_pandas(train), label_col="label")
    got = (nb_classify(rd.from_pandas(test), counts, stats)
           .to_pandas().sort_values("doc_id"))
    assert got["pred"].tolist() == ["x", "y"]


# --------------------------------------------------------- ranking metrics

def test_ranking_metrics_hand_computed():
    results = pd.DataFrame({
        "qid": [0, 0, 0, 1, 1],
        "doc_id": [10, 11, 12, 20, 21],
        "rank": [1, 2, 3, 1, 2],
    })
    rel = pd.DataFrame({
        "qid": [0, 0, 1],
        "doc_id": [11, 12, 99],     # qid1's only rel doc not retrieved
        "rel": [2, 1, 3],
    })
    out = ranking_metrics(rd.from_pandas(results), rd.from_pandas(rel),
                          k=10, coarse=4)
    q0 = out[out["qid"] == 0].iloc[0]
    assert q0["n_rel"] == 2
    assert q0["mrr"] == 0.5                       # first rel at rank 2
    dcg = 2 / math.log2(3) + 1 / math.log2(4)
    idcg = 2 / math.log2(2) + 1 / math.log2(3)
    assert q0["dcg"] == pytest.approx(dcg, rel=1e-15)
    assert q0["ndcg"] == pytest.approx(dcg / idcg, rel=1e-15)
    q1 = out[out["qid"] == 1].iloc[0]
    assert q1["n_rel"] == 0 and q1["mrr"] == 0.0 and q1["ndcg"] == 0.0


def test_ranking_metrics_partition_invariant():
    rng = np.random.default_rng(57)
    results = pd.DataFrame({
        "qid": np.repeat(np.arange(30), 10),
        "doc_id": rng.integers(0, 500, 300),
        "rank": np.tile(np.arange(1, 11), 30),
    })
    rel = pd.DataFrame({
        "qid": rng.integers(0, 30, 200),
        "doc_id": rng.integers(0, 500, 200),
        "rel": rng.integers(0, 4, 200),
    }).drop_duplicates(["qid", "doc_id"])
    a = ranking_metrics(rd.from_pandas(results).repartition(5),
                        rd.from_pandas(rel).repartition(3), k=10)
    b = ranking_metrics(rd.from_pandas(results),
                        rd.from_pandas(rel), k=10)
    pd.testing.assert_frame_equal(a, b)
    assert ((a["ndcg"] >= 0) & (a["ndcg"] <= 1 + 1e-12)).all()


# --------------------------------------- weighted mean + interpolation

def test_grouped_weighted_mean_exact():
    from raykg.ops.profile import grouped_weighted_mean

    rng = np.random.default_rng(67)
    df = pd.DataFrame({"k": rng.integers(0, 5, 200),
                       "x": rng.integers(-100, 1000, 200),
                       "w": rng.integers(0, 6, 200)})
    for parts in (1, 4):
        got = grouped_weighted_mean(
            rd.from_pandas(df).repartition(parts), "k", "x", "w")
        for _, r in got.iterrows():
            sub = df[df["k"] == r["k"]]
            assert r["sum_w"] == sub["w"].sum()
            assert r["wmean"] == pytest.approx(
                (sub["w"] * sub["x"]).sum() / sub["w"].sum(),
                rel=1e-14)
    # zero-total-weight keys dropped
    z = pd.DataFrame({"k": [9, 9], "x": [5, 6], "w": [0, 0]})
    got = grouped_weighted_mean(rd.from_pandas(z), "k", "x", "w")
    assert len(got) == 0


def test_grouped_weighted_mean_overflow_path():
    from raykg.ops.profile import grouped_weighted_mean

    big = 4_000_000_000
    df = pd.DataFrame({"k": [1, 1], "x": [big, big],
                       "w": [big, big]})  # w*x = 1.6e19 > 2^63
    got = grouped_weighted_mean(rd.from_pandas(df), "k", "x", "w")
    assert got["wmean"].iloc[0] == pytest.approx(big, rel=1e-15)


def test_interpolate_grid_hand_computed():
    from raykg.ops.resample import interpolate_grid

    # user 1: obs at buckets 0 (v=100) and 3 (v=400); gaps at 1, 2
    ts = np.array([30, 3 * 3600 * 1_000_000 + 5], dtype=np.int64)
    df = pd.DataFrame({"user_id": [1, 1], "ts": ts,
                       "cents": [100.0, 400.0],
                       "event_id": [0, 1]})
    got = (interpolate_grid(rd.from_pandas(df), key_col="user_id",
                            ts_col="ts", val_col="cents",
                            tiebreak_col="event_id",
                            bucket_us=3_600_000_000)
           .to_pandas().sort_values("bk").reset_index(drop=True))
    assert got["bk"].tolist() == [0, 1, 2, 3]
    assert got["v"].tolist() == [100.0, 200.0, 300.0, 400.0]
    assert got["is_observed"].tolist() == [True, False, False, True]


def test_interpolate_grid_last_event_wins_bucket():
    from raykg.ops.resample import interpolate_grid

    df = pd.DataFrame({"user_id": [1, 1], "ts": [10, 20],
                       "cents": [5.0, 9.0], "event_id": [0, 1]})
    got = interpolate_grid(rd.from_pandas(df).repartition(2),
                           key_col="user_id", ts_col="ts",
                           val_col="cents", tiebreak_col="event_id",
                           bucket_us=3_600_000_000).to_pandas()
    assert got["v"].tolist() == [9.0]   # later ts wins the bucket


def test_ranking_metrics_rejects_out_of_range_ranks():
    # rank 0 and negative ranks must be dropped, not wrap via numpy
    # negative indexing into another rank position's relm column
    results = pd.DataFrame({
        "qid": [0, 0, 0, 0],
        "doc_id": [10, 11, 12, 13],
        "rank": [0, -1, 1, 2],
    })
    rel = pd.DataFrame({"qid": [0, 0, 0],
                        "doc_id": [10, 11, 12], "rel": [3, 3, 2]})
    out = ranking_metrics(rd.from_pandas(results), rd.from_pandas(rel),
                          k=10, coarse=4)
    q0 = out[out["qid"] == 0].iloc[0]
    # only ranks 1 (rel=2) and 2 (rel=0) count; rel docs 10/11 gone
    assert q0["mrr"] == 1.0
    assert q0["dcg"] == pytest.approx(2 / math.log2(2), rel=1e-15)


def test_interpolate_grid_rejects_nan_values():
    from raykg.ops.resample import interpolate_grid

    df = pd.DataFrame({"user_id": [1, 1], "ts": [10, 20],
                       "cents": [5.0, float("nan")],
                       "event_id": [0, 1]})
    with pytest.raises(Exception, match="null/NaN"):
        interpolate_grid(rd.from_pandas(df), key_col="user_id",
                         ts_col="ts", val_col="cents",
                         tiebreak_col="event_id",
                         bucket_us=3_600_000_000).to_pandas()
