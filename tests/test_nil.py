import statistics

import numpy as np
import pyarrow as pa

from raykg.nil import DEFAULT_NIL_MODEL, LogisticModel, NilStage, nil_features_table
from raykg.schema import CANDIDATE
from raykg.text import (
    batch_jaccard_sim,
    batch_levenshtein,
    batch_levenshtein_sim,
    damerau_levenshtein,
    dam_lev_metric,
    jaccard_multiset_sim,
)


def _cand(score, title="t", wiki=1, id_=0, indexer=10, dummy=False):
    return {
        "raw_score": score,
        "id": id_,
        "wikipedia_id": wiki,
        "title": title,
        "type_": "",
        "indexer": indexer,
        "score": score,
        "norm_score": score / 100.0,
        "dummy": dummy,
    }


def _batch(mentions, cand_lists):
    return pa.table(
        {
            "mention": pa.array(mentions, type=pa.string()),
            "candidates": pa.array(cand_lists, type=pa.list_(CANDIDATE)),
        }
    )


def test_levenshtein_against_reference_dp():
    import itertools

    words = ["kitten", "sitting", "abc", "", "a", "zorblax", "zorlbax"]
    pairs = list(itertools.product(words, words))
    got = batch_levenshtein([a for a, _ in pairs], [b for _, b in pairs])

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev = dp
            dp = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                            prev[j - 1] + (a[i - 1] != b[j - 1]))
        return dp[len(b)]

    for (a, b), g in zip(pairs, got):
        assert g == ref(a, b), (a, b)


def test_levenshtein_normalized_similarity():
    # char-level variant: 1 - d / max(len)
    sim = batch_levenshtein_sim(["kitten"], ["sitting"])
    assert abs(sim[0] - (1 - 3 / 7)) < 1e-12


def test_levenshtein_token_sim_matches_textdistance_qval_none():
    # textdistance Levenshtein(qval=None) tokenizes on whitespace
    from raykg.text import batch_levenshtein_token_sim

    a = ["new york city", "acme corp", "alpha beta", "", "one"]
    b = ["new york", "acme corporation", "beta alpha gamma", "x y", "one"]

    def ref(x, y):
        ta, tb = x.split(), y.split()
        dp = list(range(len(tb) + 1))
        for i in range(1, len(ta) + 1):
            prev = dp
            dp = [i] + [0] * len(tb)
            for j in range(1, len(tb) + 1):
                dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                            prev[j - 1] + (ta[i - 1] != tb[j - 1]))
        d = dp[len(tb)]
        return 1 - d / max(len(ta), len(tb), 1)

    got = batch_levenshtein_token_sim(a, b)
    for x, y, g in zip(a, b, got):
        assert abs(g - ref(x, y)) < 1e-12, (x, y)


def test_jaccard_multiset():
    assert jaccard_multiset_sim("a b c", "a b d") == 2 / 4
    assert jaccard_multiset_sim("a a b", "a b") == 2 / 3  # bag semantics
    assert jaccard_multiset_sim("", "") == 1.0
    got = batch_jaccard_sim(["x y"], ["x y"])
    assert got[0] == 1.0


def test_damerau():
    assert damerau_levenshtein("ab", "ba") == 1  # transposition
    assert damerau_levenshtein("abc", "acb") == 1
    assert damerau_levenshtein("abc", "abc") == 0
    assert damerau_levenshtein("", "xyz") == 3
    # short-string penalty wrapper
    assert dam_lev_metric("ab", "ab") == 0
    assert dam_lev_metric("ab", "ac") == 1 + 3
    assert dam_lev_metric("abcd", "abce") == 1


def test_features_match_statistics_module():
    scores = [97.0, 60.0, 55.0, -1000.0]
    batch = _batch(
        ["zorblax dynamics"],
        [[_cand(s, title="Zorblax Dynamics") for s in scores]],
    )
    f = nil_features_table(batch)
    assert f["max_bi"][0] == 97.0
    assert f["secondiff"][0] == 97.0 - 60.0
    assert abs(f["mean"][0] - statistics.mean(scores)) < 1e-9
    assert abs(f["median"][0] - statistics.median(scores)) < 1e-9
    assert abs(f["stdev"][0] - statistics.stdev(scores)) < 1e-9
    assert f["jaccard"][0] == 1.0
    assert f["levenshtein"][0] == 1.0


def test_empty_candidates_is_nil():
    batch = _batch(["anything"], [[]])
    stage = NilStage()
    out = stage(batch)
    assert out.column("is_nil").to_pylist() == [True]
    assert out.column("nil_score").to_pylist() == [0.0]
    assert out.column("entity_uri").to_pylist() == [""]


def test_stage_resolution():
    batch = _batch(
        ["zorblax dynamics", "unknown thing"],
        [
            [_cand(97.0, "Zorblax Dynamics", wiki=123), _cand(50.0)],
            [_cand(30.0, "Far Away", wiki=9), _cand(29.0)],
        ],
    )
    out = NilStage()(batch)
    assert out.column("is_nil").to_pylist() == [False, True]
    assert out.column("entity_uri").to_pylist()[0] == "ent:kb:123"
    assert out.column("top_wikipedia_id").to_pylist() == [123, 9]


def test_rw_uri_resolution():
    batch = _batch(
        ["previously minted"],
        [[_cand(95.0, "Minted", wiki=-1, id_=2, indexer=20), _cand(10.0)]],
    )
    out = NilStage(rw_uris=["nil:0:0", "nil:0:1", "nil:1:0"])(batch)
    assert out.column("entity_uri").to_pylist() == ["nil:1:0"]


def test_logistic_fit_separates():
    rng = np.random.default_rng(0)
    X = np.concatenate(
        [rng.normal(95, 3, size=(200, 1)), rng.normal(60, 8, size=(200, 1))]
    )
    X = np.concatenate([X, rng.normal(10, 5, size=(400, 1))], axis=1)
    y = np.concatenate([np.ones(200), np.zeros(200)])
    m = LogisticModel.fit(X, y, ("max_bi", "secondiff"))
    p = m.predict_proba1(X)
    acc = ((p > 0.5) == y).mean()
    assert acc > 0.95


def test_default_model_calibration():
    p_link = DEFAULT_NIL_MODEL.predict_proba1(np.array([[97.0, 30.0]]))[0]
    p_nil = DEFAULT_NIL_MODEL.predict_proba1(np.array([[70.0, 5.0]]))[0]
    assert p_link > 0.5
    assert p_nil < 0.5
