import itertools

import numpy as np
import pandas as pd

from raykg.eval import (
    b3,
    bcubed_precision,
    bcubed_recall,
    ceaf_e,
    classification_report,
    confusion,
    eval_clustering,
    incremental_report,
    linking_found_at,
    muc,
    recall_at_k,
)
from raykg.hungarian import linear_sum_assignment


def _brute_assignment(cost, maximize=False):
    n, m = cost.shape
    best = None
    k = min(n, m)
    for rows in itertools.combinations(range(n), k):
        for cols in itertools.permutations(range(m), k):
            total = sum(cost[i, j] for i, j in zip(rows, cols))
            if best is None or (total > best if maximize else total < best):
                best = total
    return best


def test_hungarian_matches_bruteforce():
    rng = np.random.default_rng(0)
    for shape in [(3, 3), (4, 4), (3, 5), (5, 3), (1, 4), (2, 2)]:
        for _ in range(10):
            c = rng.uniform(0, 10, size=shape)
            for maximize in (False, True):
                ri, ci = linear_sum_assignment(c, maximize=maximize)
                got = c[ri, ci].sum()
                want = _brute_assignment(c, maximize=maximize)
                assert abs(got - want) < 1e-9, (shape, maximize, c)


def test_linking_found_and_recall():
    found = linking_found_at([[5, 3, 9], [1, 2], [7]], [9, 4, 7])
    assert found.tolist() == [3, -1, 1]
    r = recall_at_k(found, ks=(1, 3))
    assert r["linking_recall@1"] == 1 / 3
    assert r["linking_recall@3"] == 2 / 3


def test_confusion_and_report():
    y_true = [True, True, False, False, False]
    y_pred = [True, False, True, False, False]
    cm = confusion(y_true, y_pred)
    assert cm == {"tn": 2, "fp": 1, "fn": 1, "tp": 1}
    cmn = confusion(y_true, y_pred, normalize=True)
    assert abs(cmn["tn"] - 2 / 3) < 1e-12 and abs(cmn["tp"] - 1 / 2) < 1e-12
    rep = classification_report(y_true, y_pred)
    assert rep["True"]["precision"] == 0.5
    assert rep["True"]["recall"] == 0.5
    assert rep["accuracy"] == 3 / 5


def test_perfect_clustering_metrics():
    clusters = {"a": {1, 2}, "b": {3, 4, 5}}
    p, r, f = muc(clusters, clusters)
    assert abs(f - 1.0) < 1e-9
    p, r, f = b3(clusters, clusters, 5)
    assert abs(f - 1.0) < 1e-9
    p, r, f = ceaf_e(clusters, clusters)
    assert abs(f - 1.0) < 1e-9


def test_muc_known_value():
    # classic MUC example: truth {1..4},{5,6}; pred {1,2},{3,4,5,6}
    true = {"t1": {1, 2, 3, 4}, "t2": {5, 6}}
    pred = {"p1": {1, 2}, "p2": {3, 4, 5, 6}}
    p, r, f = muc(true, pred)
    # precision: (2-1)+(4-2)=3 over (1+3)=4; recall: (4-2)+(2-1)=3 over (3+1)=4
    assert abs(p - 3 / 4) < 1e-9
    assert abs(r - 3 / 4) < 1e-9


def test_b3_known_value():
    true = {"t1": {1, 2}, "t2": {3}}
    pred = {"p1": {1, 2, 3}}
    p, r, f = b3(true, pred, 3)
    # precision: (2/3 + 2/3 + 1/3)/3 = 5/9 ; recall: (1+1+1)/3 = 1
    assert abs(p - 5 / 9) < 1e-9
    assert abs(r - 1.0) < 1e-9


def test_bcubed_single_label_equals_b3():
    pred = {"p1": {1, 2, 3}}
    true = {"t1": {1, 2}, "t2": {3}}
    cdict = {str(m): {c} for c, ms in pred.items() for m in ms}
    ldict = {str(m): {t} for t, ms in true.items() for m in ms}
    assert abs(bcubed_precision(cdict, ldict) - 5 / 9) < 1e-9
    assert abs(bcubed_recall(cdict, ldict) - 1.0) < 1e-9


def test_eval_clustering_bundle():
    true = {"t1": {1, 2, 3}, "t2": {4}}
    pred = {"p1": {1, 2}, "p2": {3, 4}}
    out = eval_clustering(true, pred, 4)
    for k in ("muc_f1", "b3_f1", "ceaf_f1", "evalcluster_mean"):
        assert 0.0 <= out[k] <= 1.0
    assert out["pred_clusters_len"] == 2


def test_incremental_report_averages():
    rows = [
        {"batch": 0, "size": 10, "nested": {"x": 1.0}},
        {"batch": 1, "size": 20, "nested": {"x": 3.0}},
    ]
    df = incremental_report(rows)
    assert len(df) == 3
    last = df.iloc[-1]
    assert last["batch"] == "incremental_overall"
    assert last["size"] == 15.0
    assert last["nested-x"] == 2.0
