"""Fifteenth-block operators: k-core peeling (raykg/ops/cc.py k_core),
CUPED adjusted A/B means (profile.cuped_adjust), and item-item cosine
similarity (cooccur.cooccur_cosine) — pinned against brute-force
references and partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raykg.ops.cc import k_core, k_core_bruteforce
from raykg.ops.cooccur import cooccur_cosine
from raykg.ops.profile import cuped_adjust


# ------------------------------------------------------------------ k-core

def test_k_core_matches_bruteforce_random():
    rng = np.random.default_rng(5)
    edges = rng.integers(0, 40, size=(260, 2))
    df = pd.DataFrame({"src": edges[:, 0], "dst": edges[:, 1]})
    for k in (2, 3, 5):
        want = k_core_bruteforce(df, k)
        for parts in (1, 6):
            got = (k_core(rd.from_pandas(df).repartition(parts), k=k,
                          coarse=8).to_pandas()
                   .sort_values("vertex").reset_index(drop=True))
            if got.empty:
                assert want.empty
            else:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False)


def test_k_core_peels_tail_keeps_clique():
    # 5-clique + a path hanging off vertex 0: 2-core == the clique
    cl = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    path = [(0, 10), (10, 11), (11, 12)]
    df = pd.DataFrame(cl + path, columns=["src", "dst"])
    got = (k_core(rd.from_pandas(df), k=2, coarse=4).to_pandas()
           .sort_values("vertex").reset_index(drop=True))
    assert got["vertex"].tolist() == [0, 1, 2, 3, 4]
    assert (got["deg"] == 4).all()


def test_k_core_empty_when_no_core():
    df = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})  # path
    got = k_core(rd.from_pandas(df), k=2, coarse=4).to_pandas()
    assert len(got) == 0


# ------------------------------------------------------------------- CUPED

def _cuped_reference(units: pd.DataFrame):
    x = units["x"].to_numpy(np.float64)
    y = units["y"].to_numpy(np.float64)
    theta = (np.cov(x, y, bias=True)[0, 1] / np.var(x)
             if np.var(x) > 0 else 0.0)
    adj = y - theta * (x - x.mean())
    ref = units.assign(adj=adj).groupby("arm").agg(
        n=("x", "size"), mean_y=("y", "mean"), adj_mean_y=("adj", "mean"))
    return ref.reset_index()


def test_cuped_matches_reference():
    rng = np.random.default_rng(9)
    n = 400
    x = rng.integers(0, 1000, n)
    noise = rng.integers(-50, 50, n)
    arm = rng.integers(0, 2, n)
    y = 2 * x + noise + arm * 30  # correlated covariate + effect
    units = pd.DataFrame({"arm": arm, "x": x, "y": y})
    want = _cuped_reference(units)
    for parts in (1, 5):
        got = cuped_adjust(rd.from_pandas(units).repartition(parts),
                           "arm", "x", "y")
        assert got["arm"].tolist() == want["arm"].tolist()
        assert got["n"].tolist() == want["n"].tolist()
        np.testing.assert_allclose(got["mean_y"], want["mean_y"],
                                   rtol=1e-12)
        np.testing.assert_allclose(got["adj_mean_y"], want["adj_mean_y"],
                                   rtol=1e-9)
    # CUPED shrinks the naive between-arm gap toward the true effect
    naive_gap = (want.loc[want.arm == 1, "mean_y"].iloc[0]
                 - want.loc[want.arm == 0, "mean_y"].iloc[0])
    adj_gap = (got.loc[got.arm == 1, "adj_mean_y"].iloc[0]
               - got.loc[got.arm == 0, "adj_mean_y"].iloc[0])
    assert abs(adj_gap - 30) < abs(naive_gap - 30) + 20


def test_cuped_constant_covariate_theta_zero():
    units = pd.DataFrame({"arm": [0, 0, 1, 1],
                          "x": [5, 5, 5, 5], "y": [10, 20, 30, 40]})
    got = cuped_adjust(rd.from_pandas(units), "arm", "x", "y")
    np.testing.assert_allclose(got["adj_mean_y"], got["mean_y"])


# -------------------------------------------------------------- cooccur cos

def _brute_cosine(df, k, min_count):
    b = df.drop_duplicates(["bk", "it"])
    m = b.merge(b, on="bk")
    m = m[m["it_x"] < m["it_y"]]
    p = (m.groupby(["it_x", "it_y"]).size().rename("cnt").reset_index())
    p = p[p["cnt"] >= min_count]
    ic = b.groupby("it").size()
    na = p["it_x"].map(ic).to_numpy(np.int64)
    nb = p["it_y"].map(ic).to_numpy(np.int64)
    p["n_a"], p["n_b"] = na, nb
    p["cosine"] = p["cnt"].to_numpy(np.int64) / np.sqrt(
        (na * nb).astype(np.float64))
    p = p.rename(columns={"it_x": "item_a", "it_y": "item_b"})
    p = p.sort_values(["cosine", "item_a", "item_b"],
                      ascending=[False, True, True], kind="mergesort")
    return p.head(k).reset_index(drop=True)


def test_cooccur_cosine_matches_bruteforce():
    rng = np.random.default_rng(13)
    df = pd.DataFrame({"bk": rng.integers(0, 60, 600),
                       "it": rng.integers(0, 25, 600)})
    want = _brute_cosine(df, k=20, min_count=2)
    for parts in (1, 4):
        got = cooccur_cosine(rd.from_pandas(df).repartition(parts),
                             "bk", "it", k=20, min_count=2, coarse=8)
        pd.testing.assert_frame_equal(
            got, want[got.columns.tolist()], check_dtype=False)


def test_cooccur_cosine_identical_items_score_one():
    # items 1 and 2 appear in exactly the same baskets -> cosine 1.0
    df = pd.DataFrame({"bk": [0, 0, 1, 1, 2, 2, 2],
                       "it": [1, 2, 1, 2, 1, 2, 9]})
    got = cooccur_cosine(rd.from_pandas(df), "bk", "it", k=5,
                         min_count=1, coarse=4)
    top = got.iloc[0]
    assert (top["item_a"], top["item_b"]) == (1, 2)
    assert top["cosine"] == 1.0


def test_cuped_huge_values_no_overflow():
    # review fix: per-block Σxy/Σx² wrapped int64 before the driver
    # fold; partials now escalate to Python ints + decimal strings
    big = 4_000_000_000  # x*y = 1.6e19 > 2^63 for a single unit
    units = pd.DataFrame({"arm": [0, 1], "x": [big, big],
                          "y": [big, big - 2]})
    got = cuped_adjust(rd.from_pandas(units), "arm", "x", "y")
    ref = _cuped_reference(units)
    np.testing.assert_allclose(got["adj_mean_y"], ref["adj_mean_y"],
                               rtol=1e-12)
