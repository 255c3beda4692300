"""BFS hop distances (raykg/ops/bfs.py), grouped autocorrelation
(raykg/ops/resample.py grouped_acf), mutual information
(raykg/ops/profile.py mutual_information), and association rules
(raykg/ops/cooccur.py association_rules) — each pinned against an
independent single-process reference, plus partition-invariance and
edge cases."""

from itertools import combinations

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.ops.bfs import bfs_distances, bfs_numpy
from raykg.ops.cooccur import association_rules
from raykg.ops.profile import mutual_information
from raykg.ops.resample import grouped_acf


# ---------------------------------------------------------------- bfs
def _edges_ds(edges, parts=5):
    return rd.from_pandas(pd.DataFrame(
        {"src": edges[:, 0], "dst": edges[:, 1]})).repartition(parts)


def test_bfs_matches_reference_random_graph():
    rng = np.random.default_rng(7)
    edges = rng.integers(0, 200, size=(1500, 2)).astype(np.int64)
    got = (bfs_distances(_edges_ds(edges), [3, 77], coarse=4)
           .to_pandas().set_index("node")["dist"].to_dict())
    assert got == bfs_numpy(edges, [3, 77])


def test_bfs_partition_and_coarse_invariance():
    rng = np.random.default_rng(11)
    edges = rng.integers(0, 80, size=(300, 2)).astype(np.int64)
    a = (bfs_distances(_edges_ds(edges, 2), [5], coarse=2)
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (bfs_distances(_edges_ds(edges, 9), [5], coarse=7)
         .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_bfs_isolated_seed_directedness_and_cap():
    # seed 99 has no edges; 1->2 not reachable BACKWARD from 2
    ds = _edges_ds(np.array([[1, 2], [2, 3], [3, 4]]), 2)
    got = bfs_distances(ds, [99], coarse=2).to_pandas()
    assert got.values.tolist() == [[99, 0]]
    got2 = (bfs_distances(ds, [2], coarse=2).to_pandas()
            .set_index("node")["dist"].to_dict())
    assert got2 == {2: 0, 3: 1, 4: 2}  # node 1 unreachable
    capped = (bfs_distances(ds, [2], max_hops=1, coarse=2).to_pandas()
              .set_index("node")["dist"].to_dict())
    assert capped == {2: 0, 3: 1}


def test_bfs_duplicate_edges_and_self_loops():
    edges = np.array([[1, 1], [1, 2], [1, 2], [2, 1]])
    got = (bfs_distances(_edges_ds(edges, 3), [1], coarse=3)
           .to_pandas().set_index("node")["dist"].to_dict())
    assert got == {1: 0, 2: 1}


# ------------------------------------------------------------ acf
def _acf_ref(df, lags):
    rows = []
    for k, g in df.sort_values(["ts", "id"]).groupby("k"):
        x = g["x"].to_numpy(np.float64)
        n = len(x)
        for lag in lags:
            if n <= lag:
                continue
            m = x.mean()
            den = ((x - m) ** 2).sum()
            if den == 0:
                continue
            num = ((x[:-lag] - m) * (x[lag:] - m)).sum()
            rows.append((k, lag, n, num / den))
    return (pd.DataFrame(rows, columns=["k", "lag", "n", "acf"])
            .sort_values(["k", "lag"]).reset_index(drop=True))


def test_grouped_acf_matches_reference():
    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "ts": pd.to_datetime(rng.integers(0, 10 ** 6, n), unit="s"),
        "id": np.arange(n),
        "x": rng.integers(0, 100, n).astype(np.int64),
    })
    got = (grouped_acf(rd.from_pandas(df).repartition(6),
                       "k", "ts", "x", "id", lags=(1, 3))
           .to_pandas().sort_values(["k", "lag"])
           .reset_index(drop=True))
    ref = _acf_ref(df, (1, 3))
    assert (got[["k", "lag", "n"]].values
            == ref[["k", "lag", "n"]].values).all()
    np.testing.assert_allclose(got["acf"], ref["acf"], atol=1e-12)


def test_grouped_acf_drops_constant_short_and_null_keys():
    df = pd.DataFrame({
        "k": pd.array([1, 1, 1, 2, 3, 3, None], dtype="Int64"),
        "ts": pd.to_datetime(np.arange(7), unit="s"),
        "id": np.arange(7),
        # key 1 constant (zero variance), key 2 single row, key 3 ok
        "x": np.array([5, 5, 5, 9, 1, 4, 7], dtype=np.int64),
    })
    got = grouped_acf(rd.from_pandas(df).repartition(3),
                      "k", "ts", "x", "id", lags=(1,)).to_pandas()
    assert got["k"].tolist() == [3]
    # n=2 plug-in estimator: num = -(d/2)^2*? -> exactly -0.5 here
    # (den spans all n points, so r1 = num/den = -0.5, not -1)
    assert got["acf"].tolist() == [-0.5]


def test_grouped_acf_perfect_alternation():
    # x alternates a,b => lag-1 acf -> negative; lag-2 acf -> positive
    df = pd.DataFrame({
        "k": np.zeros(40, np.int64),
        "ts": pd.to_datetime(np.arange(40), unit="s"),
        "id": np.arange(40),
        "x": np.tile([0, 10], 20).astype(np.int64),
    })
    got = (grouped_acf(rd.from_pandas(df), "k", "ts", "x", "id",
                       lags=(1, 2)).to_pandas()
           .set_index("lag")["acf"])
    assert got[1] < -0.9 and got[2] > 0.9


# ------------------------------------------------- mutual information
def _mi_ref(df):
    ct = pd.crosstab(df["a"], df["b"]).to_numpy().astype(float)
    p = ct / ct.sum()
    pa_ = p.sum(1, keepdims=True)
    pb = p.sum(0, keepdims=True)
    return float(np.nansum(
        np.where(p > 0, p * np.log(p / (pa_ * pb)), 0.0)))


def test_mutual_information_matches_reference_and_bounds():
    rng = np.random.default_rng(5)
    # correlated pair: b copies a 70% of the time
    a = rng.integers(0, 5, 4000)
    b = np.where(rng.random(4000) < 0.7, a, rng.integers(0, 5, 4000))
    df = pd.DataFrame({"a": a.astype(str), "b": b.astype(str)})
    got = mutual_information(
        rd.from_pandas(df).repartition(4), "a", "b")
    assert abs(float(got["mi"][0]) - _mi_ref(df)) < 1e-10
    assert got["n"][0] == 4000
    # independent columns: MI near zero; identical columns: MI = H(a)
    ident = pd.DataFrame({"a": df["a"], "b": df["a"]})
    mi_id = float(mutual_information(
        rd.from_pandas(ident), "a", "b")["mi"][0])
    cnt = df["a"].value_counts().to_numpy().astype(float)
    p = cnt / cnt.sum()
    assert abs(mi_id - float(-(p * np.log(p)).sum())) < 1e-12


def test_mutual_information_partition_invariant():
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"a": rng.integers(0, 4, 1000).astype(str),
                       "b": rng.integers(0, 3, 1000).astype(str)})
    m1 = mutual_information(rd.from_pandas(df).repartition(2),
                            "a", "b")["mi"][0]
    m2 = mutual_information(rd.from_pandas(df).repartition(13),
                            "a", "b")["mi"][0]
    assert float(m1) == float(m2)  # bit-equal: exact-int fold


# ---------------------------------------------------- association rules
def _rules_ref(df, basket, item, k, min_count):
    d = df.drop_duplicates([basket, item])
    n_b = d[basket].nunique()
    item_n = d.groupby(item)[basket].nunique()
    pc_ = {}
    for _, g in d.groupby(basket):
        for a, c in combinations(sorted(g[item]), 2):
            pc_[(a, c)] = pc_.get((a, c), 0) + 1
    top = sorted(((ab, n) for ab, n in pc_.items() if n >= min_count),
                 key=lambda kv: (-kv[1], kv[0]))[:k]
    rows = []
    for (a, c), cnt in top:
        for x, y in ((a, c), (c, a)):
            nx, ny = int(item_n[x]), int(item_n[y])
            rows.append((x, y, cnt, nx, ny, n_b,
                         float(cnt) / float(nx),
                         float(cnt * n_b) / float(nx * ny)))
    return (pd.DataFrame(rows, columns=[
        "antecedent", "consequent", "pair_n", "ante_n", "cons_n",
        "n_baskets", "confidence", "lift"])
        .sort_values(["pair_n", "antecedent", "consequent"],
                     ascending=[False, True, True])
        .reset_index(drop=True))


def test_association_rules_match_reference():
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"basket": rng.integers(0, 300, 4000),
                       "item": rng.integers(0, 30, 4000)})
    got = association_rules(rd.from_pandas(df).repartition(5),
                            "basket", "item", k=10, min_count=2)
    ref = _rules_ref(df, "basket", "item", 10, 2)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_association_rules_string_items_and_empty():
    df = pd.DataFrame({
        "basket": [1, 1, 1, 2, 2, 3, 3, 3],
        "item": list("abcabbca"),
    })
    got = association_rules(rd.from_pandas(df).repartition(2),
                            "basket", "item", k=5, min_count=2)
    ref = _rules_ref(df, "basket", "item", 5, 2)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    # min_count too high -> empty frame with the full schema
    none = association_rules(rd.from_pandas(df), "basket", "item",
                             k=5, min_count=99)
    assert len(none) == 0 and list(none.columns) == list(got.columns)


# ------------------------------------------------------- key skew
def test_key_skew_exact_and_partition_invariant():
    from raykg.ops.profile import key_skew

    rng = np.random.default_rng(6)
    keys = np.r_[rng.integers(0, 50, 2000), np.full(500, 7)]
    df = pd.DataFrame({"k": pd.array(keys, dtype="Int64")})
    df.loc[:9, "k"] = None  # null keys excluded
    got = key_skew(rd.from_pandas(df).repartition(7), "k")
    v = df["k"].dropna().value_counts()
    n = int(v.sum())
    assert got["n_rows"][0] == n
    assert got["n_keys"][0] == len(v)
    assert got["max_count"][0] == int(v.max())
    assert float(got["top1_share"][0]) == float(int(v.max())) / float(n)
    ssq = int((v.to_numpy(dtype=np.int64) ** 2).sum())
    assert float(got["hhi"][0]) == float(ssq) / float(n * n)
    # partition invariance (bit-equal: exact-int partials)
    g2 = key_skew(rd.from_pandas(df).repartition(2), "k")
    assert g2.values.tolist() == got.values.tolist()


# --------------------------------------------------------------- sssp
def _wedges_ds(edges, parts=5):
    return rd.from_pandas(pd.DataFrame(
        {"src": edges[:, 0], "dst": edges[:, 1],
         "w": edges[:, 2]})).repartition(parts)


def test_sssp_matches_reference_random_graph():
    from raykg.ops.bfs import sssp_distances, sssp_numpy

    rng = np.random.default_rng(19)
    edges = np.column_stack([
        rng.integers(0, 150, size=2000),
        rng.integers(0, 150, size=2000),
        rng.integers(0, 20, size=2000),
    ]).astype(np.int64)
    got = (sssp_distances(_wedges_ds(edges), [3, 88], coarse=4)
           .to_pandas().set_index("node")["dist"].to_dict())
    assert got == sssp_numpy(edges, [3, 88])


def test_sssp_hop_cap_and_partition_invariance():
    from raykg.ops.bfs import sssp_distances, sssp_numpy

    # chain 0 -w=5-> 1 -w=1-> 2 -w=1-> 3, plus an expensive shortcut
    # 0 -w=100-> 3: at max_hops=2 the chain can't reach 3, so the
    # shortcut wins; unbounded it loses.
    edges = np.array([[0, 1, 5], [1, 2, 1], [2, 3, 1], [0, 3, 100]],
                     dtype=np.int64)
    capped = (sssp_distances(_wedges_ds(edges, 2), [0], max_hops=2,
                             coarse=2).to_pandas()
              .set_index("node")["dist"].to_dict())
    assert capped == {0: 0, 1: 5, 2: 6, 3: 100}
    full = (sssp_distances(_wedges_ds(edges, 3), [0], coarse=5)
            .to_pandas().set_index("node")["dist"].to_dict())
    assert full == {0: 0, 1: 5, 2: 6, 3: 7} == sssp_numpy(edges, [0])


def test_sssp_parallel_edges_min_and_isolated_seed():
    from raykg.ops.bfs import sssp_distances

    edges = np.array([[0, 1, 9], [0, 1, 2], [0, 1, 7]], dtype=np.int64)
    got = (sssp_distances(_wedges_ds(edges, 2), [0, 42], coarse=2)
           .to_pandas().set_index("node")["dist"].to_dict())
    assert got == {0: 0, 1: 2, 42: 0}


# -------------------------------------------------------------- cusum
def _cusum_reference(df):
    rows = []
    for k, g in df.sort_values(["k", "ts", "tb"]).groupby("k"):
        x = g["x"].to_numpy(np.int64)
        n = len(x)
        cum = np.cumsum(x)
        tot = int(cum[-1])
        dev = np.abs(n * cum - np.arange(1, n + 1) * tot)
        ks = int(np.argmax(dev)) + 1  # np.argmax -> first max
        rows.append((k, n, ks, int(dev[ks - 1]), dev[ks - 1] / n))
    return pd.DataFrame(rows, columns=["k", "n", "k_star", "dev", "stat"])


def test_cusum_matches_reference_and_partitioning():
    from raykg.ops.resample import cusum_changepoint

    rng = np.random.default_rng(23)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "ts": rng.integers(0, 10**9, n),
        "tb": np.arange(n),
        "x": rng.integers(-50, 400, n),
    })
    want = _cusum_reference(df).sort_values("k").reset_index(drop=True)
    for parts in (2, 11):
        got = (cusum_changepoint(
                   rd.from_pandas(df).repartition(parts),
                   key_col="k", ts_col="ts", val_col="x",
                   tiebreak_col="tb", coarse=8)
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cusum_finds_planted_level_shift():
    from raykg.ops.resample import cusum_changepoint

    # 200 values at 10 then 200 at 60: k* must be the boundary (200)
    x = np.concatenate([np.full(200, 10), np.full(200, 60)])
    df = pd.DataFrame({"k": 1, "ts": np.arange(400), "tb": 0, "x": x})
    got = cusum_changepoint(rd.from_pandas(df), "k", "ts", "x",
                            "tb").to_pandas()
    assert got.loc[0, "k_star"] == 200 and got.loc[0, "n"] == 400


def test_cusum_ties_and_degenerate_keys():
    from raykg.ops.resample import cusum_changepoint

    # constant series: every dev is 0 -> tie -> smallest k (1);
    # single-row key: k*=1, dev=0
    df = pd.DataFrame({
        "k": [1, 1, 1, 2],
        "ts": [1, 2, 3, 1],
        "tb": [0, 0, 0, 0],
        "x": [7, 7, 7, 5],
    })
    got = (cusum_changepoint(rd.from_pandas(df), "k", "ts", "x", "tb")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["k_star"].tolist() == [1, 1]
    assert got["dev"].tolist() == [0, 0]


def test_cusum_bigint_escalation_exact():
    from raykg.ops.resample import cusum_changepoint

    # n=2000 rows of ~8e12 values: n^2 * max|x| ~ 3.2e19 > 2^63 —
    # int64 would wrap; the object-escalation path must stay exact.
    n = 2000
    rng = np.random.default_rng(7)
    x = rng.integers(7_000_000_000_000, 8_000_000_000_000, n)
    x[n // 2:] += 500_000_000_000          # planted level shift
    df = pd.DataFrame({"k": np.zeros(n, np.int64),
                       "ts": np.arange(n), "tb": np.arange(n),
                       "x": x})
    got = cusum_changepoint(rd.from_pandas(df), key_col="k",
                            ts_col="ts", val_col="x",
                            tiebreak_col="tb", coarse=4).to_pandas()
    cum = np.cumsum(x.astype(object))
    tot = int(cum[-1])
    dev = [abs(n * int(c) - (i + 1) * tot) for i, c in enumerate(cum)]
    ks = int(np.argmax(dev)) + 1
    assert int(got["k_star"].iloc[0]) == ks
    assert int(got["dev"].iloc[0]) == dev[ks - 1]
    assert abs(ks - n // 2) <= 2
