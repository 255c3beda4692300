"""psi_drift (Laplace-smoothed exact-count PSI), grouped_ttest
(Welch from exact moment partials), grouped_gini (rank-weighted
exact fold), target_encode_loo (leave-one-out mean), and
time_weighted_avg (duration-weighted exact sums): pinned vs
in-memory references, partition invariance, edge cases."""

import math

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.ops.drift import psi_drift
from raykg.ops.profile import grouped_gini, grouped_ttest, target_encode_loo
from raykg.ops.resample import time_weighted_avg


def _ref_psi(a, b, lo, width, nbins):
    ca = np.bincount(np.clip(((a - lo) // width).astype(int), 0, nbins - 1),
                     minlength=nbins)
    cb = np.bincount(np.clip(((b - lo) // width).astype(int), 0, nbins - 1),
                     minlength=nbins)
    na, nb = ca.sum() + nbins, cb.sum() + nbins
    psi = 0.0
    for i in range(nbins):
        p, q = (ca[i] + 1) / na, (cb[i] + 1) / nb
        psi += (q - p) * math.log(q / p)
    return ca, cb, psi


def test_psi_pinned_and_partition_invariant():
    rng = np.random.default_rng(7)
    a = rng.exponential(50, 2000)
    b = rng.exponential(80, 1500)  # shifted -> drift
    ca, cb, psi = _ref_psi(a, b, 0.0, 25.0, 8)
    for blocks in (1, 9):
        got = psi_drift(
            rd.from_pandas(pd.DataFrame({"v": a}), override_num_blocks=blocks),
            rd.from_pandas(pd.DataFrame({"v": b}), override_num_blocks=blocks),
            "v", 0.0, 25.0, 8)
        assert got["count_a"].tolist() == ca.tolist()
        assert got["count_b"].tolist() == cb.tolist()
        assert got["psi"].iloc[0] == psi  # bit-exact fold
    assert psi > 0.05  # the shift registers


def test_psi_identical_snapshots_near_zero():
    v = np.arange(1000, dtype=float)
    ds = rd.from_pandas(pd.DataFrame({"v": v}))
    got = psi_drift(ds, ds, "v", 0.0, 100.0, 10)
    assert abs(got["psi"].iloc[0]) < 1e-12


def _ref_welch(x1, x2):
    n1, n2 = len(x1), len(x2)
    m1, m2 = x1.mean(), x2.mean()
    v1, v2 = x1.var(ddof=1), x2.var(ddof=1)
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (se1 ** 2 / (n1 - 1) + se2 ** 2 / (n2 - 1))
    return t, df


def test_grouped_ttest_matches_welch():
    rng = np.random.default_rng(11)
    rows = []
    for k, delta in [("k1", 0.0), ("k2", 5.0)]:
        for arm, off in [("a", 0.0), ("b", delta)]:
            for x in rng.integers(0, 100, 400) + int(off * 10):
                rows.append((k, arm, int(x)))
    df = pd.DataFrame(rows, columns=["k", "arm", "x"])
    for blocks in (1, 7):
        got = (grouped_ttest(rd.from_pandas(df, override_num_blocks=blocks),
                             "k", "arm", "x")
               .sort_values("k").reset_index(drop=True))
        for _, r in got.iterrows():
            sub = df[df["k"] == r["k"]]
            x1 = sub[sub["arm"] == "a"]["x"].to_numpy(dtype=float)
            x2 = sub[sub["arm"] == "b"]["x"].to_numpy(dtype=float)
            t_ref, df_ref = _ref_welch(x1, x2)
            assert abs(r["t_stat"] - t_ref) < 1e-9
            assert abs(r["df"] - df_ref) < 1e-6
            assert r["n_a"] == len(x1) and r["n_b"] == len(x2)
    # k2's arms differ by ~50 -> large |t|; k1's don't
    g = got.set_index("k")
    assert abs(g.loc["k2", "t_stat"]) > 10 > abs(g.loc["k1", "t_stat"])


def _ref_gini(x):
    x = np.sort(np.asarray(x, dtype=np.int64))
    n = len(x)
    i = np.arange(1, n + 1)
    return 2.0 * float((i * x).sum()) / (n * float(x.sum())) - (n + 1) / n


def test_grouped_gini_pinned():
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "k": rng.integers(0, 20, 2000),
        "x": rng.zipf(1.8, 2000).clip(max=10_000).astype(np.int64),
    })
    for blocks in (1, 8):
        got = (grouped_gini(rd.from_pandas(df, override_num_blocks=blocks),
                            "k", "x", coarse=4)
               .to_pandas().sort_values("k").reset_index(drop=True))
        for _, r in got.iterrows():
            ref = _ref_gini(df.loc[df["k"] == r["k"], "x"])
            assert abs(r["gini"] - ref) < 1e-12
    # equal values -> gini 0; singleton -> gini 0
    eq = pd.DataFrame({"k": [1, 1, 1, 2], "x": [5, 5, 5, 9]})
    g = grouped_gini(rd.from_pandas(eq), "k", "x").to_pandas()
    assert np.allclose(g["gini"], 0.0)


def test_target_encode_loo_matches_pandas():
    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "c": rng.choice(list("abcd"), 500),
        "y": rng.integers(0, 50, 500).astype(np.int64),
        "i": np.arange(500),
    })
    got = (target_encode_loo(rd.from_pandas(df, override_num_blocks=6),
                             "c", "y")
           .to_pandas().sort_values("i").reset_index(drop=True))
    g = df.groupby("c")["y"]
    expect = (g.transform("sum") - df["y"]) / (g.transform("count") - 1)
    np.testing.assert_array_equal(got["te"].to_numpy(), expect.to_numpy())


def test_target_encode_singleton_nan():
    df = pd.DataFrame({"c": ["a", "a", "b"], "y": [1, 3, 7]})
    got = target_encode_loo(rd.from_pandas(df), "c", "y").to_pandas()
    assert got.loc[got["c"] == "b", "te"].isna().all()
    assert sorted(got.loc[got["c"] == "a", "te"]) == [1.0, 3.0]


def test_time_weighted_avg_pinned():
    rng = np.random.default_rng(19)
    n = 800
    df = pd.DataFrame({
        "k": rng.integers(0, 15, n),
        "ts": rng.integers(0, 10**9, n).astype("int64"),
        "id": np.arange(n, dtype=np.int64),
        "x": rng.integers(0, 100, n).astype(np.int64),
    })

    def ref(sub):
        sub = sub.sort_values(["ts", "id"])
        ts, x = sub["ts"].to_numpy(), sub["x"].to_numpy()
        dur = ts[1:] - ts[:-1]
        return float((x[:-1] * dur).sum()) / float(dur.sum())

    for blocks in (1, 9):
        got = (time_weighted_avg(
                   rd.from_pandas(df, override_num_blocks=blocks),
                   "k", "ts", "x", "id", coarse=4)
               .to_pandas().sort_values("k").reset_index(drop=True))
        for _, r in got.iterrows():
            sub = df[df["k"] == r["k"]]
            assert r["twa"] == ref(sub)  # exact int sums -> bit-equal
            assert r["n"] == len(sub)


def test_time_weighted_avg_drops_degenerate_keys():
    # key 1: single event; key 2: two events at the SAME ts -> both dropped
    df = pd.DataFrame({"k": [1, 2, 2, 3, 3],
                       "ts": [10, 5, 5, 0, 100],
                       "id": [0, 1, 2, 3, 4],
                       "x": [9, 1, 2, 4, 8]})
    got = time_weighted_avg(rd.from_pandas(df), "k", "ts", "x", "id") \
        .to_pandas()
    assert got["k"].tolist() == [3]
    assert got["twa"].iloc[0] == 4.0  # only the first value carries weight


def test_ttest_degenerate_keys_nan_not_crash():
    df = pd.DataFrame({
        "k": ["solo", "solo", "const", "const", "const", "const"],
        "arm": ["a", "b", "a", "a", "b", "b"],
        "x": [5, 9, 3, 3, 3, 3],  # solo: n=1 per arm; const: zero var
    })
    got = (grouped_ttest(rd.from_pandas(df), "k", "arm", "x")
           .sort_values("k").reset_index(drop=True))
    assert got["t_stat"].isna().all() and got["df"].isna().all()
    assert got.loc[got["k"] == "const", "mean_a"].iloc[0] == 3.0


def test_target_encode_unseen_and_null_category_nan():
    df = pd.DataFrame({"c": ["a", "a", None, "a"],
                       "y": np.array([1, 3, 7, 5], dtype=np.int64)})
    got = target_encode_loo(rd.from_pandas(df), "c", "y").to_pandas()
    assert got.loc[got["c"].isna(), "te"].isna().all()
    assert not got.loc[got["c"] == "a", "te"].isna().any()


def test_psi_nan_and_inf_values_match_histogram_convention():
    a = pd.DataFrame({"v": [np.nan, 1.0, np.inf, 55.0]})
    b = pd.DataFrame({"v": [2.0, 3.0]})
    got = psi_drift(rd.from_pandas(a), rd.from_pandas(b),
                    "v", 0.0, 10.0, 4)
    # NaN dropped (SQL NULL), +inf clamps to the TOP bin, not bin 0
    assert got["count_a"].tolist() == [1, 0, 0, 2]  # 1.0 | - | - | inf+55
    assert got["count_b"].tolist() == [2, 0, 0, 0]


def test_gini_null_keys_dropped():
    df = pd.DataFrame({"k": pd.array([1, 1, None, 2], dtype="Int64"),
                       "x": np.array([4, 6, 9, 5], dtype=np.int64)})
    got = grouped_gini(rd.from_pandas(df), "k", "x").to_pandas()
    assert sorted(got["k"].tolist()) == [1, 2]


def test_twa_ns_timestamps_and_null_keys():
    # datetime64[ns] input: µs normalization must not be 1000x off
    ts = pd.to_datetime([0, 10_000_000], unit="us")  # 10 s apart
    df = pd.DataFrame({"k": pd.array([1, 1], dtype="Int64"),
                       "ts": ts, "id": [0, 1],
                       "x": np.array([4, 100], dtype=np.int64)})
    got = time_weighted_avg(rd.from_pandas(df), "k", "ts", "x", "id") \
        .to_pandas()
    assert got["twa"].iloc[0] == 4.0  # weight = exactly 10^7 µs on x=4
