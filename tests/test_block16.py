"""Sixteenth-block operators: Borůvka minimum spanning forest
(raykg/ops/mst.py), simplified silhouette (kmeans.py), and linear
multi-touch attribution counts (funnel.window_touch_counts) — pinned
against brute-force references and partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raykg.ops.funnel import window_touch_counts
from raykg.ops.kmeans import simplified_silhouette
from raykg.ops.mst import minimum_spanning_forest, mst_bruteforce


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# --------------------------------------------------------------------- MST

def test_mst_matches_kruskal_random():
    rng = np.random.default_rng(17)
    e = rng.integers(0, 35, size=(200, 2))
    df = pd.DataFrame({"src": e[:, 0], "dst": e[:, 1],
                       "w": rng.integers(1, 50, 200)})  # duplicate weights
    want = mst_bruteforce(df)
    for parts in (1, 5):
        got = (minimum_spanning_forest(
            rd.from_pandas(df).repartition(parts), coarse=8)
            .to_pandas().sort_values(["u", "v"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mst_forest_on_disconnected_graph():
    # two components: a triangle (pick the 2 cheap edges) + one edge
    df = pd.DataFrame({
        "src": [0, 1, 0, 10],
        "dst": [1, 2, 2, 11],
        "w": [1, 2, 5, 7],
    })
    got = (minimum_spanning_forest(rd.from_pandas(df), coarse=4)
           .to_pandas().sort_values(["u", "v"]).reset_index(drop=True))
    want = pd.DataFrame({"u": [0, 1, 10], "v": [1, 2, 11],
                         "w": [1, 2, 7]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["w"].sum() == 10


def test_mst_duplicate_edges_collapse_to_min():
    df = pd.DataFrame({"src": [0, 1, 0, 0], "dst": [1, 0, 1, 2],
                       "w": [9, 3, 5, 4]})
    got = (minimum_spanning_forest(rd.from_pandas(df), coarse=4)
           .to_pandas().sort_values(["u", "v"]).reset_index(drop=True))
    want = pd.DataFrame({"u": [0, 0], "v": [1, 2], "w": [3, 4]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mst_path_graph_many_rounds():
    # a path: every edge is in the MST; contraction must chain
    n = 33
    df = pd.DataFrame({"src": np.arange(n - 1),
                       "dst": np.arange(1, n),
                       "w": np.full(n - 1, 2, np.int64)})
    got = minimum_spanning_forest(rd.from_pandas(df), coarse=4).to_pandas()
    assert len(got) == n - 1


def test_mst_dataset_fallback_equivalence(monkeypatch):
    """Forcing the beyond-inmem Dataset-join path (labels bound -> 0)
    must give the identical forest as the raw-task rounds and
    Kruskal."""
    import raykg.ops.mst as m

    rng = np.random.default_rng(29)
    e = rng.integers(0, 40, size=(300, 2))
    df = pd.DataFrame({"src": e[:, 0], "dst": e[:, 1],
                       "w": rng.integers(1, 30, 300)})
    want = mst_bruteforce(df)
    monkeypatch.setattr(m, "ROOTS_INMEM_BYTES", 0)
    got = (minimum_spanning_forest(
        rd.from_pandas(df).repartition(3), coarse=8)
        .to_pandas().sort_values(["u", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mst_float_weights_raise():
    df = pd.DataFrame({"src": [0], "dst": [1], "w": [1.5]})
    import pytest as _pt
    with _pt.raises(Exception, match="integer weights"):
        minimum_spanning_forest(rd.from_pandas(df), coarse=4).to_pandas()


# -------------------------------------------------------------- silhouette

def _sil_reference(V, C):
    d = np.sqrt(((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
    own = d.argmin(axis=1)
    a = d[np.arange(len(V)), own]
    d2 = d.copy()
    d2[np.arange(len(V)), own] = np.inf
    b = d2.min(axis=1)
    denom = np.maximum(a, b)
    s = np.where(denom > 0, (b - a) / np.where(denom > 0, denom, 1), 0.0)
    return own, s


def test_silhouette_matches_reference():
    rng = np.random.default_rng(23)
    C = rng.normal(size=(4, 8)) * 5
    V = np.concatenate([C[i] + rng.normal(size=(30, 8))
                        for i in range(4)])
    df = pd.DataFrame({"vec_id": np.arange(len(V)),
                       "embedding": list(V.astype(np.float32))})
    own, s = _sil_reference(V.astype(np.float32).astype(np.float64), C)
    for parts in (1, 4):
        got = simplified_silhouette(
            rd.from_pandas(df).repartition(parts), C)
        overall = got[got["cluster"] == -1].iloc[0]
        assert overall["n"] == len(V)
        assert overall["mean_s"] == pytest.approx(s.mean(), rel=1e-9)
        for cl in range(4):
            row = got[got["cluster"] == cl].iloc[0]
            assert row["n"] == int((own == cl).sum())
            assert row["mean_s"] == pytest.approx(
                s[own == cl].mean(), rel=1e-9)
    # well-separated clusters score high
    assert overall["mean_s"] > 0.5


def test_silhouette_point_on_centroid():
    C = np.array([[0.0, 0.0], [10.0, 0.0]])
    df = pd.DataFrame({"vec_id": [0, 1],
                       "embedding": [np.array([0.0, 0.0]),
                                     np.array([10.0, 0.0])]})
    got = simplified_silhouette(rd.from_pandas(df), C)
    # a == 0, b == 10 -> s == 1 for both points
    assert (got[got["cluster"] >= 0]["mean_s"] == 1.0).all()


# ------------------------------------------------------------- attribution

def _touch_reference(conv, touch, lookback):
    rows = []
    for r in conv.itertuples(index=False):
        tg = touch[touch["k"] == r.k]
        n = int(((tg["ts"] >= r.ts - lookback) & (tg["ts"] < r.ts)).sum())
        rows.append((r.cid, r.k, n, (1.0 / n) if n else 0.0))
    return pd.DataFrame(rows, columns=["conv_id", "key", "n_touches",
                                       "credit"])


def test_window_touch_counts_matches_bruteforce():
    rng = np.random.default_rng(29)
    conv = pd.DataFrame({
        "cid": np.arange(80, dtype=np.int64),
        "k": rng.integers(0, 12, 80),
        "ts": rng.integers(0, 10_000, 80) * 1_000_000,
    })
    touch = pd.DataFrame({
        "k": rng.integers(0, 12, 300),
        "ts": rng.integers(0, 10_000, 300) * 1_000_000,
    })
    lb = 500 * 1_000_000
    want = _sorted(_touch_reference(conv, touch, lb))
    for parts in (1, 4):
        got = window_touch_counts(
            rd.from_pandas(conv.rename(columns={"cid": "event_id",
                                                "k": "user_id"})
                           ).repartition(parts),
            rd.from_pandas(touch.rename(columns={"k": "user_id"})
                           ).repartition(parts),
            key="user_id", conv_ts="ts", touch_ts="ts",
            conv_id="event_id", lookback_us=lb, coarse=4).to_pandas()
        pd.testing.assert_frame_equal(_sorted(got), want,
                                      check_dtype=False)


def test_window_touch_counts_boundaries():
    # window is [ts - lb, ts): touch AT the lower edge counts, touch
    # AT the conversion instant does not
    conv = pd.DataFrame({"event_id": [1], "user_id": [7],
                         "ts": [1_000_000]})
    touch = pd.DataFrame({"user_id": [7, 7, 7],
                          "ts": [0, 999_999, 1_000_000]})
    got = window_touch_counts(
        rd.from_pandas(conv), rd.from_pandas(touch),
        key="user_id", conv_ts="ts", touch_ts="ts",
        conv_id="event_id", lookback_us=1_000_000, coarse=2).to_pandas()
    assert got["n_touches"].tolist() == [2]
    assert got["credit"].tolist() == [0.5]
