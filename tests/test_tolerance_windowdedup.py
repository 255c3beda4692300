"""asof_join tolerance (merge_asof parity: out-of-window matches
rejected to fill) and windowed_first (keyed first-per-tumbling-window
dedup): pinned vs pandas references, partition invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.ops.dedup import windowed_first
from raykg.ops.joins import asof_join


def _frames(seed=29, n_left=300, n_right=200, keys=8):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, keys, n_left).astype(np.int64),
        "ts": pd.to_datetime(
            rng.choice(10**9, n_left, replace=False), unit="s"),
        "lid": np.arange(n_left, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, keys, n_right).astype(np.int64),
        "ts": pd.to_datetime(
            rng.choice(10**9, n_right, replace=False) + 10**9, unit="s")
        - pd.Timedelta(seconds=10**9),
        "rid": np.arange(n_right, dtype=np.int64) + 1000,
    })
    # unique ts per key on the right -> no tie-rule divergence vs pandas
    right = right.drop_duplicates(["k", "ts"])
    return left, right


def test_asof_tolerance_matches_merge_asof():
    left, right = _frames()
    tol_s = 5_000_000  # seconds window over a ~31-year spread
    ref = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction="backward",
        tolerance=pd.Timedelta(seconds=tol_s),
    ).sort_values("lid").reset_index(drop=True)
    ref["rid"] = ref["rid"].fillna(-1).astype(np.int64)
    for blocks in (1, 7):
        got = (asof_join(
                   rd.from_pandas(left, override_num_blocks=blocks),
                   rd.from_pandas(right, override_num_blocks=blocks),
                   "k", "k", "ts", "ts", ["lid"], ["rid"],
                   fill={"rid": -1}, coarse=4,
                   tolerance=tol_s * 1_000_000)  # µs
               .to_pandas().sort_values("lid").reset_index(drop=True))
        got["rid"] = got["rid"].astype(np.int64)
        assert got["rid"].tolist() == ref["rid"].tolist()
    # tolerance actually bites: some matched without it, not with it
    loose = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        "k", "k", "ts", "ts", ["lid"], ["rid"],
        fill={"rid": -1}, coarse=4).to_pandas()
    assert (loose["rid"] >= 0).sum() > (got["rid"] >= 0).sum() > 0


def test_asof_tolerance_integer_axis_and_forward():
    left = pd.DataFrame({"k": [1, 1, 1], "ts": np.array([10, 50, 100],
                                                        dtype=np.int64),
                         "lid": np.array([0, 1, 2], dtype=np.int64)})
    right = pd.DataFrame({"k": [1, 1], "ts": np.array([8, 90],
                                                      dtype=np.int64),
                          "rid": np.array([7, 9], dtype=np.int64)})
    got = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                     "k", "k", "ts", "ts", ["lid"], ["rid"],
                     fill={"rid": -1}, tolerance=15)
           .to_pandas().sort_values("lid"))
    # 10->8 (d=2 ok), 50->8 (d=42 rejected), 100->90 (d=10 ok)
    assert got["rid"].tolist() == [7, -1, 9]
    fwd = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                     "k", "k", "ts", "ts", ["lid"], ["rid"],
                     fill={"rid": -1}, direction="forward", tolerance=15)
           .to_pandas().sort_values("lid"))
    # 10->90? d=80 rejected; 50->90 d=40 rejected; 100->? none after
    assert fwd["rid"].tolist() == [-1, -1, -1]


def test_windowed_first_pinned_and_partition_invariant():
    rng = np.random.default_rng(31)
    n = 1500
    df = pd.DataFrame({
        "u": rng.integers(0, 12, n).astype(np.int64),
        "t": rng.choice(["a", "b", "c"], n),
        "ts": rng.integers(0, 10**7, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
    })
    w = 10**6

    ref = df.copy()
    ref["win_start"] = (ref["ts"] // w) * w
    ref = (ref.sort_values(["u", "t", "win_start", "ts", "id"])
           .groupby(["u", "t", "win_start"], as_index=False).head(1)
           .sort_values("id").reset_index(drop=True))
    for blocks in (1, 9):
        got = (windowed_first(
                   rd.from_pandas(df, override_num_blocks=blocks),
                   ["u", "t"], "ts", "id", w, coarse=8)
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert got["id"].tolist() == ref["id"].tolist()
        assert got["win_start"].tolist() == ref["win_start"].tolist()
    assert 0 < len(ref) < n  # dedup really dropped rows


def test_windowed_first_ns_timestamps():
    # two events 30 min apart inside one hour window: ns input must
    # not shrink the window 1000x (which would keep both)
    ts = pd.to_datetime([0, 1800], unit="s")  # datetime64[ns]
    df = pd.DataFrame({"u": [1, 1], "t": ["a", "a"], "ts": ts,
                       "id": np.array([0, 1], dtype=np.int64)})
    got = windowed_first(rd.from_pandas(df), ["u", "t"], "ts", "id",
                         3_600_000_000).to_pandas()
    assert got["id"].tolist() == [0]
