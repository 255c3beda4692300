"""Time-grid gap fill (raykg/ops/resample.py) and golden-record
survivorship (raykg/ops/survivor.py): pinned vs in-memory pandas
references, partition invariance, null-vs-latest semantics."""

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.ops.resample import gapfill_grid
from raykg.ops.survivor import golden_records


def _events(n=500, keys=7, seed=3):
    rng = np.random.default_rng(seed)
    # sparse timestamps: gaps guaranteed at bucket_us=10
    ts = np.sort(rng.choice(np.arange(0, 3000, dtype=np.int64),
                            size=n, replace=True))
    return pd.DataFrame({
        "k": rng.integers(0, keys, n).astype(np.int64),
        "ts": ts,
        "v": rng.integers(0, 100, n).astype(np.float64),
    })


def _ref_grid(df, bucket):
    bk = df["ts"].to_numpy() // bucket
    g = (pd.DataFrame({"k": df["k"], "bk": bk,
                       "n": 1, "s": np.floor(df["v"]).astype(np.int64)})
         .groupby(["k", "bk"], as_index=False).sum())
    out = []
    for k, grp in g.groupby("k"):
        full = pd.DataFrame({
            "k": k, "bk": np.arange(grp["bk"].min(), grp["bk"].max() + 1,
                                    dtype=np.int64)})
        m = full.merge(grp, on=["k", "bk"], how="left").fillna(0)
        out.append(m.astype({"n": np.int64, "s": np.int64}))
    return (pd.concat(out, ignore_index=True)
            .sort_values(["k", "bk"]).reset_index(drop=True))


def test_gapfill_matches_reference_and_partitioning():
    df = _events()
    ref = _ref_grid(df, 10)
    for blocks in (1, 9):
        got = (gapfill_grid(rd.from_pandas(df, override_num_blocks=blocks),
                            "k", "ts", 10, val_col="v", coarse=4)
               .to_pandas()
               .sort_values(["k", "bk"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got[["k", "bk", "n", "s"]], ref)
    # zero rows exist: the grid is strictly denser than the events
    assert (ref["n"] == 0).any()
    # and totals are preserved
    assert ref["n"].sum() == len(df)


def test_gapfill_counts_only():
    df = _events(n=100, keys=3, seed=5)
    got = (gapfill_grid(rd.from_pandas(df), "k", "ts", 50)
           .to_pandas().sort_values(["k", "bk"]).reset_index(drop=True))
    assert list(got.columns) == ["k", "bk", "n"]
    assert got["n"].sum() == len(df)
    # per-key grid contiguity
    for _, grp in got.groupby("k"):
        bks = grp["bk"].to_numpy()
        assert (np.diff(bks) == 1).all()


def _records(seed=11):
    rng = np.random.default_rng(seed)
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "ts": rng.integers(0, 10_000, n).astype(np.int64),
        "rid": np.arange(n, dtype=np.int64),
        "name": [f"n{v}" for v in rng.integers(0, 9, n)],
        "val": rng.random(n) * 100,
    })
    df.loc[rng.random(n) < 0.4, "name"] = None
    df.loc[rng.random(n) < 0.4, "val"] = np.nan
    # one key whose val is null in EVERY record
    df.loc[df["k"] == 0, "val"] = np.nan
    return df


def _ref_golden(df):
    rows = []
    for k, grp in df.sort_values(["ts", "rid"]).groupby("k"):
        row = {"k": k, "n_records": len(grp)}
        for c in ("name", "val"):
            nn = grp[grp[c].notna()]
            row[c] = nn[c].iloc[-1] if len(nn) else None
        rows.append(row)
    return (pd.DataFrame(rows).sort_values("k").reset_index(drop=True))


def test_golden_records_latest_nonnull_wins():
    df = _records()
    ref = _ref_golden(df)
    for blocks in (1, 13):
        got = (golden_records(
                   rd.from_pandas(df, override_num_blocks=blocks),
                   "k", "ts", "rid", ["name", "val"], coarse=4)
               .to_pandas().sort_values("k").reset_index(drop=True))
        got["n_records"] = got["n_records"].astype(np.int64)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    # the all-null column stays null; names survive for the same key
    k0 = ref[ref["k"] == 0]
    assert k0["val"].isna().all()


def test_golden_records_null_never_overwrites():
    # latest record has a NULL name: the older non-null name survives
    df = pd.DataFrame({
        "k": [1, 1, 1],
        "ts": [10, 20, 30],
        "rid": [0, 1, 2],
        "name": ["old", "mid", None],
        "val": [np.nan, 5.0, np.nan],
    })
    got = golden_records(rd.from_pandas(df), "k", "ts", "rid",
                         ["name", "val"]).to_pandas()
    assert got["name"].iloc[0] == "mid"
    assert got["val"].iloc[0] == 5.0
    assert int(got["n_records"].iloc[0]) == 3
