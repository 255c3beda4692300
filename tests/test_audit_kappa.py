"""uniqueness_audit (raykg/ops/validate.py) and cohens_kappa
(raykg/ops/profile.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.ops.profile import cohens_kappa
from raykg.ops.validate import uniqueness_audit


def test_uniqueness_audit_matches_pandas():
    rng = np.random.default_rng(6)
    df = pd.DataFrame({"a": rng.integers(0, 50, 500),
                       "b": rng.integers(0, 4, 500)})
    want = (df.groupby(["a", "b"]).size().rename("n").reset_index())
    want = want[want["n"] > 1].sort_values(["a", "b"]).reset_index(
        drop=True)
    for blocks in (1, 8):
        got = (uniqueness_audit(
            rd.from_pandas(df, override_num_blocks=blocks), ["a", "b"])
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype("int64"),
                                      want.astype("int64"))


def test_uniqueness_audit_clean_table():
    df = pd.DataFrame({"k": range(100)})
    got = uniqueness_audit(rd.from_pandas(df), ["k"]).to_pandas()
    assert len(got) == 0


def test_kappa_perfect_and_random():
    # perfect agreement -> kappa 1
    df = pd.DataFrame({"x": ["a", "b", "c"] * 50,
                       "y": ["a", "b", "c"] * 50})
    rep = cohens_kappa(rd.from_pandas(df), "x", "y")
    assert rep["kappa"].iloc[0] == 1.0
    assert int(rep["agree"].iloc[0]) == 150


def test_kappa_matches_manual_and_partitions():
    rng = np.random.default_rng(11)
    x = rng.choice(["a", "b", "c"], 2000, p=[0.5, 0.3, 0.2])
    noise = rng.random(2000) < 0.3
    y = np.where(noise, rng.choice(["a", "b", "c"], 2000), x)
    df = pd.DataFrame({"x": x, "y": y})
    n = len(df)
    agree = int((df.x == df.y).sum())
    ra = df.x.value_counts()
    cb = df.y.value_counts()
    pe_num = sum(int(ra.get(k, 0)) * int(cb.get(k, 0))
                 for k in sorted(set(ra.index) | set(cb.index)))
    p_o, p_e = agree / n, pe_num / (n * n)
    want = (p_o - p_e) / (1.0 - p_e)
    for blocks in (1, 7):
        rep = cohens_kappa(
            rd.from_pandas(df, override_num_blocks=blocks), "x", "y")
        assert rep["kappa"].iloc[0] == np.floor(want * 1e6 + 0.5) / 1e6
        assert int(rep["agree"].iloc[0]) == agree


def test_kappa_disjoint_labels():
    # no shared vocabulary: agree=0, p_e=0 -> kappa 0/(1-0) = 0... but
    # p_e is 0 only because no label appears on both sides
    df = pd.DataFrame({"x": ["a"] * 10, "y": ["z"] * 10})
    rep = cohens_kappa(rd.from_pandas(df), "x", "y")
    assert rep["kappa"].iloc[0] == 0.0
    assert rep["p_e"].iloc[0] == 0.0
