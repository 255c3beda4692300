"""Binary-classifier report (raykg/ops/mlmetrics.py): exact tie-aware
AUC vs brute-force pair counting, confusion metrics, partition
invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.ops.mlmetrics import binary_classification_report


def _brute_auc(y: np.ndarray, s: np.ndarray) -> float:
    # pair counting: wins + half-ties over P*N
    pos = s[y == 1]
    neg = s[y == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def _fixture(n=3000, seed=7):
    rng = np.random.default_rng(seed)
    y = (rng.random(n) < 0.3).astype(np.int64)
    # quantized scores force heavy TIES, incl. cross-label ties
    s = np.round((rng.random(n) + y) / 2.0, 2)
    return pd.DataFrame({"id": np.arange(n), "y": y, "s": s})


def test_report_matches_bruteforce():
    df = _fixture()
    rep = binary_classification_report(
        rd.from_pandas(df, override_num_blocks=7), "y", "s", "id")
    y, s = df["y"].to_numpy(), df["s"].to_numpy()
    assert rep["auc"].iloc[0] == _brute_auc(y, s)
    pred = s >= 0.5
    tp = int(((y == 1) & pred).sum())
    fp = int(((y == 0) & pred).sum())
    assert int(rep["tp"].iloc[0]) == tp
    assert int(rep["fp"].iloc[0]) == fp
    assert rep["precision"].iloc[0] == tp / (tp + fp)
    assert rep["recall"].iloc[0] == tp / int((y == 1).sum())
    assert int(rep["n"].iloc[0]) == len(df)


def test_partition_invariance_and_tiny_ranges():
    df = _fixture(n=800, seed=11)
    a = binary_classification_report(
        rd.from_pandas(df, override_num_blocks=1), "y", "s", "id",
        n_ranges=3)
    b = binary_classification_report(
        rd.from_pandas(df, override_num_blocks=13), "y", "s", "id",
        n_ranges=64)
    pd.testing.assert_frame_equal(a, b)


def test_degenerate_single_class():
    df = pd.DataFrame({"id": [0, 1, 2], "y": [1, 1, 1],
                       "s": [0.2, 0.9, 0.7]})
    rep = binary_classification_report(rd.from_pandas(df), "y", "s", "id")
    assert np.isnan(rep["auc"].iloc[0])
    assert rep["recall"].iloc[0] == 2 / 3   # s>=0.5 keeps 0.9, 0.7
    assert rep["precision"].iloc[0] == 1.0  # no negatives to mistake


def test_all_scores_equal():
    # one global tie group: AUC must be exactly 0.5
    df = pd.DataFrame({"id": range(10), "y": [0, 1] * 5,
                       "s": [0.5] * 10})
    rep = binary_classification_report(
        rd.from_pandas(df, override_num_blocks=3), "y", "s", "id")
    assert rep["auc"].iloc[0] == 0.5


def test_calibration_bins_matches_bruteforce():
    from raykg.ops.mlmetrics import calibration_bins

    df = _fixture(n=2500, seed=11)
    df["s"] = df["s"].clip(0.0, 1.0)
    df["h"] = (df["id"].to_numpy(np.int64) * 7919) % (1 << 32)
    out = calibration_bins(
        rd.from_pandas(df, override_num_blocks=6), "y", "s",
        bins=10, int_sum_cols=["h"])
    b = np.minimum((df["s"].to_numpy() * 10).astype(np.int64), 9)
    ref = (pd.DataFrame({"bin": b, "y": df["y"], "h": df["h"]})
           .groupby("bin")
           .agg(n=("y", "size"), pos=("y", "sum"), sum_h=("h", "sum"))
           .reset_index())
    assert out["bin"].tolist() == ref["bin"].tolist()
    assert out["n"].tolist() == ref["n"].tolist()
    assert out["pos"].tolist() == ref["pos"].tolist()
    # exact integer side sums travel as decimal strings
    assert [int(v) for v in out["sum_h"]] == ref["sum_h"].tolist()
    np.testing.assert_array_equal(
        out["frac_pos"].to_numpy(),
        (ref["pos"] / ref["n"]).to_numpy())


def test_grouped_auc_matches_bruteforce():
    from raykg.ops.mlmetrics import grouped_auc

    df = _fixture(n=2400, seed=13)
    df["g"] = (df["id"].to_numpy(np.int64) % 5).astype(str)
    out = grouped_auc(
        rd.from_pandas(df, override_num_blocks=7), "g", "y", "s")
    assert len(out) == 5
    for _, row in out.iterrows():
        sub = df[df["g"] == row["g"]]
        ref = _brute_auc(sub["y"].to_numpy(), sub["s"].to_numpy())
        assert row["auc"] == ref, row["g"]
        assert int(row["pos"]) == int(sub["y"].sum())
        assert int(row["neg"]) == int((1 - sub["y"]).sum())


def test_grouped_auc_drops_degenerate_and_partition_invariant():
    from raykg.ops.mlmetrics import grouped_auc

    df = _fixture(n=900, seed=17)
    df["g"] = (df["id"].to_numpy(np.int64) % 4).astype(str)
    # group "3" becomes all-positive -> AUC undefined -> dropped
    df.loc[df["g"] == "3", "y"] = 1
    a = grouped_auc(rd.from_pandas(df, override_num_blocks=1),
                    "g", "y", "s", coarse=2)
    b = grouped_auc(rd.from_pandas(df, override_num_blocks=11),
                    "g", "y", "s", coarse=64)
    pd.testing.assert_frame_equal(a, b)
    assert a["g"].tolist() == ["0", "1", "2"]


def test_calibration_bins_partition_invariant_and_clamp():
    from raykg.ops.mlmetrics import calibration_bins

    # scores exactly 1.0 clamp into the last bin; empty bins absent
    df = pd.DataFrame({
        "y": [1, 0, 1, 0, 1],
        "s": [1.0, 1.0, 0.05, 0.05, 0.55],
    })
    a = calibration_bins(rd.from_pandas(df, override_num_blocks=1),
                         "y", "s", bins=10)
    b = calibration_bins(rd.from_pandas(df, override_num_blocks=5),
                         "y", "s", bins=10)
    pd.testing.assert_frame_equal(a, b)
    assert a["bin"].tolist() == [0, 5, 9]
    assert a.loc[a["bin"] == 9, "n"].iloc[0] == 2
