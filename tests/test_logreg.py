"""Distributed IRLS logistic regression (raykg/ops/logreg.py):
agreement with the in-memory fit, partition-count stability, and the
scoring stage."""

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.nil import LogisticModel
from raykg.ops.logreg import fit_logreg_distributed, score_dataset

FEATS = ["f0", "f1", "f2"]


def _make_frame(n=4000, seed=7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3)) * np.array([2.0, 0.5, 1.0]) + np.array(
        [1.0, -3.0, 0.0])
    logits = 1.2 * X[:, 0] - 0.8 * X[:, 1] + 0.1 * X[:, 2] - 1.0
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-logits))).astype(np.int64)
    return pd.DataFrame({"f0": X[:, 0], "f1": X[:, 1], "f2": X[:, 2],
                         "label": y})


def test_distributed_fit_matches_in_memory():
    df = _make_frame()
    ds = rd.from_pandas(df).repartition(8)
    dist = fit_logreg_distributed(ds, FEATS, "label", C=1.0)
    mem = LogisticModel.fit(df[FEATS].to_numpy(),
                            df["label"].to_numpy(np.float64), FEATS, C=1.0)
    # same objective, same scaler, same stop rule -> same optimum to
    # solver tolerance
    assert np.allclose(dist.coef, mem.coef, atol=1e-6)
    assert abs(dist.intercept - mem.intercept) < 1e-6
    assert np.allclose(dist.mean, mem.mean, atol=1e-9)
    assert np.allclose(dist.scale, mem.scale, atol=1e-9)


def test_partition_count_stability():
    df = _make_frame(n=2500, seed=11)
    fits = []
    for parts in (1, 2, 16):
        ds = rd.from_pandas(df).repartition(parts)
        fits.append(fit_logreg_distributed(ds, FEATS, "label"))
    for other in fits[1:]:
        assert np.allclose(fits[0].coef, other.coef, atol=1e-7)
        assert abs(fits[0].intercept - other.intercept) < 1e-7


def test_recovers_planted_separation():
    # feature f0 alone separates the classes almost perfectly: its
    # standardized coefficient must dominate and point the right way
    rng = np.random.default_rng(3)
    n = 3000
    y = rng.integers(0, 2, n)
    df = pd.DataFrame({
        "f0": y * 4.0 + rng.normal(scale=0.3, size=n),
        "f1": rng.normal(size=n),
        "f2": rng.normal(size=n),
        "label": y,
    })
    m = fit_logreg_distributed(rd.from_pandas(df).repartition(4),
                               FEATS, "label")
    assert m.coef[0] > 3.0 * max(abs(m.coef[1]), abs(m.coef[2]))
    p = m.predict_proba1(df[FEATS].to_numpy())
    acc = ((p > 0.5).astype(int) == y).mean()
    assert acc > 0.95


def test_score_dataset_stage():
    df = _make_frame(n=500, seed=5)
    ds = rd.from_pandas(df).repartition(3)
    model = fit_logreg_distributed(ds, FEATS, "label")
    scored = score_dataset(ds, model, FEATS, out_col="p").to_pandas()
    expect = model.predict_proba1(df[FEATS].to_numpy())
    got = scored.sort_values("f0")["p"].to_numpy()
    want = expect[np.argsort(df["f0"].to_numpy())]
    assert np.allclose(got, want, atol=1e-12)
