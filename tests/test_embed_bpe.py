"""Embedding transforms (l2_normalize / PCA / random projection) and
distributed BPE tokenizer training, pinned against exact in-process
references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from raykg.encode import column_to_vectors
from raykg.ops.bpe import (
    _encode_word, bpe_encode, train_bpe, train_bpe_sequential,
)
from raykg.ops.embed import (
    fit_pca, l2_normalize, pca_project, random_projection,
)


def _vec_ds(n=200, d=16, seed=7, parts=4):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, d)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(v.reshape(-1), pa.float32()), d),
    })
    return rd.from_arrow(t).repartition(parts), v


# ------------------------------------------------------------ embed

def test_l2_normalize_unit_norms():
    ds, v = _vec_ds()
    out = l2_normalize(ds).to_pandas().sort_values("vec_id")
    mat = np.stack(out["embedding"].to_numpy())
    np.testing.assert_allclose(np.linalg.norm(mat, axis=1), 1.0, atol=1e-12)
    # direction preserved
    exp = v.astype(np.float64)
    exp /= np.linalg.norm(exp, axis=1, keepdims=True)
    np.testing.assert_allclose(mat, exp, atol=1e-9)


def test_l2_normalize_zero_vector_passthrough():
    t = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array([0.0, 0.0, 3.0, 4.0], pa.float32()), 2),
    })
    out = l2_normalize(rd.from_arrow(t)).to_pandas().sort_values("vec_id")
    mat = np.stack(out["embedding"].to_numpy())
    np.testing.assert_allclose(mat[0], [0.0, 0.0])
    np.testing.assert_allclose(mat[1], [0.6, 0.8], atol=1e-7)


def test_pca_matches_exact_numpy():
    ds, v = _vec_ds(n=400, d=12, parts=5)
    k = 4
    mean, comps = fit_pca(ds, k=k)
    x = v.astype(np.float64)
    np.testing.assert_allclose(mean, x.mean(axis=0), atol=1e-10)
    # exact reference: eigh of the population covariance
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / len(x)
    w, vecs = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    ref = vecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    np.testing.assert_allclose(comps, ref, atol=1e-8)
    # projection: variance per component is the eigenvalue, descending
    out = pca_project(ds, k=k, fitted=(mean, comps)).to_pandas()
    proj = np.stack(out.sort_values("vec_id")["pc"].to_numpy())
    np.testing.assert_allclose(proj, xc @ ref.T, atol=1e-8)
    assert (np.diff(proj.var(axis=0)) <= 1e-9).all()


def test_pca_partition_invariant():
    ds2, _ = _vec_ds(n=300, d=8, parts=2)
    ds8, _ = _vec_ds(n=300, d=8, parts=8)
    m2, c2 = fit_pca(ds2, k=3)
    m8, c8 = fit_pca(ds8, k=3)
    np.testing.assert_allclose(m2, m8, atol=1e-10)
    np.testing.assert_allclose(c2, c8, atol=1e-8)


def test_random_projection_deterministic_and_jl():
    ds, v = _vec_ds(n=250, d=32, parts=3)
    out1 = random_projection(ds, k=16, seed=5).to_pandas().sort_values("vec_id")
    out2 = random_projection(ds, k=16, seed=5).to_pandas().sort_values("vec_id")
    p1 = np.stack(out1["proj"].to_numpy())
    p2 = np.stack(out2["proj"].to_numpy())
    np.testing.assert_array_equal(p1, p2)
    # JL property: norms preserved in expectation (loose 3-sigma-ish gate)
    r = np.linalg.norm(p1, axis=1) / np.linalg.norm(v, axis=1)
    assert 0.8 < r.mean() < 1.2


# ------------------------------------------------------------ bpe

_CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "low lower lowest newer newest wider widest",
    "low low low lower lower newest newest newest",
    "hugging faces hug hugs hugged hugging",
]


def _corpus_ds(parts=3):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": range(len(_CORPUS)), "text": _CORPUS})).repartition(parts)


def _word_freqs():
    from collections import Counter
    c = Counter()
    for line in _CORPUS:
        c.update(w for w in line.lower().split(" ") if w)
    return dict(c)


def test_train_bpe_matches_sequential_reference():
    merges = train_bpe(_corpus_ds(), n_merges=40, n_shards=4)
    ref = train_bpe_sequential(_word_freqs(), 40)
    assert merges == ref


def test_train_bpe_shard_invariant():
    m1 = train_bpe(_corpus_ds(parts=1), n_merges=25, n_shards=1)
    m5 = train_bpe(_corpus_ds(parts=5), n_merges=25, n_shards=5)
    assert m1 == m5


def test_encode_word_greedy_rank_order():
    # ranks: ('l','o') first, then ('lo','w') -> "low" becomes one token
    ranks = {("l", "o"): 0, ("lo", "w"): 1}
    assert _encode_word("low", ranks) == ["low"]
    assert _encode_word("lot", ranks) == ["lo", "t"]
    assert _encode_word("x", ranks) == ["x"]


def test_bpe_encode_roundtrip_and_counts():
    ds = _corpus_ds()
    merges = train_bpe(ds, n_merges=30, n_shards=2)
    out = bpe_encode(ds, merges).to_pandas().sort_values("doc_id")
    # concatenating tokens of each word reproduces the text's words
    for text, toks in zip(_CORPUS, out["bpe_tokens"]):
        assert "".join(toks) == text.lower().replace(" ", "")
    cnt = bpe_encode(ds, merges, counts_only=True).to_pandas() \
        .sort_values("doc_id")
    assert list(cnt["bpe_tokens"]) == [len(t) for t in out["bpe_tokens"]]
    # merges compress: fewer tokens than characters
    n_chars = sum(len(w) for line in _CORPUS for w in line.split())
    assert sum(cnt["bpe_tokens"]) < n_chars


def test_bpe_empty_and_unseen_text():
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1], "text": ["", "zzz qqq"]}))
    merges = train_bpe(_corpus_ds(), n_merges=10, n_shards=2)
    out = bpe_encode(ds, merges).to_pandas().sort_values("doc_id")
    toks = [list(t) for t in out["bpe_tokens"]]
    assert toks[0] == []
    # unseen words fall back to characters (no applicable merges)
    assert toks[1] == list("zzz") + list("qqq")


# ------------------------------------------------ profile additions

def test_numeric_histogram_matches_numpy():
    from raykg.ops.profile import numeric_histogram
    rng = np.random.default_rng(3)
    x = rng.integers(1, 51, size=5000).astype(np.float64)
    ds = rd.from_pandas(pd.DataFrame({"x": x})).repartition(6)
    h = numeric_histogram(ds, "x", lo=0.5, width=5.0, nbins=10)
    idx = np.clip(np.floor((x - 0.5) / 5.0), 0, 9).astype(int)
    exp = np.bincount(idx, minlength=10)
    assert list(h["n"]) == [int(c) for c in exp if c > 0]
    assert h["lo"].iloc[0] == 0.5 and h["hi"].iloc[-1] == 50.5


def test_numeric_histogram_clamps_outliers():
    from raykg.ops.profile import numeric_histogram
    ds = rd.from_pandas(pd.DataFrame({"x": [-100.0, 0.0, 5.0, 999.0]}))
    h = numeric_histogram(ds, "x", lo=0.0, width=10.0, nbins=2)
    assert dict(zip(h["bin"], h["n"])) == {0: 3, 1: 1}


def test_grouped_zscore_matches_pandas():
    from raykg.ops.profile import grouped_zscore
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.choice(list("abc"), size=1000),
        "x": rng.integers(0, 100, size=1000).astype(np.float64),
        "rid": np.arange(1000, dtype=np.int64),
    })
    ds = rd.from_pandas(df).repartition(5)
    out = grouped_zscore(ds, "k", "x").to_pandas().sort_values("rid")
    exp = df.groupby("k")["x"].transform(
        lambda s: (s - s.mean()) / s.std(ddof=1))
    np.testing.assert_allclose(out["z"].to_numpy(), exp.to_numpy(),
                               atol=1e-9)


def test_grouped_zscore_degenerate_group_nan():
    from raykg.ops.profile import grouped_zscore
    df = pd.DataFrame({"k": ["a", "a", "b"], "x": [1.0, 3.0, 5.0],
                       "rid": [0, 1, 2]})
    out = grouped_zscore(rd.from_pandas(df), "k", "x").to_pandas() \
        .sort_values("rid")
    np.testing.assert_allclose(out["z"].to_numpy()[:2],
                               [-0.7071067811865475, 0.7071067811865475])
    assert np.isnan(out["z"].to_numpy()[2])
