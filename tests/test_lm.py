"""Bigram-LM perplexity pinned against an independent dict-based
reference (same published math: add-k smoothing, unigram/bigram
interpolation, OOV floor, BOS contexts)."""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raykg.ops.lm import ADD_K, BOS, INTERP, fit_bigram_lm, score_perplexity


def _ref_fit(docs, add_k=ADD_K):
    from collections import Counter

    uni, big = Counter(), Counter()
    for text in docs:
        ws = text.lower().split()
        for w in ws:
            uni[w] += 1
        for a, b in zip([BOS] + ws[:-1], ws):
            big[(a, b)] += 1
    return uni, big


def _ref_ppl(text, uni, big, add_k=ADD_K, interp=INTERP):
    vocab = sorted(uni)
    total = sum(uni.values())
    V = len(vocab) + 1
    ctx_tot = {}
    for (a, _), n in big.items():
        ctx_tot[a] = ctx_tot.get(a, 0) + n
    ws = text.lower().split()
    lps = []
    for a, b in zip([BOS] + ws[:-1], ws):
        p_uni = (uni.get(b, 0) + add_k) / (total + add_k * V) \
            if b in uni else add_k / (total + add_k * V)
        if (a, b) in big:
            p_big = (big[(a, b)] + add_k) / (ctx_tot[a] + add_k * V)
        else:
            p_big = 0.0
        lps.append(math.log2(interp * p_big + (1 - interp) * p_uni))
    return 2 ** (-sum(lps) / len(lps))


def _docs():
    rng = np.random.default_rng(9)
    vocab = [f"tok{i}" for i in range(40)]
    docs = [" ".join(rng.choice(vocab, rng.integers(5, 30)))
            for _ in range(50)]
    docs.append("tok1 tok2 tok3 tok1 tok2 tok3 tok1 tok2 tok3")
    docs.append("zz yy xx ww vv uu")  # fully OOV vs others? (in corpus once)
    return docs


def test_perplexity_matches_reference():
    docs = _docs()
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    ds = rd.from_pandas(df).repartition(4)
    lm = fit_bigram_lm(ds, vocab_size=1000)
    got = (
        score_perplexity(ds, lm).to_pandas()
        .set_index("doc_id")["perplexity"].sort_index()
    )
    uni, big = _ref_fit(docs)
    for i, text in enumerate(docs):
        assert got[i] == pytest.approx(_ref_ppl(text, uni, big), rel=1e-9), i


def test_perplexity_separates_repetitive_from_garbage():
    docs = _docs()
    train = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    lm = fit_bigram_lm(rd.from_pandas(train), vocab_size=1000)
    probe = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["tok1 tok2 tok3 tok1 tok2 tok3",   # in-distribution
                 "qqq www eee rrr ttt yyy"],        # OOV garbage
    })
    out = score_perplexity(rd.from_pandas(probe), lm).to_pandas()
    ppl = out.set_index("doc_id")["perplexity"]
    assert ppl[0] < ppl[1]


def test_empty_and_whitespace_docs_get_nan():
    docs = pd.DataFrame({"doc_id": [0, 1, 2],
                         "text": ["", "   ", "hello world"]})
    lm = fit_bigram_lm(rd.from_pandas(docs))
    out = score_perplexity(rd.from_pandas(docs), lm).to_pandas()
    p = out.set_index("doc_id")["perplexity"]
    assert np.isnan(p[0]) and np.isnan(p[1]) and p[2] > 0


def test_truncated_vocab_floors_tail_words():
    docs = pd.DataFrame({"doc_id": [0, 1],
                         "text": ["a a a a b", "a a a a b"]})
    lm = fit_bigram_lm(rd.from_pandas(docs), vocab_size=1)
    assert list(lm.vocab) == ["a"]
    out = score_perplexity(rd.from_pandas(docs), lm).to_pandas()
    assert np.isfinite(out["perplexity"]).all()
