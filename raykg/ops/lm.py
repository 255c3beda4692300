"""N-gram language-model perplexity scoring — the CCNet-style quality
dial (Wenzek et al. 2020 score Common Crawl with a KenLM 5-gram and
keep the low-perplexity head; Llama/Falcon pipelines do the same).
The sandbox has no KenLM, so the model is an interpolated
unigram+bigram LM with add-k smoothing — the published backoff family
— with the fit/score seam shaped exactly like the real thing: FIT
once on a bounded reference sample, BROADCAST the table, SCORE the
corpus in one stateless vectorized pass.

Scale shape:
  * fit: unigram and bigram counts come from the same partial-
    aggregation pattern as ``ops.vocab`` (per-block ``np.unique``
    pre-count, one grouped sum); only the TOP-V vocabulary and its
    bigram rows ever reach the driver (Zipf bounds both), and the
    fitted table ships once via ``ray.put``;
  * score: per batch, words hash against the vocab (np.searchsorted
    on the sorted word array), bigram log-probs gather from a sorted
    composite-key array — two vectorized lookups per token, no Python
    row loop;
  * documents score with mean per-token log2 prob → perplexity
    2^(-mean); OOV words fall to the smoothed unigram floor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ray.data.aggregate import Sum

DEFAULT_VOCAB = 50_000
ADD_K = 0.1
INTERP = 0.75  # weight on the bigram term
BOS = "<s>"


def _shift_prev(cur: np.ndarray, di: np.ndarray) -> np.ndarray:
    """Previous-word array with BOS at each document start. The dtype
    widens to hold BOS even when every corpus word is shorter."""
    width = max(cur.dtype.itemsize // 4, len(BOS))
    prev = np.empty(len(cur), dtype=f"U{width}")
    prev[1:] = cur[:-1]
    starts = np.empty(len(di), dtype=bool)
    if len(di):
        starts[0] = True
        starts[1:] = di[1:] != di[:-1]
        prev[starts] = BOS
    return prev


def _block_gram_counts(t: pa.Table, text_col: str) -> pa.Table:
    """(gram, n) partial counts for unigrams and BOS-padded bigrams;
    bigrams encode as 'w1\\x1fw2' (unit separator — NUL is numpy-U padding and would vanish) so one grouped sum fits both."""
    texts = pd.Series(t.column(text_col).to_pylist(), dtype="object")
    toks = texts.str.lower().str.split()
    uni = toks.explode().dropna()
    uni = uni[uni.str.len() > 0]
    if len(uni) == 0:
        return pa.table({"gram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    cur = uni.to_numpy(dtype="U")
    di = uni.index.to_numpy(np.int64)
    prev = _shift_prev(cur, di)
    big = np.char.add(np.char.add(prev, "\x1f"), cur)
    all_grams = np.concatenate([cur, big])
    grams, counts = np.unique(all_grams, return_counts=True)
    return pa.table({"gram": pa.array(grams, pa.string()),
                     "n": pa.array(counts.astype(np.int64))})


class BigramLM:
    """Fitted table: sorted vocab + log-prob arrays (picklable,
    broadcast once)."""

    def __init__(self, vocab, uni_logp, oov_logp, bigram_keys,
                 bigram_logp, interp):
        self.vocab = vocab            # sorted unigram strings
        self.uni_logp = uni_logp      # aligned with vocab
        self.oov_logp = oov_logp
        self.bigram_keys = bigram_keys  # sorted 'w1\x1fw2' strings
        self.bigram_logp = bigram_logp
        self.interp = interp

    def logp_tokens(self, prev: np.ndarray, cur: np.ndarray) -> np.ndarray:
        """log2 P(cur | prev) for aligned word arrays (vectorized)."""
        i = np.searchsorted(self.vocab, cur)
        i = np.clip(i, 0, len(self.vocab) - 1)
        known = self.vocab[i] == cur
        p_uni = np.where(known, self.uni_logp[i], self.oov_logp)
        if len(self.bigram_keys):
            keys = np.char.add(np.char.add(prev.astype("U"), "\x1f"),
                               cur.astype("U"))
            j = np.searchsorted(self.bigram_keys, keys)
            j = np.clip(j, 0, len(self.bigram_keys) - 1)
            hit = self.bigram_keys[j] == keys
            p_big = np.where(hit, self.bigram_logp[j], -np.inf)
        else:
            p_big = np.full(len(cur), -np.inf)
        # interpolated: l*P_bi + (1-l)*P_uni in prob space
        with np.errstate(over="ignore"):
            prob = (self.interp * np.exp2(p_big.astype(np.float64))
                    + (1 - self.interp) * np.exp2(p_uni.astype(np.float64)))
        return np.log2(np.maximum(prob, 1e-300))


def fit_bigram_lm(ds, text_col: str = "text", vocab_size: int = DEFAULT_VOCAB,
                  add_k: float = ADD_K, interp: float = INTERP) -> BigramLM:
    """Fit on (a sample of) the corpus — one grouped sum over
    per-block partial gram counts; only top-V rows reach the driver."""
    counts = (
        ds.map_batches(lambda t: _block_gram_counts(t, text_col),
                       batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    is_big = counts["gram"].str.contains("\x1f", regex=False)
    uni = counts[~is_big].nlargest(vocab_size, "n", keep="all")
    vocab = np.sort(uni["gram"].to_numpy())
    n_uni = uni.set_index("gram")["n"].reindex(vocab).to_numpy(np.float64)
    total = n_uni.sum()
    V = len(vocab) + 1  # +1 OOV class
    uni_logp = np.log2((n_uni + add_k) / (total + add_k * V))
    oov_logp = float(np.log2(add_k / (total + add_k * V)))

    big = counts[is_big].copy()
    parts = big["gram"].str.split("\x1f", expand=True)
    if len(big):
        big["w1"], big["w2"] = parts[0], parts[1]
        keep = big["w2"].isin(vocab) & (big["w1"].isin(vocab)
                                        | (big["w1"] == BOS))
        big = big[keep]
        ctx_tot = big.groupby("w1")["n"].transform("sum").to_numpy(np.float64)
        blogp = np.log2((big["n"].to_numpy(np.float64) + add_k)
                        / (ctx_tot + add_k * V))
        order = np.argsort(big["gram"].to_numpy())
        bigram_keys = big["gram"].to_numpy()[order]
        bigram_logp = blogp[order]
    else:
        bigram_keys = np.empty(0, dtype="U1")
        bigram_logp = np.empty(0, dtype=np.float64)
    return BigramLM(vocab, uni_logp, oov_logp, bigram_keys, bigram_logp,
                    interp)


def score_perplexity(ds, lm: BigramLM, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Add a ``perplexity`` column: 2^(-mean log2 P(w_i|w_{i-1})) per
    document; empty documents get NaN. The LM broadcasts once."""
    lm_ref = ray.put(lm)

    def fn(t: pa.Table) -> pa.Table:
        model: BigramLM = ray.get(lm_ref)
        texts = pd.Series(t.column(text_col).to_pylist(), dtype="object")
        toks = texts.str.lower().str.split()
        ex = toks.explode().dropna()
        ex = ex[ex.str.len() > 0]
        ppl = np.full(len(t), np.nan)
        if len(ex):
            cur = ex.to_numpy(dtype="U")
            di = ex.index.to_numpy(np.int64)
            prev = _shift_prev(cur, di)
            lp = model.logp_tokens(prev, cur)
            sums = np.zeros(len(t))
            cnts = np.zeros(len(t))
            np.add.at(sums, di, lp)
            np.add.at(cnts, di, 1)
            nz = cnts > 0
            ppl[nz] = np.exp2(-sums[nz] / cnts[nz])
        return t.append_column("perplexity", pa.array(ppl, pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow")
