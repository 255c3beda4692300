"""BM25 ranked keyword retrieval over a document corpus — the lexical
counterpart of the embedding k-NN operators (ops/similarity.py), used
in corpus curation for eval-set retrieval, quality probes, and hybrid
(lexical+dense) dedup candidate generation.

Scoring is the Robertson/Okapi formulation:

    score(D, Q) = Σ_{t∈Q} idf(t) · tf(t,D)·(k1+1) /
                          (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    idf(t) = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )   (Lucene's
    non-negative variant)

Scale shape: the statistics pass only tracks the QUERY terms'
document frequencies (a handful of terms — never a corpus vocabulary
build): each block emits one (term, df) row per query term plus one
(n_docs, total_len) row, tiny. The driver folds them into an idf
table broadcast via ``ray.put``. The scoring pass is one matmul per
block: a (docs × terms) tf-weight matrix against the (queries ×
terms) incidence matrix, then per-block top-k and the same per-query
merge as ``knn_bruteforce``. Document text never moves; the shuffle
carries ≤ k rows per query per block.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _tokenize(texts: pd.Series) -> pd.Series:
    return texts.str.lower().str.findall(r"[a-z0-9]+")


def bm25_topk(
    ds,
    queries: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
):
    """-> Dataset of ``(qid, doc_id, score, rank)``, rank 1..k per
    query by (score desc, doc_id asc). Documents with score 0 (no
    query term) never rank."""
    q_tokens = [sorted(set(_tokenize(pd.Series([q])).iloc[0]))
                for q in queries]
    terms = sorted({t for toks in q_tokens for t in toks})
    if not terms:
        raise ValueError("queries contain no indexable terms")
    t_idx = {t: i for i, t in enumerate(terms)}
    # (queries x terms) incidence
    Q = np.zeros((len(queries), len(terms)), dtype=np.float64)
    for qi, toks in enumerate(q_tokens):
        for t in toks:
            Q[qi, t_idx[t]] = 1.0

    terms_arr = np.array(terms)

    # ---- stats pass: df per query term + corpus size/length ----
    def block_stats(t: pa.Table) -> pa.Table:
        toks = _tokenize(t.column(text_col).to_pandas())
        n = len(toks)
        dl = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
        # df: docs containing each term (unique per doc first)
        ex = toks.explode().dropna()
        ex = ex[ex.isin(terms_arr)]
        per_doc = ex.groupby(level=0).unique()
        df_counts = np.zeros(len(terms), dtype=np.int64)
        for arr in per_doc:
            for tok in arr:
                df_counts[t_idx[tok]] += 1
        return pa.table({
            "term": pa.array(list(terms) + ["#n_docs", "#total_len"]),
            "n": pa.array(np.concatenate([
                df_counts, [n, int(dl.sum())]]), type=pa.int64()),
        })

    stats = (
        ds.map_batches(block_stats, batch_format="pyarrow")
        .to_pandas()
        .groupby("term", as_index=False)["n"].sum()
    )
    sm = dict(zip(stats["term"], stats["n"]))
    n_docs = int(sm.pop("#n_docs"))
    avgdl = max(sm.pop("#total_len"), 1) / max(n_docs, 1)
    idf = np.array([
        math.log((n_docs - sm.get(t, 0) + 0.5) / (sm.get(t, 0) + 0.5) + 1.0)
        for t in terms
    ])
    bc = ray.put((terms_arr, idf, Q))

    # ---- scoring pass: one GEMM per block, local top-k ----
    def score_block(t: pa.Table) -> pa.Table:
        terms_a, idf_a, Qm = ray.get(bc)
        tix = {s: i for i, s in enumerate(terms_a)}
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = _tokenize(t.column(text_col).to_pandas())
        dl = toks.str.len().fillna(0).to_numpy(dtype=np.float64)
        n = len(ids)
        tf = np.zeros((n, len(terms_a)), dtype=np.float64)
        ex = toks.explode().dropna()
        ex = ex[ex.isin(terms_a)]
        if len(ex):
            rows = ex.index.to_numpy(dtype=np.int64)
            cols = np.array([tix[s] for s in ex.to_numpy()], dtype=np.int64)
            np.add.at(tf, (rows, cols), 1.0)
        denom = tf + k1 * (1.0 - b + b * (dl / avgdl))[:, None]
        with np.errstate(invalid="ignore", divide="ignore"):
            W = np.where(tf > 0, idf_a * tf * (k1 + 1.0) / denom, 0.0)
        S = W @ Qm.T  # (docs x queries)
        out_q, out_d, out_s = [], [], []
        for qi in range(S.shape[1]):
            s = S[:, qi]
            nz = np.where(s > 0)[0]
            if len(nz) > k:
                nz = nz[np.argpartition(-s[nz], k - 1)[:k]]
            out_q.append(np.full(len(nz), qi, dtype=np.int64))
            out_d.append(ids[nz])
            out_s.append(s[nz])
        if not out_q:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table({
            "qid": pa.array(np.concatenate(out_q)),
            "doc_id": pa.array(np.concatenate(out_d)),
            "score": pa.array(np.concatenate(out_s)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "doc_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "doc_id", "score", "rank"]]

    return (
        ds.map_batches(score_block, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )


def bm25_reference(docs: list[str], ids: list[int], query: str,
                   k: int = 10, k1: float = 1.2, b: float = 0.75):
    """Independent plain-python reference (same tokenizer/formula)."""
    toks = [_tokenize(pd.Series([d])).iloc[0] for d in docs]
    q = sorted(set(_tokenize(pd.Series([query])).iloc[0]))
    n = len(docs)
    avgdl = max(sum(len(t) for t in toks), 1) / max(n, 1)
    scores = []
    for i, dt in enumerate(toks):
        s = 0.0
        for t in q:
            df = sum(1 for d2 in toks if t in d2)
            tf = dt.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(dt) / avgdl))
        if s > 0:
            scores.append((ids[i], s))
    scores.sort(key=lambda p: (-p[1], p[0]))
    return scores[:k]
