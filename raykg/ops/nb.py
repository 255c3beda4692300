"""Multinomial Naive Bayes text classification — the fasttext-free
baseline quality/language/domain classifier a corpus-curation pipeline
trains in one counting pass (beside the IRLS logistic trainer in
ops/logreg.py, which needs O(iterations) passes; NB is the one-pass
sibling).

TRAINING is pure exact integer counting and therefore fully
SQL-oracle-checkable: the model IS a relation —
(label, word, c) token counts plus per-label (n_docs, n_tokens)
totals. Scale shape: per-block (label, word) pre-counts (the
ops/vocab Zipf-head bound — the exchange carries one row per distinct
(label, word) per block, never per token), one word-bucket fold;
class totals are an O(labels) driver fold.

SCORING broadcasts the vocabulary-sized model once and labels each
document with argmax_c [ ln P(c) + Σ_w cnt_w · ln P(w|c) ] under
Laplace smoothing; unseen words take the ln(α / (T_c + α·V)) floor.
The per-batch work is one factorize + one matrix gather + one
scatter-add — no Python per-row loop. Scores are floats (summation
order is data-layout-dependent), so classification is pinned against
a single-process reference in tests, not a SQL oracle — the TRAINED
MODEL is where the oracle bites.

Tokenization = exact single-space split (the ops/vocab convention,
mirrored by ``string_split`` in SQL).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

NB_BUCKETS = 64


def nb_train(ds, text_col: str = "text", label_col: str = "label"):
    """-> (counts, class_stats): ``counts`` is a materialized
    Dataset(label, word, c) of exact token counts; ``class_stats`` a
    DataFrame(label, n_docs, n_tokens) sorted by label."""
    from raykg.ops.joins import _key_bucket

    def part(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).combine_chunks()
        labels = t.column(label_col).combine_chunks()
        parts = pc.split_pattern(pc.utf8_lower(texts), " ")
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts)
        df = pd.DataFrame({
            "label": labels.take(parent).to_pandas(),
            "word": flat.to_pandas(),
        })
        out = (df.groupby(["label", "word"], sort=False).size()
               .rename("c").reset_index())
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        return tbl.append_column("_b", _key_bucket(tbl.column("word"),
                                                   NB_BUCKETS))

    from raykg.ops.exchange import hash_exchange

    counts = hash_exchange(
        ds.map_batches(part, batch_format="pyarrow"), "_b", NB_BUCKETS,
        lambda g: g.groupby(["label", "word"], as_index=False)["c"]
        .sum()).materialize()

    def doc_part(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        labels = t.column(label_col)
        ntok = pc.list_value_length(
            pc.split_pattern(pc.utf8_lower(texts), " "))
        df = pd.DataFrame({
            "label": labels.to_pandas(),
            "n_tokens": ntok.to_numpy(zero_copy_only=False),
        })
        g = df.groupby("label", as_index=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = (ds.map_batches(doc_part, batch_format="pyarrow").to_pandas()
             .groupby("label", as_index=False)
             [["n_docs", "n_tokens"]].sum()
             .sort_values("label").reset_index(drop=True))
    stats["n_docs"] = stats["n_docs"].astype("int64")
    stats["n_tokens"] = stats["n_tokens"].astype("int64")
    return counts, stats


def nb_classify(ds, counts, class_stats: pd.DataFrame,
                text_col: str = "text", id_col: str = "doc_id",
                alpha: float = 1.0, out_col: str = "pred"):
    """-> Dataset(id_col, out_col): argmax-class labels (ties ->
    first label in sorted order). ``counts`` may be the Dataset from
    :func:`nb_train` or an equivalent DataFrame."""
    import ray

    cdf = counts.to_pandas() if hasattr(counts, "to_pandas") else counts
    labels = class_stats["label"].tolist()
    k = len(labels)
    lab_ix = {l: i for i, l in enumerate(labels)}
    vocab = pd.Index(sorted(cdf["word"].unique()))
    V = len(vocab)
    tot = class_stats["n_tokens"].to_numpy(np.int64).astype(np.float64)
    n_docs = class_stats["n_docs"].to_numpy(np.int64)
    prior = np.array([math.log(d / float(n_docs.sum()))
                      for d in n_docs])
    denom_raw = tot + alpha * V
    # (V+1, k) log-prob matrix; last row = unseen-word floor. Every
    # entry is math.log of the SAME quotient the reference computes
    # (libm, one log per entry — vocab-bounded), so per-doc score
    # folds are bit-identical to a sequential reference
    lnp = np.empty((V + 1, k))
    for i in range(k):
        lnp[:, i] = math.log(alpha / denom_raw[i])
    wi = vocab.get_indexer(cdf["word"])
    li = cdf["label"].map(lab_ix).to_numpy()
    cv = cdf["c"].to_numpy(np.float64)
    lnp[wi, li] = [math.log((c + alpha) / denom_raw[i])
                   for c, i in zip(cv, li)]
    model_ref = ray.put((vocab, lnp, prior, np.array(labels,
                                                     dtype=object)))

    def fn(t: pa.Table) -> pa.Table:
        voc, L, pr, labs = ray.get(model_ref)
        texts = t.column(text_col).combine_chunks()
        ids = t.column(id_col)
        parts = pc.split_pattern(pc.utf8_lower(texts), " ")
        flat = pc.list_flatten(parts).to_pandas()
        parent = pc.list_parent_indices(parts).to_numpy(
            zero_copy_only=False)
        widx = voc.get_indexer(flat)
        widx = np.where(widx < 0, len(voc), widx)
        scores = np.tile(pr, (t.num_rows, 1))
        np.add.at(scores, parent, L[widx])
        pred = labs[np.argmax(scores, axis=1)]
        return pa.table({id_col: ids,
                         out_col: pa.array(pred.astype(str))})

    return ds.map_batches(fn, batch_format="pyarrow")


def nb_reference(train_df: pd.DataFrame, test_df: pd.DataFrame,
                 text_col: str = "text", label_col: str = "label",
                 id_col: str = "doc_id", alpha: float = 1.0):
    """Single-process reference with identical semantics."""
    from collections import Counter, defaultdict

    word_c: dict = defaultdict(Counter)
    tok_tot: Counter = Counter()
    doc_tot: Counter = Counter()
    for _, r in train_df.iterrows():
        words = r[text_col].lower().split(" ")
        word_c[r[label_col]].update(words)
        tok_tot[r[label_col]] += len(words)
        doc_tot[r[label_col]] += 1
    labels = sorted(doc_tot)
    vocab = {w for c in word_c.values() for w in c}
    V = len(vocab)
    n = sum(doc_tot.values())
    rows = []
    for _, r in test_df.iterrows():
        best, best_s = None, None
        for lab in labels:
            s = math.log(doc_tot[lab] / n)
            for w in r[text_col].lower().split(" "):
                s += math.log((word_c[lab].get(w, 0) + alpha)
                              / (tok_tot[lab] + alpha * V))
            if best_s is None or s > best_s:  # strict: first label
                best, best_s = lab, s         # wins exact ties
        rows.append((r[id_col], best))
    return pd.DataFrame(rows, columns=[id_col, "pred"])
