"""Corpus vocabulary / word-frequency extraction — the first step of
tokenizer training (BPE/WordPiece both start from a word-count table)
and of stopword / boilerplate analysis over a training corpus.

Scale shape (the partial-aggregation pattern, SURVEY.md §4.2): each
input block is exploded and pre-counted LOCALLY with ``np.unique`` —
what enters the shuffle is one (word, n) row per DISTINCT word per
block, not one row per token occurrence. At 100 TB the token stream is
~10^13 rows but a block's distinct-word set is bounded by the Zipf
head (~10^5), so the groupby moves ~8 orders of magnitude less data
than a naive explode-then-groupby. The final top-k uses the same
per-block partial top-k + driver merge as ``join_top_revenue_orders``
(≤ k × n_blocks rows ever reach the driver).

Tokenization here is exact whitespace ``split(' ')`` to match DuckDB's
``string_split(text, ' ')`` oracle; pass a different ``pattern`` for
regex splitting (``\\s+``) when oracle parity is not required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum


def _local_word_counts(t: pa.Table, text_col: str, pattern: str | None) -> pa.Table:
    texts = t.column(text_col).to_pandas()
    if pattern is None:
        tokens = texts.str.split(" ")
    else:
        tokens = texts.str.split(pattern, regex=True)
    flat = tokens.explode().dropna()
    flat = flat[flat.str.len() > 0]
    if len(flat) == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    words, counts = np.unique(flat.to_numpy(), return_counts=True)
    return pa.table({"word": pa.array(words, pa.string()),
                     "n": pa.array(counts, pa.int64())})


def word_frequencies(ds, text_col: str = "text", pattern: str | None = None):
    """Full (word, n) table, one row per distinct word in the corpus."""
    return (
        ds.map_batches(
            lambda t: _local_word_counts(t, text_col, pattern),
            batch_format="pyarrow",
        )
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )


def top_words(ds, k: int = 200, text_col: str = "text",
              pattern: str | None = None) -> pd.DataFrame:
    """Top-k words by (count desc, word asc). Returns a small pandas
    frame — only ≤ k × n_blocks rows ever leave the cluster."""

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["n", "word"], ascending=[False, True])
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    out = (
        word_frequencies(ds, text_col=text_col, pattern=pattern)
        .map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()
    )
    return (
        out.sort_values(["n", "word"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def _local_ngram_counts(t: pa.Table, text_col: str, n: int) -> pa.Table:
    """Per-block word-n-gram pre-count. Same Zipf-head shuffle bound
    as the unigram path: one (gram, n) row per DISTINCT n-gram per
    block enters the exchange. Gram construction is vectorized — one
    flat token array per block, start indices by offset arithmetic,
    one C-level ``str.cat`` per gram position."""
    empty = pa.table({"gram": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    texts = t.column(text_col).to_pandas()
    if len(texts) == 0:
        return empty
    # exact whitespace split — matches string_split(text, ' ') in the
    # DuckDB oracle (empty tokens from double spaces kept on BOTH
    # sides; the synthetic corpus has none)
    tokens = texts.str.split(" ")
    lens = tokens.str.len().to_numpy(dtype=np.int64)
    flat = tokens.explode().to_numpy(dtype=object)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    num = np.maximum(lens - n + 1, 0)
    total = int(num.sum())
    if total == 0:
        return empty
    within = np.arange(total) - np.repeat(np.cumsum(num) - num, num)
    starts = np.repeat(offsets[:-1], num) + within
    first = pd.Series(flat[starts])
    grams = first.str.cat([pd.Series(flat[starts + k]) for k in range(1, n)],
                          sep=" ").to_numpy(dtype=object)
    g, c = np.unique(grams, return_counts=True)
    return pa.table({"gram": pa.array(g, pa.string()),
                     "n": pa.array(c, pa.int64())})


def ngram_frequencies(ds, n: int = 2, text_col: str = "text"):
    """Full (gram, n) word-n-gram frequency table."""
    return (
        ds.map_batches(
            lambda t: _local_ngram_counts(t, text_col, n),
            batch_format="pyarrow",
        )
        .groupby("gram")
        .aggregate(Sum("n", alias_name="n"))
    )


def top_ngrams(ds, n: int = 2, k: int = 100,
               text_col: str = "text") -> pd.DataFrame:
    """Top-k word n-grams by (count desc, gram asc) — per-block
    partial top-k then a ≤ k × n_blocks driver merge."""

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["n", "gram"],
                                       ascending=[False, True])
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    out = (
        ngram_frequencies(ds, n=n, text_col=text_col)
        .map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()
    )
    return (
        out.sort_values(["n", "gram"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
