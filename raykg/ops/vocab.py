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
