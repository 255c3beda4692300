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


def group_token_totals(ds, group_col: str, text_col: str = "text"):
    """Tiny (group, total token count) table — per-block partials,
    groups are few (source/domain cardinality), so the driver fold is
    O(groups)."""

    def part(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pandas()
        toks = texts.str.split(" ").apply(
            lambda ws: sum(1 for w in ws if w))
        g = t.column(group_col).to_pandas()
        out = pd.DataFrame({group_col: g, "n": toks.to_numpy()})
        out = out.groupby(group_col, as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return parts.groupby(group_col, as_index=False)["n"].sum()


def distinctive_terms(ds, group_col: str = "source",
                      text_col: str = "text", k: int = 10,
                      coarse: int = 64):
    """Per-group distinctive keywords by LIFT — the "what words
    characterize this source/domain" report a corpus-curation run
    produces per domain: lift(g, w) = (freq of w in g) / (freq of w
    overall) = (n_gw × n_total) / (n_g × n_w). Lift > 1 marks words
    over-represented in the group (plain TF-IDF degenerates when every
    group shares the vocabulary — document-frequency is then constant —
    while lift ranks by frequency skew).

    Scale shape: per-block (group, word, n) pre-counts (the Zipf-head
    bound of ``word_frequencies``) co-locate by WORD hash bucket; the
    bucket task folds each word's per-group totals and global count and
    scores lift with the broadcast (n_g, n_total) table (O(groups),
    driver-safe); per-group top-k selection then runs the skew-safe
    per-block-combiner + bucket-final pattern of ``ops.rank``. Both
    products are exact int64 and the single float division matches the
    SQL oracle bit-for-bit.
    """
    from raykg.ops.joins import _key_bucket

    totals = group_token_totals(ds, group_col, text_col)
    n_total = int(totals["n"].sum())
    n_g_map = dict(zip(totals[group_col], totals["n"].astype(np.int64)))

    def local_counts(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pandas()
        groups = t.column(group_col).to_pandas()
        tokens = texts.str.split(" ")
        df = pd.DataFrame({group_col: groups.repeat(
            tokens.str.len().to_numpy()),
            "word": tokens.explode().to_numpy()})
        df = df[df["word"].str.len() > 0]
        out = (df.groupby([group_col, "word"], as_index=False)
               .size().rename(columns={"size": "n"}))
        tt = pa.Table.from_pandas(out, preserve_index=False)
        return tt.append_column("_bk", _key_bucket(tt.column("word"),
                                                   coarse))

    def bucket_score(g: pd.DataFrame) -> pd.DataFrame:
        gw = (g.groupby(["word", group_col], as_index=False)["n"].sum())
        n_w = gw.groupby("word")["n"].transform("sum").to_numpy()
        n_gw = gw["n"].to_numpy().astype(np.int64)
        n_g = gw[group_col].map(n_g_map).to_numpy().astype(np.int64)
        lift = (n_gw * np.int64(n_total)).astype(np.float64) / (
            n_g * n_w.astype(np.int64)).astype(np.float64)
        out = pd.DataFrame({group_col: gw[group_col], "word": gw["word"],
                            "n": n_gw, "lift": lift})
        # per-block combiner: k best per group is all the final needs
        out = out.sort_values([group_col, "lift", "word"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return out.groupby(group_col, sort=False).head(k)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        # whole-bucket fold (hash_exchange contract): several groups
        # co-locate per task — rank each group independently
        df = df.sort_values([group_col, "lift", "word"],
                            ascending=[True, False, True],
                            kind="mergesort")
        g = df.groupby(group_col, sort=False).head(k)
        rank = (g.groupby(group_col, sort=False).cumcount() + 1)
        g = g.assign(rank=rank.to_numpy(np.int64))
        return g[[group_col, "word", "n", "lift", "rank"]]

    from raykg.ops.exchange import hash_exchange

    scored = hash_exchange(
        ds.map_batches(local_counts, batch_format="pyarrow"), "_bk",
        coarse, bucket_score)

    def add_gb(t: pa.Table) -> pa.Table:
        return t.append_column("_gb", _key_bucket(t.column(group_col),
                                                  16))

    return hash_exchange(
        scored.map_batches(add_gb, batch_format="pyarrow"), "_gb", 16,
        final_topk)


def pmi_bigrams(ds, k: int = 50, min_count: int = 5,
                text_col: str = "text") -> pd.DataFrame:
    """Top-k word-bigram collocations by pointwise mutual information

        pmi(x, y) = ln( p(x,y) / (p(x) p(y)) )
                  = ln( c_xy * N_uni^2 / (N_bi * c_x * c_y) )

    — the classic collocation statistic (Church & Hanks 1990): raw
    bigram frequency surfaces stopword pairs, PMI surfaces pairs that
    co-occur far above their unigram chance rate.

    Scale shape: bigram and unigram tables come from the Zipf-bounded
    per-block pre-counts above; the ``min_count`` floor is applied to
    the bigram table BEFORE the count joins, so the joined relation is
    collocation-sized, not bigram-sized. Count lookups go through the
    plan-adaptive ``auto_join`` (broadcast under the byte budget, else
    the tagged-union shuffle) — the unigram side outgrows broadcast at
    web scale and the plan switches without a semantic change.

    Exactness: counts are exact int64; the PMI expression is evaluated
    in DOUBLE with a pinned operand order ``((cxy*nu)*nu) /
    ((nb*cx)*cy)`` through one libm ``ln`` so a DuckDB oracle
    reproduces it bit-for-bit; output rounds half-up to 1e-6 and the
    (pmi desc, w1, w2) order uses the ROUNDED value, making boundary
    ties deterministic on both sides."""
    from raykg.ops.joins import auto_join

    # materialize both count tables once: they are vocabulary-sized
    # (the Zipf-head bound documented above), each feeds two consumers
    # (a total and a join side), and re-deriving them would re-run the
    # corpus pass
    big = ngram_frequencies(ds, n=2, text_col=text_col).materialize()
    uni = word_frequencies(ds, text_col=text_col).materialize()
    n_uni = int(uni.sum("n") or 0)
    n_bi = int(big.sum("n") or 0)

    def split_gram(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = t.filter(pc.greater_equal(t.column("n"), min_count))
        parts = pc.split_pattern(keep.column("gram"), " ")
        return pa.table({
            "w1": pc.list_element(parts, 0),
            "w2": pc.list_element(parts, 1),
            "cxy": keep.column("n"),
        })

    pairs = big.map_batches(split_gram, batch_format="pyarrow")
    u1 = uni.map_batches(lambda t: t.rename_columns(["w1", "cx"]),
                         batch_format="pyarrow")
    u2 = uni.map_batches(lambda t: t.rename_columns(["w2", "cy"]),
                         batch_format="pyarrow")
    j = auto_join(pairs, u1, on="w1", left_cols=["w2", "cxy"],
                  right_cols=["cx"])
    j = auto_join(j, u2, on="w2", left_cols=["w1", "cxy", "cx"],
                  right_cols=["cy"])

    def block_pmi_topk(df: pd.DataFrame) -> pd.DataFrame:
        cxy = df["cxy"].to_numpy(np.float64)
        cx = df["cx"].to_numpy(np.float64)
        cy = df["cy"].to_numpy(np.float64)
        ratio = ((cxy * float(n_uni)) * float(n_uni)) / (
            (float(n_bi) * cx) * cy)
        df = df.assign(pmi=np.floor(np.log(ratio) * 1e6 + 0.5) / 1e6)
        df = df.sort_values(["pmi", "w1", "w2"],
                            ascending=[False, True, True],
                            kind="mergesort")
        return df[["w1", "w2", "cxy", "pmi"]].head(k)

    out = (j.map_batches(block_pmi_topk, batch_format="pandas")
           .to_pandas())
    return (out.sort_values(["pmi", "w1", "w2"],
                            ascending=[False, True, True],
                            kind="mergesort")
            .head(k).reset_index(drop=True))
