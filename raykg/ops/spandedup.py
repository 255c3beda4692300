"""ExactSubstr-style duplicate-span detection: find word w-gram spans
whose exact text occurs ≥ ``min_count`` times ANYWHERE in the corpus
(including self-repetition inside one document) — the span-level
analogue of Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better" (their ExactSubstr uses a 50-token suffix
array; the published word-n-gram approximation is what GPT-3/PaLM
style pipelines run at corpus scale).

Scale shape:
  * pass 1 (stateless ``map_batches``): the whole block's words hash
    in one vectorized FNV pass and spans come from a sliding window
    over the flat word-hash array (shared with ``ops.decontam``);
    occurrences pre-combine per (span-hash, doc) — what enters the
    exchange is one 24-byte (hash, doc_id, n) row per DISTINCT span
    per doc per block, never the text;
  * pass 2: spans co-locate by HASH BUCKET (coarse modulo — every
    occurrence of a span lands in one task); the bucket counts global
    occurrences, marks spans with total ≥ min_count, and emits per-doc
    PARTIAL (n_spans, n_dup_spans) sums;
  * pass 3: one small per-doc aggregate sums the bucket partials.

Hash collisions can only over-count duplication (false positives) at
~n_spans²/2⁶⁴ — the safe direction for a dedup filter.

Partitioning assumption: one hash bucket's distinct-span rows fit a
task; buckets are uniform by construction (FNV output), so raise
``coarse`` with corpus size. A pathological single span repeated
corpus-wide yields many (hash, doc) rows in one bucket — still one
row per doc, bounded by docs/bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raykg.ops.decontam import _word_ngram_hashes

SPAN_BUCKETS = 256


def duplicate_span_stats(ds, id_col: str = "doc_id",
                         text_col: str = "text", width: int = 8,
                         min_count: int = 2, coarse: int = SPAN_BUCKETS):
    """Per-document span duplication census: ``n_spans`` (total word
    ``width``-grams), ``n_dup_spans`` (those whose exact text occurs
    ≥ ``min_count`` times corpus-wide). Documents shorter than
    ``width`` words emit no row (they have no spans)."""

    def emit_spans(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h, di = _word_ngram_hashes(texts, width)
        if len(h) == 0:
            return pa.table({
                "_bk": pa.array([], pa.int32()),
                "h": pa.array([], pa.uint64()),
                id_col: pa.array([], t.schema.field(id_col).type),
                "n": pa.array([], pa.int64()),
            })
        doc = ids[di]
        # pre-combine per (span, doc) within the block: lexsort +
        # boundary scan (6x faster than np.unique(axis=0)'s void sort)
        order = np.lexsort((doc, h))
        hs, dcs = h[order], doc[order]
        bnd = np.empty(len(hs), dtype=bool)
        bnd[0] = True
        bnd[1:] = (hs[1:] != hs[:-1]) | (dcs[1:] != dcs[:-1])
        idx = np.flatnonzero(bnd)
        counts = np.diff(np.append(idx, len(hs)))
        uh = hs[idx]
        return pa.table({
            "_bk": pa.array((uh % np.uint64(coarse)).astype(np.int32)),
            "h": pa.array(uh, pa.uint64()),
            id_col: pa.array(dcs[idx]),
            "n": pa.array(counts.astype(np.int64)),
        })

    def bucket_census(df: pd.DataFrame) -> pd.DataFrame:
        total = df.groupby("h")["n"].transform("sum")
        dup = df["n"].where(total >= min_count, 0)
        out = pd.DataFrame({
            id_col: df[id_col],
            "n_spans": df["n"],
            "n_dup_spans": dup,
        })
        return out.groupby(id_col, as_index=False).sum()

    # final combine: bucket by doc hash + one pandas sum per bucket
    # (cheaper than Ray's named-aggregate path; see ops.pivot)
    def add_doc_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.append_column("_dk", pa.array(
            ((ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             >> np.uint64(52)).astype(np.int32) % 64))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(id_col, as_index=False)[
            ["n_spans", "n_dup_spans"]].sum()

    return (
        ds.map_batches(emit_spans, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(bucket_census, batch_format="pandas")
        .map_batches(add_doc_bucket, batch_format="pyarrow")
        .groupby("_dk")
        .map_groups(final, batch_format="pandas")
    )


def filter_span_duplicates(ds, max_dup_fraction: float = 0.5,
                           id_col: str = "doc_id", text_col: str = "text",
                           width: int = 8, min_count: int = 2,
                           coarse: int = SPAN_BUCKETS):
    """Keep documents whose duplicated-span fraction is ≤
    ``max_dup_fraction`` (docs with no spans always pass). The census
    is small (one row per doc); it broadcasts as a doc-id array and
    the corpus filters in one stateless pass — same broadcast-small-
    side pattern as ``ops.decontam``."""
    import ray

    census = duplicate_span_stats(ds, id_col, text_col, width,
                                  min_count, coarse)

    def to_drop(t: pa.Table) -> pa.Table:
        frac = t.column("n_dup_spans").to_numpy(zero_copy_only=False) / \
            np.maximum(t.column("n_spans").to_numpy(zero_copy_only=False), 1)
        return t.select([id_col]).filter(pa.array(frac > max_dup_fraction))

    drop_ids = np.sort(
        census.map_batches(to_drop, batch_format="pyarrow")
        .to_pandas()[id_col].to_numpy()
    )
    drop_ref = ray.put(drop_ids)

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        bad = np.isin(ids, ray.get(drop_ref))
        return t.filter(pa.array(~bad))

    return ds.map_batches(keep, batch_format="pyarrow")
