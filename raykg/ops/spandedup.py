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
        # fold-safe whole-bucket fn: totals key on h itself, and every
        # occurrence of an h lives in bucket h % coarse
        if not len(df):
            return pd.DataFrame({id_col: df[id_col],
                                 "n_spans": df["n"],
                                 "n_dup_spans": df["n"]})
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
        if not len(df):
            return df[[id_col, "n_spans", "n_dup_spans"]]
        return df.groupby(id_col, as_index=False)[
            ["n_spans", "n_dup_spans"]].sum()

    from raykg.ops.exchange import hash_exchange

    part = hash_exchange(
        ds.map_batches(emit_spans, batch_format="pyarrow"),
        "_bk", coarse, bucket_census)
    return hash_exchange(
        part.map_batches(add_doc_bucket, batch_format="pyarrow"),
        "_dk", 64, final)


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


def _occurrence_positions(texts: list[str], n: int):
    """(gram_hash, doc_index, start_pos) for every word n-gram
    occurrence of the batch — the position-carrying variant of
    ``decontam._word_ngram_hashes`` (same tokenization: lowercase,
    whitespace split dropping empties; same FNV fold)."""
    import pandas as pd

    from raykg.util import _FNV_OFFSET, _FNV_PRIME, hash_strings

    s = pd.Series(texts, dtype="object").str.lower().str.split()
    ex = s.explode().dropna()
    if len(ex) < n:
        z = np.zeros(0, dtype=np.int64)
        return np.zeros(0, dtype=np.uint64), z, z
    words = ex.tolist()
    wh = hash_strings(words)
    di = ex.index.to_numpy(dtype=np.int64)
    # word position within its own document
    starts = np.empty(len(di), dtype=bool)
    starts[0] = True
    starts[1:] = di[1:] != di[:-1]
    first = np.flatnonzero(starts)
    counts = np.diff(np.append(first, len(di)))
    pos = np.arange(len(di), dtype=np.int64) - np.repeat(first, counts)
    W = np.lib.stride_tricks.sliding_window_view(wh, n)
    with np.errstate(over="ignore"):
        h = np.full(len(W), _FNV_OFFSET, dtype=np.uint64)
        h = (h ^ np.uint64(n)) * _FNV_PRIME
        for j in range(n):
            h = (h ^ W[:, j]) * _FNV_PRIME
    valid = di[: len(W)] == di[n - 1:]
    return h[valid], di[: len(W)][valid], pos[: len(W)][valid]


def remove_duplicate_spans(ds, id_col: str = "doc_id",
                           text_col: str = "text", width: int = 8,
                           min_count: int = 2, coarse: int = SPAN_BUCKETS,
                           out_col: str = "text_clean"):
    """ExactSubstr REMOVE mode (Lee et al. 2022 §4: keep ONE occurrence
    of each duplicated span, delete the rest): rewrite every document
    so that word positions covered by a non-canonical occurrence of a
    duplicated ``width``-gram are dropped. The canonical occurrence of
    a span is its lexicographically smallest (doc_id, start_pos) —
    deterministic under any partitioning.

    Output rows: ``(id_col, out_col, n_words, n_removed)`` where
    ``out_col`` is the kept words joined by single spaces (the
    tokenization normalizes case/whitespace — documented contract, so
    an unchanged doc still comes back lowercased single-spaced).

    Scale shape (three exchanges, all bounded by DUPLICATION volume,
    never corpus volume):
      1. census — per-block pre-combined (hash, n) rows (one per
         distinct span per block, the ``duplicate_span_stats`` bound)
         → per-hash-bucket total → the duplicated-hash set, sorted +
         broadcast via ``ray.put`` (dup-DISTINCT spans; a dup-heavy
         corpus would switch this to the Bloom bitmap of
         ``ops.dedup``, documented seam);
      2. occurrences of DUPLICATED spans only ship (hash, doc, pos)
         to hash buckets, where every occurrence of a span co-locates
         → emit non-canonical (doc, start) removal intervals;
      3. removals + docs co-locate by doc bucket (tagged union, the
         ``ops.joins`` shape) → per-doc interval-union rewrite (one
         diff-array cumsum per doc).
    """
    import ray

    # ---- pass 1: duplicated-span hash set
    def census(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        h, _ = _word_ngram_hashes(texts, width)
        if len(h) == 0:
            return pa.table({"_bk": pa.array([], pa.int32()),
                             "h": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64())})
        uh, cnt = np.unique(h, return_counts=True)
        return pa.table({
            "_bk": pa.array((uh % np.uint64(coarse)).astype(np.int32)),
            "h": pa.array(uh, pa.uint64()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def bucket_dups(df: pd.DataFrame) -> pa.Table:
        # fold-safe: totals key on h itself
        tot = df.groupby("h", sort=False)["n"].sum()
        return pa.table({"h": pa.array(
            tot.index[tot >= min_count].to_numpy(dtype=np.uint64),
            pa.uint64())})

    from raykg.ops.exchange import hash_exchange

    dup_hashes = np.sort(
        hash_exchange(ds.map_batches(census, batch_format="pyarrow"),
                      "_bk", coarse, bucket_dups)
        .to_pandas()["h"].to_numpy(dtype=np.uint64))
    dup_ref = ray.put(dup_hashes)

    # ---- pass 2: removal intervals from non-canonical occurrences
    def occurrences(t: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h, di, pos = _occurrence_positions(texts, width)
        keep = np.isin(h, dup) if len(h) else np.zeros(0, dtype=bool)
        h, doc, pos = h[keep], ids[di[keep]], pos[keep]
        return pa.table({
            "_bk": pa.array((h % np.uint64(coarse)).astype(np.int32)),
            "h": pa.array(h, pa.uint64()),
            "doc": pa.array(doc.astype(np.int64), pa.int64()),
            "pos": pa.array(pos, pa.int64()),
        })

    def non_canonical(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc": pd.Series([], dtype="int64"),
                                 "pos": pd.Series([], dtype="int64")})
        h = df["h"].to_numpy(dtype=np.uint64)
        doc = df["doc"].to_numpy()
        pos = df["pos"].to_numpy()
        order = np.lexsort((pos, doc, h))
        sh = h[order]
        first = np.empty(len(sh), dtype=bool)
        first[0] = True
        first[1:] = sh[1:] != sh[:-1]
        keep_mask = ~first                 # drop the canonical (first) row
        sel = order[keep_mask]
        return pd.DataFrame({"doc": doc[sel], "pos": pos[sel]})

    removals = hash_exchange(
        ds.map_batches(occurrences, batch_format="pyarrow"),
        "_bk", coarse, non_canonical)

    # ---- pass 3: tagged-union co-location by doc, per-doc rewrite
    def tag_docs(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "_dk": pa.array(((ids.astype(np.uint64)
                              * np.uint64(0x9E3779B97F4A7C15))
                             >> np.uint64(52)).astype(np.int32) % coarse),
            "doc": pa.array(ids, pa.int64()),
            "pos": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            "txt": t.column(text_col).cast(pa.string()),
        })

    def tag_removals(t: pa.Table) -> pa.Table:
        ids = t.column("doc").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "_dk": pa.array(((ids.astype(np.uint64)
                              * np.uint64(0x9E3779B97F4A7C15))
                             >> np.uint64(52)).astype(np.int32) % coarse),
            "doc": pa.array(ids, pa.int64()),
            "pos": t.column("pos").cast(pa.int64()),
            "txt": pa.array([None] * len(ids), pa.string()),
        })

    union = ds.map_batches(tag_docs, batch_format="pyarrow").union(
        removals.map_batches(tag_removals, batch_format="pyarrow"))

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        docs = df[df["txt"].notna()]
        rem = df[df["txt"].isna()]
        rem_by_doc = {k: g["pos"].to_numpy()
                      for k, g in rem.groupby("doc", sort=False)}
        out_id, out_txt, out_n, out_rm = [], [], [], []
        for doc, txt in zip(docs["doc"].to_numpy(), docs["txt"]):
            words = txt.lower().split()
            starts = rem_by_doc.get(doc)
            if starts is None or not len(words):
                kept = words
                removed = 0
            else:
                diff = np.zeros(len(words) + 1, dtype=np.int64)
                np.add.at(diff, starts, 1)
                ends = np.minimum(starts + width, len(words))
                np.add.at(diff, ends, -1)
                covered = np.cumsum(diff[:-1]) > 0
                removed = int(covered.sum())
                kept = [w for w, c in zip(words, covered) if not c]
            out_id.append(doc)
            out_txt.append(" ".join(kept))
            out_n.append(len(words))
            out_rm.append(removed)
        # typed Arrow output: the zero-row bucket case must carry the
        # schema (an empty pandas object column would degrade to null)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         out_col: pa.array(out_txt, pa.string()),
                         "n_words": pa.array(out_n, pa.int64()),
                         "n_removed": pa.array(out_rm, pa.int64())})

    return hash_exchange(union, "_dk", coarse, rewrite)
