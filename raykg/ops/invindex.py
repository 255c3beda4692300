"""Inverted-index construction: term → (df, segmented postings) over
a document corpus — the build side of full-text search (``ops.bm25``
is the query side; this materializes the index a search service would
serve).

Scale shape:
  * per block, (term, doc_id, tf) rows are pre-combined with one
    lexsort + boundary scan — one row per DISTINCT term per doc per
    block enters the exchange, never one per token;
  * terms co-locate by hash bucket (coarse modulo — every posting of
    a term lands in one task); the bucket sorts once by (term,
    doc_id) and slices postings out with ``np.diff`` boundaries;
  * **hot-term bound**: postings are SEGMENTED — a term with df >
    ``segment`` emits ⌈df/segment⌉ rows of ≤ ``segment`` doc ids each
    (``seg`` ordinal, doc-id-ordered), so a stopword with 10⁹
    postings at 100 TB becomes 60k bounded rows instead of one
    unwritable 8 GB list cell. Consumers re-concatenate by (term,
    seg) order; Parquet row groups stay bounded.

Tokenization matches ``ops.vocab`` (exact single-space split so the
DuckDB oracle can mirror it with ``string_split``; pass ``pattern``
for regex splitting when oracle parity is not needed).

Reference scope: the reference serves candidate lookups from
FAISS/Postgres, but its vendored BLINK tree ships a Solr ingestion
path (pipeline/biencoder/blink/candidate_retrieval/) — this operator
is that capability rebuilt as a streaming exchange instead of a
Solr server.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


INV_BUCKETS = 128


def _local_postings(t: pa.Table, text_col: str, id_col: str,
                    pattern: str | None, coarse: int) -> pa.Table:
    from raykg.util import hash_strings

    texts = t.column(text_col).to_pandas()
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    if pattern is None:
        tokens = texts.str.split(" ")
    else:
        tokens = texts.str.split(pattern, regex=True)
    flat = tokens.explode().dropna()
    flat = flat[flat.str.len() > 0]
    if len(flat) == 0:
        return pa.table({"_bk": pa.array([], pa.int32()),
                         "term": pa.array([], pa.string()),
                         "doc": pa.array([], pa.int64()),
                         "tf": pa.array([], pa.int64())})
    words = flat.to_numpy()
    doc = ids[flat.index.to_numpy(dtype=np.int64)]
    # pre-combine (term, doc) with counts: factorize + lexsort
    codes, uniq = pd.factorize(words, sort=False)
    order = np.lexsort((doc, codes))
    c, d = codes[order], doc[order]
    bnd = np.empty(len(c), dtype=bool)
    bnd[0] = True
    bnd[1:] = (c[1:] != c[:-1]) | (d[1:] != d[:-1])
    idx = np.flatnonzero(bnd)
    tf = np.diff(np.append(idx, len(c)))
    terms = uniq[c[idx]].astype(object)
    bk = (hash_strings(list(terms)) % np.uint64(coarse)).astype(np.int32)
    return pa.table({
        "_bk": pa.array(bk),
        "term": pa.array(terms, pa.string()),
        "doc": pa.array(d[idx], pa.int64()),
        "tf": pa.array(tf.astype(np.int64)),
    })


def build_inverted_index(ds, text_col: str = "text",
                         id_col: str = "doc_id",
                         pattern: str | None = None,
                         segment: int = 1 << 14,
                         coarse: int = INV_BUCKETS):
    """-> Dataset of ``(term, df, seg, n_seg, doc_ids, tfs)``:
    ``df`` = corpus document frequency, ``doc_ids``/``tfs`` aligned
    doc-id-ascending posting lists for segment ``seg`` (0-based) of
    ``n_seg`` total segments, each ≤ ``segment`` postings."""

    def bucket_build(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "term": pd.Series([], dtype="object"),
                "df": pd.Series([], dtype="int64"),
                "seg": pd.Series([], dtype="int64"),
                "n_seg": pd.Series([], dtype="int64"),
                "doc_ids": pd.Series([], dtype="object"),
                "tfs": pd.Series([], dtype="object"),
            })
        codes, uniq = pd.factorize(df["term"].to_numpy(), sort=False)
        doc = df["doc"].to_numpy()
        tf = df["tf"].to_numpy()
        order = np.lexsort((doc, codes))
        c, d, f = codes[order], doc[order], tf[order]
        # merge duplicate (term, doc) rows from different blocks
        bnd = np.empty(len(c), dtype=bool)
        bnd[0] = True
        bnd[1:] = (c[1:] != c[:-1]) | (d[1:] != d[:-1])
        idx = np.flatnonzero(bnd)
        grp = np.cumsum(bnd) - 1
        f_m = np.zeros(len(idx), dtype=np.int64)
        np.add.at(f_m, grp, f)
        c_m, d_m = c[idx], d[idx]
        # term boundaries over the merged postings
        tb = np.empty(len(c_m), dtype=bool)
        tb[0] = True
        tb[1:] = c_m[1:] != c_m[:-1]
        t_idx = np.flatnonzero(tb)
        dfreq = np.diff(np.append(t_idx, len(c_m)))
        rows = {"term": [], "df": [], "seg": [], "n_seg": [],
                "doc_ids": [], "tfs": []}
        for start, n in zip(t_idx, dfreq):
            term = uniq[c_m[start]]
            n_seg = -(-int(n) // segment)
            for s in range(n_seg):
                a = start + s * segment
                b = min(start + (s + 1) * segment, start + n)
                rows["term"].append(term)
                rows["df"].append(int(n))
                rows["seg"].append(s)
                rows["n_seg"].append(n_seg)
                rows["doc_ids"].append(d_m[a:b].tolist())
                rows["tfs"].append(f_m[a:b].tolist())
        return pd.DataFrame(rows)

    return (
        ds.map_batches(
            lambda t: _local_postings(t, text_col, id_col, pattern, coarse),
            batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(bucket_build, batch_format="pandas")
    )


def lookup_postings(index_ds, terms: list[str]) -> pd.DataFrame:
    """Fetch + reassemble full posting lists for a small term set (an
    audit/debug helper; a serving path would partition the index files
    by term-hash range and read only the matching fragments)."""
    import pyarrow.compute as pc_

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc_.is_in(t.column("term"),
                                  value_set=pa.array(terms)))

    got = index_ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    out = []
    for term, g in got.groupby("term"):
        g = g.sort_values("seg")
        out.append({
            "term": term,
            "df": int(g["df"].iloc[0]),
            "doc_ids": [i for seg in g["doc_ids"] for i in seg],
            "tfs": [i for seg in g["tfs"] for i in seg],
        })
    return pd.DataFrame(out).sort_values("term").reset_index(drop=True) \
        if out else pd.DataFrame(columns=["term", "df", "doc_ids", "tfs"])


def phrase_count(ds, w1: str, w2: str, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Exact two-word phrase occurrence counts: how many times token
    ``w1`` is IMMEDIATELY followed by ``w2`` in each document — the
    phrase-query primitive a positional index answers (here as the
    one-shot streaming scan; the stored positional index is the
    repeated-query artifact). Tokenization = the module's exact
    single-space split, so the SQL oracle mirrors with string_split
    adjacency. Distinct words only (w1 != w2) keeps non-overlapping
    counts identical to regex semantics.

    Scale shape: pure map — flatten each batch's token lists once
    (list_parent_indices), adjacency mask = one vectorized compare of
    consecutive flat tokens within the same parent, per-doc counts by
    bincount. No shuffle, no Python per-row work.

    -> Dataset(id_col, n_occurrences), only docs with >= 1 match.
    """
    if w1 == w2:
        raise ValueError("phrase_count requires distinct words "
                         "(overlapping self-phrases diverge from "
                         "non-overlapping regex counts)")
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).combine_chunks()
        ids = t.column(id_col).combine_chunks()
        parts = pc.split_pattern(pc.utf8_lower(texts), " ")
        flat = pc.list_flatten(parts).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(parts).to_numpy(
            zero_copy_only=False)
        if len(flat) < 2:
            return pa.table({id_col: pa.array([], ids.type),
                             "n_occurrences": pa.array([], pa.int64())})
        hit = ((flat[:-1] == w1) & (flat[1:] == w2)
               & (parent[:-1] == parent[1:]))
        counts = np.bincount(parent[:-1][hit], minlength=len(t))
        nz = np.flatnonzero(counts)
        return pa.table({
            id_col: ids.take(pa.array(nz)),
            "n_occurrences": pa.array(counts[nz].astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
