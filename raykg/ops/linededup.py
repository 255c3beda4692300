"""CCNet-style line-level deduplication: remove every line whose
normalized text (strip + lowercase) occurs in >= ``min_docs`` DISTINCT
documents corpus-wide (Wenzek et al. 2020, "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data" — their paragraph
dedup is what strips boilerplate headers/footers/nav from web text).
Removal is ALL-occurrences (boilerplate semantics): a line shared by
``min_docs`` documents is dropped from each of them. Empty-after-
normalization lines are never counted and never removed.

Scale shape (the same adaptive strategy as MinHash verification,
``ops/dedup.py``):
  * census pass (stateless ``map_batches``): lines hash vectorized
    (shared ``hash_strings`` FNV); the exchange carries one 16-byte
    (hash, doc_id) row per DISTINCT line per doc per block, never the
    text;
  * bucket census (coarse hash-modulo ``groupby``): every occurrence
    of a line lands in one task, which counts distinct docs and emits
    the duplicated-line hash relation — bounded by BOILERPLATE volume,
    not corpus volume;
  * rebuild: if the dup relation is small (<= ``broadcast_lines``)
    it is sorted + ``ray.put`` once and every block rebuilds map-side
    with a searchsorted membership test (zero further exchange); else
    two tagged-union exchanges run — line occurrences co-locate with
    dup marks by line-hash bucket to emit (doc, lineno) removals, and
    removals co-locate with documents by doc bucket to rewrite.

Hash collisions can only over-remove at ~n_lines²/2⁶⁴ (the safe
direction for a dedup filter); the normalized-equality oracle in
``__ray_entry__`` pins the fixture output exactly.

Partitioning assumption (shuffle path): one hash bucket's occurrence
rows fit a task; buckets are uniform by construction (FNV), so raise
``coarse`` with corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from raykg.util import hash_strings

LINE_BUCKETS = 256
BROADCAST_LINES = 1 << 18  # dup-relation rows under this -> map-side rebuild


def _split_lines(texts: list[str], delimiter: str):
    """Flat (lines, doc_index, lineno) for a batch of documents."""
    per_doc = [t.split(delimiter) for t in texts]
    counts = np.fromiter((len(p) for p in per_doc), dtype=np.int64,
                         count=len(per_doc))
    flat: list[str] = []
    for p in per_doc:
        flat.extend(p)
    di = np.repeat(np.arange(len(per_doc), dtype=np.int64), counts)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    lineno = np.arange(len(flat), dtype=np.int64) - starts
    return flat, di, lineno, counts


def _norm_hashes(flat: list[str]):
    """(hash of strip+lower line, mask of non-empty-after-norm)."""
    norm = [l.strip().lower() for l in flat]
    mask = np.fromiter((len(x) > 0 for x in norm), dtype=bool,
                       count=len(norm))
    return hash_strings(norm), mask


def line_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    min_docs: int = 2,
    coarse: int = LINE_BUCKETS,
    broadcast_lines: int = BROADCAST_LINES,
):
    """Per-document rewrite dropping corpus-duplicated lines. Returns
    a Dataset with ``(id_col, text_clean, n_lines, n_removed)`` where
    ``n_lines`` counts ALL lines of the original document (including
    empty ones) and ``text_clean`` re-joins the kept raw lines with
    ``delimiter``."""

    def census(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        flat, di, _, _ = _split_lines(texts, delimiter)
        h, mask = _norm_hashes(flat)
        doc = ids[di][mask]
        h = h[mask]
        if len(h) == 0:
            return pa.table({
                "_bk": pa.array([], pa.int32()),
                "h": pa.array([], pa.uint64()),
                "d": pa.array([], pa.int64()),
            })
        # per-block distinct (line, doc) before the exchange
        order = np.lexsort((doc, h))
        hs, dcs = h[order], doc[order]
        bnd = np.empty(len(hs), dtype=bool)
        bnd[0] = True
        bnd[1:] = (hs[1:] != hs[:-1]) | (dcs[1:] != dcs[:-1])
        uh, ud = hs[bnd], dcs[bnd]
        return pa.table({
            "_bk": pa.array((uh % np.uint64(coarse)).astype(np.int32)),
            "h": pa.array(uh, pa.uint64()),
            "d": pa.array(ud.astype(np.int64)),
        })

    def bucket_dups(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h")["d"].nunique()
        dup = nd.index.values[nd.values >= min_docs].astype(np.uint64)
        return pd.DataFrame({
            "_bk": np.full(len(dup), int(g["_bk"].iloc[0]), dtype=np.int32),
            "h": dup,
        })

    dups = (
        ds.map_batches(census, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(bucket_dups, batch_format="pandas")
        .materialize()
    )
    n_dup = dups.count()

    def _rebuild_batch(t: pa.Table, removed: np.ndarray) -> pa.Table:
        """removed: bool per flat line of this batch (pre-split order)."""
        texts = t.column(text_col).to_pylist()
        flat, _, _, counts = _split_lines(texts, delimiter)
        ends = np.cumsum(counts)
        starts = ends - counts
        clean, n_rm = [], np.zeros(len(texts), dtype=np.int64)
        for i, (s, e) in enumerate(zip(starts, ends)):
            rm = removed[s:e]
            if rm.any():
                n_rm[i] = int(rm.sum())
                clean.append(delimiter.join(
                    l for l, r in zip(flat[s:e], rm) if not r))
            else:
                clean.append(texts[i])
        return pa.table({
            id_col: t.column(id_col),
            "text_clean": pa.array(clean, pa.string()),
            "n_lines": pa.array(counts, pa.int64()),
            "n_removed": pa.array(n_rm, pa.int64()),
        })

    if n_dup <= broadcast_lines:
        # dup relation bounded -> sort once, broadcast, map-side rebuild
        dup_arr = np.sort(
            dups.to_pandas()["h"].to_numpy().astype(np.uint64))
        dup_ref = ray.put(dup_arr)

        def rebuild_bcast(t: pa.Table) -> pa.Table:
            texts = t.column(text_col).to_pylist()
            flat, _, _, _ = _split_lines(texts, delimiter)
            h, mask = _norm_hashes(flat)
            dup = ray.get(dup_ref)
            if len(dup) == 0:
                removed = np.zeros(len(flat), dtype=bool)
            else:
                pos = np.clip(np.searchsorted(dup, h), 0, len(dup) - 1)
                removed = mask & (dup[pos] == h)
            return _rebuild_batch(t, removed)

        return ds.map_batches(rebuild_bcast, batch_format="pyarrow")

    # shuffle path: occurrences + dup marks co-locate by line hash
    def occurrences(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        flat, di, lineno, _ = _split_lines(texts, delimiter)
        h, mask = _norm_hashes(flat)
        return pa.table({
            "_bk": pa.array((h[mask] % np.uint64(coarse)).astype(np.int32)),
            "h": pa.array(h[mask], pa.uint64()),
            "d": pa.array(ids[di][mask].astype(np.int64)),
            "ln": pa.array(lineno[mask]),
            "_side": pa.array(np.zeros(int(mask.sum()), dtype=np.int8)),
        })

    def tag_dups(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "_bk": t.column("_bk"),
            "h": t.column("h"),
            "d": pa.nulls(n, pa.int64()),
            "ln": pa.nulls(n, pa.int64()),
            "_side": pa.array(np.ones(n, dtype=np.int8)),
        })

    def bucket_removals(g: pd.DataFrame) -> pd.DataFrame:
        dup = np.sort(
            g.loc[g["_side"] == 1, "h"].to_numpy().astype(np.uint64))
        occ = g[g["_side"] == 0]
        if len(dup) == 0 or len(occ) == 0:
            return pd.DataFrame({"d": pd.Series([], dtype=np.int64),
                                 "ln": pd.Series([], dtype=np.int64)})
        h = occ["h"].to_numpy().astype(np.uint64)
        pos = np.clip(np.searchsorted(dup, h), 0, len(dup) - 1)
        hit = dup[pos] == h
        # pandas widens int columns to float when the group carries the
        # dup side's null rows — restore the exact integer dtypes
        return pd.DataFrame({
            "d": occ["d"].to_numpy()[hit].astype(np.int64),
            "ln": occ["ln"].to_numpy()[hit].astype(np.int64),
        })

    removals = (
        ds.map_batches(occurrences, batch_format="pyarrow")
        .union(dups.map_batches(tag_dups, batch_format="pyarrow"))
        .groupby("_bk")
        .map_groups(bucket_removals, batch_format="pandas")
    )

    # removals + documents co-locate by doc bucket to rewrite
    from raykg.ops.joins import _key_bucket

    def tag_docs(t: pa.Table) -> pa.Table:
        return pa.table({
            "_dbk": _key_bucket(t.column(id_col), coarse),
            id_col: t.column(id_col),
            text_col: t.column(text_col),
            "ln": pa.nulls(t.num_rows, pa.int64()),
            "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        })

    def tag_removals(t: pa.Table) -> pa.Table:
        return pa.table({
            "_dbk": _key_bucket(t.column("d"), coarse),
            id_col: t.column("d"),
            text_col: pa.nulls(t.num_rows, pa.string()),
            "ln": t.column("ln"),
            "_side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
        })

    def bucket_rewrite(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["_side"] == 0]
        rem = g[g["_side"] == 1]
        rm_by_doc: dict[int, set] = {}
        for d, ln in zip(rem[id_col].to_numpy(), rem["ln"].to_numpy()):
            rm_by_doc.setdefault(int(d), set()).add(int(ln))
        ids = docs[id_col].to_numpy().astype(np.int64)
        texts = docs[text_col].tolist()
        clean, n_lines, n_rm = [], [], []
        for i, txt in zip(ids, texts):
            parts = txt.split(delimiter)
            n_lines.append(len(parts))
            rm = rm_by_doc.get(int(i), ())
            n_rm.append(len(rm))
            if rm:
                clean.append(delimiter.join(
                    l for j, l in enumerate(parts) if j not in rm))
            else:
                clean.append(txt)
        return pd.DataFrame({
            id_col: ids,
            "text_clean": clean,
            "n_lines": np.asarray(n_lines, dtype=np.int64),
            "n_removed": np.asarray(n_rm, dtype=np.int64),
        })

    return (
        ds.map_batches(tag_docs, batch_format="pyarrow")
        .union(removals.map_batches(tag_removals, batch_format="pyarrow"))
        .groupby("_dbk")
        .map_groups(bucket_rewrite, batch_format="pandas")
    )
