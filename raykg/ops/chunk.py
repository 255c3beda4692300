"""Document chunking: split long texts into fixed-width overlapping
windows — the context-window preparation step of a pretraining / RAG
corpus build (every document becomes ceil-many (doc_id, chunk_idx,
offset, chunk) rows).

Scale shape: a pure streaming ``map_batches`` explode, no shuffle.
The inner loop is over CHUNK ROUNDS, not rows: round ``i`` slices
chunk ``i`` out of every still-long-enough document in the batch with
one vectorized ``pc.utf8_slice_codeunits`` call, so per-batch work is
O(rounds) Arrow kernel calls (rounds = chunks of the longest doc in
the batch).  Offsets and widths are CODEPOINT-based (Arrow slice
semantics == SQL ``substr`` character semantics — the oracle match).

Chunk-count contract (mirrored exactly by the SQL oracle's integer
arithmetic): ``n_chunks = 1 + max(0, ceil((len - size) / stride))``
— one chunk for any non-empty doc that fits, then one per stride
step; the final chunk may be shorter than ``size``; empty texts
produce no rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    size: int = 512, stride: int = 384,
                    out_col: str = "chunk"):
    """-> Dataset(id_col, chunk_idx, offset, out_col)."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        ids = t.column(id_col)
        lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        n_chunks = 1 + np.maximum(
            0, -(-(lens - size) // stride))  # ceil div, int-exact
        n_chunks[lens == 0] = 0
        out_ids, out_idx, out_off, out_chunk = [], [], [], []
        max_rounds = int(n_chunks.max()) if len(n_chunks) else 0
        for i in range(max_rounds):
            alive = n_chunks > i
            sub_t = texts.filter(pa.array(alive))
            off = i * stride
            out_chunk.append(
                pc.utf8_slice_codeunits(sub_t, start=off, stop=off + size))
            out_ids.append(ids.filter(pa.array(alive)))
            m = int(alive.sum())
            out_idx.append(np.full(m, i, dtype=np.int64))
            out_off.append(np.full(m, off, dtype=np.int64))
        if not out_ids:
            return pa.table({
                id_col: pa.array([], ids.type),
                "chunk_idx": pa.array([], pa.int64()),
                "offset": pa.array([], pa.int64()),
                out_col: pa.array([], pa.string()),
            })
        return pa.table({
            id_col: pa.concat_arrays([c.combine_chunks() for c in out_ids]),
            "chunk_idx": pa.array(np.concatenate(out_idx)),
            "offset": pa.array(np.concatenate(out_off)),
            out_col: pa.concat_arrays(
                [c.combine_chunks().cast(pa.string()) for c in out_chunk]),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def split_segments(ds, pattern: str, text_col: str = "text",
                   id_col: str = "doc_id", out_col: str = "segment",
                   drop_empty: bool = True):
    """Regex segmentation explode: split every document at ``pattern``
    (RE2 — sentence/paragraph/record boundaries) into one row per
    segment with its ordinal — the sentence-segmentation step ahead of
    chunking / per-sentence scoring.

    -> Dataset(id_col, seg_idx, out_col). ``seg_idx`` is the segment's
    position in the raw split (empty segments keep their slot, so
    ordinals match SQL's zipped-unnest positions even when
    ``drop_empty`` removes the empty rows afterwards on both sides).

    Scale shape: a pure streaming explode — one
    ``pc.split_pattern_regex`` kernel call per batch, flatten via
    ``list_parent_indices`` (no Python per-row work), no shuffle.
    DuckDB's ``regexp_split_to_array`` is RE2 too, so the oracle is
    bit-exact on the same pattern.
    """
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).combine_chunks()
        ids = t.column(id_col).combine_chunks()
        parts = pc.split_pattern_regex(texts, pattern)
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts)
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        ordinal = np.arange(int(lens.sum()), dtype=np.int64) - starts
        out = pa.table({
            id_col: ids.take(parent),
            "seg_idx": pa.array(ordinal),
            out_col: flat.cast(pa.string()),
        })
        if drop_empty:
            keep = pc.greater(pc.utf8_length(out.column(out_col)), 0)
            out = out.filter(keep)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")
