"""Mention detection over transcript turns.

The reference detects mentions with a Flair NER tagger
(``pipeline/biencoder/blink/ner.py:29-42``; wired in
``main_dense.py:80-101``) — only in its interactive path, because its
eval datasets ship pre-annotated. In this engine detection is a
mandatory stage 1 over raw transcript turns. The detector is pluggable;
the default is a deterministic **capitalized-span detector** (maximal
runs of Capitalized tokens separated by single spaces), which is exactly
the surface-form contract of the synthetic fixtures and keeps the stage
model-free and reproducible. A model-based tagger would occupy the same
``map_batches(DetectorCls, concurrency=N)`` slot.

The scan is numpy-vectorized: one codepoint pass over the whole Arrow
batch (no per-row regex loop); only the found spans (≈1 per turn) touch
Python string slicing.

Per-turn text equality invariant (BASELINE.json input_hint): contexts
are built strictly within the turn's own ``text``
(``context_left = text[:start]``, ``context_right = text[end:]``), so
results are independent of block order / parallelism.

Mention ids are assigned locally and deterministically:
``mention_id = (conv_ordinal * 100 + turn_idx) * 10 + rank_in_turn``,
which orders ids by (conv_id, turn_idx, start_pos) without any global
pass (FIXTURES.md §6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAX_TURNS_PER_CONV = 100
MAX_MENTIONS_PER_TURN = 10


def conv_ordinal(conv_id: str) -> int:
    """conv_0001234 -> 1234. The fixture/conv-id contract."""
    return int(conv_id.rsplit("_", 1)[1])


def find_capitalized_spans(texts: list[str]) -> list[list[tuple[int, int]]]:
    """Per text, [(start, end), ...] of maximal capitalized-token spans.

    Vectorized over the concatenation of all texts: token boundaries and
    capitalization are computed with numpy masks; only span slicing is
    per-hit Python.
    """
    n = len(texts)
    if n == 0:
        return []
    sep = "\x00"
    joined = sep.join(texts) + sep
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    is_upper = (codes >= 65) & (codes <= 90)
    is_lower = (codes >= 97) & (codes <= 122)
    is_digit = (codes >= 48) & (codes <= 57)
    is_tok = is_upper | is_lower | is_digit
    is_space = codes == 32

    prev_tok = np.concatenate(([False], is_tok[:-1]))
    tok_start = is_tok & ~prev_tok
    starts = np.flatnonzero(tok_start)
    if starts.size == 0:
        return [[] for _ in texts]
    next_tok = np.concatenate((is_tok[1:], [False]))
    tok_end = is_tok & ~next_tok
    ends = np.flatnonzero(tok_end) + 1  # exclusive

    cap = is_upper[starts]
    cstarts = starts[cap]
    cends = ends[cap]
    # chain: capitalized token i continues the previous capitalized span
    # iff exactly one separating char and it is a space
    if cstarts.size:
        gap_one = np.concatenate(([False], cstarts[1:] - cends[:-1] == 1))
        sp = np.zeros(cstarts.size, dtype=bool)
        sp[1:] = is_space[np.maximum(cstarts[1:] - 1, 0)]
        new_span = ~(gap_one & sp)
    else:
        new_span = np.zeros(0, dtype=bool)
    # first/last capitalized token per span (span membership is a sorted
    # run, so spans are delimited by the new_span flags)
    first = np.flatnonzero(new_span)
    span_start = cstarts[first]
    last = np.concatenate((first[1:] - 1, [cstarts.size - 1])) if first.size else first
    span_end = cends[last]

    # map global char offsets back to texts
    text_lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    text_offsets = np.concatenate(([0], np.cumsum(text_lens + 1)))
    owner = np.searchsorted(text_offsets, span_start, side="right") - 1
    out: list[list[tuple[int, int]]] = [[] for _ in texts]
    for o, s, e in zip(owner.tolist(), span_start.tolist(), span_end.tolist()):
        base = int(text_offsets[o])
        out[o].append((int(s - base), int(e - base)))
    return out


def detect_mentions(batch: pa.Table) -> pa.Table:
    """Transcript turns (conv_id, turn_idx, text, ...) -> mention rows
    (MENTIONS schema). Stateless ``map_batches`` stage."""
    conv_ids = batch.column("conv_id").to_pylist()
    turn_idxs = batch.column("turn_idx").to_pylist()
    texts = batch.column("text").to_pylist()
    spans = find_capitalized_spans(texts)

    m_ids, m_conv, m_turn, m_start, m_end = [], [], [], [], []
    m_text, m_left, m_right = [], [], []
    for conv, ti, text, sp in zip(conv_ids, turn_idxs, texts, spans):
        if not sp:
            continue
        ordinal = conv_ordinal(conv)
        assert ti < MAX_TURNS_PER_CONV and len(sp) <= MAX_MENTIONS_PER_TURN
        base = (ordinal * MAX_TURNS_PER_CONV + ti) * MAX_MENTIONS_PER_TURN
        for j, (s, e) in enumerate(sp):
            m_ids.append(base + j)
            m_conv.append(conv)
            m_turn.append(ti)
            m_start.append(s)
            m_end.append(e)
            m_text.append(text[s:e])
            m_left.append(text[:s])
            m_right.append(text[e:])

    return pa.table(
        {
            "mention_id": pa.array(m_ids, type=pa.int64()),
            "conv_id": pa.array(m_conv, type=pa.string()),
            "turn_idx": pa.array(m_turn, type=pa.int32()),
            "start_pos": pa.array(m_start, type=pa.int32()),
            "end_pos": pa.array(m_end, type=pa.int32()),
            "mention": pa.array(m_text, type=pa.string()),
            "context_left": pa.array(m_left, type=pa.string()),
            "context_right": pa.array(m_right, type=pa.string()),
        }
    )
