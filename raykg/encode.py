"""Mention / entity encoders.

The reference encodes mentions and entities with a BLINK BERT-large
biencoder (2.5 GB weights, 1024-d float32 output;
``pipeline/biencoder/main.py:41-99``,
``pipeline/biencoder/blink/biencoder/biencoder.py:126-133``). The model
artifacts are not available (and not needed for engine conformance), so
the default encoder here is a **deterministic hash-projection encoder**:
character-trigram counts hashed into ``dim`` buckets with ±1 signs,
L2-normalized, scaled to norm ``VEC_SCALE`` so raw dot products live on
the same 0..~100 scale the reference's thresholds were tuned for.

It preserves the properties the downstream operators depend on:
  * same surface text => identical vector (determinism),
  * similar surfaces => high dot product (retrieval / clustering),
  * fully vectorized over a batch (one numpy pass per Arrow block, no
    per-row Python in the hot loop),
  * pluggable: any ``TextEncoder`` with the same signature (e.g. a real
    transformer on a GPU actor pool) drops into the same
    ``map_batches(MentionEncoder, concurrency=..., num_gpus=...)`` slot.

Mention vectors mix surface and context the way the biencoder consumes
mention-in-context (``data_process.py:26-69``): weighted sum of the
surface-ngram vector and the context-ngram vector, renormalized. Entity
vectors mix title and description symmetrically
(``pipeline/biencoder/main.py:54-75``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raykg.schema import DIM, VEC_SCALE

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_MIX = np.uint64(0x9E3779B97F4A7C15)

SURFACE_WEIGHT = 0.85
CONTEXT_WEIGHT = 0.15


def _ngram_matrix(texts, dim: int) -> np.ndarray:
    """(n, dim) float32 matrix of signed hashed char-trigram counts.

    Fully vectorized: all texts are joined into one codepoint array with
    sentinel boundaries; trigram hashes, buckets and signs are computed
    in single numpy passes; scatter-add via ``np.add.at`` keyed by
    (segment, bucket).
    """
    n = len(texts)
    out = np.zeros((n, dim), dtype=np.float32)
    if n == 0:
        return out
    padded = ["\x02" + (t or "").lower() + "\x03" for t in texts]
    lens = np.fromiter((len(p) for p in padded), dtype=np.int64, count=n)
    joined = "".join(padded)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    if codes.size < 3:
        return out
    with np.errstate(over="ignore"):
        h = (
            codes[:-2] * np.uint64(1000003)
            ^ codes[1:-1] * np.uint64(8191)
            ^ codes[2:] * np.uint64(131)
        )
        h = (h * _MIX) & _MASK64
        h ^= h >> np.uint64(29)
        h = (h * _MIX) & _MASK64
    seg = np.repeat(np.arange(n, dtype=np.int64), lens)
    valid = seg[:-2] == seg[2:]  # trigram fully inside one text
    seg_v = seg[:-2][valid]
    h_v = h[valid]
    bucket = (h_v % np.uint64(dim)).astype(np.int64)
    sign = (((h_v >> np.uint64(32)) & np.uint64(1)).astype(np.float32) * 2.0) - 1.0
    np.add.at(out, (seg_v, bucket), sign)
    return out


def _l2_normalize(mat: np.ndarray, scale: float = 1.0) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return (mat / norms * scale).astype(np.float32)


def balance_context_window(
    n_mention_tokens: int,
    left_tokens: list,
    right_tokens: list,
    max_seq_length: int,
) -> tuple[list, list]:
    """The biencoder's context-window QUOTA BALANCING
    (``pipeline/biencoder/blink/biencoder/data_process.py:45-57``):
    each side starts with half the remaining budget; a side that
    under-uses its quota donates the surplus to the other. Mirrors the
    reference arithmetic exactly, including the ``[-0:]`` Python quirk
    (a zero/negative left quota keeps the WHOLE left context — latent
    in BLINK, reachable only when the mention alone nearly fills
    max_seq_length). Returns (kept_left, kept_right)."""
    left_quota = (max_seq_length - n_mention_tokens) // 2 - 1
    right_quota = max_seq_length - n_mention_tokens - left_quota - 2
    left_add, right_add = len(left_tokens), len(right_tokens)
    if left_add <= left_quota:
        if right_add > right_quota:
            right_quota += left_quota - left_add
    else:
        if right_add <= right_quota:
            left_quota += right_quota - right_add
    return left_tokens[-left_quota:], right_tokens[:right_quota]


def truncate_candidate(
    title_tokens: list, descr_tokens: list, max_seq_length: int
) -> tuple[list, list]:
    """The candidate tokenizer's truncation
    (``data_process.py:71-89``): title + [title_tag] + description,
    clipped to max_seq_length - 2 ([CLS]/[SEP] slots)."""
    budget = max_seq_length - 2
    cand = title_tokens[: budget]
    remaining = budget - len(cand) - 1  # the title-tag slot
    if remaining <= 0:
        return cand, []
    return cand, descr_tokens[:remaining]


class HashEncoder:
    """Deterministic drop-in for the BLINK biencoder towers.

    ``max_seq_length`` models the real tokenizer's input budget: the
    mention's context is whitespace-tokenized (the wordpiece stand-in;
    a real tokenizer drops into ``tokenize``) and windowed with the
    reference's quota balancing before encoding, and entity
    descriptions truncate like the candidate tokenizer — so swapping a
    transformer into this slot changes the embedding function, not the
    truncation semantics. ``None`` disables windowing."""

    def __init__(self, dim: int = DIM, scale: float = VEC_SCALE,
                 max_seq_length: int | None = 128):
        self.dim = dim
        self.scale = scale
        self.max_seq_length = max_seq_length

    @staticmethod
    def tokenize(text: str) -> list[str]:
        return (text or "").split()

    def _window_contexts(self, mentions, context_left, context_right):
        msl = self.max_seq_length
        out = []
        for m, l, r in zip(mentions, context_left, context_right):
            l, r = l or "", r or ""
            # whitespace tokens take >= 2 chars each incl. separator, so
            # a short row can never exceed the budget — skip tokenizing.
            # Budget is msl - 2 tokens (the [ENT_START]/[ENT_END] tag
            # allowance counts against msl), hence 2*(msl-2)-1 chars.
            if len(l) + len(r) + len(m or "") + 3 <= 2 * (msl - 2) - 1:
                out.append(l + " " + r)
                continue
            lt, rt = self.tokenize(l), self.tokenize(r)
            # +2 for the [ENT_START]/[ENT_END] tags around the mention
            n_m = len(self.tokenize(m)) + 2
            if len(lt) + len(rt) + n_m > msl:
                lt, rt = balance_context_window(n_m, lt, rt, msl)
            out.append(" ".join(lt) + " " + " ".join(rt))
        return out

    def encode_mentions(self, mentions, context_left, context_right) -> np.ndarray:
        surf = _l2_normalize(_ngram_matrix(list(mentions), self.dim))
        if self.max_seq_length is not None:
            ctx_texts = self._window_contexts(mentions, context_left, context_right)
        else:
            ctx_texts = [
                (l or "") + " " + (r or "")
                for l, r in zip(context_left, context_right)
            ]
        ctx = _l2_normalize(_ngram_matrix(ctx_texts, self.dim))
        mixed = SURFACE_WEIGHT * surf + CONTEXT_WEIGHT * ctx
        return _l2_normalize(mixed, self.scale)

    def encode_entities(self, titles, descrs) -> np.ndarray:
        surf = _l2_normalize(_ngram_matrix(list(titles), self.dim))
        if self.max_seq_length is not None:
            clipped = []
            for t, d in zip(titles, descrs):
                tt, dt = truncate_candidate(
                    self.tokenize(t), self.tokenize(d), self.max_seq_length
                )
                clipped.append(" ".join(dt))
            descrs = clipped
        desc = _l2_normalize(_ngram_matrix(list(descrs), self.dim))
        mixed = SURFACE_WEIGHT * surf + CONTEXT_WEIGHT * desc
        return _l2_normalize(mixed, self.scale)


class MentionEncoder:
    """Actor-pool stage: mentions table -> + ``encoding`` column.

    Replaces the reference's biencoder HTTP service
    (``pipeline/biencoder/main.py:41-52``): state (the encoder model) is
    built once per actor in ``__init__``; ``__call__`` runs per Arrow
    batch. Use as::

        ds.map_batches(MentionEncoder, fn_constructor_kwargs={"dim": 64},
                       batch_format="pyarrow", batch_size=2048,
                       concurrency=(1, 8))
    """

    def __init__(self, dim: int = DIM, scale: float = VEC_SCALE):
        self.encoder = HashEncoder(dim=dim, scale=scale)

    def __call__(self, batch: pa.Table) -> pa.Table:
        enc = self.encoder.encode_mentions(
            batch.column("mention").to_pylist(),
            batch.column("context_left").to_pylist(),
            batch.column("context_right").to_pylist(),
        )
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(enc.reshape(-1), type=pa.float32()), self.encoder.dim
        )
        return batch.append_column("encoding", col)


def vectors_to_column(mat: np.ndarray) -> pa.FixedSizeListArray:
    """(n, d) float32 -> Arrow fixed_size_list<float32, d> (zero-copy)."""
    n, d = mat.shape
    flat = np.ascontiguousarray(mat, dtype=np.float32).reshape(-1)
    return pa.FixedSizeListArray.from_arrays(pa.array(flat, type=pa.float32()), d)


def column_to_vectors(col, dim: int | None = None) -> np.ndarray:
    """Arrow (fixed_size_)list<float32> column -> (n, d) float32 (zero-copy
    when the column is a single non-null FixedSizeList chunk)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.FixedSizeListArray):
        d = col.type.list_size
        return col.values.to_numpy(zero_copy_only=False).reshape(len(col), d)
    if hasattr(col, "to_numpy") and not isinstance(
        col, (pa.ListArray, pa.LargeListArray)
    ):
        # Ray's ArrowTensorArray (what from_pandas produces for a
        # column of ndarrays) and kin: stack via the extension array
        return np.stack(col.to_numpy(zero_copy_only=False)).astype(
            np.float32, copy=False
        )
    # plain list<float32>: lengths must be uniform
    arr = col
    offsets = arr.offsets.to_numpy()
    widths = np.diff(offsets)
    d = int(widths[0]) if len(widths) else (dim or 0)
    assert (widths == d).all(), "ragged vector column"
    values = arr.values.to_numpy(zero_copy_only=False)
    return values[offsets[0] : offsets[0] + len(arr) * d].reshape(len(arr), d).astype(
        np.float32, copy=False
    )
