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


class HashEncoder:
    """Deterministic drop-in for the BLINK biencoder towers."""

    def __init__(self, dim: int = DIM, scale: float = VEC_SCALE):
        self.dim = dim
        self.scale = scale

    def encode_mentions(self, mentions, context_left, context_right) -> np.ndarray:
        surf = _l2_normalize(_ngram_matrix(list(mentions), self.dim))
        ctx_texts = [
            (l or "") + " " + (r or "") for l, r in zip(context_left, context_right)
        ]
        ctx = _l2_normalize(_ngram_matrix(ctx_texts, self.dim))
        mixed = SURFACE_WEIGHT * surf + CONTEXT_WEIGHT * ctx
        return _l2_normalize(mixed, self.scale)

    def encode_entities(self, titles, descrs) -> np.ndarray:
        surf = _l2_normalize(_ngram_matrix(list(titles), self.dim))
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
