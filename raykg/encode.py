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


class WordPieceTokenizer:
    """Deterministic greedy longest-match wordpiece tokenizer — the
    sub-word seam the reference's window arithmetic actually consumes
    (BLINK's BertTokenizer feeds ``data_process.py:26-69`` SUB-WORD
    counts, not whitespace words). Fixed in-code vocab: common English
    stems + ``##``-continuation suffixes + every ascii alnum /
    common-punctuation single char, so any token always tokenizes
    fully (a char is always a piece) and the rejoined string stays
    information-preserving for the n-gram hash encoder; a truly
    unknown character emits ``[UNK]`` and stops the word (BERT's
    rule). One word can become many pieces, which is exactly what
    exercises the token-budget windowing a whitespace stand-in
    cannot."""

    STEMS = [
        "the", "and", "for", "with", "that", "this", "from", "work",
        "talk", "build", "corp", "acme", "alpha", "omega", "beta",
        "data", "inter", "nation", "found", "develop", "research",
        "announc", "report", "compan", "organiz", "institut",
    ]
    SUFFIXES = ["ing", "ed", "er", "est", "ly", "tion", "ment", "al",
                "ation", "ies", "s", "y", "e"]
    CHARS = "abcdefghijklmnopqrstuvwxyz0123456789.,-'&()/:"

    # per-word memo cap: words are Zipf-distributed, so hit rates stay
    # high far below this; the cap only bounds adversarial vocabularies
    MEMO_MAX = 1 << 16

    def __init__(self):
        self.starts = sorted(
            set(self.STEMS) | set(self.CHARS), key=len, reverse=True)
        self.conts = sorted(
            set(self.SUFFIXES) | set(self.CHARS), key=len, reverse=True)
        self._memo: dict[str, list[str]] = {}

    def _tokenize_word(self, word: str) -> list[str]:
        out: list[str] = []
        pos, first = 0, True
        while pos < len(word):
            pieces = self.starts if first else self.conts
            for p in pieces:
                if word.startswith(p, pos):
                    out.append(p if first else "##" + p)
                    pos += len(p)
                    first = False
                    break
            else:
                out.append("[UNK]")
                break
        return out

    def tokenize(self, text: str) -> list[str]:
        # greedy matching is per-word, so memoizing per word is exact
        out: list[str] = []
        memo = self._memo
        for word in (text or "").lower().split():
            pieces = memo.get(word)
            if pieces is None:
                if len(memo) >= self.MEMO_MAX:
                    memo.clear()
                pieces = self._tokenize_word(word)
                memo[word] = pieces
            out.extend(pieces)
        return out


class HashEncoder:
    """Deterministic drop-in for the BLINK biencoder towers.

    ``max_seq_length`` models the real tokenizer's input budget: the
    mention's context is whitespace-tokenized (the wordpiece stand-in;
    a real tokenizer drops into ``tokenize`` — ``HashWordPieceEncoder``
    / spec ``"hash-wp"`` is the in-repo sub-word instantiation, the
    parity gate's default) and windowed with the reference's quota
    balancing before encoding, and entity descriptions truncate like
    the candidate tokenizer — so swapping a transformer into this slot
    changes the embedding function, not the truncation semantics.
    ``None`` disables windowing."""

    # lower bound on chars consumed per produced token (incl.
    # separator) — the windowing fast path's safety margin; sub-word
    # tokenizers override (one char can be one piece)
    MIN_CHARS_PER_TOKEN = 2

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
            # tokens take >= MIN_CHARS_PER_TOKEN chars each (incl.
            # separator for whitespace; 1 for sub-word pieces), so a
            # short row can never exceed the budget — skip tokenizing.
            # Budget is msl - 2 tokens (the [ENT_START]/[ENT_END] tag
            # allowance counts against msl).
            if (len(l) + len(r) + len(m or "") + 3
                    <= self.MIN_CHARS_PER_TOKEN * (msl - 2) - 1):
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


class TinyTransformerEncoder(HashEncoder):
    """A real (if small) transformer in the encoder seam: seeded random
    weights, batched numpy GEMM inference — the compute SHAPE of the
    reference's BERT-large towers
    (``pipeline/biencoder/blink/biencoder/biencoder.py:73-133``) without
    its weights, which the sandbox cannot hold. The point is the seam:
    every downstream operator (retrieval, NIL scoring, clustering,
    triples) must be encoder-agnostic, and the parity gate re-runs
    engine + oracle with THIS encoder to prove it
    (``tests/test_parity.py::test_tiny_transformer_parity``).

    Model: token ids by 64-bit hash into a ``vocab``-row embedding
    table (so identical tokens share a vector — bag-of-words cosine
    structure survives the layers via the residual stream), learned-
    style positional embeddings, ``n_layers`` pre-norm blocks of
    multi-head self-attention + a 2x MLP, masked mean pooling, linear
    projection to ``dim``, L2-normalize x ``scale``. Mention sequences
    are the BLINK layout ``left [E1] mention [E2] right`` after the
    SAME quota-balanced windowing as ``HashEncoder`` (inherited);
    entities are ``title [TTL] descr`` after ``truncate_candidate``.

    Determinism: weights derive from ``seed`` only; padded positions
    are masked out of both attention and pooling, so a row's vector
    does not depend on its neighbors beyond BLAS summation-order noise
    (~1e-6 relative — why the parity gate is >=0.95, not bit-exact).
    Rows are processed in fixed 128-row chunks to bound the attention
    tensor at (128, heads, L, L).
    """

    def __init__(self, dim: int = DIM, scale: float = VEC_SCALE,
                 max_seq_length: int | None = 128, seed: int = 7,
                 d_model: int = 64, n_layers: int = 2, n_heads: int = 4,
                 vocab: int = 8192):
        super().__init__(dim=dim, scale=scale, max_seq_length=max_seq_length)
        self.d_model, self.n_layers, self.n_heads = d_model, n_layers, n_heads
        self.vocab = vocab
        msl = max_seq_length or 128
        rng = np.random.default_rng(seed)
        f32 = np.float32
        self.E = (rng.standard_normal((vocab, d_model)) * 0.5).astype(f32)
        # weak positional signal: keeps token-identity similarity the
        # dominant term in the pooled vector (what clustering needs)
        self.P = (rng.standard_normal((msl + 8, d_model)) * 0.02).astype(f32)
        self.layers = []
        for _ in range(n_layers):
            w = {
                name: (rng.standard_normal((d_model, d_model))
                       * (1.0 / np.sqrt(d_model))).astype(f32)
                for name in ("wq", "wk", "wv", "wo")
            }
            w["w1"] = (rng.standard_normal((d_model, 2 * d_model))
                       * (1.0 / np.sqrt(d_model))).astype(f32)
            w["w2"] = (rng.standard_normal((2 * d_model, d_model))
                       * (0.5 / np.sqrt(d_model))).astype(f32)
            self.layers.append(w)
        self.w_out = (rng.standard_normal((d_model, dim))
                      * (1.0 / np.sqrt(d_model))).astype(f32)

    # --- tokenization: whitespace words + specials, hashed to ids ---
    _SPECIALS = {"[E1]": 0, "[E2]": 1, "[TTL]": 2}

    def _token_ids(self, tokens: list[str]) -> np.ndarray:
        n_special = len(self._SPECIALS)
        out = np.empty(len(tokens), dtype=np.int64)
        for i, t in enumerate(tokens):
            s = self._SPECIALS.get(t)
            if s is not None:
                out[i] = s
            else:
                h = 14695981039346656037
                for b in t.encode("utf-8"):
                    h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
                out[i] = h % (self.vocab - n_special) + n_special
        return out

    @staticmethod
    def _layernorm(x: np.ndarray) -> np.ndarray:
        mu = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-5)

    def _forward_pooled(self, seqs: list[np.ndarray]) -> np.ndarray:
        """List of per-row id arrays -> (n, d_model) pooled states."""
        n = len(seqs)
        out = np.zeros((n, self.d_model), dtype=np.float32)
        if n == 0:
            return out
        CHUNK = 128
        for c0 in range(0, n, CHUNK):
            chunk = seqs[c0 : c0 + CHUNK]
            L = max(1, max(len(s) for s in chunk))
            ids = np.zeros((len(chunk), L), dtype=np.int64)
            mask = np.zeros((len(chunk), L), dtype=np.float32)
            for i, s in enumerate(chunk):
                ids[i, : len(s)] = s
                mask[i, : len(s)] = 1.0
            x = self.E[ids] + self.P[:L][None, :, :]
            neg = (1.0 - mask)[:, None, None, :] * np.float32(-1e9)
            nh, dh = self.n_heads, self.d_model // self.n_heads

            def split(m):  # (b, L, d) -> (b, heads, L, dh)
                return m.reshape(m.shape[0], L, nh, dh).transpose(0, 2, 1, 3)

            for w in self.layers:
                h = self._layernorm(x)
                q, k, v = split(h @ w["wq"]), split(h @ w["wk"]), split(h @ w["wv"])
                att = q @ k.transpose(0, 1, 3, 2) / np.float32(np.sqrt(dh)) + neg
                att = att - att.max(axis=-1, keepdims=True)
                e = np.exp(att)
                att = e / e.sum(axis=-1, keepdims=True)
                ctx = (att @ v).transpose(0, 2, 1, 3).reshape(len(chunk), L, -1)
                x = x + ctx @ w["wo"]
                h = self._layernorm(x)
                x = x + np.maximum(h @ w["w1"], 0.0) @ w["w2"]
            denom = np.maximum(mask.sum(axis=1, keepdims=True), 1.0)
            out[c0 : c0 + len(chunk)] = (
                (x * mask[:, :, None]).sum(axis=1) / denom
            )
        return out

    def _encode_sequences(self, token_lists: list[list[str]]) -> np.ndarray:
        msl = self.max_seq_length or 128
        seqs = [self._token_ids(toks[:msl]) for toks in token_lists]
        pooled = self._forward_pooled(seqs)
        return _l2_normalize(pooled @ self.w_out, self.scale)

    def encode_mentions(self, mentions, context_left, context_right) -> np.ndarray:
        msl = self.max_seq_length or 128
        token_lists = []
        for m, l, r in zip(mentions, context_left, context_right):
            mt = self.tokenize(m or "")
            lt, rt = self.tokenize(l or ""), self.tokenize(r or "")
            if len(lt) + len(rt) + len(mt) + 2 > msl:
                lt, rt = balance_context_window(len(mt) + 2, lt, rt, msl)
            token_lists.append(lt + ["[E1]"] + mt + ["[E2]"] + rt)
        return self._encode_sequences(token_lists)

    def encode_entities(self, titles, descrs) -> np.ndarray:
        msl = self.max_seq_length or 128
        token_lists = []
        for t, d in zip(titles, descrs):
            tt, dt = truncate_candidate(
                self.tokenize(t or ""), self.tokenize(d or ""), msl
            )
            token_lists.append(tt + ["[TTL]"] + dt)
        return self._encode_sequences(token_lists)


# Encoder registry: PipelineConfig / fixtures / the oracle select by
# spec string so configs stay JSON-serializable (digest) and the
# factory pickles into map_batches closures as a module-level name.
class HashWordPieceEncoder(HashEncoder):
    """HashEncoder with the deterministic sub-word tokenizer in the
    ``tokenize`` seam — windowing and candidate truncation run on
    SUB-WORD counts exactly as the reference's ``data_process.py``
    arithmetic does on BertTokenizer output. The embedding function is
    unchanged (n-gram hash over the rejoined pieces)."""

    MIN_CHARS_PER_TOKEN = 1   # one char can be one piece

    def __init__(self, dim: int = DIM, scale: float = VEC_SCALE,
                 max_seq_length: int | None = 128):
        super().__init__(dim=dim, scale=scale,
                         max_seq_length=max_seq_length)
        self._wp = WordPieceTokenizer()

    def tokenize(self, text: str) -> list[str]:
        return self._wp.tokenize(text)


ENCODERS = {"hash": HashEncoder, "hash-wp": HashWordPieceEncoder,
            "tiny": TinyTransformerEncoder}


def make_encoder(spec: str = "hash", dim: int = DIM,
                 scale: float = VEC_SCALE,
                 max_seq_length: int | None = 128):
    if spec == "hf":
        # lazy: the transformers adapter imports torch only when built
        # (raykg/hf.py; optional dependency, absent in this sandbox)
        from raykg.hf import TransformersBiencoder

        return TransformersBiencoder(dim=dim, scale=scale,
                                     max_seq_length=max_seq_length)
    try:
        cls = ENCODERS[spec]
    except KeyError:
        raise ValueError(f"unknown encoder spec {spec!r}; "
                         f"one of {sorted(ENCODERS) + ['hf']}") from None
    return cls(dim=dim, scale=scale, max_seq_length=max_seq_length)


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

    def __init__(self, dim: int = DIM, scale: float = VEC_SCALE,
                 spec: str = "hash", max_seq_length: int | None = 128):
        self.encoder = make_encoder(spec, dim=dim, scale=scale,
                                    max_seq_length=max_seq_length)

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
