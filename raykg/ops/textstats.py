"""Text analysis operators over a document corpus.

All stages are stateless vectorized ``map_batches`` transforms (or an
actor pool where state — compiled patterns, stopword tables — warrants
it): token counting (whitespace + BPE-ish word/punct split), quality
scoring (length / punctuation / stopword / uppercase ratios), language
identification (character n-gram + stopword heuristic), and rolling-hash
document fingerprinting.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_WS_RE = re.compile(r"\s+")
# BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
_PUNCT_RE = re.compile(r"[^\w\s]")

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "para", "que"},
    "it": {"il", "la", "gli", "e", "è", "un", "una", "per", "che", "di"},
}


def token_count_whitespace(texts: pd.Series) -> pd.Series:
    """Number of whitespace-delimited tokens; '' -> 0. Matches DuckDB
    ``length(regexp_split_to_array(trim(text), '\\s+'))`` on non-empty
    trimmed text."""
    stripped = texts.str.strip()
    n = stripped.str.count(_WS_RE.pattern) + 1
    return n.where(stripped.str.len() > 0, 0).astype("int64")


def token_count_bpeish(texts: pd.Series) -> pd.Series:
    """Sub-word-ish token count via the word/number/punct pre-split."""
    return texts.str.count(_BPE_RE.pattern).astype("int64")


class QualityScorer:
    """Actor-pool stage: per-document quality features.

    Emits n_chars_comp, n_tokens, avg_token_len, punct_ratio,
    stop_ratio, upper_ratio, quality_score (a simple monotone combo —
    the point is the plumbing and determinism, not linguistic truth).
    """

    def __init__(self, lang: str = "en"):
        self.stop = _STOPWORDS[lang]
        self.word_re = re.compile(r"[A-Za-z]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        n_chars = texts.str.len().astype("int64")
        n_tokens = token_count_whitespace(texts)
        n_punct = texts.str.count(_PUNCT_RE.pattern)
        n_upper = texts.str.count(r"[A-Z]")
        # vectorized stopword ratio: one findall, flat explode, isin —
        # no per-row Python lambda
        words = texts.str.lower().str.findall(self.word_re)
        exploded = words.explode()
        has_word = exploded.notna()
        stop_n = (
            (exploded.isin(self.stop) & has_word).groupby(level=0).sum()
        )
        word_n = has_word.groupby(level=0).sum()
        stop_ratio = (stop_n / word_n.clip(lower=1)).reindex(
            texts.index, fill_value=0.0
        )
        avg_tok = (n_chars / n_tokens.clip(lower=1)).astype("float64")
        batch = batch.copy()
        batch["n_chars_comp"] = n_chars
        batch["n_tokens"] = n_tokens
        batch["avg_token_len"] = avg_tok
        batch["punct_ratio"] = (n_punct / n_chars.clip(lower=1)).astype("float64")
        batch["upper_ratio"] = (n_upper / n_chars.clip(lower=1)).astype("float64")
        batch["stop_ratio"] = stop_ratio.astype("float64")
        batch["quality_score"] = (
            0.4 * np.clip(n_tokens / 100.0, 0, 1)
            + 0.3 * (1 - batch["punct_ratio"])
            + 0.3 * np.clip(batch["stop_ratio"] * 5, 0, 1)
        )
        return batch


class LangId:
    """Actor-pool stage: character-n-gram + stopword language guesser.

    Scores each supported language by stopword hits plus a tiny
    char-trigram profile; deterministic; 'und' (undetermined) when no
    evidence. A model-based identifier would occupy the same slot.
    """

    _PROFILES = {
        "en": ("th", "he", "in", "er", "an"),
        "de": ("en", "er", "ch", "de", "ei"),
        "fr": ("es", "le", "de", "en", "on"),
        "es": ("de", "en", "el", "la", "os"),
        "it": ("di", "la", "er", "to", "re"),
    }

    def __init__(self):
        self.word_re = re.compile(r"[a-zA-ZäöüßéèêàùìòáíóúñÄÖÜ]+")

    def _score_one(self, text: str) -> str:
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und"
        best, best_score = "und", 0.0
        joined = " ".join(words)
        for lang, stops in _STOPWORDS.items():
            s = sum(w in stops for w in words) / len(words)
            s += 0.1 * sum(joined.count(bg) for bg in self._PROFILES[lang]) / max(
                len(joined), 1
            )
            if s > best_score:
                best, best_score = lang, s
        return best if best_score > 0.02 else "und"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # Deliberately per-row, after MEASUREMENT (round 3): a batched
        # variant (exploded-word pd.isin per language + np.char.count
        # bigram passes) ran 0.28 s vs 0.16 s for the sf0.1 documents
        # (5000 docs, ~300 chars) — np.char.count alone cost 0.16 s
        # for the 25 (lang, bigram) passes, while the per-doc path's
        # inner work (O(1) set probes + C str.count on short strings,
        # ~32 us/doc) is already cheap. Same verdict as
        # minhash_signatures' docstring: batch-concat only wins when
        # per-row overhead dominates, which it does not here. The
        # stage stays embarrassingly parallel via the actor pool.
        batch = batch.copy()
        batch["lang_pred"] = [self._score_one(t) for t in batch["text"].fillna("")]
        return batch


def fingerprint(texts: list[str], window: int = 8) -> np.ndarray:
    """Winnowing-style rolling-hash fingerprint: min over the rolling
    k-gram hashes of the lowercased text (k=window). Deterministic
    uint64 per document; equal fingerprints => near-identical prefixes
    of content with high probability.

    Vectorized ACROSS the batch: all documents' codepoints concatenate
    into one array, one sliding-window FNV pass hashes every k-gram
    (bit-identical to ``hash_strings`` over the substring list),
    boundary-crossing windows are masked to u64-max, and a single
    ``np.minimum.reduceat`` takes each document's min."""
    from raykg.util import _FNV_OFFSET, _FNV_PRIME, hash_strings

    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    low = [(t or "").lower() for t in texts]
    lens = np.fromiter((len(t) for t in low), dtype=np.int64, count=n)
    short = lens < window
    if short.any():
        idx = np.flatnonzero(short)
        out[idx] = hash_strings([low[i] for i in idx])
    long_idx = np.flatnonzero(~short)
    if len(long_idx) == 0:
        return out
    docs = [low[i] for i in long_idx]
    dlens = lens[long_idx]
    codes = np.frombuffer(
        "".join(docs).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.uint64)
    W = np.lib.stride_tricks.sliding_window_view(codes, window)
    with np.errstate(over="ignore"):
        h = np.full(len(W), _FNV_OFFSET, dtype=np.uint64)
        h = (h ^ np.uint64(window)) * _FNV_PRIME  # length fold
        for j in range(window):
            h = (h ^ W[:, j]) * _FNV_PRIME
    starts = np.zeros(len(docs), dtype=np.int64)
    np.cumsum(dlens[:-1], out=starts[1:])
    # windows that straddle a document boundary can never win the min
    valid_end = starts + dlens - window + 1
    mask = np.ones(len(h), dtype=bool)
    for s, e in zip(valid_end[:-1], starts[1:]):
        mask[s:e] = False
    h = np.where(mask, h, np.uint64(0xFFFFFFFFFFFFFFFF))
    out[long_idx] = np.minimum.reduceat(h, starts)
    return out


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style per-document repetition metrics (Rae et al. 2021
    §A1.1 quality filters): whitespace-token count, duplicate-token
    fraction, top-token fraction, mean token length. High duplicate /
    top-token fractions mark the boilerplate and keyword-stuffed pages
    every pretraining corpus filters out.

    Vectorized: one split + explode per batch, then C-level groupbys
    over the row index — no per-document Python loop. Stateless
    ``map_batches``; pipelines with the read, no shuffle. Exactly
    matched by the ``quality_repetition_stats`` DuckDB oracle."""
    import pandas as pd

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        base = df.set_index(id_col)
        tok = base[text_col].str.split(" ").explode()
        tok = tok[tok.str.len() > 0]
        grp = tok.groupby(level=0)
        n = grp.size()
        distinct = grp.nunique()
        top = tok.groupby([tok.index, tok]).size().groupby(level=0).max()
        char_sum = tok.str.len().groupby(level=0).sum()
        out = pd.DataFrame(index=base.index)
        out["n_tokens"] = n.reindex(out.index).fillna(0).astype("int64")
        out["dup_token_frac"] = (
            (1 - distinct / n).reindex(out.index).fillna(0.0).round(6)
        )
        out["top_token_frac"] = (
            (top / n).reindex(out.index).fillna(0.0).round(6)
        )
        out["mean_token_len"] = (
            (char_sum / n).reindex(out.index).fillna(0.0).round(6)
        )
        return out.reset_index()

    return ds.map_batches(fn, batch_format="pandas")


def normalize_text(ds, text_col: str = "text", out_col: str = "text_norm"):
    """Corpus text normalization — the first transform of every
    training-data pipeline: lowercase, collapse all whitespace runs to
    one space, trim. Fully vectorized Arrow compute (RE2 regex — same
    engine as the DuckDB oracle, so replaced text is bit-equal).
    Appends ``out_col``; other columns pass through untouched."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def norm(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        low = pc.utf8_lower(col)
        one = pc.replace_substring_regex(low, r"\s+", " ")
        return t.append_column(out_col, pc.utf8_trim_whitespace(one))

    return ds.map_batches(norm, batch_format="pyarrow")


def compression_ratio(ds, text_col: str = "text", id_col: str = "doc_id",
                      level: int = 6):
    """Per-document zlib compression ratio (compressed/raw bytes) —
    the classic cheap redundancy signal of corpus curation: highly
    repetitive or boilerplate text compresses far below prose
    (~0.3-0.45 for English), machine-generated spam often below 0.2,
    and random/encrypted blobs sit near 1.0. Used as a quality gate
    alongside the Gopher repetition stats.

    zlib is a per-string C call (like LangId, inherently per-row);
    the stage is a stateless streaming map, no shuffle. Empty texts
    get ratio 1.0. Deterministic: zlib output is fully specified by
    (input, level). Not SQL-expressible — pinned by construction
    tests (repetitive << prose < random) instead of an oracle.

    -> adds ``raw_bytes``, ``zlib_bytes``, ``zlib_ratio`` columns.
    """
    import zlib

    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        raw = np.empty(len(texts), dtype=np.int64)
        comp = np.empty(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            b = (s or "").encode("utf-8")
            raw[i] = len(b)
            comp[i] = len(zlib.compress(b, level)) if b else 0
        ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 1.0)
        return (t.append_column("raw_bytes", pa.array(raw))
                .append_column("zlib_bytes", pa.array(comp))
                .append_column("zlib_ratio", pa.array(ratio, pa.float64())))

    return ds.map_batches(fn, batch_format="pyarrow")


def regex_extract(ds, col: str, pattern: str, names: list[str],
                  types: dict[str, "pa.DataType"] | None = None):
    """Structured field extraction from a string column (log / semi-
    structured parsing): append one column per capture group in
    ``pattern``, named by ``names`` (order = group order), null where
    the pattern does not match. Fully vectorized — one
    ``pyarrow.compute.extract_regex`` (RE2) kernel call per block, no
    per-row Python; ``types`` optionally casts extracted strings (e.g.
    ``{"k": pa.int64()}``). DuckDB's ``regexp_extract`` is RE2 too, so
    an oracle can mirror the pattern verbatim
    (``__ray_entry__.extract_props_k``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    # pc.extract_regex needs NAMED groups; synthesize them from the
    # plain capture groups (every "(" not escaped and not "(?...")
    import re as _re

    idx = -1

    def _name_group(m):
        nonlocal idx
        idx += 1
        return f"(?P<{names[idx]}>"

    named = _re.sub(r"(?<!\\)\((?!\?)", _name_group, pattern)
    if idx + 1 != len(names):
        raise ValueError(
            f"pattern has {idx + 1} capture groups, got {len(names)} names")

    def fn(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t.column(col), named)
        for n in names:
            child = pc.struct_field(ext, n)
            if types and n in types:
                child = child.cast(types[n])
            t = t.append_column(n, child)
        return t

    return ds.map_batches(fn, batch_format="pyarrow")
