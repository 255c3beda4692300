"""Web-corpus curation transforms: HTML boilerplate stripping and the
C4-style per-line heuristic filter (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning", §2.2) — the first two passes of every
web-scale LLM training-data pipeline (the reference's corpus is
pre-cleaned transcripts, read as JSONL batches in
`scripts/eval_kbp.py:776-783`; a
web corpus needs these before any of its stages apply).

Both transforms are fully vectorized Arrow compute (RE2 kernels —
the same regex engine as DuckDB, so both have exact SQL oracles:
queries ``html_strip_documents`` / ``c4_filter_documents``). The line
filter never leaves the batch: split → flat per-line predicates →
list-offset reassembly, i.e. an in-block explode/implode with no
shuffle and no per-row Python.

Scale shape: stateless ``map_batches`` streaming transforms that
pipeline with the read. At 100 TB these run width-limited by the
scanner; nothing is held beyond the current block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (is_regex, pattern, replacement) applied IN ORDER. Entity unescapes
# run after tag removal; "&amp;" is last so "&amp;lt;" decodes to the
# literal "&lt;" (standard single-pass entity semantics), whitespace
# collapse last. The SQL oracle is generated from this same list.
HTML_STRIP_STEPS: list[tuple[bool, str, str]] = [
    (True, r"(?s)<script[^>]*>.*?</script>", " "),
    (True, r"(?s)<style[^>]*>.*?</style>", " "),
    (True, r"<[^>]*>", " "),
    (False, "&nbsp;", " "),
    (False, "&lt;", "<"),
    (False, "&gt;", ">"),
    (False, "&quot;", '"'),
    (False, "&#39;", "'"),
    (False, "&amp;", "&"),
    (True, r"\s+", " "),
]

# C4 rules (the paper's values): a line is kept only when it ends in
# terminal punctuation and has at least MIN_WORDS_PER_LINE words; a
# document is kept only when at least MIN_LINES lines survive and it
# contains neither "{" (code) nor "lorem ipsum" (boilerplate).
C4_LINE_END_RX = r'[.!?"]$'
C4_WORD_RX = r"[A-Za-z0-9']+"
C4_MIN_WORDS_PER_LINE = 3
C4_MIN_LINES = 3
# space, tab, CR — kept to an explicit set so the SQL oracle's
# trim(s, ...) strips the identical characters.
C4_TRIM_CHARS = " \t\r"


def strip_html_column(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Strip one Arrow string column of HTML: script/style blocks,
    tags, the common entities, then whitespace-collapse + trim."""
    text = col
    for is_rx, pat, repl in HTML_STRIP_STEPS:
        if is_rx:
            text = pc.replace_substring_regex(text, pat, repl)
        else:
            text = pc.replace_substring(text, pat, repl)
    return pc.utf8_trim(text, C4_TRIM_CHARS)


def strip_html(ds, text_col: str = "text", out_col: str = "text_clean"):
    """Dataset-level HTML strip: appends ``out_col``; everything else
    passes through. Stateless streaming map, no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, strip_html_column(t.column(text_col)))

    return ds.map_batches(fn, batch_format="pyarrow")


def _as_array(a) -> pa.Array:
    if isinstance(a, pa.ChunkedArray):
        if a.num_chunks == 0:
            return pa.array([], type=a.type)
        return a.chunk(0) if a.num_chunks == 1 else pa.concat_arrays(a.chunks)
    return a


def _c4_batch(t: pa.Table, text_col: str,
              min_words: int, min_lines: int) -> pa.Table:
    col = _as_array(t.column(text_col))
    lines = _as_array(pc.split_pattern(col, pattern="\n"))
    offsets = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.utf8_trim(lines.values, C4_TRIM_CHARS)

    words = pc.count_substring_regex(flat, C4_WORD_RX)
    ends = pc.match_substring_regex(flat, C4_LINE_END_RX)
    keep_line = pc.and_(pc.greater_equal(words, min_words), ends)

    mask = keep_line.to_numpy(zero_copy_only=False).astype(bool)
    cs = np.concatenate([[0], np.cumsum(mask, dtype=np.int64)])
    new_offsets = cs[offsets]
    kept = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()), flat.filter(keep_line))
    clean = pc.binary_join(kept, "\n")

    n_total = (offsets[1:] - offsets[:-1]).astype(np.int64)
    n_kept = (new_offsets[1:] - new_offsets[:-1]).astype(np.int64)

    brace = pc.match_substring(col, "{")
    lorem = pc.match_substring(pc.utf8_lower(col), "lorem ipsum")
    keep_doc = (n_kept >= min_lines) \
        & ~brace.to_numpy(zero_copy_only=False).astype(bool) \
        & ~lorem.to_numpy(zero_copy_only=False).astype(bool)

    out = (t.drop_columns([text_col])
            .append_column("text", clean)
            .append_column("n_lines_kept", pa.array(n_kept))
            .append_column("n_lines_total", pa.array(n_total)))
    return out.filter(pa.array(keep_doc))


def c4_filter(ds, text_col: str = "text",
              min_words_per_line: int = C4_MIN_WORDS_PER_LINE,
              min_lines: int = C4_MIN_LINES):
    """C4-style heuristic quality filter. Replaces ``text_col`` with
    the surviving lines joined by newline (column named ``text``) and
    appends ``n_lines_kept`` / ``n_lines_total``; documents failing the
    document-level rules are dropped. All predicates are RE2/Arrow
    kernels; reassembly is list-offset arithmetic — no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        return _c4_batch(t, text_col, min_words_per_line, min_lines)

    return ds.map_batches(fn, batch_format="pyarrow")


def html_strip_sql_expr(col_expr: str) -> str:
    """DuckDB expression mirroring :func:`strip_html_column` step for
    step (both engines are RE2; replaced text is bit-equal)."""
    e = col_expr
    for is_rx, pat, repl in HTML_STRIP_STEPS:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        if is_rx:
            e = f"regexp_replace({e}, '{p}', '{r}', 'g')"
        else:
            e = f"replace({e}, '{p}', '{r}')"
    return f"trim({e}, ' ' || chr(9) || chr(13))"


def blocklist_filter(ds, words: list[str], text_col: str = "text",
                     invert: bool = False, whole_word: bool = True):
    """Blocklist (badword) document filter — the C4 'List of Dirty,
    Naughty ... Words' step: drop any document containing one of
    ``words``. ONE vectorized RE2 alternation pass per block
    (``pc.count_substring_regex``); RE2 compiles alternations into a
    single DFA, so a thousand-word blocklist scans in linear time per
    byte, never once per word. Case-insensitive. ``whole_word`` wraps
    the alternation in ``\\b`` anchors (C4 semantics); ``invert=True``
    returns the MATCHED docs for audit sinks.

    DuckDB's regexp engine is RE2 as well, so a SQL oracle with the
    identical pattern via ``regexp_matches`` is exact
    (``__ray_entry__.blocklist_filter_documents``)."""
    import re as _re

    if not words:
        raise ValueError("empty blocklist")
    alt = "|".join(_re.escape(w.lower()) for w in sorted(words))
    pattern = rf"(?i)\b(?:{alt})\b" if whole_word else rf"(?i)(?:{alt})"

    def fn(t: pa.Table) -> pa.Table:
        hits = pc.count_substring_regex(t.column(text_col), pattern)
        bad = pc.greater(hits, 0)
        return t.filter(bad if invert else pc.invert(bad))

    return ds.map_batches(fn, batch_format="pyarrow")
