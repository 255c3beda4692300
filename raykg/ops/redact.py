"""PII redaction over a text column — a standard curation pass for
LLM training corpora (emails, phone numbers, IP addresses replaced by
typed placeholder tokens before training).

Fully vectorized: every pattern is applied with
``pyarrow.compute.replace_substring_regex`` (RE2) over the whole Arrow
column — zero Python-level row loops, zero pandas conversion. DuckDB's
``regexp_replace`` is also RE2, so the same pattern strings give an
exact SQL oracle (query ``redact_pii_documents``).

Patterns are applied IN ORDER and counts are taken on the text as it
stands before that pattern's replacement (an email's digits are gone
before the phone pattern runs) — the oracle mirrors this with one CTE
stage per pattern. Placeholders are chosen so no pattern matches
another's output.

Scale shape: a stateless ``map_batches`` transform; string-heavy, so
batches stay at the default block size and the stage pipelines with
the read. No shuffle, no state, no driver involvement.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — order matters; see module doc.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        # +1-555-0199 / (555) 867-5309 / 555-0199 style runs
        r"\+?\d{0,2}[-. (]*\d{3}[-. )]*\d{3,4}[-. ]*\d{4}|\b\d{3}[-.]\d{4}\b",
        "<PHONE>",
    ),
]


def redact_text(col: pa.ChunkedArray | pa.Array) -> tuple[pa.ChunkedArray, pa.ChunkedArray]:
    """Redact one Arrow string column. Returns (redacted, n_redactions)
    where n_redactions counts all pattern hits, each pattern counted on
    the text after the previous patterns' replacements."""
    text = col
    total = None
    for _name, pat, repl in PII_PATTERNS:
        n = pc.count_substring_regex(text, pat)
        total = n if total is None else pc.add(total, n)
        text = pc.replace_substring_regex(text, pat, repl)
    return text, pc.cast(total, pa.int64())


def redact_pii(ds, text_col: str = "text", out_col: str = "text_redacted"):
    """Dataset-level redaction: keeps all columns, replaces nothing in
    place — adds ``out_col`` plus ``n_redactions``."""

    def fn(t: pa.Table) -> pa.Table:
        red, n = redact_text(t.column(text_col))
        return t.append_column(out_col, red).append_column("n_redactions", n)

    return ds.map_batches(fn, batch_format="pyarrow")
