"""Dictionary and pattern-based information extraction — the two
classic bootstrap stages of knowledge-graph construction that sit
BESIDE the learned pipeline (detect -> encode -> link, raykg/pipeline.py):

- ``gazetteer_counts``: dictionary entity spotting. Given a catalogue
  of surface forms (the KB's alias table — the reference ships exactly
  this as its entity catalogue, ``pipeline/postgres_devcontainer/
  import.sql``-shaped id->title rows read by ``raykg/sources.py:40``),
  count word-boundary occurrences of every surface in every document.
  The classic high-precision recall floor for entity linking: every
  string-match mention is a candidate even when the learned detector
  misses it.

- ``pattern_triples``: OpenIE-lite relation extraction. One regex with
  (subject, predicate, object) capture groups applied non-overlapping
  over a text column, emitting one (id, subj, pred, obj) row per match
  — the pattern-based triple source that seeds a KG before any model
  runs (Hearst-pattern / ReVerb family). The emitted rows are
  schema-compatible with the flagship's triple store
  (``raykg/triples.py`` SPO layout).

Both are stateless streaming ``map_batches`` transforms (no shuffle:
extraction is embarrassingly parallel; dedup/aggregation of the
emitted rows composes downstream with ops/dedup.py), with the
compiled matchers cached once per worker process. Regex engines:
Arrow's ``count_substring_regex`` is RE2 — the same engine as DuckDB —
so gazetteer counts have a bit-exact SQL oracle; ``pattern_triples``
uses Python ``re``, whose non-overlapping leftmost semantics coincide
with RE2 for backreference-free patterns (the proof obligation and
precedent: ops/funnel.py sequence_pattern_match).

Scale shape: the catalogue is broadcast ONCE (``ray.put``) and each
worker compiles its matchers once (worker-local cache) —
O(|catalogue|) regex passes per batch. That is the right plan to a
few hundred surfaces; for a 5.9M-surface KB (the reference's full
catalogue) the per-worker compile becomes one Aho-Corasick automaton
over the same broadcast list — the seam is ``_gaz_patterns`` and the
output contract does not change.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

# RE2-safe literal escaping for catalogue surfaces: everything outside
# [A-Za-z0-9 _] is escaped. re.escape output is RE2-compatible for the
# characters it escapes (both engines treat \<punct> as the literal).
_ESCAPE_RX = re.compile(r"[^A-Za-z0-9 _]")


def _surface_pattern(surface: str) -> str:
    """Word-boundary, non-overlapping pattern for one catalogue
    surface — identical string handed to Arrow RE2 and (by the SQL
    builder below) to DuckDB RE2."""
    return r"\b" + _ESCAPE_RX.sub(lambda m: "\\" + m.group(0), surface) + r"\b"


# worker-local compiled-catalogue cache (the raykg/link.py
# _STAGE_CACHE pattern: ray.get + compile once per worker process,
# keyed by the broadcast ref so concurrent catalogues don't collide)
_GAZ_CACHE: dict = {}


def _gaz_patterns(ref) -> list[tuple[str, str]]:
    key = ref.hex()
    if key not in _GAZ_CACHE:
        surfaces = ray.get(ref)
        _GAZ_CACHE[key] = [(s, _surface_pattern(s)) for s in surfaces]
    return _GAZ_CACHE[key]


def gazetteer_counts(ds, surfaces: list[str], text_col: str = "text",
                     id_col: str = "doc_id"):
    """Dictionary entity spotting -> Dataset(id, surface, n_matches),
    n_matches > 0 only.

    Per-surface counting (not one alternation pass): overlapping
    matches of DIFFERENT surfaces all count ("red widget" and "widget
    sales" both hit in "red widget sales"), while matches of the SAME
    surface count non-overlapping — dictionary-spotting semantics, and
    exactly what a per-surface ``regexp_extract_all`` SQL mirror
    computes.

    The catalogue is broadcast ONCE (``ray.put``) and compiled once
    per worker process (worker-local cache), never re-shipped per
    batch; counting is one vectorized Arrow RE2 pass per surface.
    """
    ref = ray.put(list(surfaces))

    def spot(t: pa.Table) -> pa.Table:
        pats = _gaz_patterns(ref)
        text = t.column(text_col)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        out_ids, out_surf, out_n = [], [], []
        for surf, pat in pats:
            # fill_null: count over a null text row is null, not 0
            n = pc.fill_null(
                pc.count_substring_regex(text, pat), 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            hit = n > 0
            if hit.any():
                out_ids.append(ids[hit])
                out_surf.append(np.full(int(hit.sum()), surf, object))
                out_n.append(n[hit])
        if not out_ids:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "surface": pa.array([], pa.string()),
                "n_matches": pa.array([], pa.int64()),
            })
        return pa.table({
            id_col: pa.array(np.concatenate(out_ids)),
            "surface": pa.array(np.concatenate(out_surf).tolist(),
                                pa.string()),
            "n_matches": pa.array(np.concatenate(out_n)),
        })

    return ds.map_batches(spot, batch_format="pyarrow")


# worker-local compiled-regex cache (compile once per worker process,
# not per batch)
_RX_CACHE: dict[str, re.Pattern] = {}


def _compiled(pattern: str) -> re.Pattern:
    rx = _RX_CACHE.get(pattern)
    if rx is None:
        rx = _RX_CACHE[pattern] = re.compile(pattern)
    return rx


def pattern_triples(ds, pattern: str, text_col: str = "text",
                    id_col: str = "doc_id"):
    """OpenIE-lite: extract (subj, pred, obj) triples by one
    3-capture-group regex, non-overlapping left-to-right (re.finditer
    == RE2 regexp_extract_all for backreference-free patterns).
    -> Dataset(id, subj, pred, obj).

    Stateless streaming map; the regex compiles once per worker
    (cache above). Matching is per-row Python ``re`` over the batch —
    string extraction with per-match group capture has no Arrow
    kernel; emitted rows are bounded by match volume."""

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        rx = _compiled(pattern)
        ids_out, s_out, p_out, o_out = [], [], [], []
        for i, txt in zip(df[id_col].to_numpy(),
                          df[text_col].to_numpy()):
            if not isinstance(txt, str):
                continue
            for m in rx.finditer(txt):
                ids_out.append(i)
                s_out.append(m.group(1))
                p_out.append(m.group(2))
                o_out.append(m.group(3))
        return pd.DataFrame({
            id_col: pd.array(ids_out, dtype="int64"),
            "subj": pd.array(s_out, dtype=object),
            "pred": pd.array(p_out, dtype=object),
            "obj": pd.array(o_out, dtype=object),
        })

    return ds.map_batches(extract, batch_format="pandas")
