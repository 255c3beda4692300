"""Benchmark decontamination: drop training documents that share any
word n-gram with a held-out evaluation set — the published practice
for keeping test sets out of pretraining corpora (GPT-3 report §C
used 13-gram overlap; PaLM and Llama use 8-10 word n-grams).

Scale shape: the benchmark side is SMALL (eval suites are
thousands-of-documents, not corpus-scale), so its n-gram hash set is
built once, sorted, and broadcast with ``ray.put`` — every filter task
reads the same object-store copy (never re-shipped per batch). The
corpus side streams through one stateless ``map_batches`` filter:
words of the whole batch are hashed in one vectorized FNV pass, doc
n-grams come from a sliding window over the flat word-hash array
(windows crossing document boundaries masked by comparing the doc
index at both window ends), and membership is one ``np.isin`` against
the sorted benchmark array. No shuffle, no Python row loop.

Hash collisions can only cause FALSE POSITIVES (over-removal) at
~n_grams²/2⁶⁴ — the safe direction for decontamination.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from raykg.util import _FNV_OFFSET, _FNV_PRIME, hash_strings


def _word_ngram_hashes(texts: list[str], n: int) -> tuple[np.ndarray, np.ndarray]:
    """All word n-gram hashes of a text batch. Returns (gram_hash,
    doc_index) — one row per n-gram occurrence, boundary-safe. Word
    splitting goes through pandas split/explode (C-level; whitespace
    split drops empties, matching str.split())."""
    import pandas as pd

    s = pd.Series(texts, dtype="object").str.lower().str.split()
    ex = s.explode().dropna()
    if len(ex) < n:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    words = ex.tolist()
    wh = hash_strings(words)
    di = ex.index.to_numpy(dtype=np.int64)
    W = np.lib.stride_tricks.sliding_window_view(wh, n)
    with np.errstate(over="ignore"):
        h = np.full(len(W), _FNV_OFFSET, dtype=np.uint64)
        h = (h ^ np.uint64(n)) * _FNV_PRIME
        for j in range(n):
            h = (h ^ W[:, j]) * _FNV_PRIME
    valid = di[: len(W)] == di[n - 1 :]  # window stays inside one doc
    return h[valid], di[: len(W)][valid]


def benchmark_ngram_set(bench_texts: list[str], n: int = 8) -> np.ndarray:
    """Sorted unique n-gram hashes of the evaluation set (driver-side;
    bounded by benchmark size, not corpus size)."""
    h, _ = _word_ngram_hashes(bench_texts, n)
    return np.unique(h)


def decontaminate(ds, bench_texts: list[str], n: int = 8,
                  text_col: str = "text", invert: bool = False):
    """Filter out docs sharing any word n-gram with ``bench_texts``.
    ``invert=True`` returns the CONTAMINATED docs instead (for audit
    sinks). Docs shorter than n words are never contaminated."""
    gram_ref = ray.put(benchmark_ngram_set(bench_texts, n))

    def fn(t: pa.Table) -> pa.Table:
        grams = ray.get(gram_ref)
        texts = t.column(text_col).to_pylist()
        h, di = _word_ngram_hashes(texts, n)
        dirty = np.zeros(len(texts), dtype=bool)
        if len(h) and len(grams):
            hit = np.isin(h, grams, assume_unique=False)
            np.logical_or.at(dirty, di[hit], True)
        return t.filter(pa.array(dirty if invert else ~dirty))

    return ds.map_batches(fn, batch_format="pyarrow")
