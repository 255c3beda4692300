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


def semantic_decontaminate(ds, eval_vectors, vec_col: str = "embedding",
                           id_col: str = "doc_id", threshold: float = 0.8,
                           chunk: int = 4096):
    """Embedding-space decontamination: flag every corpus row whose
    COSINE similarity to ANY held-out eval vector reaches
    ``threshold`` — the semantic complement of the n-gram
    ``decontaminate`` (paraphrased eval leakage that shares no 8-gram
    still lands next to the eval point in embedding space).

    Scale shape mirrors the n-gram variant: the (m, d) eval matrix is
    unit-normalized once and broadcast via ``ray.put``; each batch is
    one (rows × m) GEMM (chunked over eval columns at ``chunk`` so a
    100k-probe eval suite stays in cache), keeping only the running
    row-max — a stateless streaming map, no shuffle.  For eval suites
    beyond GEMM reach, pre-bucket both sides with the LSH machinery of
    ``dedup.embedding_cosine_pairs`` instead.

    -> Dataset(id_col, max_sim, contaminated).
    """
    import ray

    from raykg.encode import column_to_vectors

    E = np.asarray(eval_vectors, dtype=np.float64)
    nrm = np.linalg.norm(E, axis=1, keepdims=True)
    nrm[nrm == 0.0] = 1.0
    eref = ray.put(np.ascontiguousarray((E / nrm).T))  # (d, m)

    def fn(t: pa.Table) -> pa.Table:
        Et = ray.get(eref)
        V = column_to_vectors(t.column(vec_col)).astype(np.float64)
        vn = np.linalg.norm(V, axis=1, keepdims=True)
        vn[vn == 0.0] = 1.0
        V = V / vn
        best = np.full(V.shape[0], -np.inf)
        for j in range(0, Et.shape[1], chunk):
            np.maximum(best, (V @ Et[:, j:j + chunk]).max(axis=1), out=best)
        return pa.table({
            id_col: t.column(id_col),
            "max_sim": pa.array(best, pa.float64()),
            "contaminated": pa.array(best >= threshold),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
