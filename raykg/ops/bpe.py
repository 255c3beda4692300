"""Distributed byte-pair-encoding tokenizer training and encoding —
the tokenizer-construction step of a training-data pipeline (Sennrich
et al. 2016, "Neural Machine Translation of Rare Words with Subword
Units"; the algorithm GPT-2/RoBERTa tokenizers derive from).

Scale shape:

- **Corpus pass (once)**: the distributed word-frequency table from
  ``ops.vocab`` — per-block ``np.unique`` pre-counts mean the shuffle
  carries one row per distinct word per block (Zipf head), not one
  per token.  At 100 TB this is the only pass that touches the rows.
- **Merge loop (n_merges iterations)**: BPE is inherently iterative
  with shared mutable state (the evolving symbol segmentation of
  every word), which the Dataset API cannot express — this is the
  documented raw-actor case.  The word table is hash-sharded ONCE
  across an actor pool; each iteration the driver
  (1) folds the shards' *pair-count deltas* (only words containing
  the previous winner re-count — the standard incremental trick, so
  per-iteration traffic is O(changed pairs), not O(vocab)),
  (2) picks the argmax pair with a deterministic tie-break
  (count desc, pair lexicographic asc) — integer counts summed
  exactly, so the merge sequence is bit-identical for ANY shard
  count, including 1 (pinned in tests against a sequential
  reference), and
  (3) broadcasts the winning pair; shards re-segment only their
  affected words via an inverted pair->words index.
  Driver memory is the global pair-count dict (bounded by the symbol
  vocabulary, Zipf again), never the corpus.
- **Encode (streaming)**: ``bpe_encode`` is a stateless
  ``map_batches`` stage; the merge ranks ship once via ``ray.put``
  and each batch encodes its *unique* words only (per-batch word
  cache), then gathers back — on natural text that's a ~10x cut.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from raykg.ops.vocab import word_frequencies
from raykg.util import hash_strings


# ---------------------------------------------------------------- train

def _pair_counts(segs: dict[str, tuple], freqs: dict[str, int],
                 words=None) -> dict:
    """Pair -> total frequency over ``words`` (all words if None)."""
    counts: dict = {}
    it = words if words is not None else segs.keys()
    for w in it:
        seg = segs[w]
        f = freqs[w]
        for i in range(len(seg) - 1):
            p = (seg[i], seg[i + 1])
            counts[p] = counts.get(p, 0) + f
    return counts


def _merge_word(seg: tuple, pair: tuple) -> tuple:
    a, b = pair
    out = []
    i = 0
    n = len(seg)
    while i < n:
        if i < n - 1 and seg[i] == a and seg[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seg[i])
            i += 1
    return tuple(out)


class _BpeShard:
    """One shard of the word-frequency table: segmentations + an
    inverted pair->words index, updated incrementally per merge."""

    def __init__(self, words: list[str], freqs: list[int]):
        self.freqs = dict(zip(words, freqs))
        self.segs = {w: tuple(w) for w in words}
        self.index: dict = {}
        for w, seg in self.segs.items():
            for i in range(len(seg) - 1):
                self.index.setdefault((seg[i], seg[i + 1]), set()).add(w)

    def initial_counts(self) -> dict:
        return _pair_counts(self.segs, self.freqs)

    def apply_merge(self, pair: tuple) -> dict:
        """Re-segment the words containing ``pair``; return the DELTA
        to the global pair counts (old pairs negative, new positive)."""
        hit = self.index.pop(pair, set())
        delta: dict = {}
        for w in hit:
            old = self.segs[w]
            new = _merge_word(old, pair)
            self.segs[w] = new
            f = self.freqs[w]
            for i in range(len(old) - 1):
                p = (old[i], old[i + 1])
                delta[p] = delta.get(p, 0) - f
                s = self.index.get(p)
                if s is not None:
                    s.discard(w)
                    if not s:
                        del self.index[p]
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                delta[p] = delta.get(p, 0) + f
                self.index.setdefault(p, set()).add(w)
        return delta


# num_cpus=0.5: merge rounds are short synchronized bursts; fractional
# reservation lets n_shards exceed the CPU count (e.g. the 4-CPU test
# session) without the driver's ray.get deadlocking on unschedulable
# actors. Size n_shards ~ cluster cores for the real corpus pass.
_RemoteShard = ray.remote(num_cpus=0.5)(_BpeShard)


def train_bpe(ds, text_col: str = "text", n_merges: int = 100,
              n_shards: int = 8, min_freq: int = 1,
              lowercase: bool = True) -> list[tuple]:
    """Learn ``n_merges`` BPE merges from a corpus.  Returns the merge
    list in learned order (rank = position).  Deterministic for any
    ``n_shards`` (exact integer count folds + fixed tie-break)."""
    wf = word_frequencies(ds, text_col=text_col).to_pandas()
    if lowercase:
        wf["word"] = wf["word"].str.lower()
        wf = wf.groupby("word", as_index=False)["n"].sum()
    wf = wf[wf["n"] >= min_freq]
    words = wf["word"].to_numpy()
    freqs = wf["n"].to_numpy()
    # stable FNV shard assignment (process-independent, unlike hash())
    shard_of = (hash_strings(list(words)) % n_shards) if len(words) else \
        np.array([], dtype=np.int64)

    shards = []
    for s in range(n_shards):
        m = shard_of == s
        shards.append(_RemoteShard.remote(
            list(words[m]), [int(x) for x in freqs[m]]))

    try:
        counts: dict = {}
        for part in ray.get([sh.initial_counts.remote() for sh in shards]):
            for p, c in part.items():
                counts[p] = counts.get(p, 0) + c

        merges: list[tuple] = []
        for _ in range(n_merges):
            if not counts:
                break
            # argmax with deterministic tie-break: count desc, pair asc
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if counts[best] < max(min_freq, 1):
                break
            merges.append(best)
            deltas = ray.get([sh.apply_merge.remote(best) for sh in shards])
            counts.pop(best, None)
            for d in deltas:
                for p, c in d.items():
                    if p == best:
                        continue
                    nc = counts.get(p, 0) + c
                    if nc <= 0:
                        counts.pop(p, None)
                    else:
                        counts[p] = nc
        return merges
    finally:
        # kill on every exit path: a mid-loop failure must not leak
        # n_shards live actors each pinning fractional CPU
        for sh in shards:
            ray.kill(sh)


def train_bpe_sequential(word_freqs: dict[str, int],
                         n_merges: int) -> list[tuple]:
    """Single-process reference trainer (test oracle): same argmax /
    tie-break rule, full recount each iteration — O(vocab) per merge,
    for pinning only."""
    segs = {w: tuple(w) for w in word_freqs}
    merges: list[tuple] = []
    for _ in range(n_merges):
        counts = _pair_counts(segs, word_freqs)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        segs = {w: _merge_word(s, best) for w, s in segs.items()}
    return merges


# ---------------------------------------------------------------- encode

def _encode_word(word: str, ranks: dict) -> list[str]:
    seg = list(word)
    while len(seg) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(seg) - 1):
            r = ranks.get((seg[i], seg[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        seg[best_i : best_i + 2] = [seg[best_i] + seg[best_i + 1]]
    return seg


def bpe_encode(ds, merges: list[tuple], text_col: str = "text",
               out_col: str = "bpe_tokens", lowercase: bool = True,
               counts_only: bool = False):
    """Apply learned merges to a text column (lowest-rank-first greedy,
    the standard BPE inference).  Merge ranks ship once via
    ``ray.put``; each batch encodes its unique words only.  With
    ``counts_only`` the output column is the int64 token count
    (schema stays scalar — handy for length/packing stages)."""
    ranks_ref = ray.put({p: i for i, p in enumerate(merges)})

    def fn(t: pa.Table) -> pa.Table:
        ranks = ray.get(ranks_ref)
        texts = t.column(text_col).to_pandas()
        if lowercase:
            texts = texts.str.lower()
        toks = texts.str.split(" ")
        flat = toks.explode().dropna()
        flat = flat[flat.str.len() > 0]
        uniq = pd.unique(flat.to_numpy()) if len(flat) else np.array([], object)
        enc = {w: _encode_word(w, ranks) for w in uniq}
        if counts_only:
            vals = [
                int(sum(len(enc[w]) for w in ws if w))
                if isinstance(ws, list) else 0
                for ws in toks
            ]
            return t.append_column(out_col, pa.array(vals, pa.int64()))
        vals = [
            [tok for w in ws if w for tok in enc[w]]
            if isinstance(ws, list) else []
            for ws in toks
        ]
        return t.append_column(out_col, pa.array(vals, pa.list_(pa.string())))

    return ds.map_batches(fn, batch_format="pyarrow")
