"""Trainable NER in the detection seam: averaged structured perceptron
with BIO tags and Viterbi decode.

The reference detects mentions with a Flair LSTM-CRF tagger
(``pipeline/biencoder/blink/ner.py:29-42``, wired in
``main_dense.py:80-101``); its weights cannot ship in this sandbox, so
the engine's default detector is the deterministic capitalized-span
rule (``raykg.detect``). This module supplies the thing the rule-based
stand-in cannot claim: a REAL sequence model — features -> per-tag
emission scores -> transition-scored Viterbi path — whose weights are
LEARNED from labeled spans, dropped into the exact same
``map_batches(DetectorCls, ...)`` slot (``TaggerDetector``). The test
(``tests/test_ner.py``) trains it on the fixture's epoch-0 gold spans
and checks (a) span-level F1 on held-out epochs and (b) that the Ray
stage's output feeds the downstream pipeline identically to the
rule-based stage when the learned decision agrees with the rule.

Model: structured perceptron (Collins 2002) with weight averaging.
Features are hashed into a fixed-width float32 weight matrix
``(3 tags, 2**hash_bits)`` — the standard hashing trick, so the model
is two dense numpy arrays (weights + 3x3 transitions) that ``ray.put``
broadcasts to every worker once, mirroring how real tagger weights
would travel. Inference is a per-sentence Viterbi over 3 tags: O(n*9)
adds per sentence — the per-token loop IS the model's compute (Flair
pays an LSTM step per token in the same place); the stage is
actor-pooled so the cost parallelizes per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

O, B, I = 0, 1, 2
N_TAGS = 3


def _shape(w: str) -> str:
    out = []
    last = ""
    for ch in w:
        c = "X" if ch.isupper() else "x" if ch.islower() else "9" if ch.isdigit() else ch
        if c != last:
            out.append(c)
        last = c
    return "".join(out)


def _tokenize_with_offsets(text: str) -> tuple[list[str], list[int]]:
    """Whitespace tokens + their char start offsets."""
    toks, starts = [], []
    i, n = 0, len(text)
    while i < n:
        if text[i] == " ":
            i += 1
            continue
        j = i
        while j < n and text[j] != " ":
            j += 1
        toks.append(text[i:j])
        starts.append(i)
        i = j
    return toks, starts


def _token_features(toks: list[str]) -> list[list[str]]:
    """Per-token feature-string lists. Window of +-1 word/shape, affixes,
    position — the classic perceptron tagger template."""
    feats = []
    n = len(toks)
    for i, w in enumerate(toks):
        lw = w.lower()
        prev = toks[i - 1].lower() if i else "<s>"
        nxt = toks[i + 1].lower() if i + 1 < n else "</s>"
        f = [
            "w=" + lw,
            "shape=" + _shape(w),
            "suf3=" + lw[-3:],
            "pre1=" + lw[:1],
            "cap=" + ("1" if w[:1].isupper() else "0"),
            "first=" + ("1" if i == 0 else "0"),
            "pw=" + prev,
            "nw=" + nxt,
            "pshape=" + (_shape(toks[i - 1]) if i else "<s>"),
            "nshape=" + (_shape(toks[i + 1]) if i + 1 < n else "</s>"),
        ]
        feats.append(f)
    return feats


def _hash_feature(s: str, mask: int) -> int:
    h = 14695981039346656037
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h & mask


class PerceptronTagger:
    def __init__(self, hash_bits: int = 18):
        self.mask = (1 << hash_bits) - 1
        self.w = np.zeros((N_TAGS, self.mask + 1), dtype=np.float64)
        self.t = np.zeros((N_TAGS + 1, N_TAGS), dtype=np.float64)  # row N_TAGS = start
        # averaging accumulators (lazy, timestamp-based)
        self._wa = np.zeros_like(self.w)
        self._wt = np.zeros_like(self.w)
        self._ta = np.zeros_like(self.t)
        self._tt = np.zeros_like(self.t)
        self._step = 0

    # -- scoring -----------------------------------------------------
    def _emissions(self, feat_idx: list[np.ndarray], w=None) -> np.ndarray:
        w = self.w if w is None else w
        em = np.zeros((len(feat_idx), N_TAGS), dtype=np.float64)
        for i, idx in enumerate(feat_idx):
            em[i] = w[:, idx].sum(axis=1)
        return em

    def _viterbi(self, em: np.ndarray, t=None) -> np.ndarray:
        t = self.t if t is None else t
        n = em.shape[0]
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        dp = em[0] + t[N_TAGS]
        back = np.zeros((n, N_TAGS), dtype=np.int64)
        for i in range(1, n):
            cand = dp[:, None] + t[:N_TAGS]  # (prev, cur)
            back[i] = np.argmax(cand, axis=0)
            dp = cand[back[i], np.arange(N_TAGS)] + em[i]
        path = np.zeros(n, dtype=np.int64)
        path[-1] = int(np.argmax(dp))
        for i in range(n - 1, 0, -1):
            path[i - 1] = back[i, path[i]]
        return path

    # -- training ----------------------------------------------------
    def _update(self, feat_idx, gold, pred):
        self._step += 1
        s = self._step
        prev_g = prev_p = N_TAGS
        for i, idx in enumerate(feat_idx):
            g, p = int(gold[i]), int(pred[i])
            if g != p:
                # lazy-average flush for the touched rows
                for tag, delta in ((g, 1.0), (p, -1.0)):
                    self._wa[tag, idx] += (s - self._wt[tag, idx]) * self.w[tag, idx]
                    self._wt[tag, idx] = s
                    self.w[tag, idx] += delta
            if (prev_g, g) != (prev_p, p):
                for (a, b), delta in (((prev_g, g), 1.0), ((prev_p, p), -1.0)):
                    self._ta[a, b] += (s - self._tt[a, b]) * self.t[a, b]
                    self._tt[a, b] = s
                    self.t[a, b] += delta
            prev_g, prev_p = g, p

    def averaged(self) -> tuple[np.ndarray, np.ndarray]:
        """Averaged weights (float32) — what ships to workers."""
        s = max(self._step, 1)
        wa = self._wa + (s - self._wt) * self.w
        ta = self._ta + (s - self._tt) * self.t
        return (wa / s).astype(np.float32), (ta / s).astype(np.float32)

    def fit(self, sentences: list[list[str]], tag_seqs: list[np.ndarray],
            epochs: int = 5) -> "PerceptronTagger":
        """Deterministic: fixed sentence order per epoch (the classic
        recipe shuffles; determinism matters more here)."""
        cached = [
            [np.array([_hash_feature(f, self.mask) for f in fs], dtype=np.int64)
             for fs in _token_features(toks)]
            for toks in sentences
        ]
        for _ in range(epochs):
            for feat_idx, gold in zip(cached, tag_seqs):
                em = self._emissions(feat_idx)
                pred = self._viterbi(em)
                if not np.array_equal(pred, gold):
                    self._update(feat_idx, gold, pred)
        return self


def bio_tags(toks: list[str], starts: list[int],
             spans: list[tuple[int, int]]) -> np.ndarray:
    """Char spans -> per-token BIO tags (a token belongs to a span iff
    its start offset lies inside it)."""
    tags = np.zeros(len(toks), dtype=np.int64)
    for s, e in spans:
        inside = False
        for i, st in enumerate(starts):
            if s <= st < e:
                tags[i] = I if inside else B
                inside = True
    return tags


def spans_from_tags(toks: list[str], starts: list[int],
                    tags: np.ndarray) -> list[tuple[int, int]]:
    out = []
    i, n = 0, len(toks)
    while i < n:
        if tags[i] == O:
            i += 1
            continue
        j = i + 1
        while j < n and tags[j] == I:
            j += 1
        out.append((starts[i], starts[j - 1] + len(toks[j - 1])))
        i = j
    return out


def train_tagger_from_gold(transcripts: pa.Table, gold: pa.Table,
                           epochs: int = 5,
                           hash_bits: int = 18) -> PerceptronTagger:
    """Train on (turn text, gold mention char spans). Inputs are the
    fixture's transcript and gold tables (any epoch subset)."""
    spans_by_turn: dict[tuple[str, int], list[tuple[int, int]]] = {}
    for c, ti, s, e in zip(
        gold.column("conv_id").to_pylist(),
        gold.column("turn_idx").to_pylist(),
        gold.column("start_pos").to_pylist(),
        gold.column("end_pos").to_pylist(),
    ):
        spans_by_turn.setdefault((c, ti), []).append((s, e))
    sentences, tag_seqs = [], []
    for c, ti, text in zip(
        transcripts.column("conv_id").to_pylist(),
        transcripts.column("turn_idx").to_pylist(),
        transcripts.column("text").to_pylist(),
    ):
        toks, starts = _tokenize_with_offsets(text)
        if not toks:
            continue
        sentences.append(toks)
        tag_seqs.append(bio_tags(toks, starts, spans_by_turn.get((c, ti), [])))
    return PerceptronTagger(hash_bits=hash_bits).fit(sentences, tag_seqs,
                                                     epochs=epochs)


class TaggerDetector:
    """Drop-in for ``raykg.detect.detect_mentions``: same MENTIONS
    output schema, mention ids from the same (conv, turn, rank) formula
    — so every downstream stage is untouched. Construct with the
    averaged weight arrays (pass ``ray.put`` refs through
    ``fn_constructor_kwargs``; the stage resolves them once per actor)::

        w_ref, t_ref = ray.put(w), ray.put(t)
        ds.map_batches(TaggerDetector, fn_constructor_kwargs={
            "weights": w_ref, "transitions": t_ref},
            batch_format="pyarrow", concurrency=8)
    """

    def __init__(self, weights, transitions, hash_bits: int = 18):
        import ray

        def _resolve(x):
            return ray.get(x) if isinstance(x, ray.ObjectRef) else x

        self.tagger = PerceptronTagger(hash_bits=hash_bits)
        self.tagger.w = np.asarray(_resolve(weights), dtype=np.float64)
        self.tagger.t = np.asarray(_resolve(transitions), dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raykg.detect import (
            MAX_MENTIONS_PER_TURN,
            MAX_TURNS_PER_CONV,
            conv_ordinal,
        )

        m_ids, m_conv, m_turn, m_start, m_end = [], [], [], [], []
        m_text, m_left, m_right = [], [], []
        for conv, ti, text in zip(
            batch.column("conv_id").to_pylist(),
            batch.column("turn_idx").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            toks, starts = _tokenize_with_offsets(text)
            if not toks:
                continue
            feat_idx = [
                np.array([_hash_feature(f, self.tagger.mask) for f in fs],
                         dtype=np.int64)
                for fs in _token_features(toks)
            ]
            tags = self.tagger._viterbi(self.tagger._emissions(feat_idx))
            spans = spans_from_tags(toks, starts, tags)[:MAX_MENTIONS_PER_TURN]
            if not spans:
                continue
            base = (conv_ordinal(conv) * MAX_TURNS_PER_CONV + ti) \
                * MAX_MENTIONS_PER_TURN
            for j, (s, e) in enumerate(spans):
                m_ids.append(base + j)
                m_conv.append(conv)
                m_turn.append(ti)
                m_start.append(s)
                m_end.append(e)
                m_text.append(text[s:e])
                m_left.append(text[:s])
                m_right.append(text[e:])
        return pa.table(
            {
                "mention_id": pa.array(m_ids, type=pa.int64()),
                "conv_id": pa.array(m_conv, type=pa.string()),
                "turn_idx": pa.array(m_turn, type=pa.int32()),
                "start_pos": pa.array(m_start, type=pa.int32()),
                "end_pos": pa.array(m_end, type=pa.int32()),
                "mention": pa.array(m_text, type=pa.string()),
                "context_left": pa.array(m_left, type=pa.string()),
                "context_right": pa.array(m_right, type=pa.string()),
            }
        )
