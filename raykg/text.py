"""String similarity / distance kernels (batched, numpy).

Re-implements, from their public definitions, the string measures the
reference pulls from libraries that are not available here:

  * ``textdistance.Levenshtein(qval=None).normalized_similarity`` —
    qval=None means textdistance splits both strings on whitespace, so
    this is WORD-level edit distance over token sequences, similarity =
    1 - d / max(token count) (``pipeline/nilpredictor/__main__.py:15,
    105-117``); ``batch_levenshtein_token_sim`` implements it.
    ``batch_levenshtein``/``batch_levenshtein_sim`` are the char-level
    variants (used by tests and available to callers who want qval=1).
  * ``textdistance.Jaccard(qval=None).normalized_similarity`` —
    whitespace-token multiset Jaccard |A∩B| / |A∪B| with Counter
    (bag) semantics (``pipeline/nilpredictor/__main__.py:14``).
  * ``fastDamerauLevenshtein.damerauLevenshtein`` (restricted
    Damerau-Levenshtein / optimal string alignment) and the reference's
    short-string-penalty wrapper: strings shorter than 4 chars that are
    not equal get distance + 3
    (``pipeline/threestepclustering/__main__.py:55-63``).

``batch_levenshtein`` vectorizes the DP across the pair axis: the inner
loop runs over character positions (≈ max string length iterations),
each step a numpy op over all pairs.
"""

from __future__ import annotations

from collections import Counter

import numpy as np


def _pad_codes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """-> (codes (n, Lmax) int32 zero-padded, lens (n,))."""
    n = len(texts)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    L = int(lens.max()) if n else 0
    out = np.zeros((n, L), dtype=np.int32)
    for i, t in enumerate(texts):
        if t:
            out[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    return out, lens


def _pad_token_codes(
    a_toks: list[list[str]], b_toks: list[list[str]]
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Encode token sequences to ints via a shared vocab, zero-padded."""
    vocab: dict[str, int] = {}

    def enc(seqs: list[list[str]]) -> tuple[np.ndarray, np.ndarray]:
        n = len(seqs)
        lens = np.fromiter((len(s) for s in seqs), dtype=np.int64, count=n)
        L = int(lens.max()) if n else 0
        out = np.zeros((n, L), dtype=np.int32)
        for i, s in enumerate(seqs):
            for j, w in enumerate(s):
                code = vocab.get(w)
                if code is None:
                    code = len(vocab) + 1
                    vocab[w] = code
                out[i, j] = code
        return out, lens

    ca, la = enc(a_toks)
    cb, lb = enc(b_toks)
    return ca, la, cb, lb


def _batch_lev_core(
    ca: np.ndarray, la: np.ndarray, cb: np.ndarray, lb: np.ndarray
) -> np.ndarray:
    """Vectorized-across-pairs Levenshtein DP over int code arrays."""
    n = ca.shape[0]
    La, Lb = ca.shape[1], cb.shape[1]
    # dp over rows of a; dp[j] = edit distance between a[:i] and b[:j]
    dp = np.broadcast_to(np.arange(Lb + 1, dtype=np.int64), (n, Lb + 1)).copy()
    # positions beyond each b's length are invalid; we read results at lb
    for i in range(1, La + 1):
        prev = dp
        dp = np.empty_like(prev)
        dp[:, 0] = i
        # rows where i exceeds len(a) keep previous row (no-op) — mask later
        ai = ca[:, i - 1][:, None]  # (n,1)
        sub_cost = (ai != cb).astype(np.int64)  # (n, Lb)
        for j in range(1, Lb + 1):
            dp[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, dp[:, j - 1] + 1),
                prev[:, j - 1] + sub_cost[:, j - 1],
            )
        # freeze finished rows (i > len(a)): keep their final value
        done = la < i
        if done.any():
            dp[done] = prev[done]
    return dp[np.arange(n), lb]


def batch_levenshtein(a: list[str], b: list[str]) -> np.ndarray:
    """Pairwise (aligned) CHAR-level Levenshtein distances."""
    assert len(a) == len(b)
    if len(a) == 0:
        return np.zeros(0, dtype=np.int64)
    ca, la = _pad_codes(list(a))
    cb, lb = _pad_codes(list(b))
    return _batch_lev_core(ca, la, cb, lb)


def batch_levenshtein_sim(a: list[str], b: list[str]) -> np.ndarray:
    """Char-level normalized similarity: 1 - d / max(len, 1)."""
    d = batch_levenshtein(a, b).astype(np.float64)
    la = np.fromiter((len(x) for x in a), dtype=np.float64, count=len(a))
    lb = np.fromiter((len(x) for x in b), dtype=np.float64, count=len(b))
    mx = np.maximum(np.maximum(la, lb), 1.0)
    return 1.0 - d / mx


def batch_levenshtein_token_sim(a: list[str], b: list[str]) -> np.ndarray:
    """textdistance ``Levenshtein(qval=None).normalized_similarity``:
    whitespace-token edit distance, 1 - d / max(token count, 1)."""
    assert len(a) == len(b)
    if len(a) == 0:
        return np.zeros(0, dtype=np.float64)
    ta = [x.split() for x in a]
    tb = [y.split() for y in b]
    ca, la, cb, lb = _pad_token_codes(ta, tb)
    d = _batch_lev_core(ca, la, cb, lb).astype(np.float64)
    mx = np.maximum(np.maximum(la, lb), 1).astype(np.float64)
    return 1.0 - d / mx


def jaccard_multiset_sim(a: str, b: str) -> float:
    """Whitespace-token bag Jaccard (textdistance Jaccard(qval=None))."""
    ca, cb = Counter(a.split()), Counter(b.split())
    if not ca and not cb:
        return 1.0
    inter = sum((ca & cb).values())
    union = sum((ca | cb).values())
    return inter / union if union else 1.0


def batch_jaccard_sim(a: list[str], b: list[str]) -> np.ndarray:
    return np.fromiter(
        (jaccard_multiset_sim(x, y) for x, y in zip(a, b)),
        dtype=np.float64,
        count=len(a),
    )


def damerau_levenshtein(a: str, b: str) -> int:
    """Restricted Damerau-Levenshtein (optimal string alignment)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2 = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + cost)
        prev2, prev = prev, cur
    return prev[lb]


def dam_lev_metric(x: str, y: str) -> float:
    """The reference's short-string-penalty wrapper
    (``pipeline/threestepclustering/__main__.py:55-63``): strings with
    any side shorter than 4 chars compare by raw equality (0) or get the
    lowercased distance + 3; otherwise plain lowercased distance."""
    if len(x) < 4 or len(y) < 4:
        if x == y:
            return 0.0
        return damerau_levenshtein(x.lower(), y.lower()) + 3.0
    return float(damerau_levenshtein(x.lower(), y.lower()))


def dam_lev_matrix(mentions: list[str]) -> np.ndarray:
    """Symmetric pairwise dam_lev_metric matrix (small groups only)."""
    n = len(mentions)
    out = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for j in range(i + 1, n):
            d = dam_lev_metric(mentions[i], mentions[j])
            out[i, j] = d
            out[j, i] = d
    return out
