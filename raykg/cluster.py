"""NIL clustering strategies: greedy / feature / threestep.

The reference exposes three interchangeable clustering services behind
one HTTP contract (``pipeline/docker-compose.yml:56-91``; SURVEY.md
§2.10). Here they are pure functions ``(ids, mentions, encodings, ...)
-> list[Cluster]`` run per group inside ``groupby(...).map_groups`` —
plus shared aggregates:

  * modal-mention title = ``pd.Series(mentions).value_counts().index[0]``
    (``pipeline/greedyclustering/__main__.py:74``);
  * medoid center = the member vector minimizing total euclidean
    distance, the exact object ``KMedoids(n_clusters=1)`` converges to
    (``:76``) — no sklearn-extra needed, ties -> lowest index;
  * greedy nearest-neighbor label propagation
    (``:30-34``, doi 10.18653/v1/2021.acl-long.364) — **order
    dependent**: callers must pass rows sorted by mention_id
    (SURVEY.md §7.7.1);
  * TF-IDF scoring for the feature strategy
    (``pipeline/featureclustering/__main__.py:42-75``), reimplemented in
    numpy with sklearn's formulas (char-bigram TF no-idf l2; word TF-IDF
    smooth-idf l2, max_features=10000). Deviation: the reference loads
    vectorizers pre-fit on its dev split from a pickle; here they are
    fit on the group being clustered (deterministic, self-contained);
  * the three-step strategy (``pipeline/threestepclustering/__main__.py``):
    step 1 single-linkage over the penalized Damerau-Levenshtein surface
    metric (threshold 0.2), step 2 per-block single-linkage cosine over
    encodings (0.036), step 3 single-linkage cosine over block mean
    vectors (0.05) + the compare-encoding merge gate (dot > 80) and the
    >25-unique-mentions breakup. Single-linkage agglomerative clustering
    cut at threshold t == connected components of the graph with edges
    {distance < t}, computed via union-find.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from raykg.schema import (
    FEATURE_THRESHOLD,
    GREEDY_THRESHOLD,
    THREESTEP_BREAKUP,
    THREESTEP_MERGE_DOT,
    THREESTEP_T1,
    THREESTEP_T2,
    THREESTEP_T3,
)
from raykg.text import dam_lev_matrix


@dataclass
class Cluster:
    mention_ids: list[int] = field(default_factory=list)
    mentions: list[str] = field(default_factory=list)
    encodings: list[np.ndarray] = field(default_factory=list)

    @property
    def nelements(self) -> int:
        return len(self.mentions)

    def title(self) -> str:
        # modal mention; ties -> first-encountered (Counter.most_common
        # preserves insertion order for equal counts, exactly like the
        # pandas value_counts it replaces — just without building a
        # Series per cluster)
        if len(self.mentions) == 1:
            return self.mentions[0]
        from collections import Counter

        return Counter(self.mentions).most_common(1)[0][0]

    def center(self) -> np.ndarray:
        if len(self.encodings) <= 2:
            # 1 member: itself. 2 members: both are equidistant, tie ->
            # lowest index — the medoid math would return encodings[0]
            return self.encodings[0]
        return medoid(np.stack(self.encodings))


def medoid(encodings: np.ndarray) -> np.ndarray:
    """Member vector minimizing summed euclidean distance to the others
    (exact KMedoids(n_clusters=1) optimum); ties -> lowest index."""
    if len(encodings) == 1:
        return encodings[0]
    sq = np.sum(encodings**2, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (encodings @ encodings.T)
    np.maximum(d2, 0.0, out=d2)
    total = np.sqrt(d2).sum(axis=1)
    return encodings[int(np.argmin(total))]


def greedy_labels(scores: np.ndarray, threshold: float) -> np.ndarray:
    """Greedy NN label propagation — faithful to the reference loop
    (order dependent by design). The adjacency is thresholded once,
    vectorized; the sequential assignment loop is the semantics."""
    adj = scores > threshold
    labels = np.arange(scores.shape[0])
    for i in range(len(labels)):
        labels[adj[i]] = labels[i]
    return labels


def _clusters_from_labels(labels, ids, mentions, encodings) -> list[Cluster]:
    """Group rows by label, preserving first-appearance cluster order
    (matches the reference's insertion-ordered dict,
    ``pipeline/greedyclustering/__main__.py:62-71``)."""
    out: dict[int, Cluster] = {}
    for i, lab in enumerate(labels):
        c = out.get(int(lab))
        if c is None:
            c = out[int(lab)] = Cluster()
        c.mention_ids.append(int(ids[i]))
        c.mentions.append(mentions[i])
        c.encodings.append(encodings[i])
    return list(out.values())


def greedy_clusters(
    ids, mentions, encodings: np.ndarray, threshold: float = GREEDY_THRESHOLD
) -> list[Cluster]:
    """Dot-product greedy clustering (``greedyclustering/__main__.py``)."""
    if len(mentions) == 0:
        return []
    scores = encodings @ encodings.T
    return _clusters_from_labels(
        greedy_labels(scores, threshold), ids, mentions, encodings
    )


# ---------------------------------------------------------------- feature

_WORD_RE = None


def _tokenize_words(text: str) -> list[str]:
    """sklearn's default token_pattern r"(?u)\\b\\w\\w+\\b", lowercased."""
    global _WORD_RE
    if _WORD_RE is None:
        import re

        _WORD_RE = re.compile(r"(?u)\b\w\w+\b")
    return _WORD_RE.findall(text.lower())


def _char_bigrams(text: str) -> list[str]:
    t = text.lower()
    return [t[i : i + 2] for i in range(len(t) - 1)]


class TfidfModel:
    """A FITTED vectorizer: fixed vocabulary (+ idf) with sklearn
    transform semantics — unseen terms drop, idf comes from the fit
    corpus. The pre-fit + broadcast counterpart of the reference's
    pickled TfidfVectorizers (``featureclustering/__main__.py:42-52,
    137-139``)."""

    def __init__(self, terms: list[str], idf: np.ndarray | None = None):
        self.terms = list(terms)
        self.index = {t: i for i, t in enumerate(self.terms)}
        self.idf = None if idf is None else np.asarray(idf, dtype=np.float64)

    def transform(self, docs_tokens: list[list[str]]) -> np.ndarray:
        X = np.zeros((len(docs_tokens), len(self.terms)), dtype=np.float64)
        for i, toks in enumerate(docs_tokens):
            for t in toks:
                j = self.index.get(t)
                if j is not None:
                    X[i, j] += 1.0
        if self.idf is not None:
            X *= self.idf
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return X / norms


def fit_tfidf(docs_tokens: list[list[str]], use_idf: bool,
              max_features: int | None) -> TfidfModel:
    """Fit with sklearn semantics: smooth idf ln((1+n)/(1+df))+1;
    max_features keeps the highest-total-count terms (ties lexicographic)."""
    n = len(docs_tokens)
    vocab_count: dict[str, int] = {}
    doc_freq: dict[str, int] = {}
    for toks in docs_tokens:
        seen = set()
        for t in toks:
            vocab_count[t] = vocab_count.get(t, 0) + 1
            if t not in seen:
                seen.add(t)
                doc_freq[t] = doc_freq.get(t, 0) + 1
    terms = sorted(vocab_count)
    if max_features is not None and len(terms) > max_features:
        terms = sorted(terms, key=lambda t: (-vocab_count[t], t))[:max_features]
        terms = sorted(terms)
    idf = None
    if use_idf:
        df = np.array([doc_freq[t] for t in terms], dtype=np.float64)
        idf = np.log((1.0 + n) / (1.0 + df)) + 1.0
    return TfidfModel(terms, idf)


def fit_feature_vectorizers(mentions: list[str], contexts: list[str]) -> dict:
    """The reference's ``vectorizer()`` (``featureclustering/
    __main__.py:42-52``): char-bigram TF fit on mentions, word TF-IDF
    (max_features=10000) fit on contexts. Fit ONCE on a dev sample,
    broadcast, transform everywhere."""
    return {
        "bigram": fit_tfidf([_char_bigrams(m) for m in mentions],
                            use_idf=False, max_features=None),
        "context": fit_tfidf([_tokenize_words(c) for c in contexts],
                             use_idf=True, max_features=10000),
    }


def feature_scores(mentions, contexts, weights=(0.8, 0.2),
                   vectorizers: dict | None = None) -> np.ndarray:
    """0.8·bigram-TF linear kernel + 0.2·word-TF-IDF linear kernel
    (``pipeline/featureclustering/__main__.py:54-75``). With
    ``vectorizers`` (pre-fit, the reference's flow) only transform runs
    here; without, fit-on-the-group is a documented fallback."""
    if vectorizers is not None:
        M = vectorizers["bigram"].transform([_char_bigrams(m) for m in mentions])
        C = vectorizers["context"].transform([_tokenize_words(c) for c in contexts])
    else:
        M = fit_tfidf([_char_bigrams(m) for m in mentions], use_idf=False,
                      max_features=None).transform(
                          [_char_bigrams(m) for m in mentions])
        C = fit_tfidf([_tokenize_words(c) for c in contexts], use_idf=True,
                      max_features=10000).transform(
                          [_tokenize_words(c) for c in contexts])
    return weights[0] * (M @ M.T) + weights[1] * (C @ C.T)


def feature_clusters(
    ids, mentions, encodings: np.ndarray, context_left, context_right,
    threshold: float = FEATURE_THRESHOLD,
    vectorizers: dict | None = None,
) -> list[Cluster]:
    if len(mentions) == 0:
        return []
    contexts = [(l or "") + " " + (r or "") for l, r in zip(context_left, context_right)]
    scores = feature_scores(list(mentions), contexts, vectorizers=vectorizers)
    return _clusters_from_labels(
        greedy_labels(scores, threshold), ids, mentions, encodings
    )


# -------------------------------------------------------------- threestep

def _union_find_components(n: int, edges_i: np.ndarray, edges_j: np.ndarray) -> np.ndarray:
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges_i.tolist(), edges_j.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
    # relabel components 0..k-1 in first-appearance order
    _, labels = np.unique(roots, return_inverse=True)
    order = {}
    out = np.empty(n, dtype=np.int64)
    nxt = 0
    for i, r in enumerate(roots.tolist()):
        if r not in order:
            order[r] = nxt
            nxt += 1
        out[i] = order[r]
    return out


def single_linkage_components(dist: np.ndarray, threshold: float) -> np.ndarray:
    """Single-linkage agglomerative clustering cut at ``threshold`` ==
    connected components of {d(i,j) < threshold}."""
    n = dist.shape[0]
    ii, jj = np.where(np.triu(dist < threshold, k=1))
    return _union_find_components(n, ii, jj)


def cosine_distance_matrix(X: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    sim = (X / norms) @ (X / norms).T
    return 1.0 - sim


def _compare_encoding_gate(target: Cluster) -> bool:
    """``compare_ecoding`` (TimeEvolving.py:134-143), bug included: only
    pairs *within the first cluster* are checked; empty -> True."""
    if target.nelements == 0:
        return True
    E = np.stack(target.encodings)
    return bool(((E @ E.T) > THREESTEP_MERGE_DOT).any())


def threestep_clusters(ids, mentions, encodings: np.ndarray) -> list[Cluster]:
    n = len(mentions)
    if n == 0:
        return []
    mentions = list(mentions)
    ids = list(ids)

    # STEP 1 — surface blocking: single linkage over dam_lev_metric
    if n == 1:
        labels1 = np.zeros(1, dtype=np.int64)
    else:
        labels1 = single_linkage_components(dam_lev_matrix(mentions), THREESTEP_T1)
    blocks: dict[int, list[int]] = {}
    for i, lab in enumerate(labels1.tolist()):
        blocks.setdefault(lab, []).append(i)

    # STEP 2 — semantic sub-clustering within each block (cosine on
    # encodings, threshold 0.036)
    subclusters: list[Cluster] = []
    for lab in blocks:  # insertion order == first-appearance order
        rows = blocks[lab]
        E = encodings[rows]
        if len(rows) == 1:
            labels2 = np.zeros(1, dtype=np.int64)
        else:
            labels2 = single_linkage_components(
                cosine_distance_matrix(E), THREESTEP_T2
            )
        sub: dict[int, Cluster] = {}
        for k, lab2 in enumerate(labels2.tolist()):
            c = sub.get(lab2)
            if c is None:
                c = sub[lab2] = Cluster()
            i = rows[k]
            c.mention_ids.append(int(ids[i]))
            c.mentions.append(mentions[i])
            c.encodings.append(encodings[i])
        subclusters.extend(sub.values())

    # STEP 3 — merge sub-clusters by mean-encoding cosine (threshold
    # 0.05), gated by compare_ecoding
    means = np.stack([np.mean(np.stack(c.encodings), axis=0) for c in subclusters])
    if len(subclusters) == 1:
        labels3 = np.zeros(1, dtype=np.int64)
    else:
        labels3 = single_linkage_components(
            cosine_distance_matrix(means), THREESTEP_T3
        )
    final: dict[int, Cluster] = {int(k): Cluster() for k in set(labels3.tolist())}
    last_key = max(final.keys())
    for i, c in enumerate(subclusters):
        key = int(labels3[i])
        if _compare_encoding_gate(final[key]):
            t = final[key]
            t.mention_ids.extend(c.mention_ids)
            t.mentions.extend(c.mentions)
            t.encodings.extend(c.encodings)
        else:
            last_key += 1
            final[last_key] = c
    total = list(final.values())

    # breakup: clusters with >25 unique lowercased mentions re-cluster
    # by the surface metric
    broken: list[Cluster] = []
    keep: list[Cluster] = []
    for c in total:
        if len({m.lower() for m in c.mentions}) > THREESTEP_BREAKUP:
            labels = single_linkage_components(
                dam_lev_matrix(c.mentions), THREESTEP_T1
            )
            parts: dict[int, Cluster] = {}
            for k, lab in enumerate(labels.tolist()):
                p = parts.get(int(lab))
                if p is None:
                    p = parts[int(lab)] = Cluster()
                p.mention_ids.append(c.mention_ids[k])
                p.mentions.append(c.mentions[k])
                p.encodings.append(c.encodings[k])
            broken.extend(parts.values())
        else:
            keep.append(c)
    return keep + broken


def run_clusterer(
    strategy: str,
    ids,
    mentions,
    encodings: np.ndarray,
    context_left=None,
    context_right=None,
    vectorizers: dict | None = None,
) -> list[Cluster]:
    """Strategy dispatch (the reference's one-port-many-services switch,
    SURVEY.md §2.10). Input rows MUST already be sorted by mention_id —
    greedy propagation is order dependent. ``vectorizers``: pre-fit
    TF-IDF models for the feature strategy (ignored by the others)."""
    if strategy == "greedy":
        return greedy_clusters(ids, mentions, encodings)
    if strategy == "feature":
        return feature_clusters(
            ids, mentions, encodings, context_left, context_right,
            vectorizers=vectorizers,
        )
    if strategy == "threestep":
        return threestep_clusters(ids, mentions, encodings)
    raise ValueError(f"unknown clustering strategy: {strategy}")
