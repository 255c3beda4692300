"""duplicate_span_stats pinned against a brute-force Python reference
on corpora with planted duplicated passages; filter semantics."""

import numpy as np
import pandas as pd

import ray.data as rd

from raykg.ops.spandedup import duplicate_span_stats, filter_span_duplicates


def _brute(docs, width, min_count=2):
    from collections import Counter

    grams = {}
    for did, text in docs.items():
        ws = text.lower().split()
        grams[did] = [" ".join(ws[i:i + width])
                      for i in range(len(ws) - width + 1)]
    total = Counter(g for gs in grams.values() for g in gs)
    return {
        did: (len(gs), sum(1 for g in gs if total[g] >= min_count))
        for did, gs in grams.items() if gs
    }


def _corpus(seed=3, n=60):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(150)]
    passage = "the quick brown fox jumps over the lazy dog again and again"
    docs = {}
    for d in range(n):
        words = list(rng.choice(vocab, rng.integers(4, 40)))
        if d % 5 == 0:  # plant a shared passage mid-document
            k = rng.integers(0, max(len(words) - 1, 1))
            words = words[:k] + passage.split() + words[k:]
        if d == 7:      # self-repetition inside one doc
            words = words + words
        docs[d] = " ".join(words)
    return docs


def test_span_stats_match_brute_force():
    docs = _corpus()
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = (
        duplicate_span_stats(rd.from_pandas(df).repartition(6),
                             width=5, coarse=16)
        .to_pandas().set_index("doc_id").sort_index()
    )
    ref = _brute(docs, 5)
    assert set(got.index) == set(ref)
    for did, (ns, nd) in ref.items():
        assert got.loc[did, "n_spans"] == ns, did
        assert got.loc[did, "n_dup_spans"] == nd, did
    # planted docs really do register duplication
    assert got.loc[0, "n_dup_spans"] > 0 and got.loc[7, "n_dup_spans"] > 0


def test_filter_span_duplicates_drops_heavy_docs():
    docs = _corpus(seed=11)
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    kept = (
        filter_span_duplicates(rd.from_pandas(df).repartition(4),
                               max_dup_fraction=0.8, width=5, coarse=16)
        .to_pandas()
    )
    ref = _brute(docs, 5)
    want_drop = {d for d, (ns, nd) in ref.items() if nd / ns > 0.8}
    assert set(df.doc_id) - set(kept.doc_id) == want_drop
    assert 7 in want_drop  # the fully self-repeated doc goes
