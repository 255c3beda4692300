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


# ---------------------------------------------------------------- remove mode

def _remove_reference(texts, ids, width, min_count=2):
    """Brute-force ExactSubstr remove-mode on word spans."""
    words = {i: t.lower().split() for i, t in zip(ids, texts)}
    occ = {}
    for i in ids:
        ws = words[i]
        for s in range(len(ws) - width + 1):
            occ.setdefault(tuple(ws[s:s + width]), []).append((i, s))
    removals = {}
    for span, places in occ.items():
        if len(places) >= min_count:
            for (d, s) in sorted(places)[1:]:
                removals.setdefault(d, []).append(s)
    out = {}
    for i in ids:
        ws = words[i]
        covered = [False] * len(ws)
        for s in removals.get(i, []):
            for p in range(s, min(s + width, len(ws))):
                covered[p] = True
        out[i] = (" ".join(w for w, c in zip(ws, covered) if not c),
                  len(ws), sum(covered))
    return out


def test_remove_duplicate_spans_matches_bruteforce():
    import ray.data as rd

    from raykg.ops.spandedup import remove_duplicate_spans

    boiler = "this footer text is repeated verbatim in every single page"
    texts = [
        f"unique article {i} body words alpha{i} beta{i} gamma{i} "
        f"delta{i} epsilon{i} zeta{i} eta{i} theta{i} " + boiler
        for i in range(6)
    ]
    texts.append("short doc")                        # < width words
    texts.append(boiler + " " + boiler)              # self-repetition
    ids = list(range(len(texts)))
    want = _remove_reference(texts, ids, width=5)

    for parts in (1, 4):
        ds = rd.from_pandas(
            __import__("pandas").DataFrame({"doc_id": ids, "text": texts})
        ).repartition(parts)
        got = remove_duplicate_spans(ds, width=5).to_pandas()
        got = got.set_index("doc_id").sort_index()
        assert len(got) == len(ids)
        for i in ids:
            w_txt, w_n, w_rm = want[i]
            assert got.loc[i, "text_clean"] == w_txt, (parts, i)
            assert got.loc[i, "n_words"] == w_n
            assert got.loc[i, "n_removed"] == w_rm
    # the canonical occurrence survives exactly once corpus-wide
    joined = " ".join(got["text_clean"])
    assert joined.count(boiler) == 1
