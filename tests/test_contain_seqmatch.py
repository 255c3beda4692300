"""Containment similarity join (raykg/ops/dedup.py containment_join)
pinned vs brute force, and sequence pattern matching
(raykg/ops/funnel.py sequence_pattern_match) pinned vs a Python-re
reference — plus edge cases (gaps, nulls, no matches, asymmetry)."""

import re

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.ops.dedup import _shingles, containment_join
from raykg.ops.funnel import sequence_pattern_match


def _contain_brute(left, right, t=0.8, k=5):
    rows = []
    for li, lt in zip(left.doc_id, left.text):
        sl = set(_shingles(lt, k).tolist())
        for ri, rt_ in zip(right.doc_id, right.text):
            sr = set(_shingles(rt_, k).tolist())
            c = len(sl & sr) / len(sl) if sl else 1.0
            if c >= t:
                rows.append((li, ri, c))
    return (pd.DataFrame(rows, columns=["id_l", "id_r", "containment"])
            .sort_values(["id_l", "id_r"]).reset_index(drop=True))


def test_containment_join_matches_brute_force():
    rng = np.random.default_rng(13)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "fox",
             "golf", "hotel", "india", "juliet"]
    docs = [" ".join(rng.choice(words, 40)) for _ in range(60)]
    right = pd.DataFrame({"doc_id": np.arange(60), "text": docs})
    snips = [(1000 + i, docs[i][10:45]) for i in range(0, 60, 7)]
    snips.append((2000, "zulu yankee xray whiskey victor"))
    left = pd.DataFrame({"doc_id": [s[0] for s in snips],
                         "text": [s[1] for s in snips]})
    got = (containment_join(rd.from_pandas(left).repartition(3),
                            rd.from_pandas(right).repartition(4),
                            threshold=0.8, shingle_k=5)
           .to_pandas().sort_values(["id_l", "id_r"])
           .reset_index(drop=True))
    ref = _contain_brute(left, right)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    # every true substring snippet is contained at exactly 1.0
    sub_ids = {s[0] for s in snips[:-1]}
    hit = got[got.containment == 1.0]
    assert sub_ids <= set(hit.id_l.tolist())
    # the unrelated snippet never matches
    assert 2000 not in set(got.id_l.tolist())


def test_containment_join_is_asymmetric():
    # snippet ⊂ doc: containment(snip in doc) = 1, but swapping sides
    # (doc as left) fails the threshold — jaccard would miss BOTH
    left = pd.DataFrame({"doc_id": [1], "text": ["hello world"]})
    right = pd.DataFrame({"doc_id": [2], "text": [
        "hello world and a great deal of additional prose far "
        "beyond the snippet length"]})
    fwd = containment_join(rd.from_pandas(left), rd.from_pandas(right),
                           threshold=0.9).to_pandas()
    assert fwd.values.tolist() == [[1, 2, 1.0]]
    rev = containment_join(rd.from_pandas(right), rd.from_pandas(left),
                           threshold=0.9).to_pandas()
    assert len(rev) == 0


def test_containment_join_short_text_and_empty_result():
    left = pd.DataFrame({"doc_id": [1, 2], "text": ["abc", "zzz"]})
    right = pd.DataFrame({"doc_id": [3, 4], "text": ["abc", "defgh"]})
    got = (containment_join(rd.from_pandas(left), rd.from_pandas(right),
                            threshold=1.0, shingle_k=5)
           .to_pandas())
    # 'abc' < shingle_k hashes the whole text: exact match pairs (1,3)
    assert got[["id_l", "id_r"]].values.tolist() == [[1, 3]]


# --------------------------------------------- sequence pattern match
def _seq_ref(df, sym, pat):
    rows = []
    for k, g in df.sort_values(["ts", "id"]).groupby("k"):
        seq = "".join(sym.get(e, "-") for e in g["ev"])
        m = len(re.findall(pat, seq))
        if m:
            rows.append((k, len(g), m))
    return (pd.DataFrame(rows, columns=["k", "n_events", "n_matches"])
            .sort_values("k").reset_index(drop=True))


def test_sequence_pattern_match_reference_and_gaps():
    rng = np.random.default_rng(4)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 60, n),
        "ts": pd.to_datetime(rng.integers(0, 10 ** 6, n), unit="s"),
        "id": np.arange(n),
        "ev": rng.choice(["view", "click", "purchase", "error"], n),
    })
    sym = {"view": "v", "click": "c", "purchase": "p"}
    got = (sequence_pattern_match(
        rd.from_pandas(df).repartition(5), "k", "ts", "id", "ev",
        sym, "vc*p").to_pandas()
        .sort_values("k").reset_index(drop=True))
    ref = _seq_ref(df, sym, "vc*p")
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64"}), ref.astype({"k": "int64"}),
        check_dtype=False)
    # 'error' is unmapped: it must BREAK adjacency (gap semantics)
    df2 = pd.DataFrame({
        "k": [1, 1, 1], "ts": pd.to_datetime([1, 2, 3], unit="s"),
        "id": [1, 2, 3], "ev": ["view", "error", "purchase"]})
    none = sequence_pattern_match(
        rd.from_pandas(df2), "k", "ts", "id", "ev", sym,
        "vp").to_pandas()
    assert len(none) == 0
    hop = sequence_pattern_match(
        rd.from_pandas(df2), "k", "ts", "id", "ev", sym,
        "v[-]*p").to_pandas()
    assert hop["n_matches"].tolist() == [1]


def test_sequence_pattern_match_null_events_and_overlap():
    df = pd.DataFrame({
        "k": [7] * 5,
        "ts": pd.to_datetime([1, 2, 3, 4, 5], unit="s"),
        "id": range(5),
        "ev": pd.array(["view", None, "view", "purchase", "purchase"],
                       dtype="object"),
    })
    sym = {"view": "v", "purchase": "p"}
    # seq is "v-vpp": non-overlapping vp matches once; null is a gap
    got = sequence_pattern_match(
        rd.from_pandas(df), "k", "ts", "id", "ev", sym,
        "vp").to_pandas()
    assert got[["n_events", "n_matches"]].values.tolist() == [[5, 1]]


def test_containment_positional_filter_bounds_hot_shingle():
    """Planted boilerplate skew (the documented pathological case): 200
    right docs each share a small chunk of a corpus-common footer that
    also sits in every left doc's AllPairs prefix. Without the
    positional filter the hot footer tokens cross each left with their
    whole right posting list (thousands of candidates, all verifying
    false); with it, a hot token's right-suffix bound (|S_R| - pos)
    collapses below ceil(t*|S_L|) and the product never materializes —
    while true containments still surface through large-suffix
    postings."""
    import ray

    from raykg.ops.dedup import (_common_token_counts,
                                 _containment_candidates)

    rng = np.random.default_rng(41)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    footer = "the common footer text paste "          # 29 chars
    # lefts: footer-dominated (prefix must include footer shingles)
    left = pd.DataFrame({
        "doc_id": np.arange(10),
        "text": [footer + "".join(rng.choice(list(alpha), 3))
                 for _ in range(10)],
    })
    # planted skew: rights contain a 10-char footer chunk inside
    # otherwise-unique text -> hot posting lists, near-zero containment
    rights = []
    for i in range(200):
        body = "".join(rng.choice(list(alpha), 100))
        off = int(rng.integers(0, len(footer) - 10))
        chunk = footer[off:off + 10]
        pos = int(rng.integers(20, 80))
        rights.append(body[:pos] + chunk + body[pos:])
    # plus 5 true containers: full footer inside unique text
    for i in range(5):
        body = "".join(rng.choice(list(alpha), 100))
        rights.append(body[:50] + footer + body[50:])
    right = pd.DataFrame({"doc_id": np.arange(len(rights)),
                          "text": rights})

    def tag(df, side):
        return pd.DataFrame({
            "gid": df["doc_id"].to_numpy(np.int64) * 2 + side,
            "text": df["text"],
        })

    union = rd.from_pandas(tag(left, 0)).union(
        rd.from_pandas(tag(right, 1)))
    freq = _common_token_counts(union, "text", "gid", 5)
    cands = _containment_candidates(
        union, ray.put((freq[0], freq[1])), 5, 0.8).to_pandas()
    distinct = cands.drop_duplicates(["id_a", "id_b"])
    # candidate volume stays near output size: 10 lefts x 5 true
    # containers (+ boundary-window strays), nowhere near the
    # 10 x ~46-per-token posting product of the unfiltered join
    assert len(distinct) <= 150, len(distinct)

    # end-to-end: result still exactly matches brute force
    got = (containment_join(rd.from_pandas(left),
                            rd.from_pandas(right),
                            threshold=0.8, shingle_k=5)
           .to_pandas().sort_values(["id_l", "id_r"])
           .reset_index(drop=True))
    ref = _contain_brute(left, right, t=0.8)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    # all 10 lefts are contained in each of the 5 true containers
    assert len(ref) >= 50
