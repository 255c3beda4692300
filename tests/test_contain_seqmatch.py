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
