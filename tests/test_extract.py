"""Dictionary entity spotting and pattern triple extraction
(raykg/ops/extract.py) — pinned counts/matches on hand-built fixtures,
regex-semantics edge cases (word boundaries, non-overlap, escaping),
and partition invariance."""

import pandas as pd
import ray.data as rd

from raykg.ops.extract import gazetteer_counts, pattern_triples


def _docs(rows, parts=3):
    return rd.from_pandas(pd.DataFrame(
        rows, columns=["doc_id", "text"])).repartition(parts)


def test_gazetteer_counts_pinned():
    ds = _docs([
        (1, "red widget sales of the red widget line"),
        (2, "a redwidget is not a red widget nor red widgets"),
        (3, "nothing here"),
        (4, None),
    ])
    out = (gazetteer_counts(ds, ["red widget", "widget line"])
           .to_pandas().sort_values(["doc_id", "surface"])
           .reset_index(drop=True))
    # doc 1: "red widget" twice, "widget line" once (overlap with the
    # second "red widget" allowed — different surfaces count
    # independently); doc 2: word boundaries exclude "redwidget" and
    # "red widgets" has no \bwidget\b ... actually "widgets" fails \b
    # after "widget" only if not a word char follows — 's' is one, so
    # only the standalone "red widget" counts.
    want = pd.DataFrame({
        "doc_id": [1, 1, 2],
        "surface": ["red widget", "widget line", "red widget"],
        "n_matches": [2, 1, 1],
    })
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_gazetteer_same_surface_non_overlapping():
    ds = _docs([(1, "a a a a a")], parts=1)
    out = gazetteer_counts(ds, ["a a"]).to_pandas()
    # non-overlapping within one surface: positions 0-2, 4-6 -> 2
    assert out["n_matches"].tolist() == [2]


def test_gazetteer_escapes_metachars():
    ds = _docs([(1, "price is 3.50 today, not 3x50")], parts=1)
    out = gazetteer_counts(ds, ["3.50"]).to_pandas()
    # "." must be literal: "3x50" must NOT match
    assert out["n_matches"].tolist() == [1]


def test_pattern_triples_pinned_and_non_overlapping():
    pat = r"\b(cat|dog) (likes|eats) (fish|mice)\b"
    ds = _docs([
        (1, "the cat likes fish and the dog eats mice"),
        (2, "cat likes fish cat likes fish"),
        (3, "catx likes fish"),  # boundary: no subj match
        (4, None),
    ])
    out = (pattern_triples(ds, pat).to_pandas()
           .sort_values(["doc_id", "subj"]).reset_index(drop=True))
    want = pd.DataFrame({
        "doc_id": [1, 1, 2, 2],
        "subj": ["cat", "dog", "cat", "cat"],
        "pred": ["likes", "eats", "likes", "likes"],
        "obj": ["fish", "mice", "fish", "fish"],
    })
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_pattern_triples_partition_invariance():
    pat = r"\b(a|b) (x) (c|d)\b"
    rows = [(i, "a x c b x d a x d") for i in range(20)]
    a = (pattern_triples(_docs(rows, 1), pat).to_pandas()
         .sort_values(["doc_id", "subj", "obj"]).reset_index(drop=True))
    b = (pattern_triples(_docs(rows, 7), pat).to_pandas()
         .sort_values(["doc_id", "subj", "obj"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 60
