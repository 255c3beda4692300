"""Line-level (CCNet-style) dedup: boilerplate removal semantics,
broadcast/shuffle path parity, edge lines."""

import numpy as np
import pandas as pd

import ray.data as rd

from raykg.ops.linededup import line_dedup


def _docs():
    boiler = "COOKIE NOTICE accept all"
    footer = "copyright 2026 example corp"
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            f"{boiler}\nunique alpha text\n{footer}",
            f"{boiler}\nanother body line\n{footer}",
            f"{boiler}\nthird document here",
            "standalone doc\n\nwith an empty line",
            "",  # empty doc: one empty line, never removed
        ],
    })


def _expect():
    # boiler in 3 docs, footer in 2 -> both removed everywhere
    return {
        1: ("unique alpha text", 3, 2),
        2: ("another body line", 3, 2),
        3: ("third document here", 2, 1),
        4: ("standalone doc\n\nwith an empty line", 3, 0),
        5: ("", 1, 0),
    }


def _run(**kw):
    ds = rd.from_pandas(_docs()).repartition(3)
    out = line_dedup(ds, min_docs=2, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_line_dedup_broadcast_path():
    out = _run()
    exp = _expect()
    for _, r in out.iterrows():
        text, nl, nr = exp[int(r.doc_id)]
        assert r.text_clean == text
        assert int(r.n_lines) == nl
        assert int(r.n_removed) == nr


def test_line_dedup_shuffle_path_identical():
    a = _run()
    b = _run(broadcast_lines=0)  # force the tagged-union shuffle path
    pd.testing.assert_frame_equal(a, b)


def test_line_dedup_min_docs_threshold():
    # min_docs=3: only the 3-doc boilerplate goes; the 2-doc footer stays
    ds = rd.from_pandas(_docs()).repartition(2)
    out = (line_dedup(ds, min_docs=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.loc[out.doc_id == 1, "text_clean"].iloc[0] == (
        "unique alpha text\ncopyright 2026 example corp")
    assert int(out.loc[out.doc_id == 3, "n_removed"].iloc[0]) == 1


def test_line_dedup_normalization_and_within_doc():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "Shared Line\nself repeat\nself repeat",
            "  shared line  \nbody two",
            "only here",
        ],
    })
    out = (line_dedup(rd.from_pandas(df).repartition(2), min_docs=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # case/whitespace-normalized match across docs 1 and 2
    assert out.loc[0, "text_clean"] == "self repeat\nself repeat"
    assert out.loc[1, "text_clean"] == "body two"
    # within-one-doc repetition does NOT count as multi-doc
    assert int(out.loc[0, "n_removed"]) == 1
    assert out.loc[2, "text_clean"] == "only here"
