"""Web-corpus curation ops: HTML strip + C4-style line filter
(raykg.ops.curate). The strip chain is pinned bit-equal to the
generated DuckDB oracle expression on crafted edge cases; the C4
filter is pinned on hand-checked inputs and partition invariance."""

import duckdb
import pyarrow as pa
import pytest

import ray.data as rd

from raykg.ops.curate import (
    C4_MIN_LINES,
    C4_MIN_WORDS_PER_LINE,
    _c4_batch,
    c4_filter,
    html_strip_sql_expr,
    strip_html,
    strip_html_column,
)

HTML_CASES = [
    # script/style bodies removed wholesale, incl. braces and "<" inside
    '<html><head><style>p{color:red}\n.x{a:1}</style></head><body>'
    '<h1>Title</h1><p>Hello &amp; welcome, it&#39;s 5 &lt; 6.</p>'
    '<script type="text/javascript">var x=1; if(x<2){x=3;}</script>'
    '<p>Second   paragraph&nbsp;here.</p></body></html>',
    "no tags at all",
    "",
    "&amp;lt; decodes to a literal entity",  # single-pass unescape
    "<p>unclosed tag <b>bold",
    "<script>first</script>between<script>second</script>",  # non-greedy
    "white\t\n  space\r\n runs",
    "<SCRIPT>upper not matched</SCRIPT> stays",  # RE2 is case-sensitive
]


def test_strip_html_matches_duckdb_expression():
    got = strip_html_column(pa.array(HTML_CASES)).to_pylist()
    con = duckdb.connect()
    expr = html_strip_sql_expr("t")
    want = [
        con.sql(f"SELECT {expr} FROM (SELECT ? AS t)", params=[h]).fetchone()[0]
        for h in HTML_CASES
    ]
    assert got == want
    # and the semantics we promise
    assert got[0] == "Title Hello & welcome, it's 5 < 6. Second paragraph here."
    assert got[5] == "between"


def test_strip_html_dataset_passthrough():
    ds = rd.from_items([{"doc_id": i, "text": h}
                        for i, h in enumerate(HTML_CASES)])
    out = strip_html(ds).to_pandas().sort_values("doc_id")
    assert list(out.columns) == ["doc_id", "text", "text_clean"]
    assert out["text_clean"].iloc[1] == "no tags at all"


C4_DOCS = [
    # 3 good lines survive; "short." (<3 words) and "no punct" dropped
    "Good line with words.\nshort.\nAnother proper line here!\n"
    "Final good line yes.\nno punct",
    # only one surviving line -> doc dropped
    "Only one good line here.\nbad\nbad",
    # brace poisons the whole doc
    "This has a brace {.\nGood line number two.\nGood line three ok.\n"
    "Good line number four.",
    # lorem ipsum poisons (case-insensitive)
    "Lorem IPSUM filler text.\nGood line number two.\nGood line three ok.\n"
    "Good line number four.",
    # leading/trailing spaces trimmed before the rules
    "  Trimmed line ends well.  \nSecond one is fine too.\n"
    "Third keeps it alive.\n",
    "",  # empty text -> dropped
]


def test_c4_batch_semantics():
    t = pa.table({"doc_id": list(range(len(C4_DOCS))), "text": C4_DOCS})
    out = _c4_batch(t, "text", C4_MIN_WORDS_PER_LINE, C4_MIN_LINES)
    df = out.to_pandas().set_index("doc_id")
    assert sorted(df.index) == [0, 4]
    assert df.loc[0, "text"] == ("Good line with words.\n"
                                 "Another proper line here!\n"
                                 "Final good line yes.")
    assert df.loc[0, "n_lines_kept"] == 3
    assert df.loc[0, "n_lines_total"] == 5
    assert df.loc[4, "n_lines_kept"] == 3
    assert df.loc[4, "n_lines_total"] == 4


@pytest.mark.parametrize("nparts", [1, 4])
def test_c4_filter_partition_invariant(nparts):
    rows = [{"doc_id": i, "text": C4_DOCS[i % len(C4_DOCS)]}
            for i in range(24)]
    ds = rd.from_items(rows).repartition(nparts)
    out = c4_filter(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert sorted(set(out["doc_id"] % len(C4_DOCS))) == [0, 4]
    assert len(out) == 24 // len(C4_DOCS) * 2  # ids ≡ 0,4 mod 6 -> 8


def test_blocklist_filter():
    import pandas as pd
    import ray.data as rd

    from raykg.ops.curate import blocklist_filter

    df = pd.DataFrame({
        "doc_id": range(6),
        "text": [
            "clean text here",
            "contains a BadWord inside",          # case-insensitive hit
            "badwordish is not a whole-word hit",
            "other term appears",
            "badword at start",
            "",
        ],
    })
    ds = rd.from_pandas(df).repartition(2)
    kept = blocklist_filter(ds, ["badword", "term"]).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 2, 5]
    hits = blocklist_filter(ds, ["badword", "term"],
                            invert=True).to_pandas()
    assert sorted(hits["doc_id"]) == [1, 3, 4]
    # substring mode catches the embedded form too
    sub = blocklist_filter(ds, ["badword"], whole_word=False).to_pandas()
    assert sorted(sub["doc_id"]) == [0, 3, 5]
