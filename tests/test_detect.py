import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from raykg.detect import detect_mentions, find_capitalized_spans

_RX = re.compile(r"\b[A-Z][A-Za-z0-9]*(?: [A-Z][A-Za-z0-9]*)*")


def _oracle(text: str):
    return [(m.start(), m.end()) for m in _RX.finditer(text)]


def test_known_spans():
    texts = [
        "the user asked about Zorblax Dynamics during the call",
        "we compared Falu Nedo with Tiko Ras before signing off",
        "nothing lowercase here",
        "",
        "Aaa Bbb starts the line",
        "ends with Ccc",
        "double  space Not Joined Across  Here",
        "A B C single letters chain",
        "num T3st Mix3d tokens",
    ]
    assert find_capitalized_spans(texts) == [_oracle(t) for t in texts]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="abcXY Z09",
            max_size=40,
        ),
        max_size=8,
    )
)
def test_matches_regex_oracle(texts):
    assert find_capitalized_spans(texts) == [_oracle(t) for t in texts]


def test_detect_mentions_stage():
    batch = pa.table(
        {
            "conv_id": ["conv_0000003", "conv_0000003", "conv_0000011"],
            "turn_idx": pa.array([0, 1, 5], type=pa.int32()),
            "text": [
                "we compared Falu Nedo with Tiko Ras before signing off",
                "no entities",
                "the user asked about Zorblax during the call",
            ],
        }
    )
    out = detect_mentions(batch)
    rows = out.to_pylist()
    assert [r["mention"] for r in rows] == ["Falu Nedo", "Tiko Ras", "Zorblax"]
    # deterministic local ids ordered by (conv, turn, start)
    assert [r["mention_id"] for r in rows] == [3000, 3001, 11050]
    r = rows[0]
    text = batch.column("text")[0].as_py()
    assert text[r["start_pos"] : r["end_pos"]] == r["mention"]
    assert r["context_left"] + r["mention"] + r["context_right"] == text


def test_gold_parity_on_fixture(small_fixture):
    """Detector finds exactly the fixture's gold mentions."""
    import pyarrow.parquet as pq

    import ray.data as rd

    gold = pq.read_table(f"{small_fixture}/gold.parquet").to_pandas()
    ds = rd.read_parquet(f"{small_fixture}/transcripts")
    detected = ds.map_batches(detect_mentions, batch_format="pyarrow").to_pandas()
    got = set(
        zip(detected.mention_id, detected.mention, detected.start_pos)
    )
    want = set(zip(gold.mention_id, gold.mention, gold.start_pos))
    assert got == want
