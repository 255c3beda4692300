"""explode_column / explode_tokens pinned against Python references —
null lists, empty lists, empty strings, multi-space runs, ordinality."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from raykg.ops.explode import explode_column, explode_tokens


def test_explode_column_with_nulls_and_empties():
    t = pa.table({
        "id": [10, 11, 12, 13],
        "xs": pa.array([[1, 2, 3], [], None, [7]],
                       type=pa.list_(pa.int64())),
    })
    out = (
        explode_column(rd.from_arrow(t), "xs", ["id"], out_col="x")
        .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True)
    )
    assert out["id"].tolist() == [10, 10, 10, 13]
    assert out["pos"].tolist() == [1, 2, 3, 1]
    assert out["x"].tolist() == [1, 2, 3, 7]


def test_explode_fixed_size_list():
    xs = pa.array([[1.0, 2.0], [3.0, 4.0]],
                  type=pa.list_(pa.float32(), 2))
    t = pa.table({"id": [0, 1], "xs": xs})
    out = explode_column(rd.from_arrow(t), "xs", ["id"],
                         out_col="x").to_pandas()
    assert len(out) == 4 and set(out["pos"]) == {1, 2}


def test_explode_tokens_position_semantics():
    # positions count EMPTY pieces (DuckDB string_split), drop after
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a  b", "", "x y z"]})
    out = (
        explode_tokens(rd.from_pandas(df), "doc_id", "text")
        .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    )
    # "a  b" splits to ["a", "", "b"] -> positions 1 and 3 survive
    assert out[out.doc_id == 1][["pos", "word"]].values.tolist() == \
        [[1, "a"], [3, "b"]]
    assert (out.doc_id == 2).sum() == 0
    assert out[out.doc_id == 3]["pos"].tolist() == [1, 2, 3]


def test_explode_streams_blockwise():
    n = 2000
    df = pd.DataFrame({"doc_id": np.arange(n),
                       "text": ["w0 w1 w2"] * n})
    out = explode_tokens(rd.from_pandas(df).repartition(8),
                         "doc_id", "text")
    assert out.count() == 3 * n
