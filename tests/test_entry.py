"""Mini driver harness: runs every queries() entry at sf0.001 and
compares the SQL-checked ones against oracle_sql() via DuckDB exactly
the way the real driver does (column names sorted, order-insensitive
values)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(obj):
    import pyarrow as pa

    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_vs_oracle(name):
    q = entrymod.queries()[name]
    # kg_triples_summary's oracle reads the flagship's written parquet
    # at the driver's correctness scale (a fixed /tmp path keyed by
    # sf0.01) — run the Ray side at that same scale
    sf = "/root/testdata/sf0.01" if name == "kg_triples_summary" else SF_DIR
    got = _normalize(_to_pandas(q(sf)))
    with _duck() as con:
        want = _normalize(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize(
    "name",
    [n for n in sorted(entrymod.queries()) if n not in entrymod.oracle_sql()],
)
def test_rows_only_queries_run(name):
    q = entrymod.queries()[name]
    df = _to_pandas(q(SF_DIR))
    assert df is not None
    # pair-mining queries may legitimately find nothing at tiny scale
    # (an empty Ray dataset loses its schema on to_pandas)
    if not name.endswith("_pairs"):
        assert len(df.columns) > 0 and len(df) > 0


def test_entry_smoke():
    df = _to_pandas(entrymod.entry())
    assert len(df) > 0
    assert set(df.columns) == {"subj", "pred", "obj", "epoch", "conv_id"}


def test_sharded_query_matches_unsharded():
    """Driver-parity evidence: the kb_shards=4 + distributed-RW run
    emits the exact triple set of the default path."""
    a = _to_pandas(entrymod.queries()["kg_triples"](SF_DIR))
    b = _to_pandas(entrymod.queries()["kg_triples_sharded"](SF_DIR))
    cols = ["subj", "pred", "obj", "epoch", "conv_id"]
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
