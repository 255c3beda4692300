"""Fourteenth-block operators: global dictionary encoding
(raykg/ops/dictenc.py), per-vertex local clustering (raykg/ops/cc.py
local_clustering), regex segmentation explode (chunk.split_segments),
k-anonymity suppression (validate.suppress_small_groups) and
string→timestamp parsing (resample.parse_timestamps) — pinned against
brute-force references, partition invariance, and edge cases."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raykg.ops.cc import local_clustering
from raykg.ops.chunk import split_segments
from raykg.ops.dictenc import build_dictionary, dict_encode
from raykg.ops.resample import parse_timestamps
from raykg.ops.validate import k_anonymity, suppress_small_groups


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ---------------------------------------------------------------- dictenc

def test_dict_encode_matches_sorted_factorize():
    rng = np.random.default_rng(7)
    vals = np.array([f"v{int(i):03d}" for i in rng.integers(0, 60, 500)])
    df = pd.DataFrame({"id": np.arange(500, dtype=np.int64), "s": vals})
    # reference: dense code = position in the sorted distinct values
    ref_codes = {v: i for i, v in enumerate(sorted(set(vals)))}
    for parts in (1, 7):
        out = dict_encode(rd.from_pandas(df).repartition(parts), "s",
                          out_col="c", keep_cols=["id"],
                          n_ranges=5).to_pandas()
        out = out.sort_values("id").reset_index(drop=True)
        assert len(out) == 500
        assert (out["c"].to_numpy()
                == np.array([ref_codes[v] for v in vals])).all()


def test_build_dictionary_dense_and_complete():
    vals = ["b", "a", "c", "a", "b", "zz", "a"]
    d = build_dictionary(
        rd.from_pandas(pd.DataFrame({"s": vals})).repartition(3),
        "s", n_ranges=3).to_pandas().sort_values("code")
    assert d["s"].tolist() == ["a", "b", "c", "zz"]
    assert d["code"].tolist() == [0, 1, 2, 3]


def test_dict_encode_null_values_get_null_code():
    df = pd.DataFrame({"id": [1, 2, 3],
                       "s": pd.array(["x", None, "y"], dtype=object)})
    out = dict_encode(rd.from_pandas(df), "s", out_col="c",
                      keep_cols=["id"]).to_pandas().sort_values("id")
    codes = out["c"].tolist()
    assert codes[0] == 0 and codes[2] == 1
    assert pd.isna(codes[1])


# ------------------------------------------------------- local clustering

def _brute_clustering(edges):
    """Dense-adjacency reference: tri(v) = diag(A^3)/2, deg = row sum."""
    n = int(edges.max()) + 1
    A = np.zeros((n, n), dtype=np.int64)
    for a, b in edges:
        if a != b:
            A[a, b] = A[b, a] = 1
    deg = A.sum(axis=1)
    tri = np.diag(A @ A @ A) // 2
    rows = []
    for v in range(n):
        if deg[v] == 0:
            continue  # isolated vertices are absent from the edge set
        denom = deg[v] * (deg[v] - 1)
        coeff = (2.0 * tri[v]) / denom if denom > 0 else 0.0
        rows.append((v, int(deg[v]), int(tri[v]), coeff))
    return pd.DataFrame(rows, columns=["vertex", "deg", "tri", "coeff"])


def test_local_clustering_matches_bruteforce():
    rng = np.random.default_rng(11)
    edges = rng.integers(0, 30, size=(150, 2))
    df = pd.DataFrame({"src": edges[:, 0], "dst": edges[:, 1]})
    want = _brute_clustering(edges)
    for parts in (1, 5):
        got = (local_clustering(rd.from_pandas(df).repartition(parts),
                                coarse=8)
               .to_pandas().sort_values("vertex").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_local_clustering_triangle_and_hub():
    # one triangle {0,1,2} plus a hub 0 connected to leaves 3..6
    df = pd.DataFrame({"src": [0, 1, 2, 0, 0, 0, 0],
                       "dst": [1, 2, 0, 3, 4, 5, 6]})
    got = (local_clustering(rd.from_pandas(df), coarse=4)
           .to_pandas().set_index("vertex"))
    assert got.loc[0, "tri"] == 1 and got.loc[0, "deg"] == 6
    assert got.loc[0, "coeff"] == pytest.approx(2.0 / (6 * 5))
    assert got.loc[1, "coeff"] == 1.0 and got.loc[2, "coeff"] == 1.0
    assert got.loc[3, "tri"] == 0 and got.loc[3, "coeff"] == 0.0


# ---------------------------------------------------------- split_segments

def test_split_segments_matches_re_split():
    texts = ["aa X bb X cc", "X starts", "ends X", "", "no delim",
             "XXdoubleX tail"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    got = (split_segments(rd.from_pandas(df).repartition(2), "X")
           .to_pandas().sort_values(["doc_id", "seg_idx"])
           .reset_index(drop=True))
    rows = []
    for i, t in enumerate(texts):
        for j, seg in enumerate(re.split("X", t)):
            if seg != "":
                rows.append((i, j, seg))
    want = pd.DataFrame(rows, columns=["doc_id", "seg_idx", "segment"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_split_segments_keep_empty_slots():
    df = pd.DataFrame({"doc_id": [0], "text": ["a--b"]})
    got = split_segments(rd.from_pandas(df), "-",
                         drop_empty=False).to_pandas()
    assert got["segment"].tolist() == ["a", "", "b"]
    assert got["seg_idx"].tolist() == [0, 1, 2]


# ------------------------------------------------------------- suppression

def test_suppress_small_groups_enforces_k():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "id": np.arange(300, dtype=np.int64),
        "g": rng.integers(0, 40, 300),  # some groups < 5 members
    })
    ds = rd.from_pandas(df).repartition(4)
    out = suppress_small_groups(ds, ["g"], k=5).to_pandas()
    sizes = out.groupby("g").size()
    assert (sizes >= 5).all()
    # survivors = exactly the rows of groups with >= 5 members
    want_ids = set(df[df.groupby("g")["id"].transform("size") >= 5]["id"])
    assert set(out["id"]) == want_ids
    # audit agrees: no violating combos remain
    remaining = k_anonymity(rd.from_pandas(out), ["g"], k=5).to_pandas()
    assert len(remaining) == 0


def test_suppress_small_groups_null_combo():
    df = pd.DataFrame({"id": [1, 2, 3, 4],
                       "g": pd.array(["a", "a", None, None],
                                     dtype=object)})
    out = suppress_small_groups(rd.from_pandas(df), ["g"],
                                k=2).to_pandas()
    assert set(out["id"]) == {1, 2, 3, 4}  # both combos have 2 rows
    out1 = suppress_small_groups(rd.from_pandas(df), ["g"],
                                 k=3).to_pandas()
    assert len(out1) == 0


# -------------------------------------------------------- parse_timestamps

def test_parse_timestamps_roundtrip():
    ts = pd.to_datetime(["2024-01-01 00:00:07", "2025-12-31 23:59:59"])
    df = pd.DataFrame({"id": [1, 2],
                       "raw": ts.strftime("%Y-%m-%d %H:%M:%S")})
    out = parse_timestamps(rd.from_pandas(df), "raw").to_pandas()
    assert (pd.to_datetime(out["ts_parsed"]).to_numpy()
            == ts.to_numpy()).all()


def test_parse_timestamps_bad_string_raises():
    df = pd.DataFrame({"id": [1], "raw": ["not-a-date"]})
    with pytest.raises(Exception):
        parse_timestamps(rd.from_pandas(df), "raw").materialize()


def test_suppress_small_groups_nullable_int_quasi():
    # review fix: pandas astype(str) widened nullable-int blocks to
    # float ('5.0' vs '5'), splitting a combo's hash across blocks
    df = pd.DataFrame({
        "id": np.arange(8, dtype=np.int64),
        "g": pd.array([5, 5, 5, 5, None, None, 7, 7],
                      dtype="Int64"),
    })
    # blocks split so one g=5 block has a null and another does not
    ds = rd.from_pandas(df).repartition(4)
    out = suppress_small_groups(ds, ["g"], k=3).to_pandas()
    assert set(out["id"]) == {0, 1, 2, 3}  # the 4-member g=5 combo


def test_dict_encode_shuffle_fallback_matches_broadcast():
    # review fix: the hash_join fallback lacked keep_cols types
    df = pd.DataFrame({"id": np.arange(100, dtype=np.int64),
                       "s": [f"v{i % 9}" for i in range(100)]})
    ds = rd.from_pandas(df).repartition(3)
    bc = dict_encode(ds, "s", out_col="c", keep_cols=["id"]).to_pandas()
    from raykg.ops import joins as _j
    old = _j.BROADCAST_JOIN_BYTES
    _j.BROADCAST_JOIN_BYTES = 0  # force the shuffle plan
    try:
        sh = dict_encode(rd.from_pandas(df).repartition(3), "s",
                         out_col="c", keep_cols=["id"]).to_pandas()
    finally:
        _j.BROADCAST_JOIN_BYTES = old
    pd.testing.assert_frame_equal(
        bc.sort_values("id").reset_index(drop=True)[["id", "c"]],
        sh.sort_values("id").reset_index(drop=True)[["id", "c"]],
        check_dtype=False)
