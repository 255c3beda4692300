"""connected_components pinned against a union-find reference on
random graphs, cliques, and a path (diameter stress); composition with
MinHash dup pairs into dup groups."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raykg.ops.cc import connected_components


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min id of the component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _check(edges, coarse=8, max_rounds=25):
    nodes = sorted({x for e in edges for x in e})
    df = pd.DataFrame(edges, columns=["id_a", "id_b"])
    got = (
        connected_components(rd.from_pandas(df).repartition(4),
                             coarse=coarse, max_rounds=max_rounds)
        .to_pandas().set_index("node")["component"].to_dict()
    )
    assert got == _union_find(edges, nodes)


def test_random_graph_matches_union_find():
    rng = np.random.default_rng(13)
    edges = [tuple(sorted(rng.integers(0, 60, 2))) for _ in range(80)]
    _check(edges)


def test_cliques_and_self_loops():
    edges = ([(i, j) for i in range(5) for j in range(i, 5)]
             + [(10, 11), (11, 12), (20, 20)])
    _check(edges)


def test_path_graph_needs_diameter_rounds():
    edges = [(i, i + 1) for i in range(12)]
    _check(edges, max_rounds=20)
    with pytest.raises(RuntimeError):
        _check(edges, max_rounds=2)


def test_minhash_pairs_to_dup_groups():
    from raykg.ops.dedup import minhash_lsh_pairs

    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(300)]
    base = " ".join(rng.choice(vocab, 60))
    docs = {i: " ".join(rng.choice(vocab, 60)) for i in range(20)}
    for i in (3, 7, 12):  # a 3-doc near-dup family
        words = base.split()
        words[i] = "tweak"
        docs[i] = " ".join(words)
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    pairs = minhash_lsh_pairs(rd.from_pandas(df), threshold=0.7).to_pandas()
    comp = (
        connected_components(
            rd.from_pandas(pairs[["id_a", "id_b"]]), coarse=4)
        .to_pandas()
    )
    fam = comp[comp.node.isin([3, 7, 12])]
    assert len(fam) == 3 and fam["component"].nunique() == 1
    assert fam["component"].iloc[0] == 3


def test_near_dedup_keep_canonical():
    from raykg.ops.cc import near_dedup_keep_canonical

    docs = pd.DataFrame({"doc_id": range(10),
                         "text": [f"d{i}" for i in range(10)]})
    pairs = pd.DataFrame({"id_a": [1, 3, 8], "id_b": [3, 5, 9]})
    kept = near_dedup_keep_canonical(
        rd.from_pandas(docs), rd.from_pandas(pairs), coarse=4
    ).to_pandas()
    # families {1,3,5} -> keep 1; {8,9} -> keep 8; others untouched
    assert sorted(kept["doc_id"]) == [0, 1, 2, 4, 6, 7, 8]


def test_near_dedup_keep_best_by_score_with_ties():
    from raykg.ops.cc import near_dedup_keep_best

    docs = pd.DataFrame({
        "doc_id": range(10),
        "text": [f"d{i}" for i in range(10)],
        # family {1,3,5}: 5 has the top score -> keep 5
        # family {8,9}: tied scores -> keep min id 8
        "score": [0, 2, 0, 4, 0, 9, 0, 0, 7, 7],
    })
    pairs = pd.DataFrame({"id_a": [1, 3, 8], "id_b": [3, 5, 9]})
    kept = near_dedup_keep_best(
        rd.from_pandas(docs), rd.from_pandas(pairs),
        score_col="score", coarse=4,
    ).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 2, 4, 5, 6, 7, 8]


def test_near_dedup_keep_best_no_pairs_keeps_all():
    from raykg.ops.cc import near_dedup_keep_best

    docs = pd.DataFrame({"doc_id": range(5),
                         "text": list("abcde"), "score": range(5)})
    pairs = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64")})
    kept = near_dedup_keep_best(
        rd.from_pandas(docs), rd.from_pandas(pairs),
        score_col="score", coarse=4,
    ).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1, 2, 3, 4]
