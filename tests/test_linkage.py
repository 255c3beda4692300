"""Fellegi-Sunter record-linkage scoring (raykg/ops/linkage.py) —
pinned against a brute-force pandas reference, partition invariance,
degenerate-field guard, hot-block guard."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raykg.ops.linkage import fs_link_scores


def _bruteforce(df, block, fields, m_probs):
    n = len(df)
    den = n * n - n
    wa, wd = [], []
    for f, m in zip(fields, m_probs):
        vc = df[f].astype(str).value_counts()
        num = int((vc.to_numpy(np.int64) ** 2).sum()) - n
        u = num / float(den)
        wa.append(math.log(m / u))
        wd.append(math.log((1.0 - m) / (1.0 - u)))
    rows = []
    for _, g in df.groupby(block):
        g = g.sort_values("id")
        recs = g.to_dict("records")
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                s = 0.0
                for k, f in enumerate(fields):
                    s += wa[k] if recs[i][f] == recs[j][f] else wd[k]
                rows.append((recs[i]["id"], recs[j]["id"], s))
    return (pd.DataFrame(rows, columns=["id_a", "id_b", "score"])
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def _world(n=300, seed=13):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "blk": rng.integers(0, 8, n),
        "f0": rng.choice(["a", "b", "c"], n),
        "f1": rng.integers(0, 12, n),
    })


def test_fs_scores_match_bruteforce_and_partitioning():
    df = _world()
    want = _bruteforce(df, "blk", ["f0", "f1"], [0.9, 0.75])
    for parts in (1, 7):
        got = (fs_link_scores(rd.from_pandas(df).repartition(parts),
                              block_col="blk", fields=["f0", "f1"],
                              m_probs=[0.9, 0.75], coarse=8)
               .to_pandas().sort_values(["id_a", "id_b"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)


def test_fs_degenerate_field_raises():
    df = _world()
    df["same"] = 1  # always agrees -> u_num == u_den
    with pytest.raises(ValueError, match="always agrees"):
        fs_link_scores(rd.from_pandas(df), block_col="blk",
                       fields=["same"], m_probs=[0.9]).to_pandas()


def test_fs_max_block_guard():
    # an oversize block (B > max_block) is dropped ENTIRELY (the
    # cooccur max_basket convention); small blocks are unaffected —
    # NOT a sort-order-dependent partial lag subset
    df = _world(64)
    df.loc[:59, "blk"] = 0          # hot block: 60 rows
    df.loc[60:, "blk"] = 1          # small block: 4 rows
    got = fs_link_scores(rd.from_pandas(df), block_col="blk",
                         fields=["f0", "f1"], m_probs=[0.9, 0.75],
                         max_block=5).to_pandas()
    # only the 4-row block's pairs survive
    assert len(got) == 4 * 3 // 2
    full = fs_link_scores(rd.from_pandas(df), block_col="blk",
                          fields=["f0", "f1"], m_probs=[0.9, 0.75]
                          ).to_pandas()
    small = (full.merge(df[["id", "blk"]], left_on="id_a",
                        right_on="id")
             .query("blk == 1")[["id_a", "id_b", "score"]])
    pd.testing.assert_frame_equal(
        got.sort_values(["id_a", "id_b"]).reset_index(drop=True),
        small.sort_values(["id_a", "id_b"]).reset_index(drop=True))


def test_fs_scores_rank_surface_duplicates_highest():
    # planted near-duplicates (all fields agree) must outscore pairs
    # that disagree everywhere
    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "blk": [0, 0, 0, 0],
        "f0": ["x", "x", "y", "z"],
        "f1": [5, 5, 6, 7],
    })
    got = fs_link_scores(rd.from_pandas(df), block_col="blk",
                         fields=["f0", "f1"], m_probs=[0.9, 0.8],
                         coarse=4).to_pandas()
    top = got.sort_values("score", ascending=False).iloc[0]
    assert (top.id_a, top.id_b) == (1, 2)


def test_fs_all_blocks_oversize_raises():
    # the drop must be SURFACED: when EVERY block exceeds max_block
    # the query would silently return zero rows (nation-blocked
    # customers beyond ~sf1.7) — fs_link_scores raises instead
    df = _world(64)
    df["blk"] = 0  # a single 64-row block
    with pytest.raises(ValueError, match="every one of the 1 blocks"):
        fs_link_scores(rd.from_pandas(df), block_col="blk",
                       fields=["f0", "f1"], m_probs=[0.9, 0.75],
                       max_block=5).to_pandas()


def test_fs_partial_oversize_drop_is_logged(caplog):
    import logging

    df = _world(64)
    df.loc[:59, "blk"] = 0
    df.loc[60:, "blk"] = 1
    with caplog.at_level(logging.WARNING, logger="raykg.linkage"):
        fs_link_scores(rd.from_pandas(df), block_col="blk",
                       fields=["f0", "f1"], m_probs=[0.9, 0.75],
                       max_block=5).to_pandas()
    assert any("dropping 1 of 2 blocks" in r.message
               and "(60 rows)" in r.message for r in caplog.records)
