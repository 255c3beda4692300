"""Sharded-KB retrieval must reproduce the single-index pipeline
bit-for-bit (raykg.sharded exactness argument)."""

import os

import pandas as pd
import pytest

import ray.data as rd

from raykg.pipeline import PipelineConfig, run_pipeline


@pytest.fixture(scope="module")
def both_runs(small_fixture, tmp_path_factory):
    out1 = str(tmp_path_factory.mktemp("unsharded"))
    run_pipeline(small_fixture, out1, PipelineConfig())
    out4 = str(tmp_path_factory.mktemp("sharded"))
    run_pipeline(small_fixture, out4, PipelineConfig(kb_shards=4))
    return out1, out4


def _triples(out):
    df = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    return df.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)


def test_triples_identical(both_runs):
    a, b = (_triples(o) for o in both_runs)
    pd.testing.assert_frame_equal(a, b)


def test_mentions_identical(both_runs):
    cols = ["mention_id", "is_nil", "nil_score", "top_wikipedia_id",
            "top_title", "top_score", "entity_uri", "max_bi", "secondiff",
            "mean", "median", "stdev"]
    frames = []
    for out in both_runs:
        df = rd.read_parquet(os.path.join(out, "mentions"), columns=cols).to_pandas()
        frames.append(df.sort_values("mention_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_sharded_ivf_composition(small_fixture, tmp_path_factory):
    """kb_shards + ann='ivf': per-shard approximate probing with the
    same running-top-k merge still holds the triple-parity gate."""
    import os

    import ray.data as rd

    from raykg.oracle import run_reference_chain
    from raykg.pipeline import PipelineConfig, run_pipeline

    out = str(tmp_path_factory.mktemp("shard_ivf_out"))
    run_pipeline(
        small_fixture, out,
        PipelineConfig(kb_shards=3, ann="ivf", ivf_lists=8, ivf_nprobe=4),
    )
    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    pred = set(zip(tri.subj, tri.pred, tri.obj))
    gold = run_reference_chain(small_fixture)["triples"]
    tp = len(pred & gold)
    p = tp / len(pred) if pred else 1.0
    r = tp / len(gold) if gold else 1.0
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_sharded_triples_shuffle_join_path(small_fixture, tmp_path_factory,
                                           both_runs, monkeypatch):
    """The big-epoch uri-resolution strategy (hash-join shuffle instead
    of the broadcast map) must produce identical triples. Forced by
    dropping the adaptive threshold to 0."""
    import raykg.pipeline as rp

    monkeypatch.setattr(rp, "NIL_MAP_BROADCAST_ROWS", 0)
    out1, _ = both_runs
    out = str(tmp_path_factory.mktemp("sharded_shuffle_uris"))
    run_pipeline(small_fixture, out, PipelineConfig(kb_shards=4))
    pd.testing.assert_frame_equal(_triples(out1), _triples(out))


def test_sharded_resume_rebuilds_rw_from_deltas(small_fixture, tmp_path_factory, both_runs):
    """Kill-and-resume in sharded-RW mode: the RW shards are rebuilt
    from the materialized cluster partitions via metadata-only row
    counts + worker-side append tasks, and the completed run is
    bit-identical to the uninterrupted unsharded run."""
    out1, _ = both_runs
    out = str(tmp_path_factory.mktemp("sharded_resume"))
    cfg = PipelineConfig(kb_shards=3)
    run_pipeline(small_fixture, out, cfg, epochs=[0, 1])  # simulated kill
    res = run_pipeline(small_fixture, out, cfg)
    assert res["epochs_run"] == [2]
    pd.testing.assert_frame_equal(_triples(out1), _triples(out))


def test_sharded_pq_composition(small_fixture, tmp_path_factory):
    """kb_shards + ann='pq': per-shard codebooks + exact shortlist
    re-rank, same running-top-k merge — triple-parity gate holds."""
    import os

    import ray.data as rd

    from raykg.oracle import run_reference_chain
    from raykg.pipeline import PipelineConfig, run_pipeline

    out = str(tmp_path_factory.mktemp("shard_pq_out"))
    run_pipeline(
        small_fixture, out,
        PipelineConfig(kb_shards=3, ann="pq", pq_m=8, pq_rerank=16),
    )
    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    pred = set(zip(tri.subj, tri.pred, tri.obj))
    gold = run_reference_chain(small_fixture)["triples"]
    tp = len(pred & gold)
    p = tp / len(pred) if pred else 1.0
    r = tp / len(gold) if gold else 1.0
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_default_mode_distributed_assembly_parity(
        small_fixture, tmp_path_factory, both_runs, monkeypatch):
    """A big surface-mode epoch in DEFAULT (kb_shards=1) mode must
    auto-switch to the distributed cluster assembly (no to_pandas of
    cluster parts on the driver) and still be bit-identical — forced
    by dropping DRIVER_ASSEMBLY_NIL_ROWS to 0. The driver RW arrays
    are rebuilt from the written partition in canonical-rank order, so
    every later epoch's retrieval sees identical RW row positions."""
    import raykg.pipeline as rp

    monkeypatch.setattr(rp, "DRIVER_ASSEMBLY_NIL_ROWS", 0)
    out1, _ = both_runs
    out = str(tmp_path_factory.mktemp("default_dist_assembly"))
    run_pipeline(small_fixture, out, PipelineConfig())
    pd.testing.assert_frame_equal(_triples(out1), _triples(out))
    # mentions parity too: RW retrieval state must match across epochs
    cols = ["mention_id", "is_nil", "entity_uri", "top_score"]
    a = rd.read_parquet(os.path.join(out1, "mentions"),
                        columns=cols).to_pandas()
    b = rd.read_parquet(os.path.join(out, "mentions"),
                        columns=cols).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("mention_id").reset_index(drop=True),
        b.sort_values("mention_id").reset_index(drop=True))
