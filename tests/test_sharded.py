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
