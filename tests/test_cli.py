"""CLI surface (python -m raykg …) driven in-process: the session
fixture already owns Ray, and the CLI only inits when none exists."""

import json
import os

import pandas as pd
import pyarrow.parquet as pq

from raykg.cli import main

SF_DIR = "/root/testdata/sf0.001"


def test_cli_query_list(capsys):
    assert main(["query", "--list"]) == 0
    out = capsys.readouterr().out
    assert "* agg_pricing_summary" in out  # * marks oracle-checked
    assert "kg_triples" in out


def test_cli_query_runs_and_writes_parquet(tmp_path, capsys):
    dest = str(tmp_path / "pricing.parquet")
    assert main(["query", "agg_pricing_summary",
                 "--sf-dir", SF_DIR, "--out", dest]) == 0
    tail = capsys.readouterr().out.strip().splitlines()[-1]
    meta = json.loads(tail)
    got = pq.read_table(dest).to_pandas()
    assert meta["rows"] == len(got) > 0
    assert "sum_qty" in got.columns or len(got.columns) > 1


def test_cli_query_unknown_name(capsys):
    assert main(["query", "no_such_query", "--sf-dir", SF_DIR]) == 2


def test_cli_fixture_pipeline_report_roundtrip(tmp_path, capsys):
    fx = str(tmp_path / "fx")
    out = str(tmp_path / "out")
    assert main(["fixture", fx, "--n-convs", "12", "--n-kb", "30",
                 "--n-nil", "5", "--n-tomb", "2", "--n-epochs", "2"]) == 0
    man = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert man["n_turns"] > 0
    assert main(["pipeline", fx, out]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["epochs_run"] == [0, 1]
    import ray.data as rd

    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    assert len(tri) > 0
    assert not tri.duplicated(subset=["subj", "pred", "obj"]).any()
    csv = str(tmp_path / "report.csv")
    assert main(["report", out, fx, "--csv", csv]) == 0
    rep = pd.read_csv(csv)
    assert "linking_recall@1" in rep.columns and len(rep) >= 3
