import os

import numpy as np
import pandas as pd
import pytest

from raykg.ablation import (
    ablation_tasks,
    build_training_table,
    load_model,
    run_ablation,
)
from raykg.eval import correct_linking_candidates, gold_clusters
from raykg.pipeline import PipelineConfig, run_pipeline
from raykg.report import run_eval


@pytest.fixture(scope="module")
def run_out(small_fixture, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("report_out"))
    run_pipeline(small_fixture, out, PipelineConfig())
    return small_fixture, out


def test_run_eval_report(run_out, tmp_path):
    fx, out = run_out
    csv = str(tmp_path / "report.csv")
    reports, df = run_eval(out, fx, report_csv=csv)
    assert len(reports) == 3
    assert os.path.exists(csv)
    assert df.iloc[-1]["batch"] == "incremental_overall"
    r0 = reports[0]
    # exact-surface linking is strong -> recall@10 high on this fixture
    assert r0["linking_recall@10"] > 0.8
    assert 0 <= r0["overall_accuracy"] <= 1
    assert "eval_clustering" in r0
    assert 0 <= r0["eval_clustering"]["b3_f1"] <= 1
    # later epochs exercise the prev-added credit path
    assert reports[2]["should_be_linked_to_prev_added_total"] >= 0


def test_nil_prediction_quality(run_out):
    fx, out = run_out
    reports, _ = run_eval(out, fx)
    # NIL recall: mentions whose gold entity is out-of-KB should mostly
    # be flagged NIL
    rep = reports[0]["nil_prediction"]
    assert rep["True"]["recall"] > 0.8


def test_correct_steps_rewriter():
    wikis = [[5, 7, 9], [1, 2, 3], [4, 6], [8, 9]]
    scores = [[0.9, 0.8, 0.7], [0.9, 0.8, 0.7], [0.9, 0.8], [0.9, 0.8]]
    gold = [7, 99, 6, 8]
    nil = [False, False, False, True]
    w, s, keep, dropped = correct_linking_candidates(wikis, scores, gold, nil)
    assert w[0] == [7, 9, 9]  # shifted + padded with worst
    assert s[0] == [0.8, 0.7, 0.7]
    assert not keep[1] and dropped == 2  # gold absent -> dropped
    assert not keep[2]  # gold at last position -> dropped
    assert keep[3] and w[3] == [8, 9]  # NIL untouched


def test_gold_clusters():
    df = pd.DataFrame({"mention_id": [1, 2, 3], "Wikipedia_ID": [7, 7, 9]})
    assert gold_clusters(df) == {7: {1, 2}, 9: {3}}


def test_ablation_workflow(run_out, tmp_path):
    fx, out = run_out
    table = build_training_table(out, fx)
    assert {"max_bi", "secondiff", "label"} <= set(table.columns)
    assert table.label.nunique() == 2
    train = table[table.mention_id % 2 == 0]
    test = table[table.mention_id % 2 == 1]
    tasks = ablation_tasks()
    assert len(tasks) == 28  # 14 feature sets x {plain, undersampled}
    subset = [t for t in tasks if t["name"] in
              ("nilp_bi_max", "nilp_bi_max_secondiff", "nilp_under_bi_max")]
    mdir = str(tmp_path / "models")
    summary = run_ablation(train, test, mdir, tasks=subset)
    assert len(summary) == 3
    # max_bi alone is a weak separator here (label 0 includes strong
    # links to minted NIL entities, exactly like the reference's
    # incremental train tables) — sanity floor, not a quality bar
    assert (summary.accuracy > 0.6).all()
    # resume-by-skip: second call retrains nothing, summary unchanged
    summary2 = run_ablation(train, test, mdir, tasks=subset)
    pd.testing.assert_frame_equal(summary, summary2)
    m = load_model(os.path.join(mdir, "nilp_bi_max_secondiff.npz"))
    p = m.predict_proba1(test[["max_bi", "secondiff"]].to_numpy(float))
    acc = ((p >= 0.5) == (test.label == 1)).mean()
    assert acc > 0.6


def test_incremental_report_batch_column_single_typed():
    # the averages row carries batch="incremental_overall"; every other
    # row must also be str so sorting the column never mixes types
    from raykg.eval import incremental_report

    rows = [
        {"batch": 0, "overall_accuracy": 0.5},
        {"batch": 1, "overall_accuracy": 0.7},
    ]
    df = incremental_report(rows)
    assert all(isinstance(b, str) for b in df["batch"])
    df.sort_values("batch")  # must not raise
    assert df["batch"].iloc[-1] == "incremental_overall"


def test_mention_triples_long_conv_id_not_truncated():
    import numpy as np
    import pyarrow as pa

    from raykg.triples import mention_triples

    long_id = "conv_" + "x" * 90  # > the old U40 fixed width
    batch = pa.table(
        {
            "mention_id": pa.array([7], type=pa.int64()),
            "conv_id": pa.array([long_id], type=pa.string()),
            "turn_idx": pa.array([3], type=pa.int64()),
            "is_nil": pa.array([False]),
            "entity_uri": pa.array(["ent:kb:42"], type=pa.string()),
        }
    )
    out = mention_triples(batch, {}, epoch=0)
    subjects = out.column("subj").to_pylist()
    assert f"turn:{long_id}:3" in subjects
