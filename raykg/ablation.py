"""NIL-predictor training + feature-ablation workflow.

Re-expresses the reference's training path (SURVEY.md §3.3):

  * training-table preparation = ``prepare_for_nil_prediction_train``
    (``scripts/eval_kbp.py:285-300``): the NIL features the pipeline
    already materializes per mention, with the binary label
    ``~NIL and Wikipedia_ID == top_wikipedia_id`` from the gold join;
  * the 19-task ablation grid of ``scripts/feature_ablation_study.py``
    (``:109-345``): feature combos over {max_bi, secondiff, mean,
    median, stdev, levenshtein, jaccard}, plain and undersampled
    (``:389-396`` — majority class downsampled to the minority count,
    seeded), each trained as StandardScaler+LogisticRegression
    (``:421-426``, here raykg.nil.LogisticModel IRLS) and scored;
  * resume-by-skip: a task already present in the summary CSV is not
    retrained (``:362-370``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from raykg.eval import classification_report
from raykg.nil import LogisticModel

# the reference grid (scripts/feature_ablation_study.py:109-345):
# name suffix encodes the feature set; 'under_' variants undersample
_BASE_SETS = {
    "bi_max": ["max_bi"],
    "bi_max_secondiff": ["max_bi", "secondiff"],
    "bi_max_levenshtein": ["max_bi", "levenshtein"],
    "bi_max_jaccard": ["max_bi", "jaccard"],
    "bi_max_stdev10": ["max_bi", "stdev"],
    "bi_max_stats10": ["max_bi", "mean", "median", "stdev"],
    "bi_max_levenshtein_jaccard": ["max_bi", "levenshtein", "jaccard"],
    "bi_max_secondiff_levenshtein_jaccard": [
        "max_bi", "secondiff", "levenshtein", "jaccard"
    ],
    "bi_max_stdev_levenshtein": ["max_bi", "stdev", "levenshtein"],
    "bi_max_stdev_jaccard": ["max_bi", "stdev", "jaccard"],
    "bi_max_stdev_levenshtein_jaccard": [
        "max_bi", "stdev", "levenshtein", "jaccard"
    ],
    "bi_max_stats10_levenshtein": ["max_bi", "mean", "median", "stdev", "levenshtein"],
    "bi_max_stats10_jaccard": ["max_bi", "mean", "median", "stdev", "jaccard"],
    "bi_max_stats10_levenshtein_jaccard": [
        "max_bi", "mean", "median", "stdev", "levenshtein", "jaccard"
    ],
}


def ablation_tasks() -> list[dict]:
    tasks = []
    for suffix, feats in _BASE_SETS.items():
        tasks.append({"name": f"nilp_{suffix}", "features": feats,
                      "sampling": None})
        tasks.append({"name": f"nilp_under_{suffix}", "features": feats,
                      "sampling": "undersample"})
    return tasks


def build_training_table(out_dir: str, fixture_dir: str) -> pd.DataFrame:
    """Mentions output (feature columns) ⨝ gold -> labeled table."""
    mentions = pq.read_table(os.path.join(out_dir, "mentions")).to_pandas()
    gold = pq.read_table(os.path.join(fixture_dir, "gold.parquet")).to_pandas()
    df = mentions.merge(
        gold[["mention_id", "Wikipedia_ID", "NIL"]], on="mention_id"
    )
    df["label"] = (~df.NIL & (df.Wikipedia_ID == df.top_wikipedia_id)).astype(int)
    return df


def _undersample(df: pd.DataFrame, seed: int = 1234) -> pd.DataFrame:
    counts = df.label.value_counts()
    if len(counts) < 2:
        return df
    minority = counts.idxmin()
    n = counts.min()
    parts = [
        df[df.label == minority],
        df[df.label != minority].sample(n=n, random_state=seed),
    ]
    return pd.concat(parts).sort_index()


def run_ablation(
    train_df: pd.DataFrame,
    test_df: pd.DataFrame,
    out_dir: str,
    tasks: list[dict] | None = None,
    seed: int = 1234,
) -> pd.DataFrame:
    """Train/evaluate every task; writes per-model coefficients and an
    appendable summary CSV; tasks already in the summary are skipped."""
    os.makedirs(out_dir, exist_ok=True)
    summary_path = os.path.join(out_dir, "summary.csv")
    done: set = set()
    rows = []
    if os.path.exists(summary_path):
        prev = pd.read_csv(summary_path)
        done = set(prev.name)
        rows = prev.to_dict("records")

    for task in tasks or ablation_tasks():
        if task["name"] in done:
            continue
        feats = task["features"]
        tr = train_df.dropna(subset=feats)
        te = test_df.dropna(subset=feats)
        if task["sampling"] == "undersample":
            tr = _undersample(tr, seed)
        model = LogisticModel.fit(
            tr[feats].to_numpy(dtype=np.float64), tr.label.to_numpy(), feats
        )
        p = model.predict_proba1(te[feats].to_numpy(dtype=np.float64))
        rep = classification_report(te.label.to_numpy() == 1, p >= 0.5)
        row = {
            "name": task["name"],
            "features": ",".join(feats),
            "sampling": task["sampling"] or "",
            "n_train": len(tr),
            "n_test": len(te),
            "accuracy": rep["accuracy"],
            "f1_pos": rep["True"]["f1-score"],
            "f1_neg": rep["False"]["f1-score"],
            "macro_f1": (rep["True"]["f1-score"] + rep["False"]["f1-score"]) / 2,
        }
        rows.append(row)
        np.savez(
            os.path.join(out_dir, f"{task['name']}.npz"),
            coef=model.coef, intercept=model.intercept,
            mean=model.mean, scale=model.scale,
            features=np.array(feats, dtype=object),
        )
        pd.DataFrame(rows).to_csv(summary_path, index=False)
    return pd.read_csv(summary_path)


def load_model(path: str) -> LogisticModel:
    z = np.load(path, allow_pickle=True)
    return LogisticModel(
        tuple(z["features"].tolist()), z["coef"], float(z["intercept"]),
        mean=z["mean"], scale=z["scale"],
    )
