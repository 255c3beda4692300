"""Evaluation driver over pipeline output: per-epoch reports + CSV.

Mirrors the reference's evaluation flow around ``run_batch``
(``scripts/eval_kbp.py:330-723,787-805``): per epoch it scores linking
recall@k, NIL prediction (plain + mitigated), NIL clustering
(B-Cubed + MUC/B3/CEAF-e) and overall accuracy against the gold
mentions, carrying the two pieces of driver-global state across epochs:

  * ``added_entities`` — gold Wikipedia_IDs of mentions predicted NIL in
    earlier epochs (``:38-41,544-546``);
  * ``prev_clusters`` — per minted entity, the mode(s) of its members'
    gold ids (``:636-652``), granting link-to-previously-added credit
    (``:680-713``): a mention whose gold entity was already minted
    counts as correct when it links to a minted entity whose member
    majority (or exact half) matches its gold id.

The report tables are small (one row per epoch) — driver-side pandas,
like the reference's CSV writer (``:787-805``).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq

from raykg.eval import epoch_report, incremental_report


def _cluster_gold_modes(clusters: pd.DataFrame, gold: pd.DataFrame) -> dict:
    """cluster_id -> (mode, modes) of member gold Wikipedia_IDs
    (``scripts/eval_kbp.py:636-646``: unique multi-mode -> mode=None)."""
    members = clusters.explode("mention_ids").rename(
        columns={"mention_ids": "mention_id"}
    )[["cluster_id", "mention_id"]]
    merged = members.merge(
        gold[["mention_id", "Wikipedia_ID"]], on="mention_id", how="left"
    )
    out = {}
    for cid, g in merged.groupby("cluster_id"):
        modes = g.Wikipedia_ID.mode().tolist()
        mode = modes[0] if len(modes) == 1 else None
        out[cid] = (mode, modes)
    return out


def run_eval(out_dir: str, fixture_dir: str, report_csv: str | None = None):
    """Evaluate a completed pipeline run; returns (per-epoch reports,
    flattened DataFrame with the averages row appended)."""
    gold = pq.read_table(os.path.join(fixture_dir, "gold.parquet")).to_pandas()
    mentions_root = os.path.join(out_dir, "mentions")
    epochs = sorted(
        int(d.split("=")[1])
        for d in os.listdir(mentions_root)
        if d.startswith("epoch=")
    )

    added: set = set()
    prev_cluster_modes: dict = {}
    reports = []
    for epoch in epochs:
        mentions = pq.read_table(
            os.path.join(mentions_root, f"epoch={epoch}")
        ).to_pandas()
        cpath = os.path.join(out_dir, "clusters", f"epoch={epoch}.parquet")
        clusters = (
            pq.read_table(cpath).to_pandas()
            if os.path.exists(cpath)
            else pd.DataFrame(columns=["cluster_id", "mention_ids"])
        )

        rep = epoch_report(mentions, gold, clusters, added)
        rep["batch"] = epoch

        # link-to-previously-added credit (scripts/eval_kbp.py:680-713)
        data = mentions.merge(
            gold[["mention_id", "Wikipedia_ID", "NIL"]], on="mention_id"
        )
        sbla = data[data.NIL & data.Wikipedia_ID.isin(added) & ~data.is_nil]
        correct = 0
        for r in sbla.itertuples():
            entry = prev_cluster_modes.get(r.entity_uri)
            if entry is None:
                continue
            mode, modes = entry
            if mode == r.Wikipedia_ID:
                correct += 1
            elif len(modes) == 2 and r.Wikipedia_ID in modes:
                correct += 1
        total = int((data.NIL & data.Wikipedia_ID.isin(added)).sum())
        rep["should_be_linked_to_prev_added_correct"] = correct
        rep["should_be_linked_to_prev_added_total"] = total
        rep["overall_correct"] = rep["overall_correct"] + correct
        rep["overall_accuracy"] = rep["overall_correct"] / max(len(data), 1)
        reports.append(rep)

        # update cross-epoch state AFTER scoring (epoch k's additions are
        # visible from k+1 on)
        added |= set(data[data.is_nil].Wikipedia_ID.unique().tolist())
        if len(clusters):
            prev_cluster_modes.update(_cluster_gold_modes(clusters, gold))

    df = incremental_report(reports)
    if report_csv:
        df.to_csv(report_csv, index=False)
    return reports, df
