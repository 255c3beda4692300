"""Evaluation suite: linking recall@k, NIL confusion matrices /
classification reports, clustering metrics (B-Cubed, MUC, B3, CEAF-e),
overall accuracy.

Re-implements, from the published metric definitions, what the
reference computes in ``scripts/eval_kbp.py``:

  * recall@{1,2,3,5,10,30,100} over non-NIL mentions from the position
    of the gold id in the candidate list (``:396-413``);
  * NIL-prediction confusion matrix + per-class P/R/F1 report, plain
    and "mitigated" (`should_be_nil or top != gold`, ``:498-538``);
  * B-Cubed precision/recall in the hhromic/python-bcubed formulation
    (``:578-587``);
  * the streaming-CDC suite MUC / B3 / CEAF-e (``:88-226``), CEAF-e via
    φ4 similarity + optimal 1-1 cluster matching (raykg.hungarian).

All functions operate on small driver-side tables (per-epoch metric
rows), matching the reference's report granularity (`README.md:236-278`).
"""

from __future__ import annotations

import statistics

import numpy as np
import pandas as pd

from raykg.hungarian import linear_sum_assignment

RECALL_KS = (1, 2, 3, 5, 10, 30, 100)


def linking_found_at(cand_wiki_lists, gold_ids) -> np.ndarray:
    """1-based rank of the gold id in the candidate list, −1 if absent
    (``scripts/eval_kbp.py:401-410``)."""
    out = np.full(len(gold_ids), -1, dtype=np.int64)
    for i, (cands, gold) in enumerate(zip(cand_wiki_lists, gold_ids)):
        cands = list(cands)
        if gold in cands:
            out[i] = cands.index(gold) + 1
    return out


def recall_at_k(found_at: np.ndarray, ks=RECALL_KS) -> dict[str, float]:
    n = max(len(found_at), 1)
    return {
        f"linking_recall@{k}": float(((found_at > 0) & (found_at <= k)).sum() / n)
        for k in ks
    }


def confusion(y_true: np.ndarray, y_pred: np.ndarray, normalize: bool = False):
    y_true = np.asarray(y_true, dtype=bool)
    y_pred = np.asarray(y_pred, dtype=bool)
    tp = int((y_true & y_pred).sum())
    tn = int((~y_true & ~y_pred).sum())
    fp = int((~y_true & y_pred).sum())
    fn = int((y_true & ~y_pred).sum())
    if normalize:  # sklearn normalize="true": rows (actual class) sum to 1
        neg = max(tn + fp, 1)
        pos = max(fn + tp, 1)
        return {"tn": tn / neg, "fp": fp / neg, "fn": fn / pos, "tp": tp / pos}
    return {"tn": tn, "fp": fp, "fn": fn, "tp": tp}


def classification_report(y_true, y_pred) -> dict:
    """sklearn-shaped dict report for the binary NIL task."""
    y_true = np.asarray(y_true, dtype=bool)
    y_pred = np.asarray(y_pred, dtype=bool)
    out = {}
    for label, mask_t, mask_p in (
        ("True", y_true, y_pred),
        ("False", ~y_true, ~y_pred),
    ):
        tp = int((mask_t & mask_p).sum())
        prec = tp / max(int(mask_p.sum()), 1)
        rec = tp / max(int(mask_t.sum()), 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-13)
        out[label] = {
            "precision": prec,
            "recall": rec,
            "f1-score": f1,
            "support": int(mask_t.sum()),
        }
    out["accuracy"] = float((y_true == y_pred).mean()) if len(y_true) else 0.0
    return out


# ------------------------------------------------------------ clustering

def bcubed_precision(cdict: dict, ldict: dict) -> float:
    """python-bcubed extended precision (hhromic formulation): average
    over items of |C(e1)∩C(e2)∩L-overlap| weighting; with single-label
    sets this reduces to classic B-Cubed precision."""
    return _bcubed_side(cdict, ldict)


def bcubed_recall(cdict: dict, ldict: dict) -> float:
    return _bcubed_side(ldict, cdict)


def _mult(a: set, b: set) -> float:
    return len(a & b)


def _bcubed_side(cdict: dict, ldict: dict) -> float:
    total = 0.0
    for e1 in cdict:
        num = 0.0
        den = 0.0
        for e2 in cdict:
            if cdict[e1] & cdict[e2]:
                num += min(_mult(cdict[e1], cdict[e2]), _mult(ldict[e1], ldict[e2])) / _mult(
                    cdict[e1], cdict[e2]
                )
                den += 1.0
        total += num / den if den else 0.0
    return total / max(len(cdict), 1)


def _lookup(clusters: dict) -> dict:
    out = {}
    for cid, members in clusters.items():
        for m in members:
            out[m] = cid
    return out


def muc(true_clusters: dict, pred_clusters: dict):
    true_lab = _lookup(true_clusters)
    pred_lab = _lookup(pred_clusters)
    p_num = p_den = 0
    for cluster in pred_clusters.values():
        p_num += len(cluster) - len({true_lab[m] for m in cluster})
        p_den += len(cluster) - 1
    precision = p_num / (p_den + 1e-13)
    r_num = r_den = 0
    for cluster in true_clusters.values():
        r_num += len(cluster) - len({pred_lab[m] for m in cluster})
        r_den += len(cluster) - 1
    recall = r_num / (r_den + 1e-13)
    f1 = 2 * precision * recall / (precision + recall + 1e-13)
    return precision, recall, f1


def b3(true_clusters: dict, pred_clusters: dict, total: int):
    true_sets = {m: set(c) for c in true_clusters.values() for m in c}
    pred_sets = {m: set(c) for c in pred_clusters.values() for m in c}
    precision = recall = 0.0
    for m in true_sets:
        inter = len(true_sets[m] & pred_sets[m])
        precision += inter / len(pred_sets[m])
        recall += inter / len(true_sets[m])
    precision /= total
    recall /= total
    f1 = 2 * precision * recall / max(precision + recall, 1e-13)
    return precision, recall, f1


def ceaf_e(true_clusters: dict, pred_clusters: dict):
    """φ4(k, r) = 2|k∩r| / (|k|+|r|); optimal 1-1 matching."""
    tc = [set(c) for c in true_clusters.values()]
    pc = [set(c) for c in pred_clusters.values()]
    phi = np.zeros((len(tc), len(pc)))
    for i, k in enumerate(tc):
        for j, r in enumerate(pc):
            phi[i, j] = 2 * len(k & r) / (len(k) + len(r))
    ri, ci = linear_sum_assignment(phi, maximize=True)
    num = phi[ri, ci].sum()
    precision = num / max(len(tc), 1)
    recall = num / max(len(pc), 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-13)
    return precision, recall, f1


def eval_clustering(true_clusters: dict, pred_clusters: dict, total: int) -> dict:
    mp, mr, mf = muc(true_clusters, pred_clusters)
    bp, br, bf = b3(true_clusters, pred_clusters, total)
    cp, cr, cf = ceaf_e(true_clusters, pred_clusters)
    return {
        "muc_precision": mp, "muc_recall": mr, "muc_f1": mf,
        "b3_precision": bp, "b3_recall": br, "b3_f1": bf,
        "ceaf_precision": cp, "ceaf_recall": cr, "ceaf_f1": cf,
        "pred_clusters_len": len(pred_clusters),
        "evalcluster_mean": statistics.mean((mf, bf, cf)),
    }


# ------------------------------------------------- correct-steps oracle

def correct_linking_candidates(
    cand_wiki_lists, cand_score_lists, gold_ids, nil_flags
):
    """The ``--correct-steps`` oracle rewriter
    (``scripts/eval_kbp.py:438-471``): per non-NIL mention, move the
    gold candidate to the front by dropping higher-ranked candidates and
    pad with repeats of the worst one; drop the mention when the gold
    candidate is absent or was the last candidate. Returns
    (wiki_lists, score_lists, keep_mask, dropped_count)."""
    out_w, out_s = [], []
    keep = np.ones(len(gold_ids), dtype=bool)
    dropped = 0
    for i, (wikis, scores, gold, is_nil) in enumerate(
        zip(cand_wiki_lists, cand_score_lists, gold_ids, nil_flags)
    ):
        wikis = list(wikis)
        scores = list(scores)
        if is_nil:
            out_w.append(wikis)
            out_s.append(scores)
            continue
        if gold not in wikis:
            keep[i] = False
            dropped += 1
            out_w.append(wikis)
            out_s.append(scores)
            continue
        idx = wikis.index(gold)
        prev_len = len(wikis)
        wikis, scores = wikis[idx:], scores[idx:]
        if len(wikis) == 1:
            keep[i] = False
            dropped += 1
            out_w.append(wikis)
            out_s.append(scores)
            continue
        pad = prev_len - len(wikis)
        wikis = wikis + [wikis[-1]] * pad
        scores = scores + [scores[-1]] * pad
        out_w.append(wikis)
        out_s.append(scores)
    return out_w, out_s, keep, dropped


def gold_clusters(nil_mentions: pd.DataFrame) -> dict:
    """``--correct-steps`` gold clustering (``scripts/eval_kbp.py:
    609-623``): NIL mentions grouped by gold Wikipedia_ID."""
    return {
        int(wid): set(g.mention_id)
        for wid, g in nil_mentions.groupby("Wikipedia_ID")
    }


# ------------------------------------------------------------ epoch report

def epoch_report(
    mentions: pd.DataFrame,
    gold: pd.DataFrame,
    clusters: pd.DataFrame,
    prev_added: set,
) -> dict:
    """Per-epoch metric row, mirroring run_batch's report keys
    (``scripts/eval_kbp.py:330-723``). ``mentions`` must carry
    mention_id, is_nil, top_wikipedia_id, cand_wikipedia_ids;
    ``prev_added``: gold Wikipedia_IDs of NIL entities minted in
    previous epochs (driver-global state, ``:38-41,544-546``)."""
    data = mentions.merge(
        gold[["mention_id", "Wikipedia_ID", "NIL"]], on="mention_id"
    )
    report: dict = {"size": len(data)}

    not_nil = data[~data.NIL]
    found = linking_found_at(
        not_nil.cand_wikipedia_ids.tolist(), not_nil.Wikipedia_ID.tolist()
    )
    report.update(recall_at_k(found))

    should_be_nil = data.NIL & ~data.Wikipedia_ID.isin(prev_added)
    report["nil_prediction"] = classification_report(should_be_nil, data.is_nil)
    mitigated = should_be_nil | (data.top_wikipedia_id != data.Wikipedia_ID)
    report["nil_prediction_mitigated"] = classification_report(
        mitigated, data.is_nil
    )
    report["nil_prediction_cm"] = confusion(should_be_nil, data.is_nil)
    report["nil_prediction_cm_normalized"] = confusion(
        should_be_nil, data.is_nil, normalize=True
    )

    # clustering eval over this epoch's NIL mentions
    if len(clusters):
        member_rows = clusters.explode("mention_ids").rename(
            columns={"mention_ids": "mention_id"}
        )[["cluster_id", "mention_id"]]
        merged = member_rows.merge(
            data[["mention_id", "Wikipedia_ID"]], on="mention_id"
        )
        pred_clusters = {
            cid: set(g.mention_id) for cid, g in merged.groupby("cluster_id")
        }
        true_clusters = {
            wid: set(g.mention_id) for wid, g in merged.groupby("Wikipedia_ID")
        }
        total = len(merged)
        cdict = {str(m): {c} for c, ms in pred_clusters.items() for m in ms}
        ldict = {
            str(m): {w} for w, ms in true_clusters.items() for m in ms
        }
        report["nil_clustering_bcubed_precision"] = bcubed_precision(cdict, ldict)
        report["nil_clustering_bcubed_recall"] = bcubed_recall(cdict, ldict)
        report["eval_clustering"] = eval_clustering(
            true_clusters, pred_clusters, total
        )

    # overall accuracy (``:663-718``, without the prev-cluster-mode credit
    # refinement: linked-to-prev-added counts when the resolved uri is the
    # minted entity whose members' modal gold id matches)
    overall = int(
        (~data.NIL & ~data.is_nil & (data.Wikipedia_ID == data.top_wikipedia_id)).sum()
    )
    report["overall_to_link_correct"] = overall / max(int((~data.NIL).sum()), 1)
    sbn = data[should_be_nil]
    report["should_be_nil_correct"] = int(sbn.is_nil.sum())
    report["should_be_nil_total"] = len(sbn)
    overall += int(sbn.is_nil.sum())
    report["overall_correct"] = overall
    report["overall_accuracy"] = overall / max(len(data), 1)
    return report


def incremental_report(rows: list[dict]) -> pd.DataFrame:
    """Flatten per-epoch reports + append the averages row
    (``scripts/eval_kbp.py:725-732,787-805``)."""
    flat = []
    for r in rows:
        row = {}
        for k, v in r.items():
            if isinstance(v, dict):
                for k2, v2 in v.items():
                    if isinstance(v2, dict):
                        for k3, v3 in v2.items():
                            row[f"{k}-{k2}-{k3}"] = v3
                    else:
                        row[f"{k}-{k2}"] = v2
            else:
                row[k] = v
        flat.append(row)
    df = pd.DataFrame(flat)
    avg = df.mean(numeric_only=True).astype(object)
    avg["batch"] = "incremental_overall"
    out = pd.concat([df, avg.to_frame().T], ignore_index=True)
    # the reference CSV's batch column is a string; keep the column
    # single-typed so downstream sorts don't mix str and int
    if "batch" in out.columns:
        out["batch"] = out["batch"].astype(str)
    return out
