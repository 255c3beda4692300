"""Reference-equivalent single-process oracle.

A deliberately *naive, sequential, pandas/per-row* implementation of the
reference chain (``scripts/eval_kbp.py:330-723`` structure: encode ->
retrieve -> NIL-predict -> threshold -> cluster -> add-to-KB, batch by
batch), sharing with the Ray engine only the "model" artifacts that
define the task (HashEncoder weights-equivalent, the NIL logistic
coefficients, decision thresholds). Detection, retrieval assembly,
feature computation and greedy clustering are re-implemented here
independently (regex / python loops / ``statistics`` module), so the
parity test (tests/test_parity.py) checks the distributed engine's
vectorized operators and shuffle/ordering behavior against
straightforward reference-shaped code — this is the P/R >= 0.95 gate of
BASELINE.md §2.

Not for production use: O(rows) python loops everywhere by design.
"""

from __future__ import annotations

import re
import statistics

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from raykg.cluster import run_clusterer
from raykg.encode import HashEncoder, column_to_vectors
from raykg.nil import DEFAULT_NIL_MODEL, LogisticModel
from raykg.schema import (
    DUMMY_SCORE,
    INDEXER_KB,
    INDEXER_RW,
    NIL_THRESHOLD,
    PRED_HAS_MEMBER,
    PRED_LABEL,
    PRED_LINKS_TO,
    PRED_MENTIONS,
    TOP_K,
    entity_uri_kb,
    entity_uri_nil,
)

_MENTION_RX = re.compile(r"\b[A-Z][A-Za-z0-9]*(?: [A-Z][A-Za-z0-9]*)*")


def _detect(transcripts: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in transcripts.itertuples():
        ordinal = int(r.conv_id.rsplit("_", 1)[1])
        for j, m in enumerate(_MENTION_RX.finditer(r.text)):
            rows.append(
                {
                    "mention_id": (ordinal * 100 + r.turn_idx) * 10 + j,
                    "conv_id": r.conv_id,
                    "turn_idx": r.turn_idx,
                    "mention": m.group(0),
                    "context_left": r.text[: m.start()],
                    "context_right": r.text[m.end() :],
                }
            )
    return pd.DataFrame(rows)


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[len(b)]


def _search(
    q: np.ndarray,
    kb_vecs: np.ndarray,
    kb_meta: list[dict],
    rw_vecs: list[np.ndarray],
    rw_titles: list[str],
    top_k: int,
) -> list[dict]:
    """Per-query candidate assembly, reference-service style
    (python loop over indexes and hits, then stable sort by score)."""
    out = []
    q_norm = float(np.linalg.norm(q))
    # index 1: RO KB
    scores = kb_vecs @ q
    order = sorted(range(len(scores)), key=lambda i: (-scores[i], i))[:top_k]
    for i in order:
        meta = kb_meta[i]
        if meta["tombstone"]:
            out.append(
                {"id": i, "wikipedia_id": 0, "title": "", "indexer": INDEXER_KB,
                 "score": DUMMY_SCORE, "norm_score": DUMMY_SCORE, "dummy": True}
            )
            continue
        s = float(scores[i])
        e_norm = float(np.linalg.norm(kb_vecs[i]))
        out.append(
            {"id": i, "wikipedia_id": meta["wikipedia_id"], "title": meta["title"],
             "indexer": INDEXER_KB, "score": s,
             "norm_score": s / max(q_norm, e_norm) ** 2, "dummy": False}
        )
    # index 2: RW (minted entities)
    if rw_vecs:
        R = np.stack(rw_vecs)
        scores = R @ q
        order = sorted(range(len(scores)), key=lambda i: (-scores[i], i))[:top_k]
        for i in order:
            s = float(scores[i])
            e_norm = float(np.linalg.norm(R[i]))
            out.append(
                {"id": i, "wikipedia_id": -1, "title": rw_titles[i],
                 "indexer": INDEXER_RW, "score": s,
                 "norm_score": s / max(q_norm, e_norm) ** 2, "dummy": False}
            )
    out.sort(key=lambda c: -c["score"])  # python sort is stable, like list.sort in the reference
    return out


def run_reference_chain(
    fixture_dir: str,
    clusterer: str = "greedy",
    nil_model: LogisticModel = DEFAULT_NIL_MODEL,
    top_k: int = TOP_K,
    dim: int = 64,
    vectorizers: dict | None = None,
    encoder_spec: str = "hash",
    max_seq_length: int | None = 128,
) -> dict:
    """Sequential epochs over the fixture; returns mentions df, clusters
    per epoch, and the full triple set."""
    import os

    from raykg.encode import make_encoder

    encoder = make_encoder(encoder_spec, dim=dim,
                           max_seq_length=max_seq_length)
    kb_tbl = pq.read_table(os.path.join(fixture_dir, "kb.parquet"))
    kb_vecs = column_to_vectors(kb_tbl.column("embedding"))
    kb_meta = [
        {"wikipedia_id": w, "title": t, "tombstone": bool(tb)}
        for w, t, tb in zip(
            kb_tbl.column("wikipedia_id").to_pylist(),
            kb_tbl.column("title").to_pylist(),
            kb_tbl.column("tombstone").to_pylist(),
        )
    ]

    tdir = os.path.join(fixture_dir, "transcripts")
    epochs = sorted(
        int(d.split("=")[1]) for d in os.listdir(tdir) if d.startswith("epoch=")
    )

    rw_vecs: list[np.ndarray] = []
    rw_titles: list[str] = []
    rw_uris: list[str] = []
    all_mentions = []
    all_clusters = []
    triples: set[tuple] = set()

    for epoch in epochs:
        tr = pq.read_table(os.path.join(tdir, f"epoch={epoch}")).to_pandas()
        data = _detect(tr).sort_values("mention_id").reset_index(drop=True)

        enc = encoder.encode_mentions(
            data["mention"].tolist(),
            data["context_left"].tolist(),
            data["context_right"].tolist(),
        )

        cand_lists = [
            _search(enc[i], kb_vecs, kb_meta, rw_vecs, rw_titles, top_k)
            for i in range(len(data))
        ]

        # NIL features + scoring, reference-style per row
        nil_scores, is_nil, uris = [], [], []
        for i, cands in enumerate(cand_lists):
            if len(cands) == 0:
                nil_scores.append(0.0)
                is_nil.append(True)
                uris.append("")
                continue
            feats = {
                "max_bi": cands[0]["score"],
                "secondiff": cands[0]["score"] - cands[1]["score"]
                if len(cands) > 1
                else 0.0,
            }
            scores = [c["score"] for c in cands]
            feats["mean"] = statistics.mean(scores)
            feats["median"] = statistics.median(scores)
            feats["stdev"] = statistics.stdev(scores) if len(scores) > 1 else 0.0
            # textdistance Levenshtein(qval=None): whitespace-token level
            m = data["mention"][i].lower().split()
            t = cands[0]["title"].lower().split()
            mx = max(len(m), len(t), 1)
            feats["levenshtein"] = 1 - _py_levenshtein(m, t) / mx
            X = np.array([[feats[f] for f in nil_model.features]])
            p = float(nil_model.predict_proba1(X)[0])
            nil_scores.append(p)
            nil = p < NIL_THRESHOLD
            is_nil.append(nil)
            if nil:
                uris.append("")
            elif cands[0]["indexer"] == INDEXER_KB:
                uris.append(entity_uri_kb(cands[0]["wikipedia_id"]))
            else:
                uris.append(rw_uris[cands[0]["id"]])
        data["nil_score"] = nil_scores
        data["is_nil"] = is_nil
        data["entity_uri"] = uris
        data["epoch"] = epoch

        # cluster the epoch's NIL mentions jointly, sorted by mention_id
        nil_rows = data[data["is_nil"]]
        clusters = run_clusterer(
            clusterer,
            nil_rows["mention_id"].tolist(),
            nil_rows["mention"].tolist(),
            enc[nil_rows.index.to_numpy()],
            nil_rows["context_left"].tolist(),
            nil_rows["context_right"].tolist(),
            vectorizers=vectorizers,
        )
        clusters = sorted(clusters, key=lambda c: min(c.mention_ids))
        mid2uri = {}
        for rank, c in enumerate(clusters):
            uri = entity_uri_nil(epoch, rank)
            for mid in c.mention_ids:
                mid2uri[mid] = uri
            all_clusters.append(
                {"cluster_id": uri, "epoch": epoch, "title": c.title(),
                 "nelements": c.nelements, "mention_ids": list(c.mention_ids)}
            )
            triples.add((uri, PRED_LABEL, c.title()))
            for mid in c.mention_ids:
                triples.add((uri, PRED_HAS_MEMBER, f"mention:{mid}"))
            # KB update: minted entity becomes retrievable next epoch
            rw_vecs.append(c.center())
            rw_titles.append(c.title())
            rw_uris.append(uri)

        for r in data.itertuples():
            ent = mid2uri.get(r.mention_id, "") if r.is_nil else r.entity_uri
            if not ent:
                continue
            triples.add((f"mention:{r.mention_id}", PRED_LINKS_TO, ent))
            triples.add((f"turn:{r.conv_id}:{r.turn_idx}", PRED_MENTIONS, ent))

        all_mentions.append(data)

    return {
        "mentions": pd.concat(all_mentions, ignore_index=True),
        "clusters": pd.DataFrame(all_clusters),
        "triples": triples,
    }
