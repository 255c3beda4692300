"""NIL prediction: feature assembly + logistic scoring.

Reproduces the reference's two-piece chain (SURVEY.md §2.2 M7-M9, §2.3
T4): the driver's ``prepare_for_nil_prediction``
(``scripts/eval_kbp.py:302-328``) extracts ``max_bi`` (top candidate
score), mention / top title strings and the top-candidate list; the
nilpredictor service (``pipeline/nilpredictor/__main__.py:43-103``)
derives ``jaccard`` / ``levenshtein`` (lowercased,
textdistance-normalized), ``mean`` / ``median`` / ``stdev`` /
``secondiff`` over the candidate scores, and applies a
StandardScaler+LogisticRegression pipeline returning
``P(correct link)``; the driver thresholds ``is_nil = score < 0.5``
(``scripts/eval_kbp.py:489-491``).

Faithfulness notes:
  * the service's dummy-candidate filter (``'dummy' not in c``,
    ``__main__.py:77``) iterates a pydantic model and is therefore a
    no-op — stats here intentionally include dummy scores to match;
  * ``stdev`` is the sample standard deviation (``statistics.stdev``,
    ddof=1);
  * mentions with an empty candidate list are NIL immediately with
    ``nil_score = 0`` (``eval_kbp.py:306-308,432``).

The shipped reference model uses features ``(max_bi, secondiff)``
(``pipeline/docker-compose.yml:54``). Since the trained pickle targets
BLINK score scales, the default model here is a fixed logistic on the
same two features calibrated for the hash-encoder score scale; a
training path (IRLS, sklearn-equivalent L2 objective) is provided for
the feature-ablation workflow (``scripts/feature_ablation_study.py``).

This whole stage is stateless and vectorized — a plain ``map_batches``
function (model coefficients broadcast via closure), no actor needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raykg.schema import INDEXER_KB, NIL_THRESHOLD
from raykg.text import batch_jaccard_sim, batch_levenshtein_token_sim

FEATURE_NAMES = (
    "max_bi",
    "max_cross",
    "secondiff",
    "jaccard",
    "levenshtein",
    "mean",
    "median",
    "stdev",
)


class LogisticModel:
    """Minimal StandardScaler+LogisticRegression equivalent (numpy)."""

    def __init__(self, features, coef, intercept, mean=None, scale=None):
        self.features = tuple(features)
        self.coef = np.asarray(coef, dtype=np.float64)
        self.intercept = float(intercept)
        self.mean = None if mean is None else np.asarray(mean, dtype=np.float64)
        self.scale = None if scale is None else np.asarray(scale, dtype=np.float64)

    def predict_proba1(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        if self.mean is not None:
            X = (X - self.mean) / self.scale
        z = X @ self.coef + self.intercept
        return 1.0 / (1.0 + np.exp(-z))

    @classmethod
    def fit(cls, X: np.ndarray, y: np.ndarray, features, C: float = 1.0,
            max_iter: int = 200, tol: float = 1e-8) -> "LogisticModel":
        """IRLS on the sklearn objective: min ½/C·‖w‖² + Σ log-loss
        (intercept unpenalized), after standard scaling."""
        X = np.asarray(X, dtype=np.float64)
        mean = X.mean(axis=0)
        scale = X.std(axis=0)
        scale[scale == 0.0] = 1.0
        Xs = (X - mean) / scale
        n, d = Xs.shape
        Xb = np.concatenate([Xs, np.ones((n, 1))], axis=1)
        w = np.zeros(d + 1)
        reg = np.eye(d + 1) / C
        reg[d, d] = 0.0
        for _ in range(max_iter):
            z = Xb @ w
            p = 1.0 / (1.0 + np.exp(-z))
            W = np.maximum(p * (1 - p), 1e-10)
            grad = Xb.T @ (p - y) + reg @ w
            H = (Xb * W[:, None]).T @ Xb + reg
            step = np.linalg.solve(H, grad)
            w -= step
            if np.abs(step).max() < tol:
                break
        return cls(features, w[:d], w[d], mean=mean, scale=scale)


# Calibrated for the HashEncoder score scale (correct links ≈ 95-100,
# typo/abbreviation/out-of-KB best matches ≲ 85; see raykg.encode).
DEFAULT_NIL_MODEL = LogisticModel(
    features=("max_bi", "secondiff"), coef=(0.5, 0.02), intercept=-44.5
)


def _segment_features(
    scores: np.ndarray,
    offsets: np.ndarray,
    mentions: list[str],
    top_title: list[str],
) -> dict[str, np.ndarray]:
    """Shared vectorized feature math over flat candidate scores."""
    n = len(offsets) - 1
    counts = np.diff(offsets)
    has = counts > 0

    seg = np.repeat(np.arange(n), counts)
    sums = np.zeros(n)
    np.add.at(sums, seg, scores)
    mean = np.where(has, sums / np.maximum(counts, 1), 0.0)
    sq = np.zeros(n)
    np.add.at(sq, seg, (scores - mean[seg]) ** 2)
    stdev = np.where(counts > 1, np.sqrt(sq / np.maximum(counts - 1, 1)), 0.0)
    order = np.lexsort((scores, seg))
    s_sorted = scores[order]
    if scores.size == 0:
        scores = np.zeros(1)
        s_sorted = np.zeros(1)
    first = np.where(has, offsets[:-1], 0)
    second = np.where(counts > 1, offsets[:-1] + 1, first)
    max_bi = np.where(has, scores[first], 0.0)
    secondiff = np.where(counts > 1, scores[first] - scores[second], 0.0)
    lo = np.where(has, offsets[:-1] + (counts - 1) // 2, 0)
    hi = np.where(has, offsets[:-1] + counts // 2, 0)
    median = np.where(has, (s_sorted[lo] + s_sorted[hi]) / 2.0, 0.0)

    mention_l = [m.lower() for m in mentions]
    title_l = [t.lower() for t in top_title]
    return {
        "max_bi": max_bi,
        "secondiff": secondiff,
        "jaccard": batch_jaccard_sim(mention_l, title_l),
        "levenshtein": batch_levenshtein_token_sim(mention_l, title_l),
        "mean": mean,
        "median": median,
        "stdev": stdev,
        "_has": has,
    }


def nil_features_compact(batch: pa.Table) -> dict[str, np.ndarray]:
    """Features from the compact retrieval columns (cand_scores +
    top_* scalars; see raykg.index.compact_candidate_columns)."""
    scores_col = batch.column("cand_scores")
    if isinstance(scores_col, pa.ChunkedArray):
        scores_col = scores_col.combine_chunks()
    offsets = scores_col.offsets.to_numpy().astype(np.int64)
    scores = scores_col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    top_title = batch.column("top_title").to_pylist()
    f = _segment_features(
        scores, offsets, batch.column("mention").to_pylist(), top_title
    )
    f["_top_title"] = np.asarray(top_title, dtype=object)
    f["_top_wikipedia_id"] = (
        batch.column("top_wikipedia_id").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    f["_top_id"] = batch.column("top_id").to_numpy(zero_copy_only=False).astype(np.int64)
    f["_top_indexer"] = (
        batch.column("top_indexer").to_numpy(zero_copy_only=False).astype(np.int32)
    )
    return f


def nil_features_table(batch: pa.Table) -> dict[str, np.ndarray]:
    """Vectorized per-mention NIL features from the full candidates
    list<struct> column (compact pipelines use nil_features_compact)."""
    cands = batch.column("candidates")
    if isinstance(cands, pa.ChunkedArray):
        cands = cands.combine_chunks()
    offsets = cands.offsets.to_numpy().astype(np.int64)
    counts = np.diff(offsets)
    has = counts > 0
    scores = cands.values.field("score").to_numpy(zero_copy_only=False).astype(np.float64)
    titles = cands.values.field("title").to_pylist()
    wikis = cands.values.field("wikipedia_id").to_numpy(zero_copy_only=False)
    ids = cands.values.field("id").to_numpy(zero_copy_only=False)
    indexers = cands.values.field("indexer").to_numpy(zero_copy_only=False)

    if scores.size == 0:
        # sentinel padding keeps the masked gathers below in-bounds
        titles = [""]
        wikis = np.zeros(1, dtype=np.int64)
        ids = -np.ones(1, dtype=np.int64)
        indexers = -np.ones(1, dtype=np.int32)
    first = np.where(has, offsets[:-1], 0)
    top_title = [titles[f] if h else "" for f, h in zip(first, has)]

    f = _segment_features(
        scores, offsets, batch.column("mention").to_pylist(), top_title
    )
    if "bi_score" in {fl.name for fl in cands.type.value_type}:
        # cross-reranked candidates (raykg.crossenc): ``score`` is the
        # cross logit, the biencoder score was preserved — switch the
        # features exactly like prepare_for_nil_prediction does
        # (scripts/eval_kbp.py:310-322)
        bi = (cands.values.field("bi_score")
              .to_numpy(zero_copy_only=False).astype(np.float64))
        if bi.size == 0:
            bi = np.zeros(1)
        f["max_cross"] = f["max_bi"]
        f["max_bi"] = np.where(has, bi[first], 0.0)
    f["_top_title"] = np.asarray(top_title, dtype=object)
    f["_top_wikipedia_id"] = np.where(has, wikis[first], 0).astype(np.int64)
    f["_top_id"] = np.where(has, ids[first], -1).astype(np.int64)
    f["_top_indexer"] = np.where(has, indexers[first], -1).astype(np.int32)
    return f


class NilStage:
    """Stateless map_batches callable: + nil features, nil_score, is_nil,
    top_* and entity_uri columns.

    ``rw_uris``: canonical URIs of previously minted NIL entities,
    indexed by RW-index position — resolves a top candidate from the RW
    index to its stable entity id (replaces the reference's
    prev_clusters bookkeeping, ``scripts/eval_kbp.py:649-652``).
    """

    def __init__(self, model: LogisticModel = DEFAULT_NIL_MODEL,
                 rw_uris: list[str] | None = None,
                 threshold: float = NIL_THRESHOLD,
                 rw_offsets: list[tuple[int, int]] | None = None):
        self.model = model
        self.rw_uris = rw_uris or []
        self.threshold = threshold
        # (epoch, global-id base) pairs, ascending: lets the sharded-RW
        # path DERIVE ``nil:{epoch}:{rank}`` from a global RW id with no
        # O(RW) uri broadcast — uris are positional by construction
        # (raykg.canon), so this resolves identically to rw_uris[id]
        self.rw_offsets = rw_offsets or None

    def __call__(self, batch: pa.Table) -> pa.Table:
        compact = "cand_scores" in batch.column_names
        f = nil_features_compact(batch) if compact else nil_features_table(batch)
        X = np.stack([f[name] for name in self.model.features], axis=1)
        nil_score = self.model.predict_proba1(X)
        # empty candidate list => immediately NIL with score 0
        nil_score = np.where(f["_has"], nil_score, 0.0)
        is_nil = nil_score < self.threshold

        kb_top = f["_top_indexer"] == INDEXER_KB
        # vectorized uri assembly: NIL -> "" (resolved after clustering);
        # KB top -> "ent:kb:<wikipedia_id>"; else the RW entity's uri
        kb_uris = np.char.add("ent:kb:", f["_top_wikipedia_id"].astype("U20"))
        if self.rw_uris:
            rw_arr = np.asarray(self.rw_uris, dtype=object)
            rw_sel = rw_arr[np.clip(f["_top_id"], 0, len(rw_arr) - 1)]
        elif self.rw_offsets:
            eps = np.array([e for e, _ in self.rw_offsets], dtype=np.int64)
            offs = np.array([o for _, o in self.rw_offsets], dtype=np.int64)
            gid = np.clip(f["_top_id"], 0, None)
            slot = np.clip(np.searchsorted(offs, gid, side="right") - 1, 0, None)
            ranks = gid - offs[slot]
            rw_sel = np.array(
                [f"nil:{e}:{r}" for e, r in zip(eps[slot], ranks)],
                dtype=object,
            )
        else:
            rw_sel = np.full(len(nil_score), "", dtype=object)
        uris = np.where(is_nil, "", np.where(kb_top, kb_uris, rw_sel)).astype(object)

        out = batch
        # max_cross exists only for cross-reranked batches
        # (raykg.crossenc); the non-cross schema stays unchanged
        names = tuple(n for n in FEATURE_NAMES if n in f)
        for name in names:
            out = out.append_column(name, pa.array(f[name], type=pa.float32()))
        out = out.append_column(
            "nil_score", pa.array(nil_score, type=pa.float32())
        )
        out = out.append_column("is_nil", pa.array(is_nil, type=pa.bool_()))
        if not compact:  # compact retrieval already carries the top_* columns
            out = out.append_column(
                "top_title", pa.array(f["_top_title"].tolist(), type=pa.string())
            )
            out = out.append_column(
                "top_wikipedia_id", pa.array(f["_top_wikipedia_id"], type=pa.int64())
            )
            out = out.append_column(
                "top_id", pa.array(f["_top_id"], type=pa.int64())
            )
            out = out.append_column(
                "top_indexer", pa.array(f["_top_indexer"], type=pa.int32())
            )
        out = out.append_column(
            "entity_uri", pa.array(uris.tolist(), type=pa.string())
        )
        return out
