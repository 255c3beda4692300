"""Crossencoder reranking behind the candidate seam (opt-in).

The reference carries a BLINK crossencoder as a LATENT path: the
nilpredictor reads a ``max_cross`` feature when the top candidate was
cross-scored (``pipeline/nilpredictor/__main__.py:25,56-58``), and the
driver's ``prepare_for_nil_prediction`` switches ``max_bi`` to the
preserved ``bi_score`` in that case (``scripts/eval_kbp.py:310-322``);
the model itself lives in
``pipeline/biencoder/blink/crossencoder/crossencoder.py`` with its
joint-sequence prep in
``pipeline/biencoder/blink/crossencoder/data_process.py:17-80`` —
context rep (32 tokens, ``left [E1] mention [E2] right``) concatenated
with each candidate rep (128 tokens, ``title [TTL] descr``), one
transformer tower over the PAIR, a linear head on the pooled state.
The shipped reference config never enables it (SURVEY.md §2.11), so
this stage is opt-in here too: a ``map_batches`` callable between
retrieval and NIL scoring, exercised by tests and the
``kg_cross_rerank`` registry entry rather than the flagship defaults.

Ray-Data shape: the stage is a callable CLASS — the scorer weights and
the KB descr table are built/fetched ONCE per actor (``ray.put``
broadcast, zero-copy per node), batches stream through. Scoring is
batched GEMM inference (the TinyTransformer tower), never per-row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raykg.encode import (TinyTransformerEncoder, balance_context_window,
                          truncate_candidate)
from raykg.schema import DUMMY_SCORE, INDEXER_KB

CANDIDATE_CROSS = pa.struct(
    [
        ("raw_score", pa.float32()),
        ("id", pa.int64()),
        ("wikipedia_id", pa.int64()),
        ("title", pa.string()),
        ("type_", pa.string()),
        ("indexer", pa.int32()),
        ("score", pa.float32()),       # cross score after rerank
        ("norm_score", pa.float32()),
        ("dummy", pa.bool_()),
        ("bi_score", pa.float32()),    # the biencoder score, preserved
    ]
)


class TinyCrossEncoder(TinyTransformerEncoder):
    """Deterministic numpy stand-in with the crossencoder's compute
    shape (``crossencoder.py:42-64``): ONE tower over the joint
    (context, candidate) sequence, linear head on the pooled state ->
    scalar logit. Same seeded-weights scheme as
    ``TinyTransformerEncoder`` — the seam is the point: swapping a
    torch crossencoder into this slot changes the scoring function,
    not the sequence layout or the rerank/NIL plumbing."""

    _SPECIALS = {"[E1]": 0, "[E2]": 1, "[TTL]": 2, "[SEP]": 3}

    def __init__(self, max_context_length: int = 32,
                 max_cand_length: int = 128, seed: int = 7,
                 d_model: int = 64, n_layers: int = 2, n_heads: int = 4,
                 vocab: int = 8192):
        joint = max_context_length + max_cand_length + 1
        super().__init__(dim=8, max_seq_length=joint, seed=seed,
                         d_model=d_model, n_layers=n_layers,
                         n_heads=n_heads, vocab=vocab)
        self.max_context_length = max_context_length
        self.max_cand_length = max_cand_length
        rng = np.random.default_rng(seed + 17)
        self.w_head = (rng.standard_normal(d_model)
                       * (1.0 / np.sqrt(d_model))).astype(np.float32)

    def context_tokens(self, mention: str, left: str, right: str) -> list:
        """BLINK context representation at ``max_context_length``
        (``crossencoder/data_process.py:17-43`` via the biencoder's
        ``get_context_representation``)."""
        mt = self.tokenize(mention or "")
        lt = self.tokenize(left or "")
        rt = self.tokenize(right or "")
        budget = self.max_context_length
        if len(lt) + len(rt) + len(mt) + 2 > budget:
            lt, rt = balance_context_window(len(mt) + 2, lt, rt, budget)
        return lt + ["[E1]"] + mt + ["[E2]"] + rt

    def candidate_tokens(self, title: str, descr: str) -> list:
        """Candidate representation at ``max_cand_length``
        (``get_candidate_representation`` semantics)."""
        tt, dt = truncate_candidate(self.tokenize(title or ""),
                                    self.tokenize(descr or ""),
                                    self.max_cand_length)
        return tt + ["[TTL]"] + dt

    def score_pairs(self, joint_token_lists: list[list[str]]) -> np.ndarray:
        """-> (n,) float32 cross logits, batched tower inference."""
        msl = self.max_seq_length or 128
        seqs = [self._token_ids(toks[:msl]) for toks in joint_token_lists]
        pooled = self._forward_pooled(seqs)
        return (pooled @ self.w_head).astype(np.float32)


def kb_descr_ref(kb_path: str):
    """Driver-side: broadcast the KB descr strings (by KB row id) once
    via ``ray.put`` — the rerank stage's id->text lookup, the analogue
    of the reference's ``id2text`` (``crossencoder/data_process.py:47``).
    At reference scale (5.9M entities) this is the documented per-node
    replica trade the KB index already makes."""
    import pyarrow.parquet as pq

    import ray

    t = pq.read_table(kb_path, columns=["descr"])
    return ray.put(t.column("descr").to_pylist())


class CrossRerankStage:
    """map_batches stage: re-score the candidates list<struct> with a
    crossencoder, preserve the biencoder score as ``bi_score``, and
    re-sort by (cross desc, id asc). Dummy/tombstone candidates keep
    ``DUMMY_SCORE`` (a dead entity must not be resurrected by a text
    match). Downstream ``NilStage`` then sees ``max_cross`` /
    ``max_bi`` exactly as ``prepare_for_nil_prediction`` derives them
    (``scripts/eval_kbp.py:310-322``)."""

    def __init__(self, descr_ref=None, scorer=None,
                 max_context_length: int = 32, max_cand_length: int = 128,
                 seed: int = 7):
        import ray

        self.descrs = (
            ray.get(descr_ref) if descr_ref is not None
            and not isinstance(descr_ref, list) else (descr_ref or [])
        )
        self.scorer = scorer or TinyCrossEncoder(
            max_context_length=max_context_length,
            max_cand_length=max_cand_length, seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cands = batch.column("candidates")
        if isinstance(cands, pa.ChunkedArray):
            cands = cands.combine_chunks()
        offsets = cands.offsets.to_numpy().astype(np.int64)
        vals = cands.values
        n_flat = len(vals)
        mentions = batch.column("mention").to_pylist()
        lefts = batch.column("context_left").to_pylist()
        rights = batch.column("context_right").to_pylist()

        ids = vals.field("id").to_numpy(zero_copy_only=False).astype(np.int64)
        indexers = vals.field("indexer").to_numpy(zero_copy_only=False)
        titles = vals.field("title").to_pylist()
        dummies = vals.field("dummy").to_numpy(zero_copy_only=False)
        bi_scores = vals.field("score").to_numpy(zero_copy_only=False)

        # joint sequences: one shared context rep per mention, one
        # candidate rep per candidate row
        counts = np.diff(offsets)
        seg = np.repeat(np.arange(len(counts)), counts)
        ctx_cache = [
            self.scorer.context_tokens(m, l, r)
            for m, l, r in zip(mentions, lefts, rights)
        ]
        joints = []
        for j in range(n_flat):
            if dummies[j]:
                joints.append([])  # scored as DUMMY below, skip tower
                continue
            descr = ""
            if indexers[j] == INDEXER_KB and 0 <= ids[j] < len(self.descrs):
                descr = self.descrs[ids[j]] or ""
            joints.append(ctx_cache[seg[j]] + ["[SEP]"]
                          + self.scorer.candidate_tokens(titles[j], descr))
        live = np.flatnonzero(~dummies.astype(bool))
        cross = np.full(n_flat, np.float32(DUMMY_SCORE), dtype=np.float32)
        if len(live):
            cross[live] = self.scorer.score_pairs([joints[j] for j in live])

        # re-sort every mention's candidates by (cross desc, id asc)
        order = np.lexsort((ids, -cross.astype(np.float64), seg))
        new_struct = pa.StructArray.from_arrays(
            [
                vals.field("raw_score").take(pa.array(order)),
                vals.field("id").take(pa.array(order)),
                vals.field("wikipedia_id").take(pa.array(order)),
                vals.field("title").take(pa.array(order)),
                vals.field("type_").take(pa.array(order)),
                vals.field("indexer").take(pa.array(order)),
                pa.array(cross[order], type=pa.float32()),
                vals.field("norm_score").take(pa.array(order)),
                vals.field("dummy").take(pa.array(order)),
                pa.array(bi_scores[order], type=pa.float32()),
            ],
            fields=list(CANDIDATE_CROSS),
        )
        new_col = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), type=pa.int32()), new_struct)
        i = batch.column_names.index("candidates")
        return batch.set_column(i, "candidates", new_col)
