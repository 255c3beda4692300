"""Crossencoder rerank seam (raykg/crossenc.py): the reference's latent
cross path — joint (context, candidate) scoring re-sorts the candidate
list, ``bi_score`` preserves the biencoder score, and the NIL features
switch to ``max_bi``=bi_score / ``max_cross``=cross score exactly as
``scripts/eval_kbp.py:310-322`` + ``nilpredictor/__main__.py:56-58``."""

import numpy as np
import pyarrow as pa

from raykg.crossenc import CrossRerankStage, TinyCrossEncoder
from raykg.encode import HashEncoder
from raykg.index import FlatIndex, Retriever, candidates_column
from raykg.nil import LogisticModel, NilStage, nil_features_table
from raykg.schema import DUMMY_SCORE, INDEXER_KB


def _kb(n=40, dim=32, seed=3, tomb_rows=(5,)):
    rng = np.random.default_rng(seed)
    V = rng.normal(size=(n, dim)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    tomb = np.zeros(n, dtype=bool)
    for r in tomb_rows:
        tomb[r] = True
    titles = [f"Entity {i} Corp" for i in range(n)]
    descrs = [f"entity {i} makes widgets and reports data" for i in range(n)]
    idx = FlatIndex(V, np.arange(n, dtype=np.int64), titles, None, tomb,
                    INDEXER_KB)
    return idx, V, titles, descrs


def _batch(idx, V, m=6, top_k=10, seed=4):
    rng = np.random.default_rng(seed)
    Q = V[rng.integers(0, len(V), m)] + rng.normal(
        size=(m, V.shape[1])).astype(np.float32) * 0.05
    col = candidates_column(Q.astype(np.float32), [idx], top_k)
    return pa.table({
        "mention": pa.array([f"Entity {i}" for i in range(m)]),
        "context_left": pa.array(["we met with"] * m),
        "context_right": pa.array(["about the widgets contract"] * m),
        "candidates": col,
    })


def test_joint_layout_and_score_determinism():
    enc = TinyCrossEncoder(max_context_length=8, max_cand_length=16)
    ctx = enc.context_tokens("Acme Corp", "long left context " * 6,
                             "long right context " * 6)
    assert "[E1]" in ctx and "[E2]" in ctx
    assert len(ctx) <= 8 + 2  # windowed to the context budget (+tags)
    cand = enc.candidate_tokens("Acme Corp", "a supplier " * 30)
    assert "[TTL]" in cand and len(cand) <= 16 + 1
    joints = [ctx + ["[SEP]"] + cand, ctx + ["[SEP]"] + cand[:5]]
    s1 = enc.score_pairs(joints)
    s2 = TinyCrossEncoder(max_context_length=8,
                          max_cand_length=16).score_pairs(joints)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)
    assert s1.shape == (2,) and s1.dtype == np.float32
    assert not np.isclose(s1[0], s1[1])


def test_rerank_resorts_preserves_bi_and_pins_dummies():
    idx, V, titles, descrs = _kb()
    batch = _batch(idx, V)
    before = batch.column("candidates").combine_chunks()
    stage = CrossRerankStage(descr_ref=descrs)
    out = stage(batch)
    after = out.column("candidates").combine_chunks()
    assert after.type.value_type.field("bi_score") is not None
    offs = after.offsets.to_numpy()
    s = after.values.field("score").to_numpy(zero_copy_only=False)
    ids = after.values.field("id").to_numpy(zero_copy_only=False)
    dummy = after.values.field("dummy").to_numpy(zero_copy_only=False)
    bi = after.values.field("bi_score").to_numpy(zero_copy_only=False)
    b_ids = before.values.field("id").to_numpy(zero_copy_only=False)
    b_s = before.values.field("score").to_numpy(zero_copy_only=False)
    for i in range(len(offs) - 1):
        lo, hi = offs[i], offs[i + 1]
        seg_s, seg_ids = s[lo:hi], ids[lo:hi]
        # sorted by (cross desc, id asc)
        key = list(zip(-seg_s.astype(np.float64), seg_ids))
        assert key == sorted(key)
        # same candidate set; bi_score is the original biencoder score
        assert set(seg_ids.tolist()) == set(b_ids[lo:hi].tolist())
        orig = dict(zip(b_ids[lo:hi].tolist(), b_s[lo:hi].tolist()))
        for cid, cb in zip(seg_ids.tolist(), bi[lo:hi].tolist()):
            assert np.isclose(orig[cid], cb)
    # dummies pinned at DUMMY_SCORE (never resurrected by text match)
    assert (s[dummy] == np.float32(DUMMY_SCORE)).all()


def test_nil_features_switch_to_cross():
    idx, V, titles, descrs = _kb()
    batch = _batch(idx, V)
    out = CrossRerankStage(descr_ref=descrs)(batch)
    f = nil_features_table(out)
    after = out.column("candidates").combine_chunks()
    offs = after.offsets.to_numpy()
    s = after.values.field("score").to_numpy(zero_copy_only=False)
    bi = after.values.field("bi_score").to_numpy(zero_copy_only=False)
    for i in range(len(offs) - 1):
        assert np.isclose(f["max_cross"][i], s[offs[i]])
        assert np.isclose(f["max_bi"][i], bi[offs[i]])
    # a cross-featured logistic model scores end-to-end through NilStage
    model = LogisticModel(features=("max_bi", "max_cross", "secondiff"),
                          coef=(0.4, 0.3, 0.02), intercept=-30.0)
    res = NilStage(model)(out)
    assert "nil_score" in res.column_names and len(res) == len(out)


def test_stage_composes_with_retriever_full_mode(ray_session):
    """detect-shaped batch -> Retriever (full candidates) ->
    CrossRerankStage -> NilStage chains without schema surgery."""
    import ray

    idx, V, titles, descrs = _kb()
    enc = HashEncoder(dim=32)
    m = ["Entity 3", "Entity 7"]
    enc_col = enc.encode_mentions(m, ["left ctx"] * 2, ["right ctx"] * 2)
    batch = pa.table({
        "mention": pa.array(m),
        "context_left": pa.array(["left ctx"] * 2),
        "context_right": pa.array(["right ctx"] * 2),
        "encoding": pa.FixedSizeListArray.from_arrays(
            pa.array(enc_col.reshape(-1)), 32),
    })
    kb_ref = ray.put((idx.vectors, idx.wikipedia_ids, idx.titles,
                      idx.types, idx.tombstone))
    ret = Retriever(kb_ref, None, top_k=5, compact=False)
    got = CrossRerankStage(descr_ref=ray.put(descrs))(ret(batch))
    res = NilStage()(got)
    assert len(res) == 2
