"""The P/R gate: the Ray engine's emitted triples vs the reference-
equivalent single-process oracle (BASELINE.md protocol step 2)."""

import os

import pytest

import ray.data as rd

from raykg.oracle import run_reference_chain
from raykg.pipeline import PipelineConfig, run_pipeline


def _pr(pred: set, gold: set) -> tuple[float, float]:
    tp = len(pred & gold)
    p = tp / len(pred) if pred else 1.0
    r = tp / len(gold) if gold else 1.0
    return p, r


@pytest.fixture(scope="module")
def wp_fixture(tmp_path_factory):
    """Flagship-parity world generated with the SUB-WORD tokenizer
    encoder (spec 'hash-wp'): the window/truncation arithmetic
    (data_process.py:26-69 semantics) runs end-to-end on wordpiece
    counts in the main gate, not just in unit tests."""
    from raykg import fixtures

    d = str(tmp_path_factory.mktemp("fixture_wp"))
    fixtures.write_fixture(
        d, n_convs=60, n_kb=80, n_nil=12, n_tomb=5, n_epochs=3,
        seed=42, encoder_spec="hash-wp",
    )
    return d


# token budget for the wp gate: small enough that fixture contexts
# actually exceed it, so the quota-balancing window runs on real rows
# (test_wp_gate_exercises_windowing pins non-vacuity)
WP_MSL = 48


@pytest.fixture(scope="module")
def engine_triples(wp_fixture, tmp_path_factory):
    # global blocking: the reference-exact conformance configuration;
    # sub-word tokenization on (the parity default)
    out = str(tmp_path_factory.mktemp("parity_out"))
    run_pipeline(wp_fixture, out,
                 PipelineConfig(blocking="global", encoder="hash-wp",
                                max_seq_length=WP_MSL))
    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    return set(zip(tri.subj, tri.pred, tri.obj))


@pytest.fixture(scope="module")
def oracle_result(wp_fixture):
    return run_reference_chain(wp_fixture, encoder_spec="hash-wp",
                               max_seq_length=WP_MSL)


def test_wp_gate_exercises_windowing(wp_fixture):
    """Non-vacuity: at WP_MSL, a real share of the fixture's detected
    mentions must exceed the token budget (so balance_context_window
    runs end-to-end in the gate), and the windowed encodings must
    differ from the unwindowed ones."""
    import numpy as np
    import pyarrow as pa

    from raykg.detect import detect_mentions
    from raykg.encode import HashWordPieceEncoder

    tr = rd.read_parquet(
        os.path.join(wp_fixture, "transcripts")).to_pandas()
    m = detect_mentions(
        pa.Table.from_pandas(tr[["conv_id", "turn_idx", "text"]]))
    mn = m.column("mention").to_pylist()
    cl = m.column("context_left").to_pylist()
    cr = m.column("context_right").to_pylist()
    wp = HashWordPieceEncoder(max_seq_length=WP_MSL)
    over = [
        i for i in range(len(mn))
        if (len(wp.tokenize(cl[i])) + len(wp.tokenize(cr[i]))
            + len(wp.tokenize(mn[i])) + 2) > WP_MSL
    ]
    assert len(over) >= 20, f"only {len(over)} rows exceed the budget"
    sub = over[:50]
    windowed = wp.encode_mentions([mn[i] for i in sub],
                                  [cl[i] for i in sub],
                                  [cr[i] for i in sub])
    raw = HashWordPieceEncoder(max_seq_length=None).encode_mentions(
        [mn[i] for i in sub], [cl[i] for i in sub],
        [cr[i] for i in sub])
    changed = int((~np.isclose(windowed, raw).all(axis=1)).sum())
    assert changed >= 10, changed


def test_triple_parity(engine_triples, oracle_result):
    p, r = _pr(engine_triples, oracle_result["triples"])
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_links_to_parity(engine_triples, oracle_result):
    pred = {t for t in engine_triples if t[1] == "kg:linksTo"}
    gold = {t for t in oracle_result["triples"] if t[1] == "kg:linksTo"}
    p, r = _pr(pred, gold)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_cluster_membership_parity(engine_triples, oracle_result):
    pred = {t for t in engine_triples if t[1] == "kg:hasMember"}
    gold = {t for t in oracle_result["triples"] if t[1] == "kg:hasMember"}
    p, r = _pr(pred, gold)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_threestep_parity(small_fixture, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("parity3_out"))
    run_pipeline(
        small_fixture, out,
        PipelineConfig(clusterer="threestep", blocking="global"),
    )
    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    pred = set(zip(tri.subj, tri.pred, tri.obj))
    gold = run_reference_chain(small_fixture, clusterer="threestep")["triples"]
    p, r = _pr(pred, gold)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_surface_blocking_parity(wp_fixture, tmp_path_factory, oracle_result):
    """Surface-bucket blocking (the DEFAULT config) must reproduce the
    global-blocking oracle on this fixture — the property that makes it
    a safe default at scale (identical lowercased surfaces always share
    a bucket)."""
    out = str(tmp_path_factory.mktemp("parity_surface_out"))
    run_pipeline(wp_fixture, out,
                 PipelineConfig(encoder="hash-wp", max_seq_length=WP_MSL))
    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    pred = set(zip(tri.subj, tri.pred, tri.obj))
    p, r = _pr(pred, oracle_result["triples"])
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_ivf_mode_parity(wp_fixture, tmp_path_factory, oracle_result):
    """Approximate (IVF) retrieval mode: linked triples still match the
    exact-search oracle at the P/R gate — the NIL model consumes only
    the top-2 candidate scores, which IVF preserves near-perfectly."""
    out = str(tmp_path_factory.mktemp("parity_ivf_out"))
    run_pipeline(
        wp_fixture, out,
        PipelineConfig(ann="ivf", ivf_lists=16, ivf_nprobe=6,
                       encoder="hash-wp", max_seq_length=WP_MSL),
    )
    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    pred = set(zip(tri.subj, tri.pred, tri.obj))
    p, r = _pr(pred, oracle_result["triples"])
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_feature_clusterer_prefit_parity(small_fixture, tmp_path_factory):
    """Feature clusterer with PRE-FIT broadcast vectorizers (the
    reference's pickle flow): engine triples match the oracle given the
    same fitted vectorizers."""
    from raykg.pipeline import fit_vectorizers_from_fixture

    out = str(tmp_path_factory.mktemp("parity_feat_out"))
    run_pipeline(
        small_fixture, out,
        PipelineConfig(clusterer="feature", blocking="global"),
    )
    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    pred = set(zip(tri.subj, tri.pred, tri.obj))
    vec = fit_vectorizers_from_fixture(small_fixture, 0)
    gold = run_reference_chain(
        small_fixture, clusterer="feature", vectorizers=vec
    )["triples"]
    p, r = _pr(pred, gold)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_pq_mode_parity(wp_fixture, tmp_path_factory, oracle_result):
    """Product-quantized retrieval mode: ADC shortlist + exact re-rank
    keeps the top-2 scores the NIL model consumes, so linked triples
    match the exact-search oracle at the P/R gate."""
    out = str(tmp_path_factory.mktemp("parity_pq_out"))
    run_pipeline(
        wp_fixture, out,
        PipelineConfig(ann="pq", pq_m=8, pq_rerank=16,
                       encoder="hash-wp", max_seq_length=WP_MSL),
    )
    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    pred = set(zip(tri.subj, tri.pred, tri.obj))
    p, r = _pr(pred, oracle_result["triples"])
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_tiny_transformer_parity(tmp_path_factory):
    """The encoder seam holds for a NON-hash embedding model: generate a
    world whose KB vectors come from TinyTransformerEncoder (a seeded
    numpy transformer — batched GEMM inference, the real towers' compute
    shape), run engine + oracle with that encoder, and gate triples at
    the same P/R bar. Proves every downstream operator (retrieval, NIL
    features, clustering, canonical ids, triples) is encoder-agnostic —
    i.e. a real transformer drops into ``ENCODERS`` and nothing else
    changes."""
    from raykg import fixtures

    fx = str(tmp_path_factory.mktemp("fixture_tiny"))
    fixtures.write_fixture(
        fx, n_convs=40, n_kb=60, n_nil=10, n_tomb=4, n_epochs=2, seed=43,
        encoder_spec="tiny",
    )
    out = str(tmp_path_factory.mktemp("parity_tiny_out"))
    run_pipeline(
        fx, out, PipelineConfig(blocking="global", encoder="tiny"),
    )
    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    pred = set(zip(tri.subj, tri.pred, tri.obj))
    gold = run_reference_chain(fx, encoder_spec="tiny")["triples"]
    p, r = _pr(pred, gold)
    assert p >= 0.95 and r >= 0.95, (p, r)
    # the run must exercise BOTH outcomes or the gate is vacuous
    preds = {t[1] for t in pred}
    assert "kg:linksTo" in preds and "kg:hasMember" in preds, preds


def test_hnsw_mode_parity(wp_fixture, tmp_path_factory, oracle_result):
    """Graph-index (HNSW-family) retrieval mode: linked triples still
    match the exact-search oracle at the P/R gate, like the IVF/PQ
    modes — the beam's visited set carries exact scores, so only
    recall is approximate (faiss_indexer.py:76-141 semantics)."""
    out = str(tmp_path_factory.mktemp("parity_hnsw_out"))
    run_pipeline(
        wp_fixture, out,
        PipelineConfig(ann="hnsw", hnsw_m=12, hnsw_ef_construction=48,
                       hnsw_ef_search=96, encoder="hash-wp",
                       max_seq_length=WP_MSL),
    )
    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    pred = set(zip(tri.subj, tri.pred, tri.obj))
    p, r = _pr(pred, oracle_result["triples"])
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_hnsw_sharded_mode_parity(wp_fixture, tmp_path_factory,
                                  oracle_result):
    """Round-5 composition: ann='hnsw' with kb_shards>1 — each shard
    beam-searches its OWN NSW graph and the running-top-k merge is
    unchanged (beam scores are exact inner products), so the linked
    triples still meet the P/R gate against the exact-search oracle."""
    out = str(tmp_path_factory.mktemp("parity_hnsw_sh_out"))
    run_pipeline(
        wp_fixture, out,
        PipelineConfig(ann="hnsw", hnsw_m=12, hnsw_ef_construction=48,
                       hnsw_ef_search=96, kb_shards=2,
                       encoder="hash-wp", max_seq_length=WP_MSL),
    )
    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    pred = set(zip(tri.subj, tri.pred, tri.obj))
    p, r = _pr(pred, oracle_result["triples"])
    assert p >= 0.95 and r >= 0.95, (p, r)
