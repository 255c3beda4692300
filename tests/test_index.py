import numpy as np
import pyarrow as pa

from raykg.encode import HashEncoder, vectors_to_column
from raykg.index import FlatIndex, Retriever, candidates_column
from raykg.schema import DUMMY_SCORE, INDEXER_KB, INDEXER_RW


def _toy_index(n=20, d=8, seed=0, indexer=INDEXER_KB, tomb_idx=()):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    tomb = np.zeros(n, dtype=bool)
    for i in tomb_idx:
        tomb[i] = True
    return FlatIndex(
        vecs,
        np.arange(n, dtype=np.int64) + 100,
        [f"ent {i}" for i in range(n)],
        None,
        tomb,
        indexer,
    )


def test_search_matches_bruteforce():
    idx = _toy_index()
    rng = np.random.default_rng(1)
    q = rng.normal(size=(5, 8)).astype(np.float32)
    scores, ids = idx.search_knn(q, 4)
    brute = q @ idx.vectors.T
    for r in range(5):
        order = np.lexsort((np.arange(20), -brute[r]))[:4]
        np.testing.assert_array_equal(ids[r], order)
        np.testing.assert_allclose(scores[r], brute[r][order], rtol=1e-6)


def test_search_fewer_than_k_pads():
    idx = _toy_index(n=3)
    q = np.ones((2, 8), dtype=np.float32)
    scores, ids = idx.search_knn(q, 10)
    assert ids.shape == (2, 10)
    assert (ids[:, 3:] == -1).all()


def test_candidates_tombstone_dummy():
    idx = _toy_index(tomb_idx=(0,))
    # query exactly at vector 0 so it is the top candidate
    q = idx.vectors[:1].copy()
    col = candidates_column(q, [idx], 3)
    cands = col.to_pylist()[0]
    assert len(cands) == 3
    # dummy sorts last with score -1000 and blanked metadata
    assert cands[-1]["dummy"] is True
    assert cands[-1]["score"] == DUMMY_SCORE
    assert cands[-1]["title"] == ""
    assert cands[-1]["wikipedia_id"] == 0
    assert not cands[0]["dummy"]
    # non-dummies sorted desc
    s = [c["score"] for c in cands[:-1]]
    assert s == sorted(s, reverse=True)


def test_multi_index_union_sorted():
    a = _toy_index(n=6, seed=0, indexer=INDEXER_KB)
    b = _toy_index(n=6, seed=7, indexer=INDEXER_RW)
    q = np.ones((1, 8), dtype=np.float32)
    col = candidates_column(q, [a, b], 4)
    cands = col.to_pylist()[0]
    assert len(cands) == 8
    scores = [c["score"] for c in cands]
    assert scores == sorted(scores, reverse=True)
    assert {c["indexer"] for c in cands} == {INDEXER_KB, INDEXER_RW}


def test_empty_index_contributes_nothing():
    a = _toy_index(n=4)
    empty = FlatIndex(
        np.zeros((0, 8), dtype=np.float32),
        np.zeros(0, dtype=np.int64),
        [],
        None,
        None,
        INDEXER_RW,
    )
    q = np.ones((2, 8), dtype=np.float32)
    col = candidates_column(q, [a, empty], 3)
    assert [len(x) for x in col.to_pylist()] == [3, 3]


def test_norm_score():
    idx = _toy_index()
    q = idx.vectors[:1] * 2.0  # q norm > e norm
    col = candidates_column(q, [idx], 1)
    c = col.to_pylist()[0][0]
    qn = np.linalg.norm(q)
    expected = c["score"] / qn**2
    assert abs(c["norm_score"] - expected) < 1e-5


def test_retriever_stage_inline():
    enc = HashEncoder(dim=16)
    titles = ["Alpha Beta", "Gamma Delta"]
    vecs = enc.encode_entities(titles, ["Alpha Beta desc", "Gamma Delta desc"])
    kb = (
        vecs,
        np.array([11, 22], dtype=np.int64),
        titles,
        ["", ""],
        np.zeros(2, dtype=bool),
    )
    r = Retriever(kb, None, top_k=2)
    m = enc.encode_mentions(["Alpha Beta"], ["x"], ["y"])
    batch = pa.table({"encoding": vectors_to_column(m)})
    out = r(batch)
    cands = out.column("candidates").to_pylist()[0]
    assert cands[0]["wikipedia_id"] == 11
    assert cands[0]["score"] > 90


def test_ivf_all_probe_equals_exact():
    """nprobe == n_lists must reproduce exact flat search bit-for-bit
    (same ids, same order, same tie-breaking)."""
    import numpy as np

    from raykg.index import FlatIndex, IvfIndex

    rng = np.random.default_rng(1)
    X = rng.normal(size=(3000, 32)).astype(np.float32)
    wiki = np.arange(3000, dtype=np.int64)
    titles = [str(i) for i in range(3000)]
    flat = FlatIndex(X, wiki, titles)
    ivf = IvfIndex(X, wiki, titles, n_lists=16, nprobe=16)
    Q = rng.normal(size=(200, 32)).astype(np.float32)
    se, ie = flat.search_knn(Q, 7)
    sa, ia = ivf.search_knn(Q, 7)
    assert np.array_equal(ie, ia)
    assert np.allclose(se, sa, atol=1e-5)


def test_ivf_recall_gate_clustered_embeddings():
    """The ANN scale gate: on clustered embeddings (the structure real
    encoder output has), IVF at nprobe=4/64 must hold recall@10 >= 0.98
    vs exact while probing ~1/16 of the corpus."""
    import numpy as np

    from raykg.index import FlatIndex, IvfIndex

    rng = np.random.default_rng(0)
    dim, n, C = 64, 20000, 100
    centers = rng.normal(size=(C, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, C, n)
    X = (centers[lab] + rng.normal(size=(n, dim)) * 0.35 / np.sqrt(dim)).astype(
        np.float32
    )
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    wiki = np.arange(n, dtype=np.int64)
    titles = [str(i) for i in range(n)]
    flat = FlatIndex(X, wiki, titles)
    ivf = IvfIndex(X, wiki, titles, n_lists=64, nprobe=4)
    Q = (centers[rng.integers(0, C, 500)]
         + rng.normal(size=(500, dim)) * 0.35 / np.sqrt(dim)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    _, ie = flat.search_knn(Q, 10)
    _, ia = ivf.search_knn(Q, 10)
    recall = np.mean([len(set(ie[i]) & set(ia[i])) / 10 for i in range(500)])
    assert recall >= 0.98, recall


def test_ivf_underfill_pads_with_minus_one():
    import numpy as np

    from raykg.index import IvfIndex

    rng = np.random.default_rng(2)
    X = rng.normal(size=(5, 8)).astype(np.float32)
    ivf = IvfIndex(X, np.arange(5, dtype=np.int64), list("abcde"),
                   n_lists=2, nprobe=1)
    s, ids = ivf.search_knn(rng.normal(size=(3, 8)).astype(np.float32), 10)
    assert ids.shape == (3, 10)
    # every query got at most one list's rows, rest padded
    assert (ids == -1).any(axis=1).all()
    for r in range(3):
        got = ids[r][ids[r] >= 0]
        assert len(set(got.tolist())) == len(got)  # no dups


def test_ivf_spill_multi_assignment_dedups_and_improves_recall():
    """spill=2 assigns each vector to its 2 nearest lists; search must
    collapse duplicate hits and never return a row twice, and recall at
    fixed nprobe must not drop vs spill=1."""
    import numpy as np

    from raykg.index import FlatIndex, IvfIndex

    rng = np.random.default_rng(3)
    n, dim = 8000, 48
    X = rng.normal(size=(n, dim)).astype(np.float32)
    wiki = np.arange(n, dtype=np.int64)
    titles = [str(i) for i in range(n)]
    flat = FlatIndex(X, wiki, titles)
    Q = rng.normal(size=(200, dim)).astype(np.float32)
    _, ie = flat.search_knn(Q, 10)

    recalls = {}
    for spill in (1, 2):
        meta = IvfIndex.build_meta(X, n_lists=32, spill=spill)
        ivf = IvfIndex(X, wiki, titles, prebuilt=meta, nprobe=8)
        _, ia = ivf.search_knn(Q, 10)
        for r in range(len(Q)):  # no duplicate rows per query
            got = ia[r][ia[r] >= 0]
            assert len(set(got.tolist())) == len(got)
        recalls[spill] = np.mean(
            [len(set(ie[i]) & set(ia[i])) / 10 for i in range(len(Q))]
        )
    assert recalls[2] >= recalls[1] - 1e-9, recalls


def test_ivf_recall_gate_bench_kb_mention_queries():
    """The bench-KB recall gate (VERDICT r2 item 3): hash-encoder KB
    vectors + REAL mention-encoding queries (detect+encode over fixture
    transcripts) must reach recall@10 >= 0.98 at nprobe=16/128 with the
    flagship default spill=3, probing ~0.38x of rows.

    Note an exact re-rank over a wider candidate pool cannot raise
    recall here: IVF first-pass scores are already exact inner products
    over the probed subset — the misses are rows whose list was never
    probed, which multi-assignment (spill) fixes."""
    import glob
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raykg.detect import detect_mentions
    from raykg.encode import HashEncoder, column_to_vectors
    from raykg.fixtures import write_fixture
    from raykg.index import FlatIndex, IvfIndex
    from raykg.pipeline import PipelineConfig

    fx = "/tmp/raykg_recall_fx"
    write_fixture(fx, n_convs=200, n_kb=2000, n_nil=200, n_tomb=50,
                  n_epochs=2, seed=42)
    kb = pq.read_table(os.path.join(fx, "kb.parquet"))
    X = column_to_vectors(kb.column("embedding"))
    n = len(X)
    wiki = np.arange(n, dtype=np.int64)
    titles = [str(i) for i in range(n)]
    flat = FlatIndex(X, wiki, titles)

    parts = sorted(
        glob.glob(os.path.join(fx, "transcripts", "epoch=0", "*.parquet"))
    )
    t = pa.concat_tables(
        [pq.read_table(p, columns=["conv_id", "turn_idx", "text"]) for p in parts]
    )
    det = detect_mentions(t)
    enc = HashEncoder(dim=64)
    Q = enc.encode_mentions(
        det.column("mention").to_pylist(),
        det.column("context_left").to_pylist(),
        det.column("context_right").to_pylist(),
    )
    rng = np.random.default_rng(1)
    Q = Q[rng.choice(len(Q), size=min(800, len(Q)), replace=False)]

    cfg = PipelineConfig()
    meta = IvfIndex.build_meta(X, n_lists=cfg.ivf_lists, spill=cfg.ivf_spill)
    ivf = IvfIndex(X, wiki, titles, prebuilt=meta, nprobe=cfg.ivf_nprobe)
    _, ie = flat.search_knn(Q, 10)
    _, ia = ivf.search_knn(Q, 10)
    recall = np.mean([len(set(ie[i]) & set(ia[i])) / 10 for i in range(len(Q))])
    assert recall >= 0.98, recall
    # the probed fraction stays well under 1 (the approximation is real)
    probed_frac = len(meta[1]) / n * cfg.ivf_nprobe / cfg.ivf_lists
    assert probed_frac <= 0.5, probed_frac


def test_pq_recall_gate_clustered_embeddings():
    """PQ ADC shortlist + exact re-rank: recall@10 >= 0.98 vs exact on
    clustered embeddings while scanning 8-byte codes instead of raw
    vectors; emitted scores are exactly the flat scores of the rows it
    returns."""
    import numpy as np

    from raykg.index import FlatIndex, PqIndex

    rng = np.random.default_rng(1)
    dim, n, C = 64, 20000, 100
    centers = rng.normal(size=(C, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, C, n)
    X = (centers[lab] + rng.normal(size=(n, dim)) * 0.35 / np.sqrt(dim)).astype(
        np.float32
    )
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    wiki = np.arange(n, dtype=np.int64)
    titles = [str(i) for i in range(n)]
    flat = FlatIndex(X, wiki, titles)
    # shortlist must cover the ~200-vector cluster multiplicity
    # (rerank 32 x k 10 = 320 > 200; the documented sizing rule)
    meta = PqIndex.build_meta(X, m=8, rerank=32)
    pq = PqIndex(X, wiki, titles, prebuilt=meta)
    Q = (centers[rng.integers(0, C, 300)]
         + rng.normal(size=(300, dim)) * 0.35 / np.sqrt(dim)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    se, ie = flat.search_knn(Q, 10)
    sa, ia = pq.search_knn(Q, 10)
    recall = np.mean([len(set(ie[i]) & set(ia[i])) / 10 for i in range(300)])
    assert recall >= 0.98, recall
    # scores of returned rows are the exact flat scores (re-rank exact)
    for i in range(0, 300, 50):
        exact_for_rows = X[ia[i]] @ Q[i]
        assert np.allclose(sa[i], exact_for_rows, atol=1e-5)


def test_pq_empty_and_underfill():
    import numpy as np

    from raykg.index import PqIndex

    X = np.zeros((0, 16), dtype=np.float32)
    meta = PqIndex.build_meta(X, m=4)
    idx = PqIndex(X, np.zeros(0, dtype=np.int64), [], prebuilt=meta)
    s, i = idx.search_knn(np.zeros((3, 16), dtype=np.float32), 5)
    assert i.shape == (3, 5) and (i == -1).all()

    X2 = np.eye(3, 16, dtype=np.float32)
    meta2 = PqIndex.build_meta(X2, m=4, rerank=2)
    idx2 = PqIndex(X2, np.arange(3, dtype=np.int64), ["a", "b", "c"],
                   prebuilt=meta2)
    s2, i2 = idx2.search_knn(X2[:1], 5)
    assert i2.shape == (1, 5)
    assert (i2[0, 3:] == -1).all() and i2[0, 0] == 0


def test_hnsw_recall_gate_and_exact_scores():
    """Graph-index family gate (the reference's IndexHNSWFlat
    counterpart): NSW beam search must hold recall@10 >= 0.98 vs exact
    on IID gaussian vectors — the WORST case for a neighbor graph (no
    cluster structure to navigate); clustered encoder output is
    strictly easier. Scores on returned ids must be the exact inner
    products (the aux-dim/recompute contract, faiss_indexer.py:102-125
    + indexer/main.py:138-152, satisfied natively)."""
    import numpy as np

    from raykg.index import FlatIndex, HnswIndex

    rng = np.random.default_rng(3)
    n, dim = 8000, 64
    X = rng.normal(size=(n, dim)).astype(np.float32)
    wiki = np.arange(n, dtype=np.int64)
    titles = [str(i) for i in range(n)]
    meta = HnswIndex.build_meta(X, m=24, ef_construction=128, seed=7)
    h = HnswIndex(X, wiki, titles, prebuilt=meta, ef_search=192)
    flat = FlatIndex(X, wiki, titles)
    Q = rng.normal(size=(300, dim)).astype(np.float32)
    hs, hi = h.search_knn(Q, 10)
    _, fi = flat.search_knn(Q, 10)
    recall = np.mean([len(set(hi[i]) & set(fi[i])) / 10
                      for i in range(len(Q))])
    assert recall >= 0.98, recall
    for r in range(20):
        mask = hi[r] >= 0
        np.testing.assert_allclose(
            hs[r][mask], X[hi[r][mask]] @ Q[r], rtol=1e-5)
    # deterministic build
    meta2 = HnswIndex.build_meta(X, m=24, ef_construction=128, seed=7)
    assert (meta2["neighbors"] == meta["neighbors"]).all()
    assert meta2["entry"] == meta["entry"]


def test_hnsw_underfill_pads_with_minus_one():
    import numpy as np

    from raykg.index import HnswIndex

    rng = np.random.default_rng(5)
    X = rng.normal(size=(4, 8)).astype(np.float32)
    meta = HnswIndex.build_meta(X, m=4, ef_construction=8, seed=1)
    h = HnswIndex(X, np.arange(4), ["a", "b", "c", "d"], prebuilt=meta)
    s, ids = h.search_knn(rng.normal(size=(2, 8)).astype(np.float32), 10)
    assert ids.shape == (2, 10)
    assert (ids[:, 4:] == -1).all()


def test_ivf_balance_splits_fat_lists_and_holds_recall_on_clustered():
    """Opt-in list balancing (``build_meta(balance=...)``): on CLUSTERED
    embeddings — where some natural clusters are much bigger than others
    — splitting fat lists must cut the max fill (the tail-latency
    straggler at cluster scale) while holding recall@10 >= 0.98 vs
    exact, and stay deterministic."""
    import numpy as np

    from raykg.index import FlatIndex, IvfIndex

    rng = np.random.default_rng(11)
    dim, C = 48, 40
    centers = rng.normal(size=(C, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # skewed cluster sizes: a few clusters hold most of the corpus
    sizes = (rng.pareto(1.2, C) + 1.0)
    sizes = (sizes / sizes.sum() * 24000).astype(int) + 50
    lab = np.repeat(np.arange(C), sizes)
    n = len(lab)
    X = (centers[lab] + rng.normal(size=(n, dim)) * 0.3 / np.sqrt(dim)).astype(
        np.float32
    )
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    wiki = np.arange(n, dtype=np.int64)
    titles = [str(i) for i in range(n)]
    Q = (centers[rng.integers(0, C, 400)]
         + rng.normal(size=(400, dim)) * 0.3 / np.sqrt(dim)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    flat = FlatIndex(X, wiki, titles)
    _, fe = flat.search_knn(Q, 10)

    meta_u = IvfIndex.build_meta(X, n_lists=32, seed=5)
    meta_b = IvfIndex.build_meta(X, n_lists=32, seed=5, balance=2.0)
    fill_u = np.diff(meta_u[2]).max()
    fill_b = np.diff(meta_b[2]).max()
    assert len(meta_b[0]) > 32  # something split
    assert fill_b < fill_u  # the straggler list shrank
    # probe the same FRACTION of the partition as the unbalanced index
    npb = -(-6 * len(meta_b[0]) // 32)
    ivf = IvfIndex(X, wiki, titles, prebuilt=meta_b, nprobe=npb)
    _, ia = ivf.search_knn(Q, 10)
    recall = np.mean([len(set(fe[i]) & set(ia[i])) / 10 for i in range(400)])
    assert recall >= 0.98, recall
    # deterministic: same seed -> identical layout
    meta_b2 = IvfIndex.build_meta(X, n_lists=32, seed=5, balance=2.0)
    assert np.array_equal(meta_b[0], meta_b2[0])
    assert np.array_equal(meta_b[1], meta_b2[1])
