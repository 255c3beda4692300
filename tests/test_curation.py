"""Training-data curation ops: PII redaction, vocabulary extraction,
sequence packing, mixture sampling."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raykg.ops.pack import pack_block, pack_sequences, pack_stats
from raykg.ops.redact import PII_PATTERNS, redact_pii, redact_text
from raykg.ops.sample import mixture_sample
from raykg.ops.vocab import top_words, word_frequencies

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- redact
PII_DOCS = [
    "contact alice.smith+spam@example.co.uk or bob@sub.domain.org today",
    "server at 192.168.1.254 fell over; backup is 10.0.0.7",
    "call +1-555-867-5309 or (555) 014-0199 after 5pm",
    "mixed: eve@evil.net from 8.8.8.8 dialed 555-0199 twice",
    "clean text with no pii at all",
    "",
]


def test_redact_text_patterns():
    red, n = redact_text(pa.chunked_array([pa.array(PII_DOCS)]))
    red = red.to_pylist()
    assert "<EMAIL>" in red[0] and "@" not in red[0]
    assert red[1].count("<IP>") == 2
    assert red[2].count("<PHONE>") == 2
    assert "<EMAIL>" in red[3] and "<IP>" in red[3] and "<PHONE>" in red[3]
    assert red[4] == PII_DOCS[4]
    assert red[5] == ""
    assert n.to_pylist() == [2, 2, 2, 3, 0, 0]


def test_redact_matches_duckdb_re2():
    # same RE2 patterns, same sequential order -> bit-identical output
    con = duckdb.connect()
    con.register("t", pa.table({"text": PII_DOCS}))
    expr = "text"
    for _name, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    want = [r[0] for r in con.sql(f"SELECT {expr} FROM t").fetchall()]
    got, _ = redact_text(pa.array(PII_DOCS))
    assert got.to_pylist() == want


def test_redact_pii_dataset():
    ds = rd.from_arrow(pa.table({"doc_id": list(range(6)), "text": PII_DOCS}))
    out = redact_pii(ds).to_pandas().sort_values("doc_id")
    assert list(out.columns) == ["doc_id", "text", "text_redacted", "n_redactions"]
    assert out.n_redactions.sum() == 9


# -------------------------------------------------------------- vocab
def test_word_frequencies_match_pandas():
    texts = ["a b b c", "c c d", "", "a  a"]  # double space -> empty token dropped
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(3)
    got = word_frequencies(ds).to_pandas().set_index("word")["n"].to_dict()
    exp = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                exp[w] = exp.get(w, 0) + 1
    assert got == exp


def test_top_words_matches_duckdb():
    import os
    con = duckdb.connect()
    want = con.sql(
        f"""
        SELECT word, count(*)::BIGINT AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS word
          FROM '{os.path.join(SF, "documents.parquet")}'
        ) WHERE word <> ''
        GROUP BY word ORDER BY n DESC, word LIMIT 25
        """
    ).df()
    ds = rd.read_parquet(os.path.join(SF, "documents.parquet"), columns=["text"])
    got = top_words(ds, k=25)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_top_ngrams_hand_checked_and_partition_invariant():
    from raykg.ops.vocab import top_ngrams

    docs = ["a b c a b", "b c", "x", ""]  # trigrams only from doc 0
    for nparts in (1, 3):
        ds = rd.from_pandas(
            pd.DataFrame({"text": docs})).repartition(nparts)
        bi = top_ngrams(ds, n=2, k=10)
        assert list(map(tuple, bi.to_records(index=False))) == [
            ("a b", 2), ("b c", 2), ("c a", 1)]
        tri = top_ngrams(ds, n=3, k=10)
        assert list(map(tuple, tri.to_records(index=False))) == [
            ("a b c", 1), ("b c a", 1), ("c a b", 1)]


# --------------------------------------------------------------- pack
def _ffd_reference(ids, toks, budget):
    """Independent oracle: naive FFD, dict-of-lists."""
    order = sorted(range(len(ids)), key=lambda i: (-min(toks[i], budget), ids[i]))
    packs = []  # (remaining, [ids])
    assign = {}
    for i in order:
        t = min(toks[i], budget)
        for p in packs:
            if p[0] >= t:
                p[0] -= t
                p[1].append(ids[i])
                break
        else:
            packs.append([budget - t, [ids[i]]])
    for p in packs:
        key = min(p[1])
        for s, d in enumerate(p[1]):
            assign[d] = (key, s)
    return assign


def test_pack_block_matches_reference_ffd():
    rng = np.random.default_rng(5)
    ids = rng.permutation(np.arange(100, 300))
    toks = rng.integers(1, 300, len(ids))  # some exceed budget 256
    ids_o, toks_o, trunc_o, pack_id, slot = pack_block(ids, toks, 256)
    exp = _ffd_reference(ids.tolist(), toks.tolist(), 256)
    for d, t, tr, p, s in zip(ids_o, toks_o, trunc_o, pack_id, slot):
        assert exp[d] == (p, s)
        assert t == min(toks[list(ids).index(d)], 256)
        assert tr == (toks[list(ids).index(d)] > 256)


def test_pack_sequences_invariants():
    rng = np.random.default_rng(9)
    n = 5000
    df = pd.DataFrame({"doc_id": np.arange(n),
                       "n_tok": rng.integers(1, 600, n)})
    ds = rd.from_pandas(df).repartition(8)
    out = pack_sequences(ds, token_col="n_tok", id_col="doc_id",
                         budget=512).to_pandas()
    # every doc exactly once
    assert sorted(out.doc_id) == list(range(n))
    per_pack = out.groupby("pack_id")["n_tokens"].sum()
    assert (per_pack <= 512).all()
    # slots contiguous from 0 in every pack
    for _, g in out.groupby("pack_id"):
        assert sorted(g.slot) == list(range(len(g)))
    # pack ids are member ids (uniqueness across blocks comes free)
    assert set(per_pack.index) <= set(out.doc_id)
    stats = pack_stats(out, 512)
    assert stats["fill_ratio"] > 0.9  # FFD on a big population packs tight
    assert out.truncated.sum() == (df.n_tok > 512).sum()


# ------------------------------------------------------------- sample
def test_mixture_sample_matches_duckdb():
    import os
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0}
    ds = rd.read_parquet(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "source"])
    got = (
        mixture_sample(ds, key_col="source", id_col="doc_id", rates=rates,
                       default_rate=0.125)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    case = ("CASE source WHEN 'src0' THEN 4294967296 WHEN 'src1' THEN 2147483648 "
            "WHEN 'src2' THEN 1073741824 WHEN 'src3' THEN 0 ELSE 536870912 END")
    want = duckdb.sql(
        f"""
        SELECT doc_id, source FROM '{os.path.join(SF, "documents.parquet")}'
        WHERE (doc_id * 2654435761) % 4294967296 < {case}
        ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # excluded domain really excluded; rates roughly honored
    assert not (got.source == "src3").any()


def test_mixture_sample_stable_under_partitioning():
    df = pd.DataFrame({"id": np.arange(2000),
                       "dom": np.where(np.arange(2000) % 2 == 0, "a", "b")})
    r = {"a": 0.5, "b": 0.25}
    one = mixture_sample(rd.from_pandas(df), "dom", "id", r).to_pandas()
    many = mixture_sample(rd.from_pandas(df).repartition(16), "dom", "id",
                          r).to_pandas()
    assert sorted(one.id) == sorted(many.id)


# ------------------------------------------------------ repetition
def test_repetition_stats_matches_manual():
    from raykg.ops.textstats import repetition_stats

    docs = ["a a a b", "x y z", "", "q q", "one  two"]  # double space
    ds = rd.from_arrow(pa.table({"doc_id": list(range(5)), "text": docs}))
    got = (repetition_stats(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.n_tokens.tolist() == [4, 3, 0, 2, 2]
    assert got.dup_token_frac.tolist() == [0.5, 0.0, 0.0, 0.5, 0.0]
    assert got.top_token_frac.tolist() == [0.75, round(1 / 3, 6), 0.0, 1.0, 0.5]
    assert got.mean_token_len.tolist() == [1.0, 1.0, 0.0, 1.0, 3.0]


# ------------------------------------------------------ decontam
BENCH_TXT = ["the quick brown fox jumps over the lazy sleeping dog tonight"]


def _brute_contaminated(corpus, bench, n):
    bgrams = set()
    for b in bench:
        ws = b.lower().split()
        bgrams |= {tuple(ws[i:i + n]) for i in range(len(ws) - n + 1)}
    out = []
    for t in corpus:
        ws = t.lower().split()
        grams = {tuple(ws[i:i + n]) for i in range(len(ws) - n + 1)}
        out.append(bool(grams & bgrams))
    return out


def test_decontaminate_matches_bruteforce():
    from raykg.ops.decontam import decontaminate

    corpus = [
        # shares an 8-gram with the benchmark
        "intro text the quick brown fox jumps over the lazy sleeping cat",
        # 7-gram overlap only -> clean at n=8
        "quick brown fox jumps over the lazy dances",
        "completely unrelated document about ray data pipelines",
        "the quick brown fox",  # shorter than n -> clean
        "",
    ]
    exp = _brute_contaminated(corpus, BENCH_TXT, 8)
    assert exp == [True, False, False, False, False]
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(corpus))), "text": corpus})
    ).repartition(3)
    kept = decontaminate(ds, BENCH_TXT, n=8).to_pandas()
    dirty = decontaminate(ds, BENCH_TXT, n=8, invert=True).to_pandas()
    assert sorted(kept.doc_id) == [i for i, d in enumerate(exp) if not d]
    assert sorted(dirty.doc_id) == [i for i, d in enumerate(exp) if d]


def test_decontaminate_removes_planted_dups():
    """On the synthetic corpus, docs sharing 8-grams with the
    'benchmark' slice (every 97th doc, incl. its planted duplicates)
    must go; brute force over the small sf confirms exact agreement."""
    import os
    import pyarrow.parquet as pq

    from raykg.ops.decontam import decontaminate

    path = os.path.join(SF, "documents.parquet")
    tbl = pq.read_table(path, columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_pylist()
    txt = tbl.column("text").to_pylist()
    bench = [t for i, t in zip(ids, txt) if i % 97 == 0]
    exp_dirty = _brute_contaminated(txt, bench, 8)
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    kept = decontaminate(ds, bench, n=8).to_pandas()
    assert sorted(kept.doc_id) == sorted(
        i for i, d in zip(ids, exp_dirty) if not d
    )
    assert len(kept) < len(ids)  # something was actually removed


# ----------------------------------------------------------- sketch
def test_hll_global_within_error_bound():
    from raykg.ops.sketch import hll_count_distinct

    n = 50_000
    vals = np.concatenate([np.arange(n), np.arange(n // 2)])  # dups
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    est = hll_count_distinct(ds, "v", p=12)["approx_n"].iloc[0]
    assert abs(est - n) / n < 3 * 1.04 / np.sqrt(1 << 12)  # 3 sigma


def test_hll_string_values_and_partition_invariance():
    from raykg.ops.sketch import hll_count_distinct

    vals = [f"user-{i % 3000}" for i in range(20_000)]
    t = pa.table({"v": vals})
    a = hll_count_distinct(rd.from_arrow(t), "v", p=12)["approx_n"].iloc[0]
    b = hll_count_distinct(rd.from_arrow(t).repartition(16), "v",
                           p=12)["approx_n"].iloc[0]
    assert a == b  # max is associative: estimate is partition-invariant
    assert abs(a - 3000) / 3000 < 3 * 1.04 / np.sqrt(1 << 12)


def test_hll_grouped_close_to_exact():
    from raykg.ops.sketch import hll_count_distinct

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "k": rng.integers(0, 20, 30_000),
        "v": rng.integers(0, 500, 30_000),
    })
    got = (hll_count_distinct(rd.from_pandas(df).repartition(8), "v",
                              key_col="k", p=12)
           .sort_values("k").reset_index(drop=True))
    exact = df.groupby("k")["v"].nunique()
    for _, row in got.iterrows():
        e = exact[row["k"]]
        # small-cardinality groups sit in the linear-counting regime:
        # within 1 count of exact barring a register collision
        assert abs(row["approx_n"] - e) <= max(2, 0.05 * e)


def test_approx_grouped_quantiles_rank_error():
    from raykg.ops.sketch import approx_grouped_quantiles

    rng = np.random.default_rng(17)
    n = 200_000
    df = pd.DataFrame({
        "id": np.arange(n),
        "k": rng.integers(0, 5, n),
        "v": rng.lognormal(0.0, 2.0, n),  # heavy-tailed
    })
    got = approx_grouped_quantiles(
        rd.from_pandas(df).repartition(8), key_col="k", val_col="v",
        id_col="id", qs=(0.5, 0.95), rate=0.05,
    ).to_pandas().set_index("k")
    # judge in RANK space: the approximate quantile's true rank must sit
    # within the DKW band for the realized per-key sample size
    for k, g in df.groupby("k"):
        vals = np.sort(g["v"].to_numpy())
        m = 0.05 * len(g)
        tol = 1.5 / np.sqrt(m)  # ~3x DKW 95% bound, margin for variance
        for q, col in ((0.5, "q50"), (0.95, "q95")):
            est = got.loc[k, col]
            rank = np.searchsorted(vals, est) / len(vals)
            assert abs(rank - q) < tol, (k, col, rank, q, tol)


def test_approx_grouped_quantiles_deterministic():
    from raykg.ops.sketch import approx_grouped_quantiles

    df = pd.DataFrame({"id": np.arange(50_000),
                       "k": np.arange(50_000) % 3,
                       "v": np.arange(50_000) * 0.5})
    a = approx_grouped_quantiles(rd.from_pandas(df), "k", "v", "id",
                                 rate=0.1).to_pandas().sort_values("k")
    b = approx_grouped_quantiles(rd.from_pandas(df).repartition(16), "k",
                                 "v", "id", rate=0.1
                                 ).to_pandas().sort_values("k")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


# ------------------------------------------------- incremental dedup
def test_incremental_exact_dedup(tmp_path):
    from raykg.ops.incdedup import incremental_exact_dedup

    state = str(tmp_path / "dedup_state")
    inc1 = pd.DataFrame({
        "doc_id": np.arange(100),
        "text": [f"doc {i % 80}" for i in range(100)],  # 20 internal dups
    })
    kept1 = (incremental_exact_dedup(
        rd.from_pandas(inc1).repartition(4), state, "inc1")
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(kept1) == 80
    assert kept1.doc_id.tolist() == list(range(80))  # min id per text

    inc2 = pd.DataFrame({
        "doc_id": np.arange(100, 200),
        # 50 repeats of history, 30 novel (with 20 internal dups among them)
        "text": [f"doc {i % 50}" for i in range(50)]
        + [f"new {i % 30}" for i in range(50)],
    })
    kept2 = (incremental_exact_dedup(
        rd.from_pandas(inc2).repartition(4), state, "inc2")
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(kept2) == 30
    assert kept2.text.str.startswith("new").all()

    # retry idempotence: same increment id reproduces the same answer
    kept2b = (incremental_exact_dedup(
        rd.from_pandas(inc2).repartition(2), state, "inc2")
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(kept2, kept2b)

    # a third increment sees both histories
    inc3 = pd.DataFrame({
        "doc_id": [500, 501, 502],
        "text": ["doc 0", "new 0", "fresh"],
    })
    kept3 = incremental_exact_dedup(
        rd.from_pandas(inc3), state, "inc3").to_pandas()
    assert kept3.text.tolist() == ["fresh"]

    # union of kept sets == global exact dedup of the concatenation
    # (ids increase across increments, so min-id choices agree)
    from raykg.ops.dedup import exact_dedup
    full = pd.concat([inc1, inc2, inc3], ignore_index=True)
    glob = exact_dedup(rd.from_pandas(full)).to_pandas()
    inc_union = pd.concat([kept1, kept2, kept3], ignore_index=True)
    assert sorted(inc_union.doc_id) == sorted(glob.doc_id)


def test_incremental_minhash_dedup(tmp_path):
    from raykg.ops.incdedup import incremental_minhash_dedup

    state = str(tmp_path / "mh_state")
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    # genuinely dissimilar docs: disjoint random word salads (template
    # texts differing only in a number ARE near-dups at char shingles)
    _rng = np.random.default_rng(31)
    _vocab = [f"w{c}{i}" for c in "abcdefghij" for i in range(40)]
    uniq = [" ".join(_rng.choice(_vocab, 25, replace=False))
            for _ in range(20)]

    inc1 = pd.DataFrame({
        "doc_id": np.arange(100, 120),
        "text": [base] + uniq[:19],
    })
    p1 = incremental_minhash_dedup(
        rd.from_pandas(inc1).repartition(3), state, "inc1",
        threshold=0.5).to_pandas()
    assert len(p1) == 0  # nothing similar within increment 1

    inc2 = pd.DataFrame({
        "doc_id": np.arange(200, 205),
        "text": [
            base,                                   # exact dup of history
            base.replace("dog", "cat"),             # near dup of history
            "completely fresh content about ray data streaming executors",
            "completely fresh content about ray data streaming executors",
            uniq[5],                                # exact dup of history
        ],
    })
    p2 = (incremental_minhash_dedup(
        rd.from_pandas(inc2).repartition(2), state, "inc2", threshold=0.5)
        .to_pandas().sort_values(["id_new", "id_match"])
        .reset_index(drop=True))
    got = set(zip(p2.id_new, p2.id_match))
    assert (200, 100) in got        # exact historical dup
    assert (201, 100) in got        # near historical dup
    assert (204, 106) in got        # uniq[5] -> historical id 106
    assert (202, 203) in got        # within-increment exact dup (a < b)
    assert (200, 201) in got        # within-increment near dup
    exact = p2.set_index(["id_new", "id_match"]).est_jaccard
    assert exact[(200, 100)] == 1.0
    assert exact[(202, 203)] == 1.0
    assert 0.5 <= exact[(201, 100)] <= 1.0
    # id_new always belongs to this increment
    assert (p2.id_new >= 200).all()

    # retry idempotence
    p2b = (incremental_minhash_dedup(
        rd.from_pandas(inc2).repartition(4), state, "inc2", threshold=0.5)
        .to_pandas().sort_values(["id_new", "id_match"])
        .reset_index(drop=True))
    pd.testing.assert_frame_equal(p2, p2b)


# ------------------------------------------------------------ shuffle
def test_deterministic_shuffle():
    from raykg.ops.sample import deterministic_shuffle

    df = pd.DataFrame({"id": np.arange(5000), "v": np.arange(5000) * 2})
    a = deterministic_shuffle(rd.from_pandas(df), "id", seed=1).to_pandas()
    b = deterministic_shuffle(rd.from_pandas(df).repartition(16), "id",
                              seed=1).to_pandas()
    # same permutation regardless of input partitioning
    assert a.id.tolist() == b.id.tolist()
    # it IS a permutation, and values ride along
    assert sorted(a.id) == list(range(5000))
    assert (a.v.to_numpy() == a.id.to_numpy() * 2).all()
    # different seed -> different order; order is genuinely mixed
    c = deterministic_shuffle(rd.from_pandas(df), "id", seed=2).to_pandas()
    assert c.id.tolist() != a.id.tolist()
    assert abs(np.corrcoef(a.id, np.arange(5000))[0, 1]) < 0.05
    # any contiguous slice draws uniformly from the id range
    head = a.id.to_numpy()[:500]
    assert 0.15 < (head < 1000).mean() < 0.25  # ~0.2 expected


# ----------------------------------------------------------------- pq
def test_knn_pq_recall_vs_bruteforce():
    from raykg.ops.pq import knn_pq
    from raykg.ops.similarity import knn_bruteforce

    rng = np.random.default_rng(23)
    # clustered embeddings (the realistic regime for encoder outputs)
    n_clusters, per, d = 40, 100, 64
    centers = rng.normal(size=(n_clusters, d)) * 3
    X = (centers.repeat(per, axis=0)
         + rng.normal(size=(n_clusters * per, d)) * 0.4)
    ids = np.arange(len(X), dtype=np.int64)
    tbl = pa.table({
        "vec_id": ids,
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(X.reshape(-1).astype(np.float32)), d),
    })
    ds = rd.from_arrow(tbl).repartition(6)
    Q = X[rng.choice(len(X), 12, replace=False)] + rng.normal(size=(12, d)) * 0.1
    qids = np.arange(12, dtype=np.int64)

    exact = knn_bruteforce(ds, Q, qids, k=10).to_pandas()
    # rerank sized to the cluster multiplicity (100 near-identical
    # vectors per cluster): the shortlist must cover the cluster, since
    # ADC can't resolve the tiny sim gaps within it (corr 0.99 yet
    # fine-order scrambled — the documented PQ resolution limit)
    approx = knn_pq(ds, Q, qids, k=10, m=8, ks=64, rerank=10).to_pandas()
    hits = 0
    for q in qids:
        e = set(exact[exact.qid == q].vec_id)
        a = set(approx[approx.qid == q].vec_id)
        hits += len(e & a) / len(e)
    recall = hits / len(qids)
    assert recall >= 0.85, recall


def test_pq_encode_roundtrip_quality():
    from raykg.ops.pq import _encode, train_pq_codebooks
    from raykg.ops.similarity import _normalize

    rng = np.random.default_rng(7)
    X = _normalize(rng.normal(size=(1500, 32)))
    books = train_pq_codebooks(X, m=4, ks=64)
    codes = _encode(X, books)
    assert codes.shape == (1500, 4) and codes.max() < 64
    # reconstruction correlates with the original (sanity of training)
    recon = np.concatenate(
        [books[j][codes[:, j]] for j in range(4)], axis=1)
    sims = (X * _normalize(recon)).sum(axis=1)
    assert sims.mean() > 0.5, sims.mean()


def test_sample_k_per_key_matches_duckdb_and_is_uniformish():
    from raykg.ops.sample import sample_k_per_key

    rng = np.random.default_rng(29)
    df = pd.DataFrame({
        "dom": rng.choice(["a", "b", "c"], 9000, p=[0.8, 0.15, 0.05]),
        "id": np.arange(9000, dtype=np.int64),
    })
    got = (sample_k_per_key(rd.from_pandas(df).repartition(8), "dom", "id",
                            k=100, seed=3)
           .to_pandas().sort_values(["dom", "id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql("""
        SELECT dom, id FROM (
          SELECT dom, id, row_number() OVER (
            PARTITION BY dom
            ORDER BY ((id + 3) * 2654435761) % 4294967296, id) AS rn
          FROM t) WHERE rn <= 100
        ORDER BY dom, id
    """).df()
    pd.testing.assert_frame_equal(got, want[["dom", "id"]],
                                  check_dtype=False)
    # exactly k per key; roughly uniform over each key's id range
    sizes = got.groupby("dom").size()
    assert (sizes == 100).all()
    a_ids = got[got.dom == "a"].id.to_numpy()
    assert 0.35 < (a_ids < 4500).mean() < 0.65


def test_heavy_hitters_zipf_exact():
    """Cheap path (certificate holds): Zipf-skewed keys, result equals
    the exact pandas top-k with (count desc, key asc) ties."""
    from raykg.ops.heavy import heavy_hitters

    rng = np.random.default_rng(41)
    keys = (rng.zipf(1.3, 60_000) % 5000).astype(np.int64)
    df = pd.DataFrame({"k": keys})
    got = heavy_hitters(rd.from_pandas(df).repartition(16), "k", k=10)
    exp = (df.groupby("k", as_index=False).size()
           .rename(columns={"size": "n"})
           .sort_values(["n", "k"], ascending=[False, True],
                        kind="mergesort")
           .head(10).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64", "n": "int64"}),
        exp.astype({"k": "int64", "n": "int64"}))


def test_heavy_hitters_uniform_fallback_exact():
    """Near-uniform keys: the certificate CANNOT hold (no heavy
    hitters), so the full-groupby fallback must fire and the output is
    still the exact top-k."""
    from raykg.ops.heavy import heavy_hitters

    rng = np.random.default_rng(43)
    # 4000 distinct keys, ~5 rows each; m=16 makes the cheap path's
    # candidate set provably insufficient
    df = pd.DataFrame({"k": rng.integers(0, 4000, 20_000).astype(np.int64)})
    got = heavy_hitters(rd.from_pandas(df).repartition(8), "k", k=10, m=16)
    exp = (df.groupby("k", as_index=False).size()
           .rename(columns={"size": "n"})
           .sort_values(["n", "k"], ascending=[False, True],
                        kind="mergesort")
           .head(10).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64", "n": "int64"}),
        exp.astype({"k": "int64", "n": "int64"}))


def test_heavy_hitters_string_keys_partition_invariant():
    from raykg.ops.heavy import heavy_hitters

    rng = np.random.default_rng(47)
    words = np.array([f"w{i}" for i in range(300)])
    keys = words[np.minimum(rng.zipf(1.5, 8000) - 1, 299)]
    df = pd.DataFrame({"w": keys})
    outs = [
        heavy_hitters(rd.from_pandas(df).repartition(p), "w", k=5)
        for p in (1, 4, 32)
    ]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    exp = (df.groupby("w", as_index=False).size()
           .rename(columns={"size": "n"})
           .sort_values(["n", "w"], ascending=[False, True],
                        kind="mergesort")
           .head(5).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], exp, check_dtype=False)


def test_normalize_text_matches_duckdb():
    from raykg.ops.textstats import normalize_text

    texts = ["  Hello   WORLD ", "tab\tsep\nlines", "", "Ümlaut ÄÖÜ  mix",
             "already clean"]
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                       "text": texts})
    got = (normalize_text(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql("""
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS text_norm
        FROM t ORDER BY doc_id
    """).df()
    assert got["text_norm"].tolist() == want["text_norm"].tolist()


def test_bm25_matches_reference():
    from raykg.ops.bm25 import bm25_reference, bm25_topk

    docs = [
        "the quick brown fox jumps over the lazy dog",
        "a fast auburn fox vaulted a sleepy hound",
        "quick sort and merge sort are sorting algorithms",
        "the dog barks at the quick cat",
        "completely unrelated text about databases",
        "fox fox fox fox",  # tf saturation case
        "",
    ]
    ids = list(range(len(docs)))
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": docs})
                        ).repartition(3)
    queries = ["quick fox", "sorting databases", "zebra"]
    got = bm25_topk(ds, queries, k=4).to_pandas()
    for qi, q in enumerate(queries):
        want = bm25_reference(docs, ids, q, k=4)
        sub = got[got.qid == qi].sort_values("rank")
        assert sub.doc_id.tolist() == [d for d, _ in want], q
        assert np.allclose(sub.score.to_numpy(),
                           [s for _, s in want]), q
    # absent term ranks nothing
    assert (got.qid == 2).sum() == 0


def test_percent_rank_ntile_with_ties_vs_duckdb():
    """percent_rank with TIED order values (peers share rank) and
    ntile's uneven-bucket split, vs DuckDB window functions."""
    from raykg.ops.wfuncs import grouped_window

    rng = np.random.default_rng(73)
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n),
        "v": rng.integers(0, 12, n),  # small range forces ties
        "id": np.arange(n, dtype=np.int64),
    })
    got = (grouped_window(
        rd.from_pandas(df).repartition(5),
        key="k", order="v", tiebreak="id",
        specs=[{"op": "percent_rank", "col": "v", "name": "pr"},
               {"op": "ntile", "n": 3, "name": "t"}],
    ).to_pandas().sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql("""
        SELECT id,
               percent_rank() OVER (PARTITION BY k ORDER BY v) AS pr,
               ntile(3) OVER (PARTITION BY k ORDER BY v, id) AS t
        FROM t ORDER BY id
    """).df()
    assert np.allclose(got["pr"], want["pr"])
    assert (got["t"].to_numpy() == want["t"].to_numpy()).all()


def test_resample_ffill_edges_vs_duckdb():
    """Tied timestamps (tiebreak pins the later event_id), fill before
    the first event, single-event keys — vs the DuckDB grid oracle."""
    from raykg.ops.windows import resample_ffill

    ts = pd.to_datetime([
        "2024-01-01 00:30", "2024-01-01 02:10", "2024-01-01 02:10",
        "2024-01-01 05:00",
        "2024-01-02 03:45",
    ])
    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2],
        "ts": ts,
        "eid": [10, 11, 12, 13, 14],
        "v": [1.0, 2.0, 3.0, 4.0, 9.0],
    })
    got = (resample_ffill(rd.from_pandas(df).repartition(3), "k", "ts",
                          "v", "eid", every="1h")
           .to_pandas().sort_values(["k", "gts"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql("""
        WITH b AS (
          SELECT k, date_trunc('hour', min(ts)) t0, max(ts) t1
          FROM t GROUP BY k
        ), grid AS (
          SELECT k, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) gts
          FROM b
        ), ranked AS (
          SELECT g.k, g.gts, e.v,
                 row_number() OVER (PARTITION BY g.k, g.gts
                                    ORDER BY e.ts DESC, e.eid DESC) rn
          FROM grid g LEFT JOIN t e ON e.k = g.k AND e.ts <= g.gts
        )
        SELECT k, gts, COALESCE(v, -1.0) AS v FROM ranked WHERE rn = 1
        ORDER BY k, gts
    """).df()
    assert got["gts"].astype("datetime64[ns]").tolist() == \
        want["gts"].astype("datetime64[ns]").tolist()
    assert np.allclose(got["v"], want["v"])
    # explicit pins: first grid point (00:00) precedes the first event
    k1 = got[got.k == 1]
    assert k1["v"].iloc[0] == -1.0
    # the 03:00 point after the tied 02:10 events takes eid=12's value
    tied = k1[k1["gts"] == pd.Timestamp("2024-01-01 03:00")]
    assert tied["v"].iloc[0] == 3.0


def test_weighted_sample_k_deterministic_and_weight_biased():
    from raykg.ops.sample import weighted_sample_k

    n = 4000
    df = pd.DataFrame({"id": np.arange(n),
                       "w": np.where(np.arange(n) < 200, 50.0, 1.0)})
    df.loc[5, "w"] = 0.0     # excluded
    df.loc[6, "w"] = -1.0    # excluded
    # numpy reference: identical priority expression
    h = ((df.id.to_numpy().astype(np.uint64) + np.uint64(3))
         * np.uint64(2654435761)) % np.uint64(1 << 32)
    u = (h.astype(np.float64) + 1.0) / float(1 << 32)
    w = df.w.to_numpy()
    pri = np.where(w > 0, np.log(u) / w, -np.inf)
    want = set(np.argsort(-pri, kind="stable")[:300].tolist())
    got_sets = []
    for parts in (1, 6):
        got = weighted_sample_k(rd.from_pandas(df).repartition(parts),
                                "id", "w", k=300, seed=3).to_pandas()
        got_sets.append(set(got.id.tolist()))
    assert got_sets[0] == got_sets[1] == want
    assert 5 not in want and 6 not in want
    # the 5% of rows carrying 50x weight should dominate the sample
    heavy = sum(1 for i in want if i < 200)
    assert heavy > 150


def test_chunk_documents_matches_python_reference():
    from raykg.ops.chunk import chunk_documents

    size, stride = 10, 7
    texts = ["", "short", "x" * 10, "y" * 11, "z" * 17, "w" * 18,
             "aé漢x🎉z" * 4, "exactly_17_chars!!"[:17], None]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (chunk_documents(rd.from_pandas(df).repartition(3),
                           size=size, stride=stride)
           .to_pandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    want = []
    for i, t in enumerate(texts):
        if not t:
            continue
        n = 1 + max(0, -(-(len(t) - size) // stride))
        for c in range(n):
            want.append((i, c, c * stride, t[c * stride:c * stride + size]))
    assert list(zip(got.doc_id, got.chunk_idx, got.offset, got.chunk)) == want


def test_rebalance_equalizes_expected_counts():
    from raykg.ops.sample import rebalance

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "id": np.arange(30000),
        "dom": np.repeat(["big", "mid", "small"], [24000, 5000, 1000]),
    })
    got = rebalance(rd.from_pandas(df).repartition(6), "dom", "id",
                    seed=2).to_pandas()
    counts = got["dom"].value_counts()
    assert counts["small"] == 1000                 # rate 1.0, all kept
    for d in ("big", "mid"):
        assert abs(counts[d] - 1000) < 150         # ~equal expectation
    again = rebalance(rd.from_pandas(df).repartition(2), "dom", "id",
                      seed=2).to_pandas()
    assert set(got.id) == set(again.id)            # partition-stable


def test_top_k_per_key_keep_ties_matches_rank_semantics():
    from raykg.ops.rank import top_k_per_key

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 2000),
        "id": np.arange(2000),
        "v": rng.integers(0, 12, 2000),  # heavy ties
    })
    for parts in (1, 5):
        got = (top_k_per_key(rd.from_pandas(df).repartition(parts),
                             "k", "v", "id", k=3, keep_ties=True)
               .to_pandas())
        for key, g in df.groupby("k"):
            r = g["v"].rank(method="min", ascending=False)
            want = set(g.loc[r <= 3, "id"])
            assert set(got.loc[got.k == key, "id"]) == want, (key, parts)
    # without ties the old row_number contract is unchanged
    got2 = (top_k_per_key(rd.from_pandas(df), "k", "v", "id", k=3)
            .to_pandas())
    assert got2.groupby("k").size().eq(3).all()


def test_ffd_tree_matches_scan_exactly():
    """The segment-tree first-fit (large-block path) must make the
    IDENTICAL pack choice as the argmax scan for every item — first
    fit is leftmost, and the tree descends leftmost-sufficient.
    Includes zero-token docs (must join the first OPEN pack, never an
    unopened leaf) and over-budget handling upstream."""
    from raykg.ops.pack import _ffd_scan, _ffd_tree

    rng = np.random.default_rng(77)
    for _ in range(20):
        n = int(rng.integers(1, 2000))
        budget = int(rng.integers(10, 1500))
        toks = np.minimum(
            np.sort(rng.integers(0, budget + 5, n))[::-1], budget
        ).astype(np.int64)
        a, na = _ffd_scan(toks, budget)
        b, nb = _ffd_tree(toks, budget)
        assert na == nb
        assert (a == b).all()
    toks = np.zeros(7, np.int64)
    a, na = _ffd_scan(toks, 4)
    b, nb = _ffd_tree(toks, 4)
    assert na == nb == 1 and (a == b).all()


def test_pack_block_large_uses_tree_and_holds_invariants():
    """A block past _TREE_FFD_MIN routes through the tree and still
    satisfies the packing invariants (each doc once, no pack over
    budget)."""
    import raykg.ops.pack as pk

    rng = np.random.default_rng(5)
    n = pk._TREE_FFD_MIN + 500
    ids = np.arange(n, dtype=np.int64)
    toks = rng.integers(1, 900, n).astype(np.int64)
    ids_o, toks_o, trunc_o, pack_id, slot = pk.pack_block(ids, toks, 1000)
    assert sorted(ids_o.tolist()) == ids.tolist()
    df = pd.DataFrame({"pack_id": pack_id, "n": toks_o})
    assert (df.groupby("pack_id")["n"].sum() <= 1000).all()
    # pinned vs the scan path on the same input
    a, na = pk._ffd_scan(np.minimum(
        toks[np.lexsort((ids, -toks))], 1000), 1000)
    b, nb = pk._ffd_tree(np.minimum(
        toks[np.lexsort((ids, -toks))], 1000), 1000)
    assert na == nb and (a == b).all()


def test_rebalance_high_cardinality_key_raises():
    # the per-key rate table broadcasts to every task: a near-unique
    # key (user_id at 100 TB) must raise, not materialize O(rows) on
    # the driver
    from raykg.ops.sample import rebalance

    df = pd.DataFrame({"id": np.arange(500),
                       "k": [f"u{i}" for i in range(500)]})
    with pytest.raises(ValueError, match="distinct keys"):
        rebalance(rd.from_pandas(df).repartition(4), "k", "id",
                  max_keys=100)
    # at/below the cap it still works
    out = rebalance(rd.from_pandas(df).repartition(4), "k", "id",
                    max_keys=500).to_pandas()
    assert len(out) == 500  # every key unique -> min_count=1, all kept
