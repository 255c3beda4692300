import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from raykg.ops.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    jaccard_ngrams,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_pairs,
    simhash_signatures,
)
from raykg.ops.multimodal import (
    DecodeStage,
    FrameSampleStage,
    ResizeStage,
    synth_media_table,
)
from raykg.ops.similarity import build_ivf, knn_bruteforce, knn_ivf
from raykg.ops.textstats import (
    LangId,
    QualityScorer,
    fingerprint,
    token_count_whitespace,
)

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",  # exact dup of 0
    "the quick brown fox jumped over the lazy dog",  # near dup
    "completely different content about databases and queries",
    "der hund und die katze sind nicht im haus",
    "",
]


def _docs_ds():
    return rd.from_arrow(
        pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS})
    )


def test_exact_dedup():
    out = exact_dedup(_docs_ds()).to_pandas()
    assert sorted(out.doc_id) == [0, 2, 3, 4, 5]  # doc 1 removed, min id kept
    assert set(out.columns) == {"doc_id", "text"}


def test_minhash_estimates_jaccard():
    sigs = minhash_signatures(DOCS[:4], num_perm=256)
    est = (sigs[0] == sigs[2]).mean()
    true = jaccard_ngrams(DOCS[0], DOCS[2])
    assert abs(est - true) < 0.15
    assert (sigs[0] == sigs[1]).all()  # identical docs -> identical sigs


def test_minhash_lsh_finds_near_dups():
    pairs = minhash_lsh_pairs(_docs_ds(), threshold=0.5).to_pandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    assert (0, 1) in found
    assert (0, 2) in found
    assert (0, 3) not in found
    assert (pairs.jaccard >= 0.5).all()


def test_simhash_pairs():
    pairs = simhash_pairs(_docs_ds(), max_hamming=3).to_pandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    assert (0, 1) in found  # identical docs, hamming 0
    s = simhash_signatures(DOCS)
    assert s[0] == s[1]


def test_embedding_cosine_pairs():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(5, 16)).astype(np.float32)
    vecs = np.concatenate([base, base[:2] + 0.001])  # 5,6 dup 0,1
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": list(range(7)),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], type=pa.list_(pa.float32())
                ),
            }
        )
    )
    pairs = embedding_cosine_pairs(ds, threshold=0.99).to_pandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    assert (0, 5) in found and (1, 6) in found
    assert all(a < b for a, b in found)


def test_knn_bruteforce_vs_numpy():
    rng = np.random.default_rng(1)
    M = rng.normal(size=(50, 8))
    ids = np.arange(50, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array(
                    [v.tolist() for v in M.astype(np.float32)],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
    ).repartition(4)
    Q = M[:3]
    out = knn_bruteforce(ds, Q, ids[:3], k=5).to_pandas()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    # oracle in float64 on float32-rounded inputs, matching the op
    M32 = M.astype(np.float32).astype(np.float64)
    M32n = M32 / np.linalg.norm(M32, axis=1, keepdims=True)
    sims = (M32n[:3]) @ M32n.T
    for qi in range(3):
        want = np.lexsort((ids, -sims[qi]))[:5]
        got = out[out.qid == qi].sort_values("rank").vec_id.to_numpy()
        np.testing.assert_array_equal(got, want)
    assert out.groupby("qid").size().eq(5).all()


def test_ivf_recall_reasonable():
    rng = np.random.default_rng(2)
    M = rng.normal(size=(200, 8)).astype(np.float32)
    ids = np.arange(200, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array(
                    [v.tolist() for v in M], type=pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(4)
    centers, assigned = build_ivf(ds, n_lists=8)
    got = knn_ivf(assigned, centers, M[:5], ids[:5], k=3, nprobe=4).to_pandas()
    brute = knn_bruteforce(ds, M[:5], ids[:5], k=3).to_pandas()
    inter = len(
        set(zip(got.qid, got.vec_id)) & set(zip(brute.qid, brute.vec_id))
    )
    assert inter / len(brute) > 0.5  # probing half the lists


def test_token_count_matches_duckdb():
    import duckdb

    texts = ["a b  c", " x ", "", "one", "tab\tsep words"]
    got = token_count_whitespace(pd.Series(texts)).tolist()
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CASE WHEN trim(?) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(?), '\\s+')) END",
            [t, t],
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want


def test_quality_scorer():
    batch = pd.DataFrame({"doc_id": [1, 2], "text": ["The quick, brown fox!", ""]})
    out = QualityScorer()(batch)
    assert out.n_tokens.tolist() == [4, 0]
    assert 0 < out.punct_ratio.iloc[0] < 0.2
    assert out.quality_score.between(0, 1).all()


def test_langid():
    batch = pd.DataFrame(
        {
            "text": [
                "the cat is in the house and it is warm",
                "der hund und die katze sind nicht im haus",
                "el perro es un animal y la casa es grande",
                "12345 !!!",
            ]
        }
    )
    out = LangId()(batch)
    assert out.lang_pred.tolist()[:3] == ["en", "de", "es"]
    assert out.lang_pred.tolist()[3] == "und"


def test_langid_edge_inputs():
    """Empty/NaN/accented/tie rows never crash and NaN == ''."""
    li = LangId()
    df = pd.DataFrame({"text": ["", "   ", "12345 !!!",
                                "Äpfel über die Straße", None]})
    got = li(df)["lang_pred"].tolist()
    assert got == [li._score_one(t or "") for t in df["text"]]
    assert got[0] == "und" and got[4] == "und"


def test_fingerprint_deterministic():
    fp1 = fingerprint(DOCS)
    fp2 = fingerprint(DOCS)
    np.testing.assert_array_equal(fp1, fp2)
    assert fp1[0] == fp1[1]  # identical docs
    assert fp1[0] != fp1[3]


def test_multimodal_plumbing():
    tbl = synth_media_table(30)
    ds = rd.from_arrow(tbl)
    feats = ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    ).to_pandas()
    assert len(feats) == 30
    assert len(feats.features.iloc[0]) == 8
    # determinism of the fake decode
    feats2 = DecodeStage(fake=True)(tbl).to_pandas()
    a = np.stack(feats.sort_values("media_id").features.to_numpy())
    b = np.stack(feats2.sort_values("media_id").features.to_numpy())
    np.testing.assert_array_equal(a, b)

    resized = ResizeStage(16, 16)(tbl)
    imgs = resized.to_pandas().query("kind == 'image'")
    assert (imgs.width == 16).all() and (imgs.height == 16).all()

    frames = FrameSampleStage(every_ms=250)(tbl).to_pandas()
    assert (frames.ts_ms % 250 == 0).all()
    assert frames.groupby("media_id").frame_idx.min().eq(0).all()

    with pytest.raises(NotImplementedError):
        DecodeStage(fake=False)(tbl)


def test_embedding_cosine_pairs_matches_bruteforce_on_planted_dups():
    """LSH-bucketed near-dup must find the same pairs as a brute-force
    O(n^2) scan on a corpus with planted near-duplicates."""
    from raykg.ops.dedup import embedding_cosine_pairs

    rng = np.random.default_rng(7)
    n, dim = 400, 32
    base = rng.normal(size=(n, dim)).astype(np.float32)
    # plant 40 near-dups: copies of rows 0..39 with small noise
    planted = base[:40] + 0.02 * rng.normal(size=(40, dim)).astype(np.float32)
    vecs = np.concatenate([base, planted])
    ids = np.arange(len(vecs), dtype=np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array(
                    [v.tolist() for v in vecs], type=pa.list_(pa.float32())
                ),
            }
        )
    )
    got = embedding_cosine_pairs(ds, threshold=0.95).to_pandas()
    got_pairs = set(zip(got.id_a, got.id_b))

    Vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    S = Vn @ Vn.T
    ii, jj = np.where(S >= 0.95)
    truth = {(int(a), int(b)) for a, b in zip(ii, jj) if a < b}
    assert truth  # the fixture really plants near-dups
    # no false positives (within-bucket cosine is exact)...
    assert got_pairs <= truth
    # ...and recall at the LSH guarantee level
    assert len(got_pairs) / len(truth) >= 0.97, (len(got_pairs), len(truth))


def test_asof_join_matches_pandas_merge_asof():
    """asof_join vs pandas.merge_asof on keyed timestamp data, plus
    fill semantics for keys with no earlier right row."""
    import pandas as pd

    from raykg.ops.joins import asof_join

    rng = np.random.default_rng(5)
    n_l, n_r = 500, 200
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_l),
            "t": rng.integers(0, 10_000, n_l).astype("datetime64[s]"),
            "payload": np.arange(n_l),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, 15, n_r),  # some keys never match
            "rt": rng.integers(0, 10_000, n_r).astype("datetime64[s]"),
            "val": rng.integers(0, 1000, n_r),
        }
    )
    # make right unique per (rk, rt) keeping max val — pins tie-breaking
    right = (
        right.sort_values(["rk", "rt", "val"])
        .groupby(["rk", "rt"], as_index=False)
        .last()
    )
    got = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        key="k", right_key="rk", ts="t", right_ts="rt",
        left_cols=["payload"], right_cols=["val"], fill={"val": -1},
    ).to_pandas().sort_values("payload").reset_index(drop=True)

    exp = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("rt").rename(columns={"rk": "k", "rt": "t"}),
        on="t", by="k", direction="backward",
    )
    exp["val"] = exp["val"].fillna(-1).astype("int64")
    exp = exp.sort_values("payload").reset_index(drop=True)
    assert (got["val"].to_numpy() == exp["val"].to_numpy()).all()
    assert got["payload"].dtype == np.int64


def test_hash_join_matches_pandas_merge():
    """hash_join (large×large tagged-union shuffle join) vs pd.merge:
    inner + left, many-to-many keys, unmatched rows on both sides."""
    from raykg.ops.joins import hash_join

    rng = np.random.default_rng(17)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 200, 2000),
            "x": rng.normal(size=2000),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(100, 300, 1500),  # half the keys overlap
            "y": rng.integers(0, 10_000, 1500),
        }
    )

    def norm(df):
        return (
            df.sort_values(["k", "x", "y"], na_position="last")
            .reset_index(drop=True)
        )

    for how in ("inner", "left"):
        got = hash_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", right_on="rk", left_cols=["x"], right_cols=["y"],
            how=how,
        ).to_pandas()
        exp = left.merge(
            right.rename(columns={"rk": "k"}), on="k", how=how
        )
        g, e = norm(got), norm(exp)
        assert len(g) == len(e)
        assert (g["k"].to_numpy() == e["k"].to_numpy()).all()
        assert np.allclose(g["x"], e["x"])
        assert np.array_equal(
            g["y"].to_numpy(na_value=-1), e["y"].to_numpy(na_value=-1)
        )
    # key dtype survives the union/merge round-trip
    assert got["k"].dtype == np.int64


def test_hash_join_string_keys():
    from raykg.ops.joins import hash_join

    left = pd.DataFrame({"k": ["a", "b", "c", "b"], "x": [1, 2, 3, 4]})
    right = pd.DataFrame({"k2": ["b", "c", "d"], "y": [20, 30, 40]})
    got = (
        hash_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", right_on="k2", left_cols=["x"], right_cols=["y"],
        )
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )
    assert list(got["k"]) == ["b", "b", "c"]
    assert list(got["y"]) == [20, 20, 30]


def test_minhash_shuffle_verification_matches_broadcast():
    """The scale path (hash-join + bloom-pruned verification,
    broadcast_pairs=0) must produce exactly the broadcast path's
    verified pairs."""
    from raykg.ops.dedup import minhash_lsh_pairs

    rng = np.random.default_rng(3)
    base = [
        " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta", "epsilon",
                        "zeta", "eta", "theta"], size=30)
        )
        for _ in range(40)
    ]
    texts, ids = [], []
    for i, t in enumerate(base):
        texts.append(t)
        ids.append(2 * i)
        # planted near-dup: one word changed
        words = t.split()
        words[5] = "omega"
        texts.append(" ".join(words))
        ids.append(2 * i + 1)
    df = pd.DataFrame({"doc_id": ids, "text": texts})

    b = (
        minhash_lsh_pairs(rd.from_pandas(df), threshold=0.5)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    s = (
        minhash_lsh_pairs(rd.from_pandas(df), threshold=0.5, broadcast_pairs=0)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(b) > 0
    assert b.equals(s)


def test_jaccard_near_dup_exact_vs_brute_force():
    """Prefix filtering (AllPairs) must find EXACTLY the brute-force
    all-pairs jaccard >= t set — no LSH miss probability at all —
    including short texts below the shingle width and threshold-edge
    pairs (alpha float guard)."""
    from itertools import combinations

    from raykg.ops.dedup import jaccard_near_dup_pairs, jaccard_ngrams

    rng = np.random.default_rng(17)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    texts = [" ".join(rng.choice(words, size=20)) for _ in range(30)]
    for i in range(0, 20, 4):  # planted near-dups at varying distances
        w = texts[i].split()
        w[rng.integers(0, 20)] = "omega"
        texts.append(" ".join(w))
    texts += ["ab", "ab", "cd"]  # shorter than shingle_k
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    for t in (0.5, 0.8):
        got = jaccard_near_dup_pairs(
            rd.from_pandas(df), threshold=t
        ).to_pandas()
        got_pairs = set(zip(got.id_a, got.id_b))
        exp_pairs = {
            (i, j)
            for i, j in combinations(range(len(texts)), 2)
            if jaccard_ngrams(texts[i], texts[j]) >= t
        }
        assert got_pairs == exp_pairs, (t, got_pairs ^ exp_pairs)
        assert (got.jaccard >= t).all()
    # the short exact dups paired, the short non-dup did not
    n = len(texts)
    assert (n - 3, n - 2) in got_pairs and (n - 3, n - 1) not in got_pairs


def test_sessionize_hot_key_salting_matches_unsalted():
    """VERDICT r2 item 6: a key whose event count exceeds the group
    bound is salted into time ranges and re-merged; output must be
    identical to the unsalted path, including sessions that straddle
    range boundaries."""
    from raykg.ops.windows import sessionize

    rng = np.random.default_rng(11)
    rows = []
    # hot key: 3000 events in bursts separated by >gap quiet periods,
    # arranged so several sessions straddle the salt-range boundaries
    t = pd.Timestamp("2026-01-01")
    for burst in range(40):
        n = 75
        base = t + pd.Timedelta(minutes=burst * 300)
        for j in range(n):
            rows.append(("hot", base + pd.Timedelta(seconds=j * 240)))
    # a few cold keys
    for k in range(5):
        for j in range(20):
            rows.append(
                (f"cold{k}",
                 t + pd.Timedelta(minutes=int(rng.integers(0, 10000))))
            )
    df = pd.DataFrame(rows, columns=["user_id", "ts"])

    def norm(d):
        return (
            d.sort_values(["user_id", "session_id"])
            .reset_index(drop=True)
        )

    plain = norm(
        sessionize(rd.from_pandas(df), max_group=10**9).to_pandas()
    )
    salted = norm(
        sessionize(rd.from_pandas(df), max_group=1000, n_salts=8).to_pandas()
    )
    pd.testing.assert_frame_equal(plain, salted)
    # the salting actually engaged (hot key produced >1 range)
    assert (df["user_id"] == "hot").sum() > 1000
    # census=False (metadata hint: caller knows no key is hot) skips the
    # pre-pass and must match the censused path exactly
    no_census = norm(
        sessionize(rd.from_pandas(df), max_group=10**9,
                   census=False).to_pandas()
    )
    pd.testing.assert_frame_equal(plain, no_census)


def test_asof_join_hot_key_salting_matches_unsalted():
    """VERDICT r2 item 6 (as-of side): a key exceeding the group bound
    splits into time ranges with an injected latest-earlier-right
    prefix per range; output identical to the unsalted path, including
    left rows whose match lives several ranges back."""
    from raykg.ops.joins import asof_join

    rng = np.random.default_rng(7)
    n_l = 4000
    left = pd.DataFrame(
        {
            "k": np.where(rng.random(n_l) < 0.9, 1, 2),  # key 1 is hot
            "t": rng.integers(0, 100_000, n_l).astype("datetime64[s]"),
            "payload": np.arange(n_l),
        }
    )
    # rights sparse: long stretches with no right rows force prefix
    # lookups across multiple ranges
    right = pd.DataFrame(
        {
            "rk": np.array([1] * 12 + [2] * 5),
            "rt": np.concatenate(
                [np.sort(rng.choice(20_000, 12, replace=False)),
                 np.sort(rng.choice(100_000, 5, replace=False))]
            ).astype("datetime64[s]"),
            "val": rng.integers(0, 1000, 17),
        }
    )

    kw = dict(key="k", right_key="rk", ts="t", right_ts="rt",
              left_cols=["payload"], right_cols=["val"], fill={"val": -1})

    def norm(d):
        return d.sort_values("payload").reset_index(drop=True)

    plain = norm(asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        max_group=10**9, **kw).to_pandas())
    salted = norm(asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        max_group=500, n_salts=8, **kw).to_pandas())
    assert (plain["val"].to_numpy() == salted["val"].to_numpy()).all()
    pd.testing.assert_frame_equal(plain, salted)
    # census=False (metadata hint) skips the pre-pass, same output
    no_census = norm(asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        max_group=10**9, census=False, **kw).to_pandas())
    pd.testing.assert_frame_equal(plain, no_census)


def test_multimodal_real_decode_and_resize():
    """VERDICT r2 item 10: the real (non-fake) path decodes actual
    payloads — netpbm images with the built-in pure-numpy codec (or
    PIL when installed), PCM WAV audio via stdlib wave — through the
    same Ray stages; fake-mode plumbing is unchanged."""
    import pyarrow.compute as pc

    from raykg.ops.multimodal import (
        DecodeStage,
        ResizeStage,
        parse_netpbm,
        synth_ppm,
        synth_real_media_table,
        synth_wav,
    )

    # codec round-trip sanity
    ppm = synth_ppm(20, 10, seed=3)
    arr = parse_netpbm(ppm)
    assert arr.shape == (10, 20, 3)

    tbl = synth_real_media_table(n=12)
    ds = rd.from_arrow(tbl)

    dec = ds.map_batches(
        DecodeStage, fn_constructor_kwargs={"fake": False, "feat_dim": 8},
        batch_format="pyarrow", batch_size=4, concurrency=2,
    ).to_pandas()
    assert len(dec) == 12
    F = np.stack([np.asarray(f) for f in dec["features"]])
    assert np.isfinite(F).all()
    # image rows: feature[0] = width, feature[1] = height
    img = dec[dec["kind"] == "image"].reset_index(drop=True)
    assert (F[dec.index[dec["kind"] == "image"], 0]
            == img["width"].to_numpy()).all()
    # audio rows: feature[0] = duration seconds > 0, rms > 0
    aud_idx = dec.index[dec["kind"] == "audio"]
    assert (F[aud_idx, 0] > 0).all() and (F[aud_idx, 2] > 0.2).all()
    # deterministic
    dec2 = ds.map_batches(
        DecodeStage, fn_constructor_kwargs={"fake": False, "feat_dim": 8},
        batch_format="pyarrow", batch_size=4, concurrency=2,
    ).to_pandas()
    F2 = np.stack([np.asarray(f) for f in dec2["features"]])
    order = np.argsort(dec["media_id"].to_numpy())
    order2 = np.argsort(dec2["media_id"].to_numpy())
    assert np.array_equal(F[order], F2[order2])

    # REAL resize rewrites the payload: decoded dims match the target
    res = ds.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"width": 8, "height": 6, "fake": False},
        batch_format="pyarrow", batch_size=4, concurrency=2,
    ).to_pandas()
    for _, r in res[res["kind"] == "image"].iterrows():
        out = parse_netpbm(r["payload"])
        assert out.shape == (6, 8, 3)
        assert r["width"] == 8 and r["height"] == 6
    # non-image payloads untouched
    orig = {r["media_id"]: r["payload"] for r in tbl.to_pylist()}
    for _, r in res[res["kind"] != "image"].iterrows():
        assert bytes(r["payload"]) == bytes(orig[r["media_id"]])


def test_hash_join_semi_anti_match_pandas():
    from raykg.ops.joins import hash_join

    rng = np.random.default_rng(23)
    left = pd.DataFrame({"k": rng.integers(0, 50, 500),
                         "x": rng.normal(size=500)})
    # right has duplicate keys on purpose: semi must not multiply rows
    right = pd.DataFrame({"rk": rng.integers(25, 75, 300)})

    semi = hash_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", right_on="rk", left_cols=["x"], how="semi",
    ).to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
    exp_semi = left[left["k"].isin(right["rk"])].sort_values(
        ["k", "x"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(semi, exp_semi, check_dtype=False)

    anti = hash_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", right_on="rk", left_cols=["x"], how="anti",
    ).to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
    exp_anti = left[~left["k"].isin(right["rk"])].sort_values(
        ["k", "x"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(anti, exp_anti, check_dtype=False)

    with pytest.raises(ValueError):
        hash_join(rd.from_pandas(left), rd.from_pandas(right),
                  on="k", right_on="rk", left_cols=["x"],
                  right_cols=["rk2"], how="semi")


def test_hash_join_right_outer_match_pandas():
    """Right and full-outer modes: unmatched rows of BOTH sides
    survive with nulls on the other side's columns, many-to-many
    multiplicity matches pd.merge exactly."""
    from raykg.ops.joins import auto_join, hash_join

    rng = np.random.default_rng(31)
    left = pd.DataFrame({"k": rng.integers(0, 120, 800),
                         "x": rng.normal(size=800)})
    right = pd.DataFrame({"rk": rng.integers(60, 180, 600),
                          "y": rng.integers(0, 10_000, 600)})

    def norm(df):
        return (df.sort_values(["k", "x", "y"], na_position="last")
                .reset_index(drop=True))

    for how in ("right", "outer"):
        got = hash_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", right_on="rk", left_cols=["x"], right_cols=["y"],
            how=how,
        ).to_pandas()
        exp = left.merge(right.rename(columns={"rk": "k"}),
                         on="k", how=how)
        g, e = norm(got), norm(exp)
        assert len(g) == len(e)
        assert (g["k"].to_numpy() == e["k"].to_numpy()).all()
        assert np.allclose(g["x"].to_numpy(na_value=-9e9),
                           e["x"].to_numpy(na_value=-9e9))
        assert np.array_equal(g["y"].to_numpy(na_value=-1),
                              e["y"].to_numpy(na_value=-1))
        # key survives as int64 (never null: outer coalesces the key)
        assert g["k"].dtype == np.int64
        # auto_join must route these modes to the shuffle plan even for
        # a broadcast-sized right side, and agree with hash_join
        au = auto_join(rd.from_pandas(left), rd.from_pandas(right),
                       on="k", right_on="rk", left_cols=["x"],
                       right_cols=["y"], how=how).to_pandas()
        assert len(au) == len(e)
        a = norm(au)
        assert np.array_equal(a["y"].to_numpy(na_value=-1),
                              e["y"].to_numpy(na_value=-1))


def test_hopping_window_matches_pandas():
    from raykg.ops.windows import hopping_window

    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "ts": pd.to_datetime(
            rng.integers(0, 100_000, 2000), unit="s"
        ),
        "value": rng.normal(size=2000),
    })
    got = (
        hopping_window(rd.from_pandas(df), width_minutes=60, hop_minutes=15,
                       agg_col="value")
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    )
    # expected: each event in 4 windows ending at its 15-min bucket
    k = 4
    hop = pd.Timedelta(minutes=15)
    rows = []
    for j in range(k):
        d = df.copy()
        d["window_start"] = d["ts"].dt.floor("15min") - j * hop
        rows.append(d)
    exp = (
        pd.concat(rows)
        .groupby("window_start")
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    assert np.allclose(got["sum_value"], exp["sum_value"])


def _topk_expected(df: pd.DataFrame, k: int) -> pd.DataFrame:
    return (
        df.sort_values(["key", "val", "id"], ascending=[True, False, True],
                       kind="mergesort")
        .groupby("key", sort=False)
        .head(k)
        .sort_values(["key", "val", "id"], ascending=[True, False, True],
                     kind="mergesort")
        .reset_index(drop=True)
    )


def test_top_k_per_key_matches_pandas():
    from raykg.ops.rank import top_k_per_key

    rng = np.random.default_rng(7)
    n = 2000
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 40, n),
            "id": np.arange(n, dtype=np.int64),
            # few distinct values -> lots of ties, exercising the id tiebreak
            "val": rng.integers(0, 12, n).astype(float),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    got = (
        top_k_per_key(ds, "key", "val", "id", k=3)
        .to_pandas()
        .sort_values(["key", "val", "id"], ascending=[True, False, True],
                     kind="mergesort")
        .reset_index(drop=True)
    )
    exp = _topk_expected(df, 3)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_top_k_per_key_hot_key_and_small_groups():
    from raykg.ops.rank import top_k_per_key

    rng = np.random.default_rng(11)
    # one hot key holding 90% of rows, plus keys with fewer than k rows
    key = np.where(rng.random(3000) < 0.9, 0, rng.integers(1, 200, 3000))
    df = pd.DataFrame(
        {
            "key": key.astype(np.int64),
            "id": np.arange(3000, dtype=np.int64),
            "val": rng.normal(size=3000),
        }
    )
    ds = rd.from_pandas(df).repartition(16)
    got = (
        top_k_per_key(ds, "key", "val", "id", k=5)
        .to_pandas()
        .sort_values(["key", "val", "id"], ascending=[True, False, True],
                     kind="mergesort")
        .reset_index(drop=True)
    )
    exp = _topk_expected(df, 5)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the hot key contributed exactly k rows despite 90% occupancy
    assert (got["key"] == 0).sum() == 5


def test_top_k_per_key_string_keys():
    from raykg.ops.rank import top_k_per_key

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "key": rng.choice(["en", "de", "fr", "it"], 500),
            "id": np.arange(500, dtype=np.int64),
            "val": rng.integers(0, 8, 500).astype(float),
        }
    )
    got = (
        top_k_per_key(rd.from_pandas(df).repartition(4), "key", "val", "id", k=7)
        .to_pandas()
        .sort_values(["key", "val", "id"], ascending=[True, False, True],
                     kind="mergesort")
        .reset_index(drop=True)
    )
    exp = _topk_expected(df, 7)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_auto_join_broadcast_matches_hash_join():
    from raykg.ops.joins import auto_join, hash_join

    rng = np.random.default_rng(21)
    left = pd.DataFrame({"k": rng.integers(0, 50, 2000),
                         "lv": rng.normal(size=2000)})
    right = pd.DataFrame({"k": np.arange(40), "rv": np.arange(40) * 10.0})
    lds = rd.from_pandas(left).repartition(6)
    rds = rd.from_pandas(right)

    def norm(df):
        return (df.sort_values(list(df.columns))
                .reset_index(drop=True).round(9))

    for how in ("inner", "left", "semi", "anti"):
        rc = None if how in ("semi", "anti") else ["rv"]
        bc = auto_join(lds, rds, "k", left_cols=["lv"], right_cols=rc,
                       how=how).to_pandas()
        sh = auto_join(lds, rds, "k", left_cols=["lv"], right_cols=rc,
                       how=how, broadcast_limit_bytes=0).to_pandas()
        hj = hash_join(lds, rds, "k", left_cols=["lv"], right_cols=rc,
                       how=how).to_pandas()
        pd.testing.assert_frame_equal(norm(bc), norm(hj), check_dtype=False)
        pd.testing.assert_frame_equal(norm(sh), norm(hj), check_dtype=False)


def test_interval_join_matches_bruteforce():
    from raykg.ops.joins import interval_join

    rng = np.random.default_rng(41)
    n_ev, n_iv = 3000, 60
    ev = pd.DataFrame({
        "ts": pd.to_datetime(rng.integers(0, 3 * 86400, n_ev), unit="s"),
        "event_id": np.arange(n_ev, dtype=np.int64),
    })
    starts = rng.integers(0, 3 * 86400 - 7200, n_iv)
    iv = pd.DataFrame({
        "start": pd.to_datetime(starts, unit="s"),
        # lengths from minutes to 2h — some intervals span chunk borders
        "end": pd.to_datetime(starts + rng.integers(60, 7200, n_iv), unit="s"),
        "interval_id": np.arange(n_iv, dtype=np.int64),
    })
    got = (
        interval_join(
            rd.from_pandas(ev).repartition(5), rd.from_pandas(iv),
            ts_col="ts", start_col="start", end_col="end",
            left_cols=["event_id"], interval_cols=["interval_id"],
        )
        .to_pandas().sort_values(["interval_id", "event_id"])
        .reset_index(drop=True)
    )
    brute = ev.merge(iv, how="cross")
    brute = brute[(brute.ts >= brute.start) & (brute.ts < brute.end)]
    exp = (brute[["ts", "event_id", "interval_id"]]
           .sort_values(["interval_id", "event_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["ts", "event_id", "interval_id"]], exp,
                                  check_dtype=False)


def test_interval_join_empty_sides():
    from raykg.ops.joins import interval_join

    ev = pd.DataFrame({"ts": pd.to_datetime([0, 10_000], unit="s"),
                       "event_id": np.array([1, 2], dtype=np.int64)})
    iv = pd.DataFrame({
        "start": pd.to_datetime([500_000], unit="s"),
        "end": pd.to_datetime([500_060], unit="s"),
        "interval_id": np.array([7], dtype=np.int64),
    })
    out = interval_join(rd.from_pandas(ev), rd.from_pandas(iv),
                        "ts", "start", "end",
                        left_cols=["event_id"],
                        interval_cols=["interval_id"]).to_pandas()
    assert len(out) == 0


def _brute_semantic_keep(ids, V, threshold):
    """Ground truth: union-find over ALL pairs >= threshold, keep min
    id per component."""
    n = len(ids)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn @ Vn.T
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    order = np.argsort(ids)
    for a in range(n):
        for b in range(a + 1, n):
            if sims[order[a], order[b]] >= threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    keep = {ids[order[i]] for i in range(n) if find(i) == i}
    return keep


def test_semantic_dedup_planted_groups():
    """SemDeDup: planted near-dup families (tight noise around
    near-orthogonal bases) — keep set equals the brute-force all-pairs
    union-find keep set, across partitionings."""
    from raykg.ops.dedup import semantic_dedup

    rng = np.random.default_rng(53)
    d = 64
    bases = rng.normal(size=(40, d))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    rows, gid = [], 0
    for g in range(40):
        sz = 1 + g % 4
        for _ in range(sz):
            v = bases[g] + rng.normal(scale=1e-3, size=d)
            rows.append((gid, v))
            gid += 1
    rng.shuffle(rows)
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    V = np.stack([r[1] for r in rows]).astype(np.float64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(V.astype(np.float32))})
    want_keep = _brute_semantic_keep(ids, V, 0.9)

    for parts in (2, 16):
        out = semantic_dedup(
            rd.from_pandas(df).repartition(parts),
            threshold=0.9, n_clusters=16,
        ).to_pandas()
        assert len(out) == len(df)
        got_keep = set(out[out["keep"]]["vec_id"])
        assert got_keep == want_keep
        # exactly one survivor per family
        fam = {i: i // 1 for i in ids}  # ids are globally unique
        assert len(got_keep) == len(want_keep)


def test_semantic_dedup_no_dups_keeps_all():
    from raykg.ops.dedup import semantic_dedup

    rng = np.random.default_rng(59)
    V = rng.normal(size=(200, 32)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                       "embedding": list(V)})
    out = semantic_dedup(rd.from_pandas(df).repartition(4),
                         threshold=0.99, n_clusters=8).to_pandas()
    assert out["keep"].all() and len(out) == 200


def test_hash_join_hot_key_salting_pinned():
    """Planted hot key (3000 left rows of one key vs max_group=500):
    salted output identical to the unsalted plan for every supported
    how, and the hot key's rows actually spread over >1 bucket."""
    from raykg.ops.joins import hash_join

    rng = np.random.default_rng(61)
    left = pd.DataFrame({
        "k": np.concatenate([np.full(3000, 7, dtype=np.int64),
                             rng.integers(100, 200, 1000)]),
        "x": rng.normal(size=4000),
    })
    right = pd.DataFrame({
        "rk": np.concatenate([np.full(4, 7, dtype=np.int64),
                              rng.integers(150, 250, 300)]),
        "y": rng.integers(0, 100, 304),
    })

    def norm(df):
        cols = [c for c in ("k", "x", "y") if c in df.columns]
        return (df.sort_values(cols, na_position="last")
                .reset_index(drop=True))

    for how in ("inner", "left", "semi", "anti"):
        rc = None if how in ("semi", "anti") else ["y"]
        plain = hash_join(
            rd.from_pandas(left).repartition(8), rd.from_pandas(right),
            on="k", right_on="rk", left_cols=["x"], right_cols=rc,
            how=how).to_pandas()
        salted = hash_join(
            rd.from_pandas(left).repartition(8), rd.from_pandas(right),
            on="k", right_on="rk", left_cols=["x"], right_cols=rc,
            how=how, max_group=500, n_salts=8).to_pandas()
        g, e = norm(salted), norm(plain)
        assert len(g) == len(e), how
        for c in g.columns:
            assert np.array_equal(
                g[c].to_numpy(na_value=-1), e[c].to_numpy(na_value=-1)
            ), (how, c)

    with pytest.raises(ValueError):
        hash_join(rd.from_pandas(left), rd.from_pandas(right),
                  on="k", right_on="rk", left_cols=["x"], right_cols=["y"],
                  how="outer", max_group=500)


def test_pagerank_matches_dense_reference():
    """Distributed power iteration vs the dense numpy reference on a
    random digraph with sinks and multi-edges, across partitionings."""
    from raykg.ops.pagerank import pagerank, pagerank_numpy

    rng = np.random.default_rng(67)
    edges = rng.integers(0, 60, size=(400, 2)).astype(np.int64)
    edges = edges[edges[:, 0] != edges[:, 1]]
    # add guaranteed sinks: nodes 61, 62 receive but never send
    sink_edges = np.array([[1, 61], [2, 62], [3, 61]], dtype=np.int64)
    edges = np.vstack([edges, sink_edges, edges[:5]])  # dup edges too
    want = pagerank_numpy(edges, n_iter=5)

    df = pd.DataFrame({"src": edges[:, 0], "dst": edges[:, 1]})
    got = (pagerank(rd.from_pandas(df).repartition(8), n_iter=5)
           .to_pandas())
    assert len(got) == len(want)
    gm = dict(zip(got["node"], got["rank"]))
    for n, r in want.items():
        assert abs(gm[n] - r) < 1e-9, (n, gm[n], r)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_pagerank_star_graph():
    """Hub-and-spoke sanity: the hub out-ranks every spoke."""
    from raykg.ops.pagerank import pagerank

    spokes = np.arange(1, 21, dtype=np.int64)
    df = pd.DataFrame({"src": spokes, "dst": np.zeros(20, dtype=np.int64)})
    got = pagerank(rd.from_pandas(df), n_iter=3).to_pandas()
    hub = got[got.node == 0]["rank"].iloc[0]
    assert (got[got.node != 0]["rank"] < hub).all()


def test_cross_join_and_limit():
    from raykg.ops.joins import cross_join

    left = pd.DataFrame({"a": [1, 2, 3]})
    right = pd.DataFrame({"b": ["x", "y"]})
    got = (cross_join(rd.from_pandas(left).repartition(2),
                      rd.from_pandas(right), ["a"], ["b"])
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    want = left.merge(right, how="cross").sort_values(["a", "b"]
                                                      ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(ValueError):
        cross_join(rd.from_pandas(left), rd.from_pandas(right),
                   ["a"], ["b"], limit_bytes=1)
    with pytest.raises(ValueError):
        cross_join(rd.from_pandas(left), rd.from_pandas(left), ["a"], ["a"])


def test_unpivot_matches_melt():
    from raykg.ops.pivot import unpivot

    df = pd.DataFrame({"id": [1, 2], "x": [1.5, 2.5], "y": [10, 20]})
    got = (unpivot(rd.from_pandas(df), ["id"], ["x", "y"],
                   cast=pa.float64())
           .to_pandas().sort_values(["id", "metric"]).reset_index(drop=True))
    want = (df.melt(id_vars=["id"], value_vars=["x", "y"],
                    var_name="metric", value_name="value")
            .astype({"value": "float64"})
            .sort_values(["id", "metric"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_string_agg_string_keys_and_order():
    from raykg.ops.collect import grouped_string_agg

    rng = np.random.default_rng(71)
    n = 3000
    df = pd.DataFrame({
        "k": rng.choice(["u1", "u2", "u3"], n),
        "v": rng.choice(list("abcde"), n),
        "t": rng.permutation(n),
    })
    got = (grouped_string_agg(rd.from_pandas(df).repartition(7),
                              "k", "v", ["t"], sep="-", out_col="s")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.sort_values(["k", "t"]).groupby("k")["v"]
            .agg("-".join).rename("s").reset_index())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dataset_profile_nulls_and_partition_invariance():
    from raykg.ops.profile import dataset_profile

    rng = np.random.default_rng(17)
    n = 5000
    df = pd.DataFrame({
        "a": rng.normal(100.0, 5.0, n),
        "b": rng.uniform(-1.0, 1.0, n),
    })
    df.loc[df.index[:37], "b"] = np.nan
    for parts in (1, 8):
        got = dataset_profile(
            rd.from_pandas(df).repartition(parts), ["a", "b"]
        ).set_index("column")
        assert got.loc["a", "n"] == n and got.loc["a", "n_null"] == 0
        assert got.loc["b", "n"] == n - 37 and got.loc["b", "n_null"] == 37
        bv = df["b"].dropna().to_numpy()
        assert abs(got.loc["b", "mean"] - bv.mean()) < 1e-9
        assert abs(got.loc["b", "std"] - bv.std()) < 1e-9
        assert got.loc["a", "min"] == df["a"].min()
        assert got.loc["a", "max"] == df["a"].max()


def test_grouped_corr_matches_pandas():
    from raykg.ops.profile import grouped_corr

    rng = np.random.default_rng(23)
    n = 4000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "x": rng.integers(0, 50, n).astype(float),
    })
    df["y"] = df["x"] * 2 + rng.integers(0, 30, n)
    for parts in (1, 6):
        got = grouped_corr(rd.from_pandas(df).repartition(parts),
                           "k", "x", "y").set_index("k")
        for k, g in df.groupby("k"):
            want = np.corrcoef(g["x"], g["y"])[0, 1]
            assert abs(got.loc[k, "corr"] - want) < 1e-9, (k, parts)
            assert got.loc[k, "n"] == len(g)


def test_grouped_corr_constant_column_nan():
    from raykg.ops.profile import grouped_corr

    df = pd.DataFrame({"k": ["a"] * 10, "x": [5.0] * 10,
                       "y": np.arange(10.0)})
    got = grouped_corr(rd.from_pandas(df), "k", "x", "y")
    assert np.isnan(got["corr"].iloc[0])


def test_validate_rules_counts_and_first_id():
    import pyarrow.compute as pc

    from raykg.ops.validate import validate_rules

    df = pd.DataFrame({
        "id": np.arange(100, 200),
        "v": np.r_[np.zeros(50), np.ones(50) * 999],
        "s": ["ok"] * 95 + ["bad"] * 5,
    })
    rules = [
        ("too_big", lambda t: pc.greater(t.column("v"), 100.0)),
        ("bad_s", lambda t: pc.equal(t.column("s"), "bad")),
        ("never", lambda t: pc.greater(t.column("v"), 1e9)),
    ]
    for parts in (1, 5):
        got = validate_rules(rd.from_pandas(df).repartition(parts),
                             rules, id_col="id").set_index("rule")
        assert list(got.index) == ["too_big", "bad_s", "never"]
        assert got.loc["too_big", "n_violations"] == 50
        assert got.loc["too_big", "first_bad_id"] == 150
        assert got.loc["bad_s", "n_violations"] == 5
        assert got.loc["bad_s", "first_bad_id"] == 195
        assert got.loc["never", "n_violations"] == 0
        assert (got["n_rows"] == 100).all()


def test_cms_bounds_and_partition_invariance():
    from raykg.ops.sketch import cms_frequencies, cms_never_underestimates

    rng = np.random.default_rng(41)
    n = 30000
    # zipf-ish: a few heavy keys, long tail
    keys = np.r_[np.repeat([7, 13, 42], [5000, 3000, 1500]),
                 rng.integers(100, 5000, n - 9500)]
    df = pd.DataFrame({"k": keys})
    probe = [7, 13, 42, 100, 4999, 999999]
    exact = np.array([(keys == v).sum() for v in probe])
    width = 2048
    outs = []
    for parts in (1, 9):
        got = cms_frequencies(rd.from_pandas(df).repartition(parts),
                              "k", probe, depth=4, width=width)
        outs.append(got)
        est = got["est_count"].to_numpy()
        assert cms_never_underestimates(est, exact)
        assert (est - exact <= 2 * n / width).all(), (est, exact)
    # deterministic: identical across partitionings
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_cms_string_column():
    from raykg.ops.sketch import cms_frequencies

    df = pd.DataFrame({"s": ["a"] * 500 + ["b"] * 50 + ["c"] * 5})
    got = cms_frequencies(rd.from_pandas(df), "s", ["a", "b", "c", "zz"],
                          depth=4, width=512).set_index("value")
    assert got.loc["a", "est_count"] >= 500
    assert got.loc["b", "est_count"] >= 50
    assert got.loc["zz", "est_count"] <= 555  # bounded by N


def test_grouped_entropy_matches_scipy_formula_and_partitions():
    import math

    from raykg.ops.profile import grouped_entropy

    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], n),
        "v": rng.choice(list("xyzuvw"), n, p=[.4, .25, .15, .1, .07, .03]),
    })
    ref = {}
    for k, g in df.groupby("k"):
        p = g["v"].value_counts(normalize=True).to_numpy()
        ref[k] = float(-(p * np.log(p)).sum())
    base = None
    for parts in (1, 7):
        got = grouped_entropy(rd.from_pandas(df).repartition(parts),
                              "k", "v").set_index("k")
        for k, g in df.groupby("k"):
            assert abs(got.loc[k, "entropy"] - ref[k]) < 1e-12, (k, parts)
            assert got.loc[k, "n"] == len(g)
            assert got.loc[k, "n_distinct"] == g["v"].nunique()
        # integer pre-counts make the result bit-identical across
        # partitionings, not just close
        if base is None:
            base = got
        else:
            assert (got["entropy"] == base["entropy"]).all()


def test_grouped_entropy_single_value_is_zero():
    from raykg.ops.profile import grouped_entropy

    df = pd.DataFrame({"k": ["a"] * 17, "v": ["only"] * 17})
    got = grouped_entropy(rd.from_pandas(df), "k", "v")
    assert got["entropy"].iloc[0] == 0.0
    assert got["n_distinct"].iloc[0] == 1


def _blob_frame(seed=11, k=4, per=300, d=8, spread=0.05):
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((k, d)) * 5.0
    X = np.concatenate([c + rng.standard_normal((per, d)) * spread
                        for c in cents])
    ids = np.arange(len(X), dtype=np.int64)
    perm = rng.permutation(len(X))
    df = pd.DataFrame({"vec_id": ids})
    df["embedding"] = [X[i].astype(np.float32) for i in range(len(X))]
    return df.iloc[perm].reset_index(drop=True), X[perm]


def test_kmeans_matches_sequential_lloyd_and_partitions():
    from raykg.ops.kmeans import kmeans_assign, kmeans_fit

    df, X = _blob_frame()
    got = {}
    for parts in (2, 9):
        ds = rd.from_pandas(df).repartition(parts)
        centers, inertia, iters = kmeans_fit(ds, k=4, n_iter=25, seed=3)
        assert iters < 25  # converged on separated blobs
        lab = (kmeans_assign(ds, centers).to_pandas()
               .sort_values("vec_id")["cluster"].to_numpy())
        got[parts] = (centers, inertia, lab)
    # assignments identical across partitionings; centers to 1e-9
    assert (got[2][2] == got[9][2]).all()
    assert np.allclose(got[2][0], got[9][0], atol=1e-9)
    # sequential Lloyd from the same init (kmeans_lite on the same
    # spread sample runs inside kmeans_fit, so compare via inertia and
    # cluster structure instead of center identity): every cluster is
    # pure wrt the planted blobs
    lab_sorted = got[2][2]
    planted = np.repeat(np.arange(4), 300)  # vec_id == original index
    for c in np.unique(lab_sorted):
        members = planted[lab_sorted == c]
        assert len(set(members.tolist())) == 1  # no blob split/merge
    # inertia == sum of within-blob variance, small
    assert got[2][1] < 0.05 ** 2 * 8 * 1200 * 2


def test_kmeans_empty_cluster_keeps_center():
    from raykg.ops.kmeans import kmeans_fit

    # 2 tight blobs but k=3: one center must go hungry and survive
    df, _ = _blob_frame(seed=5, k=2, per=100, d=4)
    centers, inertia, _ = kmeans_fit(rd.from_pandas(df), k=3, n_iter=10,
                                     seed=3)
    assert centers.shape == (3, 4)
    assert np.isfinite(centers).all()
    assert np.isfinite(inertia)


def test_jaccard_similarity_join_vs_brute_force_both_paths():
    """Cross-table fuzzy join must find EXACTLY the brute-force
    left x right jaccard >= t set — colliding id spaces (same ids on
    both sides), negative ids, and short texts included — on both the
    broadcast and the forced-shuffle verification paths."""
    from raykg.ops.dedup import jaccard_ngrams, jaccard_similarity_join

    rng = np.random.default_rng(29)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    ltexts = [" ".join(rng.choice(words, size=18)) for _ in range(25)]
    rtexts = [" ".join(rng.choice(words, size=18)) for _ in range(20)]
    for i in range(0, 20, 5):  # planted cross-side near-matches
        w = ltexts[i].split()
        w[rng.integers(0, 18)] = "omega"
        rtexts.append(" ".join(w))
    ltexts.append("ab")  # below shingle width
    rtexts.append("ab")
    left = pd.DataFrame({"doc_id": range(len(ltexts)), "text": ltexts})
    right = pd.DataFrame(
        {"rid": np.arange(len(rtexts)) - 3, "body": rtexts})  # collides + negatives

    exp = {
        (i, j)
        for i in left.doc_id for j in right.rid
        if jaccard_ngrams(ltexts[int(i)],
                          rtexts[int(j) + 3]) >= 0.6
    }
    for bp in (1 << 18, 0):  # broadcast path, then forced shuffle path
        got = jaccard_similarity_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            right_text="body", right_id="rid",
            threshold=0.6, broadcast_pairs=bp,
        ).to_pandas()
        assert set(zip(got.id_l, got.id_r)) == exp, bp
        assert (got.jaccard >= 0.6).all()


def test_table_diff_statuses_and_nulls():
    from raykg.ops.diff import table_diff

    old = pd.DataFrame({
        "k": [1, 2, 3, 4, 5],
        "a": ["x", "y", None, "w", "v"],
        "b": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    new = pd.DataFrame({
        "k": [2, 3, 4, 5, 6],          # 1 removed, 6 added
        "a": ["y", None, "w", "v2", "z"],  # 5 changed (a)
        "b": [2.0, 3.5, 4.0, 5.0, 6.0],    # 3 changed (b, null a equal)
    })
    got = (table_diff(rd.from_pandas(old).repartition(2),
                      rd.from_pandas(new).repartition(3),
                      "k", ["a", "b"]).to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = {1: "removed", 3: "changed", 5: "changed", 6: "added"}
    assert dict(zip(got.k, got.status)) == want
    # unchanged rows (2, 4) dropped


def test_table_diff_duplicate_key_raises():
    from raykg.ops.diff import table_diff

    old = pd.DataFrame({"k": [1, 1], "a": ["x", "y"]})
    new = pd.DataFrame({"k": [1], "a": ["x"]})
    with pytest.raises(Exception):
        table_diff(rd.from_pandas(old), rd.from_pandas(new),
                   "k", ["a"]).to_pandas()


def test_triangle_count_vs_dense_trace():
    from raykg.ops.cc import triangle_count

    rng = np.random.default_rng(41)
    n = 60
    # random graph + a hub (vertex 0 connected to everyone) + planted
    # self-loops and duplicate/bidirectional rows
    A = (rng.random((n, n)) < 0.12)
    A[0, :] = True  # hub — the "last reducer" case degree orientation fixes
    A = np.triu(A, 1)
    A = A | A.T
    uu, vv = np.nonzero(np.triu(A, 1))
    src = np.concatenate([uu, vv, [3, 7]])        # reversed dups + loops
    dst = np.concatenate([vv, uu, [3, 7]])
    want = int(np.trace(np.linalg.matrix_power(A.astype(np.int64), 3)) // 6)
    assert want > 0
    df = pd.DataFrame({"src": src, "dst": dst})
    for parts in (1, 5):
        got = triangle_count(rd.from_pandas(df).repartition(parts))
        assert got == want, (parts, got, want)


def test_triangle_count_empty_and_triangle_free():
    from raykg.ops.cc import triangle_count

    # a path graph has zero triangles
    df = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 4]})
    assert triangle_count(rd.from_pandas(df)) == 0


def test_grouped_mad_matches_numpy():
    from raykg.ops.profile import grouped_mad

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 2000),
        "v": rng.normal(10, 3, 2000),
    })
    df.loc[:20, "v"] = 1e6  # outliers: MAD must shrug, std would not
    got = (grouped_mad(rd.from_pandas(df).repartition(5), "k", "v")
           .to_pandas().set_index("k"))
    for k, g in df.groupby("k"):
        a = g["v"].to_numpy()
        med = np.quantile(a, 0.5)
        assert abs(got.loc[k, "med"] - med) < 1e-12
        assert abs(got.loc[k, "mad"] - np.quantile(np.abs(a - med), 0.5)) < 1e-12
        assert got.loc[k, "n"] == len(g)
        assert got.loc[k, "mad"] < 10  # robust to the planted 1e6 spikes


def test_semantic_decontaminate_flags_planted_leaks():
    from raykg.ops.decontam import semantic_decontaminate

    rng = np.random.default_rng(3)
    corpus = rng.standard_normal((200, 16)).astype(np.float32)
    evalX = rng.standard_normal((5, 16))
    # rows 10..14 are near-copies of the eval probes
    corpus[10:15] = (evalX + rng.standard_normal((5, 16)) * 0.01).astype(
        np.float32)
    df = pd.DataFrame({"doc_id": np.arange(200)})
    df["embedding"] = [v for v in corpus]
    got = (semantic_decontaminate(rd.from_pandas(df).repartition(4), evalX,
                                  threshold=0.9, chunk=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.contaminated[10:15].all()
    assert not got.contaminated.drop(range(10, 15)).any()
    # max_sim matches a direct numpy computation
    E = evalX / np.linalg.norm(evalX, axis=1, keepdims=True)
    V = corpus.astype(np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    np.testing.assert_allclose(got.max_sim.to_numpy(),
                               (V @ E.T).max(axis=1), atol=1e-12)


def test_compression_ratio_orders_text_kinds():
    from raykg.ops.textstats import compression_ratio

    rng = np.random.default_rng(5)
    texts = [
        "spam spam spam " * 200,                       # repetitive
        " ".join(rng.choice(["the", "of", "market", "growth", "said",
                             "report", "analysts", "quarter"], 400)),
        "".join(chr(c) for c in rng.integers(33, 127, 3000)),  # random
        "",
    ]
    df = pd.DataFrame({"doc_id": range(4), "text": texts})
    got = (compression_ratio(rd.from_pandas(df).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.zlib_ratio[0] < got.zlib_ratio[1] < got.zlib_ratio[2]
    assert got.zlib_ratio[0] < 0.1          # boilerplate collapses
    assert got.zlib_ratio[2] > 0.7          # randomness does not
    assert got.zlib_ratio[3] == 1.0 and got.raw_bytes[3] == 0
    # deterministic
    again = (compression_ratio(rd.from_pandas(df)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert (got.zlib_bytes == again.zlib_bytes).all()


def test_split_assign_group_aware_and_fractions():
    from raykg.ops.sample import split_assign

    n = 8000
    df = pd.DataFrame({"id": np.arange(n), "grp": (np.arange(n) // 8)})
    fr = {"train": 0.75, "val": 0.125, "test": 0.125}
    got = (split_assign(rd.from_pandas(df).repartition(5), "id", fr,
                        by_col="grp", seed=1).to_pandas())
    # group-aware: one split per group, always
    assert (got.groupby("grp")["split"].nunique() == 1).all()
    # fractions approximately honored at the group level
    per = got.drop_duplicates("grp")["split"].value_counts(normalize=True)
    assert abs(per["train"] - 0.75) < 0.03
    assert abs(per["val"] - 0.125) < 0.02
    # deterministic across partitionings
    again = split_assign(rd.from_pandas(df).repartition(2), "id", fr,
                         by_col="grp", seed=1).to_pandas()
    assert (got.sort_values("id")["split"].to_numpy()
            == again.sort_values("id")["split"].to_numpy()).all()
    # every row labeled
    assert got["split"].isin(list(fr)).all()


def test_k_anonymity_finds_rare_combos():
    from raykg.ops.validate import k_anonymity

    df = pd.DataFrame({
        "zip": ["10001"] * 50 + ["94110"] * 3 + ["60601"] * 1,
        "age": [30] * 50 + [40] * 3 + [50] * 1,
    })
    got = (k_anonymity(rd.from_pandas(df).repartition(4),
                       ["zip", "age"], k=5).to_pandas()
           .sort_values("zip").reset_index(drop=True))
    assert list(zip(got.zip, got.age, got.n)) == [
        ("60601", 50, 1), ("94110", 40, 3)]


def test_exact_global_quantile_matches_numpy():
    from raykg.ops.quantile import exact_global_quantile

    rng = np.random.default_rng(17)
    # heavy ties + outliers + nans, across several distributions
    x = np.concatenate([
        rng.normal(100, 15, 20000),
        np.full(5000, 42.0),              # massive tie block
        rng.exponential(1000, 2000),
        [np.nan] * 100,
    ])
    df = pd.DataFrame({"v": x})
    clean = x[~np.isnan(x)]
    ds = rd.from_pandas(df).repartition(7)
    for q in (0.0, 0.1, 0.5, 0.9, 0.99, 1.0):
        got = exact_global_quantile(ds, "v", q, collect_budget=2048)
        want = float(np.quantile(clean, q))
        assert got == want, (q, got, want)


def test_exact_global_quantile_all_equal_and_tiny():
    from raykg.ops.quantile import exact_global_quantile

    ds = rd.from_pandas(pd.DataFrame({"v": [7.0] * 1000}))
    assert exact_global_quantile(ds, "v", 0.5, collect_budget=10) == 7.0
    ds2 = rd.from_pandas(pd.DataFrame({"v": [3.0, 1.0]}))
    assert exact_global_quantile(ds2, "v", 0.5) == 2.0  # interpolated


def test_storage_profile_matches_duckdb_parquet_metadata():
    import duckdb

    from raykg.ops.profile import storage_profile

    path = "/root/testdata/sf0.001/lineitem.parquet"
    got = storage_profile(path)
    want = duckdb.sql(f"""
        SELECT path_in_schema AS column,
               sum(num_values)::BIGINT AS n_values,
               sum(total_compressed_size)::BIGINT AS compressed_bytes,
               sum(total_uncompressed_size)::BIGINT AS uncompressed_bytes,
               count(*)::BIGINT AS n_chunks
        FROM parquet_metadata('{path}') GROUP BY 1 ORDER BY 1
    """).df()
    assert list(got["column"]) == list(want["column"])
    assert (got["n_values"].to_numpy()
            == want["n_values"].to_numpy()).all()
    assert (got["compressed_bytes"].to_numpy()
            == want["compressed_bytes"].to_numpy()).all()
    assert (got["uncompressed_bytes"].to_numpy()
            == want["uncompressed_bytes"].to_numpy()).all()


def test_apply_changes_roundtrip_and_vocab():
    from raykg.ops.diff import apply_changes, enrich_changes, table_diff

    old = pd.DataFrame({
        "k": [1, 2, 3, 4, 5],
        "a": [10, 20, 30, 40, 50],
        "b": ["x", "y", None, "w", "v"],
    })
    new = pd.DataFrame({
        "k": [1, 2, 4, 5, 6],          # 3 removed, 6 added
        "a": [10, 21, 40, 50, 60],     # 2 changed
        "b": ["x", "y", "w", "V", "u"],  # 5 changed
    })
    diff = table_diff(rd.from_pandas(old).repartition(2),
                      rd.from_pandas(new).repartition(3), "k", ["a", "b"])
    changes = enrich_changes(diff, rd.from_pandas(new), "k", ["a", "b"])
    got = (apply_changes(rd.from_pandas(old).repartition(2), changes,
                         "k", ["a", "b"]).to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = new.sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == want["k"].tolist()
    assert got["a"].astype("int64").tolist() == want["a"].tolist()
    assert got["b"].tolist() == want["b"].tolist()

    # CDC synonym vocabulary: delete == removed
    ch2 = pd.DataFrame({"k": [3, 7], "status": ["delete", "insert"],
                        "a": [None, 70], "b": [None, "q"]})
    got2 = (apply_changes(rd.from_pandas(old), rd.from_pandas(ch2),
                          "k", ["a", "b"],
                          col_types={"a": pa.float64(), "b": pa.string()})
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert got2["k"].tolist() == [1, 2, 4, 5, 7]
    assert got2.loc[got2["k"] == 7, "b"].iloc[0] == "q"


def test_regex_extract_groups_nulls_and_cast():
    from raykg.ops.textstats import regex_extract

    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "s": ['{"k": 69, "v": "aa"}', '{"k": 7, "v": "b"}',
              "no match here", None],
    })
    out = (regex_extract(rd.from_pandas(df).repartition(2), "s",
                         r'\{"k": (\d+), "v": "(\w+)"\}', ["k", "v"],
                         types={"k": pa.int64()})
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["k"].tolist()[:2] == [69, 7]
    assert pd.isna(out["k"].iloc[2]) and pd.isna(out["k"].iloc[3])
    assert out["v"].tolist()[:2] == ["aa", "b"]
    assert out["s"].tolist()[:2] == df["s"].tolist()[:2]  # input kept

    # group-count mismatch is an explicit error
    with pytest.raises(ValueError):
        regex_extract(rd.from_pandas(df), "s", r"(\d+)", ["a", "b"])


def test_equi_depth_bins_matches_numpy_and_nan():
    from raykg.ops.quantile import equi_depth_bins

    rng = np.random.default_rng(7)
    x = np.concatenate([rng.integers(0, 100, 997).astype(float), [np.nan]])
    df = pd.DataFrame({"id": np.arange(len(x)), "v": x})
    binned, bounds = equi_depth_bins(
        rd.from_pandas(df).repartition(4), "v", 4)
    got = binned.to_pandas().sort_values("id").reset_index(drop=True)

    want_bounds = np.quantile(x[~np.isnan(x)], [0.25, 0.5, 0.75])
    assert np.allclose(bounds, want_bounds)
    want = np.searchsorted(want_bounds, x, side="left")
    want[np.isnan(x)] = -1
    assert got["bin"].to_numpy().tolist() == want.astype(int).tolist()
    # depths roughly equal (exact quartiles on ties-light data)
    counts = got[got["bin"] >= 0]["bin"].value_counts()
    assert counts.max() - counts.min() <= x.size * 0.05

    with pytest.raises(ValueError):
        equi_depth_bins(rd.from_pandas(df), "v", 1)


def test_asof_join_directions_match_pandas():
    """direction='forward' (negated-axis plan) and 'nearest' (dual
    searchsorted, equidistant ties backward) vs pandas.merge_asof."""
    from raykg.ops.joins import asof_join

    rng = np.random.default_rng(5)
    n_l, n_r = 500, 200
    left = pd.DataFrame({
        "k": rng.integers(0, 12, n_l),
        "t": rng.integers(0, 10_000, n_l).astype("datetime64[s]"),
        "payload": np.arange(n_l),
    })
    right = pd.DataFrame({
        "rk": rng.integers(0, 15, n_r),
        "rt": rng.integers(0, 10_000, n_r).astype("datetime64[s]"),
        "val": rng.integers(0, 1000, n_r),
    })
    right = (right.sort_values(["rk", "rt", "val"])
             .groupby(["rk", "rt"], as_index=False).last())

    for direction in ("forward", "nearest"):
        got = asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            key="k", right_key="rk", ts="t", right_ts="rt",
            left_cols=["payload"], right_cols=["val"], fill={"val": -1},
            direction=direction,
        ).to_pandas().sort_values("payload").reset_index(drop=True)
        exp = pd.merge_asof(
            left.sort_values("t"),
            right.sort_values("rt").rename(columns={"rk": "k", "rt": "t"}),
            on="t", by="k", direction=direction,
        )
        exp["val"] = exp["val"].fillna(-1).astype("int64")
        exp = exp.sort_values("payload").reset_index(drop=True)
        assert (got["val"].to_numpy() == exp["val"].to_numpy()).all(), \
            direction
        assert (got["t"].to_numpy() == exp["t"].to_numpy()).all()

    with pytest.raises(ValueError):
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  key="k", right_key="rk", ts="t", right_ts="rt",
                  left_cols=["payload"], right_cols=["val"],
                  direction="sideways")


def test_asof_join_directions_hot_key_salting():
    """forward/nearest with a planted hot key: salted output identical
    to the unsalted path (forward rides the negated-axis prefix;
    nearest needs BOTH boundary rows per range)."""
    from raykg.ops.joins import asof_join

    rng = np.random.default_rng(7)
    n_l = 4000
    left = pd.DataFrame({
        "k": np.where(rng.random(n_l) < 0.9, 1, 2),
        "t": rng.integers(0, 100_000, n_l).astype("datetime64[s]"),
        "payload": np.arange(n_l),
    })
    right = pd.DataFrame({
        "rk": np.array([1] * 12 + [2] * 5),
        "rt": np.concatenate(
            [np.sort(rng.choice(20_000, 12, replace=False)),
             np.sort(rng.choice(100_000, 5, replace=False))]
        ).astype("datetime64[s]"),
        "val": rng.integers(0, 1000, 17),
    })
    kw = dict(key="k", right_key="rk", ts="t", right_ts="rt",
              left_cols=["payload"], right_cols=["val"], fill={"val": -1})

    def norm(d):
        return d.sort_values("payload").reset_index(drop=True)

    for direction in ("forward", "nearest"):
        plain = norm(asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            max_group=10**9, direction=direction, **kw).to_pandas())
        salted = norm(asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            max_group=500, n_salts=8, direction=direction,
            **kw).to_pandas())
        assert (plain["val"].to_numpy()
                == salted["val"].to_numpy()).all(), direction


def _emb_ds(M: np.ndarray, parts: int = 4):
    ids = np.arange(len(M), dtype=np.int64)
    return ids, rd.from_arrow(pa.table({
        "vec_id": ids,
        "embedding": pa.array([v.tolist() for v in M.astype(np.float32)],
                              type=pa.list_(pa.float32())),
    })).repartition(parts)


def test_sq8_encode_bounds_and_error():
    from raykg.ops.similarity import fit_sq8, sq8_encode

    rng = np.random.default_rng(7)
    M = rng.normal(size=(300, 16)) * np.linspace(0.1, 5, 16)
    ids, ds = _emb_ds(M)
    lo, scale = fit_sq8(ds)
    enc = sq8_encode(ds, lo, scale).to_pandas().sort_values("vec_id")
    codes = np.stack(enc["code"].to_numpy())
    assert codes.dtype == np.uint8
    # dequantized error bounded by half a quantization step per dim
    deq = codes.astype(np.float64) * scale + lo
    M32 = M.astype(np.float32).astype(np.float64)
    assert np.all(np.abs(deq - M32) <= scale * 0.5 + 1e-9)


def test_sq8_knn_recall_gate():
    from raykg.ops.similarity import knn_sq8

    rng = np.random.default_rng(8)
    # clustered embeddings (the bench KB shape)
    centers = rng.normal(size=(10, 32)) * 3
    M = (centers[rng.integers(0, 10, size=1000)]
         + rng.normal(size=(1000, 32)) * 0.5)
    ids, ds = _emb_ds(M, parts=6)
    Q = M[:20]
    got = knn_sq8(ds, Q, ids[:20], k=10, shortlist_mult=8).to_pandas()
    brute = knn_bruteforce(ds, Q, ids[:20], k=10).to_pandas()
    inter = len(set(zip(got.qid, got.vec_id))
                & set(zip(brute.qid, brute.vec_id)))
    assert inter / len(brute) >= 0.98
    # contract: k rows per query, ranks 1..k
    assert got.groupby("qid")["rank"].apply(
        lambda s: sorted(s) == list(range(1, 11))).all()


def test_sq8_knn_deterministic_across_partitioning():
    from raykg.ops.similarity import fit_sq8, knn_sq8

    rng = np.random.default_rng(9)
    M = rng.normal(size=(400, 8))
    ids, ds4 = _emb_ds(M, parts=4)
    _, ds9 = _emb_ds(M, parts=9)
    lo, scale = fit_sq8(ds4)
    a = knn_sq8(ds4, M[:5], ids[:5], k=5, lo=lo, scale=scale).to_pandas()
    b = knn_sq8(ds9, M[:5], ids[:5], k=5, lo=lo, scale=scale).to_pandas()
    key = ["qid", "rank"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


def test_mv_refresh_equals_recompute():
    from raykg.ops.mv import changes_with_both_sides, refresh_grouped_sum
    from ray.data.aggregate import Count, Sum

    rng = np.random.default_rng(21)
    n = 400
    old = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64),
        "g": rng.integers(0, 12, size=n),
        "v": rng.normal(size=n).round(3) * 100,
    })
    # refresh: delete some keys (emptying group 11 entirely), change
    # values AND groups of others, add new keys in a brand-new group
    new = old[old.k % 7 != 0].copy()
    new = new[new.g != 11]
    chg = new.k % 5 == 0
    new.loc[chg, "v"] += 1.5
    new.loc[new.k % 9 == 0, "g"] = (new.loc[new.k % 9 == 0, "g"] + 1) % 12
    added = pd.DataFrame({"k": np.arange(n, n + 30, dtype=np.int64),
                          "g": 99, "v": 7.25})
    new = pd.concat([new, added], ignore_index=True)

    def agg(df):
        return (df.groupby("g", as_index=False)
                .agg(n_rows=("v", "size"), sum_v=("v", "sum")))

    old_ds = rd.from_pandas(old).repartition(4)
    new_ds = rd.from_pandas(new).repartition(3)
    base = (old_ds.groupby("g")
            .aggregate(Count(alias_name="n_rows"),
                       Sum("v", alias_name="sum_v")))
    changes2 = changes_with_both_sides(
        rd.from_pandas(old).repartition(4),
        rd.from_pandas(new).repartition(3), "k", ["g", "v"])
    got = (refresh_grouped_sum(base, changes2, "g", ["v"])
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = agg(new).sort_values("g").reset_index(drop=True)
    assert list(got.g) == list(want.g)  # group 11 dropped, 99 born
    assert list(got.n_rows) == list(want.n_rows)
    np.testing.assert_allclose(got.sum_v, want.sum_v, atol=1e-8)


def test_mv_refresh_no_changes_is_identity():
    from raykg.ops.mv import changes_with_both_sides, refresh_grouped_sum
    from ray.data.aggregate import Count, Sum

    df = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                       "g": np.arange(50) % 4,
                       "v": np.linspace(0, 1, 50)})
    base = (rd.from_pandas(df).groupby("g")
            .aggregate(Count(alias_name="n_rows"),
                       Sum("v", alias_name="sum_v")))
    changes2 = changes_with_both_sides(
        rd.from_pandas(df), rd.from_pandas(df), "k", ["g", "v"])
    got = (refresh_grouped_sum(base, changes2, "g", ["v"])
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = (df.groupby("g", as_index=False)
            .agg(n_rows=("v", "size"), sum_v=("v", "sum")))
    assert list(got.n_rows) == list(want.n_rows)
    np.testing.assert_allclose(got.sum_v, want.sum_v, atol=1e-12)


def test_referential_integrity_counts():
    from raykg.ops.validate import referential_integrity

    child = pd.DataFrame({"fk": pd.array(
        [1, 2, 3, 99, None, 2], dtype="Int64")})
    parent = pd.DataFrame({"pk": np.array([1, 2, 3], dtype=np.int64)})
    n, orphans = referential_integrity(
        rd.from_pandas(child).repartition(2), "fk",
        rd.from_pandas(parent), "pk")
    assert n == 6
    assert orphans == 2  # the 99 and the null
    # forced Bloom-anti plan (parent "too big" to broadcast): same answer
    n2, orphans2 = referential_integrity(
        rd.from_pandas(child).repartition(2), "fk",
        rd.from_pandas(parent), "pk", broadcast_limit_bytes=0)
    assert (n2, orphans2) == (6, 2)


def test_transition_counts_vs_pandas():
    from raykg.ops.funnel import transition_counts

    rng = np.random.default_rng(31)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, size=n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 500, size=n), unit="m"),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c", "d"], size=n),
    })
    # force ts ties within a user so the tiebreak matters
    df.loc[df.index[:10], "ts"] = df["ts"].iloc[0]
    df.loc[df.index[:10], "user_id"] = 7
    got = transition_counts(rd.from_pandas(df).repartition(5))
    s = df.sort_values(["user_id", "ts", "event_id"])
    same = s["user_id"].to_numpy()[1:] == s["user_id"].to_numpy()[:-1]
    want = (pd.DataFrame({
        "prev_type": s["event_type"].to_numpy()[:-1][same],
        "next_type": s["event_type"].to_numpy()[1:][same]})
        .groupby(["prev_type", "next_type"], as_index=False).size()
        .rename(columns={"size": "n"})
        .sort_values(["prev_type", "next_type"]).reset_index(drop=True))
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_distinctive_terms_lift_ranking():
    from raykg.ops.vocab import distinctive_terms

    docs = pd.DataFrame({
        "source": ["x"] * 3 + ["y"] * 3,
        "text": [
            "apple apple apple common common",
            "apple banana common common",
            "apple common",
            "zebra zebra common common",
            "zebra common common",
            "zebra banana common",
        ],
    })
    out = (distinctive_terms(rd.from_pandas(docs).repartition(2),
                             "source", "text", k=2)
           .to_pandas().sort_values(["source", "rank"])
           .reset_index(drop=True))
    # apple only in x, zebra only in y -> top distinctive words
    assert out[out.source == "x"].iloc[0]["word"] == "apple"
    assert out[out.source == "y"].iloc[0]["word"] == "zebra"
    # brute-force lift check for the top row of x
    n_gw, n_g = 5, 11          # apple in x; tokens in x
    n_w, n_total = 5, 21       # apple overall; all tokens
    assert abs(out[out.source == "x"].iloc[0]["lift"]
               - (n_gw * n_total) / (n_g * n_w)) < 1e-12
    # ranks dense 1..k per group
    assert list(out[out.source == "x"]["rank"]) == [1, 2]


def test_compact_parquet_roundtrip(tmp_path):
    from raykg.ops.layout import compact_parquet

    frag = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    df = pd.DataFrame({"a": np.arange(20000, dtype=np.int64),
                       "b": np.arange(20000) % 17})
    rd.from_pandas(df).repartition(32).write_parquet(frag)
    audit = compact_parquet(frag, out, target_mb=64)
    assert audit["n_files_before"] == 32
    assert audit["n_files_after"] < audit["n_files_before"]
    assert audit["n_rows"] == audit["n_rows_after"] == 20000
    back = rd.read_parquet(out).to_pandas().sort_values("a")
    assert (back["a"].to_numpy() == df["a"].to_numpy()).all()


def test_jaccard_dense_plan_matches_sparse_plan():
    import raykg.ops.dedup as dd

    rng = np.random.default_rng(41)
    vocab = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]
    base = [" ".join(rng.choice(vocab, size=30)) for _ in range(80)]
    texts = base + [b + " alpha" for b in base[:10]]  # planted near-dups
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})

    def run():
        return (dd.jaccard_near_dup_pairs(
            rd.from_pandas(df).repartition(3), threshold=0.8)
            .to_pandas().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))

    dense = run()  # tiny vocab -> dense bitmap-GEMM plan
    old = dd.DENSE_TOKEN_LIMIT
    try:
        dd.DENSE_TOKEN_LIMIT = 0  # force the AllPairs prefix plan
        sparse = run()
    finally:
        dd.DENSE_TOKEN_LIMIT = old
    assert len(dense) > 0
    pd.testing.assert_frame_equal(dense, sparse)

    # cross-table variant parity too
    def run_join():
        left = rd.from_pandas(df[df.doc_id % 2 == 0])
        right = rd.from_pandas(df[df.doc_id % 2 == 1])
        return (dd.jaccard_similarity_join(left, right, threshold=0.7)
                .to_pandas().sort_values(["id_l", "id_r"])
                .reset_index(drop=True))

    dense_j = run_join()
    try:
        dd.DENSE_TOKEN_LIMIT = 0
        sparse_j = run_join()
    finally:
        dd.DENSE_TOKEN_LIMIT = old
    pd.testing.assert_frame_equal(dense_j, sparse_j)


def test_mv_refresh_shuffle_path_matches_small_path():
    import raykg.ops.mv as mv
    from ray.data.aggregate import Count, Sum

    rng = np.random.default_rng(22)
    old = pd.DataFrame({"k": np.arange(200, dtype=np.int64),
                        "g": rng.integers(0, 8, size=200),
                        "v": rng.normal(size=200).round(2)})
    new = old[old.k % 5 != 0].copy()
    new.loc[new.k % 3 == 0, "v"] += 2.0
    new = pd.concat([new, pd.DataFrame(
        {"k": [900, 901], "g": [50, 50], "v": [1.0, 2.0]})],
        ignore_index=True)

    def run():
        base = (rd.from_pandas(old).groupby("g")
                .aggregate(Count(alias_name="n_rows"),
                           Sum("v", alias_name="sum_v")))
        ch = mv.changes_with_both_sides(
            rd.from_pandas(old).repartition(3),
            rd.from_pandas(new).repartition(2), "k", ["g", "v"])
        out = (mv.refresh_grouped_sum(base, ch, "g", ["v"])
               .to_pandas().sort_values("g").reset_index(drop=True))
        out["sum_v"] = out["sum_v"].round(9)
        return out

    small = run()
    orig = mv.MV_BROADCAST_CHANGES
    try:
        mv.MV_BROADCAST_CHANGES = 0  # force Bloom-prune + hash-join plan
        shuffled = run()
    finally:
        mv.MV_BROADCAST_CHANGES = orig
    pd.testing.assert_frame_equal(small, shuffled)
    want = (new.groupby("g", as_index=False)
            .agg(n_rows=("v", "size"), sum_v=("v", "sum")))
    assert list(small.g) == list(want.g)
    assert list(small.n_rows) == list(want.n_rows)


def test_scd2_history_versions_and_asof_law():
    from raykg.ops.scd import scd2_history, snapshot_as_of

    # snapshot s (1..4): key k present unless (k+s)%7==0; value changes
    # for k%3==0 from s>=2 (delete/re-add gaps AND value changes mix)
    S = 4
    snaps = []
    for s in range(1, S + 1):
        ks = [k for k in range(1, 21) if (k + s) % 7 != 0]
        vals = [k * 10 + (s if (k % 3 == 0 and s >= 2) else 0)
                for k in ks]
        snaps.append(rd.from_pandas(
            pd.DataFrame({"k": ks, "v": vals})).repartition(2))

    hist = (scd2_history(snaps, "k", ["v"], coarse=8).to_pandas()
            .sort_values(["k", "valid_from"]).reset_index(drop=True))

    # spot-pin a delete+re-add key: k=4 absent at s=3 ((4+3)%7==0)
    k4 = hist[hist.k == 4]
    assert list(zip(k4.valid_from, k4.valid_to, k4.is_current)) == [
        (1, 3, False), (4, 5, True)]
    # spot-pin a changing key: k=3 absent at s=4, value bumps at 2,3
    k3 = hist[hist.k == 3]
    assert list(zip(k3.v, k3.valid_from, k3.valid_to)) == [
        (30, 1, 2), (32, 2, 3), (33, 3, 4)]
    assert not k3.is_current.any()
    # intervals per key are disjoint and ordered
    for _, g in hist.groupby("k"):
        assert (g.valid_from < g.valid_to).all()
        assert (g.valid_from.to_numpy()[1:]
                >= g.valid_to.to_numpy()[:-1]).all()

    # reconstruction law: as_of(s) == snapshot s, for every s
    hist_ds = rd.from_pandas(hist)
    for s in range(1, S + 1):
        got = (snapshot_as_of(hist_ds, s).to_pandas()
               .sort_values("k").reset_index(drop=True))
        exp = (snaps[s - 1].to_pandas()
               .sort_values("k").reset_index(drop=True))
        assert got[["k", "v"]].equals(exp[["k", "v"]]), s


def test_scd2_history_string_keys_partition_invariant():
    from raykg.ops.scd import scd2_history

    def mk(rows, parts):
        return rd.from_pandas(pd.DataFrame(
            rows, columns=["k", "a", "b"])).repartition(parts)

    s1 = [("x", "u", 1.0), ("y", None, 2.0), ("z", "w", 3.0)]
    s2 = [("x", "u", 1.0), ("y", "v", 2.0)]           # y changed (null->v), z deleted
    s3 = [("x", "u", 9.0), ("y", "v", 2.0), ("z", "w", 3.0)]  # x changed, z re-added

    outs = []
    for parts in (1, 3):
        h = (scd2_history([mk(s1, parts), mk(s2, parts), mk(s3, parts)],
                          "k", ["a", "b"], coarse=4).to_pandas()
             .sort_values(["k", "valid_from"]).reset_index(drop=True))
        outs.append(h)
    assert outs[0].equals(outs[1])
    h = outs[0]
    assert list(zip(h.k, h.valid_from, h.valid_to, h.is_current)) == [
        ("x", 1, 3, False), ("x", 3, 4, True),
        ("y", 1, 2, False), ("y", 2, 4, True),
        ("z", 1, 2, False), ("z", 3, 4, True)]
    # null value round-trips (pre-change y.a is null, not the sentinel)
    assert h[(h.k == "y") & (h.valid_from == 1)].a.isna().all()


def test_asof_join_n_salts_over_256_still_correct():
    """n_salts > 256 would alias (k, 256) onto (k+1, 0) in the
    _merge_fast dense-rank packing; the guard must route to the loop
    fallback and keep results identical to pandas.merge_asof."""
    import pandas as pd

    from raykg.ops.joins import asof_join

    rng = np.random.default_rng(11)
    n_l, n_r = 400, 150
    left = pd.DataFrame({
        "k": rng.integers(0, 6, n_l),
        "t": rng.integers(0, 5_000, n_l).astype("datetime64[s]"),
        "payload": np.arange(n_l),
    })
    right = pd.DataFrame({
        "rk": rng.integers(0, 8, n_r),
        "rt": rng.integers(0, 5_000, n_r).astype("datetime64[s]"),
        "val": rng.integers(0, 1000, n_r),
    })
    right = (right.sort_values(["rk", "rt", "val"])
             .groupby(["rk", "rt"], as_index=False).last())
    got = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        key="k", right_key="rk", ts="t", right_ts="rt",
        left_cols=["payload"], right_cols=["val"], fill={"val": -1},
        n_salts=300, max_group=10,   # force salting + >256 salts
    ).to_pandas().sort_values("payload").reset_index(drop=True)
    exp = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("rt").rename(columns={"rk": "k", "rt": "t"}),
        on="t", by="k", direction="backward",
    )
    exp["val"] = exp["val"].fillna(-1).astype("int64")
    exp = exp.sort_values("payload").reset_index(drop=True)
    assert (got["val"].to_numpy() == exp["val"].to_numpy()).all()


def test_avi_rawvideo_roundtrip_bit_exact():
    """encode_avi_rawvideo -> parse_avi_rawvideo reproduces every RGB
    frame bit-for-bit, including non-4-multiple strides (width 15)."""
    from raykg.ops.multimodal import (encode_avi_rawvideo,
                                      parse_avi_rawvideo)

    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, size=(11, 15, 3)).astype(np.uint8)
              for _ in range(5)]
    buf = encode_avi_rawvideo(frames, fps=5)
    got, usec = parse_avi_rawvideo(buf)
    assert usec == 200_000
    assert len(got) == 5
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)


def test_avi_compressed_stream_raises():
    from raykg.ops.multimodal import (encode_avi_rawvideo,
                                      parse_avi_rawvideo)

    buf = bytearray(encode_avi_rawvideo(
        [np.zeros((4, 4, 3), np.uint8)], fps=2))
    # flip biCompression (strf body offset 16) to a nonzero fourcc
    i = buf.find(b"strf")
    buf[i + 8 + 16:i + 8 + 20] = b"H264"
    import pytest as _pt
    with _pt.raises(NotImplementedError, match="compressed"):
        parse_avi_rawvideo(bytes(buf))


def test_frame_sample_stage_real_decode_end_to_end():
    """fake=False really parses the AVI payload, samples the nearest
    frame per tick, and emits P6 payloads the image decoder accepts —
    driven through Ray Data like the real pipeline."""
    import ray.data as rd

    from raykg.ops.multimodal import (DecodeStage, FrameSampleStage,
                                      MEDIA_SCHEMA, _decode_image,
                                      parse_avi_rawvideo, synth_avi)

    avi = synth_avi(n_frames=8, width=16, height=12, fps=4, seed=3)
    tbl = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "kind": pa.array(["video"]),
        "payload": pa.array([avi], pa.binary()),
        "mime": pa.array(["video/x-msvideo"]),
        "width": pa.array([16], pa.int32()),
        "height": pa.array([12], pa.int32()),
        "duration_ms": pa.array([2000], pa.int32()),
    }, schema=MEDIA_SCHEMA)
    out = (rd.from_arrow(tbl)
           .map_batches(FrameSampleStage(every_ms=500, fake=False),
                        batch_format="pyarrow", batch_size=4)
           .to_pandas())
    # 8 frames at 4 fps = 2000 ms -> ticks at 0/500/1000/1500
    assert out["ts_ms"].tolist() == [0, 500, 1000, 1500]
    assert out["frame_idx"].tolist() == [0, 2, 4, 6]
    frames, _ = parse_avi_rawvideo(avi)
    for _, row in out.iterrows():
        img = _decode_image(row["payload"])
        assert img.shape == (12, 16, 3)
        assert np.array_equal(img, frames[int(row["frame_idx"])])
    # the decode stage's real video features work off the same payload
    feats = DecodeStage(fake=False)._real_features(avi, "video")
    assert feats[0] == 8.0 and feats[2] == 16.0 and feats[3] == 12.0
