"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Scale shapes (ray_guide patterns, SURVEY.md §4.3):

  * exact: vectorized content hash per batch -> local pre-dedup ->
    hash-bucket shuffle -> per-bucket keep-first (min id). Never a
    global sort; never driver-side.
  * MinHash-LSH: per-batch shingling + signature (one numpy pass) ->
    explode to (bucket, band, band_hash, doc_id) rows ONLY (~24 B/row;
    no text, no signature through the shuffle) -> groupby band bucket ->
    candidate id-pairs -> dedup -> verification rejoins texts via two
    bucketed hash joins against the corpus (no driver materialization).
  * SimHash: 64-bit signature per doc from token hashes; candidates
    share one of four 16-bit bands; verified by Hamming distance.
  * embedding cosine: random-hyperplane LSH (n_tables sign-bit keys
    per vector) -> within-bucket exact cosine -> cross-table pair
    dedup. No driver materialization, no O(n^2) corpus matmul; the
    shuffle ships (bucket, id, vector) x n_tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from raykg.util import hash_strings
from raykg.ops.exchange import hash_exchange

_M61 = np.uint64((1 << 61) - 1)


DEDUP_BUCKETS = 4096


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct text.

    Buckets by content hash (coarse, DEDUP_BUCKETS groups) rather than
    grouping by the hash itself: one ``map_groups`` call per distinct
    value would mean millions of tiny groups at corpus scale."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch.column(text_col).to_pylist())
        t = batch.append_column(
            "_h", pa.array(h.astype(np.int64) & ((1 << 62) - 1), type=pa.int64())
        )
        df = t.to_pandas()
        # local pre-dedup before the shuffle
        df = df.sort_values(id_col).groupby("_h", as_index=False).first()
        df["_bucket"] = (df["_h"] % DEDUP_BUCKETS).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).groupby("_h", as_index=False).first()
        return g.drop(columns=["_h", "_bucket"])

    return hash_exchange(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        "_bucket", DEDUP_BUCKETS, keep_first)


def _shingles(text: str, k: int) -> np.ndarray:
    """Unique k-gram hashes — one utf-32 encode + a vectorized FNV pass
    over the sliding-window matrix (bit-identical to hash_strings over
    the substring list, without the per-substring Python loop)."""
    t = (text or "").lower()
    if len(t) <= k:
        return hash_strings([t])
    from raykg.util import _FNV_OFFSET, _FNV_PRIME

    codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    W = np.lib.stride_tricks.sliding_window_view(codes, k)
    with np.errstate(over="ignore"):
        h = np.full(len(W), _FNV_OFFSET, dtype=np.uint64)
        h = (h ^ np.uint64(k)) * _FNV_PRIME  # length fold, as hash_strings
        for j in range(k):
            h = (h ^ W[:, j]) * _FNV_PRIME
    return np.unique(h)


def minhash_signatures(
    texts: list[str], num_perm: int = 64, shingle_k: int = 5, seed: int = 7
) -> np.ndarray:
    """(n, num_perm) uint64 MinHash signatures via universal hashing
    h_i(x) = (a_i * x + b_i) mod p over the shingle hash set.

    Deliberately per-document: each doc is one (num_perm × n_shingles)
    broadcast — a small cache-resident C-contiguous matrix. A fully
    batched variant (concatenated sliding-window FNV + global lexsort
    dedup + per-permutation ``minimum.reduceat``, the ``fingerprint``
    trick) was measured 3× SLOWER on the sf0.1 corpus (297-char mean
    docs: 0.66 s vs 2.1 s for 5000 docs) — the lexsort over the flat
    shingle array and strided u64 modulo passes cost more than the
    per-doc loop overhead they remove. Batch-concat only wins for very
    short documents; ``_shingles`` already vectorizes the inner work."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_M61), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_M61), size=num_perm, dtype=np.uint64)
    out = np.empty((len(texts), num_perm), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            sh = _shingles(t, shingle_k) % _M61
            # (num_perm, n_shingles) permuted values; min along shingles
            vals = (a[:, None] * sh[None, :] + b[:, None]) % _M61
            out[i] = vals.min(axis=1)
    return out


def jaccard_ngrams(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(_shingles(a, k).tolist()), set(_shingles(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.6,
    broadcast_pairs: int = 1 << 18,
    broadcast_bytes: int = 256 << 20,
):
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Returns a Ray Dataset of verified pairs. The verification join
    picks its strategy from the measured candidate count, like an
    adaptive broadcast-vs-shuffle join planner:

      * ``<= broadcast_pairs`` candidates AND an estimated text-map
        size (distinct candidate ids x sampled average text length)
        within ``broadcast_bytes``: the candidate-id set broadcasts
        (bounded by the threshold, so never corpus-proportional) and
        one filtering pass collects just the candidate rows' texts for
        a broadcast id->text lookup — the byte budget keeps a
        long-document corpus from blowing the map even at a small pair
        count;
      * more: two bucketed hash joins against the corpus
        (``raykg.ops.joins.hash_join`` — tagged-union single-shuffle
        each), with a Bloom bitmap over the candidate ids pruning the
        corpus before each exchange. The corpus streams and never
        touches the driver, so a dup-heavy corpus where candidates
        grow with corpus size cannot OOM anything.
    """
    rows_per_band = num_perm // bands

    def sigs(batch: pa.Table) -> pa.Table:
        # the band explode ships ONLY (bucket, band, band_hash, doc_id)
        # — ~24 B/row — never the text or the 64-perm signature. Texts
        # rejoin in the verification stage for candidate ids only, so
        # the all-to-all exchange carries no corpus payload.
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        S = minhash_signatures(texts, num_perm, shingle_k)
        n = len(texts)
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), n)
        doc_ids = np.tile(ids, bands)
        bh = np.empty(bands * n, dtype=np.int64)
        with np.errstate(over="ignore"):
            for bnd in range(bands):
                block = S[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
                h = np.full(n, np.uint64(1469598103934665603))
                for c in range(rows_per_band):
                    h = (h ^ block[:, c]) * np.uint64(1099511628211)
                bh[bnd * n : (bnd + 1) * n] = (h & np.uint64((1 << 62) - 1)).astype(
                    np.int64
                )
        # coarse shuffle key: one map_groups call per ~512th of the key
        # space, NOT per distinct (band, band_hash) — a group call per
        # tiny bucket is pure python overhead at corpus scale
        coarse = ((bh.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  >> np.uint64(52)).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(coarse),
                "band": pa.array(band_ids),
                "band_hash": pa.array(bh),
                id_col: pa.array(doc_ids),
            }
        )

    def candidate_pairs_in_coarse_bucket(cg: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in cg.groupby(["band", "band_hash"], sort=False):
            ids = np.unique(g[id_col].to_numpy())
            if len(ids) < 2:
                continue
            # all unordered pairs within the band bucket (id_a < id_b)
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(
                {"id_a": "int64", "id_b": "int64"}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    candidates = hash_exchange(
        ds.map_batches(sigs, batch_format="pyarrow"),
        "bucket", 4096, candidate_pairs_in_coarse_bucket)
    # object-store-resident id pairs (the small side, but NOT on the
    # driver) — materialized so the two verification joins below don't
    # re-run the candidate shuffle and can read its schema lazily
    return _verify_candidate_pairs(
        ds, candidates, text_col, id_col, shingle_k, threshold,
        broadcast_pairs, broadcast_bytes,
    )


def _verify_candidate_pairs(ds, candidates, text_col, id_col, shingle_k,
                            threshold, broadcast_pairs, broadcast_bytes,
                            metric: str = "jaccard",
                            score_col: str = "jaccard"):
    """Exact set-similarity verification of an (id_a, id_b)
    candidate-pair Dataset against the corpus ``ds`` — the adaptive
    broadcast-vs-shuffle join stage shared by ``minhash_lsh_pairs``,
    ``jaccard_near_dup_pairs`` and ``containment_join``. See
    minhash_lsh_pairs' docstring for the strategy rules. ``metric``:
    'jaccard' (|A∩B|/|A∪B|) or 'containment_a' (|A∩B|/|A|, the
    asymmetric quote-detection score — id_a is the contained side).
    -> Dataset(id_a, id_b, <score_col>)."""
    candidates = _dedup_pairs(candidates).materialize()
    n_cand = candidates.count()
    if n_cand == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"id_a": [], "id_b": [], score_col: []}).astype(
                {"id_a": "int64", "id_b": "int64", score_col: "float64"}
            )
        )

    def make_sh(lookup_get):
        # docs recur across pairs in a block — shingle each distinct
        # doc once per task
        sh_cache: dict[int, set] = {}

        def sh(i: int, text) -> set:
            st = sh_cache.get(i)
            if st is None:
                st = set(
                    _shingles((lookup_get(i) if text is None else text) or "",
                              shingle_k).tolist()
                )
                sh_cache[i] = st
            return st

        return sh

    contain = metric == "containment_a"

    def jaccard_rows(a, b, ta, tb, lookup_get=lambda i: ""):
        sh = make_sh(lookup_get)
        out_a, out_b, out_j = [], [], []
        for i, j, x, y in zip(a.tolist(), b.tolist(), ta, tb):
            sa, sb = sh(int(i), x), sh(int(j), y)
            if contain:
                den = len(sa)
            else:
                den = len(sa | sb)
            jac = (len(sa & sb) / den) if den else 1.0
            if jac >= threshold:
                out_a.append(i)
                out_b.append(j)
                out_j.append(jac)
        return pa.table(
            {
                "id_a": pa.array(out_a, type=pa.int64()),
                "id_b": pa.array(out_b, type=pa.int64()),
                score_col: pa.array(out_j, type=pa.float64()),
            }
        )

    # hard driver bound for the pair table itself (16 B/pair, so 64 MB
    # at the cap); above it the shuffle path is unconditional
    hard_pairs = max(broadcast_pairs, 1 << 22)
    cand_ids = None
    use_broadcast = n_cand <= hard_pairs
    if use_broadcast:
        # byte-budget check on the MEASURED distinct-id set: a dense
        # candidate set (many pairs over few docs — the quote-join
        # regime) must not be pushed to the shuffle path by the loose
        # 2*n_cand id bound. Per-block uniques fold to one sorted id
        # array on the driver (<= 2*hard_pairs ints, bounded above).
        def block_ids(t: pa.Table) -> pa.Table:
            u = np.unique(np.concatenate([
                t.column("id_a").to_numpy(zero_copy_only=False),
                t.column("id_b").to_numpy(zero_copy_only=False),
            ]).astype(np.int64))
            return pa.table({"id": pa.array(u)})

        cand_ids = np.unique(
            candidates.map_batches(block_ids, batch_format="pyarrow")
            .to_pandas()["id"].to_numpy(np.int64)
        )
        sample = ds.limit(256).select_columns([text_col]).take_all()
        avg_len = (
            sum(len(r[text_col] or "") for r in sample) / len(sample)
            if sample else 0.0
        )
        use_broadcast = (
            len(cand_ids) * avg_len <= broadcast_bytes
            and (n_cand <= broadcast_pairs
                 or len(cand_ids) * avg_len <= broadcast_bytes // 4)
        )
    if use_broadcast:
        # ---- broadcast verification (the measured-small side). Driver
        # footprint is bounded by broadcast_pairs x avg text size,
        # never by the corpus: one filtering pass collects only the
        # candidate rows' texts.
        cand_tbl = candidates.to_pandas()
        cand_ref = ray.put(cand_ids)   # distinct ids measured above

        def keep_candidates(batch: pa.Table) -> pa.Table:
            wanted = ray.get(cand_ref)  # sorted unique ids
            ids = (
                batch.column(id_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            mask = np.isin(ids, wanted, assume_unique=False)
            return batch.filter(pa.array(mask)).select([id_col, text_col])

        cand_rows = ds.map_batches(
            keep_candidates, batch_format="pyarrow"
        ).take_all()
        text_map = {int(r[id_col]): r[text_col] for r in cand_rows}
        map_ref = ray.put(text_map)
        # pairs sorted by id_a and split into blocks: verification
        # parallelizes while pairs sharing a doc stay in one task
        # (shingle cache locality)
        cand_tbl = cand_tbl.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        n_blocks = int(min(32, max(1, len(cand_tbl) // 64)))

        def verify_broadcast(batch: pa.Table) -> pa.Table:
            lookup = ray.get(map_ref)
            a = batch.column("id_a").to_numpy(zero_copy_only=False)
            b = batch.column("id_b").to_numpy(zero_copy_only=False)
            return jaccard_rows(
                a, b, [None] * len(a), [None] * len(a),
                lookup_get=lambda i: lookup.get(i, ""),
            )

        return (
            ray.data.from_pandas(cand_tbl)
            .repartition(n_blocks)
            .map_batches(verify_broadcast, batch_format="pyarrow")
        )

    # ---- shuffle verification: bucketed hash-join of candidate ids
    # against the corpus — streaming passes over the corpus, no
    # to_pandas/take_all of corpus-derived data anywhere. A Bloom
    # bitmap over the candidate ids (built by OR-merging fixed-size
    # per-block bitmaps — the driver holds only the 512 KB bitmap,
    # never the ids) prunes the corpus BEFORE each join shuffle, so the
    # exchange ships ~candidate rows, not the corpus; false positives
    # only ship extra rows, the join keeps correctness.
    from raykg.ops.joins import hash_join

    bloom_ref = _bloom_build(candidates, ["id_a", "id_b"])

    def corpus_as(name):
        def proj(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            keep = _bloom_test(ray.get(bloom_ref), ids)
            batch = batch.filter(pa.array(keep))
            return pa.table(
                {id_col: batch.column(id_col), name: batch.column(text_col)}
            )

        return ds.map_batches(proj, batch_format="pyarrow")

    i64, s = pa.int64(), pa.string()
    with_a = hash_join(
        candidates, corpus_as("_ta"),
        on="id_a", right_on=id_col,
        left_cols=["id_b"], right_cols=["_ta"],
        left_types={"id_a": i64, "id_b": i64},
        right_types={"_ta": s},
    )
    with_both = hash_join(
        with_a, corpus_as("_tb"),
        on="id_b", right_on=id_col,
        left_cols=["id_a", "_ta"], right_cols=["_tb"],
        left_types={"id_a": i64, "id_b": i64, "_ta": s},
        right_types={"_tb": s},
    )

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        return jaccard_rows(
            a, b, batch.column("_ta").to_pylist(), batch.column("_tb").to_pylist()
        )

    return with_both.map_batches(verify, batch_format="pyarrow")


_BLOOM_LOG2 = 22  # 2^22 bits = 512 KB; two hash probes per id
_BLOOM_H1 = np.uint64(0x9E3779B97F4A7C15)
_BLOOM_H2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_hashes(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mask = np.uint64((1 << _BLOOM_LOG2) - 1)
    u = ids.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = ((u * _BLOOM_H1) >> np.uint64(11)) & mask
        h2 = ((u * _BLOOM_H2) >> np.uint64(7)) & mask
    return h1, h2


def _bloom_build(id_ds, cols: list[str]):
    """Bloom bitmap over the int64 ids in ``cols`` of ``id_ds``: each
    block emits one fixed-size packed bitmap; the driver OR-merges
    them. Driver memory is O(bitmap × n_blocks transient), independent
    of id count — the scale-safe way to semi-join-prune a corpus
    against a distributed id set. Returns a ray.put ref of the
    uint64-word bitmap."""

    def block_bitmap(batch: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                batch.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
                for c in cols
            ]
        )
        bm = np.zeros(1 << (_BLOOM_LOG2 - 6), dtype=np.uint64)
        for h in _bloom_hashes(ids):
            np.bitwise_or.at(
                bm, (h >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (h & np.uint64(63)),
            )
        return pa.table({"bm": pa.array([bm.tobytes()], type=pa.binary())})

    parts = id_ds.map_batches(
        block_bitmap, batch_format="pyarrow", batch_size=None
    ).take_all()
    bm = np.zeros(1 << (_BLOOM_LOG2 - 6), dtype=np.uint64)
    for p in parts:
        bm |= np.frombuffer(p["bm"], dtype=np.uint64)
    return ray.put(bm)


def _bloom_test(bm: np.ndarray, ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids).astype(np.int64)
    keep = np.ones(len(ids), dtype=bool)
    for h in _bloom_hashes(ids):
        bits = (
            bm[(h >> np.uint64(6)).astype(np.int64)] >> (h & np.uint64(63))
        ) & np.uint64(1)
        keep &= bits.astype(bool)
    return keep


def _dedup_pairs(pairs):
    """Same pair can surface from several bands: local pre-dedup, then
    a coarse id_a-bucket shuffle with per-group drop_duplicates."""

    def local_dedup(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates(subset=["id_a", "id_b"])
        df["_pb"] = (df["id_a"] % 64).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    return (
        pairs.map_batches(local_dedup, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(
            lambda g: g.drop_duplicates(subset=["id_a", "id_b"]).drop(columns=["_pb"]),
            batch_format="pandas",
        )
    )


def _common_token_counts(ds, text_col, id_col, shingle_k,
                         max_sample: int = 4096, cap: int = 1 << 16):
    """Sampled global shingle-frequency table for RAREST-FIRST AllPairs
    prefix ordering (Bayardo et al. WWW'07 order documents' tokens by
    ascending document frequency so prefixes hold the rare tokens and
    candidate groups stay tiny). Correctness needs only a CONSISTENT
    total order shared by every document, so sampled counts keep the
    exact-result guarantee while buying the performance: without this,
    a corpus with a small shared vocabulary (shingles collide heavily)
    explodes the token-group cross products — measured 107 M candidate
    pairs -> ~10³ on the sf0.1 fixture. Hash-spread sample of
    ``max_sample`` docs, driver-side count, top ``cap`` kept (unseen
    tokens count 0 = rarest). Returns (tokens sorted asc, counts,
    sampled distinct count) — the third value doubles as the density
    signal that routes to the dense-vocabulary plan."""
    from raykg.ops.sample import hash_spread_sample_rows

    rows = hash_spread_sample_rows(
        ds.select_columns([id_col, text_col]), id_col, max_sample)
    if not rows:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64), 0
    sh = [_shingles(r[text_col], shingle_k) for r in rows]
    flat = np.concatenate(sh) if sh else np.zeros(0, dtype=np.uint64)
    toks, counts = np.unique(flat, return_counts=True)
    n_distinct = len(toks)
    keep = counts >= 2  # singletons tie with unseen tokens at rank 0
    toks, counts = toks[keep], counts[keep]
    if len(toks) > cap:
        top = np.argpartition(-counts, cap - 1)[:cap]
        top.sort()
        toks, counts = toks[top], counts[top]
    return toks, counts.astype(np.int64), n_distinct


def _prefix_token_table(texts, ids, shingle_k, threshold, id_name,
                        freq=None):
    """AllPairs prefix emission shared by jaccard_near_dup_pairs and
    jaccard_similarity_join: each doc's shingle-hash set sorted in a
    GLOBAL total order, first |S| - ceil(t*|S|) + 1 tokens emitted.
    The order is (sampled document frequency asc, hash asc) when a
    ``freq`` table from ``_common_token_counts`` is given — the
    rarest-first ordering that keeps candidate groups small — else
    plain hash order (uniform, no pass needed). The -1e-9 guards float
    products like 0.8*10 -> 8.000000000000002 -> ceil 9, which would
    SHRINK the prefix and miss pairs (erring the other way only emits
    one extra token)."""
    ftoks, fcounts = freq if freq is not None else (None, None)
    toks, docs = [], []
    for i, t in zip(ids.tolist(), texts):
        sh = np.sort(_shingles(t, shingle_k))
        if ftoks is not None and len(ftoks):
            pos = np.clip(np.searchsorted(ftoks, sh), 0, len(ftoks) - 1)
            cnt = np.where(ftoks[pos] == sh, fcounts[pos], 0)
            sh = sh[np.lexsort((sh, cnt))]
        alpha = int(np.ceil(threshold * len(sh) - 1e-9))
        p = len(sh) - alpha + 1
        toks.append(sh[:p])
        docs.append(np.full(p, i, dtype=np.int64))
    tok = np.concatenate(toks) if toks else np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        coarse = ((tok * np.uint64(0x9E3779B97F4A7C15))
                  >> np.uint64(52)).astype(np.int32)
    return pa.table({
        "bucket": pa.array(coarse),
        "token": pa.array(tok.astype(np.int64)),
        id_name: pa.array(
            np.concatenate(docs) if docs else np.zeros(0, dtype=np.int64)
        ),
    })


def jaccard_near_dup_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.8,
    broadcast_pairs: int = 1 << 18,
    broadcast_bytes: int = 256 << 20,
):
    """EXACT n-gram-Jaccard near-duplicate pairs (id_a < id_b,
    jaccard >= threshold) — no MinHash approximation, no missed pairs.

    Candidate generation is prefix filtering (AllPairs, Bayardo et al.
    WWW'07): order each doc's shingle-hash set by a GLOBAL total order
    and emit only its first ``|S| - ceil(t*|S|) + 1`` tokens; any pair
    with jaccard >= t must share a prefix token (|A∩B| >= t*max(|A|,|B|)
    leaves too few tokens outside either prefix), so grouping the
    emitted (token, doc_id) rows finds every qualifying pair. The
    global order is (SAMPLED document frequency asc, hash asc) —
    Bayardo's rarest-first ordering, from a hash-spread sample folded
    on the driver (``_common_token_counts``; any consistent total
    order preserves exactness, so sampling costs nothing but
    tightness). Verification reuses the adaptive broadcast-vs-shuffle
    join of ``minhash_lsh_pairs``.

    The shuffle ships (coarse_bucket, token, doc_id) rows — about
    ``(1 - t) * n_shingles`` per doc, no text. Docs whose text is
    shorter than ``shingle_k`` chars hash their WHOLE text as the one
    shingle (``_shingles`` semantics), so exact short-text duplicates
    still pair; there are no empty shingle sets.

    -> Dataset(id_a, id_b, jaccard).
    """
    ds = ds.materialize()   # consumed by several passes below
    ftoks, fcounts, n_sampled = _common_token_counts(
        ds, text_col, id_col, shingle_k)
    if n_sampled <= DENSE_TOKEN_LIMIT:
        # dense shared-vocabulary corpus: prefix groups degenerate, so
        # switch to the exact bitmap-GEMM all-pairs plan (budget-gated)
        vocab = _exact_token_dict(ds, text_col, shingle_k,
                                  2 * DENSE_TOKEN_LIMIT)
        if vocab is not None and (
                ds.count() * len(vocab) * 4 <= DENSE_MATRIX_BYTES):
            return _dense_jaccard_pairs(ds, text_col, id_col, shingle_k,
                                        threshold, vocab)
    freq_ref = ray.put((ftoks, fcounts))

    def prefix_tokens(batch: pa.Table) -> pa.Table:
        return _prefix_token_table(
            batch.column(text_col).to_pylist(),
            batch.column(id_col).to_numpy(zero_copy_only=False),
            shingle_k, threshold, id_col, freq=ray.get(freq_ref))

    def pairs_in_coarse_bucket(cg: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in cg.groupby("token", sort=False):
            ids = np.unique(g[id_col].to_numpy())
            if len(ids) < 2:
                continue
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(
                {"id_a": "int64", "id_b": "int64"}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    candidates = hash_exchange(
        ds.map_batches(prefix_tokens, batch_format="pyarrow"),
        "bucket", 4096, pairs_in_coarse_bucket)
    return _verify_candidate_pairs(
        ds, candidates, text_col, id_col, shingle_k, threshold,
        broadcast_pairs, broadcast_bytes,
    )


def jaccard_similarity_join(
    left_ds,
    right_ds,
    left_text: str = "text",
    right_text: str = "text",
    left_id: str = "doc_id",
    right_id: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.8,
    broadcast_pairs: int = 1 << 18,
    broadcast_bytes: int = 256 << 20,
):
    """EXACT cross-table fuzzy join: every (left, right) pair with
    n-gram Jaccard >= threshold — the entity-matching / record-linkage
    join (the reference's whole problem is matching mention surfaces
    to entity titles; this is that operation as a first-class
    two-table operator, string-similarity rather than vector search).

    Same machinery as ``jaccard_near_dup_pairs``: both sides are
    tagged into one stream (``gid = id*2 + side`` — parity carries the
    side through the shuffle, so colliding id spaces are fine),
    prefix-filtered in global shingle-hash order (the AllPairs bound
    is per-set, so it holds unchanged for cross-set pairs: the
    smallest common token of any qualifying pair lies in BOTH
    prefixes), and only CROSS-side candidates leave each token group
    (left x right product of the per-side unique id lists — the
    within-side quadratic never happens).  Verification reuses the
    adaptive broadcast-vs-shuffle exact-jaccard stage over the tagged
    union.  Ids may be negative; decode is ``(gid - gid % 2) / 2``.

    -> Dataset(id_l, id_r, jaccard), one row per qualifying pair.
    """

    def tag(side: int, id_c: str, txt_c: str):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column(id_c).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "gid": pa.array(ids * 2 + side),
                "text": t.column(txt_c).cast(pa.string()),
            })
        return fn

    # the tagged union feeds several passes (frequency sample, vocab
    # probe, candidate generation, verification) — materialize ONCE so
    # the upstream reads/maps don't re-execute per pass
    union = left_ds.map_batches(
        tag(0, left_id, left_text), batch_format="pyarrow"
    ).union(right_ds.map_batches(
        tag(1, right_id, right_text), batch_format="pyarrow"
    )).materialize()

    def decode(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "id_l": pa.array((a - a % 2) // 2),
            "id_r": pa.array((b - b % 2) // 2),
            "jaccard": t.column("jaccard"),
        })

    ftoks, fcounts, n_sampled = _common_token_counts(
        union, "text", "gid", shingle_k)
    if n_sampled <= DENSE_TOKEN_LIMIT:
        vocab = _exact_token_dict(union, "text", shingle_k,
                                  2 * DENSE_TOKEN_LIMIT)
        if vocab is not None and (
                union.count() * len(vocab) * 4 <= DENSE_MATRIX_BYTES):
            dense = _dense_jaccard_pairs(union, "text", "gid", shingle_k,
                                         threshold, vocab, cross=True)
            return dense.map_batches(decode, batch_format="pyarrow")
    freq_ref = ray.put((ftoks, fcounts))

    def prefix_tokens(batch: pa.Table) -> pa.Table:
        return _prefix_token_table(
            batch.column("text").to_pylist(),
            batch.column("gid").to_numpy(zero_copy_only=False),
            shingle_k, threshold, "gid", freq=ray.get(freq_ref))

    def cross_pairs_in_bucket(cg: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in cg.groupby("token", sort=False):
            ids = np.unique(g["gid"].to_numpy())
            L = ids[ids % 2 == 0]
            R = ids[ids % 2 == 1]
            if len(L) and len(R):
                out_a.append(np.repeat(L, len(R)))
                out_b.append(np.tile(R, len(L)))
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(
                {"id_a": "int64", "id_b": "int64"}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    candidates = hash_exchange(
        union.map_batches(prefix_tokens, batch_format="pyarrow"),
        "bucket", 4096, cross_pairs_in_bucket)
    verified = _verify_candidate_pairs(
        union, candidates, "text", "gid", shingle_k, threshold,
        broadcast_pairs, broadcast_bytes,
    )
    return verified.map_batches(decode, batch_format="pyarrow")


def _containment_candidates(union, freq_ref, shingle_k: int,
                            threshold: float):
    """Positionally-filtered candidate generation for
    ``containment_join`` (factored for the planted-hot-shingle bound
    test). ``union`` tags left rows gid%2==0, right rows gid%2==1.
    -> Dataset(id_a, id_b) of surviving cross-side candidates."""
    def order_tokens(text: str, ftoks, fcounts) -> np.ndarray:
        sh = np.sort(_shingles(text, shingle_k))
        if ftoks is not None and len(ftoks):
            pos = np.clip(np.searchsorted(ftoks, sh), 0, len(ftoks) - 1)
            cnt = np.where(ftoks[pos] == sh, fcounts[pos], 0)
            sh = sh[np.lexsort((sh, cnt))]
        return sh

    def emit_tokens(batch: pa.Table) -> pa.Table:
        ftoks, fcounts = ray.get(freq_ref)
        gids = batch.column("gid").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        toks, docs, poss, sizes = [], [], [], []
        for i, t in zip(gids.tolist(), texts):
            sh = order_tokens(t, ftoks, fcounts)
            n = len(sh)
            if i % 2 == 0:
                # left: prefix only (one-sided AllPairs bound); the
                # -1e-9 guards float ceil (see _prefix_token_table)
                alpha = int(np.ceil(threshold * n - 1e-9))
                p = n - alpha + 1
                sh = sh[:p]
            toks.append(sh)
            docs.append(np.full(len(sh), i, dtype=np.int64))
            poss.append(np.arange(len(sh), dtype=np.int64))
            sizes.append(np.full(len(sh), n, dtype=np.int64))
        tok = (np.concatenate(toks) if toks
               else np.zeros(0, dtype=np.uint64))
        with np.errstate(over="ignore"):
            coarse = ((tok * np.uint64(0x9E3779B97F4A7C15))
                      >> np.uint64(52)).astype(np.int32)
        z = np.zeros(0, dtype=np.int64)
        return pa.table({
            "bucket": pa.array(coarse),
            "token": pa.array(tok.astype(np.int64)),
            "gid": pa.array(np.concatenate(docs) if docs else z),
            "pos": pa.array(np.concatenate(poss) if poss else z),
            "size": pa.array(np.concatenate(sizes) if sizes else z),
        })

    def cross_pairs_in_bucket(cg: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in cg.groupby("token", sort=False):
            gid = g["gid"].to_numpy(np.int64)
            lm = gid % 2 == 0
            if not lm.any() or lm.all():
                continue
            size = g["size"].to_numpy(np.int64)
            pos = g["pos"].to_numpy(np.int64)
            # positional filter: overlap <= min(|S_L|-p_l, |S_R|-p_r);
            # the left bound |S_L|-p_l >= ceil(t*|S_L|) holds by prefix
            # construction, so only the right suffix gates the pair
            need = np.ceil(threshold * size[lm] - 1e-9).astype(np.int64)
            avail_r = size[~lm] - pos[~lm]
            order = np.argsort(-avail_r, kind="stable")
            r_sorted = gid[~lm][order]
            a_sorted = avail_r[order]           # descending
            cnt = np.searchsorted(-a_sorted, -need, side="right")
            total = int(cnt.sum())
            if total == 0:
                continue
            offs = np.repeat(np.cumsum(cnt) - cnt, cnt)
            flat = np.arange(total, dtype=np.int64) - offs
            out_a.append(np.repeat(gid[lm], cnt))
            out_b.append(r_sorted[flat])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(
                {"id_a": "int64", "id_b": "int64"}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    return hash_exchange(
        union.map_batches(emit_tokens, batch_format="pyarrow"),
        "bucket", 4096, cross_pairs_in_bucket)


def containment_join(
    left_ds,
    right_ds,
    left_text: str = "text",
    right_text: str = "text",
    left_id: str = "doc_id",
    right_id: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.8,
    broadcast_pairs: int = 1 << 18,
    broadcast_bytes: int = 256 << 20,
):
    """EXACT asymmetric containment join: every (left, right) pair
    where ``|S_L ∩ S_R| / |S_L| >= threshold`` over char-``shingle_k``
    gram sets — "the left text is mostly contained in the right one".
    The quote / excerpt / boilerplate-inclusion detector (Lee et al.
    2022 find verbatim inclusions this way): jaccard punishes a short
    snippet inside a long document (tiny union ratio), containment is
    the right score for subset-shaped duplication.

    Candidate generation is one-sided prefix filtering: a qualifying
    pair misses at most ``|S_L| - ceil(t·|S_L|)`` left tokens from
    S_R, so at least one of the left set's first
    ``|S_L| - ceil(t·|S_L|) + 1`` tokens (in the global rarest-first
    order, ``_prefix_token_table``) appears in S_R — the RIGHT side
    therefore emits ALL its distinct shingles (it cannot be
    prefix-pruned; asymmetry is paid in right-side token volume, the
    standard inverted-index exchange). Cross-side candidates only;
    verification reuses the adaptive broadcast-vs-shuffle exact stage
    with the containment metric.

    Skew bound (PPJoin-style positional filter, Xiao et al. WWW'08):
    both sides carry each token's POSITION in the doc's global-order
    token list plus the doc's set size. For a qualifying pair, every
    shared token sits at or after the first shared token's position in
    BOTH lists (positions are monotone in the shared global order), so
    ``|S_L ∩ S_R| <= min(|S_L|−p_l, |S_R|−p_r)`` — a candidate is
    emitted only when ``|S_R|−p_r >= ceil(t·|S_L|)`` (the left-side
    bound holds by prefix construction). A corpus-common shingle sorts
    LAST in the rarest-first order, so its right-side suffix bound is
    ~1 and the old degeneracy (a hot shingle in a left prefix crossing
    the whole right posting list) is pruned per-posting BEFORE the
    product is materialized: per token the rights are sorted by suffix
    length once and each left takes a searchsorted prefix slice, so
    work is O(postings·log + survivors), not O(|L|·|R|). Exactness is
    unchanged — the first shared token of a truly-qualifying pair
    always survives the bound.

    -> Dataset(id_l, id_r, containment).
    """

    def tag(side: int, id_c: str, txt_c: str):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column(id_c).to_numpy(zero_copy_only=False).astype(
                np.int64)
            return pa.table({
                "gid": pa.array(ids * 2 + side),
                "text": t.column(txt_c).cast(pa.string()),
            })
        return fn

    # the tagged union feeds several passes (frequency sample, vocab
    # probe, candidate generation, verification) — materialize ONCE so
    # the upstream reads/maps don't re-execute per pass
    union = left_ds.map_batches(
        tag(0, left_id, left_text), batch_format="pyarrow"
    ).union(right_ds.map_batches(
        tag(1, right_id, right_text), batch_format="pyarrow"
    )).materialize()

    ftoks, fcounts, _ = _common_token_counts(
        union, "text", "gid", shingle_k)
    freq_ref = ray.put((ftoks, fcounts))
    candidates = _containment_candidates(
        union, freq_ref, shingle_k, threshold)
    verified = _verify_candidate_pairs(
        union, candidates, "text", "gid", shingle_k, threshold,
        broadcast_pairs, broadcast_bytes,
        metric="containment_a", score_col="containment",
    )

    def decode(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False).astype(
            np.int64)
        b = t.column("id_b").to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pa.table({
            "id_l": pa.array((a - a % 2) // 2),
            "id_r": pa.array((b - b % 2) // 2),
            "containment": t.column("containment"),
        })

    return verified.map_batches(decode, batch_format="pyarrow")


def simhash_signatures(texts: list[str], seed: int = 11) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (uint64 per doc)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        if not toks:
            continue
        h = hash_strings(toks)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        acc = (bits * 2 - 1).sum(axis=0)
        out[i] = np.packbits((acc > 0).astype(np.uint8)[::-1]).view(np.uint64)[0]
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & 1).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def simhash_pairs(
    ds, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
):
    """Near-dup pairs by SimHash: 4×16-bit band blocking then Hamming
    verification within buckets."""

    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        S = simhash_signatures(texts)
        n = len(texts)
        band_ids = np.repeat(np.arange(4, dtype=np.int32), n)
        keys = np.empty(4 * n, dtype=np.int64)
        for bnd in range(4):
            keys[bnd * n : (bnd + 1) * n] = (
                (S >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)
            ).astype(np.int64)
        coarse = (
            ((keys.astype(np.uint64) * 31 + band_ids.astype(np.uint64))
             * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(55)
        ).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(coarse),
                "band": pa.array(band_ids),
                "band_key": pa.array(keys),
                id_col: pa.array(np.tile(ids, 4)),
                "sig": pa.array(np.tile(S.astype(np.int64), 4)),
            }
        )

    def pairs_in_coarse_bucket(cg: pd.DataFrame) -> pd.DataFrame:
        parts = [
            pairs_in_bucket(g)
            for _, g in cg.groupby(["band", "band_key"], sort=False)
        ]
        return (
            pd.concat(parts, ignore_index=True) if parts else pairs_in_bucket(cg)
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].to_numpy()
        sig = g["sig"].to_numpy().astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            if len(ids) > i + 1:
                d = hamming64(np.full(len(ids) - i - 1, sig[i]), sig[i + 1 :])
                hit = np.where(d <= max_hamming)[0]
                for j, dist in zip(hit, d[hit]):
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[i + 1 + j]))
                    out_h.append(int(dist))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h}).astype(
            {"id_a": "int64", "id_b": "int64", "hamming": "int64"}
        )

    pairs = hash_exchange(
        ds.map_batches(sigs, batch_format="pyarrow"),
        "bucket", 4096, pairs_in_coarse_bucket)
    return _dedup_pairs(pairs)


def embedding_cosine_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_bits: int = 6,
    n_tables: int = 8,
    seed: int = 5,
):
    """All pairs with cosine >= threshold (id_a < id_b), via random-
    hyperplane LSH bucketing — no driver materialization, no O(n²)
    corpus matmul.

    Each vector is hashed into ``n_tables`` sign-bit keys (``n_bits``
    hyperplanes per table); exact cosine is computed only WITHIN
    buckets, and pairs are deduped across tables. Recall for a pair at
    angle θ: 1 − (1 − (1 − θ/π)^b)^T — at cosine 0.95 (θ≈18°, bit
    agreement p≈0.899) with b=6, T=8 the miss probability is ≈0.3%.
    The shuffle ships (bucket, id, vector) × n_tables; vectors are the
    small column (d floats), never the documents.
    """
    from raykg.encode import column_to_vectors

    # draw hyperplanes once on the driver (dim from the first row)
    first = ds.limit(1).take_all()
    if not first:
        return ray.data.from_pandas(_EMPTY_COSINE_PAIRS.copy())
    dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    H = rng.normal(size=(n_tables * n_bits, dim)).astype(np.float32)
    h_ref = ray.put(H)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    def bucketize(batch: pa.Table) -> pa.Table:
        planes = ray.get(h_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        V = column_to_vectors(batch.column(vec_col)).astype(np.float32)
        n = len(ids)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1
        Vn = V / norms
        bits = (Vn @ planes.T) > 0  # (n, T*b)
        keys = np.empty(n_tables * n, dtype=np.int64)
        for t in range(n_tables):
            block = bits[:, t * n_bits : (t + 1) * n_bits].astype(np.int64)
            keys[t * n : (t + 1) * n] = (block @ weights) + (t << n_bits)
        flat = np.tile(np.arange(n), n_tables)
        vec_vals = Vn[flat].reshape(-1)
        return pa.table(
            {
                "bucket": pa.array(keys, type=pa.int64()),
                id_col: pa.array(np.tile(ids, n_tables), type=pa.int64()),
                "_v": pa.FixedSizeListArray.from_arrays(
                    pa.array(vec_vals, type=pa.float32()), dim
                ),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        if len(g) < 2:
            return _EMPTY_COSINE_PAIRS.copy()
        ids = g[id_col].to_numpy()
        Vn = np.stack([np.asarray(v, dtype=np.float32) for v in g["_v"]])
        out_a, out_b, out_c = [], [], []
        # chunked upper-triangle matmul: a hot bucket never allocates
        # more than chunk × bucket_size scores
        chunk = 512
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            sims = Vn[lo:hi] @ Vn.T
            ii, jj = np.where(sims >= threshold)
            keep = (lo + ii) < jj
            out_a.append(ids[lo + ii[keep]])
            out_b.append(ids[jj[keep]])
            out_c.append(sims[ii[keep], jj[keep]].astype(np.float64))
        if not out_a:
            return _EMPTY_COSINE_PAIRS.copy()
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    def pairs_folded(g: pd.DataFrame) -> pd.DataFrame:
        # the exchange folds many raw LSH keys into one task; each
        # LSH bucket still pairs only within itself
        if not len(g):
            return _EMPTY_COSINE_PAIRS.copy()
        return pd.concat(
            [pairs_in_bucket(sub)
             for _, sub in g.groupby("bucket", sort=False)],
            ignore_index=True)

    from raykg.ops.exchange import hash_exchange

    pairs = hash_exchange(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        "bucket", 4096, pairs_folded)
    return _dedup_pairs(pairs)


_EMPTY_COSINE_PAIRS = pd.DataFrame(
    {"id_a": [], "id_b": [], "cosine": []}
).astype({"id_a": "int64", "id_b": "int64", "cosine": "float64"})


def semantic_dedup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_clusters: int = 64,
    sample_per_block: int = 256,
    seed: int = 7,
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means over the embedding space, then exact
    cosine near-dup grouping WITHIN each cluster; one canonical row
    (min id) per near-dup component survives. Returns a Dataset of
    ``[id_col, "keep"]`` covering every input row.

    Scale shape: centroids are trained on a HASH-SPREAD sample with a
    GLOBAL cap of ``16 x sample_per_block`` rows (a head sample sees
    one arm of a clustered corpus — the ops/pq.py codebook lesson —
    and an uncapped per-block quota grows with block count: driver
    OOM at web scale) and
    broadcast once; assignment is one GEMM per batch; the shuffle
    ships (cluster, id, unit vector) — d floats per row, never text.
    Within a cluster the pairwise pass is the chunked upper-triangle
    GEMM of ``embedding_cosine_pairs``; components come from a
    union-find over the threshold edges. Partitioning assumption: one
    CLUSTER fits in a group task — size ``n_clusters`` so corpus /
    n_clusters rows of d floats fit worker memory (the published
    recipe uses ~100k clusters at web scale). A semantically hot
    cluster (one giant near-dup family) is exactly the case where the
    O(c²) within-cluster pass is unavoidable work.
    """
    from raykg.encode import column_to_vectors

    # hash-spread sample with a GLOBAL cap — shared helper
    # (raykg.ops.sample.hash_spread_sample_rows, the pq.py pattern)
    from raykg.ops.sample import hash_spread_sample_rows

    sample = hash_spread_sample_rows(ds, id_col, sample_per_block * 16)
    if not sample:
        return ray.data.from_pandas(
            pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                          "keep": pd.Series([], dtype="bool")}))
    X = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1
    from raykg.ops.similarity import kmeans_lite

    centers = kmeans_lite(X / norms, n_clusters, seed=seed)
    cnorm = np.linalg.norm(centers, axis=1, keepdims=True)
    cnorm[cnorm == 0] = 1
    c_ref = ray.put((centers / cnorm).astype(np.float32))

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        V = column_to_vectors(batch.column(vec_col)).astype(np.float32)
        n = np.linalg.norm(V, axis=1, keepdims=True)
        n[n == 0] = 1
        Vn = V / n
        lab = (Vn @ C.T).argmax(axis=1).astype(np.int32)
        dim = Vn.shape[1]
        return pa.table({
            "_cluster": pa.array(lab),
            id_col: pa.array(ids, type=pa.int64()),
            "_v": pa.FixedSizeListArray.from_arrays(
                pa.array(Vn.reshape(-1), type=pa.float32()), dim),
        })

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame({id_col: ids, "keep": np.ones(n, bool)})
        Vn = np.stack([np.asarray(v, dtype=np.float32) for v in g["_v"]])
        parent = np.arange(n)

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        chunk = 512
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            sims = Vn[lo:hi] @ Vn.T
            ii, jj = np.where(sims >= threshold)
            ii = ii + lo
            m = ii < jj
            for a, b in zip(ii[m], jj[m]):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(n)])
        # ids are sorted ascending, so the component root IS the min id
        return pd.DataFrame({id_col: ids, "keep": roots == np.arange(n)})

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("_cluster")
        .map_groups(dedup_cluster, batch_format="pandas")
    )


DENSE_TOKEN_LIMIT = 1 << 14     # sampled distinct shingles under this -> try dense plan
DENSE_MATRIX_BYTES = 256 << 20  # corpus float32 token matrix budget


def _exact_token_dict(ds, text_col, shingle_k, limit):
    """Exact distinct shingle vocabulary IF small (else None): one
    streaming per-block unique pass; a block whose own distinct count
    exceeds the limit short-circuits with an overflow sentinel, so the
    driver fold is bounded by blocks × limit."""

    def part(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        if texts:
            u = np.unique(np.concatenate(
                [_shingles(x, shingle_k) for x in texts]))
        else:
            u = np.zeros(0, dtype=np.uint64)
        if len(u) > limit:
            return pa.table({"tok": pa.array([0], pa.uint64()),
                             "over": pa.array([True])})
        return pa.table({"tok": pa.array(u, pa.uint64()),
                         "over": pa.array(np.zeros(len(u), dtype=bool))})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return np.zeros(0, dtype=np.uint64)
    if parts["over"].any():
        return None
    toks = np.unique(parts["tok"].to_numpy().astype(np.uint64))
    return toks if len(toks) <= limit else None


def _pack_token_rows(t: pa.Table, text_col, id_col, toks,
                     shingle_k) -> pa.Table:
    texts = t.column(text_col).to_pylist()
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    M = np.zeros((len(texts), len(toks)), dtype=np.uint8)
    for r, x in enumerate(texts):
        sh = _shingles(x, shingle_k)
        M[r, np.searchsorted(toks, sh)] = 1
    return pa.table({
        id_col: pa.array(ids),
        "_sz": pa.array(M.sum(axis=1).astype(np.int64)),
        "_row": pa.array([m.tobytes() for m in M], pa.binary()),
    })


@ray.remote
def _assemble_token_matrix(block_refs, id_col, d):
    """Worker task: concatenate the packed per-block rows into ONE
    (ids, sizes, float32 matrix) corpus payload in the object store —
    the driver routes refs only (the auto_join broadcast pattern)."""
    blocks = ray.get(block_refs)
    t = pa.concat_tables(blocks)
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    sizes = t.column("_sz").to_numpy(zero_copy_only=False).astype(np.int64)
    rows = t.column("_row").to_pylist()
    M = (np.frombuffer(b"".join(rows), dtype=np.uint8)
         .reshape(len(rows), d).astype(np.float32))
    return ids, sizes, M


def _dense_jaccard_pairs(ds, text_col, id_col, shingle_k, threshold,
                         toks, cross=False):
    """Dense-vocabulary EXACT all-pairs jaccard: when the corpus'
    distinct shingle set is small (a shared-vocabulary corpus — the
    case where AllPairs prefix groups degenerate into near-quadratic
    cross products; measured 107 M candidates on the sf0.1 fixture),
    represent every document as a 0/1 row over the exact token
    dictionary and compute ALL pairwise intersections as one
    block × corpus float32 GEMM (counts < 2²⁴ are exact in float32;
    jaccard divides in float64, identical to the set-based oracle).
    No candidate generation, no verification stage — scores come out
    exact in one streaming pass over the corpus against a
    worker-assembled broadcast matrix.

    ``cross=True`` runs the tagged-union variant (even gid = left,
    odd gid = right; only cross-parity pairs emit). Budget-gated by
    ``DENSE_MATRIX_BYTES`` on the corpus matrix — beyond it the
    caller falls back to the prefix plan.
    """
    d = len(toks)
    toks_ref = ray.put(toks)

    def pack(t: pa.Table) -> pa.Table:
        return _pack_token_rows(t, text_col, id_col, ray.get(toks_ref),
                                shingle_k)

    packed = ds.map_batches(pack, batch_format="pyarrow")
    refs = packed.to_arrow_refs()
    mat_ref = _assemble_token_matrix.remote(list(refs), id_col, d)

    def pairs(t: pa.Table) -> pa.Table:
        ids_c, sz_c, M_c = ray.get(mat_ref)
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if cross:
            left_mask = ids % 2 == 0
            texts = [x for x, m in zip(texts, left_mask) if m]
            ids = ids[left_mask]
            c_sel = np.flatnonzero(ids_c % 2 == 1)
        else:
            c_sel = None
        if not len(ids):
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        tk = ray.get(toks_ref)
        A = np.zeros((len(ids), d), dtype=np.float32)
        sz_a = np.empty(len(ids), dtype=np.int64)
        for r, x in enumerate(texts):
            sh = _shingles(x, shingle_k)
            A[r, np.searchsorted(tk, sh)] = 1
            sz_a[r] = len(sh)
        Mc = M_c if c_sel is None else M_c[c_sel]
        ic = ids_c if c_sel is None else ids_c[c_sel]
        sc = sz_c if c_sel is None else sz_c[c_sel]
        inter = (A @ Mc.T).astype(np.float64)
        union = sz_a[:, None] + sc[None, :] - inter
        jac = inter / union
        # self-join: strict id order kills self-pairs and mirrors
        ok = jac >= threshold
        if cross:
            pass
        else:
            ok &= ids[:, None] < ic[None, :]
        ai, bi = np.nonzero(ok)
        return pa.table({
            "id_a": pa.array(ids[ai]),
            "id_b": pa.array(ic[bi]),
            "jaccard": pa.array(jac[ai, bi], pa.float64()),
        })

    return ds.map_batches(pairs, batch_format="pyarrow")


def windowed_first(ds, key_cols: list, ts_col: str, id_col: str,
                   window_us: int, coarse: int = 256,
                   win_col: str = "win_start"):
    """Windowed deduplication: keep the FIRST row — min ``(ts, id)`` —
    per ``(key_cols..., tumbling window)``; the streaming-dedup-with-
    TTL approximation every event/log pipeline runs ("one signup
    event per user per hour"), and the batch form of keyed
    rate-limiting.

    Scale shape: the exact-dedup combiner — each block pre-picks its
    own local first per group (the shuffle ships at most one row per
    distinct (keys, window) per block, never all events), groups
    co-locate by hash of (keys, window), and one vectorized
    sort + head(1) per bucket answers many groups per task.  Entirely
    deterministic: the (ts asc, id asc) rule is what the paired SQL
    ``row_number()`` oracle computes.
    -> Dataset(key_cols..., win_start µs, ts, id) — the kept rows.
    """
    group = list(key_cols) + [win_col]

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(group + [ts_col, id_col], kind="mergesort")
        return df.groupby(group, sort=False, as_index=False).head(1)

    def part(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            # normalize to µs: raw cast(int64) yields the column's
            # NATIVE unit (ns inputs would make hour windows 3.6 ms)
            from raykg.util import ts_to_us

            tsv = ts_to_us(ts)
        else:
            tsv = ts.to_numpy(zero_copy_only=False)
        win = (tsv // np.int64(window_us)) * np.int64(window_us)
        df = pd.DataFrame({c: t.column(c).to_pandas() for c in key_cols})
        df[win_col] = win
        df[ts_col] = tsv
        df[id_col] = t.column(id_col).to_numpy(zero_copy_only=False)
        local = pick(df)
        # bucket by hash of the composite group (mix columns)
        h = np.zeros(len(local), dtype=np.uint64)
        for c in group:
            col = pa.array(local[c])
            from raykg.ops.joins import _key_bucket
            h = h * np.uint64(0x9E3779B97F4A7C15) + _key_bucket(
                col, 1 << 30).to_numpy(zero_copy_only=False).astype(np.uint64)
        local = local.assign(_b=(h % np.uint64(coarse)).astype(np.int64))
        return pa.Table.from_pandas(local, preserve_index=False)

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(part, batch_format="pyarrow"), "_b", coarse,
        lambda g: pick(g).drop(columns=["_b"]))
