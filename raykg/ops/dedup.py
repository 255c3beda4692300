"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Scale shapes (ray_guide patterns, SURVEY.md §4.3):

  * exact: vectorized content hash per batch -> local pre-dedup ->
    hash-bucket shuffle -> per-bucket keep-first (min id). Never a
    global sort; never driver-side.
  * MinHash-LSH: per-batch shingling + signature (one numpy pass) ->
    explode to (band, band_hash, doc_id) rows -> groupby band bucket ->
    candidate pairs within buckets -> exact n-gram Jaccard verification
    of the pairs (pair list is the small side).
  * SimHash: 64-bit signature per doc from token hashes; candidates
    share one of four 16-bit bands; verified by Hamming distance.
  * embedding cosine: the corpus matrix is broadcast once (ray.put);
    each batch computes block @ all.T and emits pairs above threshold
    (i < j). The documented scale path replaces the broadcast with
    LSH/IVF bucketing (raykg.ops.similarity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from raykg.util import hash_strings

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

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(keep_first, batch_format="pandas")
    )


def _shingles(text: str, k: int) -> np.ndarray:
    t = (text or "").lower()
    if len(t) <= k:
        return hash_strings([t])
    return np.unique(hash_strings([t[i : i + k] for i in range(len(t) - k + 1)]))


def minhash_signatures(
    texts: list[str], num_perm: int = 64, shingle_k: int = 5, seed: int = 7
) -> np.ndarray:
    """(n, num_perm) uint64 MinHash signatures via universal hashing
    h_i(x) = (a_i * x + b_i) mod p over the shingle hash set."""
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
):
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Returns a Ray Dataset of verified pairs. Texts for verification are
    re-read per candidate group from a broadcast id->text lookup built
    from the (small) candidate-id set; at 100 TB the verification join
    becomes a hash join against the corpus instead.
    """
    rows_per_band = num_perm // bands

    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        S = minhash_signatures(texts, num_perm, shingle_k)
        n = len(texts)
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), n)
        doc_ids = np.tile(ids, bands)
        texts_rep = texts * bands
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(
                np.tile(S.astype(np.int64).reshape(n * num_perm), bands)
                .reshape(bands, n, num_perm)
                .reshape(-1)
            ),
            num_perm,
        )
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
                text_col: pa.array(texts_rep, type=pa.string()),
                "sig": sig_col,
            }
        )

    def pairs_in_coarse_bucket(cg: pd.DataFrame) -> pd.DataFrame:
        parts = [
            _pairs_in_bucket(g)
            for _, g in cg.groupby(["band", "band_hash"], sort=False)
        ]
        return pd.concat(parts, ignore_index=True) if parts else _pairs_in_bucket(cg)

    def _pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []}).astype(
            {"id_a": "int64", "id_b": "int64", "jaccard": "float64"}
        )
        if len(g) < 2:
            return empty
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        if len(g) < 2:
            return empty
        ids = g[id_col].tolist()
        texts = g[text_col].tolist()
        S = np.stack([np.asarray(s, dtype=np.int64) for s in g["sig"]])
        # vectorized signature-estimated jaccard kills the false
        # candidates a short band produces, BEFORE any exact
        # verification; chunked so a hot bucket can't blow up memory
        n_rows = len(S)
        ii_parts, jj_parts = [], []
        chunk = 256
        for lo in range(0, n_rows, chunk):
            hi = min(lo + chunk, n_rows)
            est = (S[lo:hi, None, :] == S[None, :, :]).mean(axis=2)
            ci, cj = np.where(est >= threshold - 0.15)
            keep = lo + ci < cj  # strict upper triangle in global coords
            ii_parts.append(lo + ci[keep])
            jj_parts.append(cj[keep])
        ii = np.concatenate(ii_parts) if ii_parts else np.zeros(0, dtype=np.int64)
        jj = np.concatenate(jj_parts) if jj_parts else np.zeros(0, dtype=np.int64)
        shingle_cache: dict[int, set] = {}

        def sh(idx: int) -> set:
            s = shingle_cache.get(idx)
            if s is None:
                s = set(_shingles(texts[idx], shingle_k).tolist())
                shingle_cache[idx] = s
            return s

        out_a, out_b, out_j = [], [], []
        for i, j in zip(ii.tolist(), jj.tolist()):
            sa, sb = sh(i), sh(j)
            union = len(sa | sb)
            jac = (len(sa & sb) / union) if union else 1.0
            if jac >= threshold:
                out_a.append(ids[i])
                out_b.append(ids[j])
                out_j.append(jac)
        return pd.DataFrame(
            {"id_a": out_a, "id_b": out_b, "jaccard": out_j}
        ).astype({"id_a": "int64", "id_b": "int64", "jaccard": "float64"})

    pairs = (
        ds.map_batches(sigs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_coarse_bucket, batch_format="pandas")
    )
    return _dedup_pairs(pairs)


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

    pairs = (
        ds.map_batches(sigs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_coarse_bucket, batch_format="pandas")
    )
    return _dedup_pairs(pairs)


def embedding_cosine_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
):
    """All pairs with cosine >= threshold (id_a < id_b). The full
    (normalized) corpus matrix is broadcast once via ray.put; each batch
    does one matmul against it."""
    from raykg.encode import column_to_vectors

    rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    M = np.stack([np.asarray(r[vec_col], dtype=np.float32) for r in rows])
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1
    Mn = M / norms
    ref = ray.put((ids, Mn))

    def block_pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(ref)
        bids = batch.column(id_col).to_numpy(zero_copy_only=False)
        B = column_to_vectors(batch.column(vec_col)).astype(np.float32)
        bn = np.linalg.norm(B, axis=1, keepdims=True)
        bn[bn == 0] = 1
        sims = (B / bn) @ all_m.T
        ii, jj = np.where(sims >= threshold)
        keep = bids[ii] < all_ids[jj]
        return pa.table(
            {
                "id_a": pa.array(bids[ii][keep], type=pa.int64()),
                "id_b": pa.array(all_ids[jj][keep], type=pa.int64()),
                "cosine": pa.array(sims[ii, jj][keep].astype(np.float64)),
            }
        )

    return ds.map_batches(block_pairs, batch_format="pyarrow")
