"""Incremental exact dedup: dedup a NEW increment of documents against
everything previously ingested — the shape every continuously-fed
training corpus runs (daily crawl drops arriving against a 100 TB
history), where re-scanning history per increment is not an option.

State = seen content hashes, held as hash-bucket-partitioned parquet
(``state_dir/bucket=K/{increment_id}.parquet``), exactly the pipeline's
RW-delta pattern (``raykg/pipeline.py`` epoch cluster deltas): each
coarse bucket owns its slice of the hash space, so an increment's
groupby touches each bucket once, reads ONLY that bucket's history
(1/buckets of the state), and appends ONLY a delta file — never a
rewrite. At 100 TB history with 4096 buckets, a bucket's hash file is
history/4096 of 8-byte hashes, bounded per task.

Resume contract: delta files are named by ``increment_id`` and
overwritten on re-run, and the seen-set load SKIPS the current
increment's own deltas — a killed run re-executes to the identical
output and state (same idempotence as the pipeline's fragment
manifest). Different increments must use distinct ids; replaying an
old id reproduces that increment's original answer.

The kept-rows output is lazy; consume it fully (write_parquet/count)
to guarantee every bucket's delta landed.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raykg.util import hash_strings

INC_DEDUP_BUCKETS = 256


def incremental_exact_dedup(
    ds,
    state_dir: str,
    increment_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = INC_DEDUP_BUCKETS,
):
    """Keep rows of ``ds`` whose content hash was never seen in prior
    increments (nor earlier in this one — min ``id_col`` wins within
    the increment), and append the new hashes to the bucketed state."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch.column(text_col).to_pylist())
        t = batch.append_column(
            "_h", pa.array((h & np.uint64((1 << 62) - 1)).astype(np.int64))
        )
        df = t.to_pandas()
        df = df.sort_values(id_col).groupby("_h", as_index=False).first()
        df["_bucket"] = (df["_h"] % buckets).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def dedup_one(g: pd.DataFrame, b: int) -> pd.DataFrame:
        g = g.sort_values(id_col).groupby("_h", as_index=False).first()
        bdir = os.path.join(state_dir, f"bucket={b}")
        seen_parts = []
        if os.path.isdir(bdir):
            for f in sorted(os.listdir(bdir)):
                # skip our own (possibly half-written prior attempt's) delta
                if f.endswith(".parquet") and f != f"{increment_id}.parquet":
                    seen_parts.append(
                        pq.read_table(os.path.join(bdir, f), columns=["h"])
                        .column("h").to_numpy(zero_copy_only=False)
                    )
        if seen_parts:
            seen = np.concatenate(seen_parts)
            g = g[~g["_h"].isin(seen)]
        os.makedirs(bdir, exist_ok=True)
        tmp = os.path.join(bdir, f".{increment_id}.parquet.tmp")
        pq.write_table(
            pa.table({"h": g["_h"].to_numpy(dtype=np.int64)}), tmp
        )
        os.replace(tmp, os.path.join(bdir, f"{increment_id}.parquet"))
        return g.drop(columns=["_h", "_bucket"])

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # the exchange may fold several state buckets into one merge
        # task and hands empty frames for silent buckets — each state
        # bucket still reads/writes ITS OWN delta file (the on-disk
        # layout later increments resume from)
        if not len(g):
            return g.drop(columns=["_h", "_bucket"])
        return pd.concat(
            [dedup_one(sub, int(b))
             for b, sub in g.groupby("_bucket", sort=False)],
            ignore_index=True)

    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(add_hash, batch_format="pyarrow"), "_bucket",
        buckets, dedup_bucket)


def _band_hashes(S: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) int64 band hashes — same FNV folding as
    ``dedup.minhash_lsh_pairs`` so band collisions mean the same thing
    in both the batch and incremental operators."""
    n, num_perm = S.shape
    rows_per_band = num_perm // bands
    out = np.empty((n, bands), dtype=np.int64)
    with np.errstate(over="ignore"):
        for bnd in range(bands):
            block = S[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
            h = np.full(n, np.uint64(1469598103934665603))
            for c in range(rows_per_band):
                h = (h ^ block[:, c]) * np.uint64(1099511628211)
            out[:, bnd] = (h & np.uint64((1 << 62) - 1)).astype(np.int64)
    return out


def _read_bucket_parts(bdir: str, skip: str | None, columns: list[str]):
    """All parquet deltas of one state bucket, optionally skipping the
    current increment's own file (retry idempotence)."""
    parts = []
    if os.path.isdir(bdir):
        for f in sorted(os.listdir(bdir)):
            if f.endswith(".parquet") and f != skip:
                parts.append(pq.read_table(os.path.join(bdir, f), columns=columns))
    return parts


def _write_delta(bdir: str, increment_id: str, table: pa.Table) -> None:
    os.makedirs(bdir, exist_ok=True)
    tmp = os.path.join(bdir, f".{increment_id}.parquet.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(bdir, f"{increment_id}.parquet"))


def incremental_minhash_dedup(
    ds,
    state_dir: str,
    increment_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    buckets: int = 64,
):
    """Near-duplicate pairs of a NEW increment against all prior
    increments AND itself — MinHash-LSH with persistent state, the
    continuously-fed-corpus variant of ``dedup.minhash_lsh_pairs``.

    State (both delta-appended, named by ``increment_id`` → idempotent
    retry, never rewritten):
      * ``bands/bucket=K``: (band, band_hash, doc_id), K = band_hash
        mod buckets — candidate generation reads 1/buckets of band
        history per task;
      * ``sigs/bucket=K``: (doc_id, sig fixed-list), K = doc_id mod
        buckets — verification reads 1/buckets of signatures per task.

    Verification is SIGNATURE-based: est_jaccard = fraction of
    agreeing permutations (the unbiased MinHash estimator, σ =
    √(J(1−J)/num_perm) ≈ 0.05 at J=0.8, 64 perms) — history texts are
    never re-read, which is the point at 100 TB: the state carries
    512 B/doc of signature, not the corpus. The batch operator keeps
    exact-text verification; pick per use case.

    Returns (id_new, id_match, est_jaccard): id_new is always from
    this increment; id_match may be historical or a smaller-id row of
    this increment. The first stage (signature compute + state append)
    executes eagerly inside the call; the returned pair dataset is
    lazy.
    """
    from raykg.ops.dedup import minhash_signatures

    sig_root = os.path.join(state_dir, "sigs")
    band_root = os.path.join(state_dir, "bands")
    own = f"{increment_id}.parquet"

    def compute(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        S = minhash_signatures(texts, num_perm, shingle_k)
        bh = _band_hashes(S, bands)
        return pa.table(
            {
                id_col: pa.array(ids),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(S.reshape(-1).astype(np.int64)), num_perm
                ),
                "bh": pa.FixedSizeListArray.from_arrays(
                    pa.array(bh.reshape(-1)), bands
                ),
                "_sb": pa.array((ids % buckets).astype(np.int32)),
            }
        )

    def write_sigs(g: pd.DataFrame) -> pd.DataFrame:
        # fold-safe: one delta write PER BUCKET VALUE in the task (the
        # bucket-partitioned state layout keys on _sb, not on the task)
        out_b, out_n = [], []
        for b, sub in g.groupby("_sb", sort=True):
            ids = sub[id_col].to_numpy(dtype=np.int64)
            sig = np.stack(sub["sig"].to_numpy()).astype(np.int64)
            _write_delta(
                os.path.join(sig_root, f"bucket={int(b)}"), increment_id,
                pa.table({
                    id_col: pa.array(ids),
                    "sig": pa.FixedSizeListArray.from_arrays(
                        pa.array(sig.reshape(-1)), num_perm
                    ),
                }),
            )
            out_b.append(int(b))
            out_n.append(len(sub))
        return pd.DataFrame({"bucket": pd.Series(out_b, dtype="int64"),
                             "n": pd.Series(out_n, dtype="int64")})

    sig_ds = ds.map_batches(compute, batch_format="pyarrow").materialize()
    # eager: commit this increment's signatures before pair generation
    from raykg.ops.exchange import hash_exchange

    hash_exchange(sig_ds, "_sb", buckets, write_sigs).materialize()

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        bh = np.stack(t.column("bh").to_numpy(zero_copy_only=False)).astype(np.int64)
        n = len(ids)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)),
                "band_hash": pa.array(bh.T.reshape(-1)),
                id_col: pa.array(np.tile(ids, bands)),
                "_bb": pa.array(
                    (bh.T.reshape(-1) % buckets).astype(np.int32)
                ),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_bb"].iloc[0])
        new = g[["band", "band_hash", id_col]]
        bdir = os.path.join(band_root, f"bucket={b}")
        hist_parts = _read_bucket_parts(bdir, own, ["band", "band_hash", id_col])
        _write_delta(
            bdir, increment_id,
            pa.Table.from_pandas(new, preserve_index=False).replace_schema_metadata(None),
        )
        out_a, out_b = [], []
        new_id_arr = new[id_col].to_numpy(dtype=np.int64)
        allrows = (
            pd.concat([new] + [p.to_pandas() for p in hist_parts])
            if hist_parts else new
        )
        for _, grp in allrows.groupby(["band", "band_hash"], sort=False):
            ids = np.unique(grp[id_col].to_numpy())
            if len(ids) < 2:
                continue
            isnew = np.isin(ids, new_id_arr)
            if not isnew.any():
                continue
            ii, jj = np.triu_indices(len(ids), k=1)
            keep = isnew[ii] | isnew[jj]  # at least one side new
            a, bb = ids[ii][keep], ids[jj][keep]
            # orient: id_new first (larger ids are this increment's when
            # one side is historical; for new-new keep a<b)
            swap = ~isnew[ii][keep]
            a2 = np.where(swap, bb, a)
            b2 = np.where(swap, a, bb)
            out_a.append(a2)
            out_b.append(b2)
        if not out_a:
            return pd.DataFrame({"id_new": [], "id_match": []}).astype(
                {"id_new": "int64", "id_match": "int64"}
            )
        return (
            pd.DataFrame({"id_new": np.concatenate(out_a),
                          "id_match": np.concatenate(out_b)})
            .drop_duplicates()
        )

    def attach(side_col: str, out_col: str):
        def fn(g: pd.DataFrame) -> pd.DataFrame:
            b = int(g[side_col].iloc[0] % buckets)
            parts = _read_bucket_parts(
                os.path.join(sig_root, f"bucket={b}"), None, [id_col, "sig"]
            )
            if not parts:
                return g.iloc[0:0].assign(**{out_col: []})
            pids = np.concatenate([
                p.column(id_col).to_numpy(zero_copy_only=False) for p in parts
            ]).astype(np.int64)
            sarr = np.concatenate([
                np.stack(p.column("sig").to_numpy(zero_copy_only=False))
                for p in parts
            ])
            order = np.argsort(pids)
            spids = pids[order]
            want = g[side_col].to_numpy(dtype=np.int64)
            idx = np.searchsorted(spids, want)
            idx_c = np.clip(idx, 0, len(spids) - 1)
            valid = spids[idx_c] == want
            g = g[valid].copy()
            g[out_col] = list(sarr[order[idx_c[valid]]])
            return g
        return fn

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"id_new": [], "id_match": [],
                                 "est_jaccard": []}).astype(
                {"id_new": "int64", "id_match": "int64",
                 "est_jaccard": "float64"})
        A = np.stack(g["sig_a"].to_numpy())
        B = np.stack(g["sig_b"].to_numpy())
        est = (A == B).mean(axis=1)
        out = g[["id_new", "id_match"]].copy()
        out["est_jaccard"] = np.round(est, 6)
        return out[out["est_jaccard"] >= threshold]

    def tag_pair_bucket(t: pa.Table) -> pa.Table:
        a = t.column("id_new").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("id_match").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ b
        return t.append_column("_pb", pa.array((h % buckets).astype(np.int32)))

    pairs = (
        sig_ds.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("_bb")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        # a pair colliding in several bands surfaces from several band
        # buckets — dedup once, globally, before signatures attach
        .map_batches(tag_pair_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(
            lambda g: g.drop_duplicates(["id_new", "id_match"]).drop(
                columns=["_pb"]
            ),
            batch_format="pandas",
        )
        .map_batches(
            lambda t: t.append_column(
                "_va", pa.array(
                    (t.column("id_new").to_numpy(zero_copy_only=False)
                     % buckets).astype(np.int32))),
            batch_format="pyarrow",
        )
        .groupby("_va")
        .map_groups(attach("id_new", "sig_a"), batch_format="pandas")
        .map_batches(
            lambda t: t.append_column(
                "_vb", pa.array(
                    (t.column("id_match").to_numpy(zero_copy_only=False)
                     % buckets).astype(np.int32))),
            batch_format="pyarrow",
        )
        .groupby("_vb")
        .map_groups(attach("id_match", "sig_b"), batch_format="pandas")
        .map_batches(verify, batch_format="pandas")
    )
    return pairs.map_batches(
        lambda t: t.select(["id_new", "id_match", "est_jaccard"]),
        batch_format="pyarrow",
    )
