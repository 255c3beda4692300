"""Sharded-KB retrieval: per-shard stages with exact running-top-k merge.

The reference keeps its whole 29 GB HNSW index resident in one process
(``README.md:35-38``); SURVEY.md §7.7.5 flags per-actor replication as
the scale blocker. This module splits the KB into S shards and runs one
retrieval stage per shard: each stage's workers hold ONLY their shard
(object-store slice via ray.put), score the batch against it, and merge
into a running top-k carried between stages in Arrow columns. The
streaming executor pipelines the stages, so a block flows shard by
shard with backpressure — on a real cluster each shard pool pins to the
nodes holding that slice.

Exactness: the global top-k by raw similarity is a subset of the union
of per-shard top-ks, so merging per-shard top-ks by raw score and
truncating to k reproduces the unsharded result bit-for-bit — including
tombstone dummies, which occupy their raw-score slot and only collapse
to −1000 at final assembly (``pipeline/indexer/main.py:121-135``
semantics). ``ShardFinalizer`` then emits the same compact columns as
the single-index path.

The minted-entity (RW) index is sharded the same way (round 3):
``RwShards`` keeps per-shard object-store slices appended by worker
tasks straight from each epoch's clusters parquet — cluster payloads
never land on the driver — and each ``ShardRetriever`` stage carries
the matching RW slice fused alongside its KB shard, accumulating the
RW running top-k bit-identically to a whole-RW flat search
(tests/test_sharded.py pins sharded == unsharded across multi-epoch
minted entities, including kill-and-resume).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray

from raykg.encode import column_to_vectors
from raykg.index import FlatIndex, compact_candidate_columns
from raykg.schema import DUMMY_SCORE, INDEXER_KB, INDEXER_RW, TOP_K

_ACC_COLS = ("_acc_raw", "_acc_ids", "_acc_wikis", "_acc_tomb")
_RW_ACC_COLS = ("_rw_raw", "_rw_ids", "_rw_titles")

# Worker-local cache of built shard stages for the stateless-task mode:
# tasks fan out to every free CPU immediately instead of waiting for an
# actor pool to ramp (the raykg.link._STAGE_CACHE lesson — pools ramp
# slower than ~30 s epochs). Keyed by STAGE SLOT (shard index /
# "finalizer"), value (ref-key, stage): a new epoch's refs evict the
# same slot's stale stage, so a worker holds at most one live stage per
# slot it has executed — bounded by the slot count, exactly the bound
# the actor-pool mode gives per actor. NOTE the planner FUSES adjacent
# stateless map_batches into one operator, so a fused task runs every
# shard stage and its worker caches every slice: on one node this is
# the optimum (zero inter-stage hops, slices are zero-copy views into
# the local plasma store), but it collapses slice isolation — on a
# real multi-node cluster use stage_mode="actors", whose pools pin
# each slice to the nodes holding it. On one box the task mode
# measures ~25% faster end-to-end (53.2 s -> 38.9 s at sf0.1).
_SHARD_STAGE_CACHE: dict = {}


def _ref_key(r):
    return r.hex() if hasattr(r, "hex") else id(r)


def _cached_stage(slot, key, build):
    hit = _SHARD_STAGE_CACHE.get(slot)
    if hit is not None and hit[0] == key:
        return hit[1]
    stage = build()
    _SHARD_STAGE_CACHE[slot] = (key, stage)
    return stage


def make_shard_stage_fn(shard_ref, top_k, is_first, nprobe, rw_shard_ref,
                        slot: int, finalizer_args=None):
    """Stateless-task wrapper around ShardRetriever with worker-local
    stage reuse (see _SHARD_STAGE_CACHE). ``finalizer_args`` =
    ``(titles_ref, rw_ref, rw_acc)`` fuses the ShardFinalizer into
    this (last) stage — the accumulators go straight from numpy to the
    compact candidate columns, skipping one stage hop and the last
    _acc_*/_rw_* Arrow repack."""
    key = (
        _ref_key(shard_ref),
        _ref_key(rw_shard_ref) if rw_shard_ref is not None else None,
        top_k, is_first, nprobe,
        _ref_key(finalizer_args[0]) if finalizer_args else None,
    )

    def build():
        return ShardRetriever(shard_ref, top_k=top_k, is_first=is_first,
                              nprobe=nprobe, rw_shard_ref=rw_shard_ref,
                              finalizer_args=finalizer_args)

    def stage_fn(batch: pa.Table) -> pa.Table:
        stage = _cached_stage(slot, key, build)
        return stage(batch)

    return stage_fn


def make_finalizer_fn(titles_ref, rw_ref, top_k, rw_acc):
    """Stateless-task wrapper around ShardFinalizer (same cache)."""
    key = (
        _ref_key(titles_ref),
        _ref_key(rw_ref) if rw_ref is not None else None,
        top_k, rw_acc,
    )

    def finalize_fn(batch: pa.Table) -> pa.Table:
        stage = _cached_stage(
            "finalizer", key,
            lambda: ShardFinalizer(titles_ref, rw_ref=rw_ref, top_k=top_k,
                                   rw_acc=rw_acc),
        )
        return stage(batch)

    return finalize_fn


def make_kb_shards(kb_tuple, n_shards: int, ivf_lists: int | None = None,
                   ivf_spill: int = 1, ivf_balance: float | None = None,
                   pq_m: int | None = None,
                   pq_rerank: int = 8, hnsw_m: int | None = None,
                   hnsw_ef_construction: int = 128,
                   hnsw_ef_search: int = 192):
    """(vectors, wikipedia_ids, titles, types, tombstone) -> list of
    ray.put refs of shard tuples (shard row offset kept so global ids
    stay stable). ``ivf_lists``: also build per-shard IVF metadata once
    on the driver so sharded retrieval composes with approximate search
    (each shard probes nprobe of its own lists; the running-top-k merge
    is unchanged — recall is per-shard approximate, scores stay exact).
    ``ivf_spill``: per-shard multi-assignment (see IvfIndex.build_meta).
    ``pq_m``: instead build per-shard PQ metadata (codebooks trained on
    the shard's own rows; exact shortlist re-rank keeps merged scores
    exact — see PqIndex). ``hnsw_m``: instead build a per-shard NSW
    graph (each shard beam-searches its own graph; the running-top-k
    merge is unchanged and scores stay exact — see HnswIndex). The
    three ann choices are mutually exclusive."""
    from raykg.index import HnswIndex, IvfIndex, PqIndex

    if sum(bool(x) for x in (ivf_lists, pq_m, hnsw_m)) > 1:
        raise ValueError(
            "pick one of ivf_lists / pq_m / hnsw_m per shard set")
    vectors, wikipedia_ids, titles, types, tombstone = kb_tuple
    n = len(vectors)
    bounds = np.linspace(0, n, n_shards + 1).astype(int)
    refs = []
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        if ivf_lists:
            meta = IvfIndex.build_meta(vectors[lo:hi], n_lists=ivf_lists,
                                       spill=ivf_spill,
                                       balance=ivf_balance)
        elif pq_m:
            meta = PqIndex.build_meta(vectors[lo:hi], m=pq_m,
                                      rerank=pq_rerank)
        elif hnsw_m:
            meta = HnswIndex.build_meta(
                vectors[lo:hi], m=hnsw_m,
                ef_construction=hnsw_ef_construction)
            meta["ef_search"] = hnsw_ef_search
        else:
            meta = None
        refs.append(
            ray.put(
                (
                    lo,
                    vectors[lo:hi],
                    np.asarray(wikipedia_ids[lo:hi]),
                    list(titles[lo:hi]),
                    list(types[lo:hi]),
                    np.asarray(tombstone[lo:hi]),
                    meta,
                )
            )
        )
    return refs


class ShardRetriever:
    """One stage per shard: + / merge the running top-k accumulator.

    When ``rw_shard_ref`` is given the stage ALSO holds the matching
    minted-entity (RW) slice and accumulates the ``_rw_*`` running
    top-k in the same pass (fused round-3: a separate RW stage chain
    doubled the actor pools and per-batch Arrow hops for a slice that
    is orders of magnitude smaller than the KB shard it rides with).
    RW accumulation keys off ``_rw_ids`` column presence, so shard
    order and empty slices need no flags."""

    def __init__(self, shard_ref, top_k: int = TOP_K, is_first: bool = False,
                 nprobe: int = 16, rw_shard_ref=None, finalizer=None,
                 finalizer_args=None):
        shard = (
            ray.get(shard_ref) if not isinstance(shard_ref, tuple) else shard_ref
        )
        lo, vectors, wikis, titles, types, tomb = shard[:6]
        meta = shard[6] if len(shard) > 6 else None
        self.offset = lo
        if isinstance(meta, dict) and meta.get("kind") == "pq":
            from raykg.index import PqIndex

            self.index = PqIndex(vectors, wikis, titles, types, tomb,
                                 INDEXER_KB, prebuilt=meta)
        elif isinstance(meta, dict) and meta.get("kind") == "hnsw":
            from raykg.index import HnswIndex

            self.index = HnswIndex(vectors, wikis, titles, types, tomb,
                                   INDEXER_KB, prebuilt=meta,
                                   ef_search=meta.get("ef_search", 192))
        elif meta is not None:
            from raykg.index import IvfIndex

            self.index = IvfIndex(vectors, wikis, titles, types, tomb,
                                  INDEXER_KB, nprobe=nprobe, prebuilt=meta)
        else:
            self.index = FlatIndex(vectors, wikis, titles, types, tomb,
                                   INDEXER_KB)
        self.rw_index = None
        if rw_shard_ref is not None:
            rw = (
                ray.get(rw_shard_ref)
                if not isinstance(rw_shard_ref, tuple) else rw_shard_ref
            )
            if rw is not None and len(rw[0]):
                self.rw_gids, rw_vectors, self.rw_titles = rw
                self.rw_index = FlatIndex(
                    rw_vectors, np.full(len(rw_vectors), -1, dtype=np.int64),
                    list(self.rw_titles), None, None, INDEXER_RW,
                )
        self.top_k = top_k
        self.is_first = is_first
        # fused LAST stage (round 5): the finalizer runs inline on the
        # numpy accumulators, skipping the last stage's Arrow repack of
        # the _acc_*/_rw_* columns and one whole stage hop.
        # ``finalizer_args`` = (titles_ref, rw_ref, rw_acc) builds it
        # HERE so the title array is resolved worker-side, never
        # materialized on the driver.
        if finalizer is None and finalizer_args is not None:
            titles_ref, rw_ref, rw_acc = finalizer_args
            finalizer = ShardFinalizer(titles_ref, rw_ref=rw_ref,
                                       top_k=top_k, rw_acc=rw_acc)
        self.finalizer = finalizer

    def __call__(self, batch: pa.Table) -> pa.Table:
        queries = column_to_vectors(batch.column("encoding"))
        m = len(queries)
        k = self.top_k
        raw, ids = self.index.search_knn(queries, k)  # raw similarity order
        valid = ids >= 0
        safe = np.maximum(ids, 0)
        tomb = np.where(valid, self.index.tombstone[safe], False)
        wikis = np.where(valid & ~tomb, self.index.wikipedia_ids[safe], 0)
        gids = np.where(valid, ids + self.offset, -1)
        raw = np.where(valid, raw, np.float32(-np.inf))

        if self.is_first:
            acc_raw, acc_ids = raw, gids
            acc_wikis, acc_tomb = wikis, tomb
        else:
            def grab(name, dtype):
                col = batch.column(name)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                return col.values.to_numpy(zero_copy_only=False).reshape(m, -1).astype(dtype)

            acc_raw = np.concatenate([grab("_acc_raw", np.float32), raw], axis=1)
            acc_ids = np.concatenate([grab("_acc_ids", np.int64), gids], axis=1)
            acc_wikis = np.concatenate([grab("_acc_wikis", np.int64), wikis], axis=1)
            acc_tomb = np.concatenate(
                [grab("_acc_tomb", np.int8).astype(bool), tomb], axis=1
            )
            # keep global top-k by (raw desc, id asc) — identical
            # ordering rule to the unsharded search
            order = np.lexsort(
                (np.where(acc_ids < 0, np.int64(1 << 62), acc_ids), -acc_raw),
                axis=1,
            )[:, :k]
            acc_raw = np.take_along_axis(acc_raw, order, axis=1)
            acc_ids = np.take_along_axis(acc_ids, order, axis=1)
            acc_wikis = np.take_along_axis(acc_wikis, order, axis=1)
            acc_tomb = np.take_along_axis(acc_tomb, order, axis=1)

        batch = batch.drop_columns([c for c in _ACC_COLS if c in batch.column_names])

        def put(name, mat, patype):
            flat = np.ascontiguousarray(mat).reshape(-1)
            return batch.append_column(
                name,
                pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, type=patype), mat.shape[1]
                ),
            )

        rw_arrays = None
        if self.rw_index is not None:
            rw_arrays = self._rw_merge(batch, queries, m, k)
        if self.finalizer is not None:
            # fused last stage: hand the numpy accumulators straight to
            # the finalizer — no _acc_*/_rw_* Arrow repack. If THIS
            # stage's RW slice is empty but earlier stages accumulated
            # one (gid%n_shards can leave a shard empty), grab theirs.
            if rw_arrays is None and "_rw_ids" in batch.column_names:
                rw_arrays = self._rw_grab(batch, m)
            return self.finalizer.finalize_arrays(
                batch, acc_raw.astype(np.float32),
                acc_ids.astype(np.int64), acc_wikis.astype(np.int64),
                acc_tomb.astype(bool), rw_arrays)
        batch = put("_acc_raw", acc_raw.astype(np.float32), pa.float32())
        batch = put("_acc_ids", acc_ids.astype(np.int64), pa.int64())
        batch = put("_acc_wikis", acc_wikis.astype(np.int64), pa.int64())
        batch = put("_acc_tomb", acc_tomb.astype(np.int8), pa.int8())
        if rw_arrays is not None:
            batch = self._rw_pack(batch, *rw_arrays)
        return batch

    def _rw_merge(self, batch: pa.Table, queries, m: int, k: int):
        """Fold this stage's RW slice into the ``_rw_*`` running top-k;
        returns the merged ``(raw, gids, titles)`` numpy arrays.

        Merge rule (raw desc, gid asc) matches FlatIndex whole-RW
        search exactly (RW row position == ascending-gid position), so
        the union across shards is bit-identical to the unsharded RW
        search regardless of which stages hold non-empty slices."""
        raw, ids = self.rw_index.search_knn(queries, k)
        valid = ids >= 0
        safe = np.maximum(ids, 0)
        gids = np.where(valid, self.rw_gids[safe], -1)
        raw = np.where(valid, raw, np.float32(-np.inf))
        titles_arr = np.asarray(list(self.rw_titles) + [""], dtype=object)
        tt = titles_arr[np.where(valid, safe, len(self.rw_titles))]

        if "_rw_ids" not in batch.column_names:
            acc_raw, acc_ids, acc_tt = raw, gids, tt
        else:
            def grab(name, dtype):
                col = batch.column(name)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                return (
                    col.values.to_numpy(zero_copy_only=False)
                    .reshape(m, -1).astype(dtype)
                )

            def grab_str(name):
                col = batch.column(name)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                return np.asarray(
                    col.values.to_pylist(), dtype=object
                ).reshape(m, -1)

            acc_raw = np.concatenate([grab("_rw_raw", np.float32), raw], axis=1)
            acc_ids = np.concatenate([grab("_rw_ids", np.int64), gids], axis=1)
            acc_tt = np.concatenate([grab_str("_rw_titles"), tt], axis=1)
            order = np.lexsort(
                (np.where(acc_ids < 0, np.int64(1 << 62), acc_ids), -acc_raw),
                axis=1,
            )[:, :k]
            acc_raw = np.take_along_axis(acc_raw, order, axis=1)
            acc_ids = np.take_along_axis(acc_ids, order, axis=1)
            acc_tt = np.take_along_axis(acc_tt, order, axis=1)
        return acc_raw, acc_ids, acc_tt

    def _rw_grab(self, batch: pa.Table, m: int):
        """Read the upstream ``_rw_*`` accumulator columns as numpy
        (fused-finalizer path when this stage's own RW slice is
        empty)."""

        def grab(name, dtype):
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return (col.values.to_numpy(zero_copy_only=False)
                    .reshape(m, -1).astype(dtype))

        col = batch.column("_rw_titles")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        tt = np.asarray(col.values.to_pylist(), dtype=object).reshape(m, -1)
        return (grab("_rw_raw", np.float32), grab("_rw_ids", np.int64),
                tt)

    def _rw_pack(self, batch: pa.Table, acc_raw, acc_ids,
                 acc_tt) -> pa.Table:
        batch = batch.drop_columns(
            [c for c in _RW_ACC_COLS if c in batch.column_names]
        )
        kk = acc_raw.shape[1]
        batch = batch.append_column(
            "_rw_raw",
            pa.FixedSizeListArray.from_arrays(
                pa.array(
                    np.ascontiguousarray(acc_raw.astype(np.float32)).reshape(-1)
                ),
                kk,
            ),
        )
        batch = batch.append_column(
            "_rw_ids",
            pa.FixedSizeListArray.from_arrays(
                pa.array(
                    np.ascontiguousarray(acc_ids.astype(np.int64)).reshape(-1)
                ),
                kk,
            ),
        )
        return batch.append_column(
            "_rw_titles",
            pa.FixedSizeListArray.from_arrays(
                pa.array(acc_tt.reshape(-1).tolist(), type=pa.string()), kk
            ),
        )


class ShardFinalizer:
    """Collapse the accumulator to the single-index compact columns
    and resolve the winning title from a broadcast title array.

    Minted-entity (RW) candidates come from one of two sources:
    ``rw_ref`` — a whole-RW (vectors, titles) broadcast searched here
    (the small-RW path), or ``rw_acc=True`` — the ``_rw_*`` running
    top-k accumulated by the upstream fused ``ShardRetriever`` stages (the
    sharded-RW path; no worker ever holds the whole RW index). Both
    produce bit-identical output: the sharded merge rule reproduces
    whole-RW search order exactly."""

    def __init__(self, titles_ref, rw_ref=None, top_k: int = TOP_K,
                 rw_acc: bool = False):
        self.titles = np.asarray(
            ray.get(titles_ref) if not isinstance(titles_ref, (list, np.ndarray))
            else titles_ref,
            dtype=object,
        )
        rw = ray.get(rw_ref) if rw_ref is not None and not isinstance(rw_ref, tuple) else rw_ref
        self.rw_index = None
        if rw is not None:
            rw_vectors, rw_titles = rw
            self.rw_index = FlatIndex(
                rw_vectors, np.full(len(rw_vectors), -1, dtype=np.int64),
                rw_titles, None, None, INDEXER_RW,
            )
        self.rw_acc = rw_acc
        self.top_k = top_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = batch.num_rows

        def grab(name, dtype):
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return col.values.to_numpy(zero_copy_only=False).reshape(m, -1).astype(dtype)

        raw = grab("_acc_raw", np.float32)
        gids = grab("_acc_ids", np.int64)
        wikis = grab("_acc_wikis", np.int64)
        tomb = grab("_acc_tomb", np.int8).astype(bool)
        rw_arrays = None
        if self.rw_acc and "_rw_ids" in batch.column_names:
            rs = grab("_rw_raw", np.float32)
            rids = grab("_rw_ids", np.int64)
            col = batch.column("_rw_titles")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            rw_titles_mat = np.asarray(
                col.values.to_pylist(), dtype=object
            ).reshape(m, -1)
            rw_arrays = (rs, rids, rw_titles_mat)
        return self.finalize_arrays(batch, raw, gids, wikis, tomb,
                                    rw_arrays)

    def finalize_arrays(self, batch: pa.Table, raw, gids, wikis, tomb,
                        rw_arrays) -> pa.Table:
        """Array-level core, also called inline by a fused last
        ShardRetriever stage (``rw_arrays`` = merged RW running top-k
        ``(raw, gids, titles)`` or None)."""
        m = batch.num_rows
        valid = gids >= 0
        scores = np.where(tomb, np.float32(DUMMY_SCORE), raw)
        indexers = np.full(scores.shape, INDEXER_KB, dtype=np.int32)
        kb_width = scores.shape[1]
        rw_titles_mat = None

        if rw_arrays is not None:
            rs, rids, rw_titles_mat = rw_arrays
            rvalid = rids >= 0
        elif self.rw_index is not None and self.rw_index.ntotal:
            queries = column_to_vectors(batch.column("encoding"))
            rs, rids = self.rw_index.search_knn(queries, self.top_k)
            rvalid = rids >= 0
        else:
            rvalid = None

        if rvalid is not None:
            scores = np.concatenate([scores, np.where(rvalid, rs, -np.inf)], axis=1)
            raw = np.concatenate([raw, rs], axis=1)
            gids = np.concatenate([gids, rids], axis=1)
            wikis = np.concatenate(
                [wikis, np.where(rvalid, -1, 0).astype(np.int64)], axis=1
            )
            tomb = np.concatenate([tomb, np.zeros_like(rvalid)], axis=1)
            valid = np.concatenate([valid, rvalid], axis=1)
            indexers = np.concatenate(
                [indexers, np.full(rs.shape, INDEXER_RW, dtype=np.int32)], axis=1
            )

        # final candidate order: score desc, stable (KB block precedes
        # RW, within-block by rank) — matches the unsharded union sort
        order = np.argsort(-np.where(valid, scores, -np.inf), axis=1, kind="stable")
        scores = np.take_along_axis(scores, order, axis=1)
        gids = np.take_along_axis(gids, order, axis=1)
        wikis = np.take_along_axis(wikis, order, axis=1)
        tomb = np.take_along_axis(tomb, order, axis=1)
        valid = np.take_along_axis(valid, order, axis=1)
        indexers = np.take_along_axis(indexers, order, axis=1)

        counts = valid.sum(axis=1)
        offsets = np.zeros(m + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        wiki_col = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(wikis[valid], type=pa.int64())
        )
        score_col = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(scores[valid], type=pa.float32())
        )
        has = counts > 0
        top_score = np.where(has, scores[:, 0], 0.0).astype(np.float32)
        top_id = np.where(has, gids[:, 0], -1).astype(np.int64)
        top_wiki = np.where(has, wikis[:, 0], 0).astype(np.int64)
        top_indexer = np.where(has, indexers[:, 0], -1).astype(np.int32)
        win_col = order[:, 0]  # source column of the winner (pre-sort)
        top_title = [""] * m
        for r in np.flatnonzero(has):
            if tomb[r, 0]:
                continue
            if top_indexer[r] == INDEXER_KB:
                top_title[r] = self.titles[top_id[r]]
            elif rw_titles_mat is not None:
                top_title[r] = rw_titles_mat[r, win_col[r] - kb_width]
            else:
                top_title[r] = self.rw_index.titles[top_id[r]]

        batch = batch.drop_columns(
            [c for c in _ACC_COLS if c in batch.column_names]
            + [c for c in _RW_ACC_COLS if c in batch.column_names]
        )
        batch = batch.append_column("cand_wikipedia_ids", wiki_col)
        batch = batch.append_column("cand_scores", score_col)
        batch = batch.append_column("top_score", pa.array(top_score, type=pa.float32()))
        batch = batch.append_column("top_title", pa.array(top_title, type=pa.string()))
        batch = batch.append_column("top_wikipedia_id", pa.array(top_wiki, type=pa.int64()))
        batch = batch.append_column("top_id", pa.array(top_id, type=pa.int64()))
        return batch.append_column("top_indexer", pa.array(top_indexer, type=pa.int32()))


# ------------------------------------------------------- sharded RW state

@ray.remote
def _rw_shard_append(old_shard, clusters_path: str, shard: int,
                     n_shards: int, base: int, dim: int):
    """Worker-side append of one epoch's minted entities to one RW
    shard: reads the epoch's clusters parquet (file or directory),
    keeps the rows whose global RW id (base + rank) hashes to this
    shard, and concatenates onto the previous shard tuple. Cluster rows
    never pass through the driver."""
    import pyarrow.parquet as pq

    from raykg.encode import column_to_vectors as c2v

    tbl = pq.read_table(clusters_path,
                        columns=["cluster_id", "center", "title"])
    if old_shard is None:
        gids0 = np.zeros(0, dtype=np.int64)
        vecs0 = np.zeros((0, dim), dtype=np.float32)
        titles0: list[str] = []
    else:
        gids0, vecs0, titles0 = old_shard
    if tbl.num_rows == 0:
        return gids0, vecs0, list(titles0)
    # rank from the canonical id "nil:{epoch}:{rank}" — order-free
    ranks = np.array(
        [int(c.rsplit(":", 1)[1]) for c in tbl.column("cluster_id").to_pylist()],
        dtype=np.int64,
    )
    gids = base + ranks
    keep = (gids % n_shards) == shard
    if not keep.any():
        return gids0, vecs0, list(titles0)
    order = np.argsort(gids[keep])  # ascending gid == RW row order
    gids_new = gids[keep][order]
    vecs = c2v(tbl.column("center"))[keep][order].astype(np.float32)
    titles_all = np.asarray(tbl.column("title").to_pylist(), dtype=object)
    titles_new = titles_all[keep][order].tolist()
    return (
        np.concatenate([gids0, gids_new]),
        np.concatenate([vecs0, vecs]),
        list(titles0) + titles_new,
    )


class RwShards:
    """Driver-side HANDLE to the sharded minted-entity (RW) index.

    The driver holds only object refs and integer per-epoch offsets —
    the vectors/titles live in the object store, appended by
    ``_rw_shard_append`` tasks that read each epoch's clusters parquet
    directly (SURVEY.md §7.7.5; removes the round-2 driver RW barrier).
    Global RW ids are ``offsets[epoch] + rank`` and shard by
    ``gid % n_shards``; ``uri_offsets()`` lets NilStage derive
    ``nil:{epoch}:{rank}`` from a global id without any uri broadcast.
    """

    def __init__(self, n_shards: int, dim: int):
        self.n_shards = n_shards
        self.dim = dim
        self.refs: list = [None] * n_shards
        self.epochs: list[int] = []
        self.offsets: list[int] = []
        self.total = 0

    def append_epoch(self, clusters_path: str, epoch: int,
                     n_clusters: int) -> None:
        base = self.total
        if n_clusters > 0:
            for s in range(self.n_shards):
                self.refs[s] = _rw_shard_append.remote(
                    self.refs[s], clusters_path, s, self.n_shards, base,
                    self.dim,
                )
        self.epochs.append(epoch)
        self.offsets.append(base)
        self.total += int(n_clusters)

    def uri_offsets(self) -> list[tuple[int, int]]:
        return list(zip(self.epochs, self.offsets))

    @property
    def ntotal(self) -> int:
        return self.total
