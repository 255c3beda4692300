"""Candidate retrieval: exact flat inner-product index + Retriever actor.

Replaces the reference's FAISS-backed indexer microservice
(``pipeline/indexer/main.py``) and its Postgres metadata join. Semantics
preserved (SURVEY.md §2.4 J1-J3):

  * top-k inner-product search per mention over **every** loaded index,
    results concatenated then re-sorted by score desc
    (``pipeline/indexer/main.py:87-96,166-168``); an empty index
    contributes nothing (``:89-92``).
  * metadata join with tombstone semantics: an id present in the vector
    index but missing from metadata yields a *dummy* candidate with
    score −1000 that stays in the list (``:121-135``).
  * ``norm_score = score / max(‖q‖, ‖e‖)²`` (``:148-152``).

Architecture differences (Ray-Data-first, not a port): the index is an
exact numpy matmul top-k (the reference's HNSW approximation + score
recompute is unnecessary at conformance scale and is replaced by the
exact computation it was approximating — SURVEY.md §7.7.3); each
Retriever actor holds a replica of the (broadcast) KB arrays received
via ``ray.put`` object ref, so retrieval is a broadcast join with zero
shuffle; ties are broken deterministically (score desc, id asc) so
retries/reorderings cannot change output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from raykg.encode import column_to_vectors
from raykg.schema import CANDIDATE, DUMMY_SCORE, INDEXER_KB, INDEXER_RW, TOP_K


class FlatIndex:
    """Exact inner-product index over row-aligned entity arrays.

    ``titles``/``types``/``wikipedia_ids`` are metadata; ``tombstone``
    marks ids whose vectors remain searchable but whose metadata is
    deleted (dummy-candidate path).
    """

    def __init__(
        self,
        vectors: np.ndarray,  # (n, d) float32
        wikipedia_ids: np.ndarray,  # (n,) int64
        titles: list[str],
        types: list[str] | None = None,
        tombstone: np.ndarray | None = None,
        indexer_id: int = INDEXER_KB,
    ):
        n = len(vectors)
        self.vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        self.wikipedia_ids = np.asarray(wikipedia_ids, dtype=np.int64)
        self.titles = np.asarray(titles, dtype=object)
        self.types = (
            np.asarray(types, dtype=object)
            if types is not None
            else np.asarray([""] * n, dtype=object)
        )
        self.tombstone = (
            np.asarray(tombstone, dtype=bool)
            if tombstone is not None
            else np.zeros(n, dtype=bool)
        )
        self.norms = np.linalg.norm(self.vectors, axis=1) if n else np.zeros(0)
        self.indexer_id = indexer_id
        self._score_buf: np.ndarray | None = None  # reused per-chunk GEMM output

    @property
    def ntotal(self) -> int:
        return len(self.vectors)

    # queries per inner chunk: bounds the (chunk, ntotal) score matrix
    # to ~chunk*n*4 bytes regardless of the caller's batch size
    SEARCH_CHUNK = 256

    def search_knn(self, queries: np.ndarray, top_k: int):
        """-> (scores (m,k) f32, ids (m,k) int64); ids are index-local
        positions, −1-padded when the index holds fewer than k vectors.
        Ties broken by id asc (deterministic under retries). Large query
        batches are processed in fixed-size chunks so the dense score
        matrix never exceeds SEARCH_CHUNK × ntotal."""
        m = len(queries)
        if m > self.SEARCH_CHUNK and self.ntotal > 0:
            parts = [
                self.search_knn(queries[lo : lo + self.SEARCH_CHUNK], top_k)
                for lo in range(0, m, self.SEARCH_CHUNK)
            ]
            return (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
            )
        k = min(top_k, self.ntotal)
        if k == 0:
            return (
                np.zeros((m, top_k), dtype=np.float32),
                -np.ones((m, top_k), dtype=np.int64),
            )
        n = self.ntotal
        # GEMM into a reused buffer: a fresh ~chunk×n float32 allocation
        # per call means mmap/page-fault churn that serializes badly
        # across a node full of concurrent workers
        if self._score_buf is None or self._score_buf.shape[0] < m:
            self._score_buf = np.empty((max(m, self.SEARCH_CHUNK), n), dtype=np.float32)
        scores = np.matmul(
            queries.astype(np.float32, copy=False), self.vectors.T,
            out=self._score_buf[:m],
        )
        if k < n and n >= 4096:
            # Exact block-pruned top-k: a full argpartition over (m, n)
            # is memory-bandwidth-bound and dominates large-KB search.
            # Instead: per-row block maxima (one sequential pass via
            # reduceat), select the top (k + slack) blocks — any block
            # containing a top-k element has max >= the k-th best value,
            # and at most k-1 blocks can have a strictly greater max, so
            # the true top-k always lives inside the selected blocks —
            # then a small argpartition over only those columns.
            BW = 128
            starts = np.arange(0, n, BW)
            bmax = np.maximum.reduceat(scores, starts, axis=1)  # (m, nb)
            nb = bmax.shape[1]
            B = min(nb, k + 6)
            if B < nb:
                blk = np.argpartition(bmax, nb - B, axis=1)[:, nb - B:]
            else:
                blk = np.broadcast_to(np.arange(nb), (m, nb)).copy()
            cols = (blk[:, :, None] * BW + np.arange(BW)[None, None, :]).reshape(m, -1)
            oob = cols >= n
            np.clip(cols, 0, n - 1, out=cols)
            sub = np.take_along_axis(scores, cols, axis=1)
            sub[oob] = -np.inf
            loc = np.argpartition(sub, sub.shape[1] - k, axis=1)[:, sub.shape[1] - k:]
            part = np.take_along_axis(cols, loc, axis=1)
            part_scores = np.take_along_axis(sub, loc, axis=1)
        elif k < n:
            # top-k from the RIGHT tail of an ascending partition — no
            # negated copy of the (m, n) score matrix
            part = np.argpartition(scores, n - k, axis=1)[:, n - k:]
            part_scores = np.take_along_axis(scores, part, axis=1)
        else:
            part = np.broadcast_to(np.arange(n), (m, n)).copy()
            part_scores = scores
        # order the k candidates: score desc, id asc
        order = np.lexsort((part, -part_scores), axis=1)
        ids = np.take_along_axis(part, order, axis=1)
        out_scores = np.take_along_axis(part_scores, order, axis=1)
        if k < top_k:
            pad = top_k - k
            ids = np.concatenate(
                [ids, -np.ones((m, pad), dtype=np.int64)], axis=1
            )
            out_scores = np.concatenate(
                [out_scores, np.zeros((m, pad), dtype=np.float32)], axis=1
            )
        return out_scores.astype(np.float32), ids


def _kmeans_gemm(X: np.ndarray, k: int, seed: int = 7, n_iter: int = 10) -> np.ndarray:
    """Lloyd's k-means with GEMM-based assignment (argmax x·c − ‖c‖²/2
    == argmin L2) — no (n, k, d) broadcast, so it trains on large
    samples without a memory spike. Deterministic in seed."""
    X = np.asarray(X, dtype=np.float64)
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    centers = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(n_iter):
        d = X @ centers.T - 0.5 * (centers**2).sum(axis=1)[None, :]
        lab = d.argmax(axis=1)
        sums = np.zeros_like(centers)
        np.add.at(sums, lab, X)
        counts = np.bincount(lab, minlength=k).astype(np.float64)
        nonempty = counts > 0
        centers[nonempty] = sums[nonempty] / counts[nonempty, None]
        if not nonempty.all():
            # re-seed empty centers at the worst-fit points
            worst = np.argsort(d.max(axis=1))[: int((~nonempty).sum())]
            centers[~nonempty] = X[worst]
    return centers


class IvfIndex(FlatIndex):
    """Approximate inner-product index: IVF coarse partitions + nprobe
    probing over the same row-aligned entity arrays as FlatIndex.

    Counterpart of the reference's approximate HNSW index
    (``pipeline/biencoder/blink/indexer/faiss_indexer.py:76-141``) with
    its exact score recompute (``pipeline/indexer/main.py:138-152``):
    scores returned here are exact inner products over the probed
    subset, so only *recall* is approximate — the score scale feeding
    NIL prediction is unchanged vs exact search.

    Build is O(n·L·d) (one assignment GEMM) + k-means on a strided
    sample; do it ONCE on the driver via ``build_meta`` and broadcast
    the (centroids, perm, offsets) tuple through ``ray.put`` so worker
    construction is just array wiring (``prebuilt=``).

    Search groups the probe pairs BY LIST, so each inverted list does
    one (list_rows × queries) GEMM — vectorized over queries, no
    per-query Python loop. Ties break (score desc, id asc) exactly like
    FlatIndex. Compute per batch is ~nprobe/L of the exact GEMM, which
    is also what shrinks the per-batch memory-bandwidth footprint.
    """

    def __init__(
        self,
        vectors: np.ndarray,
        wikipedia_ids: np.ndarray,
        titles: list[str],
        types: list[str] | None = None,
        tombstone: np.ndarray | None = None,
        indexer_id: int = INDEXER_KB,
        n_lists: int = 128,
        nprobe: int = 16,
        seed: int = 7,
        train_sample: int = 8192,
        prebuilt: tuple | None = None,
    ):
        super().__init__(vectors, wikipedia_ids, titles, types, tombstone, indexer_id)
        vecs_by_list = None
        if prebuilt is not None:
            if len(prebuilt) == 4:  # driver pre-laid-out (see build_meta)
                (self.centroids, self.list_perm, self.list_offsets,
                 vecs_by_list) = prebuilt
            else:
                self.centroids, self.list_perm, self.list_offsets = prebuilt
        else:
            (self.centroids, self.list_perm, self.list_offsets,
             vecs_by_list) = self.build_meta(
                self.vectors, n_lists=n_lists, seed=seed,
                train_sample=train_sample,
            )
        self.n_lists = len(self.centroids)
        self.nprobe = min(nprobe, max(self.n_lists, 1))
        # vectors re-laid-out in list order: per-list access in search
        # becomes a contiguous SLICE (view) instead of a fancy-index
        # gather that would otherwise re-copy every probed list on every
        # query chunk (the gather, not the GEMM, dominated retrieval).
        # When the 4-tuple prebuilt form carries the layout (built ONCE
        # on the driver, broadcast by ray.put), worker construction is
        # pure wiring — no per-worker spill×n×d copy; the object-store
        # array is shared zero-copy by every worker on a node.
        if vecs_by_list is not None:
            self._vecs_by_list = vecs_by_list
        else:
            self._vecs_by_list = (
                np.ascontiguousarray(self.vectors[self.list_perm])
                if len(self.list_perm)
                else self.vectors
            )

    @staticmethod
    def build_meta(
        vectors: np.ndarray,
        n_lists: int = 128,
        seed: int = 7,
        train_sample: int = 8192,
        spill: int = 1,
        balance: float | None = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """-> (centroids (L,d) f32, perm (n·spill,) i64 rows grouped by
        list with id asc inside, offsets (L+1,) i64, vecs_by_list
        (n·spill, d) f32 list-ordered layout). Deterministic.

        ``spill`` > 1 assigns each vector to its ``spill`` nearest lists
        (multi-assignment): recall rises on flat-similarity corpora at
        the cost of spill× probed rows AND a spill× larger broadcast
        layout; duplicate hits are collapsed in search_knn's merge.

        ``balance``: lists larger than ``balance ×`` the mean fill are
        split into sub-lists by a seeded local k-means (the centroid is
        replaced by sub-centroids, so probing stays one argpartition
        over all centroids), then the spill assignment is re-derived
        against the final centroid set. Skewed fills make queries probe
        the BIGGEST lists preferentially — measured 2.3× the balanced
        row count per query on the bench KB — and at cluster scale the
        fat list is the straggler that sets a retrieval stage's tail
        latency. Opt-in (default ``None``: the final list count equals
        ``n_lists`` exactly) because the win is data-dependent: on
        CLUSTERED corpora splitting holds recall at a fraction of the
        probed rows (see ``test_ivf_balance_*``), while on
        flat-similarity corpora the skewed spill≥2 fills are themselves
        the recall mechanism (each vector reachable via several fat
        region lists) and splitting trades recall for speed — the
        flagship keeps spill=3/nprobe=8 unbalanced for that reason."""
        n = len(vectors)
        if n == 0:
            empty = np.zeros(
                (0, vectors.shape[1] if vectors.ndim == 2 else 0),
                dtype=np.float32,
            )
            return (
                empty,
                np.zeros(0, dtype=np.int64),
                np.zeros(1, dtype=np.int64),
                empty,
            )
        L = max(1, min(n_lists, n))
        step = max(1, n // min(train_sample, n))
        sample = vectors[::step][:train_sample]
        centroids = _kmeans_gemm(sample, L, seed=seed).astype(np.float32)
        L = len(centroids)

        def spill_assign(cents):
            # every row to its A nearest lists by min L2 (chunked GEMM)
            A = max(1, min(spill, len(cents)))
            half_c2 = 0.5 * (cents.astype(np.float64) ** 2).sum(axis=1)
            assign = np.empty((n, A), dtype=np.int64)
            CH = 65536
            for lo in range(0, n, CH):
                chunk = vectors[lo : lo + CH].astype(np.float64)
                d = chunk @ cents.T.astype(np.float64) - half_c2[None, :]
                if A == 1:
                    assign[lo : lo + CH, 0] = d.argmax(axis=1)
                else:
                    top = np.argpartition(-d, A - 1, axis=1)[:, :A]
                    assign[lo : lo + CH] = top
            return (assign.reshape(-1),
                    np.repeat(np.arange(n, dtype=np.int64), A))

        flat_assign, flat_rows = spill_assign(centroids)
        if balance is not None and n > L:
            centroids, flat_assign = IvfIndex._balance_lists(
                vectors, centroids, flat_assign, flat_rows,
                balance=balance, seed=seed, train_sample=train_sample,
            )
            if len(centroids) > L:
                # something split: re-derive the multi-assignment
                # against the FINAL centroid set, so "each vector in
                # its `spill` nearest lists" holds for the lists the
                # probe actually ranks — balancing alone leaves spill
                # copies keyed to pre-split geometry, which costs
                # recall exactly in the dense regions that split
                flat_assign, flat_rows = spill_assign(centroids)
        L = len(centroids)
        order = np.lexsort((flat_rows, flat_assign))
        perm = flat_rows[order]
        counts = np.bincount(flat_assign, minlength=L)
        offsets = np.zeros(L + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        # 4th element: the list-ordered vector layout, built ONCE here
        # so broadcast consumers skip the per-worker spill×n×d gather
        vecs_by_list = (
            np.ascontiguousarray(vectors[perm].astype(np.float32, copy=False))
            if len(perm)
            else vectors.astype(np.float32, copy=False)
        )
        return centroids, perm, offsets, vecs_by_list

    @staticmethod
    def _balance_lists(vectors, centroids, flat_assign, flat_rows,
                       balance: float, seed: int, train_sample: int,
                       max_passes: int = 4):
        """Split every list whose fill exceeds ``balance ×`` the mean
        into ceil(fill/mean) sub-lists via a seeded k-means over its
        members; the first sub-centroid keeps the list id, the rest
        append. Runs on the driver once per build; a pass only touches
        oversized lists' members. Deterministic (per-list seeds).
        Mutates and returns (centroids, flat_assign)."""
        target = max(1, -(-len(flat_assign) // len(centroids)))
        cap = max(int(balance * target), target + 1)
        for _ in range(max_passes):
            counts = np.bincount(flat_assign, minlength=len(centroids))
            big = np.flatnonzero(counts > cap)
            if len(big) == 0:
                break
            grew = False
            for l in big.tolist():
                members = np.flatnonzero(flat_assign == l)
                rows_l = flat_rows[members]
                k = min(len(rows_l), -(-int(counts[l]) // target))
                if k < 2:
                    continue
                step = max(1, len(rows_l) // train_sample)
                sub = _kmeans_gemm(
                    vectors[rows_l[::step][:train_sample]], k,
                    seed=seed + 100_003 * (l + 1),
                ).astype(np.float32)
                if len(sub) < 2:
                    continue
                half = 0.5 * (sub.astype(np.float64) ** 2).sum(axis=1)
                d = (vectors[rows_l].astype(np.float64)
                     @ sub.T.astype(np.float64) - half[None, :])
                a = d.argmax(axis=1)
                base = len(centroids)
                centroids[l] = sub[0]  # list l becomes sub-cluster 0
                centroids = np.concatenate([centroids, sub[1:]])
                new = np.where(a == 0, l, base + a - 1)
                flat_assign[members] = new
                grew = True
            if not grew:
                # stubborn lists (e.g. many identical vectors) cannot
                # split further — stop instead of re-running k-means
                break
        return centroids, flat_assign

    # larger chunks than the exact path: the IVF intermediate is
    # (list_size × queries_probing_list), not (chunk × ntotal), so a big
    # chunk costs little memory while fattening each per-list GEMM —
    # with 256-query chunks a 128-list index degenerates into ~30-query
    # matrices where argpartition/call overhead dominates the FLOPs
    IVF_SEARCH_CHUNK = 4096

    def search_knn(self, queries: np.ndarray, top_k: int):
        m = len(queries)
        if m > self.IVF_SEARCH_CHUNK and self.ntotal > 0:
            parts = [
                self.search_knn(queries[lo : lo + self.IVF_SEARCH_CHUNK], top_k)
                for lo in range(0, m, self.IVF_SEARCH_CHUNK)
            ]
            return (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
            )
        if self.ntotal == 0 or min(top_k, self.ntotal) == 0:
            return (
                np.zeros((m, top_k), dtype=np.float32),
                -np.ones((m, top_k), dtype=np.int64),
            )
        q = queries.astype(np.float32, copy=False)
        # probe by the SAME corrected score the assignment used
        # (argmax q·c − ‖c‖²/2 == min L2): a probe metric that differs
        # from the assignment metric mis-ranks lists when centroid norms
        # vary, which silently destroys recall
        if not hasattr(self, "_half_c2"):
            self._half_c2 = 0.5 * (self.centroids**2).sum(axis=1)
        qc = q @ self.centroids.T - self._half_c2[None, :]  # (m, L)
        npb = self.nprobe
        if npb < self.n_lists:
            probes = np.argpartition(-qc, npb - 1, axis=1)[:, :npb]
        else:
            probes = np.broadcast_to(np.arange(self.n_lists), (m, self.n_lists)).copy()
            npb = self.n_lists

        # group (query, list) probe pairs by list: one GEMM per list
        flat_q = np.repeat(np.arange(m), npb)
        flat_l = probes.reshape(-1)
        order_l = np.argsort(flat_l, kind="stable")
        flat_q = flat_q[order_l]
        flat_l = flat_l[order_l]
        uls, starts = np.unique(flat_l, return_index=True)
        bounds = np.append(starts, len(flat_l))

        cq_parts, cr_parts, cs_parts = [], [], []
        for i, l in enumerate(uls):
            lo, hi = int(self.list_offsets[l]), int(self.list_offsets[l + 1])
            if hi <= lo:
                continue
            rows = self.list_perm[lo:hi]
            qs = flat_q[starts[i] : bounds[i + 1]]
            # (q_l, n_l) row-major: per-query argpartition runs along
            # contiguous rows (axis-0 partitioning of a C-ordered matrix
            # strides the whole array per comparison and was ~40% of
            # search time)
            S = q[qs] @ self._vecs_by_list[lo:hi].T
            kk = min(top_k, len(rows))
            if kk < len(rows):
                top = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            else:
                top = np.broadcast_to(
                    np.arange(len(rows))[None, :], S.shape
                ).copy()
            sel_s = np.take_along_axis(S, top, axis=1).ravel()
            sel_r = rows[top].ravel()
            cq_parts.append(np.repeat(qs, top.shape[1]))
            cr_parts.append(sel_r)
            cs_parts.append(sel_s)

        if not cq_parts:
            return (
                np.zeros((m, top_k), dtype=np.float32),
                -np.ones((m, top_k), dtype=np.int64),
            )
        cq = np.concatenate(cq_parts)
        cr = np.concatenate(cr_parts)
        cs = np.concatenate(cs_parts)
        # final per-query top-k: (query asc, score desc, id asc)
        order = np.lexsort((cr, -cs, cq))
        cq, cr, cs = cq[order], cr[order], cs[order]
        # multi-assignment can surface the same row from two probed
        # lists — identical (query, row) pairs are adjacent after the
        # sort; keep the first
        if len(cq) > 1:
            keep = np.empty(len(cq), dtype=bool)
            keep[0] = True
            keep[1:] = (cq[1:] != cq[:-1]) | (cr[1:] != cr[:-1])
            if not keep.all():
                cq, cr, cs = cq[keep], cr[keep], cs[keep]
        counts = np.bincount(cq, minlength=m)
        offsets = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        take = np.minimum(counts, top_k)
        out_ids = -np.ones((m, top_k), dtype=np.int64)
        out_scores = np.zeros((m, top_k), dtype=np.float32)
        pos = offsets[:-1][:, None] + np.arange(top_k)[None, :]
        valid = np.arange(top_k)[None, :] < take[:, None]
        out_ids[valid] = cr[pos[valid]]
        out_scores[valid] = cs[pos[valid]]
        return out_scores, out_ids


class PqIndex(FlatIndex):
    """Product-quantized KB index (``ann='pq'``): ADC shortlist over
    8/16-byte codes + EXACT inner-product re-rank of the shortlist
    against the raw vectors, so emitted scores are exact on the
    shortlist (what NIL features consume) and approximation only
    narrows which rows compete — the same contract as the IVF mode.

    What PQ buys at reference scale (5.9 M × 1024 f32 ≈ 24 GB): the
    per-query SCAN touches codes (m bytes/row ≈ 47 MB at m=8) plus
    ``rerank × top_k`` raw rows, instead of streaming the whole vector
    matrix through the memory bus; on a multi-node cluster each node
    holds the small code array in its plasma store while raw vectors
    page in only for shortlists. Metadata (codebooks + codes) is built
    ONCE on the driver and broadcast, like IVF's ``build_meta``.

    Shortlist sizing: ADC tracks exact IP closely in the large but
    cannot rank near-ties; ``rerank`` must cover the corpus's
    near-duplicate multiplicity (see ops/pq.py). Recall gate in
    tests/test_index.py; flagship parity gate in tests/test_parity.py.
    """

    def __init__(self, vectors, wikipedia_ids, titles, types=None,
                 tombstone=None, indexer_id=INDEXER_KB, prebuilt=None):
        super().__init__(vectors, wikipedia_ids, titles, types, tombstone,
                         indexer_id)
        if prebuilt is None or prebuilt.get("kind") != "pq":
            raise ValueError("PqIndex needs PqIndex.build_meta output")
        self.books = prebuilt["books"]        # (m, ks, dsub) f32
        self.codes = prebuilt["codes"]        # (n, m) uint16
        self.rerank = int(prebuilt["rerank"])

    @staticmethod
    def build_meta(vectors: np.ndarray, m: int = 8, ks: int = 256,
                   rerank: int = 8, seed: int = 7,
                   train_sample: int = 8192) -> dict:
        """-> {'kind': 'pq', 'books', 'codes', 'rerank'}. Deterministic;
        trained on the same strided sample rule as IVF build_meta."""
        n = len(vectors)
        d = vectors.shape[1] if vectors.ndim == 2 else 0
        if d % max(m, 1):
            raise ValueError(f"dim {d} not divisible by pq_m={m}")
        if n == 0:
            return {"kind": "pq", "rerank": rerank,
                    "books": np.zeros((m, 0, d // max(m, 1)), dtype=np.float32),
                    "codes": np.zeros((0, m), dtype=np.uint16)}
        step = max(1, n // min(train_sample, n))
        sample = vectors[::step][:train_sample].astype(np.float64)
        dsub = d // m
        ks_eff = min(ks, len(sample))
        books = np.empty((m, ks_eff, dsub), dtype=np.float32)
        for j in range(m):
            books[j] = _kmeans_gemm(
                sample[:, j * dsub:(j + 1) * dsub], ks_eff, seed=seed + j
            ).astype(np.float32)
        codes = np.empty((n, m), dtype=np.uint16)
        CH = 65536
        for j in range(m):
            bj = books[j].astype(np.float64)
            half = 0.5 * (bj ** 2).sum(axis=1)
            for lo in range(0, n, CH):
                sub = vectors[lo:lo + CH, j * dsub:(j + 1) * dsub].astype(
                    np.float64)
                codes[lo:lo + CH, j] = (sub @ bj.T - half).argmax(axis=1)
        return {"kind": "pq", "books": books, "codes": codes,
                "rerank": rerank}

    def search_knn(self, queries: np.ndarray, top_k: int):
        m_q = len(queries)
        if m_q > self.SEARCH_CHUNK and self.ntotal > 0:
            parts = [
                self.search_knn(queries[lo:lo + self.SEARCH_CHUNK], top_k)
                for lo in range(0, m_q, self.SEARCH_CHUNK)
            ]
            return (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
            )
        n = self.ntotal
        k = min(top_k, n)
        if k == 0:
            return (
                np.zeros((m_q, top_k), dtype=np.float32),
                -np.ones((m_q, top_k), dtype=np.int64),
            )
        m_sub, _ks, dsub = self.books.shape
        Q = queries.astype(np.float32, copy=False)
        # per-query ADC tables: table[q, j, c] = q_sub[j] · book[j, c]
        tables = np.einsum(
            "qjd,jkd->qjk", Q.reshape(m_q, m_sub, dsub), self.books
        )
        approx = np.zeros((m_q, n), dtype=np.float32)
        for j in range(m_sub):
            approx += tables[:, j, self.codes[:, j]]
        s = min(self.rerank * top_k, n)
        cand = np.argpartition(-approx, s - 1, axis=1)[:, :s] if s < n else (
            np.broadcast_to(np.arange(n), (m_q, n)).copy()
        )
        # exact re-rank of the shortlist: one small GEMM per query
        out_scores = np.zeros((m_q, top_k), dtype=np.float32)
        out_ids = -np.ones((m_q, top_k), dtype=np.int64)
        for qi in range(m_q):
            rows = cand[qi]
            exact = self.vectors[rows] @ Q[qi]
            order = np.lexsort((rows, -exact))[:k]
            out_ids[qi, :k] = rows[order]
            out_scores[qi, :k] = exact[order]
        return out_scores, out_ids


class HnswIndex(FlatIndex):
    """Graph-index family (``ann='hnsw'``): a navigable-small-world
    neighbor graph searched by best-first beam, the counterpart of the
    reference's production ``IndexHNSWFlat``
    (``pipeline/biencoder/blink/indexer/faiss_indexer.py:76-141``,
    ``DenseHNSWFlatIndexer``).

    Metric semantics vs the reference: faiss HNSW is L2-only, so the
    reference appends a ``sqrt(phi - ||v||²)`` auxiliary dimension at
    index time (``faiss_indexer.py:102-125``) to turn max-inner-product
    into min-L2, and the returned (distance-scale) scores are then
    RECOMPUTED as raw inner products downstream
    (``pipeline/indexer/main.py:138-152``). This index searches inner
    product NATIVELY: every candidate visited during the beam is scored
    by its exact dot product, so the emitted scores are exact on the
    visited set and the aux-dim + recompute machinery has nothing left
    to do — the same only-recall-is-approximate contract as IvfIndex /
    PqIndex. Tie-break (score desc, id asc) matches FlatIndex.

    Build: single-layer NSW, randomized insertion order, beam of
    ``ef_construction`` per insert, best-``m`` bidirectional linking
    with degree-capped (2m) pruning by score-to-node — deterministic
    given ``seed``. Built ONCE on the driver via ``build_meta`` and
    broadcast (adjacency is ``n × 2m`` int32 ≈ 0.13 kB/row at m=16 —
    ~1/8 the vector payload at d=256), like the IVF/PQ metadata.

    Scale shape: search touches O(ef · m) rows per query through the
    shared object-store vector array — no per-query GEMM over the
    whole KB. The Python-level beam loop makes per-query latency
    higher than IvfIndex's batched per-list GEMMs on this host, which
    is why IVF stays the bench headline; HNSW is the completeness/
    parity member of the family (recall gate in tests/test_index.py,
    flagship parity gate in tests/test_parity.py)."""

    def __init__(self, vectors, wikipedia_ids, titles, types=None,
                 tombstone=None, indexer_id=INDEXER_KB, prebuilt=None,
                 ef_search: int = 96):
        super().__init__(vectors, wikipedia_ids, titles, types, tombstone,
                         indexer_id)
        if prebuilt is None or prebuilt.get("kind") != "hnsw":
            raise ValueError("HnswIndex needs HnswIndex.build_meta output")
        self.neighbors = prebuilt["neighbors"]     # (n, 2m) int32, -1 pad
        self.entry = int(prebuilt["entry"])
        self.ef_search = max(int(ef_search), 1)

    @staticmethod
    def build_meta(vectors: np.ndarray, m: int = 16,
                   ef_construction: int = 64, seed: int = 7) -> dict:
        """-> {'kind': 'hnsw', 'neighbors', 'entry'}. Deterministic."""
        n = len(vectors)
        cap = 2 * m
        nbrs = np.full((n, cap), -1, dtype=np.int32)
        deg = np.zeros(n, dtype=np.int32)
        if n == 0:
            return {"kind": "hnsw", "neighbors": nbrs, "entry": -1}
        V = np.ascontiguousarray(vectors, dtype=np.float32)
        rng = np.random.default_rng(seed)
        order = rng.permutation(n)
        entry = int(order[0])

        def beam(q: np.ndarray, ef: int):
            # best-first search over the partial graph; returns the ef
            # best (score, id) found, score = exact dot product
            import heapq

            visited = np.zeros(n, dtype=bool)
            s0 = float(V[entry] @ q)
            visited[entry] = True
            cand = [(-s0, entry)]                 # max-heap (expand)
            best = [(s0, entry)]                  # min-heap (results)
            while cand:
                cs, ci = heapq.heappop(cand)
                if -cs < best[0][0] and len(best) >= ef:
                    break
                nb = nbrs[ci, :deg[ci]]
                nb = nb[~visited[nb]]
                if not len(nb):
                    continue
                visited[nb] = True
                ss = V[nb] @ q
                for s, i in zip(ss, nb):
                    s = float(s)
                    if len(best) < ef or s > best[0][0]:
                        heapq.heappush(cand, (-s, int(i)))
                        heapq.heappush(best, (s, int(i)))
                        if len(best) > ef:
                            heapq.heappop(best)
            return best

        for v in order[1:]:
            found = beam(V[v], ef_construction)
            found.sort(key=lambda t: (-t[0], t[1]))
            sel = [i for _, i in found[:m]]
            d = len(sel)
            nbrs[v, :d] = sel
            deg[v] = d
            for u in sel:
                if deg[u] < nbrs.shape[1]:
                    nbrs[u, deg[u]] = v
                    deg[u] += 1
                else:
                    # temporarily extend then prune back to cap
                    nb = np.append(nbrs[u, :deg[u]], v).astype(np.int32)
                    ss = V[nb] @ V[u]
                    keep = np.lexsort((nb, -ss))[:cap]
                    nbrs[u, :cap] = nb[keep]
                    deg[u] = cap
        # truncate degrees into the stored array (deg column implied by
        # -1 padding; store compact)
        return {"kind": "hnsw", "neighbors": nbrs, "entry": entry}

    def search_knn(self, queries: np.ndarray, top_k: int):
        import heapq

        m_q = len(queries)
        n = self.ntotal
        k = min(top_k, n)
        if k == 0:
            return (np.zeros((m_q, top_k), dtype=np.float32),
                    -np.ones((m_q, top_k), dtype=np.int64))
        Q = queries.astype(np.float32, copy=False)
        ef = max(self.ef_search, top_k)
        nbrs = self.neighbors
        V = self.vectors
        out_scores = np.zeros((m_q, top_k), dtype=np.float32)
        out_ids = -np.ones((m_q, top_k), dtype=np.int64)
        visited = np.zeros(n, dtype=bool)
        for qi in range(m_q):
            q = Q[qi]
            visited[:] = False
            s0 = float(V[self.entry] @ q)
            visited[self.entry] = True
            cand = [(-s0, self.entry)]
            best = [(s0, self.entry)]
            while cand:
                cs, ci = heapq.heappop(cand)
                if -cs < best[0][0] and len(best) >= ef:
                    break
                nb = nbrs[ci]
                nb = nb[nb >= 0]
                nb = nb[~visited[nb]]
                if not len(nb):
                    continue
                visited[nb] = True
                ss = V[nb] @ q
                for s, i in zip(ss, nb):
                    s = float(s)
                    if len(best) < ef or s > best[0][0]:
                        heapq.heappush(cand, (-s, int(i)))
                        heapq.heappush(best, (s, int(i)))
                        if len(best) > ef:
                            heapq.heappop(best)
            ids = np.fromiter((i for _, i in best), dtype=np.int64,
                              count=len(best))
            ss = V[ids] @ q            # exact scores (float32 GEMV)
            sel = np.lexsort((ids, -ss))[:k]
            kk = len(sel)              # < k only on a disconnected tail
            out_ids[qi, :kk] = ids[sel]
            out_scores[qi, :kk] = ss[sel]
        return out_scores, out_ids


def kb_index_from_table(tbl: pa.Table, indexer_id: int = INDEXER_KB) -> FlatIndex:
    """Build the RO KB index from a kb_entities Arrow table
    (fixtures.write_fixture layout, 'tombstone' column optional)."""
    vectors = column_to_vectors(tbl.column("embedding"))
    tomb = (
        tbl.column("tombstone").to_numpy(zero_copy_only=False)
        if "tombstone" in tbl.column_names
        else None
    )
    return FlatIndex(
        vectors,
        tbl.column("wikipedia_id").to_numpy(zero_copy_only=False),
        tbl.column("title").to_pylist(),
        tbl.column("type_").to_pylist() if "type_" in tbl.column_names else None,
        tomb,
        indexer_id,
    )


def candidates_column(
    queries: np.ndarray, indexes: list[FlatIndex], top_k: int
) -> pa.ListArray:
    """Assemble the candidates list<struct> column for a query batch.

    Vectorized over the batch: per index one matmul + one metadata
    gather; the cross-index union is a row-wise stable sort."""
    m = len(queries)
    q_norms = np.linalg.norm(queries, axis=1)

    score_parts, id_parts, meta = [], [], []
    for index in indexes:
        if index.ntotal == 0:
            # empty index contributes nothing (pipeline/indexer/main.py:89-92
            # emits -1 ids which the assembly loop skips immediately)
            continue
        s, ids = index.search_knn(queries, top_k)
        safe = np.maximum(ids, 0)
        tomb = np.where(ids >= 0, index.tombstone[safe], False)
        wiki = np.where(ids >= 0, index.wikipedia_ids[safe], 0)
        e_norms = np.where(ids >= 0, index.norms[safe], 1.0)
        titles = index.titles[safe]
        types = index.types[safe]
        score_parts.append(s)
        id_parts.append(ids)
        meta.append((tomb, wiki, e_norms, titles, types, index.indexer_id))

    if not score_parts:
        empty_struct = pa.array([], type=CANDIDATE)
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(m + 1, dtype=np.int32), type=pa.int32()), empty_struct
        )
    scores = np.concatenate(score_parts, axis=1)
    ids = np.concatenate(id_parts, axis=1)
    tombs = np.concatenate([mt[0] for mt in meta], axis=1)
    wikis = np.concatenate([mt[1] for mt in meta], axis=1)
    e_norms = np.concatenate([mt[2] for mt in meta], axis=1)
    titles = np.concatenate([mt[3] for mt in meta], axis=1)
    types = np.concatenate([mt[4] for mt in meta], axis=1)
    indexers = np.concatenate(
        [np.full((m, top_k), mt[5], dtype=np.int32) for mt in meta], axis=1
    )

    raw_scores = scores.copy()
    # tombstone => dummy candidate, score pinned to DUMMY_SCORE
    scores = np.where(tombs, np.float32(DUMMY_SCORE), scores)
    raw_scores = np.where(tombs, np.float32(DUMMY_SCORE), raw_scores)
    norm_factor = np.maximum(q_norms[:, None], e_norms) ** 2
    norm_scores = np.where(
        tombs, np.float32(DUMMY_SCORE), scores / np.maximum(norm_factor, 1e-12)
    ).astype(np.float32)
    wikis = np.where(tombs, 0, wikis)

    valid = ids >= 0
    # reference sorts the concatenated candidate list by score desc with
    # a stable sort (pipeline/indexer/main.py:166-168); stable tie order
    # = index declaration order then within-index rank
    order = np.argsort(-scores, axis=1, kind="stable")
    valid_o = np.take_along_axis(valid, order, axis=1)

    def _take(arr):
        return np.take_along_axis(arr, order, axis=1)[valid_o]

    counts = valid_o.sum(axis=1)
    offsets = np.zeros(m + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])

    titles_flat = np.take_along_axis(titles, order, axis=1)[valid_o]
    types_flat = np.take_along_axis(types, order, axis=1)[valid_o]
    tomb_flat = np.take_along_axis(tombs, order, axis=1)[valid_o]
    titles_flat = np.where(tomb_flat, "", titles_flat)
    types_flat = np.where(tomb_flat, "", types_flat)

    struct = pa.StructArray.from_arrays(
        [
            pa.array(_take(raw_scores), type=pa.float32()),
            pa.array(_take(ids), type=pa.int64()),
            pa.array(_take(wikis), type=pa.int64()),
            pa.array(titles_flat.tolist(), type=pa.string()),
            pa.array(types_flat.tolist(), type=pa.string()),
            pa.array(_take(indexers), type=pa.int32()),
            pa.array(_take(scores), type=pa.float32()),
            pa.array(_take(norm_scores), type=pa.float32()),
            pa.array(tomb_flat, type=pa.bool_()),
        ],
        fields=list(CANDIDATE),
    )
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)


def compact_candidate_columns(
    queries: np.ndarray, indexes: list[FlatIndex], top_k: int
) -> dict:
    """Compact retrieval output: per-mention candidate id/score lists +
    top-candidate scalars, WITHOUT the heavy list<struct> column.

    Downstream (NIL features, eval recall@k) needs only: all candidate
    scores (dummies included), candidate wikipedia_ids, and the top
    candidate's (score, title, wikipedia_id, id, indexer). Gathering
    titles for every candidate — 20 object-array lookups per mention —
    is the single biggest cost of the full struct mode; here only the
    top-1 title is gathered."""
    m = len(queries)
    score_parts, id_parts, meta = [], [], []
    for index in indexes:
        if index.ntotal == 0:
            continue
        s, ids = index.search_knn(queries, top_k)
        safe = np.maximum(ids, 0)
        tomb = np.where(ids >= 0, index.tombstone[safe], False)
        wiki = np.where(np.where(ids >= 0, ~tomb, False), index.wikipedia_ids[safe], 0)
        score_parts.append(np.where(tomb, np.float32(DUMMY_SCORE), s))
        id_parts.append(ids)
        meta.append((wiki, np.full((m, s.shape[1]), index.indexer_id, dtype=np.int32)))

    if not score_parts:
        empty_i = pa.ListArray.from_arrays(
            pa.array(np.zeros(m + 1, dtype=np.int32)), pa.array([], type=pa.int64())
        )
        empty_f = pa.ListArray.from_arrays(
            pa.array(np.zeros(m + 1, dtype=np.int32)), pa.array([], type=pa.float32())
        )
        return {
            "cand_wikipedia_ids": empty_i,
            "cand_scores": empty_f,
            "top_score": np.zeros(m, dtype=np.float32),
            "top_title": [""] * m,
            "top_wikipedia_id": np.zeros(m, dtype=np.int64),
            "top_id": -np.ones(m, dtype=np.int64),
            "top_indexer": -np.ones(m, dtype=np.int32),
            "has": np.zeros(m, dtype=bool),
        }

    scores = np.concatenate(score_parts, axis=1)
    ids = np.concatenate(id_parts, axis=1)
    wikis = np.concatenate([mt[0] for mt in meta], axis=1)
    indexers = np.concatenate([mt[1] for mt in meta], axis=1)
    order = np.argsort(-scores, axis=1, kind="stable")
    scores = np.take_along_axis(scores, order, axis=1)
    ids = np.take_along_axis(ids, order, axis=1)
    wikis = np.take_along_axis(wikis, order, axis=1)
    indexers = np.take_along_axis(indexers, order, axis=1)
    valid = ids >= 0

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
    top_id = np.where(has, ids[:, 0], -1).astype(np.int64)
    top_wiki = np.where(has, wikis[:, 0], 0).astype(np.int64)
    top_indexer = np.where(has, indexers[:, 0], -1).astype(np.int32)
    # only the winning title is looked up, and only for real candidates
    by_indexer = {ix.indexer_id: ix for ix in indexes}
    top_title = [""] * m
    for r in np.flatnonzero(has):
        if scores[r, 0] == np.float32(DUMMY_SCORE):
            continue  # tombstone won: blank title like the dummy struct
        top_title[r] = by_indexer[int(top_indexer[r])].titles[top_id[r]]
    return {
        "cand_wikipedia_ids": wiki_col,
        "cand_scores": score_col,
        "top_score": top_score,
        "top_title": top_title,
        "top_wikipedia_id": top_wiki,
        "top_id": top_id,
        "top_indexer": top_indexer,
        "has": has,
    }


class Retriever:
    """Actor-pool stage: + ``candidates`` column.

    ``kb_ref`` is a ``ray.put`` object ref of the KB arrays tuple
    (vectors, wikipedia_ids, titles, types, tombstone) — broadcast once,
    fetched zero-copy per actor in ``__init__`` (never re-shipped per
    batch). ``rw_ref`` is the (possibly empty) read-write index snapshot
    of previously minted NIL entities: (vectors, titles) — epoch k sees
    entities minted in epochs < k (SURVEY.md §2.9 I1/I2).
    """

    def __init__(self, kb_ref, rw_ref=None, top_k: int = TOP_K,
                 compact: bool = False, ann_ref=None, nprobe: int = 16):
        """``ann_ref``: optional ray.put ref of IVF metadata
        (centroids, perm, offsets) prebuilt once on the driver with
        ``IvfIndex.build_meta`` — when given, the KB index is the
        approximate IVF index (nprobe lists probed per query) instead
        of exact flat. The RW minted-entity index is always exact: it
        is small and rebuilt every epoch."""
        self.compact = compact
        kb = ray.get(kb_ref) if not isinstance(kb_ref, tuple) else kb_ref
        vectors, wikipedia_ids, titles, types, tombstone = kb
        if ann_ref is not None:
            ann = (ray.get(ann_ref)
                   if not isinstance(ann_ref, (tuple, dict)) else ann_ref)
            if isinstance(ann, dict) and ann.get("kind") == "pq":
                self.indexes = [
                    PqIndex(vectors, wikipedia_ids, titles, types, tombstone,
                            INDEXER_KB, prebuilt=ann)
                ]
            elif isinstance(ann, dict) and ann.get("kind") == "hnsw":
                self.indexes = [
                    HnswIndex(vectors, wikipedia_ids, titles, types,
                              tombstone, INDEXER_KB, prebuilt=ann,
                              ef_search=ann.get("ef_search", 192))
                ]
            else:
                self.indexes = [
                    IvfIndex(vectors, wikipedia_ids, titles, types, tombstone,
                             INDEXER_KB, nprobe=nprobe, prebuilt=ann)
                ]
        else:
            self.indexes = [
                FlatIndex(vectors, wikipedia_ids, titles, types, tombstone,
                          INDEXER_KB)
            ]
        rw = (
            ray.get(rw_ref)
            if rw_ref is not None and not isinstance(rw_ref, tuple)
            else rw_ref
        )
        if rw is not None:
            rw_vectors, rw_titles = rw
            n = len(rw_vectors)
            self.indexes.append(
                FlatIndex(
                    rw_vectors,
                    # minted entities have no wikipedia_id
                    # (pipeline/indexer/main.py:204-208 inserts −1)
                    np.full(n, -1, dtype=np.int64),
                    rw_titles,
                    None,
                    None,
                    INDEXER_RW,
                )
            )
        self.top_k = top_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        queries = column_to_vectors(batch.column("encoding"))
        if not self.compact:
            col = candidates_column(queries, self.indexes, self.top_k)
            return batch.append_column("candidates", col)
        c = compact_candidate_columns(queries, self.indexes, self.top_k)
        batch = batch.append_column("cand_wikipedia_ids", c["cand_wikipedia_ids"])
        batch = batch.append_column("cand_scores", c["cand_scores"])
        batch = batch.append_column(
            "top_score", pa.array(c["top_score"], type=pa.float32())
        )
        batch = batch.append_column(
            "top_title", pa.array(c["top_title"], type=pa.string())
        )
        batch = batch.append_column(
            "top_wikipedia_id", pa.array(c["top_wikipedia_id"], type=pa.int64())
        )
        batch = batch.append_column("top_id", pa.array(c["top_id"], type=pa.int64()))
        return batch.append_column(
            "top_indexer", pa.array(c["top_indexer"], type=pa.int32())
        )
