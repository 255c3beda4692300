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

    @property
    def ntotal(self) -> int:
        return len(self.vectors)

    def search_knn(self, queries: np.ndarray, top_k: int):
        """-> (scores (m,k) f32, ids (m,k) int64); ids are index-local
        positions, −1-padded when the index holds fewer than k vectors.
        Ties broken by id asc (deterministic under retries)."""
        m = len(queries)
        k = min(top_k, self.ntotal)
        if k == 0:
            return (
                np.zeros((m, top_k), dtype=np.float32),
                -np.ones((m, top_k), dtype=np.int64),
            )
        scores = queries.astype(np.float32, copy=False) @ self.vectors.T  # (m, n)
        if k < self.ntotal:
            part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
            part_scores = np.take_along_axis(scores, part, axis=1)
        else:
            part = np.broadcast_to(np.arange(self.ntotal), (m, self.ntotal)).copy()
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


class Retriever:
    """Actor-pool stage: + ``candidates`` column.

    ``kb_ref`` is a ``ray.put`` object ref of the KB arrays tuple
    (vectors, wikipedia_ids, titles, types, tombstone) — broadcast once,
    fetched zero-copy per actor in ``__init__`` (never re-shipped per
    batch). ``rw_ref`` is the (possibly empty) read-write index snapshot
    of previously minted NIL entities: (vectors, titles) — epoch k sees
    entities minted in epochs < k (SURVEY.md §2.9 I1/I2).
    """

    def __init__(self, kb_ref, rw_ref=None, top_k: int = TOP_K):
        kb = ray.get(kb_ref) if not isinstance(kb_ref, tuple) else kb_ref
        vectors, wikipedia_ids, titles, types, tombstone = kb
        self.indexes = [
            FlatIndex(vectors, wikipedia_ids, titles, types, tombstone, INDEXER_KB)
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
        col = candidates_column(queries, self.indexes, self.top_k)
        return batch.append_column("candidates", col)
