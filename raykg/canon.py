"""Canonical entity ids + per-epoch KB delta materialization.

The reference mints new-entity ids as FAISS positions
(``ids = ntotal-n .. ntotal-1``, ``pipeline/indexer/main.py:198``) and
persists metadata to Postgres. Those ids depend on arrival order of
service calls, so they are replaced here by deterministic stable ids
``nil:{epoch}:{rank}`` where rank orders the epoch's clusters by their
smallest member mention_id (FIXTURES.md §6) — invariant under Ray block
ordering, retries and parallelism.

The epoch delta (centers + titles + uris) is materialized as a Parquet
partition; Retriever actors for later epochs load base + deltas
(SURVEY.md §7.5), replacing the reference's serialize-on-every-add.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raykg.cluster import Cluster
from raykg.encode import vectors_to_column
from raykg.schema import entity_uri_nil


def clusters_to_table(clusters: list[Cluster], epoch: int) -> pa.Table:
    """Assign canonical ids and build the CLUSTERS Arrow table.

    Cluster rank (and therefore RW-index position, which downstream code
    relies on: ``NilStage.rw_uris[top_id]``) is by smallest member
    mention_id."""
    order = sorted(
        range(len(clusters)), key=lambda i: min(clusters[i].mention_ids)
    )
    ids, epochs, titles, nel, mids, ments, centers = [], [], [], [], [], [], []
    center_rows = []
    for rank, i in enumerate(order):
        c = clusters[i]
        ids.append(entity_uri_nil(epoch, rank))
        epochs.append(epoch)
        titles.append(c.title())
        nel.append(c.nelements)
        mids.append(c.mention_ids)
        ments.append(c.mentions)
        center_rows.append(c.center())
    centers_np = (
        np.stack(center_rows).astype(np.float32)
        if center_rows
        else np.zeros((0, 1), dtype=np.float32)
    )
    dim = centers_np.shape[1]
    return pa.table(
        {
            "cluster_id": pa.array(ids, type=pa.string()),
            "epoch": pa.array(epochs, type=pa.int32()),
            "title": pa.array(titles, type=pa.string()),
            "nelements": pa.array(nel, type=pa.int64()),
            "mention_ids": pa.array(mids, type=pa.list_(pa.int64())),
            "mentions": pa.array(ments, type=pa.list_(pa.string())),
            "center": vectors_to_column(centers_np)
            if len(center_rows)
            else pa.array([], type=pa.list_(pa.float32(), dim)),
        }
    )


class RwState:
    """Driver-side snapshot of the read-write index of minted entities.

    Row position == RW-index id (what Retriever/NilStage see); rebuilt
    from the clusters partitions on resume."""

    def __init__(self, dim: int):
        self.dim = dim
        self.vectors = np.zeros((0, dim), dtype=np.float32)
        self.titles: list[str] = []
        self.uris: list[str] = []

    def add_clusters(self, clusters_table: pa.Table) -> None:
        from raykg.encode import column_to_vectors

        if clusters_table.num_rows == 0:
            return
        centers = column_to_vectors(clusters_table.column("center"))
        self.vectors = np.concatenate([self.vectors, centers.astype(np.float32)])
        self.titles.extend(clusters_table.column("title").to_pylist())
        self.uris.extend(clusters_table.column("cluster_id").to_pylist())

    @property
    def ntotal(self) -> int:
        return len(self.uris)
