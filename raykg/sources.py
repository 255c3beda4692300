"""Auxiliary sources: JSONL readers for reference-shaped inputs.

The reference consumes two JSONL shapes (SURVEY.md §2.1):

  * S2 — the entity catalogue ``entity.jsonl`` streamed into Postgres
    (``scripts/postgres_populate_entities.py:23-52``): one entity per
    line with ``idx`` ("curid=<wikipedia_id>" URL or plain id),
    ``title``, ``entity`` (description text). Re-expressed as
    ``read_json -> map_batches parse -> kb_entities table`` (embedding
    computed by the hash encoder, replacing the separate entity-encode
    pass, ``pipeline/biencoder/main.py:54-75``).
  * S1 — per-batch mention JSONL (``scripts/eval_kbp.py:783``,
    WikilinksNED-renamed columns, ``notebooks/create_dataset.Rmd:
    669-705``) used for conformance fixtures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from raykg.encode import HashEncoder, vectors_to_column
from raykg.schema import DIM, INDEXER_KB


def _parse_idx(idx) -> int:
    """curid URL or raw id -> wikipedia_id
    (``scripts/postgres_populate_entities.py:27-37`` semantics)."""
    if isinstance(idx, (int, np.integer)):
        return int(idx)
    s = str(idx)
    if "curid=" in s:
        return int(s.split("curid=")[-1])
    return int(s)


def read_entity_catalogue(path: str, dim: int = DIM,
                          indexer: int = INDEXER_KB) -> "rd.Dataset":
    """entity.jsonl -> kb_entities-shaped Dataset (id, indexer,
    wikipedia_id, title, descr, type_, tombstone, embedding).

    Local ids are assigned per input order like the reference's
    enumerate over the stream; with multiple files the id space is
    partitioned by block offset (deterministic under retries)."""
    ds = rd.read_json(path)

    def parse(batch: pa.Table) -> pa.Table:
        titles = [
            (t or "")[:100]  # varchar(100), postgres_populate_entities.py:11,47
            for t in batch.column("title").to_pylist()
        ]
        descrs = [
            d or ""
            for d in (
                batch.column("entity").to_pylist()
                if "entity" in batch.column_names
                else batch.column("descr").to_pylist()
            )
        ]
        wikipedia_ids = [
            _parse_idx(i) for i in batch.column("idx").to_pylist()
        ] if "idx" in batch.column_names else batch.column(
            "wikipedia_id"
        ).to_pylist()
        enc = HashEncoder(dim=dim)
        emb = enc.encode_entities(titles, descrs)
        n = len(titles)
        return pa.table(
            {
                "wikipedia_id": pa.array(wikipedia_ids, type=pa.int64()),
                "indexer": pa.array(np.full(n, indexer, dtype=np.int32)),
                "title": pa.array(titles, type=pa.string()),
                "descr": pa.array(descrs, type=pa.string()),
                "type_": pa.array([""] * n, type=pa.string()),
                "tombstone": pa.array(np.zeros(n, dtype=bool)),
                "embedding": vectors_to_column(emb),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")


MENTION_JSONL_COLUMNS = {
    # reference JSONL name -> engine name (create_dataset.Rmd:669-705)
    "mention": "mention",
    "context_left": "context_left",
    "context_right": "context_right",
    "Wikipedia_ID": "Wikipedia_ID",
    "Wikipedia_title": "Wikipedia_title",
    "NIL": "NIL",
}


def read_mention_batches(paths) -> "rd.Dataset":
    """Per-batch mention JSONL files -> mention-record Dataset with the
    engine's column names (conformance-fixture path only; the engine's
    primary input is transcript Parquet)."""
    ds = rd.read_json(paths)

    def project(batch: pa.Table) -> pa.Table:
        cols = {}
        for src, dst in MENTION_JSONL_COLUMNS.items():
            if src in batch.column_names:
                cols[dst] = batch.column(src)
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")
