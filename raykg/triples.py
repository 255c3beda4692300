"""Triple emission, exact dedup, partitioned graph-store write.

Bridges the reference's final per-mention artifact (a resolved entity id
— KB wikipedia_id or minted NIL cluster, ``scripts/eval_kbp.py:486-496,
626-652``) to a (subj, pred, obj) graph store (SURVEY.md §7.6):

    (mention:{id},        kg:linksTo,   entity_uri)
    (turn:{conv}:{idx},   kg:mentions,  entity_uri)
    (nil_uri,             kg:hasMember, mention:{id})   per cluster member
    (nil_uri,             kg:label,     modal title)    per cluster

Dedup key is (subj, pred, obj). At scale this is the hash-partition +
per-partition-first pattern (SURVEY.md §4.3): a deterministic FNV bucket
column (NEVER python hash — process-salted) -> groupby(bucket) ->
drop_duplicates per group. Output is one Parquet partition per epoch so
a resumed run skips finished epochs entirely.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from raykg.schema import (
    PRED_HAS_MEMBER,
    PRED_LABEL,
    PRED_LINKS_TO,
    PRED_MENTIONS,
)
from raykg.util import hash_string_columns

DEDUP_BUCKETS = 64


def mention_triples(batch: pa.Table, nil_uri_map: dict[int, str], epoch: int) -> pa.Table:
    """Linked-mention rows -> linksTo + turn-mentions triples.

    ``nil_uri_map``: mention_id -> minted cluster uri for the epoch's
    NIL mentions (broadcast via ray.put; scale path for a huge NIL set
    is a hash join on mention_id, same output)."""
    mid_np = batch.column("mention_id").to_numpy(zero_copy_only=False)
    turn_np = batch.column("turn_idx").to_numpy(zero_copy_only=False)
    conv_np = np.asarray(batch.column("conv_id").to_pylist(), dtype=object)
    is_nil = batch.column("is_nil").to_numpy(zero_copy_only=False)
    ents = np.asarray(batch.column("entity_uri").to_pylist(), dtype=object)
    # NIL rows (the small subset) resolve through the minted-uri map
    for i in np.flatnonzero(is_nil):
        ents[i] = nil_uri_map.get(int(mid_np[i]), "")
    keep = ents != ""
    n = int(keep.sum())

    m_uri = np.char.add("mention:", mid_np[keep].astype("U20"))
    conv_k = conv_np[keep]
    # size the unicode dtype from the batch so long conv_ids never truncate
    conv_u = np.asarray(conv_k.tolist(), dtype=np.str_) if n else conv_k.astype("U1")
    t_uri = np.char.add(
        np.char.add(np.char.add("turn:", conv_u), ":"),
        turn_np[keep].astype("U10"),
    )
    ent_col = pa.array(ents[keep].tolist(), type=pa.string())
    # in-batch dedup of the turn-mentions rows (a turn mentioning the
    # same entity twice yields identical triples); the mention: rows are
    # unique by construction (mention_id is unique), so only the
    # turn-side rows ever collide — and after this local dedup only
    # batch-boundary stragglers remain for the shuffle stage
    if n:
        pair_keys = np.char.add(np.char.add(t_uri, "\x1f"),
                                ents[keep].astype(np.str_))
        _, uniq_idx = np.unique(pair_keys, return_index=True)
        uniq_idx.sort()
    else:
        uniq_idx = np.zeros(0, dtype=np.int64)
    t_uri_u = t_uri[uniq_idx]
    ent_u = ent_col.take(pa.array(uniq_idx, type=pa.int64()))
    conv_u = conv_k[uniq_idx]
    nu = len(uniq_idx)
    return pa.table(
        {
            "subj": pa.concat_arrays(
                [pa.array(m_uri.tolist(), type=pa.string()),
                 pa.array(t_uri_u.tolist(), type=pa.string())]
            ),
            "pred": pa.array(
                [PRED_LINKS_TO] * n + [PRED_MENTIONS] * nu, type=pa.string()
            ),
            "obj": pa.concat_arrays([ent_col, ent_u]),
            "epoch": pa.array(np.full(n + nu, epoch, dtype=np.int32)),
            "conv_id": pa.concat_arrays(
                [pa.array(conv_k.tolist(), type=pa.string()),
                 pa.array(conv_u.tolist(), type=pa.string())]
            ),
        }
    )


def cluster_triples(clusters_table: pa.Table, epoch: int) -> pa.Table:
    subj, pred, obj = [], [], []
    for row in clusters_table.to_pylist():
        uri = row["cluster_id"]
        subj.append(uri)
        pred.append(PRED_LABEL)
        obj.append(row["title"])
        for mid in row["mention_ids"]:
            subj.append(uri)
            pred.append(PRED_HAS_MEMBER)
            obj.append(f"mention:{mid}")
    return pa.table(
        {
            "subj": pa.array(subj, type=pa.string()),
            "pred": pa.array(pred, type=pa.string()),
            "obj": pa.array(obj, type=pa.string()),
            "epoch": pa.array(np.full(len(subj), epoch, dtype=np.int32)),
            "conv_id": pa.array([""] * len(subj), type=pa.string()),
        }
    )


def _add_bucket(batch: pa.Table) -> pa.Table:
    h = hash_string_columns(
        batch.column("subj").to_pylist(),
        batch.column("pred").to_pylist(),
        batch.column("obj").to_pylist(),
    )
    bucket = (h % np.uint64(DEDUP_BUCKETS)).astype(np.int32)
    tbl = batch.append_column("bucket", pa.array(bucket, type=pa.int32()))
    # local pre-dedup cuts shuffle volume before the bucket exchange;
    # the pandas pass is skipped entirely when the batch has no repeated
    # hashes (the common case — exactness is still guaranteed by the
    # per-bucket drop_duplicates after the shuffle)
    if len(np.unique(h)) == len(h):
        return tbl
    df = tbl.to_pandas()
    df = df.drop_duplicates(subset=["subj", "pred", "obj"])
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def _dedup_group(group: pd.DataFrame) -> pd.DataFrame:
    return group.drop_duplicates(subset=["subj", "pred", "obj"]).drop(
        columns=["bucket"]
    )


def dedup_triples(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact (subj,pred,obj) dedup: local pre-dedup -> hash-bucket
    shuffle -> per-bucket drop_duplicates."""
    from raykg.ops.exchange import hash_exchange

    return hash_exchange(
        ds.map_batches(_add_bucket, batch_format="pyarrow"),
        "bucket", DEDUP_BUCKETS, _dedup_group)
