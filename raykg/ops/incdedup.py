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

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_bucket"].iloc[0])
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

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(dedup_bucket, batch_format="pandas")
    )
