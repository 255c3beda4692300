"""Resumable partitioned Parquet sink.

The generic form of the pipeline's per-epoch fragment manifest
(raykg/pipeline.py): output is one directory per PARTITION of a
caller-chosen key, each written atomically (temp file + rename) and
recorded in a manifest — so a killed job reruns only unfinished
partitions and a finished run is a no-op. This is the "resumable
output" contract a 100 TB job needs: never one giant file, never a
half-written partition visible to readers, restart cost proportional
to the missing work only.

Layout:

    out_dir/
      part=<v0>/data.parquet
      part=<v1>/data.parquet
      _MANIFEST.json            {"done": {"<v0>": n_rows, ...}}

Partitions are written by worker tasks inside a ``map_groups`` over
the partition key; the manifest is folded on the driver from the
per-partition row counts (tiny). ``partition_fn`` maps the key column
to a bounded partition id (default: identity for low-cardinality
keys; pass e.g. ``lambda k: k % 256`` to bucket a high-cardinality
key). Idempotence: a partition directory present in the manifest is
skipped at the READ stage of the rerun (filter before any work), and
the atomic rename means a crash mid-write leaves only a temp file the
rerun overwrites.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_MANIFEST.json")


def load_manifest(out_dir: str) -> dict:
    try:
        with open(_manifest_path(out_dir)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {"done": {}}


def resumable_write_parquet(
    ds,
    out_dir: str,
    partition_col: str,
    partition_fn=None,
) -> dict:
    """Write ``ds`` partitioned by ``partition_fn(ds[partition_col])``,
    skipping partitions already in the manifest. Returns the updated
    manifest dict. Deterministic inputs + a stable partition_fn give
    exactly-once output per partition across any number of retries."""
    os.makedirs(out_dir, exist_ok=True)
    man = load_manifest(out_dir)
    done = set(man["done"])

    def tag(t: pa.Table) -> pa.Table:
        keys = t.column(partition_col).to_numpy(zero_copy_only=False)
        parts = (np.asarray([partition_fn(k) for k in keys])
                 if partition_fn is not None else keys)
        parts = pd.Series(parts).astype(str).to_numpy()
        t = t.append_column("_part", pa.array(parts))
        if done:
            keep = ~np.isin(parts, list(done))
            t = t.filter(pa.array(keep))
        return t

    def write_partition(g: pd.DataFrame) -> pd.DataFrame:
        part = g["_part"].iloc[0]
        pdir = os.path.join(out_dir, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        final = os.path.join(pdir, "data.parquet")
        tmp = final + f".tmp.{os.getpid()}"
        body = g.drop(columns=["_part"])
        pq.write_table(
            pa.Table.from_pandas(body, preserve_index=False), tmp)
        os.replace(tmp, final)  # atomic publish
        return pd.DataFrame({"part": [part], "rows": [len(body)]})

    written = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(write_partition, batch_format="pandas")
        .to_pandas()
    )
    for _, r in written.iterrows():
        man["done"][str(r["part"])] = int(r["rows"])
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, _manifest_path(out_dir))
    return man
