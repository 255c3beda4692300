"""Grouped ranking: per-key top-k selection.

Ray Data has global ``sort``/``limit`` but no per-group limit; at
training-data scale "keep the top-k documents per domain / per user /
per dedup cluster" is a routine curation step. Composition: a
per-block PARTIAL top-k (caps any key's contribution at k rows per
input block — this is the combiner that keeps the shuffle small and
makes the operator skew-safe) -> ONE coarse-bucket shuffle -> a
per-bucket vectorized final selection that answers many keys per group
task (never one ``map_groups`` call per key; see the
``exact_dedup``/``agg_label_centroids`` pattern).

Ordering rule: (value desc, id asc) — the id tiebreak makes output
deterministic for equal values, and is what the paired DuckDB oracle
(``row_number() OVER (... ORDER BY val DESC, id)``) computes.

Partitioning assumption (custom-operator contract): one coarse
bucket's surviving rows (≤ k × keys_in_bucket + k × n_blocks for the
partial) fit in one group task; raise ``coarse`` to shrink buckets.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from raykg.ops.joins import _key_bucket

RANK_BUCKETS = 256


def top_k_per_key(
    ds,
    key_col: str,
    val_col: str,
    id_col: str,
    k: int = 10,
    coarse: int = RANK_BUCKETS,
    val_ascending: bool = False,
    keep_ties: bool = False,
):
    """Top-k rows per distinct ``key_col`` by (``val_col`` desc,
    ``id_col`` asc). Returns the selected rows with the original
    columns (key, id, val). ``val_ascending=True`` flips to
    smallest-k (the deterministic-sampling building block).

    ``keep_ties=True`` switches from row_number to COMPETITION-RANK
    semantics (SQL ``RANK() OVER (...) <= k`` / ``FETCH FIRST k ROWS
    WITH TIES``): every row whose value ties the k-th kept value
    survives, so output per key may exceed k. The per-block combiner
    stays sound: a row with < k strictly-better values globally has
    < k strictly-better values in its own block too, so the local
    rank filter only ever keeps a superset."""
    order_cols = [key_col, val_col, id_col]
    ascending = [True, val_ascending, True]

    def select_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, ascending=ascending,
                            kind="mergesort")
        if not keep_ties:
            return df.groupby(key_col, sort=False).head(k)
        # competition rank over the VALUE only: 1 + count of strictly
        # better rows in the key — vectorized as the first position of
        # each distinct value run within the key
        grp = df.groupby(key_col, sort=False)
        pos = grp.cumcount()
        new_val = (df[val_col] != df[val_col].shift()) | (
            df[key_col] != df[key_col].shift())
        run_start = pos.where(new_val).ffill().astype("int64")
        return df[run_start < k]

    def local_topk(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, id_col, val_col])
        bucket = _key_bucket(t.column(key_col), coarse)
        df = t.append_column("_bucket", bucket).to_pandas()
        return pa.Table.from_pandas(
            select_k(df), preserve_index=False
        ).replace_schema_metadata(None)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return select_k(g).drop(columns=["_bucket"])

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(final_topk, batch_format="pandas")
    )
