"""Edit-distance similarity self-join over a short-string key column —
the typo-tolerant record-linkage primitive (matching names, titles,
product codes across noisy sources).

Plan: SYMMETRIC DELETION blocking (the SymSpell scheme; also Mor &
Fraenkel 1982). If ``ed(a, b) <= d`` then deleting at most ``d``
characters from each side reaches a COMMON string, so hashing every
<=d-deletion variant of every key and exchanging on the variant hash
co-locates every true pair — exact recall by construction, no
all-pairs pass anywhere:

1. variant generation is vectorized by DELETION POSITION, not by row:
   for each position p (and pair p<q at d=2) one pandas str-slice
   concatenation produces that variant for the whole batch — the loop
   is O(max_len^d) vectorized ops, designed for short keys (names,
   codes, titles; the docstring bound, not a hidden assumption);
2. one exchange on ``h(variant)`` buckets candidates; within a bucket
   every (id_a < id_b) pair sharing a variant is a candidate — the
   candidate set is output-plus-collision-sized, NOT quadratic;
3. candidates verify with an exact banded Levenshtein DP (O(d * len)
   per pair after the length filter) inside the bucket task;
4. a pair can share variants in several buckets, so matched pairs
   dedup through one final pair-key groupby — bounded by the match
   volume.

Partitioning assumption (custom-operator contract): one variant
bucket's rows fit in a group task; a key shared VERBATIM by many rows
makes its variant buckets quadratic in that multiplicity (the hot-key
case) — deduplicate exact keys first (``exact_dedup``) when input
keys repeat.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raykg.util import hash_strings

EDIT_BUCKETS = 256


def _variants(s: pd.Series, max_dist: int) -> list[pd.Series]:
    """All <=max_dist-deletion variants, one vectorized slice-concat
    per deletion-position tuple across the whole batch."""
    out = [s]
    max_len = int(s.str.len().max() or 0)
    for p in range(max_len):
        out.append(s.str[:p] + s.str[p + 1:])
    if max_dist >= 2:
        for p in range(max_len):
            for q in range(p + 1, max_len):
                out.append(s.str[:p] + s.str[p + 1:q] + s.str[q + 1:])
    return out


def _lev_leq(a: str, b: str, d: int) -> bool:
    """Exact Levenshtein(a, b) <= d via a banded DP row sweep."""
    if abs(len(a) - len(b)) > d:
        return False
    if a == b:
        return True
    la, lb = len(a), len(b)
    prev = np.arange(lb + 1, dtype=np.int32)
    cur = np.empty(lb + 1, dtype=np.int32)
    bcodes = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        sub = prev[:-1] + (bcodes != ord(ca))
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        # insertion sweep: cur[j] = min(cur[j], cur[j-1] + 1)
        for j in range(1, lb + 1):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        if cur.min() > d:
            return False
        prev, cur = cur, prev
    return bool(prev[lb] <= d)


def edit_distance_pairs(
    ds,
    col: str,
    id_col: str,
    max_dist: int = 1,
    coarse: int = EDIT_BUCKETS,
):
    """All (id_a < id_b) pairs whose ``col`` strings are within
    Levenshtein distance ``max_dist`` (1 or 2). Returns a Dataset of
    ``(id_a, id_b, dist_leq)`` rows — exact (the deletion-neighborhood
    block has perfect recall; the DP verify has perfect precision)."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")

    def expand(t: pa.Table) -> pa.Table:
        s = t.column(col).to_pandas().astype(str)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        n = len(s)
        var_parts, id_parts, s_parts = [], [], []
        for v in _variants(s, max_dist):
            var_parts.append(v.to_numpy(dtype=object))
            id_parts.append(ids)
            s_parts.append(s.to_numpy(dtype=object))
        flat_v = np.concatenate(var_parts) if n else np.empty(0, object)
        flat_i = np.concatenate(id_parts) if n else np.empty(0, np.int64)
        flat_s = np.concatenate(s_parts) if n else np.empty(0, object)
        # dedup (id, variant) locally: a deletion at two positions of
        # a run of equal chars yields the same variant
        key = pd.MultiIndex.from_arrays([flat_i, flat_v])
        keep = ~key.duplicated()
        h = hash_strings(list(flat_v[keep]))
        return pa.table({
            "_vb": pa.array((h % np.uint64(coarse)).astype(np.int32)),
            "_vh": pa.array(h),
            "_id": pa.array(flat_i[keep]),
            "_s": pa.array(flat_s[keep], pa.string()),
        })

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_vh", "_id"], kind="mergesort")
        vh = g["_vh"].to_numpy()
        ids = g["_id"].to_numpy()
        ss = g["_s"].to_numpy(dtype=object)
        starts = np.flatnonzero(
            np.concatenate([[True], vh[1:] != vh[:-1]]))
        ends = np.concatenate([starts[1:], [len(vh)]])
        out_a, out_b = [], []
        seen = set()
        for s0, e0 in zip(starts, ends):
            if e0 - s0 < 2:
                continue
            for i in range(s0, e0):
                for j in range(i + 1, e0):
                    if ids[i] == ids[j]:
                        continue
                    a, b = (ids[i], ids[j]) if ids[i] < ids[j] \
                        else (ids[j], ids[i])
                    if (a, b) in seen:
                        continue
                    seen.add((a, b))
                    if _lev_leq(ss[i], ss[j], max_dist):
                        out_a.append(a)
                        out_b.append(b)
        return pd.DataFrame({"id_a": np.array(out_a, dtype=np.int64),
                             "id_b": np.array(out_b, dtype=np.int64)})

    def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]]

    pairs = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("_vb")
        .map_groups(bucket_verify, batch_format="pandas")
    )

    def pb(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        from raykg.ops.sample import _murmur64

        h = _murmur64(a.astype(np.uint64) * np.uint64(1000003)
                      ^ b.astype(np.uint64))
        return t.append_column(
            "_pb", pa.array((h % np.uint64(coarse)).astype(np.int32)))

    return (pairs.map_batches(pb, batch_format="pyarrow")
            .groupby("_pb")
            .map_groups(pair_dedup, batch_format="pandas"))
