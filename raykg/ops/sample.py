"""Deterministic mixture sampling: per-group keep rates over a corpus
(domain up-/down-sampling — the "20% web, 2× books" curation step of a
pretraining mix), implemented as a pure hash filter.

Why hash, not RNG: a multiplicative hash of the row id decides each
row independently of partitioning, execution order, retries, and
resume — the sampled set is a stable property of the DATA, so a killed
run re-derives the identical mix, and a DuckDB oracle can check it
row-for-row (query ``sample_documents_mixture``). ``random_sample``
would give none of that.

Knuth multiplicative hash: ``(id * 2654435761) mod 2^32`` compared to
``rate * 2^32``. Exactly expressible in int64 SQL. For oracle parity
use rates that are exact binary fractions (1.0, 0.5, 0.25, ...) so the
threshold computes identically in numpy and SQL.

Scale shape: stateless vectorized ``map_batches`` filter fused with
the read; the rate table rides in the closure (it is a few dozen
domains, not data).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(1 << 32)


def mixture_sample(ds, key_col: str, id_col: str, rates: dict[str, float],
                   default_rate: float = 0.0):
    """Keep each row iff hash32(id) < rate[key] * 2^32."""
    thresholds = {k: np.uint64(int(r * (1 << 32))) for k, r in rates.items()}
    default_thr = np.uint64(int(default_rate * (1 << 32)))

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * _KNUTH) % _M32
        keys = t.column(key_col).to_pandas()
        thr = keys.map(thresholds).fillna(default_thr).to_numpy(dtype=np.uint64)
        return t.filter(pa.array(h < thr))

    return ds.map_batches(fn, batch_format="pyarrow")


def _murmur64(v: np.ndarray) -> np.ndarray:
    v = v.copy()
    v ^= v >> np.uint64(33)
    with np.errstate(over="ignore"):
        v *= np.uint64(0xFF51AFD7ED558CCD)
        v ^= v >> np.uint64(33)
        v *= np.uint64(0xC4CEB9FE1A85EC53)
    v ^= v >> np.uint64(33)
    return v


def deterministic_shuffle(ds, id_col: str, seed: int = 0,
                          mixer: str = "murmur64"):
    """Global pseudo-random reorder by a keyed hash of the row id —
    the pre-training-batch shuffle, done so the order is a pure
    function of (data, seed): reproducible across runs, stable under
    input partitioning, and resumable (a re-run emits the identical
    sequence, so epoch batching can skip already-consumed prefixes).
    ``random_shuffle`` gives none of that.

    Physically one range-partitioned distributed sort on the 8-byte
    key — the scale-appropriate all-to-all (no driver involvement,
    spills per block). ``mixer='knuth32'`` uses the SQL-expressible
    ``(id*2654435761) mod 2^32`` key (ties broken by id) so a DuckDB
    oracle can pin the order; murmur64 is the better-avalanche
    default."""
    if mixer == "knuth32":
        def key(ids):
            return ((ids + np.uint64(seed)) * _KNUTH) % _M32
    elif mixer == "murmur64":
        def key(ids):
            with np.errstate(over="ignore"):
                return _murmur64(ids + np.uint64(seed) *
                                 np.uint64(0x9E3779B97F4A7C15))
    else:
        raise ValueError(f"unknown mixer {mixer!r}")

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        k = key(ids).astype(np.int64) & ((1 << 62) - 1)
        return t.append_column("_shuffle_key", pa.array(k))

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .sort(["_shuffle_key", id_col])
        .map_batches(lambda t: t.drop_columns(["_shuffle_key"]),
                     batch_format="pyarrow")
    )


def sample_k_per_key(ds, key_col: str, id_col: str, k: int, seed: int = 0):
    """Exactly-k uniform sample per key (fewer when the group is
    smaller) — "cap every domain at N documents" — via smallest-hash
    order: keep each key's k rows with the smallest keyed hash of the
    id. A uniform random order materialized as a hash makes the sample
    deterministic (same rows every run, any partitioning, resumable)
    and exactly SQL-checkable, unlike reservoir sampling; selection
    reuses the skew-safe per-key top-k machinery (per-block combiner
    caps each key at k rows per block before the shuffle).

    The knuth32 key matches the DuckDB expression
    ``((id + seed) * 2654435761) % 4294967296`` (ties broken by id),
    oracle `sample_k_per_source`."""
    from raykg.ops.rank import top_k_per_key

    def add_hash(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids + np.uint64(seed)) * _KNUTH) % _M32
        return t.append_column("_rh", pa.array(h.astype(np.int64)))

    out = top_k_per_key(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        key_col=key_col, val_col="_rh", id_col=id_col, k=k,
        val_ascending=True,
    )
    return out.map_batches(lambda t: t.drop_columns(["_rh"]),
                           batch_format="pyarrow")


def weighted_sample_k(ds, id_col: str, weight_col: str, k: int,
                      seed: int = 0):
    """Exactly-k WEIGHTED sample without replacement (fewer when the
    table is smaller): row i is selected with probability
    proportional to ``weight_col`` via the Efraimidis–Spirakis
    priority ``u_i^(1/w_i)`` — computed as the rank-equivalent
    ``ln(u_i)/w_i`` (descending) with ``u_i = (knuth32(id)+1)/2^32``.

    The hash-derived u makes the sample deterministic across runs,
    partitionings and resume (the same property as
    ``sample_k_per_key``) and exactly SQL-checkable: the oracle
    computes the identical integer-then-double expression and takes
    the same top-k (ties by id).  Rows with weight <= 0 are excluded.
    Selection is per-block local top-k then one single-group merge —
    blocks × k rows cross the exchange, never the table.
    """
    from raykg.ops.rank import top_k_per_key

    def add_priority(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        h = ((ids.astype(np.uint64) + np.uint64(seed)) * _KNUTH) % _M32
        u = (h.astype(np.float64) + 1.0) / float(1 << 32)
        with np.errstate(divide="ignore", invalid="ignore"):
            pri = np.log(u) / w
        t = t.filter(pa.array(w > 0))
        pri = pri[w > 0]
        return (t.append_column("_pri", pa.array(pri, pa.float64()))
                .append_column("_g", pa.array(
                    np.zeros(len(pri), dtype=np.int32))))

    out = top_k_per_key(
        ds.map_batches(add_priority, batch_format="pyarrow"),
        key_col="_g", val_col="_pri", id_col=id_col, k=k,
        val_ascending=False,
    )
    return out.map_batches(lambda t: t.drop_columns(["_pri", "_g"]),
                           batch_format="pyarrow")


def split_assign(ds, id_col: str, fracs: dict[str, float],
                 by_col: str | None = None, seed: int = 0,
                 out_col: str = "split"):
    """Deterministic train/val/test split assignment: each row gets a
    split label by comparing the Knuth hash of its id (or of
    ``by_col``, the GROUP-AWARE mode: every row of one conversation /
    source / author lands in the SAME split, the standard guard
    against train→eval leakage through near-identical sibling rows)
    against cumulative fraction thresholds.

    Hash-based assignment is stable under partitioning, retries and
    resume, and exactly SQL-checkable when the fractions are binary
    (the ``mixture_sample`` lesson: thresholds ``frac * 2^32`` compute
    identically in numpy and SQL for dyadic fractions).  Stateless
    streaming map, no shuffle.
    """
    labels = list(fracs.keys())
    cum, acc = [], 0.0
    for name in labels:
        acc += fracs[name]
        cum.append(np.uint64(int(acc * (1 << 32))))
    if not (0.999999 <= acc <= 1.000001):
        raise ValueError(f"fractions sum to {acc}, expected 1")
    cum[-1] = np.uint64(1 << 32)  # close the top bucket exactly

    from raykg.util import hash_strings

    def fn(t: pa.Table) -> pa.Table:
        src = t.column(by_col or id_col)
        if pa.types.is_string(src.type) or pa.types.is_large_string(src.type):
            h = (hash_strings(src.to_pylist()) + np.uint64(seed)) % _M32
        else:
            ids = src.to_numpy(zero_copy_only=False).astype(np.uint64)
            h = ((ids + np.uint64(seed)) * _KNUTH) % _M32
        out = np.empty(len(h), dtype=object)
        lo = np.uint64(0)
        for name, hi in zip(labels, cum):
            out[(h >= lo) & (h < hi)] = name
            lo = hi
        return t.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def rebalance(ds, key_col: str, id_col: str, seed: int = 0,
              max_keys: int = 100_000):
    """Rebalance a skewed key distribution to EQUAL expected counts:
    every key is downsampled at rate ``min_count / count_key`` via the
    same deterministic hash filter as ``mixture_sample`` (stable under
    partitioning/retries/resume) — the "don't let one domain dominate
    the mix" curation step with the rates derived from the data
    instead of hand-picked.

    Pass 1 pre-counts per block (the vocab.py pattern: the shuffle
    moves distinct-keys-per-block rows, never raw rows), folds with a
    small groupby, and GUARDS the driver-side rate table at
    ``max_keys`` distinct keys — the operator's semantics need the
    whole per-key count table on every task, so a user_id-cardinality
    key at 100 TB is a design error, not something to absorb
    silently: it raises with guidance instead of materializing O(rows)
    on the driver. The rate table broadcasts via the closure (bounded
    by ``max_keys``); pass 2 is the stateless hash filter. Rows whose
    key was unseen in pass 1 (impossible for the same input) would be
    dropped.
    """

    def pre(t: pa.Table) -> pa.Table:
        vc = t.column(key_col).combine_chunks().value_counts()
        return pa.table({key_col: vc.field("values"),
                         "_c": vc.field("counts").cast(pa.int64())})

    cds = (ds.map_batches(pre, batch_format="pyarrow")
           .groupby(key_col).sum("_c").materialize())
    n_keys = cds.count()
    if n_keys == 0:
        return ds
    if n_keys > max_keys:
        raise ValueError(
            f"rebalance: {key_col!r} has {n_keys} distinct keys "
            f"(max_keys={max_keys}). The per-key rate table must be "
            "broadcast to every task, so a near-unique key would "
            "materialize O(rows) centrally. Rebalance over a coarser "
            "key (domain, source, language), or raise max_keys if "
            "the table genuinely fits.")
    counts: dict = {}
    for row in cds.take_all():
        counts[row[key_col]] = row["sum(_c)"]
    min_n = min(counts.values())
    thr = {k: np.float64(min_n) / np.float64(n) * np.float64(1 << 32)
           for k, n in counts.items()}

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.uint64)
        h = ((ids + np.uint64(seed)) * _KNUTH) % _M32
        keys = t.column(key_col).to_pandas()
        lim = keys.map(thr).to_numpy(dtype=np.float64)
        return t.filter(pa.array(h.astype(np.float64) < lim))

    return ds.map_batches(fn, batch_format="pyarrow")


def hash_spread_sample_rows(ds, id_col: str, max_sample: int):
    """Hash-spread sample with a GLOBAL cap (the pq.py pattern): a
    per-block quota alone would grow with block count and a head
    sample sees one arm of a clustered corpus. Rate-filters by the
    Knuth hash of the id at 4x the cap, then limits. count() is
    metadata for parquet inputs. Returns a list of row dicts."""
    import pyarrow as pa

    n_total = ds.count()
    rate = min(1.0, (4.0 * max_sample) / max(n_total, 1))
    thr = np.uint64(int(rate * (1 << 32)))

    def spread(t: pa.Table) -> pa.Table:
        col = t.column(id_col)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            from raykg.util import hash_strings

            ids = np.asarray(hash_strings(col.to_pylist())).astype(np.uint64)
        else:
            ids = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.filter(pa.array((ids * _KNUTH) % _M32 < thr))

    return (ds.map_batches(spread, batch_format="pyarrow")
            .limit(max_sample).take_all())


def negative_sample_k(ds, anchor_col: str, positive_col: str,
                      n_universe: int, k: int, base: int = 0,
                      seed: int = 0, out_col: str = "neg_id"):
    """Deterministic k-negative sampling for contrastive / ranking
    training pairs: for every (anchor, positive) row emit ``k`` rows
    with a pseudo-random negative id drawn from the contiguous
    universe ``[base, base + n_universe)``, excluding the row's own
    positive (collision bumps to the next id, mod universe).

    Stateless and hash-derived (Knuth multiplicative over
    ``anchor * K + (j+1) * 40503 + seed``), so the draw is stable
    under partitioning, retries, and resume, and exactly
    SQL-expressible — the ``mixture_sample`` convention. No shuffle:
    one vectorized ``map_batches`` explode (k rows out per row in).
    Anchors must fit 31 bits for the int64 product to stay exact on
    the SQL side (they do for every test table; widen to the
    ``_murmur64`` mixer when ids exceed that — loses the SQL mirror).

    Universe-membership note: a NON-contiguous id universe needs the
    draw mapped through a dense index of valid ids (broadcast sorted
    id array + ``np.take``) — seam documented, not needed for the
    fixture tables.
    """
    if n_universe < 2:
        raise ValueError("universe must hold at least 2 ids")

    def fn(t: pa.Table) -> pa.Table:
        a = t.column(anchor_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        p = t.column(positive_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(a)
        aa = np.repeat(a, k)
        pp = np.repeat(p, k)
        jj = np.tile(np.arange(1, k + 1, dtype=np.int64), n)
        h = (aa * np.int64(2654435761) + jj * np.int64(40503)
             + np.int64(seed)) % np.int64(1 << 32)
        neg = h % np.int64(n_universe) + np.int64(base)
        clash = neg == pp
        neg[clash] = (neg[clash] - base + 1) % n_universe + base
        return pa.table({
            anchor_col: pa.array(aa),
            positive_col: pa.array(pp),
            "j": pa.array(jj),
            out_col: pa.array(neg),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
