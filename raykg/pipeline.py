"""The incremental KG-construction pipeline (epoch driver).

One Ray Data streaming DAG per epoch (the reference's per-batch loop,
``scripts/eval_kbp.py:780-785``), with the incremental barrier the
semantics require (SURVEY.md §7.7.2): entities minted from NIL clusters
in epoch k are retrievable from epoch k+1 on, never within k
(``scripts/eval_kbp.py:626-652``).

Per epoch:

    read_parquet(transcripts/epoch=K)           # column-pruned read
      -> map_batches(detect_mentions)           # stateless, Arrow
      -> map_batches(MentionEncoder, pool)      # stateful actor pool
      -> map_batches(Retriever, pool)           # KB broadcast by ray.put
      -> map_batches(NilStage)                  # stateless, vectorized
      -> write_parquet(mentions/epoch=K)        # checkpointed artifact
    read back (pruned) -> filter is_nil
      -> groupby(block).map_groups(clusterer)   # per-group, sorted by
                                                #   mention_id inside
      -> canonical ids + clusters/epoch=K + KB delta
    read back mentions -> triples -> dedup -> triples/epoch=K

The mentions table is written once and *read back* for the clustering
and triple stages instead of re-executing or materializing the upstream
DAG — this is also what makes a killed run resumable: the manifest marks
completed epochs, whose outputs (including the KB delta needed to
rebuild retrieval state) are simply reloaded.

Blocking choices for the NIL clustering shuffle (SURVEY.md §4.3):
``global`` reproduces the reference exactly (all NIL mentions of the
epoch clustered jointly — one group); ``surface`` hashes the lowercased
surface into SURFACE_BUCKETS coarse buckets (the scale path: greedy
clustering at θ≈81 only ever merges near-identical surfaces, and
identical surfaces always share a bucket, so bucketing is a
near-lossless decomposition of the O(n²) epoch-global problem into
bounded per-bucket ones).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from raykg.canon import RwState
from raykg.cluster import run_clusterer
from raykg.detect import detect_mentions
from raykg.encode import column_to_vectors
from raykg.index import kb_index_from_table
from raykg.nil import DEFAULT_NIL_MODEL, LogisticModel
from raykg.schema import DIM, TOP_K
from raykg.triples import cluster_triples, dedup_triples, mention_triples


@dataclass
class PipelineConfig:
    dim: int = DIM
    top_k: int = TOP_K
    clusterer: str = "greedy"  # greedy | feature | threestep
    # encoder spec (raykg.encode.ENCODERS): "hash" = the deterministic
    # trigram-projection stand-in; "tiny" = TinyTransformerEncoder, a
    # seeded numpy transformer with the real towers' batched-GEMM
    # inference shape. The KB parquet's embedding column must come from
    # the SAME encoder (fixtures.generate_world(encoder_spec=...)).
    encoder: str = "hash"
    # surface is the default: bounded per-bucket clustering groups (no
    # O(n²) epoch-global task), parity-gated ≥0.95 vs the global-mode
    # oracle (tests/test_parity.py). "global" reproduces the reference's
    # exact all-NIL-jointly semantics for conformance runs.
    blocking: str = "surface"  # global | surface
    nil_model: LogisticModel = field(default_factory=lambda: DEFAULT_NIL_MODEL)
    detect_batch: int = 1024
    encode_batch: int = 1024
    retrieve_batch: int = 1024
    nil_batch: int = 2048
    pool_size: int | None = None  # actor pool max; None -> cpus
    write_candidates: bool = False  # full candidate structs in mentions output
    stage_mode: str = "tasks"  # tasks (worker-local cache) | actors (pool)
    # >1 splits the KB across per-shard retrieval actor pools (each
    # actor holds one shard; exact running-top-k merge between stages) —
    # the multi-node answer to a KB that exceeds one worker's memory
    # (SURVEY.md §7.7.5). With ann="exact" the output is bit-identical
    # to kb_shards=1; with ann="ivf" each shard probes its OWN k-means
    # lists, so per-shard partitions differ from whole-KB partitions and
    # parity is gated at ≥0.95 (tests/test_sharded.py) rather than
    # bit-exact.
    kb_shards: int = 1
    # "exact" reproduces the reference-equivalent oracle bit-for-bit;
    # "ivf" probes ivf_nprobe of ivf_lists coarse partitions per query —
    # the counterpart of the reference's approximate HNSW KB index
    # (faiss_indexer.py:76-141), scores stay exact inner products.
    # IVF metadata is built once on the driver and broadcast. Composes
    # with kb_shards>1: make_kb_shards builds per-shard IVF metadata
    # and every ShardRetriever probes ivf_nprobe of its shard's lists.
    # "pq" product-quantizes the KB (index.PqIndex): ADC shortlist over
    # pq_m-byte codes, exact re-rank of rerank×top_k rows — the
    # memory-bound path where even IVF's raw-vector lists don't fit a
    # node. Shortlist scores are exact, so parity is gated like IVF
    # (≥0.95, tests/test_parity.py). Composes with kb_shards>1: each
    # shard trains codebooks on its own rows; the running-top-k merge
    # is unchanged because shortlist scores are exact.
    # "hnsw" is the graph-index family member (index.HnswIndex, the
    # reference's production IndexHNSWFlat counterpart): NSW neighbor
    # graph + best-first beam, exact scores on the visited set, recall
    # gated like IVF/PQ. Composes with kb_shards>1: each shard builds
    # its own NSW graph; the running-top-k merge is unchanged because
    # beam scores are exact inner products.
    ann: str = "exact"  # exact | ivf | pq | hnsw
    # encoder token budget (HashEncoder.max_seq_length): windowing /
    # truncation arithmetic threshold; None disables windowing
    max_seq_length: int | None = 128
    ivf_lists: int = 128
    ivf_nprobe: int = 16
    pq_m: int = 8
    pq_rerank: int = 8
    hnsw_m: int = 24
    hnsw_ef_construction: int = 128
    hnsw_ef_search: int = 192
    # multi-assignment: each KB row joins its ivf_spill nearest lists.
    # THE recall lever on hash-encoder (flat-similarity) KBs: an exact
    # re-rank pass would be a no-op here because IVF first-pass scores
    # are already exact inner products over the probed subset — what
    # misses are ROWS whose list was not probed, and spill puts
    # near-tie rows in several lists. Measured on the bench KB with
    # real mention-encoding queries (tests/test_index.py): recall@10
    # 0.936 (spill=1) -> ~0.99 (spill=3) at nprobe=16/128, probing
    # ~0.38x of rows. Memory cost: perm array is spill x n int64.
    ivf_spill: int = 3
    # opt-in IVF list balancing (IvfIndex.build_meta balance=): split
    # lists fatter than this x the mean fill into sub-centroids. For
    # CLUSTERED KBs only — on flat-similarity (hash-encoder) KBs the
    # skewed spill fills are themselves the recall mechanism and
    # balancing trades recall for speed (measured; see index.py).
    ivf_balance: float | None = None
    # feature clusterer: fit the TF-IDF vectorizers ONCE on a
    # deterministic dev sample (first epoch's detected mentions) and
    # broadcast — the reference's pickled-vectorizer flow
    # (featureclustering/__main__.py:42-52,137-139). False = fit per
    # clustered group (the round-1 fallback, kept for comparison).
    tfidf_prefit: bool = True
    # mentions are produced in n_fragments sub-jobs per epoch (input
    # files grouped deterministically), each with its own lineage entry
    # — a killed epoch resumes by re-running only unfinished fragments.
    # Each fragment pays one streaming-execution ramp+tail (~2-3 s on
    # this host), so set it where fragment compute >> that (e.g. 16-64
    # for hour-long 100 TB epochs); 1 = a single DAG per epoch, right
    # for short epochs.
    n_fragments: int = 1

    def digest(self) -> str:
        payload = {
            k: v
            for k, v in self.__dict__.items()
            if k != "nil_model"
        }
        payload["nil_model"] = [
            list(self.nil_model.features),
            list(self.nil_model.coef),
            self.nil_model.intercept,
        ]
        return hashlib.sha256(
            json.dumps(payload, sort_keys=True).encode()
        ).hexdigest()[:16]


def _pool(cfg: PipelineConfig) -> tuple[int, int]:
    """LinkStage is the pipeline's dominant compute — size its pool to
    the whole node; the light detect/write task stages interleave fine."""
    if cfg.pool_size is not None:
        return (1, cfg.pool_size)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return (1, max(2, cpus))


def load_kb_ref(kb_path: str):
    """KB parquet -> broadcast tuple (one ray.put for the whole run)."""
    tbl = pq.read_table(kb_path)
    idx = kb_index_from_table(tbl)
    return ray.put(
        (idx.vectors, idx.wikipedia_ids, list(idx.titles), list(idx.types),
         idx.tombstone)
    )


def load_kb_handles(kb_path: str, cfg: "PipelineConfig") -> dict:
    """Broadcast handles for retrieval: whole-KB ref, plus shard refs +
    title array when kb_shards > 1."""
    tbl = pq.read_table(kb_path)
    idx = kb_index_from_table(tbl)
    kb_tuple = (idx.vectors, idx.wikipedia_ids, list(idx.titles),
                list(idx.types), idx.tombstone)
    handles = {"kb_ref": ray.put(kb_tuple)}
    if cfg.ann == "ivf":
        from raykg.index import IvfIndex

        # build once on the driver, broadcast; workers just wire arrays
        handles["ann_ref"] = ray.put(
            IvfIndex.build_meta(
                idx.vectors, n_lists=cfg.ivf_lists, spill=cfg.ivf_spill,
                balance=cfg.ivf_balance,
            )
        )
    elif cfg.ann == "pq":
        from raykg.index import PqIndex

        handles["ann_ref"] = ray.put(
            PqIndex.build_meta(
                idx.vectors, m=cfg.pq_m, rerank=cfg.pq_rerank
            )
        )
    elif cfg.ann == "hnsw":
        from raykg.index import HnswIndex

        meta = HnswIndex.build_meta(
            idx.vectors, m=cfg.hnsw_m,
            ef_construction=cfg.hnsw_ef_construction,
        )
        meta["ef_search"] = cfg.hnsw_ef_search
        handles["ann_ref"] = ray.put(meta)
    if cfg.kb_shards > 1:
        from raykg.sharded import make_kb_shards

        handles["shard_refs"] = make_kb_shards(
            kb_tuple, cfg.kb_shards,
            ivf_lists=cfg.ivf_lists if cfg.ann == "ivf" else None,
            ivf_spill=cfg.ivf_spill,
            ivf_balance=cfg.ivf_balance,
            pq_m=cfg.pq_m if cfg.ann == "pq" else None,
            pq_rerank=cfg.pq_rerank,
            hnsw_m=cfg.hnsw_m if cfg.ann == "hnsw" else None,
            hnsw_ef_construction=cfg.hnsw_ef_construction,
            hnsw_ef_search=cfg.hnsw_ef_search,
        )
        handles["titles_ref"] = ray.put(list(idx.titles))
    return handles


# bucket count for surface blocking: sized so per-bucket O(n²) greedy
# work stays tiny while group-task overhead stays bounded
SURFACE_BUCKETS = 256

# skew control for surface blocking: a bucket holding more rows than
# MAX_CLUSTER_GROUP (a Zipf-head surface) is SALTED into ceil(n/max)
# sub-groups by mention_id, clustered independently, and re-merged by a
# deterministic center-dot union-find in the assembly step — bounding
# every clustering task at O(MAX_CLUSTER_GROUP²) no matter how hot one
# surface gets. Cold buckets are untouched (bit-identical output).
MAX_CLUSTER_GROUP = 4096
MAX_SALTS = 64

# sharded-RW triples phase: below this many NIL mentions per epoch the
# minted-uri map is broadcast (built by a worker task, ~50 B/entry ->
# <=64 MB object); above it, uri resolution goes through the
# hash-join shuffle. The shuffle's fixed cost (~10 s at 256 buckets)
# dwarfs a small map's broadcast; a huge epoch's map would not fit one
# object. Same adaptive shape as minhash verification.
NIL_MAP_BROADCAST_ROWS = 1 << 20

# default-mode (kb_shards=1) cluster assembly: below this many NIL
# mentions per epoch, cluster parts are collected on the driver (the
# reference's own driver-held state, O(NIL mentions) rows with
# per-member lists + centers); above it the epoch auto-switches to the
# DISTRIBUTED assembly written for the sharded-RW path — salted
# re-merge in per-bucket map_groups, driver pulls only the 8-byte
# min_mention_id column, workers assign canonical ids and write the
# partition. Same adaptive broadcast-vs-shuffle shape as
# NIL_MAP_BROADCAST_ROWS; surface blocking only (global blocking is
# the single-group conformance mode — nothing to distribute).
DRIVER_ASSEMBLY_NIL_ROWS = 1 << 20


@ray.remote
def _cluster_triples_task(clusters_path: str, epoch: int) -> pa.Table:
    """Worker-side cluster-triples emission from the epoch's clusters
    partition (distributed-assembly mode): replaces a per-epoch Ray
    Data read_parquet plan whose fixed planning cost dwarfed the few
    hundred rows involved."""
    from raykg.triples import cluster_triples

    tbl = pq.read_table(clusters_path,
                        columns=["cluster_id", "title", "mention_ids"])
    return cluster_triples(tbl, epoch)


@ray.remote
def _build_nil_uri_map(clusters_path: str) -> dict[int, str]:
    """mention_id -> minted cluster uri, built worker-side from the
    epoch's clusters partition so cluster payloads never land on the
    driver (the driver holds only this task's object ref)."""
    tbl = pq.read_table(clusters_path, columns=["cluster_id", "mention_ids"])
    out: dict[int, str] = {}
    for row in tbl.to_pylist():
        uri = row["cluster_id"]
        for mid in row["mention_ids"]:
            out[mid] = uri
    return out


def _cluster_group(group: pa.Table, strategy: str, vec_ref=None,
                   salted: bool = False) -> pa.Table:
    """Per-block clustering. Sorts by mention_id first — greedy label
    propagation is order dependent (SURVEY.md §7.7.1) and Ray block
    order must not leak into results. ``vec_ref``: ray.put ref of
    pre-fit TF-IDF vectorizers (feature strategy). ``salted``: the
    block key carries a salt (key = block*MAX_SALTS + salt); the
    emitted ``block`` column is the ORIGINAL bucket so assembly can
    re-merge salted sub-clusters."""
    idx = pa.compute.sort_indices(group.column("mention_id"))
    group = group.take(idx)
    key = int(group.column("block")[0].as_py())
    orig_block = key // MAX_SALTS if salted else key
    ids = group.column("mention_id").to_pylist()
    mentions = group.column("mention").to_pylist()
    encodings = column_to_vectors(group.column("encoding"))
    clusters = run_clusterer(
        strategy,
        ids,
        mentions,
        encodings,
        group.column("context_left").to_pylist(),
        group.column("context_right").to_pylist(),
        vectorizers=ray.get(vec_ref) if vec_ref is not None else None,
    )
    rows = {
        "block": pa.array(
            np.full(len(clusters), orig_block, dtype=np.int64)
        ),
        "min_mention_id": pa.array(
            [min(c.mention_ids) for c in clusters], type=pa.int64()
        ),
        "title": pa.array([c.title() for c in clusters], type=pa.string()),
        "nelements": pa.array([c.nelements for c in clusters], type=pa.int64()),
        "mention_ids": pa.array(
            [c.mention_ids for c in clusters], type=pa.list_(pa.int64())
        ),
        "mentions": pa.array(
            [c.mentions for c in clusters], type=pa.list_(pa.string())
        ),
        "center": pa.array(
            [c.center().tolist() for c in clusters],
            type=pa.list_(pa.float32()),
        ),
    }
    return pa.table(rows)


def _empty_cluster_parts() -> pa.Table:
    """Typed zero-row cluster-parts table (the exchange's empty-bucket
    contract; schema must match _cluster_group's output)."""
    return pa.table({
        "block": pa.array([], pa.int64()),
        "min_mention_id": pa.array([], pa.int64()),
        "title": pa.array([], pa.string()),
        "nelements": pa.array([], pa.int64()),
        "mention_ids": pa.array([], pa.list_(pa.int64())),
        "mentions": pa.array([], pa.list_(pa.string())),
        "center": pa.array([], pa.list_(pa.float32())),
    })


def _add_block_key(batch: pa.Table, blocking: str) -> pa.Table:
    if blocking == "global":
        key = pa.array(np.zeros(batch.num_rows, dtype=np.int64))
    elif blocking == "surface":
        from raykg.util import hash_strings

        # coarse surface-hash buckets: identical lowercased surfaces
        # always co-locate (the property greedy clustering needs), while
        # the group count stays bounded — one map_groups task per bucket
        # instead of one per distinct surface
        key = pa.array(
            (hash_strings([m.lower() for m in batch.column("mention").to_pylist()])
             % np.uint64(SURFACE_BUCKETS)).astype(np.int64)
        )
    else:
        raise ValueError(f"unknown blocking: {blocking}")
    return batch.append_column("block", key)


def run_epoch(
    fixture_dir: str,
    out_dir: str,
    epoch: int,
    kb_handles,
    rw_state: RwState,
    cfg: PipelineConfig,
    tr_dirs: list[str] | None = None,
    defer_triples: bool = False,
) -> dict:
    """``tr_dirs``: explicit transcript directories (the no-incremental
    mode passes every epoch's dir at once); default = this epoch's.
    ``defer_triples``: return after the clustering barrier with a
    ``_finish`` callable in the stats that runs the triples phase —
    run_pipeline invokes it from a thread so epoch k's triples overlap
    epoch k+1's mention stage (legal: the incremental barrier needs
    only the clusters)."""
    t0 = time.time()
    pool = _pool(cfg)
    tr_dirs = tr_dirs or [
        os.path.join(fixture_dir, "transcripts", f"epoch={epoch}")
    ]
    tr_path = tr_dirs[0]

    # a prior run may have died mid-epoch (or the config digest changed,
    # resetting the manifest but not the outputs): clear this epoch's
    # post-barrier outputs; mentions fragments are cleaned per-fragment
    # below so finished fragments survive a mid-epoch kill
    shutil.rmtree(
        os.path.join(out_dir, "triples", f"epoch={epoch}"), ignore_errors=True
    )
    stale_clusters = os.path.join(out_dir, "clusters", f"epoch={epoch}.parquet")
    if os.path.isdir(stale_clusters):
        shutil.rmtree(stale_clusters, ignore_errors=True)
    elif os.path.exists(stale_clusters):
        os.remove(stale_clusters)

    if not isinstance(kb_handles, dict):  # bare ref (back-compat)
        kb_handles = {"kb_ref": kb_handles}
    kb_ref = kb_handles["kb_ref"]
    # sharded-RW mode (kb_shards>1): the minted-entity index lives in
    # per-shard object-store slices (raykg.sharded.RwShards) — never as
    # driver arrays, never as a whole-RW broadcast
    rw_shards = kb_handles.get("rw_shards")
    rw_ref = (
        ray.put((rw_state.vectors, list(rw_state.titles)))
        if rw_shards is None and rw_state.ntotal
        else None
    )

    from raykg.link import LinkStage, make_link_fn

    def build_link_ds(paths, n_blocks: int) -> rd.Dataset:
        """One fragment's link DAG: pruned read -> detect -> fused
        encode+retrieve+NIL (mode per cfg)."""
        ds = rd.read_parquet(
            paths, columns=["conv_id", "turn_idx", "text"],
            override_num_blocks=n_blocks,
        )
        ds = ds.map_batches(
            detect_mentions, batch_format="pyarrow", batch_size=cfg.detect_batch
        )
        if cfg.kb_shards > 1:
            from raykg.encode import MentionEncoder
            from raykg.nil import NilStage
            from raykg.sharded import ShardRetriever, make_shard_stage_fn

            cpus = int(ray.cluster_resources().get("CPU", 4))
            per_shard = max(1, cpus // cfg.kb_shards)
            use_rw_shards = rw_shards is not None and rw_shards.total > 0
            ds = ds.map_batches(
                MentionEncoder(dim=cfg.dim, spec=cfg.encoder,
                               max_seq_length=cfg.max_seq_length),
                batch_format="pyarrow",
                batch_size=cfg.encode_batch,
            )
            # shard s's stage holds KB shard s AND (fused) the matching
            # minted-entity RW slice — one chain, one batch hop per
            # shard; no worker holds more than one slice of each
            if cfg.stage_mode == "actors":
                # actor-pool mode: explicit per-slice pools — on a real
                # cluster each pool pins to the nodes holding its slice.
                # Fractional CPU reservation so every pool and the task
                # stages co-exist even on small nodes (min actors would
                # starve each other otherwise); pre-warm to half the
                # ceiling — reservations sum to ~cpus/2, the task stages
                # (read/detect/write) keep the other half.
                n_pools = cfg.kb_shards + 1
                min_actors = max(1, per_shard // 2)
                actor_cpus = max(
                    0.1, round(cpus / (2 * n_pools * min_actors), 2)
                )
                n_sh = len(kb_handles["shard_refs"])
                for s_i, shard_ref in enumerate(kb_handles["shard_refs"]):
                    # the LAST shard stage carries the finalizer inline
                    # (round 5): one fewer pool, no final acc repack
                    fin_kwargs = {}
                    if s_i == n_sh - 1:
                        fin_kwargs["finalizer_args"] = (
                            kb_handles["titles_ref"], rw_ref,
                            use_rw_shards,
                        )
                    ds = ds.map_batches(
                        ShardRetriever,
                        fn_constructor_kwargs={
                            "shard_ref": shard_ref,
                            "top_k": cfg.top_k,
                            "is_first": s_i == 0,
                            "nprobe": cfg.ivf_nprobe,
                            "rw_shard_ref": (
                                rw_shards.refs[s_i] if use_rw_shards else None
                            ),
                            **fin_kwargs,
                        },
                        batch_format="pyarrow",
                        batch_size=cfg.retrieve_batch,
                        concurrency=(min_actors, per_shard),
                        num_cpus=actor_cpus,
                    )
            else:
                # task mode (default): stateless tasks + worker-local
                # stage cache — no per-epoch pool ramp, full elasticity
                # (measured: pools cost ~5 s/epoch on ~10 s epochs)
                n_sh = len(kb_handles["shard_refs"])
                for s_i, shard_ref in enumerate(kb_handles["shard_refs"]):
                    ds = ds.map_batches(
                        make_shard_stage_fn(
                            shard_ref, cfg.top_k, s_i == 0, cfg.ivf_nprobe,
                            rw_shards.refs[s_i] if use_rw_shards else None,
                            slot=s_i,
                            # last stage carries the finalizer inline
                            finalizer_args=(
                                (kb_handles["titles_ref"], rw_ref,
                                 use_rw_shards)
                                if s_i == n_sh - 1 else None
                            ),
                        ),
                        batch_format="pyarrow",
                        batch_size=cfg.retrieve_batch,
                    )
            model = cfg.nil_model
            if rw_shards is not None:
                rw_offsets = rw_shards.uri_offsets()

                def nil_fn(batch):
                    return NilStage(model, rw_offsets=rw_offsets)(batch)
            else:
                uris_ref = (
                    ray.put(list(rw_state.uris)) if rw_state.ntotal else None
                )

                def nil_fn(batch):
                    stage = NilStage(
                        model,
                        rw_uris=ray.get(uris_ref) if uris_ref is not None else [],
                    )
                    return stage(batch)

            ds = ds.map_batches(nil_fn, batch_format="pyarrow",
                                batch_size=cfg.nil_batch)
        elif cfg.stage_mode == "actors":
            ds = ds.map_batches(
                LinkStage,
                fn_constructor_kwargs={
                    "kb_ref": kb_ref,
                    "rw_ref": rw_ref,
                    "rw_uris": list(rw_state.uris),
                    "model": cfg.nil_model,
                    "dim": cfg.dim,
                    "top_k": cfg.top_k,
                    "compact": not cfg.write_candidates,
                    "ann_ref": kb_handles.get("ann_ref"),
                    "nprobe": cfg.ivf_nprobe,
                    "encoder": cfg.encoder,
                },
                batch_format="pyarrow",
                batch_size=cfg.encode_batch,
                concurrency=pool,
            )
        else:
            # task mode: stateless tasks + worker-local stage cache — full
            # elasticity on CPU nodes (see raykg.link). Actor mode remains
            # for stages that must pin resources (e.g. num_gpus=1 encoders).
            uris_ref = ray.put(list(rw_state.uris)) if rw_state.ntotal else None
            ds = ds.map_batches(
                make_link_fn(
                    kb_ref,
                    rw_ref,
                    uris_ref,
                    cfg.nil_model,
                    cfg.dim,
                    cfg.top_k,
                    not cfg.write_candidates,
                    ann_ref=kb_handles.get("ann_ref"),
                    nprobe=cfg.ivf_nprobe,
                    encoder=cfg.encoder,
                    max_seq_length=cfg.max_seq_length,
                ),
                batch_format="pyarrow",
                batch_size=cfg.encode_batch,
            )
        return ds

    # ---- mentions, one sub-job per input-file fragment ----
    # Each fragment writes mentions/epoch=K/frag_J + a lineage record;
    # a re-run after a mid-epoch kill skips fragments whose lineage
    # matches (same config digest, same input files) and re-runs only
    # the rest. Worker-side stage state is keyed on the broadcast refs,
    # so consecutive fragments reuse the same cached KB index.
    mentions_dir = os.path.join(out_dir, "mentions", f"epoch={epoch}")
    os.makedirs(mentions_dir, exist_ok=True)
    lineage_dir = os.path.join(out_dir, "_lineage")
    os.makedirs(lineage_dir, exist_ok=True)
    files = sorted(
        os.path.join(d, f)
        for d in tr_dirs
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
    n_frags = max(1, min(cfg.n_fragments, len(files)))
    groups = [files[j::n_frags] for j in range(n_frags)]
    expected = {f"frag_{j}" for j in range(n_frags)}
    for entry in os.listdir(mentions_dir):
        if entry not in expected:
            path = os.path.join(mentions_dir, entry)
            # stale FILES (e.g. an older layout's parquet) must go too —
            # rmtree(ignore_errors) silently skips non-directories
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            else:
                os.remove(path)
    cfg_digest = cfg.digest()
    total_blocks = max(64, int(ray.cluster_resources().get("CPU", 4)) * 8)
    frag_blocks = max(16, total_blocks // n_frags)
    frags_skipped = 0
    for j, group in enumerate(groups):
        frag_dir = os.path.join(mentions_dir, f"frag_{j}")
        lin_path = os.path.join(lineage_dir, f"epoch={epoch}_frag={j}.json")
        want = {"config": cfg_digest, "files": group, "epoch": epoch}
        if os.path.exists(lin_path) and os.path.isdir(frag_dir):
            with open(lin_path) as f:
                prev = json.load(f)
            if {k: prev.get(k) for k in want} == want:
                frags_skipped += 1
                continue
        shutil.rmtree(frag_dir, ignore_errors=True)
        if os.path.exists(lin_path):
            os.remove(lin_path)
        tf0 = time.time()
        # row_group_size keeps the checkpoint splittable for the
        # clustering/triples read-backs even when few blocks reach the
        # write (few input files -> few blocks; see fixtures note)
        build_link_ds(group, frag_blocks).write_parquet(
            frag_dir, row_group_size=2048
        )
        with open(lin_path + ".tmp", "w") as f:
            json.dump({**want, "wall_s": round(time.time() - tf0, 3)}, f)
        os.replace(lin_path + ".tmp", lin_path)
    t_mentions = time.time()

    # ---- NIL clustering (read back the checkpointed mentions) ----
    # post-barrier phases move far less data than the link stage: cap
    # their block counts near the CPU count — a 256-partition shuffle
    # over a few hundred MB pays ~10-20 ms of scheduling per task across
    # 3 stages, which dominates the actual compute
    post_blocks = max(16, int(ray.cluster_resources().get("CPU", 4)) * 2)
    nil_ds = rd.read_parquet(
        mentions_dir,
        override_num_blocks=post_blocks,
        columns=[
            "mention_id",
            "mention",
            "context_left",
            "context_right",
            "encoding",
            "is_nil",
        ],
    )
    nil_ds = nil_ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("is_nil"), True)).drop_columns(
            ["is_nil"]
        ),
        batch_format="pyarrow",
    )
    nil_ds = nil_ds.map_batches(
        lambda t: _add_block_key(t, cfg.blocking), batch_format="pyarrow"
    )
    strategy = cfg.clusterer

    # skew control (surface mode only; global is the conformance mode):
    # measure the bucket histogram on the materialized NIL set, salt any
    # bucket above MAX_CLUSTER_GROUP by mention_id so no single
    # map_groups task exceeds the bound; assembly re-merges.
    salt_counts = None
    n_nil_epoch = None
    if cfg.blocking == "surface":
        nil_ds = nil_ds.materialize()

        def _bc(t: pa.Table) -> pa.Table:
            c = np.bincount(
                t.column("block").to_numpy(zero_copy_only=False),
                minlength=SURFACE_BUCKETS,
            )
            return pa.table(
                {"block": pa.array(np.arange(SURFACE_BUCKETS, dtype=np.int64)),
                 "n": pa.array(c.astype(np.int64))}
            )

        hist_df = nil_ds.map_batches(_bc, batch_format="pyarrow").to_pandas()
        if len(hist_df) == 0:  # zero NIL mentions this epoch
            hist_df = pd.DataFrame(
                {"block": range(SURFACE_BUCKETS), "n": 0}
            )
        hist = (
            hist_df.groupby("block")["n"].sum()
            .reindex(range(SURFACE_BUCKETS), fill_value=0)
        )
        n_nil_epoch = int(hist.sum())
        n_salts = np.minimum(
            MAX_SALTS,
            np.maximum(1, -(-hist.to_numpy() // MAX_CLUSTER_GROUP)),
        ).astype(np.int64)
        if (n_salts > 1).any():
            salt_counts = n_salts

            def _salt(t: pa.Table) -> pa.Table:
                b = t.column("block").to_numpy(zero_copy_only=False)
                mid = t.column("mention_id").to_numpy(zero_copy_only=False)
                key = b * MAX_SALTS + (mid % salt_counts[b])
                i = t.column_names.index("block")
                return t.set_column(i, "block", pa.array(key, type=pa.int64()))

            nil_ds = nil_ds.map_batches(_salt, batch_format="pyarrow")

    salted = salt_counts is not None
    # raw-task routing exchange over the (possibly salted) block keys;
    # _cluster_group clusters ONE block per call, so the merge fn
    # re-groups folded buckets and types empty ones
    from raykg.ops.exchange import hash_exchange

    _vr = kb_handles.get("vec_ref")

    def _cluster_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_cluster_parts()
        blocks = t.column("block").to_numpy(zero_copy_only=False)
        order = np.argsort(blocks, kind="stable")
        t = t.take(pa.array(order))
        bs = blocks[order]
        bounds = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        bounds = np.r_[bounds, len(bs)]
        outs = []
        for i in range(len(bounds) - 1):
            sub = t.slice(int(bounds[i]),
                          int(bounds[i + 1] - bounds[i]))
            outs.append(_cluster_group(sub, strategy, _vr,
                                       salted=salted))
        return pa.concat_tables(outs)

    cluster_parts = hash_exchange(
        nil_ds, "block",
        SURFACE_BUCKETS * (MAX_SALTS if salted else 1),
        _cluster_bucket, arrow=True)
    vec_ref = kb_handles.get("vec_ref")
    clusters_dir = os.path.join(out_dir, "clusters")
    os.makedirs(clusters_dir, exist_ok=True)
    clusters_path = os.path.join(clusters_dir, f"epoch={epoch}.parquet")
    # adaptive assembly strategy (DRIVER_ASSEMBLY_NIL_ROWS above): a
    # big surface-mode epoch runs the distributed assembly even with
    # kb_shards=1, so cluster parts never land wholesale on the driver
    distributed_assembly = rw_shards is not None or (
        n_nil_epoch is not None and n_nil_epoch > DRIVER_ASSEMBLY_NIL_ROWS
    )
    if not distributed_assembly:
        # clusters are the small side (one row per novel entity) —
        # collected for canonical id assignment + the KB delta. In this
        # (kb_shards=1) mode the RW index of minted entities lives on
        # the driver and is re-broadcast each epoch (the reference
        # holds the same state as a ~33 GB in-process FAISS index).
        parts = cluster_parts.to_pandas()
        clusters_table = _assemble_clusters_table(
            parts, epoch, cfg.dim, salt_counts=salt_counts, strategy=strategy,
            vectorizers=ray.get(vec_ref) if vec_ref is not None else None,
        )
        n_clusters = int(clusters_table.num_rows)
        pq.write_table(clusters_table, clusters_path)
        rw_state.add_clusters(clusters_table)
    else:
        # DISTRIBUTED assembly (the sharded-RW scale path): cluster rows
        # never land on the driver. Salted hot buckets re-merge inside a
        # per-bucket map_groups; the driver pulls ONLY the 8-byte
        # min_mention_id column to fix the global rank order (canonical
        # ids are rank-by-smallest-member, raykg.canon), broadcasts the
        # sorted id array back, and workers assign ids + write the
        # clusters partition directly. The RW delta then flows
        # parquet -> per-shard append tasks (raykg.sharded.RwShards).
        clusters_table = None
        if salt_counts is not None:
            sc = salt_counts

            def _remerge(g: pd.DataFrame) -> pd.DataFrame:
                return _merge_salted_clusters(
                    g, sc, strategy=strategy,
                    vectorizers=ray.get(vec_ref) if vec_ref is not None else None,
                )

            cluster_parts = cluster_parts.groupby("block").map_groups(
                _remerge, batch_format="pandas"
            )
        merged = cluster_parts.materialize()
        mins = (
            merged.select_columns(["min_mention_id", "nelements"]).to_pandas()
            if merged.count()
            else pd.DataFrame({"min_mention_id": [], "nelements": []})
        )
        n_clusters = len(mins)
        # epoch's NIL-mention total (16 bytes/cluster on the driver) —
        # sizes the triples-phase uri-resolution strategy below
        n_nil_mentions = int(mins["nelements"].sum()) if n_clusters else 0
        if n_clusters == 0:
            pq.write_table(
                _assemble_clusters_table(pd.DataFrame(), epoch, cfg.dim),
                clusters_path,
            )
        else:
            sorted_mins = np.sort(
                mins["min_mention_id"].to_numpy().astype(np.int64)
            )
            mins_ref = ray.put(sorted_mins)
            dim = cfg.dim

            def _finalize_clusters(t: pa.Table) -> pa.Table:
                from raykg.encode import vectors_to_column
                from raykg.schema import entity_uri_nil

                order = np.asarray(ray.get(mins_ref))
                mm = t.column("min_mention_id").to_numpy(zero_copy_only=False)
                ranks = np.searchsorted(order, mm)
                centers = np.stack(
                    [np.asarray(c, dtype=np.float32)
                     for c in t.column("center").to_pylist()]
                ) if t.num_rows else np.zeros((0, dim), dtype=np.float32)
                return pa.table(
                    {
                        "cluster_id": pa.array(
                            [entity_uri_nil(epoch, int(r)) for r in ranks],
                            type=pa.string(),
                        ),
                        "epoch": pa.array(
                            np.full(t.num_rows, epoch, dtype=np.int32)
                        ),
                        "title": t.column("title"),
                        "nelements": t.column("nelements"),
                        "mention_ids": t.column("mention_ids"),
                        "mentions": t.column("mentions"),
                        "center": vectors_to_column(centers),
                    }
                )

            merged.map_batches(
                _finalize_clusters, batch_format="pyarrow"
            ).write_parquet(clusters_path)
        if rw_shards is not None:
            rw_shards.append_epoch(clusters_path, epoch, n_clusters)
        else:
            # default mode with distributed assembly: the driver RW
            # arrays (this mode's state, O(clusters × dim) — NOT the
            # O(NIL mentions) parts pull) load from the written
            # partition, ordered by canonical rank so RW row position
            # matches the driver-assembly path bit-for-bit
            rw_tbl = pq.read_table(
                clusters_path, columns=["cluster_id", "title", "center"]
            )
            if rw_tbl.num_rows:
                ranks = np.fromiter(
                    (int(u.rsplit(":", 1)[1])
                     for u in rw_tbl.column("cluster_id").to_pylist()),
                    dtype=np.int64, count=rw_tbl.num_rows,
                )
                rw_tbl = rw_tbl.take(pa.array(np.argsort(ranks)))
            rw_state.add_clusters(rw_tbl)
    t_clusters = time.time()

    # ---- triples (deferrable: next epoch only needs the RW clusters,
    # so the caller may run this phase concurrently with epoch k+1's
    # mention stage — see run_pipeline's epoch pipelining) ----
    def run_triples() -> float:
        t_start = time.time()
        linked = rd.read_parquet(
            mentions_dir,
            override_num_blocks=post_blocks,
            columns=["mention_id", "conv_id", "turn_idx", "is_nil",
                     "entity_uri"],
        )
        if clusters_table is not None:
            nil_uri_map: dict[int, str] = {}
            for row in clusters_table.select(
                ["cluster_id", "mention_ids"]
            ).to_pylist():
                for mid in row["mention_ids"]:
                    nil_uri_map[mid] = row["cluster_id"]

            # the map is O(NIL mentions): broadcast once through the
            # object store rather than pickling it into every task spec
            nil_uri_ref = ray.put(nil_uri_map)

            def _to_triples(t: pa.Table) -> pa.Table:
                return mention_triples(t, ray.get(nil_uri_ref), epoch)

            triple_ds = linked.map_batches(_to_triples, batch_format="pyarrow")
        elif n_nil_mentions <= NIL_MAP_BROADCAST_ROWS:
            # distributed-assembly mode, small epoch: the minted-uri map fits a
            # broadcast. A WORKER task builds it from the clusters
            # partition (the driver holds only the ref — no O(NIL
            # mentions) driver loop), and uri resolution stays the
            # cheap single-pass map_batches instead of paying the
            # shuffle join's fixed cost (~10 s/epoch at bench scale
            # for a few-hundred-cluster map). Same adaptive
            # broadcast-vs-shuffle shape as minhash_lsh_pairs.
            nil_uri_ref = _build_nil_uri_map.remote(clusters_path)

            def _to_triples(t: pa.Table) -> pa.Table:
                return mention_triples(t, ray.get(nil_uri_ref), epoch)

            triple_ds = linked.map_batches(_to_triples, batch_format="pyarrow")
        else:
            # distributed-assembly mode, big epoch: resolve minted uris by a
            # distributed hash join (mention_id -> cluster_id exploded
            # from the clusters partition) instead of a broadcast dict
            # — no O(NIL mentions) single-object state anywhere
            from raykg.ops.joins import hash_join

            def _explode(t: pa.Table) -> pa.Table:
                col = t.column("mention_ids")
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                counts = np.diff(col.offsets.to_numpy().astype(np.int64))
                uris = np.repeat(
                    np.asarray(t.column("cluster_id").to_pylist(),
                               dtype=object),
                    counts,
                )
                return pa.table(
                    {
                        "mention_id": pa.array(
                            col.values.to_numpy(zero_copy_only=False),
                            type=pa.int64(),
                        ),
                        "_nil_uri": pa.array(uris.tolist(), type=pa.string()),
                    }
                )

            nil_map_ds = rd.read_parquet(
                clusters_path, columns=["cluster_id", "mention_ids"]
            ).map_batches(_explode, batch_format="pyarrow")
            resolved = hash_join(
                linked, nil_map_ds,
                on="mention_id",
                left_cols=["conv_id", "turn_idx", "is_nil", "entity_uri"],
                right_cols=["_nil_uri"],
                how="left",
                # left side is parquet-backed (schema from file
                # metadata, no execution); the lazy right side needs
                # explicit types
                right_types={"_nil_uri": pa.string()},
            )

            def _to_triples(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                nil_uri = t.column("_nil_uri")
                uri = pc.if_else(
                    pc.and_kleene(
                        t.column("is_nil"), pc.is_valid(nil_uri)
                    ),
                    nil_uri,
                    t.column("entity_uri"),
                )
                i = t.column_names.index("entity_uri")
                t = t.set_column(i, "entity_uri", uri)
                t = t.drop_columns(["_nil_uri"])
                # uris are pre-resolved; pass an empty map and clear
                # is_nil so mention_triples keeps the resolved rows
                t = t.set_column(
                    t.column_names.index("is_nil"), "is_nil",
                    pa.array(np.zeros(t.num_rows, dtype=bool)),
                )
                return mention_triples(t, {}, epoch)

            triple_ds = resolved.map_batches(_to_triples, batch_format="pyarrow")
        # only the turn-mentions rows can still collide (batch-boundary
        # stragglers after the in-batch dedup); linksTo rows are unique
        # by mention_id and the cluster triples by construction — so the
        # dedup SHUFFLE runs over the mentions-pred slice alone instead
        # of the whole triple stream
        from raykg.schema import PRED_MENTIONS as _PM

        mat = triple_ds.materialize()

        def _keep(pred_eq: bool):
            def f(t: pa.Table) -> pa.Table:
                mask = pa.compute.equal(t.column("pred"), _PM)
                return t.filter(mask if pred_eq else pa.compute.invert(mask))
            return f

        unique_part = mat.map_batches(_keep(False), batch_format="pyarrow")
        ment_part = dedup_triples(
            mat.map_batches(_keep(True), batch_format="pyarrow")
        )
        triple_ds = unique_part.union(ment_part)
        if clusters_table is not None:
            ctriples = cluster_triples(clusters_table, epoch)
            if ctriples.num_rows:
                triple_ds = triple_ds.union(rd.from_arrow(ctriples))
        elif n_clusters > 0:
            # one raw worker task straight off the clusters partition —
            # a full read_parquet plan paid ~0.3 s/epoch of planner
            # fixed cost for a few hundred rows
            ctr_ref = _cluster_triples_task.remote(clusters_path, epoch)
            triple_ds = triple_ds.union(rd.from_arrow_refs([ctr_ref]))
        triples_dir = os.path.join(out_dir, "triples", f"epoch={epoch}")
        triple_ds.write_parquet(triples_dir)
        return time.time() - t_start

    triples_s = run_triples() if not defer_triples else None

    stats = {
        "epoch": epoch,
        "input": tr_path,
        "n_clusters": int(n_clusters),
        "rw_total": rw_shards.total if rw_shards is not None else rw_state.ntotal,
        "config": cfg.digest(),
        "wall_s": round(time.time() - t0, 3),
        "mentions_s": round(t_mentions - t0, 3),
        "cluster_s": round(t_clusters - t_mentions, 3),
        "triples_s": round(triples_s, 3) if triples_s is not None else None,
        "n_fragments": n_frags,
        "fragments_skipped": frags_skipped,
    }

    def finish(stats=stats) -> dict:
        """Run the deferred triples phase (if any) and persist lineage."""
        if stats["triples_s"] is None:
            stats["triples_s"] = round(run_triples(), 3)
            stats["wall_s"] = round(time.time() - t0, 3)
        lineage_dir = os.path.join(out_dir, "_lineage")
        os.makedirs(lineage_dir, exist_ok=True)
        with open(os.path.join(lineage_dir, f"epoch={epoch}.json"), "w") as f:
            json.dump({k: v for k, v in stats.items()
                       if not k.startswith("_")}, f)
        return stats

    if defer_triples:
        stats["_finish"] = finish
        return stats
    return finish()


def _merge_salted_clusters(
    parts: pd.DataFrame, salt_counts: np.ndarray, strategy: str = "greedy",
    vectorizers: dict | None = None,
) -> pd.DataFrame:
    """Re-merge sub-clusters of salted (hot) buckets: union-find over a
    strategy-consistent similarity within each original bucket —
    greedy: center dot > GREEDY_THRESHOLD (the clusterer's own metric);
    threestep: center dot > THREESTEP_MERGE_DOT (its compare-encoding
    cross-cluster merge gate, ``TimeEvolving.py:141`` semantics);
    feature: the full TF-IDF kernel over sub-cluster titles (title as
    both surface and context — member contexts are not carried on the
    cluster row) > FEATURE_THRESHOLD; identical titles score 1.0, so
    sub-clusters split only by salting re-merge (documented
    approximation).
    Deterministic: components ordered by min member id; the merged
    center is the smallest-min_mention_id sub-cluster's center (the
    member rows needed for an exact re-medoid live on the cluster, not
    here — documented approximation, only for oversize buckets)."""
    from raykg.schema import (
        FEATURE_THRESHOLD,
        GREEDY_THRESHOLD,
        THREESTEP_MERGE_DOT,
    )

    out = []
    for blk, grp in parts.groupby("block", sort=True):
        if int(salt_counts[int(blk)]) <= 1 or len(grp) <= 1:
            out.append(grp)
            continue
        grp = grp.sort_values("min_mention_id").reset_index(drop=True)
        n = len(grp)
        if strategy == "feature":
            from raykg.cluster import feature_scores

            titles = [str(t) for t in grp["title"]]
            S = feature_scores(titles, titles, vectorizers=vectorizers)
            merge_dot = FEATURE_THRESHOLD
        else:
            C = np.stack(
                [np.asarray(c, dtype=np.float32) for c in grp["center"]]
            )
            S = C @ C.T
            merge_dot = (
                THREESTEP_MERGE_DOT if strategy == "threestep"
                else GREEDY_THRESHOLD
            )
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ei, ej = np.where(S > merge_dot)
        for a, b in zip(ei.tolist(), ej.tolist()):
            if a < b:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(n)])
        rows = []
        for r in np.unique(roots):
            members = np.flatnonzero(roots == r)
            if len(members) == 1:
                rows.append(grp.iloc[members[0]])
                continue
            sub = grp.iloc[members]  # already min_mention_id-ordered
            mention_ids = [m for lst in sub["mention_ids"] for m in lst]
            mentions = [m for lst in sub["mentions"] for m in lst]
            from collections import Counter

            row = sub.iloc[0].copy()
            row["min_mention_id"] = int(min(mention_ids))
            row["nelements"] = len(mention_ids)
            row["mention_ids"] = mention_ids
            row["mentions"] = mentions
            row["title"] = Counter(mentions).most_common(1)[0][0]
            rows.append(row)
        out.append(pd.DataFrame(rows))
    return pd.concat(out, ignore_index=True)


def _assemble_clusters_table(
    parts: pd.DataFrame, epoch: int, dim: int,
    salt_counts: np.ndarray | None = None,
    strategy: str = "greedy",
    vectorizers: dict | None = None,
) -> pa.Table:
    """Canonical ids over the collected per-block cluster rows (rank =
    smallest member mention_id across all blocks)."""
    from raykg.encode import vectors_to_column
    from raykg.schema import entity_uri_nil

    if (
        salt_counts is not None
        and len(parts)
        and "block" in parts.columns
    ):
        parts = _merge_salted_clusters(parts, salt_counts, strategy=strategy,
                                       vectorizers=vectorizers)

    if len(parts) == 0 or "min_mention_id" not in parts.columns:
        # an epoch with zero NIL mentions: the empty Dataset loses its
        # schema on to_pandas — emit a typed empty clusters table
        return pa.table(
            {
                "cluster_id": pa.array([], type=pa.string()),
                "epoch": pa.array([], type=pa.int32()),
                "title": pa.array([], type=pa.string()),
                "nelements": pa.array([], type=pa.int64()),
                "mention_ids": pa.array([], type=pa.list_(pa.int64())),
                "mentions": pa.array([], type=pa.list_(pa.string())),
                "center": vectors_to_column(np.zeros((0, dim), dtype=np.float32)),
            }
        )
    parts = parts.sort_values("min_mention_id").reset_index(drop=True)
    n = len(parts)
    centers = (
        np.stack([np.asarray(c, dtype=np.float32) for c in parts["center"]])
        if n
        else np.zeros((0, dim), dtype=np.float32)
    )
    return pa.table(
        {
            "cluster_id": pa.array(
                [entity_uri_nil(epoch, r) for r in range(n)], type=pa.string()
            ),
            "epoch": pa.array(np.full(n, epoch, dtype=np.int32)),
            "title": pa.array(parts["title"].tolist(), type=pa.string()),
            "nelements": pa.array(parts["nelements"].tolist(), type=pa.int64()),
            "mention_ids": pa.array(
                [list(x) for x in parts["mention_ids"]], type=pa.list_(pa.int64())
            ),
            "mentions": pa.array(
                [list(x) for x in parts["mentions"]], type=pa.list_(pa.string())
            ),
            "center": vectors_to_column(centers),
        }
    )


def fit_vectorizers_from_fixture(
    fixture_dir: str, epoch: int, max_turns: int = 4000
) -> dict | None:
    """Dev-split stand-in for the reference's pickled vectorizers
    (``featureclustering/__main__.py:137-139``, fit on dev100 offline):
    detect mentions over a bounded, deterministic sample of the given
    epoch's transcripts and fit the bigram/context TF-IDF models there.
    Driver-side: the sample is small by construction."""
    from raykg.cluster import fit_feature_vectorizers

    tr_path = os.path.join(fixture_dir, "transcripts", f"epoch={epoch}")
    if not os.path.isdir(tr_path):
        return None
    files = sorted(
        os.path.join(tr_path, f)
        for f in os.listdir(tr_path)
        if f.endswith(".parquet")
    )
    mentions: list[str] = []
    contexts: list[str] = []
    taken = 0
    for path in files:
        tbl = pq.read_table(path, columns=["conv_id", "turn_idx", "text"])
        if taken + tbl.num_rows > max_turns:
            tbl = tbl.slice(0, max_turns - taken)
        taken += tbl.num_rows
        det = detect_mentions(tbl)
        mentions.extend(det.column("mention").to_pylist())
        contexts.extend(
            (l or "") + " " + (r or "")
            for l, r in zip(
                det.column("context_left").to_pylist(),
                det.column("context_right").to_pylist(),
            )
        )
        if taken >= max_turns:
            break
    if not mentions:
        return None
    return fit_feature_vectorizers(mentions, contexts)


def _parquet_num_rows(path: str) -> int:
    """Row count from parquet METADATA only (file or directory) — the
    resume path must not load cluster payloads onto the driver."""
    if os.path.isdir(path):
        return sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.read_metadata(path).num_rows


def list_epochs(fixture_dir: str) -> list[int]:
    tdir = os.path.join(fixture_dir, "transcripts")
    return sorted(
        int(d.split("=")[1]) for d in os.listdir(tdir) if d.startswith("epoch=")
    )


def run_pipeline(
    fixture_dir: str,
    out_dir: str,
    cfg: PipelineConfig | None = None,
    epochs: list[int] | None = None,
    resume: bool = True,
    incremental: bool = True,
) -> dict:
    """Driver loop over epochs with manifest checkpointing.

    On resume, completed epochs are skipped and the RW state is rebuilt
    from their materialized cluster deltas. ``incremental=False`` is the
    reference's ``--no-incremental`` mode (``scripts/eval_kbp.py:
    773-779``): every epoch's input is concatenated and processed as ONE
    batch — no cross-epoch entity linking, one clustering pass."""
    cfg = cfg or PipelineConfig()
    if cfg.clusterer not in ("greedy", "feature", "threestep"):
        raise ValueError(f"unknown clustering strategy: {cfg.clusterer}")
    if cfg.blocking not in ("global", "surface"):
        raise ValueError(f"unknown blocking mode: {cfg.blocking}")
    if cfg.ann not in ("exact", "ivf", "pq", "hnsw"):
        raise ValueError(f"unknown ann mode: {cfg.ann}")
    epochs = epochs if epochs is not None else list_epochs(fixture_dir)
    if not incremental:
        os.makedirs(out_dir, exist_ok=True)
        kb_handles = load_kb_handles(os.path.join(fixture_dir, "kb.parquet"), cfg)
        if cfg.clusterer == "feature" and cfg.tfidf_prefit and epochs:
            vec = fit_vectorizers_from_fixture(fixture_dir, epochs[0])
            if vec is not None:
                kb_handles["vec_ref"] = ray.put(vec)
        rw_state = RwState(cfg.dim)
        tr_dirs = [
            os.path.join(fixture_dir, "transcripts", f"epoch={e}")
            for e in epochs
        ]
        stats = [
            run_epoch(fixture_dir, out_dir, 0, kb_handles, rw_state, cfg,
                      tr_dirs=tr_dirs)
        ]
        return {"epochs_run": [0], "stats": stats, "rw_total": rw_state.ntotal}
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")
    manifest = {"completed_epochs": [], "config": cfg.digest()}
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prev = json.load(f)
        if prev.get("config") == cfg.digest():
            manifest = prev

    kb_handles = load_kb_handles(os.path.join(fixture_dir, "kb.parquet"), cfg)
    if cfg.clusterer == "feature" and cfg.tfidf_prefit:
        vec = fit_vectorizers_from_fixture(fixture_dir, epochs[0]) if epochs else None
        if vec is not None:
            kb_handles["vec_ref"] = ray.put(vec)
    rw_state = RwState(cfg.dim)
    rw_shards = None
    if cfg.kb_shards > 1:
        from raykg.sharded import RwShards

        rw_shards = RwShards(cfg.kb_shards, cfg.dim)
        kb_handles["rw_shards"] = rw_shards
    stats = []

    # epoch pipelining: epoch k's triples phase runs on a worker thread
    # while epoch k+1's mention stage executes (both are independent Ray
    # Dataset jobs; the streaming executor interleaves their tasks).
    # The manifest records epoch k only after its triples thread joins,
    # so resume semantics are unchanged.
    import threading

    pending: tuple[int, dict, threading.Thread, list] | None = None

    def _mark_complete(epoch: int, st: dict) -> None:
        st.pop("_finish", None)
        stats.append(st)
        manifest["completed_epochs"].append(epoch)
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)

    def _join_pending() -> None:
        nonlocal pending
        if pending is None:
            return
        p_epoch, p_st, p_th, p_err = pending
        p_th.join()
        pending = None
        if p_err:
            raise p_err[0]
        _mark_complete(p_epoch, p_st)

    try:
        for epoch in epochs:
            if epoch in manifest["completed_epochs"]:
                delta = os.path.join(out_dir, "clusters", f"epoch={epoch}.parquet")
                if os.path.exists(delta):
                    if rw_shards is not None:
                        rw_shards.append_epoch(
                            delta, epoch, _parquet_num_rows(delta)
                        )
                    else:
                        rw_state.add_clusters(pq.read_table(delta))
                continue
            st = run_epoch(fixture_dir, out_dir, epoch, kb_handles, rw_state, cfg,
                           defer_triples=True)
            err: list = []
            finish = st["_finish"]

            def _runner(finish=finish, err=err):
                try:
                    finish()
                except BaseException as e:  # surfaced at join
                    err.append(e)

            th = threading.Thread(target=_runner, name=f"triples-{epoch}")
            _join_pending()
            th.start()
            pending = (epoch, st, th, err)
        _join_pending()
    except BaseException:
        # an epoch failed while the previous epoch's triples thread may
        # still be in flight: join it so a success is recorded in the
        # manifest (resume skips it) and a failure is not silently lost
        if pending is not None:
            try:
                _join_pending()
            except BaseException as pending_exc:
                import logging

                logging.getLogger(__name__).error(
                    "deferred triples thread also failed: %r", pending_exc
                )
        raise
    return {"epochs_run": [s["epoch"] for s in stats], "stats": stats,
            "rw_total": rw_shards.total if rw_shards is not None
            else rw_state.ntotal}
