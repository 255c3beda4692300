"""Arrow schemas and pipeline constants.

Fixes up front the dynamic pandas/JSON shapes of the reference
(SURVEY.md §1.3): vectors are fixed-size-list float32 Arrow columns
end-to-end (the reference ships base64-encoded float32 buffers inside
JSON, ``pipeline/indexer/main.py:31-38`` — eliminated here), candidate
lists are list<struct>, flags are bool columns.
"""

from __future__ import annotations

import pyarrow as pa

# Toy-encoder dimensionality for fixtures/tests (prod would be 1024 per
# the reference: pipeline/docker-compose.yml:43). All raykg code takes
# dim from config, never hard-codes it.
DIM = 64

# Encodings are L2-normalized then scaled to this norm so that the
# reference's raw-dot-product thresholds (greedy cluster
# theta=80.98388671875, pipeline/docker-compose.yml:80; cluster-merge
# dot>80, TimeEvolving.py:141) live on the same 0..~100 scale they were
# tuned for with BLINK vectors.
VEC_SCALE = 10.0

# Reference decision thresholds (BASELINE.md).
NIL_THRESHOLD = 0.5  # scripts/eval_kbp.py:489 — nil_score < 0.5 => NIL
GREEDY_THRESHOLD = 80.98388671875  # pipeline/docker-compose.yml:80
FEATURE_THRESHOLD = 0.984375  # pipeline/docker-compose.yml:91
THREESTEP_T1 = 0.2  # string step, pipeline/threestepclustering/__main__.py:95-99
THREESTEP_T2 = 0.036  # encoding step, :119
THREESTEP_T3 = 0.05  # center step, :158-161
THREESTEP_MERGE_DOT = 80.0  # TimeEvolving.py:141
THREESTEP_BREAKUP = 25  # >25 unique lowercased mentions, __main__.py:176
TOP_K = 10  # scripts/eval_kbp.py:380

# Index ids, mirroring the reference's docker-compose index config
# "hnsw:...:10:r,flat:...:20:rw" (pipeline/docker-compose.yml:43).
INDEXER_KB = 10  # read-only background KB
INDEXER_RW = 20  # read-write index of minted NIL entities

DUMMY_SCORE = -1000.0  # tombstone candidates, pipeline/indexer/main.py:121-135

TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

KB_ENTITIES = pa.schema(
    [
        ("id", pa.int64()),
        ("indexer", pa.int32()),
        ("wikipedia_id", pa.int64()),
        ("title", pa.string()),
        ("descr", pa.string()),
        ("type_", pa.string()),
        ("embedding", pa.list_(pa.float32(), DIM)),
    ]
)

GOLD_MENTIONS = pa.schema(
    [
        ("mention_id", pa.int64()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("start_pos", pa.int32()),
        ("end_pos", pa.int32()),
        ("mention", pa.string()),
        ("context_left", pa.string()),
        ("context_right", pa.string()),
        ("Wikipedia_ID", pa.int64()),
        ("Wikipedia_title", pa.string()),
        ("NIL", pa.bool_()),
        ("batch", pa.int32()),
    ]
)

CANDIDATE = pa.struct(
    [
        ("raw_score", pa.float32()),
        ("id", pa.int64()),
        ("wikipedia_id", pa.int64()),
        ("title", pa.string()),
        ("type_", pa.string()),
        ("indexer", pa.int32()),
        ("score", pa.float32()),
        ("norm_score", pa.float32()),
        ("dummy", pa.bool_()),
    ]
)

MENTIONS = pa.schema(
    [
        ("mention_id", pa.int64()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("start_pos", pa.int32()),
        ("end_pos", pa.int32()),
        ("mention", pa.string()),
        ("context_left", pa.string()),
        ("context_right", pa.string()),
    ]
)

CLUSTERS = pa.schema(
    [
        ("cluster_id", pa.string()),
        ("epoch", pa.int32()),
        ("title", pa.string()),
        ("nelements", pa.int64()),
        ("mention_ids", pa.list_(pa.int64())),
        ("mentions", pa.list_(pa.string())),
        ("center", pa.list_(pa.float32(), DIM)),
    ]
)

TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("epoch", pa.int32()),
        ("conv_id", pa.string()),
    ]
)

# Triple predicates (SURVEY.md §7.6).
PRED_LINKS_TO = "kg:linksTo"
PRED_MENTIONS = "kg:mentions"
PRED_HAS_MEMBER = "kg:hasMember"
PRED_LABEL = "kg:label"


def entity_uri_kb(wikipedia_id: int) -> str:
    return f"ent:kb:{wikipedia_id}"


def entity_uri_nil(epoch: int, rank: int) -> str:
    """Stable minted-entity id: replaces the reference's FAISS
    ``ntotal``-based id assignment (pipeline/indexer/main.py:198) with a
    deterministic (epoch, rank) scheme; rank orders clusters by smallest
    member mention_id (FIXTURES.md §6)."""
    return f"nil:{epoch}:{rank}"
