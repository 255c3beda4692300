"""LinkStage: fused encode + retrieve + NIL-score actor stage.

The reference runs these as three separate HTTP microservices
(biencoder -> indexer -> nilpredictor, ``scripts/eval_kbp.py:360-494``),
re-serializing the whole mention table between each. Here they are one
actor (per-pool replica) holding all the per-worker state — encoder
"model", KB index replica (broadcast via ray.put), NIL model — so a
batch flows through the three transforms in-process with zero
inter-stage handoff. Separate ``MentionEncoder`` / ``Retriever`` /
``NilStage`` classes remain available for pipelines that need the
stages split (e.g. a GPU encoder pool sized differently from a
CPU retriever pool).
"""

from __future__ import annotations

import pyarrow as pa

from raykg.encode import MentionEncoder
from raykg.index import Retriever
from raykg.nil import DEFAULT_NIL_MODEL, NilStage
from raykg.schema import DIM, TOP_K


class LinkStage:
    def __init__(
        self,
        kb_ref,
        rw_ref=None,
        rw_uris=None,
        model=DEFAULT_NIL_MODEL,
        dim: int = DIM,
        top_k: int = TOP_K,
        compact: bool = True,
        ann_ref=None,
        nprobe: int = 16,
        encoder: str = "hash",
        max_seq_length: int | None = 128,
    ):
        self.encode = MentionEncoder(dim=dim, spec=encoder,
                                     max_seq_length=max_seq_length)
        self.retrieve = Retriever(kb_ref, rw_ref, top_k, compact=compact,
                                  ann_ref=ann_ref, nprobe=nprobe)
        self.score = NilStage(model, rw_uris=rw_uris or [])

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.score(self.retrieve(self.encode(batch)))


# Worker-process-local stage cache for the task-based execution mode.
# Ray reuses worker processes across tasks, so building the LinkStage
# once per (worker, epoch-key) gives actor-pool state amortization with
# stateless-task elasticity: tasks fan out to every CPU immediately
# instead of waiting for an actor pool to scale up. One entry is kept —
# a new epoch (new refs) evicts the previous epoch's index.
_STAGE_CACHE: dict = {}


def make_link_fn(kb_ref, rw_ref, rw_uris_ref, model, dim, top_k, compact,
                 ann_ref=None, nprobe: int = 16, encoder: str = "hash",
                 max_seq_length: int | None = 128):
    """``rw_uris_ref`` is a ray.put ref of the minted-uri list — large
    broadcast state always travels by ref, never inside the pickled
    task closure. ``ann_ref``: prebuilt IVF metadata ref (see
    raykg.index.Retriever); None keeps exact flat search."""
    import ray

    def _key(ref):
        return ref.hex() if hasattr(ref, "hex") else id(ref)

    key = (
        _key(kb_ref), _key(rw_ref), _key(ann_ref), nprobe, dim, top_k, compact,
        encoder, max_seq_length,
    )

    def link_fn(batch: pa.Table) -> pa.Table:
        stage = _STAGE_CACHE.get(key)
        if stage is None:
            _STAGE_CACHE.clear()
            rw_uris = ray.get(rw_uris_ref) if rw_uris_ref is not None else []
            stage = LinkStage(
                kb_ref, rw_ref, rw_uris, model, dim=dim, top_k=top_k,
                compact=compact, ann_ref=ann_ref, nprobe=nprobe,
                encoder=encoder, max_seq_length=max_seq_length,
            )
            _STAGE_CACHE[key] = stage
        return stage(batch)

    return link_fn
