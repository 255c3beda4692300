"""raykg — Ray-Data-native incremental knowledge-graph construction engine.

From-scratch re-expression of the capabilities of
rpo19/Incremental-Entity-Extraction (IJCKG'22 incremental entity
extraction / linking / NIL discovery; see /root/repo/SURVEY.md) as a
streaming-executed DAG of ``ray.data.Dataset`` stages:

    read transcript Parquet
      -> map_batches mention detection (zero-copy Arrow)
      -> actor-pool mention encoding (pluggable encoder)
      -> actor-pool candidate retrieval (exact flat index over the KB
         + incrementally-added NIL entities)
      -> stateless NIL-feature assembly + logistic NIL scoring
      -> per-epoch NIL clustering (greedy / feature / threestep)
      -> canonical entity-id assignment + KB delta materialization
      -> (subj, pred, obj) triple emission into a partitioned graph store

plus the generic large-scale training-data operators (dedup families,
similarity search, text analysis, multimodal plumbing) under
``raykg.ops``.
"""

__version__ = "0.1.0"
