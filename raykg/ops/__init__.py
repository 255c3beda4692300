"""Large-scale training-data operators (beyond the reference's own
chain): deduplication families, similarity search, text analysis,
multimodal column plumbing. All are Ray-Data-first batch transforms
designed for the 100 TB regime (local pre-aggregation, broadcast small
sides, hash-partitioned shuffles, deterministic keys)."""
