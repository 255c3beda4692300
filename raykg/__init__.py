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


def _seed_fsspec_http_shim() -> None:
    """Neutralize a thread race in ray.data's path resolution.

    ``ray/data/datasource/path_util._is_http_filesystem`` runs
    ``from fsspec.implementations.http import HTTPFileSystem`` on EVERY
    read, catching only ModuleNotFoundError. In this environment that
    import always fails (fsspec's http module needs aiohttp, absent) —
    harmless single-threaded, but two driver threads racing the first
    import (epoch pipelining runs the deferred-triples thread next to
    the main thread's reads) can leave one thread looking at the
    partially-initialized module, which raises a PLAIN ImportError that
    path_util does not catch — a once-per-~6-full-suite-runs flake.
    Pre-seeding a benign module with an HTTPFileSystem class nobody
    instantiates (no http filesystems exist here; it is only ever the
    right-hand side of an isinstance) makes the import deterministic.
    """
    import sys

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        import types

        shim = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # pragma: no cover - isinstance target only
            pass

        shim.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = shim


_seed_fsspec_http_shim()
