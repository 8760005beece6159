"""Ray-Data-native distributed code-search engine.

A from-scratch rebuild of the query and data-processing capabilities of
``Violet0725/DistributedCodeSearchEngine`` (reference read-only at
``/root/reference``), expressed as ``ray.data.Dataset`` pipelines:
``map_batches`` over zero-copy Arrow batches for tokenization / parsing /
embedding, a partitioned inverted-index build with delta+varint-compressed
posting lists, a ``groupby(term)`` partial-aggregate shuffle for the global
lexicon, and an index-shard actor pool for exact BM25 top-k query execution
that is rank-identical to the reference's ``rank_bm25``-based semantics.

Nothing here is a port: the reference is a single-process, in-memory,
record-at-a-time engine (see SURVEY.md); this package is columnar,
streaming, and partitioned end to end.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level exports (keep `import distributedcodesearchengine_ray` light; ray is
    # only imported when a pipeline actually runs)
    if name == "CodeSearchEngine":
        from .engine import CodeSearchEngine

        return CodeSearchEngine
    if name == "build_index":
        from .pipelines.build_index import build_index

        return build_index
    if name == "QueryEngine":
        from .pipelines.query import QueryEngine

        return QueryEngine
    if name == "HybridEngine":
        from .pipelines.hybrid import HybridEngine

        return HybridEngine
    raise AttributeError(name)
