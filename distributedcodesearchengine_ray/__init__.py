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
