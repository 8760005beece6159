"""High-level engine facade — the reference's user-facing surface
(``LocalSearchEngine`` / ``HybridSearchEngine`` / ``RepoIndexer``,
/root/reference/codesearch/search/engine.py:135-238,393-521 and
indexer/repo_indexer.py:94-270) re-expressed over the distributed index.

A user of the reference maps 1:1:

| reference                              | here                          |
|----------------------------------------|-------------------------------|
| ``RepoIndexer.index_directory``        | ``CodeSearchEngine.index_corpus`` (parquet corpus in, sharded index out) |
| ``LocalSearchEngine.search``           | ``search(..., use_hybrid=False)`` (BM25 + score normalization K4) |
| ``HybridSearchEngine.search``          | ``search(..., use_hybrid=True)`` (mock-embed semantic + RRF) |
| ``BM25Index.remove_by_repo`` (D2)      | ``remove_by_repo`` (filter corpus -> rebuild; the reference also refits the whole index) |
| ``BM25Index.count`` / Qdrant ``get_stats`` (A4) | ``count`` / ``stats``  |
| highlights (M11, engine.py:112-124)    | ``highlights`` field on hits  |
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

from .pipelines.build_index import build_index
from .pipelines.hybrid import HybridEngine
from .pipelines.query import QueryEngine
from .state.manifest import IndexManifest


def _highlights(hit: dict) -> List[str]:
    out = []
    doc = hit.get("docstring")
    if doc:
        out.append(doc[:200])
    sig = hit.get("signature")
    if sig:
        out.append(sig)
    return out


class CodeSearchEngine:
    """Build + query facade over one index directory."""

    def __init__(self, index_dir: str, mode: str = "entity", ann_method: str = "exact"):
        from .state.manifest import normalize_dir

        self.index_dir = normalize_dir(index_dir)
        self.ann_method = ann_method
        self.mode = mode
        self._query_engine: Optional[QueryEngine] = None
        self._hybrid_engine: Optional[HybridEngine] = None

    # ------------------------------------------------------------- build

    def index_corpus(
        self,
        corpus,
        resume: bool = True,
        with_embeddings: bool = False,
        **build_kwargs,
    ) -> IndexManifest:
        """Index a (repo, path, commit, lang, content) parquet corpus."""
        self.close()
        manifest = build_index(
            corpus, self.index_dir, mode=self.mode, resume=resume, **build_kwargs
        )
        if with_embeddings:
            from .stages.embed_stage import build_embeddings

            build_embeddings(self.index_dir)
        return manifest

    def remove_by_repo(self, corpus, repo_name: str, **build_kwargs) -> IndexManifest:
        """D2 semantics: drop a repo and refit.  The reference rebuilds its
        whole in-memory index (bm25_index.py:172-202); here the rebuild is
        a fresh deterministic build over the filtered corpus — unchanged
        doc-range partitions are NOT reusable because docIDs are global
        insertion ranks, exactly as in the reference."""
        import pyarrow.compute as pc

        from .sources.corpus import read_corpus

        ds = read_corpus(corpus) if isinstance(corpus, str) else corpus
        filtered = ds.map_batches(
            lambda t: t.filter(pc.invert(pc.equal(t["repo"], repo_name))),
            batch_format="pyarrow",
        )
        self.close()
        import shutil

        shutil.rmtree(self.index_dir, ignore_errors=True)
        return build_index(
            filtered, self.index_dir, mode=self.mode, resume=False, **build_kwargs
        )

    def tombstone_remove(self, value: str, column: str = "repo") -> IndexManifest:
        """D2 at scale: logical delete via tombstones — no partition file
        is rewritten (``build_index.tombstone_delete``).  Search results
        and BM25 scores equal a full rebuild over the filtered corpus;
        surviving docs keep their original docIDs (relative order — and so
        the insertion-order tie-break — is preserved)."""
        from .pipelines.build_index import tombstone_delete

        self.close()  # actors must reload the alive mask + new scalars
        return tombstone_delete(self.index_dir, column, value)

    # ------------------------------------------------------------- query

    def _bm25(self) -> QueryEngine:
        if self._query_engine is None:
            self._query_engine = QueryEngine(self.index_dir)
        return self._query_engine

    def _hybrid(self) -> HybridEngine:
        if self._hybrid_engine is None:
            self._hybrid_engine = HybridEngine(self.index_dir, ann_method=self.ann_method)
        return self._hybrid_engine

    def search(
        self,
        query: str,
        limit: int = 20,
        language: Optional[str] = None,
        entity_type: Optional[str] = None,
        repo_filter: Optional[str] = None,
        use_hybrid: bool = False,
        method: str = "dense",
        normalize: bool = True,
        range_syntax: bool = False,
    ) -> List[dict]:
        """Ranked hits with metadata + highlights.

        BM25-only path normalizes scores by the top score (K4,
        engine.py:484-490); hybrid path is already RRF-normalized.
        """
        filters: Dict[str, str] = {}
        if language:
            filters["language"] = language
        if entity_type:
            filters["entity_type"] = entity_type
        if repo_filter:
            filters["repo_name"] = repo_filter
        if use_hybrid:
            hits = self._hybrid().search(query, limit=limit, filters=filters or None)
            for h in hits:
                h["highlights"] = _highlights(h)
            return hits
        df = self._bm25().search_with_meta(
            query, limit=limit, filters=filters or None, method=method,
            range_syntax=range_syntax,
        )
        hits = df.to_dict("records")
        if hits and normalize:
            top = hits[0]["score"] if hits[0]["score"] > 0 else 1.0
            for h in hits:
                h["bm25_score"] = h["score"]
                h["score"] = h["score"] / top
        for h in hits:
            h["highlights"] = _highlights(h)
        return hits

    def find_similar(
        self,
        doc_id: int,
        limit: int = 20,
        language: Optional[str] = None,
        entity_type: Optional[str] = None,
        repo_filter: Optional[str] = None,
        max_terms: int = 25,
        normalize: bool = True,
    ) -> List[dict]:
        """Find-similar ("more like this"): the source doc's top
        ``max_terms`` tf*idf terms run as a BM25 query (Lucene/ES MLT
        shape on the reference's scoring contract), source excluded,
        hits joined to metadata + highlights like ``search``."""
        filters: Dict[str, str] = {}
        if language:
            filters["language"] = language
        if entity_type:
            filters["entity_type"] = entity_type
        if repo_filter:
            filters["repo_name"] = repo_filter
        qe = self._bm25()
        raw = qe.more_like_this(doc_id, limit=limit, filters=filters or None)
        df = qe.hits_with_meta(raw)
        hits = df.to_dict("records")
        if hits and normalize:
            top = hits[0]["score"] if hits[0]["score"] > 0 else 1.0
            for h in hits:
                h["bm25_score"] = h["score"]
                h["score"] = h["score"] / top
        for h in hits:
            h["highlights"] = _highlights(h)
        return hits

    def search_many(
        self,
        queries: List[str],
        limit: int = 20,
        language: Optional[str] = None,
        entity_type: Optional[str] = None,
        repo_filter: Optional[str] = None,
        method: str = "dense",
    ) -> List[List[dict]]:
        """Bulk search (ES _msearch): one actor-pool fan-out scores every
        query in a single round trip — ids + raw BM25 scores per query
        (no metadata join; bulk callers join what they need)."""
        filters: Dict[str, str] = {}
        if language:
            filters["language"] = language
        if entity_type:
            filters["entity_type"] = entity_type
        if repo_filter:
            filters["repo_name"] = repo_filter
        batches = self._bm25().search_batch(
            [(q, filters or None) for q in queries], limit=limit, method=method
        )
        return [
            [{"doc_id": h["doc_id"], "score": h["score"]} for h in hits]
            for hits in batches
        ]

    def search_expanded(
        self,
        query: str,
        limit: int = 20,
        fb_k: int = 10,
        n_exp: int = 10,
        language: Optional[str] = None,
        entity_type: Optional[str] = None,
        repo_filter: Optional[str] = None,
        normalize: bool = True,
    ) -> List[dict]:
        """Pseudo-relevance-feedback search (RM3/Rocchio shape): the top
        ``fb_k`` BM25 hits contribute their ``n_exp`` strongest non-query
        terms (summed tf*idf) to an expanded query, re-ranked with
        ordinary BM25; hits joined to metadata + highlights like
        ``search``."""
        filters: Dict[str, str] = {}
        if language:
            filters["language"] = language
        if entity_type:
            filters["entity_type"] = entity_type
        if repo_filter:
            filters["repo_name"] = repo_filter
        qe = self._bm25()
        raw = qe.search_rm3(
            query, limit=limit, fb_k=fb_k, n_exp=n_exp, filters=filters or None
        )
        df = qe.hits_with_meta(raw)
        hits = df.to_dict("records")
        if hits and normalize:
            top = hits[0]["score"] if hits[0]["score"] > 0 else 1.0
            for h in hits:
                h["bm25_score"] = h["score"]
                h["score"] = h["score"] / top
        for h in hits:
            h["highlights"] = _highlights(h)
        return hits

    def snippets(
        self,
        query: str,
        limit: int = 20,
        window: int = 12,
        language: Optional[str] = None,
    ) -> List[dict]:
        """Ranked hits + query-dependent best-window snippet per hit
        (most distinct query terms in a ``window``-token span, earliest
        start on ties) — the dynamic highlighter complementing the
        reference's static ``[docstring[:200], signature]`` highlights."""
        filters = {"language": language} if language else None
        return self._bm25().snippets(query, limit=limit, window=window, filters=filters)

    def facets(
        self,
        query: str,
        facet_col: str = "language",
        language: Optional[str] = None,
        entity_type: Optional[str] = None,
        repo_filter: Optional[str] = None,
    ) -> Dict[str, int]:
        """Faceted search: ``facet_col`` value counts over the FULL
        thresholded result set of ``query`` (reference threshold semantics,
        bm25_index.py max*0.01), not just the top-k.  Per-shard partials
        only — per-doc rows never reach the driver."""
        filters: Dict[str, str] = {}
        if language:
            filters["language"] = language
        if entity_type:
            filters["entity_type"] = entity_type
        if repo_filter:
            filters["repo_name"] = repo_filter
        return self._bm25().facets(query, facet_col=facet_col, filters=filters or None)

    def suggest(self, term: str, max_dist: int = 1, limit: int = 10):
        """Spelling suggestions from the index vocabulary."""
        return self._bm25().suggest(term, max_dist=max_dist, limit=limit)

    def collapse(
        self, query: str, collapse_col: str = "language", limit: int = 10
    ) -> List[dict]:
        """Field collapsing: top ``limit`` groups by best BM25 hit — at
        most one result per distinct ``collapse_col`` value."""
        return self._bm25().collapse(query, collapse_col=collapse_col, limit=limit)

    def search_qld(self, query: str, limit: int = 20, mu: float = 500.0) -> List[dict]:
        """Query-likelihood Dirichlet ranking (alternative ranker over the
        same index; Zhai & Lafferty 2001)."""
        return self._bm25().search_qld(query, limit=limit, mu=mu)

    def explain(self, query: str, limit: int = 3) -> List[dict]:
        """Lucene/ES _explain: per-term BM25 score breakdown (tf, df,
        idf, contribution) for the top ``limit`` hits."""
        return self._bm25().explain(query, limit=limit)

    # ------------------------------------------------------------- stats

    def count(self) -> int:
        return IndexManifest.load(self.index_dir).n_docs

    def stats(self) -> dict:
        """A4: index counts + per-language histogram + manifest scalars."""
        import pyarrow.dataset as pads

        m = IndexManifest.load(self.index_dir)
        langs: Dict[str, int] = {}
        meta = pads.dataset(os.path.join(self.index_dir, "docmeta"), format="parquet")
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        dead = None
        tomb_dir = os.path.join(self.index_dir, "tombstones")
        if os.path.isdir(tomb_dir):
            files = [f for f in sorted(os.listdir(tomb_dir)) if f.endswith(".parquet")]
            if files:
                dead = np.concatenate(
                    [
                        pq.read_table(os.path.join(tomb_dir, f), columns=["doc_id"])[
                            "doc_id"
                        ].to_numpy(zero_copy_only=False)
                        for f in files
                    ]
                )
        cols = ["lang"] if dead is None else ["lang", "doc_id"]
        for batch in meta.to_batches(columns=cols):
            lang_col = batch["lang"]
            if dead is not None:
                keep = ~np.isin(
                    batch["doc_id"].to_numpy(zero_copy_only=False), dead
                )
                lang_col = lang_col.filter(pa.array(keep)) if not keep.all() else lang_col
            vc = pc.value_counts(lang_col)
            for lang, n in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()):
                langs[lang] = langs.get(lang, 0) + n
        return {
            "mode": m.mode,
            "n_docs": m.n_docs,
            "vocab_size": m.vocab_size,
            "avgdl": m.avgdl,
            "num_partitions": m.num_partitions,
            "languages": dict(sorted(langs.items())),
            "total_tokens": m.total_tokens,
        }

    def close(self) -> None:
        if self._query_engine is not None:
            self._query_engine.close()
            self._query_engine = None
        if self._hybrid_engine is not None:
            self._hybrid_engine.close()
            self._hybrid_engine = None
