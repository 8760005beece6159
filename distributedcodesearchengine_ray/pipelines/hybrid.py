"""Hybrid search: semantic (mock-embedding cosine) + BM25, RRF-fused.

Faithful to the reference ``HybridSearchEngine`` semantics
(/root/reference/codesearch/search/engine.py:158-390):

* query enhancement (M10): keyword-triggered rewrites for http/json/auth/
  file queries, else ``"function or method that {q}"``;
* both sides fetch ``limit*2`` candidates;
* weighted RRF with k=60: ``rrf = 1/(k + rank + 1)``, semantic side scaled
  by ``semantic_weight`` (default 0.7), BM25 side by ``1-w``;
* low-diversity fallback: if the semantic score range < 0.05 the semantic
  weight drops to 0.3;
* HTTP boost table for http/request/api queries (×1.5 request-verb fns in
  api.py / send in sessions.py, ×1.3 send in adapters.py, ×0.7 handle_/test_
  names);
* fused list sorted desc (stable) and normalized by the max combined score.

The semantic side here runs the deterministic MockEmbedder over the
``embeddings`` parquet built by
:func:`distributedcodesearchengine_ray.stages.embed_stage.build_embeddings`; metadata
filters are applied pre-search (Qdrant-filter semantics,
``vector_store.py:229-253``) via the filter columns carried on the
embeddings table.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow.dataset as pads

from ..functions.embed import mock_embed_text
from .query import QueryEngine

RRF_K = 60


def enhance_query(query: str) -> str:
    """M10 query rewriting (engine.py:240-271)."""
    q = query.lower()
    if any(t in q for t in ("http", "request", "api", "url", "web")):
        if "handle" in q and not any(
            t in q for t in ("redirect", "response", "error", "exception", "cookie", "process")
        ):
            return "function that sends makes HTTP requests GET POST PUT DELETE PATCH"
        if any(t in q for t in ("make", "send", "perform", "execute", "do")):
            return f"function that sends or makes HTTP requests: {query}"
        return f"HTTP request function: {query}"
    if any(t in q for t in ("json", "parse", "decode")):
        return f"JSON parsing function: {query}"
    if any(t in q for t in ("auth", "login", "token")):
        return f"authentication function: {query}"
    if any(t in q for t in ("download", "file", "save")):
        return f"file handling function: {query}"
    return f"function or method that {query}"


def http_boost(query: str, name: str, file_path: str) -> float:
    """HTTP heuristic boost table (engine.py:338-367)."""
    q = query.lower()
    if not any(t in q for t in ("http", "request", "api")):
        return 1.0
    fp, nm = (file_path or "").lower(), (name or "").lower()
    if "api.py" in fp:
        if any(t in nm for t in ("request", "get", "post", "put", "patch", "delete", "head", "options")):
            return 1.5
        return 1.0
    if "sessions.py" in fp and "send" in nm:
        return 1.5
    if "adapters.py" in fp and "send" in nm:
        return 1.3
    if any(t in nm for t in ("handle_", "test_")):
        return 0.7
    return 1.0


def rrf_fuse(
    semantic: List[Tuple[int, float]],
    bm25: List[Tuple[int, float]],
    *,
    semantic_weight: float = 0.7,
    query: Optional[str] = None,
    meta: Optional[Dict[int, dict]] = None,
) -> List[Tuple[int, float, float, float]]:
    """Weighted RRF merge -> [(doc_id, combined, semantic_raw, bm25_raw)].

    ``meta`` maps doc_id -> {"name", "file_path"} for the HTTP boost.
    """
    if semantic:
        svals = [s for _, s in semantic]
        if max(svals) - min(svals) < 0.05:
            semantic_weight = 0.3
    bm25_weight = 1 - semantic_weight
    acc: Dict[int, dict] = {}
    for rank, (doc_id, score) in enumerate(semantic):
        acc[doc_id] = {
            "semantic_rrf": (1 / (RRF_K + rank + 1)) * semantic_weight,
            "semantic_raw": score,
            "bm25_rrf": 0.0,
            "bm25_raw": 0.0,
        }
    for rank, (doc_id, score) in enumerate(bm25):
        rrf = (1 / (RRF_K + rank + 1)) * bm25_weight
        if doc_id in acc:
            acc[doc_id]["bm25_rrf"] = rrf
            acc[doc_id]["bm25_raw"] = score
        else:
            acc[doc_id] = {
                "semantic_rrf": 0.0,
                "semantic_raw": 0.0,
                "bm25_rrf": rrf,
                "bm25_raw": score,
            }
    combined = []
    for doc_id, d in acc.items():
        boost = 1.0
        if query is not None and meta is not None and doc_id in meta:
            boost = http_boost(query, meta[doc_id].get("name"), meta[doc_id].get("file_path"))
        combined.append(
            (doc_id, (d["semantic_rrf"] + d["bm25_rrf"]) * boost, d["semantic_raw"], d["bm25_raw"])
        )
    combined.sort(key=lambda x: x[1], reverse=True)
    if combined and combined[0][1] > 0:
        mx = combined[0][1]
        combined = [(i, s / mx, a, b) for i, s, a, b in combined]
    return combined


class HybridEngine:
    """BM25 shard actors + mock-embedding cosine search + RRF fusion."""

    def __init__(
        self,
        index_dir: str,
        num_actors: Optional[int] = None,
        semantic_weight: float = 0.7,
        dim: int = 768,
        ann_method: str = "exact",
        lsh_n_bits: int = 8,
        lsh_seed: int = 42,
        lsh_probe_radius: int = 1,
        ivf_n_probe: int = 4,
    ):
        """``ann_method="exact"`` (default) brute-forces cosine over the
        whole embeddings table — the rank-exact reference semantics.
        ``ann_method="lsh"`` is a scale path: it reads ONLY the hive
        partitions (``bucket=<id>/``, written by ``build_embeddings``)
        within ``lsh_probe_radius`` Hamming bits of the query's bucket.
        ``ann_method="ivf"`` probes the ``ivf_n_probe`` cells
        (``ivf_cell=<id>/``) nearest the query, using the centroids
        persisted at build time.  Both keep per-query reads flat as the
        table grows (approximate: recall < 1 by construction)."""
        import os

        from ..state.manifest import normalize_dir

        index_dir = normalize_dir(index_dir)
        self.index_dir = index_dir
        self.semantic_weight = semantic_weight
        self.dim = dim
        self.ann_method = ann_method
        self.lsh_n_bits = lsh_n_bits
        self.lsh_seed = lsh_seed
        self.lsh_probe_radius = lsh_probe_radius
        self.ivf_n_probe = ivf_n_probe
        self.emb_dir = os.path.join(index_dir, "embeddings")
        self.emb_bucketed = os.path.isdir(self.emb_dir) and any(
            f.startswith("bucket=") for f in os.listdir(self.emb_dir)
        )
        self.emb_ivf = os.path.isdir(self.emb_dir) and any(
            f.startswith("ivf_cell=") for f in os.listdir(self.emb_dir)
        )
        self.has_semantic = os.path.isdir(self.emb_dir) and (
            self.emb_bucketed
            or self.emb_ivf
            or any(f.endswith(".parquet") for f in os.listdir(self.emb_dir))
        )
        if ann_method == "lsh" and not self.emb_bucketed:
            raise ValueError(
                "ann_method='lsh' requires a bucket-partitioned embeddings "
                "layout (build_embeddings(partition_by='bucket'))"
            )
        self.ivf_centroids = None
        if ann_method == "ivf":
            cpath = os.path.join(index_dir, "ivf_centroids.parquet")
            if not (self.emb_ivf and os.path.exists(cpath)):
                raise ValueError(
                    "ann_method='ivf' requires an ivf_cell-partitioned "
                    "embeddings layout (build_embeddings(partition_by='ivf'))"
                )
            import numpy as _np
            import pyarrow.parquet as pq

            t = pq.read_table(cpath)
            self.ivf_centroids = _np.stack(
                [_np.asarray(c, dtype=_np.float32) for c in t["centroid"].to_pylist()]
            )
        # spawn the shard-actor pool only after layout validation (a raise
        # above must not leak actors)
        self.bm25 = QueryEngine(index_dir, num_actors=num_actors)

    def close(self):
        self.bm25.close()

    def _probe_dirs(self, qvec: np.ndarray) -> List[str]:
        """Existing ``bucket=`` partition dirs within the query's Hamming
        ball — the only files the LSH path reads."""
        import os

        from ..stages.annsearch import hamming_ball, lsh_signatures

        qn = qvec / max(float(np.linalg.norm(qvec)), 1e-30)
        sig = int(lsh_signatures(qn[None, :], self.lsh_n_bits, self.lsh_seed)[0])
        probes = hamming_ball(sig, self.lsh_n_bits, self.lsh_probe_radius)
        dirs = [os.path.join(self.emb_dir, f"bucket={b}") for b in probes]
        return [d for d in dirs if os.path.isdir(d)]

    def _probe_dirs_ivf(self, qvec: np.ndarray) -> List[str]:
        """Existing ``ivf_cell=`` partition dirs among the query's
        ``ivf_n_probe`` nearest centroids."""
        import os

        qn = qvec / max(float(np.linalg.norm(qvec)), 1e-30)
        order = np.argsort(-(self.ivf_centroids @ qn))[: self.ivf_n_probe]
        dirs = [os.path.join(self.emb_dir, f"ivf_cell={int(c)}") for c in order]
        return [d for d in dirs if os.path.isdir(d)]

    def _probe_files(self, qvec: np.ndarray) -> List[str]:
        import os

        dirs = (
            self._probe_dirs_ivf(qvec)
            if self.ann_method == "ivf"
            else self._probe_dirs(qvec)
        )
        return [
            os.path.join(d, f)
            for d in dirs
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]

    def _semantic_search(
        self, query: str, limit: int, filters: Optional[Dict[str, str]]
    ) -> List[Tuple[int, float]]:
        import ray.data as rd

        from ..stages.annsearch import vector_topk

        qvec = mock_embed_text(enhance_query(query), self.dim)
        if self.ann_method in ("lsh", "ivf"):
            files = self._probe_files(qvec)
            if not files:
                return []
            ds = rd.read_parquet(files)
        else:
            ds = rd.read_parquet(self.emb_dir)
        qvec = qvec[None, :]
        if filters:
            col_map = {"language": "language", "entity_type": "entity_type", "repo_name": "repo_name"}
            import pyarrow.compute as pc

            def filt(t):
                mask = None
                for k, v in filters.items():
                    c = col_map.get(k)
                    if c is None or c not in t.column_names:
                        continue
                    m = pc.equal(t[c], v)
                    mask = m if mask is None else pc.and_(mask, m)
                return t.filter(mask) if mask is not None else t

            ds = ds.map_batches(filt, batch_format="pyarrow")
        tbl = vector_topk(ds, qvec, k=limit, id_column="doc_id", normalize=False)
        return list(zip(tbl["doc_id"].to_pylist(), tbl["score"].to_pylist()))

    def search(
        self,
        query: str,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
        use_hybrid: bool = True,
        semantic_weight: Optional[float] = None,
    ) -> List[dict]:
        weight = self.semantic_weight if semantic_weight is None else semantic_weight
        bm25_hits = [
            (h["doc_id"], h["score"]) for h in self.bm25.search(query, limit * 2, filters)
        ]
        sem_hits: List[Tuple[int, float]] = []
        if use_hybrid and self.has_semantic:
            sem_hits = self._semantic_search(query, limit * 2, filters)
        doc_ids = sorted({d for d, _ in bm25_hits} | {d for d, _ in sem_hits})
        meta: Dict[int, dict] = {}
        if doc_ids:
            import os

            dataset = pads.dataset(os.path.join(self.index_dir, "docmeta"), format="parquet")
            cols = [
                c
                for c in ("doc_id", "name", "file_path", "path", "signature", "docstring")
                if c in dataset.schema.names
            ]
            t = dataset.to_table(columns=cols, filter=pads.field("doc_id").isin(doc_ids))

            def col(name, default=None):
                return (
                    t[name].to_pylist() if name in t.column_names else [default] * len(t)
                )

            fps = col("file_path") if "file_path" in t.column_names else col("path")
            for d, n, f, sig, doc in zip(
                t["doc_id"].to_pylist(), col("name"), fps, col("signature"), col("docstring")
            ):
                meta[d] = {"name": n, "file_path": f, "signature": sig, "docstring": doc}
        fused = rrf_fuse(
            sem_hits, bm25_hits, semantic_weight=weight, query=query, meta=meta
        )
        return [
            {
                "doc_id": d,
                "score": s,
                "semantic_score": a,
                "bm25_score": b,
                "name": meta.get(d, {}).get("name"),
                "file_path": meta.get(d, {}).get("file_path"),
                "signature": meta.get(d, {}).get("signature"),
                "docstring": meta.get(d, {}).get("docstring"),
            }
            for d, s, a, b in fused[:limit]
        ]
