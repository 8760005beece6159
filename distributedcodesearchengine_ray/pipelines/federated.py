"""Federated scatter-gather search across independently-built indexes.

Multiple sub-indexes (think: separate clusters, or per-tenant /
per-time-range index builds) answer one query AS IF a single index had
been built over the union corpus:

- scalar stats (``N``, ``total_tokens`` -> global avgdl) recombine from
  the manifests — two numbers per sub-index cross the boundary;
- the BM25Okapi epsilon floor recombines with ONE union-vocabulary fold
  over the sub-index lexicons (term-keyed df merge -> ``idf_raw``
  partial sums, the same numeric pattern as
  ``build_index._lexicon_pass``) — cost scales with vocabulary, never
  corpus, paid once per federation handle, cached on the instance;
- per-query term dfs merge from the per-index lexicon ``stats`` reads
  (bucket-hash + predicate pushdown, a few KB per query);
- every sub-index's shard actors score with the INJECTED global idfs
  and global avgdl (``IndexShard.avgdl_override``), and the driver
  applies the reference's global ``max*0.01`` threshold — including the
  ``max<=0`` keep-all branch — then merges on ``(-score, global doc_id)``.

Score identity: a doc's BM25 depends only on (idf, avgdl, k1, b, dl,
tf), all of which equal the union build's values, so federated results
are score-identical to a single index over the union corpus.  The
driver contract proves this against the whole-corpus SQL oracle
(``federated_search`` shares ``bm25_topk``'s oracle).

Reference provenance: the reference holds ONE in-memory BM25Index
(``codesearch/search/bm25_index.py``); federation is the scale-out a
multi-cluster deployment needs — no postings movement, no rebuild.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa

from ..functions.tokenizer import tokenize
from ..state.manifest import IndexManifest, normalize_dir
from .query import QueryEngine


class FederatedEngine:
    """Search N sub-indexes as one logical index (exact global stats).

    ``id_maps`` translates each sub-index's LOCAL insertion-order doc id
    into the caller's global id space (federation does not require the
    sub-corpora to know about each other; the caller knows how they were
    split).  Tie-breaks use the mapped global id, matching the union
    build's insertion order.
    """

    def __init__(
        self,
        index_dirs: Sequence[str],
        id_maps: Sequence[Callable[[int], int]],
        num_actors_each: int = 2,
    ):
        if len(index_dirs) != len(id_maps):
            raise ValueError("one id_map per index_dir")
        dirs = [normalize_dir(d) for d in index_dirs]
        self.manifests = [IndexManifest.load(d) for d in dirs]
        # Score identity requires every sub-index to score with the same
        # BM25 parameters and document mode — same contract merge_indexes
        # enforces (build_index.py merge preconditions).  Federating
        # mismatched builds would silently blend incompatible score
        # spaces, so fail loudly instead.
        m0 = self.manifests[0]
        for m, d in zip(self.manifests[1:], dirs[1:]):
            if (m.k1, m.b, m.epsilon, m.mode) != (m0.k1, m0.b, m0.epsilon, m0.mode):
                raise ValueError(
                    f"sub-index parameter mismatch: {d} has "
                    f"(k1={m.k1}, b={m.b}, epsilon={m.epsilon}, mode={m.mode}) "
                    f"vs (k1={m0.k1}, b={m0.b}, epsilon={m0.epsilon}, mode={m0.mode})"
                )
        self.N = sum(m.n_docs for m in self.manifests)
        total_tokens = sum(m.total_tokens for m in self.manifests)
        self.avgdl = total_tokens / self.N if self.N else 0.0
        self.eps = m0.epsilon * self._union_average_idf(dirs)
        self.engines = [
            QueryEngine(d, num_actors=num_actors_each, avgdl_override=self.avgdl)
            for d in dirs
        ]
        self.id_maps = list(id_maps)

    def _union_average_idf(self, dirs: Sequence[str]) -> float:
        """Mean raw idf over the UNION vocabulary, BIT-IDENTICAL to what a
        single union build's ``_lexicon_pass`` would produce.

        Every sub-index bucketed its lexicon with the same term hash and
        ``LEX_BUCKETS``, so bucket b of the union vocabulary is exactly
        the union of each sub-index's bucket-b file.  One task per bucket
        merges the integer dfs per term (exact, order-free), sorts by
        term, and computes the numpy pairwise idf_raw sum over the sorted
        array — the identical expression, array order, and summation
        ``_lexicon_pass.lex_bucket`` uses — and the driver folds the
        per-bucket partials in bucket order, matching its
        ``sum(s for s, _ in partials)``.  Cost scales with vocabulary,
        never corpus size."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray

        from .build_index import LEX_BUCKETS

        n_union = self.N

        @ray.remote(num_cpus=1)
        def bucket_partial(b: int) -> tuple:
            if pa.cpu_count() != 1:
                pa.set_cpu_count(1)
            files = [
                p
                for d in dirs
                if os.path.exists(p := os.path.join(d, "lexicon", f"bucket-{b:04d}.parquet"))
            ]
            if not files:
                return 0.0, 0
            tbl = pa.concat_tables(
                pq.read_table(f, columns=["term", "df"]) for f in files
            )
            dict_arr = pc.dictionary_encode(tbl["term"].combine_chunks())
            if isinstance(dict_arr, pa.ChunkedArray):
                dict_arr = dict_arr.combine_chunks()
            codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            dfs = tbl["df"].to_numpy(zero_copy_only=False)
            agg = np.bincount(codes, weights=dfs).astype(np.int64)
            order = pc.sort_indices(dict_arr.dictionary).to_numpy(zero_copy_only=False)
            agg = agg[order]
            idf_raw = np.log(n_union - agg.astype(np.float64) + 0.5) - np.log(
                agg.astype(np.float64) + 0.5
            )
            return float(idf_raw.sum()), int(len(agg))

        partials = ray.get([bucket_partial.remote(b) for b in range(LEX_BUCKETS)])
        vocab = int(sum(c for _, c in partials))
        return float(sum(s for s, _ in partials)) / vocab if vocab else 0.0

    def _global_idfs(self, toks: List[str]) -> Dict[str, float]:
        dfs: Dict[str, int] = {}
        for e in self.engines:
            for t, (df, _idf) in e.lexicon.stats(toks).items():
                dfs[t] = dfs.get(t, 0) + df
        out: Dict[str, float] = {}
        for t in set(toks):
            df = dfs.get(t, 0)
            if df <= 0:
                out[t] = 0.0  # absent everywhere: contributes nothing
                continue
            raw = math.log(self.N - df + 0.5) - math.log(df + 0.5)
            out[t] = self.eps if raw < 0 else raw
        return out

    def search(
        self,
        query: str,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """One scatter-gather round over every sub-index's shard actors
        with the global idfs/avgdl; reference threshold + merge on the
        driver.  Wire cost: ``sum(shards) x limit`` candidate rows."""
        import ray

        toks = tokenize(query)
        if not toks:
            return []
        q_idfs = self._global_idfs(toks)
        refs, owners = [], []
        for ei, e in enumerate(self.engines):
            for a in e.actors:
                refs.append(
                    a.search.remote(toks, q_idfs, limit, filters, False,
                                    "dense", None, None)
                )
                owners.append(ei)
        parts = ray.get(refs)
        global_max = max((m for m, _ in parts), default=0.0)
        scored: List[tuple] = []
        if global_max > 0:
            min_score = global_max * 0.01
            for ei, (_, rs) in zip(owners, parts):
                m = self.id_maps[ei]
                scored.extend(
                    (r["score"], m(int(r["doc_id"])))
                    for r in rs
                    if r["score"] >= min_score
                )
        else:
            # reference keeps everything when max <= 0: dense fallback
            refs2, owners2 = [], []
            for ei, e in enumerate(self.engines):
                for a in e.actors:
                    refs2.append(
                        a.search.remote(toks, q_idfs, limit, filters, True,
                                        "dense", None, None)
                    )
                    owners2.append(ei)
            for ei, (_, rs) in zip(owners2, ray.get(refs2)):
                m = self.id_maps[ei]
                scored.extend((r["score"], m(int(r["doc_id"]))) for r in rs)
        scored.sort(key=lambda r: (-r[0], r[1]))
        return [{"doc_id": d, "score": s} for s, d in scored[:limit]]

    def close(self) -> None:
        for e in self.engines:
            e.close()
        self.engines = []
