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
        self.N = sum(m.n_docs for m in self.manifests)
        total_tokens = sum(m.total_tokens for m in self.manifests)
        self.avgdl = total_tokens / self.N if self.N else 0.0
        self.eps = 0.25 * self._union_average_idf(dirs)
        self.engines = [
            QueryEngine(d, num_actors=num_actors_each, avgdl_override=self.avgdl)
            for d in dirs
        ]
        self.id_maps = list(id_maps)

    def _union_average_idf(self, dirs: Sequence[str]) -> float:
        """Mean raw idf over the UNION vocabulary: distributed term-keyed
        df merge across all sub-index lexicons, then per-block idf_raw
        partial sums (the build's exact expression) folded on the
        driver.  Terms are co-bucketed by the same hash in every
        sub-index, but the groupby does not rely on that — it is one
        vocabulary-sized exchange, independent of corpus size."""
        import ray.data as rd
        from ray.data.aggregate import Sum

        paths = [
            os.path.join(d, "lexicon", f)
            for d in dirs
            for f in sorted(os.listdir(os.path.join(d, "lexicon")))
            if f.endswith(".parquet")
        ]
        n = float(self.N)

        def partial(t: pa.Table) -> pa.Table:
            df = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
            raw = np.log(n - df + 0.5) - np.log(df + 0.5)
            return pa.table(
                {
                    "s": pa.array([float(raw.sum())], pa.float64()),
                    "c": pa.array([len(raw)], pa.int64()),
                }
            )

        parts = (
            rd.read_parquet(paths, columns=["term", "df"])
            .groupby("term")
            .aggregate(Sum("df", alias_name="df"))
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()
        )
        vocab = int(parts["c"].sum())
        return float(parts["s"].sum()) / vocab if vocab else 0.0

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
