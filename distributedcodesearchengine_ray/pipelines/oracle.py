"""Vendored, dependency-free oracle for BM25 rank-identity tests.

Reimplements — from the public ``rank_bm25`` package's documented BM25Okapi
algorithm (pinned by the reference at ``requirements.txt:29``) and the
reference's search wrapper (``/root/reference/codesearch/storage/
bm25_index.py:117-170``) — the exact single-process semantics the distributed
engine must reproduce:

* corpus stats: N, per-doc lengths, avgdl;
* ``idf(t) = ln(N - df + 0.5) - ln(df + 0.5)`` with the epsilon floor:
  negative idfs are replaced by ``epsilon * average_idf`` where
  ``average_idf`` is the mean of the *raw* idfs over the vocabulary;
* per-query-token accumulation (duplicate query tokens count twice):
  ``score(d) += idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*len(d)/avgdl))``;
* unknown terms contribute 0 (``idf.get(q) or 0`` — note ``or``: an exact
  0.0 idf also yields 0);
* score threshold: drop docs with ``score < max(scores)*0.01`` when
  ``max > 0``, keep everything otherwise;
* metadata filters applied AFTER scoring (they never change idf/avgdl);
* stable sort by score desc => ties break by ascending insertion-order
  docID; truncate to ``limit``.

This is the ground truth for ``tests/test_rank_identity.py``.  It is pure
NumPy float64 so the distributed scorer can match it bit-for-bit (modulo the
``average_idf`` reduction order, asserted to 1e-9).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..functions.tokenizer import tokenize

DEFAULT_K1 = 1.5
DEFAULT_B = 0.75
DEFAULT_EPSILON = 0.25


class BM25Oracle:
    """Exact reference-semantics BM25 over a token-list corpus."""

    def __init__(
        self,
        corpus_tokens: Sequence[List[str]],
        k1: float = DEFAULT_K1,
        b: float = DEFAULT_B,
        epsilon: float = DEFAULT_EPSILON,
    ):
        self.k1 = k1
        self.b = b
        self.epsilon = epsilon
        self.corpus_size = len(corpus_tokens)
        self.doc_len = np.array([len(d) for d in corpus_tokens], dtype=np.float64)
        self.avgdl = float(self.doc_len.sum() / self.corpus_size) if self.corpus_size else 0.0
        # term -> df, in first-occurrence order (mirrors the package's dict)
        nd: Dict[str, int] = {}
        self.doc_freqs: List[Dict[str, int]] = []
        for doc in corpus_tokens:
            freqs: Dict[str, int] = {}
            for w in doc:
                freqs[w] = freqs.get(w, 0) + 1
            self.doc_freqs.append(freqs)
            for w in freqs:
                nd[w] = nd.get(w, 0) + 1
        self.df = nd
        self.idf: Dict[str, float] = {}
        if nd:
            idf_sum = 0.0
            negative = []
            for w, f in nd.items():
                v = math.log(self.corpus_size - f + 0.5) - math.log(f + 0.5)
                self.idf[w] = v
                idf_sum += v
                if v < 0:
                    negative.append(w)
            self.average_idf = idf_sum / len(self.idf)
            eps = self.epsilon * self.average_idf
            for w in negative:
                self.idf[w] = eps
        else:
            self.average_idf = 0.0

    def get_scores(self, query_tokens: List[str]) -> np.ndarray:
        score = np.zeros(self.corpus_size)
        doc_len = self.doc_len
        for q in query_tokens:
            q_freq = np.array([(d.get(q) or 0) for d in self.doc_freqs], dtype=np.float64)
            score = score + (self.idf.get(q) or 0) * (
                q_freq
                * (self.k1 + 1)
                / (q_freq + self.k1 * (1 - self.b + self.b * doc_len / self.avgdl))
            )
        return score


def oracle_search(
    oracle: BM25Oracle,
    query: str,
    limit: int = 20,
    doc_meta: Optional[Sequence[dict]] = None,
    filters: Optional[Dict[str, str]] = None,
) -> List[Tuple[int, float]]:
    """Full reference search semantics -> [(doc_id, score)] ranked.

    ``doc_meta[i]`` (optional) supplies filterable fields (``language``,
    ``entity_type``, ``repo_name``) for insertion-order doc i.
    """
    if oracle.corpus_size == 0:
        return []
    query_tokens = tokenize(query)
    if not query_tokens:
        return []
    scores = oracle.get_scores(query_tokens)
    min_score = (
        scores.max() * 0.01 if len(scores) > 0 and scores.max() > 0 else float("-inf")
    )
    results: List[Tuple[int, float]] = []
    for idx in range(len(scores)):
        s = float(scores[idx])
        if s < min_score:
            continue
        if filters and doc_meta is not None:
            meta = doc_meta[idx]
            if "language" in filters and meta.get("language") != filters["language"]:
                continue
            if (
                "entity_type" in filters
                and meta.get("entity_type") != filters["entity_type"]
            ):
                continue
            if "repo_name" in filters and meta.get("repo_name") != filters["repo_name"]:
                continue
        results.append((idx, s))
    results.sort(key=lambda x: x[1], reverse=True)  # stable => docID tie-break
    return results[:limit]
