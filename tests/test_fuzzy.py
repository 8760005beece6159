"""Fuzzy search (Levenshtein term expansion + BM25) vs a brute-force
expansion oracle built from the lexicon, plus method routing."""

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/rcs_fuzzy"


@pytest.fixture(scope="module")
def fuzzy_index(ray_session):
    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.sources.corpus import write_corpus

    shutil.rmtree(BASE, ignore_errors=True)
    write_corpus(f"{BASE}/corpus", n_files=200, seed=11, num_shards=2)
    build_index(
        f"{BASE}/corpus", f"{BASE}/idx", mode="entity",
        docs_per_partition=60, resume=False,
    )
    return f"{BASE}/idx"


def _brute_expand(index_dir, token, max_dist, cap):
    """Independent expansion oracle: full lexicon scan + uncapped DP,
    ranked (dist asc, df desc, term asc), capped."""
    import pyarrow.dataset as pads

    def lev(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    t = pads.dataset(os.path.join(index_dir, "lexicon"), format="parquet").to_table(
        columns=["term", "df"]
    )
    rows = [
        (term, int(df), lev(token, term))
        for term, df in zip(t["term"].to_pylist(), t["df"].to_pylist())
        if lev(token, term) <= max_dist
    ]
    rows.sort(key=lambda r: (r[2], -r[1], r[0]))
    return [r[0] for r in rows[:cap]]


def test_fuzzy_matches_expanded_plain_search(fuzzy_index):
    """search_fuzzy == plain search over the brute-force-expanded terms."""
    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    engine = QueryEngine(fuzzy_index, num_actors=2)
    try:
        for query in ("parsejson dta", "htpp requst", "sendx"):
            expanded = []
            for tok in tokenize(query):
                expanded.extend(_brute_expand(fuzzy_index, tok, 1, 50))
            expect = (
                engine.search(" ".join(expanded), limit=10) if expanded else []
            )
            got = engine.search_fuzzy(query, limit=10, max_dist=1, max_expansions=50)
            assert [(h["doc_id"], round(h["score"], 9)) for h in got] == [
                (h["doc_id"], round(h["score"], 9)) for h in expect
            ], query
    finally:
        engine.close()


def test_fuzzy_method_routing_and_facade(fuzzy_index):
    """method="fuzzy" routes through expansion (engine facade + CLI path),
    and exact-term queries degrade to (at least) the exact results."""
    from distributedcodesearchengine_ray.engine import CodeSearchEngine
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    qe = QueryEngine(fuzzy_index, num_actors=2)
    try:
        via_method = qe.search("parsejson dta", limit=5, method="fuzzy")
        direct = qe.search_fuzzy("parsejson dta", limit=5)
        assert [h["doc_id"] for h in via_method] == [h["doc_id"] for h in direct]
        assert via_method, "typo'd query should still match via expansion"
    finally:
        qe.close()

    eng = CodeSearchEngine(fuzzy_index)
    try:
        hits = eng.search("parsejson dta", limit=5, method="fuzzy")
        assert hits and all("path" in h for h in hits)
    finally:
        eng.close()


def test_fuzzy_empty_expansion_returns_nothing(fuzzy_index):
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    engine = QueryEngine(fuzzy_index, num_actors=2)
    try:
        assert engine.search_fuzzy("zzqqxxyyww", limit=5) == []
    finally:
        engine.close()
