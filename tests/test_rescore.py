"""ES rescore (`QueryEngine.search_rescore`) vs the vendored BM25Oracle:
primary top-window through full reference search semantics (threshold
included), secondary scores RAW from `BM25Oracle.get_scores` (no
threshold — exactly the `IndexShard.scores_for` contract), combined on
the driver.  Also covers `scores_for` edge cases (ids owned by no shard,
empty window, empty secondary query)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributedcodesearchengine_ray.functions.tokenizer import tokenize
from distributedcodesearchengine_ray.pipelines.oracle import BM25Oracle, oracle_search
from distributedcodesearchengine_ray.sources.corpus import (
    SKIP_DIRS,
    SUPPORTED_EXTENSIONS,
    gen_corpus_rows,
    write_corpus,
)

PRIMARY_Q = "parse json data"
SECONDARY_Q = "send http request"


def _keep(path: str) -> bool:
    if any(path.startswith(d + "/") or f"/{d}/" in path for d in SKIP_DIRS):
        return False
    return any(path.lower().endswith(ext) for ext in SUPPORTED_EXTENSIONS)


@pytest.fixture(scope="module")
def rescore_setup(ray_session, tmp_path_factory):
    from distributedcodesearchengine_ray.pipelines.build_index import build_index

    corpus = write_corpus(
        str(tmp_path_factory.mktemp("corpus")), n_files=200, seed=23, num_shards=2
    )
    idx = str(tmp_path_factory.mktemp("index"))
    build_index(corpus, idx, mode="file", docs_per_partition=40, resume=False)
    rows = [r for r in gen_corpus_rows(200, seed=23) if _keep(r["path"])]
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
    oracle = BM25Oracle([tokenize(r["content"]) for r in rows])
    return idx, oracle


def test_rescore_matches_oracle(rescore_setup):
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, oracle = rescore_setup
    window, qw, rw, limit = 30, 1.0, 2.0, 10
    # oracle: thresholded primary window + RAW secondary scores
    prim = oracle_search(oracle, PRIMARY_Q, limit=window)
    sec_raw = oracle.get_scores(tokenize(SECONDARY_Q))
    want = sorted(
        ({"doc_id": d, "score": qw * s + rw * float(sec_raw[d])} for d, s in prim),
        key=lambda r: (-r["score"], r["doc_id"]),
    )[:limit]
    engine = QueryEngine(idx, num_actors=2)
    try:
        got = engine.search_rescore(
            PRIMARY_Q, SECONDARY_Q,
            window=window, query_weight=qw, rescore_weight=rw, limit=limit,
        )
    finally:
        engine.close()
    assert [g["doc_id"] for g in got] == [w["doc_id"] for w in want]
    np.testing.assert_allclose(
        [g["score"] for g in got], [w["score"] for w in want], rtol=1e-9
    )
    # at least one window doc must carry a nonzero secondary contribution,
    # otherwise this test degenerates to plain search
    assert any(sec_raw[d] > 0 for d, _ in prim)


def test_rescore_edge_cases(rescore_setup):
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = rescore_setup
    engine = QueryEngine(idx, num_actors=2)
    try:
        # empty secondary query -> pure primary order at qw scaling
        got = engine.search_rescore(PRIMARY_Q, "", window=20, limit=5)
        prim = engine.search(PRIMARY_Q, limit=20)[:5]
        assert [g["doc_id"] for g in got] == [p["doc_id"] for p in prim]
        # empty primary -> []
        assert engine.search_rescore("", PRIMARY_Q, window=20, limit=5) == []
        # scores_for with ids nobody owns -> empty, no error
        import ray

        toks, idfs = ["parse"], engine.lexicon.idfs(["parse"])
        for a in engine.actors:
            ids, scores = ray.get(
                a.scores_for.remote(toks, idfs, [10**12, 10**12 + 1])
            )
            assert ids == [] and scores == []
    finally:
        engine.close()
