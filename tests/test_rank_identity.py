"""End-to-end rank-identity: distributed build+query vs the vendored oracle.

The oracle (pure single-process BM25Okapi semantics + the reference's
search wrapper) is fed the same canonical doc order — (repo, path, commit)
lexicographic — that the distributed build assigns docIDs from; every query
must produce identical doc_id rankings and scores to 1e-9.
"""

import math

import numpy as np
import pytest

from distributedcodesearchengine_ray.functions.tokenizer import tokenize
from distributedcodesearchengine_ray.pipelines.oracle import BM25Oracle, oracle_search
from distributedcodesearchengine_ray.sources.corpus import (
    SKIP_DIRS,
    SUPPORTED_EXTENSIONS,
    gen_corpus_rows,
    write_corpus,
)

QUERIES = [
    "JSON parsing",
    "parse json",
    "send HTTP request",
    "validate an email address",
    "import return",          # hot terms
    "json json parse",        # duplicated query tokens double-count
    "download file save disk",
    "qzxqzx nonexistent",     # no hits
    "@#$ a",                  # empty after tokenization
    "HTTPClientFactory",
    "merge sorted lists",
]


def _keep(path: str) -> bool:
    if any(path.startswith(d + "/") or f"/{d}/" in path for d in SKIP_DIRS):
        return False
    return any(path.lower().endswith(ext) for ext in SUPPORTED_EXTENSIONS)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    return write_corpus(str(d), n_files=300, seed=42, num_shards=4)


@pytest.fixture(scope="module")
def oracle_docs():
    rows = [r for r in gen_corpus_rows(300, seed=42) if _keep(r["path"])]
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
    return rows


@pytest.fixture(scope="module")
def file_index(ray_session, corpus_dir, tmp_path_factory):
    from distributedcodesearchengine_ray.pipelines.build_index import build_index

    idx = str(tmp_path_factory.mktemp("index_file"))
    manifest = build_index(
        corpus_dir, idx, mode="file", docs_per_partition=40, resume=True
    )
    return idx, manifest


def test_build_stats_match_oracle(file_index, oracle_docs):
    _, manifest = file_index
    corpus_tokens = [tokenize(r["content"]) for r in oracle_docs]
    oracle = BM25Oracle(corpus_tokens)
    assert manifest.n_docs == len(oracle_docs)
    assert manifest.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)
    assert manifest.vocab_size == len(oracle.idf)
    assert manifest.average_idf == pytest.approx(oracle.average_idf, rel=1e-9)


def test_docmeta_sha256_invariant(file_index, oracle_docs):
    import hashlib
    import pyarrow.dataset as pads

    idx, _ = file_index
    meta = (
        pads.dataset(f"{idx}/docmeta", format="parquet")
        .to_table(columns=["doc_id", "repo", "path", "sha256"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(meta) == len(oracle_docs)
    for i, r in enumerate(oracle_docs):
        assert meta["repo"][i] == r["repo"]
        assert meta["path"][i] == r["path"]
        assert meta["sha256"][i] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_rank_identity_file_mode(file_index, oracle_docs):
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = file_index
    corpus_tokens = [tokenize(r["content"]) for r in oracle_docs]
    oracle = BM25Oracle(corpus_tokens)
    engine = QueryEngine(idx, num_actors=3)
    try:
        for q in QUERIES:
            expected = oracle_search(oracle, q, limit=20)
            got = engine.search(q, limit=20)
            assert [h["doc_id"] for h in got] == [d for d, _ in expected], f"query={q!r}"
            np.testing.assert_allclose(
                [h["score"] for h in got], [s for _, s in expected], rtol=1e-9,
                err_msg=f"query={q!r}",
            )
    finally:
        engine.close()


def test_rank_identity_with_filters(file_index, oracle_docs):
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = file_index
    corpus_tokens = [tokenize(r["content"]) for r in oracle_docs]
    oracle = BM25Oracle(corpus_tokens)
    meta = [{"language": r["lang"], "repo_name": r["repo"]} for r in oracle_docs]
    engine = QueryEngine(idx, num_actors=2)
    try:
        for q, filt in [
            ("parse json", {"language": "python"}),
            ("send HTTP request", {"language": "go"}),
            ("parse json", {"repo_name": "org1/repo1"}),
            ("import return", {"language": "rust"}),
        ]:
            expected = oracle_search(oracle, q, limit=20, doc_meta=meta, filters=filt)
            got = engine.search(q, limit=20, filters=filt)
            assert [h["doc_id"] for h in got] == [d for d, _ in expected], f"{q!r} {filt}"
            np.testing.assert_allclose(
                [h["score"] for h in got], [s for _, s in expected], rtol=1e-9
            )
    finally:
        engine.close()


def test_sample_driver_shortcut_same_boundaries(
    ray_session, corpus_dir, tmp_path_factory, monkeypatch
):
    """The driver-side boundary sample (small corpora) and the distributed
    sample pipeline must produce identical partition boundaries — the
    sampled set is hash-defined, not path-dependent."""
    from distributedcodesearchengine_ray.pipelines import build_index as BI

    idx_a = str(tmp_path_factory.mktemp("index_samp_a"))
    m_small = BI.build_index(corpus_dir, idx_a, mode="file", docs_per_partition=40)
    monkeypatch.setattr(BI, "SMALL_SAMPLE_DRIVER_ROWS", 0)
    idx_b = str(tmp_path_factory.mktemp("index_samp_b"))
    m_dist = BI.build_index(corpus_dir, idx_b, mode="file", docs_per_partition=40)
    assert m_small.boundaries == m_dist.boundaries
    assert m_small.build_id == m_dist.build_id


def test_resume_skips_completed_partitions(ray_session, corpus_dir, tmp_path_factory):
    import os

    from distributedcodesearchengine_ray.pipelines.build_index import build_index

    idx = str(tmp_path_factory.mktemp("index_resume"))
    m1 = build_index(corpus_dir, idx, mode="file", docs_per_partition=40)
    mtimes = {
        f: os.path.getmtime(os.path.join(idx, "postings", f))
        for f in os.listdir(os.path.join(idx, "postings"))
    }
    # simulate a crash that lost one partition (data + lineage)
    lost = sorted(mtimes)[0]
    pid = int(lost.split("-")[1].split(".")[0])
    os.remove(os.path.join(idx, "postings", lost))
    os.remove(os.path.join(idx, "lineage", f"part-{pid:05d}.json"))

    m2 = build_index(corpus_dir, idx, mode="file", docs_per_partition=40)
    assert m2.n_docs == m1.n_docs
    assert m2.build_id == m1.build_id
    assert os.path.exists(os.path.join(idx, "postings", lost))
    for f, t in mtimes.items():
        if f != lost:
            assert os.path.getmtime(os.path.join(idx, "postings", f)) == t, (
                "completed partition was rebuilt"
            )


def test_resume_rebuilds_when_data_file_missing_but_lineage_stale(
    ray_session, corpus_dir, tmp_path_factory
):
    """A partition whose data file vanished but whose lineage record
    survives (e.g. manual deletion) must be REBUILT, not skipped."""
    import os

    from distributedcodesearchengine_ray.pipelines.build_index import build_index

    idx = str(tmp_path_factory.mktemp("index_stale"))
    m1 = build_index(corpus_dir, idx, mode="file", docs_per_partition=40)
    lost = sorted(os.listdir(os.path.join(idx, "postings")))[1]
    os.remove(os.path.join(idx, "postings", lost))  # lineage left in place

    m2 = build_index(corpus_dir, idx, mode="file", docs_per_partition=40)
    assert m2.n_docs == m1.n_docs and m2.build_id == m1.build_id
    assert os.path.exists(os.path.join(idx, "postings", lost))


def test_hot_term_lexicon_matches_oracle(file_index, oracle_docs):
    """Zipf-hot terms ('import' appears in most docs): the bucketed lexicon
    merge must produce the exact global df and eps-floored idf."""
    from distributedcodesearchengine_ray.pipelines.query import LexiconReader

    idx, manifest = file_index
    corpus_tokens = [tokenize(r["content"]) for r in oracle_docs]
    oracle = BM25Oracle(corpus_tokens)
    reader = LexiconReader(idx)
    for term in ("import", "return", "json", "func", "self"):
        if term not in oracle.idf:
            continue
        got = reader.idfs([term])[term]
        assert got == pytest.approx(oracle.idf[term], rel=1e-9), term


def test_staging_invalidation_on_param_change(ray_session, corpus_dir, tmp_path_factory):
    """A build with different params must not reuse the old staging or
    lineage (different build_id)."""
    import os

    from distributedcodesearchengine_ray.pipelines.build_index import build_index

    idx = str(tmp_path_factory.mktemp("index_inval"))
    m1 = build_index(corpus_dir, idx, mode="file", docs_per_partition=40)
    m2 = build_index(corpus_dir, idx, mode="file", docs_per_partition=40, k1=1.2)
    assert m2.build_id != m1.build_id
    assert m2.n_docs == m1.n_docs
    # lost staging marker => staging rebuilt, then build succeeds
    os.remove(os.path.join(idx, "_PARTED.json"))
    m3 = build_index(corpus_dir, idx, mode="file", docs_per_partition=40, k1=1.2)
    assert m3.build_id == m2.build_id
    assert m3.n_docs == m2.n_docs


def test_rank_identity_k12_preset(ray_session, corpus_dir, oracle_docs, tmp_path_factory):
    """north_star parameters (k1=1.2, b=0.75): config plumbs through the
    whole build+query path and still matches the oracle exactly."""
    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx = str(tmp_path_factory.mktemp("index_k12"))
    build_index(corpus_dir, idx, mode="file", docs_per_partition=60, k1=1.2)
    corpus_tokens = [tokenize(r["content"]) for r in oracle_docs]
    oracle = BM25Oracle(corpus_tokens, k1=1.2)
    engine = QueryEngine(idx, num_actors=2)
    try:
        for q in ("parse json", "send HTTP request", "import return"):
            expected = oracle_search(oracle, q, limit=15)
            got = engine.search(q, limit=15)
            assert [h["doc_id"] for h in got] == [d for d, _ in expected], q
            np.testing.assert_allclose(
                [h["score"] for h in got], [s for _, s in expected], rtol=1e-9
            )
    finally:
        engine.close()


def test_rebuild_smaller_corpus_clears_stale_partitions(ray_session, tmp_path_factory):
    """Rebuilding a SMALLER corpus into an existing index dir must not leak
    the old build's partition files into the lexicon (regression: stale
    df > n_docs made idf NaN) or docmeta."""
    import math
    import os

    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.query import LexiconReader, QueryEngine

    big = write_corpus(str(tmp_path_factory.mktemp("big")), n_files=400, seed=42, num_shards=4)
    small = write_corpus(str(tmp_path_factory.mktemp("small")), n_files=60, seed=42, num_shards=1)
    idx = str(tmp_path_factory.mktemp("idx_reb"))
    m1 = build_index(big, idx, mode="file", docs_per_partition=40)
    n_parts_before = len(os.listdir(os.path.join(idx, "postings")))
    m2 = build_index(small, idx, mode="file", docs_per_partition=40)
    assert m2.n_docs < m1.n_docs
    assert len(os.listdir(os.path.join(idx, "postings"))) < n_parts_before
    idf = LexiconReader(idx).idfs(["json"])["json"]
    assert math.isfinite(idf)
    # and queries still rank-identically vs a fresh oracle of the small corpus
    rows = [r for r in gen_corpus_rows(60, seed=42) if _keep(r["path"])]
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
    oracle = BM25Oracle([tokenize(r["content"]) for r in rows])
    engine = QueryEngine(idx, num_actors=2)
    try:
        expected = oracle_search(oracle, "parse json", limit=10)
        got = engine.search("parse json", limit=10)
        assert [h["doc_id"] for h in got] == [d for d, _ in expected]
    finally:
        engine.close()


def test_search_rm3_matches_oracle(file_index, oracle_docs):
    """Pseudo-relevance-feedback identity: engine.search_rm3 == oracle
    RM3 (BM25 top-fb_k feedback docs -> top-n_exp non-query terms by
    1e-6-quantized integer-summed tf*idf, weight-desc/term-asc tie-break,
    expanded query re-ranked with full reference search semantics)."""
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = file_index
    oracle = BM25Oracle([tokenize(r["content"]) for r in oracle_docs])
    engine = QueryEngine(idx, num_actors=2)
    try:
        for query, fb_k, n_exp in (
            ("JSON parsing", 5, 5),
            ("send HTTP request", 10, 10),
            ("merge sorted lists", 3, 8),
        ):
            orig = tokenize(query)
            orig_set = set(orig)
            fb = oracle_search(oracle, query, limit=fb_k)
            weights = {}
            for d, _s in fb:
                tf = {}
                for t in tokenize(oracle_docs[d]["content"]):
                    if t not in orig_set:
                        tf[t] = tf.get(t, 0) + 1
                for t, n in tf.items():
                    weights[t] = weights.get(t, 0) + math.floor(
                        n * oracle.idf.get(t, 0.0) * 1e6 + 0.5
                    )
            exp = [t for _, t in sorted((-w, t) for t, w in weights.items())[:n_exp]]
            expected = oracle_search(oracle, " ".join(orig + exp), limit=15)
            got = engine.search_rm3(query, limit=15, fb_k=fb_k, n_exp=n_exp)
            assert [h["doc_id"] for h in got] == [d for d, _ in expected], query
            np.testing.assert_allclose(
                [h["score"] for h in got], [s for _, s in expected], rtol=1e-9
            )
    finally:
        engine.close()


def test_snippets_match_bruteforce(file_index, oracle_docs):
    """Best-window snippet identity: engine.snippets == O(n*w) rescan
    truth (max distinct query terms per window, earliest-start ties) on
    the real code corpus, plus ranking/score identity to plain search."""
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = file_index
    engine = QueryEngine(idx, num_actors=2)
    try:
        for query, window in (("parse json", 8), ("send HTTP request", 12)):
            qset = set(tokenize(query))
            got = engine.snippets(query, limit=10, window=window)
            plain = engine.search(query, limit=10)
            assert [h["doc_id"] for h in got] == [h["doc_id"] for h in plain]
            assert any(h["n_terms"] > 0 for h in got)  # real matches exercised
            for h in got:
                toks = tokenize(oracle_docs[h["doc_id"]]["content"])
                n_starts = max(1, len(toks) - window + 1)
                counts = [
                    len(qset & set(toks[i : i + window])) for i in range(n_starts)
                ]
                best = max(range(n_starts), key=lambda i: (counts[i], -i))
                assert (h["win_start"], h["n_terms"]) == (best, counts[best]), h
                assert h["snippet"] == " ".join(
                    toks[h["win_start"] : h["win_start"] + window]
                )
    finally:
        engine.close()


def test_more_like_this_matches_oracle(file_index, oracle_docs):
    """Find-similar identity: engine.more_like_this == oracle MLT
    (top-25 tf*idf terms of the source doc, eps-floored idf, term-asc
    tie-break, re-ranked via full reference search semantics, source
    excluded)."""
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = file_index
    oracle = BM25Oracle([tokenize(r["content"]) for r in oracle_docs])
    engine = QueryEngine(idx, num_actors=2)
    try:
        for src in (0, 7, len(oracle_docs) // 2):
            tf = {}
            for t in tokenize(oracle_docs[src]["content"]):
                tf[t] = tf.get(t, 0) + 1
            ranked = sorted(
                # quantized to 1e-6 like the engine (stable term cut)
                ((math.floor(tf[t] * oracle.idf.get(t, 0.0) * 1e6 + 0.5), t)
                 for t in tf),
                key=lambda wt: (-wt[0], wt[1]),
            )
            terms = [t for _, t in ranked[:25]]
            expected = [
                (d, s)
                for d, s in oracle_search(oracle, " ".join(terms), limit=16)
                if d != src
            ][:15]
            got = engine.more_like_this(src, limit=15)
            assert [h["doc_id"] for h in got] == [d for d, _ in expected], src
            np.testing.assert_allclose(
                [h["score"] for h in got], [s for _, s in expected], rtol=1e-9
            )
    finally:
        engine.close()
