"""Randomized rank-identity stress: adversarial mini-corpora (empty docs,
punctuation-only docs, hot terms in >50% of docs => negative idf + eps
floor, duplicated query terms, unicode) must still match the oracle
exactly."""

import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from distributedcodesearchengine_ray.functions.tokenizer import tokenize
from distributedcodesearchengine_ray.pipelines.oracle import BM25Oracle, oracle_search

VOCAB = [
    "parse", "json", "data", "http", "request", "send", "x", "import",
    "return", "self", "func", "merge", "sort", "v2", "HTTPClient",
    "snake_case", "camelCaseIdent", "@#$%", "...", "héllo", "a1", "zz9",
]


def _random_corpus(rng: random.Random, n_docs: int):
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for i in range(n_docs):
        kind = rng.random()
        if kind < 0.05:
            content = ""  # empty doc (len 0 enters N and avgdl)
        elif kind < 0.10:
            content = "@#$ !!! ..."  # tokenizes to nothing
        else:
            k = rng.randint(1, 40)
            words = rng.choices(VOCAB, k=k)
            if rng.random() < 0.6:  # hot-term skew
                words += ["import"] * rng.randint(1, 5)
            content = " ".join(words)
        rows["repo"].append(f"org{i % 3}/repo{i % 2}")
        rows["path"].append(f"src/f{i:04d}.py")
        rows["commit"].append("c" * 40)
        rows["lang"].append("python")
        rows["content"].append(content)
    return pa.table(rows)


def _random_queries(rng: random.Random):
    qs = []
    for _ in range(8):
        k = rng.randint(1, 4)
        words = rng.choices(VOCAB + ["qqqmissing"], k=k)
        if rng.random() < 0.3:
            words.append(words[0])  # duplicate query token
        qs.append(" ".join(words))
    qs += ["", "@#$", "import import import"]
    return qs


@pytest.mark.parametrize("seed", [7, 99, 1234, 31337])
def test_random_corpus_rank_identity(ray_session, tmp_path, seed):
    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    rng = random.Random(seed)
    n_docs = rng.randint(20, 80)
    table = _random_corpus(rng, n_docs)
    corpus = tmp_path / f"corpus{seed}"
    corpus.mkdir()
    pq.write_table(table, str(corpus / "part-0.parquet"))

    idx = str(tmp_path / f"idx{seed}")
    build_index(
        str(corpus), idx, mode="file",
        docs_per_partition=max(5, n_docs // 4), apply_path_filters=False,
    )

    order = sorted(
        range(n_docs),
        key=lambda i: (
            table["repo"][i].as_py(), table["path"][i].as_py(), table["commit"][i].as_py()
        ),
    )
    corpus_tokens = [tokenize(table["content"][i].as_py()) for i in order]
    oracle = BM25Oracle(corpus_tokens)

    engine = QueryEngine(idx, num_actors=2)
    try:
        for q in _random_queries(rng):
            expected = oracle_search(oracle, q, limit=15)
            for method in ("dense", "wand"):
                got = engine.search(q, limit=15, method=method)
                assert [h["doc_id"] for h in got] == [d for d, _ in expected], (
                    f"seed={seed} q={q!r} method={method}"
                )
                np.testing.assert_allclose(
                    [h["score"] for h in got],
                    [s for _, s in expected],
                    rtol=1e-9,
                    err_msg=f"seed={seed} q={q!r} method={method}",
                )
    finally:
        engine.close()
