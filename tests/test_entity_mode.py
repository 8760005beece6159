"""Entity-mode build: parse -> project -> index; rank identity vs oracle.

This is the reference's actual BM25 corpus (entities, not files —
/root/reference/codesearch/storage/bm25_index.py:74-84), plus the ported
search-behavior assertions from /root/reference/tests/test_search.py.
"""

import numpy as np
import pytest

from distributedcodesearchengine_ray.functions.tokenizer import tokenize
from distributedcodesearchengine_ray.pipelines.oracle import BM25Oracle, oracle_search
from distributedcodesearchengine_ray.sources.corpus import gen_corpus_rows, write_corpus
from distributedcodesearchengine_ray.stages.parse import entity_document, parse_content
from tests.test_rank_identity import _keep

N_FILES = 220


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus_e")
    return write_corpus(str(d), n_files=N_FILES, seed=42, num_shards=3)


@pytest.fixture(scope="module")
def oracle_entities():
    rows = [r for r in gen_corpus_rows(N_FILES, seed=42) if _keep(r["path"])]
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
    ents = []
    for r in rows:
        for e in parse_content(r["content"], r["path"], r["repo"], r["lang"]):
            ents.append(e)
    return ents


@pytest.fixture(scope="module")
def entity_index(ray_session, corpus_dir, tmp_path_factory):
    from distributedcodesearchengine_ray.pipelines.build_index import build_index

    idx = str(tmp_path_factory.mktemp("index_entity"))
    manifest = build_index(corpus_dir, idx, mode="entity", docs_per_partition=150)
    return idx, manifest


def test_entity_count_and_stats(entity_index, oracle_entities):
    _, manifest = entity_index
    tokens = [tokenize(entity_document(e)) for e in oracle_entities]
    oracle = BM25Oracle(tokens)
    assert manifest.n_docs == len(oracle_entities)
    assert manifest.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)
    assert manifest.average_idf == pytest.approx(oracle.average_idf, rel=1e-9)


def test_entity_rank_identity(entity_index, oracle_entities):
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = entity_index
    tokens = [tokenize(entity_document(e)) for e in oracle_entities]
    oracle = BM25Oracle(tokens)
    meta = [
        {
            "language": e["language"],
            "entity_type": e["entity_type"],
            "repo_name": e["repo_name"],
        }
        for e in oracle_entities
    ]
    engine = QueryEngine(idx, num_actors=3)
    try:
        for q, filt in [
            ("JSON parsing", None),
            ("parse json", {"language": "python"}),
            ("send HTTP request", None),
            ("validate email", {"entity_type": "function"}),
            ("import return", None),
            ("factory client", {"entity_type": "class"}),
        ]:
            expected = oracle_search(oracle, q, limit=20, doc_meta=meta, filters=filt)
            got = engine.search(q, limit=20, filters=filt)
            assert [h["doc_id"] for h in got] == [d for d, _ in expected], f"{q!r} {filt}"
            np.testing.assert_allclose(
                [h["score"] for h in got], [s for _, s in expected], rtol=1e-9
            )
    finally:
        engine.close()


def test_search_with_meta_returns_entity_fields(entity_index):
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = entity_index
    engine = QueryEngine(idx, num_actors=2)
    try:
        df = engine.search_with_meta("JSON parsing", limit=5)
        assert len(df) > 0
        for col in ("name", "entity_type", "signature", "doc_id", "score"):
            assert col in df.columns
        assert df["rank"].tolist() == list(range(len(df)))
    finally:
        engine.close()


# --- ported reference search-behavior assertions (tests/test_search.py) ---


def _mini_engine(tmp_path, entities):
    """Build a tiny entity-mode index from explicit entity rows by writing a
    synthetic one-entity-per-file corpus (keeps insertion order = docID)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributedcodesearchengine_ray.pipelines.build_index import build_index

    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for i, (name, docstring, lang, repo) in enumerate(entities):
        # content that our python parser extracts as a single function
        body = f'def {name}():\n    """{docstring}"""\n    pass\n'
        rows["repo"].append(repo)
        rows["path"].append(f"src/f{i:03d}.py")
        rows["commit"].append("c" * 40)
        rows["lang"].append(lang)
        rows["content"].append(body)
    corpus = str(tmp_path / "corpus")
    import os

    os.makedirs(corpus, exist_ok=True)
    pq.write_table(pa.table(rows), f"{corpus}/part-0.parquet")
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, mode="entity", docs_per_partition=2)
    return idx


def test_docmeta_source_code_reconstruction_exact(entity_index, oracle_entities):
    """docmeta's source_code must equal the parsers' verbatim
    source_code for EVERY entity — the invariant gate over whatever
    representation staging chooses (round 5 measured verbatim as the
    smallest under parquet compression; alias columns are dropped from
    staging and re-added by the builder)."""
    import glob

    import pyarrow.parquet as pq

    idx, _ = entity_index
    metas = sorted(glob.glob(f"{idx}/docmeta/part-*.parquet"))
    got = pq.read_table(
        metas, columns=["doc_id", "source_code", "start_line", "end_line"]
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    assert len(got) == len(oracle_entities)
    for i, e in enumerate(oracle_entities):
        assert got["source_code"][i] == e["source_code"], (
            f"doc {i}: reconstructed source_code differs for "
            f"{e['name']} [{e['start_line']}:{e['end_line']}]"
        )


def test_add_and_search(ray_session, tmp_path):
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx = _mini_engine(
        tmp_path,
        [
            ("parse_json", "Parse a JSON string into a dictionary", "python", "test-repo"),
            ("serialize_json", "Convert object to JSON string", "python", "test-repo"),
            ("validate_email", "Validate an email address", "python", "test-repo"),
        ],
    )
    engine = QueryEngine(idx, num_actors=1)
    try:
        df = engine.search_with_meta("JSON parsing", limit=20)
        assert len(df) > 0
        assert "parse_json" in df["name"].tolist()[:2]
    finally:
        engine.close()


def test_search_empty_query_returns_nothing(ray_session, tmp_path):
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx = _mini_engine(tmp_path, [("f1", "doc", "python", "r")])
    engine = QueryEngine(idx, num_actors=1)
    try:
        assert engine.search("@#$ a", limit=10) == []
    finally:
        engine.close()
