"""Boolean query operators: +term (MUST) / -term (MUST_NOT).

Semantics under test (mirrored by the ``bm25_boolean`` driver oracle):
required/excluded membership is a POST-scoring mask, like the metadata
filters (F3) — the scored token list for ``a +b`` equals plain ``a b``
(a ``+`` term still scores, Lucene MUST), an excluded term never scores,
and the 0.01·max threshold comes from the unmasked scores.
"""

import pytest

from distributedcodesearchengine_ray.functions.tokenizer import tokenize
from tests.test_rank_identity import corpus_dir, file_index, oracle_docs  # noqa: F401


@pytest.fixture
def text_of(file_index, corpus_dir):
    import pyarrow.dataset as pads

    idx, _ = file_index
    meta = pads.dataset(f"{idx}/docmeta", format="parquet").to_table(
        columns=["doc_id", "repo", "path", "commit"]
    )
    corpus = pads.dataset(corpus_dir, format="parquet").to_table(
        columns=["repo", "path", "commit", "content"]
    )
    content = {
        (r, p, c): x
        for r, p, c, x in zip(
            corpus["repo"].to_pylist(), corpus["path"].to_pylist(),
            corpus["commit"].to_pylist(), corpus["content"].to_pylist(),
        )
    }
    return {
        d: content[(r, p, c)]
        for d, r, p, c in zip(
            meta["doc_id"].to_pylist(), meta["repo"].to_pylist(),
            meta["path"].to_pylist(), meta["commit"].to_pylist(),
        )
    }


@pytest.mark.usefixtures("ray_session")
def test_boolean_operators_match_postfilter(file_index, text_of):
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = file_index
    engine = QueryEngine(idx, num_actors=2)
    toks_of = {d: set(tokenize(t)) for d, t in text_of.items()}
    try:
        cases = [
            # (boolean query, equivalent scored query, keep predicate)
            ("parse json -http", "parse json",
             lambda s: "http" not in s),
            ("parse +json", "parse json",
             lambda s: "json" in s),
            ("+parse +json -send", "parse json",
             lambda s: "parse" in s and "json" in s and "send" not in s),
        ]
        for bq, sq, keep in cases:
            plain = engine.search(sq, limit=500)
            expected = [h for h in plain if keep(toks_of[h["doc_id"]])][:10]
            got = engine.search(bq, limit=10)
            assert got == expected, bq
            assert got, f"fixture corpus should produce hits for {bq!r}"
        # WAND routes boolean queries through the dense scorer: identical
        assert engine.search("parse json -http", limit=10, method="wand") == \
            engine.search("parse json -http", limit=10)
        # exclusion-only query has no scored tokens -> empty-query guard
        assert engine.search("-parse", limit=10) == []
        # hyphenated words (not chunk-leading '-') are NOT operators
        assert engine.search("foo-bar", limit=5) == engine.search("foo bar", limit=5)
    finally:
        engine.close()


@pytest.mark.usefixtures("ray_session")
def test_boolean_with_phrase(file_index, text_of):
    """Quoted phrases and boolean operators compose; +/- inside quotes
    are literal text, not operators."""
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = file_index
    engine = QueryEngine(idx, num_actors=2)
    try:
        got = engine.search('"parse_json" -http', limit=10)
        assert got, "phrase+exclusion should still match fixture docs"
        texts = engine._doc_texts([h["doc_id"] for h in got])
        for h in got:
            assert "parse_json" in texts[h["doc_id"]]
            assert "http" not in set(tokenize(texts[h["doc_id"]]))
    finally:
        engine.close()
