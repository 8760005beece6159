"""Quoted-phrase queries: BM25 ranking + verbatim post-filter."""

import pytest

from tests.test_rank_identity import corpus_dir, file_index, oracle_docs  # noqa: F401


@pytest.mark.usefixtures("ray_session")
def test_phrase_filters_to_verbatim_matches(file_index, corpus_dir):
    """search('"<phrase>"') == plain search results restricted to docs whose
    raw content contains the phrase, rank order preserved."""
    import pyarrow.dataset as pads

    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = file_index
    engine = QueryEngine(idx, num_actors=2)
    try:
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
        text_of = {
            d: content[(r, p, c)]
            for d, r, p, c in zip(
                meta["doc_id"].to_pylist(), meta["repo"].to_pylist(),
                meta["path"].to_pylist(), meta["commit"].to_pylist(),
            )
        }
        for query, phrase in [
            ("parse json data", "parse_json"),
            ("send http request", "def send_http"),
            ("parse json", "no such phrase zz"),
        ]:
            plain = engine.search(query, limit=200)
            expected = [h for h in plain if phrase in text_of[h["doc_id"]]][:10]
            quoted = engine.search(f'{query} "{phrase}"', limit=10)
            # the quoted phrase also contributes its tokens to scoring, so
            # compare against the same token list with the phrase appended
            rescored = engine.search(f"{query} {phrase}", limit=200)
            expected = [h for h in rescored if phrase in text_of[h["doc_id"]]][:10]
            assert quoted == expected, (query, phrase)
    finally:
        engine.close()


@pytest.mark.usefixtures("ray_session")
def test_phrase_only_query(file_index, corpus_dir):
    """A bare quoted phrase ranks by its tokens and keeps only verbatim docs."""
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = file_index
    engine = QueryEngine(idx, num_actors=2)
    try:
        hits = engine.search('"parse_json"', limit=10)
        assert hits, "fixture corpus contains parse_json identifiers"
        texts = engine._doc_texts([h["doc_id"] for h in hits])
        assert all("parse_json" in texts[h["doc_id"]] for h in hits)
    finally:
        engine.close()
