"""Wildcard term expansion: lexicon semantics + search equivalence."""

import pytest

from tests.test_rank_identity import corpus_dir, file_index, oracle_docs  # noqa: F401


@pytest.mark.usefixtures("ray_session")
def test_expand_matches_bruteforce(file_index):
    """expand(pattern) == regex filter over the full vocabulary, ordered
    by (df desc, term asc)."""
    import fnmatch
    import os

    import pyarrow.dataset as pads

    from distributedcodesearchengine_ray.pipelines.query import LexiconReader

    idx, _ = file_index
    lex_dir = os.path.join(idx, "lexicon")
    full = pads.dataset(lex_dir, format="parquet").to_table(columns=["term", "df"])
    vocab = list(zip(full["term"].to_pylist(), full["df"].to_pylist()))
    lex = LexiconReader(idx)
    for pattern in ["pars*", "json", "*json*", "p?rse", "zz*", "*"]:
        got = lex.expand(pattern, max_expand=10_000)
        exp = sorted(
            ((t, d) for t, d in vocab if fnmatch.fnmatchcase(t, pattern)),
            key=lambda r: (-r[1], r[0]),
        )
        assert got == exp, pattern


@pytest.mark.usefixtures("ray_session")
def test_wildcard_search_equals_expanded_query(file_index):
    """Searching "pars*" must rank exactly like the multi-term OR query
    of its expansions (BM25 over the expanded token list)."""
    from distributedcodesearchengine_ray.pipelines.query import LexiconReader, QueryEngine

    idx, _ = file_index
    lex = LexiconReader(idx)
    terms = [t for t, _ in lex.expand("pars*")]
    assert terms, "fixture vocabulary must contain pars* terms"
    engine = QueryEngine(idx, num_actors=2)
    try:
        wild = engine.search("pars*", limit=15)
        plain = engine.search(" ".join(terms), limit=15)
        assert wild == plain
        # mixed plain + wildcard chunk
        mixed = engine.search("json pars*", limit=15)
        expanded = engine.search("json " + " ".join(terms), limit=15)
        assert mixed == expanded
        # a wildcard matching nothing contributes no tokens
        assert engine.search("zzqq*", limit=5) == []
    finally:
        engine.close()


@pytest.mark.usefixtures("ray_session")
def test_facets_match_full_result_set(file_index):
    """facets(query) == counts grouped from an exhaustive search at
    unbounded limit (same threshold semantics)."""
    from collections import Counter

    import pyarrow.dataset as pads

    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = file_index
    lang_of = dict(
        zip(
            *(
                pads.dataset(f"{idx}/docmeta", format="parquet")
                .to_table(columns=["doc_id", "lang"])
                .to_pydict()
                .values()
            )
        )
    )
    engine = QueryEngine(idx, num_actors=2)
    try:
        # last query hits the max<=0 keep-all branch: facets must cover
        # every doc, exactly like dense-fallback search does
        for q in ["parse json", "send http request", "import return",
                  "zzqqnosuchterm"]:
            hits = engine.search(q, limit=10**6)
            exp = Counter(lang_of[h["doc_id"]] for h in hits)
            got = engine.facets(q, facet_col="language")
            assert got == dict(sorted(exp.items())), q
        assert engine.facets("") == {}
    finally:
        engine.close()


@pytest.mark.usefixtures("ray_session")
def test_range_syntax_is_opt_in(file_index):
    """``lo..hi`` chunks are literal by default — an ordinary query with
    an embedded ".." ("0..10") must tokenize like the plain tokenizer
    says, not silently range-expand.  With range_syntax=True the chunk
    expands to the [lo, hi) vocabulary slice, and an EMPTY expansion
    (lo >= hi) falls back to literal tokens instead of vanishing."""
    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.pipelines.query import LexiconReader, QueryEngine

    idx, _ = file_index
    lex = LexiconReader(idx)
    engine = QueryEngine(idx, num_actors=2)
    try:
        # default: ".." tokenizes literally ("json a..b" == its tokens)
        lit = engine.search("json parse..data", limit=10)
        plain = engine.search(" ".join(tokenize("json parse..data")), limit=10)
        assert lit == plain
        # opt-in: expands like the explicit TermRangeQuery terms
        terms = [t for t, _ in lex.expand_range("parse", "pat")]
        assert terms, "fixture vocabulary must contain [parse, pat) terms"
        ranged = engine.search("parse..pat", limit=10, range_syntax=True)
        expanded = engine.search(" ".join(terms), limit=10)
        assert ranged == expanded
        # opt-in but empty slice (lo >= hi): falls back to literal tokens
        empty = engine.search("pat..parse", limit=10, range_syntax=True)
        lit2 = engine.search(" ".join(tokenize("pat..parse")), limit=10)
        assert empty == lit2
    finally:
        engine.close()
