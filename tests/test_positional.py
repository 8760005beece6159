"""Positional phrase search vs a brute-force token-adjacency oracle,
plus position-codec round-trip and build/append integration."""

import os
import shutil
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/rcs_pos"
PHRASES = ["parse json data", "send http request", "user", "http request"]


@pytest.fixture(scope="module")
def pos_index(ray_session):
    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.sources.corpus import write_corpus

    shutil.rmtree(BASE, ignore_errors=True)
    write_corpus(f"{BASE}/corpus", n_files=300, seed=23, num_shards=3)
    build_index(
        f"{BASE}/corpus", f"{BASE}/idx", mode="entity",
        docs_per_partition=80, resume=False, with_positions=True,
    )
    return f"{BASE}/idx"


def _brute_adjacent(doc_tokens, phrase_tokens):
    k = len(phrase_tokens)
    return any(
        doc_tokens[i : i + k] == phrase_tokens
        for i in range(len(doc_tokens) - k + 1)
    )


def _oracle_docs(index_dir, phrase):
    """All doc_ids whose tokenized doc_text contains the phrase tokens
    adjacently — recomputed from docmeta + the entity doc projection."""
    import pyarrow.parquet as pq

    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.pipelines.build_index import (
        _entity_doc_text,
    )

    ptoks = tokenize(phrase)
    hits = set()
    meta_dir = os.path.join(index_dir, "docmeta")
    for f in sorted(os.listdir(meta_dir)):
        t = pq.read_table(os.path.join(meta_dir, f))
        texts = _entity_doc_text(t).to_pylist()
        for did, txt in zip(t["doc_id"].to_pylist(), texts):
            if _brute_adjacent(tokenize(txt), ptoks):
                hits.add(did)
    return hits, ptoks


def test_positional_matches_bruteforce(ray_session, pos_index):
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    eng = QueryEngine(pos_index, num_actors=2)
    try:
        for phrase in PHRASES:
            truth, ptoks = _oracle_docs(pos_index, phrase)
            got = eng.search_phrase_positional(phrase, limit=10_000)
            got_ids = {r["doc_id"] for r in got}
            # the engine applies the max*0.01 threshold; the oracle set is
            # un-thresholded, so engine hits must be a subset that contains
            # every truth doc passing the threshold.  With positive idfs at
            # this corpus the threshold drops nothing containing ALL tokens
            assert got_ids == truth, phrase
            # ranked by (-score, doc_id)
            scores = [r["score"] for r in got]
            assert scores == sorted(scores, reverse=True)
    finally:
        eng.close()


def test_match_phrase_prefix_matches_bruteforce(ray_session, pos_index):
    """match_phrase_prefix == brute force: fixed tokens adjacent, then
    ANY token starting with the prefix; scored as BM25 over the fixed
    tokens only (so the hit SET equals the un-thresholded truth here,
    like the plain positional test)."""
    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.pipelines.build_index import (
        _entity_doc_text,
    )
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    import pyarrow.parquet as pq

    cases = [("parse json", "da"), ("send", "ht"), ("http", "re")]
    meta_dir = os.path.join(pos_index, "docmeta")
    docs = {}
    for f in sorted(os.listdir(meta_dir)):
        t = pq.read_table(os.path.join(meta_dir, f))
        for did, txt in zip(t["doc_id"].to_pylist(), _entity_doc_text(t).to_pylist()):
            docs[did] = tokenize(txt)

    eng = QueryEngine(pos_index, num_actors=2)
    try:
        for fixed, prefix in cases:
            ftoks = tokenize(fixed)
            k = len(ftoks)
            truth = {
                did
                for did, toks in docs.items()
                if any(
                    toks[i : i + k] == ftoks and toks[i + k].startswith(prefix)
                    for i in range(len(toks) - k)
                )
            }
            got = eng.search_match_phrase_prefix(
                f"{fixed} {prefix}", limit=10_000
            )
            got_ids = {r["doc_id"] for r in got}
            assert got_ids == truth, (fixed, prefix)
            scores = [r["score"] for r in got]
            assert scores == sorted(scores, reverse=True)
            assert truth, (fixed, prefix)  # cases must actually match docs
    finally:
        eng.close()


def test_positional_is_stricter_than_bag(ray_session, pos_index):
    """Every positional hit also appears in the plain BM25 result set for
    the same tokens, and adjacency is genuinely stricter for multi-token
    phrases (on this corpus the generated texts shuffle word order)."""
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    eng = QueryEngine(pos_index, num_actors=2)
    try:
        phrase = "parse json data"
        pos_hits = {r["doc_id"] for r in eng.search_phrase_positional(phrase, limit=10_000)}
        bag_hits = {r["doc_id"] for r in eng.search(phrase, limit=10_000)}
        assert pos_hits <= bag_hits
    finally:
        eng.close()


def test_positions_roundtrip_positions_exact(ray_session, pos_index):
    """Decode a few terms' positional postings and compare against the
    tokenizer's actual token positions."""
    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.pipelines.build_index import (
        _entity_doc_text,
    )
    from distributedcodesearchengine_ray.pipelines.query import IndexShard
    from distributedcodesearchengine_ray.state.manifest import IndexManifest

    import pyarrow.parquet as pq

    m = IndexManifest.load(pos_index)
    shard = IndexShard(pos_index, [p.part_id for p in m.partitions])
    meta_dir = os.path.join(pos_index, "docmeta")
    toks_by_doc = {}
    for f in sorted(os.listdir(meta_dir)):
        t = pq.read_table(os.path.join(meta_dir, f))
        for did, txt in zip(t["doc_id"].to_pylist(), _entity_doc_text(t).to_pylist()):
            toks_by_doc[did] = tokenize(txt)

    checked = 0
    for pi, p in enumerate(shard.parts):
        for term, row in list(p["term_row"].items())[:25]:
            local, starts, pos = shard._positions(pi, row)
            for j in range(len(local)):
                did = int(shard._doc_ids[local[j]])
                expect = [i for i, tk in enumerate(toks_by_doc[did]) if tk == term]
                assert pos[starts[j] : starts[j + 1]].tolist() == expect, (term, did)
                checked += 1
        break  # one partition is plenty
    assert checked > 50


def _brute_slop(doc_tokens, phrase_tokens, slop):
    """Ordered proximity: increasing positions with gaps <= slop + 1."""
    k = len(phrase_tokens)
    win = slop + 1
    prev = [i for i, t in enumerate(doc_tokens) if t == phrase_tokens[0]]
    for j in range(1, k):
        cur = [
            q
            for q, t in enumerate(doc_tokens)
            if t == phrase_tokens[j] and any(1 <= q - p <= win for p in prev)
        ]
        if not cur:
            return False
        prev = cur
    return bool(prev)


def test_slop_matches_bruteforce(ray_session, pos_index):
    import pyarrow.parquet as pq

    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.pipelines.build_index import (
        _entity_doc_text,
    )
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    toks_by_doc = {}
    meta_dir = os.path.join(pos_index, "docmeta")
    for f in sorted(os.listdir(meta_dir)):
        t = pq.read_table(os.path.join(meta_dir, f))
        for did, txt in zip(t["doc_id"].to_pylist(), _entity_doc_text(t).to_pylist()):
            toks_by_doc[did] = tokenize(txt)

    eng = QueryEngine(pos_index, num_actors=2)
    try:
        for phrase, slop in (("parse data", 1), ("parse json data", 2), ("send request", 3)):
            ptoks = tokenize(phrase)
            truth = {d for d, tk in toks_by_doc.items() if _brute_slop(tk, ptoks, slop)}
            got = {
                r["doc_id"]
                for r in eng.search_phrase_positional(phrase, limit=10_000, slop=slop)
            }
            assert got == truth, (phrase, slop)
            # slop is monotone: larger windows can only add docs
            tighter = {
                r["doc_id"]
                for r in eng.search_phrase_positional(phrase, limit=10_000, slop=0)
            }
            assert tighter <= got, (phrase, slop)
    finally:
        eng.close()


def test_positional_requires_flag(ray_session):
    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine
    from distributedcodesearchengine_ray.sources.corpus import write_corpus

    write_corpus(f"{BASE}/corpus2", n_files=60, seed=5, num_shards=1)
    build_index(
        f"{BASE}/corpus2", f"{BASE}/idx_nopos", mode="entity",
        docs_per_partition=50, resume=False,
    )
    eng = QueryEngine(f"{BASE}/idx_nopos", num_actors=1)
    try:
        with pytest.raises(RuntimeError, match="positions"):
            eng.search_phrase_positional("parse json")
    finally:
        eng.close()


def test_append_carries_positions(ray_session, pos_index):
    """append_index onto a positional index writes positions for the new
    partitions, and the appended docs are positionally searchable."""
    import pyarrow.parquet as pq

    from distributedcodesearchengine_ray.pipelines.build_index import append_index
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine
    from distributedcodesearchengine_ray.sources.corpus import (
        _rows_to_table,
        gen_corpus_row,
    )

    shutil.copytree(pos_index, f"{BASE}/idx_app")
    app = f"{BASE}/app_corpus"
    os.makedirs(app, exist_ok=True)
    pq.write_table(
        _rows_to_table([gen_corpus_row(i, 23, 2) for i in range(300, 340)]),
        os.path.join(app, "part-00000.parquet"),
    )
    m = append_index(f"{BASE}/idx_app", app, docs_per_partition=80)
    pos_files = os.listdir(os.path.join(f"{BASE}/idx_app", "positions"))
    assert len(pos_files) == len(m.partitions)
    eng = QueryEngine(f"{BASE}/idx_app", num_actors=2)
    try:
        truth, _ = _oracle_docs(f"{BASE}/idx_app", "parse json data")
        got = {r["doc_id"] for r in eng.search_phrase_positional("parse json data", limit=10_000)}
        assert got == truth
    finally:
        eng.close()


def test_compact_guard_on_positional(ray_session, pos_index):
    from distributedcodesearchengine_ray.pipelines.build_index import compact_index

    shutil.copytree(pos_index, f"{BASE}/idx_compact_guard")
    with pytest.raises(NotImplementedError, match="position"):
        compact_index(f"{BASE}/idx_compact_guard")


def _brute_span_not(doc_tokens, inc, exc, dist):
    pos_i = [i for i, t in enumerate(doc_tokens) if t == inc]
    pos_e = [i for i, t in enumerate(doc_tokens) if t == exc]
    return any(all(abs(a - b) > dist for b in pos_e) for a in pos_i)


@pytest.mark.parametrize("inc,exc,dist", [
    ("http", "request", 1),
    ("http", "request", 3),
    ("json", "parse", 0),
    ("user", "zzznotaterm", 2),  # exclude absent -> include docs all match
])
def test_span_not_matches_bruteforce(ray_session, pos_index, inc, exc, dist):
    """SpanNotQuery: engine doc set == brute-force positional exclusion
    over the tokenized entity docs (all scores positive single-term BM25,
    so the max*0.01 threshold drops nothing here)."""
    import os as _os

    import pyarrow.parquet as pq

    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.pipelines.build_index import (
        _entity_doc_text,
    )
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    truth = set()
    meta_dir = _os.path.join(pos_index, "docmeta")
    for f in sorted(_os.listdir(meta_dir)):
        t = pq.read_table(_os.path.join(meta_dir, f))
        texts = _entity_doc_text(t).to_pylist()
        for did, txt in zip(t["doc_id"].to_pylist(), texts):
            if _brute_span_not(tokenize(txt), inc, exc, dist):
                truth.add(did)
    eng = QueryEngine(pos_index, num_actors=2)
    try:
        got = eng.search_span_not(inc, inc, exc, dist=dist, limit=10_000)
        got_ids = {r["doc_id"] for r in got}
        scores = [r["score"] for r in got]
        assert scores == sorted(scores, reverse=True)
        assert got_ids == truth, (inc, exc, dist)
    finally:
        eng.close()


def _brute_span_near(doc_tokens, a, b, window):
    pos_a = [i for i, t in enumerate(doc_tokens) if t == a]
    pos_b = [i for i, t in enumerate(doc_tokens) if t == b]
    return any(abs(i - j) <= window for i in pos_a for j in pos_b)


@pytest.mark.parametrize("a,b,window", [
    ("http", "request", 1),
    ("http", "request", 5),
    ("json", "data", 0),   # window 0 can never hit (distinct positions)
    ("user", "parse", 2),
])
def test_span_near_matches_bruteforce(ray_session, pos_index, a, b, window):
    """Unordered SpanNearQuery: engine doc set == brute-force pairwise
    proximity over the tokenized entity docs."""
    import os as _os

    import pyarrow.parquet as pq

    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.pipelines.build_index import (
        _entity_doc_text,
    )
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    truth = set()
    meta_dir = _os.path.join(pos_index, "docmeta")
    for f in sorted(_os.listdir(meta_dir)):
        t = pq.read_table(_os.path.join(meta_dir, f))
        texts = _entity_doc_text(t).to_pylist()
        for did, txt in zip(t["doc_id"].to_pylist(), texts):
            if _brute_span_near(tokenize(txt), a, b, window):
                truth.add(did)
    eng = QueryEngine(pos_index, num_actors=2)
    try:
        got = eng.search_span_near(f"{a} {b}", a, b, window=window, limit=10_000)
        got_ids = {r["doc_id"] for r in got}
        assert got_ids == truth, (a, b, window)
    finally:
        eng.close()


def _brute_span_containing(doc_tokens, a, b, c, width):
    pos_a = [i for i, t in enumerate(doc_tokens) if t == a]
    pos_b = [i for i, t in enumerate(doc_tokens) if t == b]
    pos_c = [i for i, t in enumerate(doc_tokens) if t == c]
    return any(
        pa_ <= pc <= pb and pb - pa_ <= width
        for pa_ in pos_a for pb in pos_b for pc in pos_c
    )


@pytest.mark.parametrize("a,b,c,width", [
    ("http", "request", "send", 4),
    ("parse", "data", "json", 6),
    ("user", "token", "zzznotaterm", 5),  # little absent -> empty
    ("json", "json", "parse", 8),         # a == b degenerate big span
])
def test_span_containing_matches_bruteforce(ray_session, pos_index, a, b, c, width):
    """SpanContainingQuery: engine doc set == brute-force triple
    enumeration (exists pa <= pc <= pb with pb - pa <= width) over the
    tokenized entity docs."""
    import os as _os

    import pyarrow.parquet as pq

    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.pipelines.build_index import (
        _entity_doc_text,
    )
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    truth = set()
    meta_dir = _os.path.join(pos_index, "docmeta")
    for f in sorted(_os.listdir(meta_dir)):
        t = pq.read_table(_os.path.join(meta_dir, f))
        texts = _entity_doc_text(t).to_pylist()
        for did, txt in zip(t["doc_id"].to_pylist(), texts):
            if _brute_span_containing(tokenize(txt), a, b, c, width):
                truth.add(did)
    eng = QueryEngine(pos_index, num_actors=2)
    try:
        got = eng.search_span_containing(
            f"{a} {b}", a, b, c, width=width, limit=10_000
        )
        got_ids = {r["doc_id"] for r in got}
        assert got_ids == truth, (a, b, c, width)
    finally:
        eng.close()


def _brute_span_within(doc_tokens, a, b, c, d, width):
    pos_a = [i for i, t in enumerate(doc_tokens) if t == a]
    pos_b = [i for i, t in enumerate(doc_tokens) if t == b]
    little = [
        i for i, t in enumerate(doc_tokens[:-1])
        if t == c and doc_tokens[i + 1] == d
    ]
    return any(
        pa_ <= pc and pc + 1 <= pb and pb - pa_ <= width
        for pa_ in pos_a for pb in pos_b for pc in little
    )


@pytest.mark.parametrize("a,b,c,d,width", [
    ("http", "request", "send", "http", 6),
    ("parse", "data", "json", "data", 8),
    ("user", "token", "json", "zzznotaterm", 5),  # little pair absent
    ("json", "json", "parse", "json", 8),         # a == b degenerate
])
def test_span_within_matches_bruteforce(ray_session, pos_index, a, b, c, d, width):
    """SpanWithinQuery (doc level, little = adjacent phrase c d): engine
    doc set == brute-force quadruple enumeration (exists pa <= pc,
    pc+1 <= pb, pb - pa <= width with d at pc+1)."""
    import os as _os

    import pyarrow.parquet as pq

    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.pipelines.build_index import (
        _entity_doc_text,
    )
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    truth = set()
    meta_dir = _os.path.join(pos_index, "docmeta")
    for f in sorted(_os.listdir(meta_dir)):
        t = pq.read_table(_os.path.join(meta_dir, f))
        texts = _entity_doc_text(t).to_pylist()
        for did, txt in zip(t["doc_id"].to_pylist(), texts):
            if _brute_span_within(tokenize(txt), a, b, c, d, width):
                truth.add(did)
    eng = QueryEngine(pos_index, num_actors=2)
    try:
        got = eng.search_span_containing(
            f"{a} {b}", a, b, c, width=width, limit=10_000, term_d=d,
        )
        got_ids = {r["doc_id"] for r in got}
        assert got_ids == truth, (a, b, c, d, width)
    finally:
        eng.close()


def test_actor_failure_heals_and_search_retries(ray_session, pos_index):
    """Node-loss resilience: killing a shard actor mid-serve must not
    change answers — the next search's fan-out hits RayActorError,
    heal() rebuilds the dead stride from storage, and the retried query
    returns the identical result.  Surviving actors are not recreated."""
    import ray

    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    eng = QueryEngine(pos_index, num_actors=2)
    try:
        before = eng.search("parse json data", limit=10)
        assert before
        survivor = eng.actors[1]
        ray.kill(eng.actors[0])
        # ray.kill is asynchronous: wait until the death is visible so
        # the next search deterministically hits a dead actor (otherwise
        # the still-alive actor may serve it and the final heal()==0
        # assertion races)
        import time as _time

        deadline = _time.time() + 60
        while _time.time() < deadline:
            try:
                ray.get(eng.actors[0].ping.remote(), timeout=5)
                _time.sleep(0.1)
            except Exception:
                break
        after = eng.search("parse json data", limit=10)
        assert after == before
        assert eng.actors[1] is survivor  # alive stride untouched
        # the revived actor serves its own partitions again
        assert ray.get(eng.actors[0].ping.remote(), timeout=30) is not None
        # explicit heal() on a healthy pool is a no-op
        assert eng.heal() == 0
    finally:
        eng.close()
